"""Nodata / scaling — the engine's NULL semantics.

Reference: ``set_nodata`` (``src/geowombat/core/geoxarray.py:1448-1522``),
``mask_nodata`` (``:191-230``), ``band_mask`` (``:1409-1446``), with the
tri-level precedence config > open-kwarg > file metadata
(``src/geowombat/core/api.py:319-343``; pinned by
``tests/test_scaling.py:47-84`` and ``tests/test_nodata.py:51-90``).

NULL is the canonical destination nodata: every aggregate then skips it for
free, matching the reference's nan-reductions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import resolve


def set_nodata(
    df: DataFrame,
    bands: tuple[str, ...],
    src_nodata: float | None = None,
    dst_nodata: float | None = None,
    scale_factor: float | None = None,
    offset: float | None = None,
    out_range: tuple[float, float] | None = None,
    meta_nodata: float | None = None,
    meta_scale: float | None = None,
    meta_offset: float | None = None,
) -> DataFrame:
    """``where(x == src_nodata, dst_nodata, x*scale + offset)`` with clip to
    ``out_range`` (``geoxarray.py:1448-1522``). Precedence for nodata/scale/
    offset follows the reference chain: active config > explicit kwarg >
    table metadata (resolved at plan time via :func:`config.resolve`).
    ``dst_nodata=None`` maps nodata to NULL (the engine canonical form)."""
    src_nd = resolve("nodata", src_nodata, meta_nodata)
    sf = resolve("scale_factor", scale_factor, meta_scale, default=1.0)
    off = resolve("offset", offset, meta_offset, default=0.0)
    for b in bands:
        c = F.col(b).cast("double")
        scaled = c * F.lit(float(sf)) + F.lit(float(off))
        if out_range is not None:
            lo, hi = out_range
            clipped = F.least(F.greatest(scaled, F.lit(float(lo))), F.lit(float(hi)))
            # greatest/least skip NULLs — keep NULL inputs NULL
            scaled = F.when(scaled.isNull(), F.lit(None).cast("double")).otherwise(clipped)
        if src_nd is not None:
            dst = F.lit(None) if dst_nodata is None else F.lit(float(dst_nodata))
            expr = F.when(c == F.lit(float(src_nd)), dst).otherwise(scaled)
        else:
            expr = scaled
        df = df.withColumn(b, expr)
    return df


def mask_nodata(df: DataFrame, bands: tuple[str, ...], nodata: float | None = None, meta_nodata: float | None = None) -> DataFrame:
    """nodata → NULL (``geoxarray.py:191-230``)."""
    nd = resolve("nodata", nodata, meta_nodata)
    if nd is None:
        return df
    for b in bands:
        df = df.withColumn(b, F.nullif(F.col(b).cast("double"), F.lit(float(nd))))
    return df


def band_mask(df: DataFrame, valid_bands: tuple[str, ...], out: str = "mask") -> DataFrame:
    """1 where any valid band ≤ 0 else 0 (``geoxarray.py:1409-1446``)."""
    cols = [F.col(b) for b in valid_bands]
    # F.least requires >= 2 columns; a single-band mask is legitimate
    least = F.least(*cols) if len(cols) > 1 else cols[0]
    return df.withColumn(out, F.when(least <= 0, F.lit(1)).otherwise(F.lit(0)))
