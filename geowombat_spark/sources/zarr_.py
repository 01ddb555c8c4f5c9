"""``to_zarr`` / ``open_zarr`` — a tile-chunked Zarr v2 store as a sink/source.

Reference ``to_zarr`` (``/root/reference/src/geowombat/backends/zarr_.py:15-68``)
writes each dask window into a zarr group (one array per raster, window
offsets in attrs) serialized by a ``ProcessSynchronizer`` lock. The Spark
rewrite keeps the *format* — a genuine Zarr v2 directory store, readable by
any zarr/xarray installation — and replaces the lock with Spark's execution
model:

* **Chunk == grid tile.** The store's chunk lattice is exactly the engine's
  ``GridSpec`` tile lattice, so one Spark task owns one chunk and no two
  writers ever touch the same file: the reference's ``ProcessSynchronizer``
  (``backends/zarr_.py:52``) is unnecessary by construction.
* **One shuffle, then embarrassingly parallel.** ``groupBy(chunk_y,
  chunk_x) → applyInPandas`` co-locates each chunk's cells (the same single
  shuffle any tiled sink pays), packs the dense ``(tile_rows, tile_cols)``
  array, zlib-compresses, and writes ``band/cy.cx`` with an
  ``os.replace`` atomic rename — idempotent under task retry, no committer
  needed. At 100 TB this is one object-store PUT per chunk from whichever
  executor holds it.
* **Metadata is driver-side and O(bands).** ``.zgroup`` / ``.zarray`` /
  ``.zattrs`` JSON docs are written once up front; the reader lists chunks
  arithmetically from ``shape``/``chunks`` (no directory listing, no
  driver materialization of data).

Format notes (Zarr v2 spec, https://zarr-specs.readthedocs.io): C-order,
little-endian dtype, edge chunks stored padded to the full chunk shape,
compressor ``{"id": "zlib", "level": N}`` (numcodecs ``Zlib`` is a raw
``zlib.compress`` stream — stdlib-writable) or ``null`` for raw bytes.
``.zattrs`` carries ``_ARRAY_DIMENSIONS: ["y", "x"]`` so xarray's zarr
reader sees named dimensions, plus the ``GridSpec`` affine for round-trip.
"""

from __future__ import annotations

import json
import os
import warnings
import zlib
from uuid import uuid4

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import GridSpec

_MANIFEST_SCHEMA = (
    "chunk_y long, chunk_x long, n_cells long, n_files int, nbytes long"
)


def _zarray_doc(grid: GridSpec, dtype: str, fill_value: float,
                compressor: dict | None) -> dict:
    return {
        "zarr_format": 2,
        "shape": [grid.nrows, grid.ncols],
        "chunks": [grid.tile_rows, grid.tile_cols],
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": fill_value,
        "filters": None,
        "order": "C",
        "dimension_separator": ".",
    }


def _check_publish_state(path: str, repair: bool = False) -> None:
    """Surface a crashed overwrite-publish before touching the store.

    The overwrite publish is two POSIX renames (``final → .old`` then
    ``.inprogress → final``) — NOT atomic as a pair. A crash between them
    leaves the last complete store at ``<path>.old`` and the new complete
    store at ``<path>.inprogress`` (all chunk writes finish before the
    publish begins), with nothing at ``path``. This guard runs at the top
    of :func:`to_zarr` (``repair=True``) and :func:`open_zarr`
    (``repair=False``):

    - final missing + ``.old`` present + ``.inprogress`` present → either
      the crash window above OR a LIVE writer between its two renames.
      Only the writer path (``repair=True``) may finish the publish
      (rename ``.inprogress`` → final) — a reader doing that rename would
      race a concurrent writer's own second rename and crash it. The
      read-only path instead polls briefly for the final store to appear
      (a live publish completes in milliseconds) and raises with recovery
      instructions if it never does.
    - final missing + ``.old`` present, no ``.inprogress`` → raise; the
      user must restore by renaming ``<path>.old`` back.
    - final present + ``.old`` present → a publish succeeded but the
      retired store was not deleted (crash after the second rename):
      warn; the ``.old`` copy is safe to delete.
    """
    import time

    old = path.rstrip("/") + ".old"
    inprog = path.rstrip("/") + ".inprogress"
    if not os.path.exists(old):
        return
    final_exists = os.path.exists(os.path.join(path, ".zgroup"))
    if final_exists:
        warnings.warn(
            f"leftover retired store {old}: a previous overwrite publish "
            "completed but did not clean up; the .old copy may be deleted",
            stacklevel=3,
        )
        return
    if os.path.exists(os.path.join(inprog, ".zgroup")):
        if repair:
            os.rename(inprog, path)
            warnings.warn(
                f"completed a crashed overwrite publish of {path} from "
                f"{inprog}; the previous store remains at {old} for manual "
                "inspection and may be deleted",
                stacklevel=3,
            )
            return
        # Read-only caller: ride out a live in-flight publish (the window
        # between the writer's two renames is sub-millisecond), but never
        # mutate the store ourselves.
        for _ in range(20):
            time.sleep(0.05)
            if os.path.exists(os.path.join(path, ".zgroup")):
                return
        raise RuntimeError(
            f"zarr store {path} is missing; a retired copy exists at "
            f"{old} and a complete new store at {inprog} (crashed "
            "overwrite publish). Re-run to_zarr to finish the publish, "
            f"or finish it manually with: mv {inprog} {path}"
        )
    raise RuntimeError(
        f"zarr store {path} is missing but a retired copy exists at "
        f"{old} (crashed overwrite publish, no complete .inprogress "
        f"store found) — restore it with: mv {old} {path}"
    )


def to_zarr(
    df: DataFrame,
    path: str,
    grid: GridSpec,
    bands: tuple[str, ...] = ("band_blue",),
    fill_value: float | None = None,
    compress_level: int | None = 1,
    overwrite: bool = False,
    group_attrs: dict | None = None,
) -> DataFrame:
    """Write the cell table ``df`` (``row``, ``col``, ``<bands>``) as a Zarr
    v2 group at ``path`` — one 2-D ``<f8`` array per band, chunked on the
    grid's tile lattice. Returns the per-chunk write manifest (collected —
    one row per chunk, the zarr analogue of the checkpoint sink's tile
    metrics).

    ``compress_level=None`` stores raw uncompressed chunks
    (``compressor: null``); otherwise numcodecs-zlib at that level.
    Cells absent from ``df`` take ``fill_value`` (default
    ``grid.nodata``) — standard dense-store semantics.
    """
    import shutil

    _check_publish_state(path, repair=True)
    final_path, replacing = path, False
    if os.path.exists(os.path.join(path, ".zgroup")):
        if not overwrite:
            warnings.warn(f"The zarr store {path} already exists.",
                          stacklevel=2)
            return None
        # Overwrite = build a FRESH store beside the old one and swap on
        # completion: a sparse in-place re-write would leave STALE chunk
        # files the reader returns as data (missing-chunk == fill only
        # holds for a fresh store), and destroy-then-rebuild would lose
        # the only copy if the write job dies mid-way. Readers see the
        # old complete store for the whole job window.
        replacing = True
        path = path.rstrip("/") + ".inprogress"
        shutil.rmtree(path, ignore_errors=True)  # stale prior attempt
    fill = float(grid.nodata if fill_value is None else fill_value)
    comp = (None if compress_level is None
            else {"id": "zlib", "level": int(compress_level)})
    # -- driver-side metadata (O(bands), written before any task runs) -----
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as fh:
        json.dump({"zarr_format": 2}, fh)
    attrs = {"grid": grid.as_dict(), "bands": list(bands)}
    attrs.update(group_attrs or {})
    with open(os.path.join(path, ".zattrs"), "w") as fh:
        json.dump(attrs, fh, indent=2)
    for b in bands:
        bdir = os.path.join(path, b)
        os.makedirs(bdir, exist_ok=True)
        with open(os.path.join(bdir, ".zarray"), "w") as fh:
            json.dump(_zarray_doc(grid, "<f8", fill, comp), fh, indent=2)
        with open(os.path.join(bdir, ".zattrs"), "w") as fh:
            json.dump({"_ARRAY_DIMENSIONS": ["y", "x"]}, fh)

    tr, tc = grid.tile_rows, grid.tile_cols
    nr, nc = grid.nrows, grid.ncols
    level = compress_level
    band_list = list(bands)

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        cy = int(pdf["chunk_y"].iloc[0])
        cx = int(pdf["chunk_x"].iloc[0])
        gr = pdf["row"].to_numpy(np.int64)
        gc = pdf["col"].to_numpy(np.int64)
        # loud guard on the GLOBAL lattice (matching to_netcdf): a
        # negative row/col would wrap via numpy fancy indexing, and a
        # beyond-grid cell would either vanish into an edge chunk's
        # padding (trimmed by the reader) or land in an out-of-lattice
        # chunk file the arithmetic chunk lister never reads — both
        # silent data loss.
        bad = (gr < 0) | (gr >= nr) | (gc < 0) | (gc >= nc)
        if bad.any():
            raise ValueError(
                f"to_zarr: {int(bad.sum())} cells outside the "
                f"{nr}x{nc} grid (chunk ({cy},{cx})); clip the input first"
            )
        rr = gr - cy * tr
        cc = gc - cx * tc
        nbytes = 0
        for b in band_list:
            block = np.full((tr, tc), fill, dtype="<f8")
            block[rr, cc] = pdf[b].to_numpy(np.float64)
            raw = block.tobytes(order="C")
            buf = raw if level is None else zlib.compress(raw, level)
            dest = os.path.join(path, b, f"{cy}.{cx}")
            # per-attempt unique temp: a speculative/retried duplicate of
            # this chunk task must never interleave writes into a shared
            # temp file (torn publish) — same protocol as sources/fetch
            tmp = f"{dest}.inprogress.{os.getpid()}.{uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(buf)
            os.replace(tmp, dest)  # atomic: retries overwrite, never tear
            nbytes += len(buf)
        return pd.DataFrame(
            [{"chunk_y": cy, "chunk_x": cx, "n_cells": len(pdf),
              "n_files": len(band_list), "nbytes": nbytes}]
        )

    keyed = df.select(
        F.col("row").cast("long"), F.col("col").cast("long"), *bands
    ).withColumns(
        {
            "chunk_y": F.expr(f"row div {tr}").cast("long"),
            "chunk_x": F.expr(f"col div {tc}").cast("long"),
        }
    )
    rows = (
        keyed.groupBy("chunk_y", "chunk_x")
        .applyInPandas(write_chunk, _MANIFEST_SCHEMA)
        .collect()  # one tiny row per chunk; this action drives the write
    )
    # reclaim temps from hard-killed attempts (unique names mean nothing
    # ever reuses them); the reader lists chunks arithmetically so a leaked
    # temp is never read, but it would sit in the published store forever
    for b in band_list:
        for e in os.scandir(os.path.join(path, b)):
            if e.is_file() and ".inprogress." in e.name:
                try:
                    os.unlink(e.path)
                except OSError:
                    pass
    if replacing:
        # publish: retire the old store only now that the new one is whole
        old = final_path.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(final_path, old)
        os.rename(path, final_path)
        shutil.rmtree(old)
    spark = df.sparkSession
    return spark.createDataFrame(rows, _MANIFEST_SCHEMA)


def open_zarr(
    spark: SparkSession,
    path: str,
    bands: tuple[str, ...] | None = None,
    drop_fill: bool = True,
) -> DataFrame:
    """Open a Zarr v2 group written by :func:`to_zarr` as a lazy cell table
    ``(row, col, x, y, <bands>)``.

    The chunk list is derived arithmetically from ``.zarray`` metadata
    (driver-side, like parquet footers); each Spark task decompresses its
    chunks and emits Arrow batches. ``drop_fill=True`` drops cells where
    *every* requested band equals its fill value — the sparse round-trip
    inverse of ``to_zarr`` (only exact if no real cell holds the fill in
    all bands, which ``GridSpec.nodata`` conventions guarantee). A missing
    chunk file reads as all-fill, per the zarr spec.
    """
    _check_publish_state(path)
    with open(os.path.join(path, ".zattrs")) as fh:
        attrs = json.load(fh)
    grid = GridSpec(**attrs["grid"])
    use_bands = list(bands) if bands is not None else list(attrs["bands"])
    metas = {}
    for b in use_bands:
        with open(os.path.join(path, b, ".zarray")) as fh:
            metas[b] = json.load(fh)
    m0 = metas[use_bands[0]]
    for b, m in metas.items():
        if m["shape"] != m0["shape"] or m["chunks"] != m0["chunks"]:
            raise ValueError(f"band {b} chunk grid differs within {path}")
    nrows, ncols = m0["shape"]
    tr, tc = m0["chunks"]
    n_cy = -(-nrows // tr)
    n_cx = -(-ncols // tc)
    fills = {b: float(metas[b]["fill_value"]) for b in use_bands}
    comps = {b: metas[b]["compressor"] for b in use_bands}

    chunks = spark.createDataFrame(
        [(cy, cx) for cy in range(n_cy) for cx in range(n_cx)],
        "chunk_y long, chunk_x long",
    ).repartition(min(n_cy * n_cx, spark.sparkContext.defaultParallelism))

    out_schema = "row long, col long, " + ", ".join(
        f"{b} double" for b in use_bands
    )

    def read_chunks(it):
        for pdf in it:
            for cy, cx in zip(pdf["chunk_y"], pdf["chunk_x"]):
                cy, cx = int(cy), int(cx)
                h = min(tr, nrows - cy * tr)
                w = min(tc, ncols - cx * tc)
                cols = {}
                for b in use_bands:
                    f = os.path.join(path, b, f"{cy}.{cx}")
                    if not os.path.exists(f):
                        block = np.full((tr, tc), fills[b], dtype="<f8")
                    else:
                        with open(f, "rb") as fh:
                            buf = fh.read()
                        raw = buf if comps[b] is None else zlib.decompress(buf)
                        block = np.frombuffer(raw, dtype="<f8").reshape(tr, tc)
                    cols[b] = block[:h, :w].reshape(-1)
                rr, cc = np.meshgrid(
                    np.arange(h, dtype=np.int64),
                    np.arange(w, dtype=np.int64),
                    indexing="ij",
                )
                out = pd.DataFrame(
                    {"row": rr.reshape(-1) + cy * tr,
                     "col": cc.reshape(-1) + cx * tc, **cols}
                )
                if drop_fill:
                    keep = np.zeros(len(out), dtype=bool)
                    for b in use_bands:
                        fv = fills[b]
                        if isinstance(fv, float) and np.isnan(fv):
                            # NaN != NaN elementwise — a plain != would
                            # keep every cell (drop_fill no-op)
                            keep |= ~np.isnan(cols[b])
                        else:
                            keep |= cols[b] != fv
                    out = out[keep]
                if len(out):
                    yield out

    cells = chunks.mapInPandas(read_chunks, out_schema)
    return cells.withColumns(
        {
            "x": F.lit(grid.left)
            + (F.col("col").cast("double") + 0.5) * grid.cellx,
            "y": F.lit(grid.top)
            - (F.col("row").cast("double") + 0.5) * grid.celly,
        }
    )
