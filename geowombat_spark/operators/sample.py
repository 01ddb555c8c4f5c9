"""Sampling operators — ``gw.sample`` (``src/geowombat/core/sops.py:213-687``).

- random: ``orderBy(rand(seed)).limit(n)`` — Catalyst compiles this to
  TakeOrderedAndProject (a distributed top-k), NOT a full sort: each
  partition keeps its local n, the driver merges. Scales to any corpus.
- systematic: a modulo predicate — pure pruned scan (``sops.py:297-327``).
- stratified: per-stratum conditional sampling (``sops.py:407-687``); the
  reference's 16-branch sign dispatch collapses to a parsed Column.
- min_dist thinning: the reference removes points with a neighbor closer
  than r via cKDTree pairs (``sops.py:56-81``); here candidate pairs come
  from a k-ring self-join (the kNN candidate generator) and the greedy
  keep-first filter runs on the (small) sampled set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grid import GridSpec


def sample_random(docs: DataFrame, n: int, seed: int = 42) -> DataFrame:
    return docs.orderBy(F.rand(seed)).limit(n)


def sample_random_deterministic(
    docs: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Hash-deterministic uniform sample: the ``n`` smallest md5 hashes of
    the row identity (ties by id). Same TakeOrderedAndProject top-k plan
    as :func:`sample_random`, but selection is a pure function of the row
    — identical across engines, runs, partitionings and cluster sizes
    (and SQL-mirrorable, so it is value-checkable against DuckDB). The
    production variant for reproducible training-data sampling;
    :func:`sample_random` keeps the reference's seeded-RNG API
    (``sops.py:213-296``)."""
    from ..pipeline.text import md5_int

    h = md5_int(F.col(id_col).cast("string"))
    return docs.orderBy(h, F.col(id_col)).limit(n)


def sample_systematic(docs: DataFrame, grid: GridSpec, spacing: float) -> DataFrame:
    """Every ⌊spacing/cell⌋-th row/col (``sops.py:297-327``)."""
    step_r = max(int(spacing / grid.celly), 1)
    step_c = max(int(spacing / grid.cellx), 1)
    return docs.filter((F.col("row") % step_r == 0) & (F.col("col") % step_c == 0))


_SIGNS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
}


def parse_strata_condition(band: str, cond: str):
    """Parse the reference's strata keys — ``'==,1'`` or two-sided
    ``'>,1;<=,5'`` (``sops.py:457-559``) — into one Column predicate."""
    pred = None
    for part in cond.split(";"):
        sign, val = part.split(",")
        p = _SIGNS[sign.strip()](F.col(band), float(val))
        pred = p if pred is None else (pred & p)
    return pred


def sample_stratified(
    docs: DataFrame,
    band: str,
    strata: dict[str, float | int],
    seed: int = 42,
) -> DataFrame:
    """``strata={'==,1': 0.5, '>,1;<=,5': 10}``: float → fraction of the
    stratum, int → absolute count (``sops.py:407-687``)."""
    parts = []
    for i, (cond, amount) in enumerate(strata.items()):
        stratum = docs.filter(parse_strata_condition(band, cond))
        if isinstance(amount, float) and amount <= 1.0 and not isinstance(amount, bool):
            parts.append(stratum.sample(fraction=amount, seed=seed + i))
        else:
            parts.append(stratum.orderBy(F.rand(seed + i)).limit(int(amount)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sample_stratified_deterministic(
    docs: DataFrame,
    band: str,
    strata: dict[str, float | int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Hash-deterministic stratified sampling.

    Same strata grammar as :func:`sample_stratified`, but selection is a
    pure function of the row identity (portable md5 hash), not of Spark's
    partition-seeded RNG — so results are identical across engines, runs,
    partitionings and cluster sizes. This is the production variant for
    training-data pipelines where a sample must be reproducible; fractions
    select ``hash % 10^9 < frac*10^9`` (ppb granularity — a ``% 1000``
    test would select NOTHING for fractions < 0.0005 and carry up to
    0.05-percentage-point rounding error), counts take the ``k`` smallest
    hashes (a distributed top-k, no full sort).
    """
    from functools import reduce

    from ..pipeline.text import md5_int

    h = md5_int(F.col(id_col).cast("string"))
    parts = []
    for cond, amount in strata.items():
        stratum = docs.filter(parse_strata_condition(band, cond))
        if isinstance(amount, float) and not isinstance(amount, bool) and amount <= 1.0:
            parts.append(
                stratum.filter(
                    h % 1_000_000_000 < int(round(amount * 1_000_000_000))
                )
            )
        else:
            parts.append(stratum.orderBy(h, F.col(id_col)).limit(int(amount)))
    return reduce(lambda a, b: a.unionByName(b), parts)


def thin_min_dist(points: pd.DataFrame, min_dist: float) -> pd.DataFrame:
    """Min-distance thinning of a sampled point set — exact parity with
    ``_remove_near_points`` (``sops.py:56-81``): the KD-tree pairs every
    (i, j), i < j, within ``min_dist`` (inclusive, scipy ``query_pairs``
    semantics) and drops the set of FIRST indices — one pass, no greedy
    re-evaluation, so a chain p0~p1~p2 keeps only p2 (rm = {0, 1}), and
    the SECOND point of an isolated pair survives. Driver-side because
    the input is the already-sampled (small) set; the distributed
    candidate generator for big sets is ``operators.knn.near_pairs``.
    """
    xs = points["x"].values
    ys = points["y"].values
    n = len(points)
    rm = np.zeros(n, dtype=bool)
    for i in range(n - 1):
        d2 = (xs[i + 1 :] - xs[i]) ** 2 + (ys[i + 1 :] - ys[i]) ** 2
        if (d2 <= min_dist**2).any():
            rm[i] = True
    return points[~rm]
