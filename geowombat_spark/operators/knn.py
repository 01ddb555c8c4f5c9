"""k-ring expansion kNN / near-pair joins.

The reference's only neighbor op is ``_remove_near_points`` (cKDTree pairs
closer than r, used by ``sample(min_dist=...)``,
``/root/reference/src/geowombat/core/sops.py:56-81``) — a driver-side
KD-tree that cannot scale. The north rule promotes this to a first-class
distributed operator: candidate pairs come from a **k-ring expansion
self-join** (explode each point into its Chebyshev-k neighborhood of cell
ids, equi-join on cell id), then exact distance filtering — the standard
grid-bucketed spatial join. No N² anywhere; the shuffle is keyed by cell id
and bounded by (2k+1)² × points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grid import GridSpec, kring_cells, zorder_encode


def expand_kring(points: DataFrame, grid: GridSpec, k: int) -> DataFrame:
    """Explode each point into its k-ring cell ids via one Arrow pandas UDF
    (returns ``neighbor_cell_id`` rows; input needs row/col columns)."""
    g = grid.as_dict()

    @F.pandas_udf("array<bigint>")
    def _ring(rows: pd.Series, cols: pd.Series) -> pd.Series:
        gs = GridSpec(**g)
        origin, nr, nc = kring_cells(gs, rows.values, cols.values, k)
        ids = zorder_encode(nr, nc)
        out = [[] for _ in range(len(rows))]
        for o, i in zip(origin, ids):
            out[o].append(int(i))
        return pd.Series(out)

    return points.withColumn(
        "neighbor_cell_id", F.explode(_ring(F.col("row"), F.col("col")))
    )


def near_pairs(
    points: DataFrame,
    grid: GridSpec,
    min_dist: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs (a, b) with euclidean distance <= min_dist, a.id < b.id —
    the distributed ``_remove_near_points`` candidate set.

    INCLUSIVE bound: the reference thins via ``scipy.cKDTree.query_pairs``
    (distance <= r, ``util.py`` ``_remove_near_points``), and the
    driver-side twin :func:`~geowombat_spark.operators.sample.thin_min_dist`
    matches scipy with ``<=`` — grid-derived points sit at exact
    cell-multiple distances, so the boundary case is common, not
    theoretical. k is derived from min_dist (ceil in cell units), so the
    k-ring join is guaranteed to cover every qualifying pair.
    """
    k = int(np.ceil(min_dist / min(grid.cellx, grid.celly)))
    left = expand_kring(
        points.select(id_col, "row", "col", "x", "y"), grid, k
    ).select(
        F.col(id_col).alias("a_id"),
        F.col("x").alias("a_x"),
        F.col("y").alias("a_y"),
        "neighbor_cell_id",
    )
    right = points.select(
        F.col(id_col).alias("b_id"),
        F.col("x").alias("b_x"),
        F.col("y").alias("b_y"),
        F.col("cell_id").alias("neighbor_cell_id"),
    )
    dx = F.col("a_x") - F.col("b_x")
    dy = F.col("a_y") - F.col("b_y")
    # explicit multiplication, not pow(): bit-identical to the SQL oracle
    d2 = dx * dx + dy * dy
    # no distinct needed: only the left side is k-ring-expanded and ring
    # cell ids are unique per point, so each (a, b) pair joins exactly
    # once (b contributes its single home cell) — a distinct here would
    # re-shuffle the whole surviving pair set for nothing
    return (
        left.join(right, "neighbor_cell_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(d2 <= F.lit(float(min_dist) * float(min_dist)))
        .select("a_id", "b_id", F.sqrt(d2).alias("dist"))
    )


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    grid: GridSpec,
    k_neighbors: int = 5,
    k_ring: int = 2,
    query_id: str = "qid",
    target_id: str = "doc_id",
) -> DataFrame:
    """k nearest targets for each query point within a k_ring neighborhood.

    Candidates from the k-ring equi-join, exact distances, per-query top-k
    via a rank window (ties broken on target id for determinism). Queries
    outside dense regions simply return fewer than k rows — callers widen
    ``k_ring`` to trade recall for shuffle volume (the IVF-style accuracy
    knob).
    """
    from pyspark.sql.window import Window

    cand = expand_kring(
        queries.select(query_id, "row", "col", "x", "y"), grid, k_ring
    ).select(
        query_id,
        F.col("x").alias("q_x"),
        F.col("y").alias("q_y"),
        "neighbor_cell_id",
    )
    tgt = targets.select(
        F.col(target_id).alias("t_id"),
        F.col("x").alias("t_x"),
        F.col("y").alias("t_y"),
        F.col("cell_id").alias("neighbor_cell_id"),
    )
    qdx = F.col("q_x") - F.col("t_x")
    qdy = F.col("q_y") - F.col("t_y")
    d2 = qdx * qdx + qdy * qdy
    w = Window.partitionBy(query_id).orderBy(F.col("d2").asc(), F.col("t_id").asc())
    return (
        cand.join(tgt, "neighbor_cell_id")
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(query_id, F.col("t_id").alias(target_id), F.sqrt("d2").alias("dist"), "rank")
    )
