"""array_to_polygon — connected components of equal-valued cell regions.

Reference: ``/root/reference/src/geowombat/core/conversion.py:495-568``
(``rasterio.features.shapes``: polygons of connected same-valued pixels,
4/8-connectivity) and the accessor ``to_polygon``
(``core/geoxarray.py:563-617``).

Spark shape: iterative min-label propagation over the cell adjacency
self-join — the classic distributed connected-components loop. Each round:

    label(c) <- min(label(c), min over same-valued neighbors n of label(n))

augmented with **pointer jumping** (label(c) <- label(label(c))) so
convergence is O(log diameter) rounds instead of O(diameter). Every round
is one equi-join shuffle; lineage is truncated per round with
``localCheckpoint`` (use a checkpoint dir on a real cluster) so the plan
stays constant-size. Component ids are the minimum cell label in the
component — deterministic, engine-independent.

The polygon-ring reconstruction step of ``features.shapes`` is represented
by the per-component summary (cell count + bbox) — the ring tracer is a
driver-side O(perimeter) routine irrelevant at query scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    cells: DataFrame,
    value_col: str = "value",
    connectivity: int = 4,
    max_iter: int = 50,
) -> DataFrame:
    """Label connected same-valued regions.

    ``cells`` needs (row, col, ``value_col``). Returns (row, col, value,
    comp) where ``comp`` is the min initial label (row-major cell index
    proxy: ``row * 2^32 + col``) of the region.
    """
    assert connectivity in (4, 8)
    lab = cells.select(
        "row",
        "col",
        F.col(value_col).alias("value"),
        (F.col("row") * F.lit(1 << 32) + F.col("col")).alias("label"),
    ).localCheckpoint()

    if connectivity == 4:
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        offs = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)]

    for _ in range(max_iter):
        # scatter: every cell sends its label to each neighbor address —
        # turns the stencil into ONE hash equi-join on (row, col, value)
        # (an OR-of-offsets join predicate would be a nested-loop join).
        contrib = lab.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("row") + dr).alias("row"),
                            (F.col("col") + dc).alias("col"),
                        )
                        for dr, dc in offs
                    ]
                )
            ).alias("tgt"),
            F.col("value"),
            F.col("label").alias("nlabel"),
        ).select(
            F.col("tgt.row").alias("row"),
            F.col("tgt.col").alias("col"),
            "value",
            "nlabel",
        )
        nb = (
            lab.join(contrib, ["row", "col", "value"], "left")
            .groupBy("row", "col", "value", "label")
            .agg(F.min("nlabel").alias("min_nb"))
            .withColumn(
                "new_label", F.least(F.col("label"), F.coalesce("min_nb", "label"))
            )
        )
        # pointer jumping: follow the new label to ITS current label
        jump = lab.select(
            F.col("row").alias("jr"),
            F.col("col").alias("jc"),
            F.col("label").alias("jlabel"),
        )
        stepped = (
            nb.withColumns(
                {
                    "lr": F.expr("new_label div 4294967296").cast("long"),
                    "lc": (F.col("new_label") % F.lit(1 << 32)).cast("long"),
                }
            )
            .join(
                jump,
                (F.col("jr") == F.col("lr")) & (F.col("jc") == F.col("lc")),
                "left",
            )
            .select(
                "row",
                "col",
                "value",
                F.least(
                    F.col("new_label"), F.coalesce("jlabel", "new_label")
                ).alias("label"),
            )
        )
        new_lab = stepped.localCheckpoint()
        changed = (
            new_lab.alias("n")
            .join(lab.alias("o"), ["row", "col"])
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        lab = new_lab
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — component ids are "
            "incomplete; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return lab.withColumnRenamed("label", "comp")


def region_summary(comps: DataFrame) -> DataFrame:
    """Per-region summary — the tabular form of the traced polygons:
    component id, class value, cell count, bbox."""
    return comps.groupBy("comp", "value").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("row").alias("row_min"),
        F.max("row").alias("row_max"),
        F.min("col").alias("col_min"),
        F.max("col").alias("col_max"),
    )
