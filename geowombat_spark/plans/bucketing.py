"""Bucketed storage layout — exchange-free co-located joins.

The tile-partitioned layout (``sources/tables.py``) gives partition-pruned
*scans*; bucketing gives shuffle-free *joins*: two tables written with
``bucketBy(n, tile_id)`` hash their rows into the same bucket files, so a
join on ``tile_id`` (or any key prefixed by it) reads matching buckets
side-by-side — the physical plan has a SortMergeJoin with **no Exchange on
either side**. At 100 TB this converts the biggest repeated cost of the
raster↔vector workload (re-shuffling the corpus for every tile-keyed
join: extract results vs corpus, manifest audits, multi-epoch stacks)
into a one-time layout decision, exactly the role Iceberg's bucket
partition transform plays in production.

Reference analogue: the windowed read/write layout of ``gw.to_raster``
(``backends/rasterio_.py:131-135``) fixes the on-disk unit to the window;
bucketing fixes the *join unit* to it too.

Usage is write-side only — readers get co-location for free:

    write_bucketed(docs, "corpus", n_buckets=64)
    write_bucketed(stats, "tile_stats", n_buckets=64)
    spark.table("corpus").join(spark.table("tile_stats"), "tile_id")
    # -> SortMergeJoin, zero Exchange (verify with assert_no_shuffle_join)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    bucket_col: str | list[str] = "tile_id",
    sort_col: str | list[str] = "cell_id",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (+ in-bucket sorted) managed table.

    Sorting within buckets by ``sort_col`` additionally removes the Sort
    below a SortMergeJoin on (bucket_col, sort_col) prefixes and gives
    row-group locality for range predicates on ``sort_col``. Composite
    join keys bucket on the full column list (a join must then cover
    every bucket column to stay exchange-free on this side)."""
    bcols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    scols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
    sort_cols = bcols + [c for c in scols if c not in bcols]
    (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bcols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def _n_shuffles(plan: str) -> int:
    """Count SHUFFLE exchanges only: 'BroadcastExchange' is a broadcast
    (no repartitioning of either side) and must not trip the guard — a
    co-bucketed join whose small side falls under
    autoBroadcastJoinThreshold plans BroadcastHashJoin legitimately.
    'ReusedExchange' likewise must not count: a reused *broadcast*
    exchange prints as ReusedExchange, and a reused shuffle exchange's
    original is already counted once."""
    import re

    return len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", plan))


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the plan contains any shuffle Exchange (broadcast
    exchanges don't count — nothing repartitions).

    Inspects the physical plan AS CURRENTLY KNOWN: for an un-executed
    DataFrame under AQE this is the INITIAL plan (isFinalPlan=false) —
    AQE may still replace an Exchange with a broadcast at runtime, so a
    True here is "the static plan shuffles", not "a shuffle executed".
    The no-shuffle guard direction is unaffected: if even the initial
    plan has no shuffle Exchange, the executed plan cannot grow one."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return _n_shuffles(plan) > 0


def assert_no_shuffle_join(joined: DataFrame) -> None:
    """Guard used in tests/CI (initial-plan inspection — see
    :func:`plan_has_shuffle`): a join between co-bucketed tables must not
    re-shuffle either side. Raises with the physical plan if it does."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if _n_shuffles(plan) > 0:
        raise AssertionError(
            "bucketed join re-shuffled — layout/bucket-count mismatch?\n"
            + plan
        )
