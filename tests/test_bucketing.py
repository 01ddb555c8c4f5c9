"""Bucketed co-located joins: zero Exchange between co-bucketed tables."""

import pytest
from pyspark.sql import functions as F

from geowombat_spark.plans import bucketing


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    import shutil

    # stale managed-table locations survive metastore drops in local mode
    spark.sql("DROP TABLE IF EXISTS bkt_corpus")
    spark.sql("DROP TABLE IF EXISTS bkt_stats")
    shutil.rmtree("spark-warehouse/bkt_corpus", ignore_errors=True)
    shutil.rmtree("spark-warehouse/bkt_stats", ignore_errors=True)
    docs = spark.range(10_000).select(
        F.col("id").alias("cell_id"),
        (F.col("id") % 64).alias("tile_id"),
        (F.col("id") * 3.5).alias("band_blue"),
    )
    stats = spark.range(64).select(
        F.col("id").alias("tile_id"), (F.col("id") * 2.0).alias("t_mean")
    )
    bucketing.write_bucketed(docs, "bkt_corpus", n_buckets=8)
    bucketing.write_bucketed(
        stats, "bkt_stats", n_buckets=8, sort_col="tile_id"
    )
    yield "bkt_corpus", "bkt_stats"
    spark.sql("DROP TABLE IF EXISTS bkt_corpus")
    spark.sql("DROP TABLE IF EXISTS bkt_stats")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    corpus, stats = bucketed_tables
    a = bucketing.read_bucketed(spark, corpus)
    b = bucketing.read_bucketed(spark, stats)
    with _no_broadcast(spark):
        joined = a.join(b, "tile_id")
        bucketing.assert_no_shuffle_join(joined)
        # and it actually computes the right thing
        n = joined.filter(F.col("t_mean") == F.col("tile_id") * 2.0).count()
        assert n == 10_000


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    corpus, _ = bucketed_tables
    a = bucketing.read_bucketed(spark, corpus)
    plain = spark.range(64).select(
        F.col("id").alias("tile_id"), F.lit(1.0).alias("v")
    )
    with _no_broadcast(spark):
        joined = a.join(plain, "tile_id")
        assert bucketing.plan_has_shuffle(joined)


class _no_broadcast:
    """Force SortMergeJoin so the Exchange presence/absence is the signal."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *a):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.old)
