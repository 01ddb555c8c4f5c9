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


def test_exact_index_bucketed_probe_skips_index_exchange(spark):
    """The incremental-dedup scale story (pipeline/dedup.exact_index):
    with the corpus index persisted bucketed on dup_key, a batch probe's
    join reads the index scan directly — the only Exchange left in the
    plan is the batch side's own window/join shuffle. Against the same
    index unbucketed, the plan pays one more Exchange (the index side)."""
    import shutil

    from geowombat_spark.pipeline import dedup

    spark.sql("DROP TABLE IF EXISTS bkt_dedup_idx")
    shutil.rmtree("spark-warehouse/bkt_dedup_idx", ignore_errors=True)
    corpus = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body nr "), (F.col("id") % 100)).alias("text"),
    )
    idx = dedup.exact_index(corpus)
    bucketing.write_bucketed(
        idx, "bkt_dedup_idx", n_buckets=8,
        bucket_col="dup_key", sort_col="dup_key",
    )
    batch = spark.range(40).select(
        (F.col("id") + 9000).alias("doc_id"),
        F.concat(F.lit("doc body nr "), F.col("id")).alias("text"),
    )

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    with _no_broadcast(spark):
        bucketed = dedup.dedup_against(
            batch, bucketing.read_bucketed(spark, "bkt_dedup_idx")
        )
        unbucketed = dedup.dedup_against(batch, idx)
        assert n_exchanges(bucketed) < n_exchanges(unbucketed)
        # and the audit is correct: ids 9000..9039 probe texts 0..39,
        # all of which exist in the corpus (ids 0..99 cover nr 0..99)
        n_in = bucketed.filter("in_corpus").count()
        assert n_in == 40

    spark.sql("DROP TABLE IF EXISTS bkt_dedup_idx")


def test_broadcast_exchange_is_not_a_shuffle(spark, bucketed_tables):
    """BroadcastExchange must not trip the shuffle guard: a co-bucketed
    join whose small side broadcasts is still exchange-free in the
    repartitioning sense (no _no_broadcast wrapper here on purpose)."""
    corpus, stats = bucketed_tables
    a = bucketing.read_bucketed(spark, corpus)
    b = bucketing.read_bucketed(spark, stats)
    joined = a.join(b, "tile_id")
    bucketing.assert_no_shuffle_join(joined)  # broadcast plan allowed
    assert not bucketing.plan_has_shuffle(joined)


def test_save_load_exact_index_roundtrip(spark):
    """save_exact_index persists the content-hash index in its prescribed
    dup_key-bucketed layout and load_exact_index reads it back WITH the
    bucket spec: the audit join plans fewer exchanges than against the
    inline (unbucketed) index, and verdicts are identical."""
    import shutil

    from geowombat_spark.pipeline import dedup

    spark.sql("DROP TABLE IF EXISTS bkt_idx_rt")
    shutil.rmtree("spark-warehouse/bkt_idx_rt", ignore_errors=True)
    corpus = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body nr "), (F.col("id") % 60)).alias("text"),
    )
    dedup.save_exact_index(corpus, "bkt_idx_rt", n_buckets=8)
    idx = dedup.load_exact_index(spark, "bkt_idx_rt")
    # 20 probes hit corpus content (nr 0..19), 20 are new (nr 900..919)
    batch = spark.range(40).select(
        (F.col("id") + 5000).alias("doc_id"),
        F.concat(
            F.lit("body nr "),
            F.when(F.col("id") < 20, F.col("id")).otherwise(
                F.col("id") + 880
            ),
        ).alias("text"),
    )

    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )

    with _no_broadcast(spark):
        audited = dedup.dedup_against(batch, idx)
        inline = dedup.dedup_against(batch, dedup.exact_index(corpus))
        assert n_exchanges(audited) < n_exchanges(inline)
        got = {
            (bool(r["in_corpus"]), bool(r["kept"])): 1
            for r in audited.collect()
        }
        assert audited.filter("in_corpus").count() == 20
        assert audited.filter("kept").count() == 20
        assert (True, False) in got and (False, True) in got
    spark.sql("DROP TABLE IF EXISTS bkt_idx_rt")


def test_save_load_minhash_index_roundtrip(spark):
    """save_minhash_index persists the band index bucketed on the probe
    join key (band_idx, band_hash); a neardup_against probe joins it
    with fewer exchanges than the inline index and finds the planted
    near-duplicate."""
    import shutil

    from geowombat_spark.pipeline import dedup

    spark.sql("DROP TABLE IF EXISTS bkt_mh_rt")
    shutil.rmtree("spark-warehouse/bkt_mh_rt", ignore_errors=True)
    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(base + " variant "), F.col("id").cast("string"),
            F.lit(" pad "), (F.col("id") * 7 % 13).cast("string"),
        ).alias("text"),
    )
    dedup.save_minhash_index(corpus, "bkt_mh_rt", n_buckets=8)
    idx = dedup.load_minhash_index(spark, "bkt_mh_rt")
    # one batch doc is a verbatim copy of corpus doc 3 (J=1 estimate)
    batch = spark.createDataFrame(
        [(9001, base + " variant 3 pad 8")], ["doc_id", "text"]
    )

    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )

    with _no_broadcast(spark):
        hits = dedup.neardup_against(batch, idx, threshold=0.9)
        inline = dedup.neardup_against(
            batch, dedup.minhash_band_index(corpus), threshold=0.9
        )
        assert n_exchanges(hits) < n_exchanges(inline)
        got = {
            (int(r["batch_id"]), int(r["corpus_id"]))
            for r in hits.collect()
        }
        assert (9001, 3) in got
    spark.sql("DROP TABLE IF EXISTS bkt_mh_rt")


def test_minhash_index_family_fingerprint_guards_load(spark):
    """A persisted band index is only join-compatible with the exact hash
    family that built it: load under different (n, bands, rows) — or any
    future hash_params change — must fail loudly, not silently match
    nothing; a pre-fingerprint table loads with a warning."""
    import shutil
    import warnings

    from geowombat_spark.pipeline import dedup

    spark.sql("DROP TABLE IF EXISTS bkt_mh_fam")
    shutil.rmtree("spark-warehouse/bkt_mh_fam", ignore_errors=True)
    corpus = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), F.col("id").cast("string")).alias("text"),
    )
    dedup.save_minhash_index(corpus, "bkt_mh_fam", n_buckets=4)
    # matching family loads clean
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert dedup.load_minhash_index(spark, "bkt_mh_fam").count() > 0
    # different band layout -> different fingerprint -> loud failure
    with pytest.raises(ValueError, match="different hash family"):
        dedup.load_minhash_index(spark, "bkt_mh_fam", bands=8, rows=2)
    with pytest.raises(ValueError, match="different hash family"):
        dedup.load_minhash_index(spark, "bkt_mh_fam", n=5)
    # appending a different family must refuse BEFORE writing any rows
    # (a mixed-family table re-stamped with the new fingerprint would
    # load clean while half its band hashes are garbage)
    with pytest.raises(ValueError, match="cannot append"):
        dedup.save_minhash_index(
            corpus, "bkt_mh_fam", bands=8, rows=2, mode="append"
        )
    # same-family append is allowed and keeps the table loadable
    dedup.save_minhash_index(corpus, "bkt_mh_fam", n_buckets=4, mode="append")
    assert dedup.load_minhash_index(spark, "bkt_mh_fam").count() > 0
    # a fingerprint-less table (interrupted save / pre-fingerprint build)
    # refuses to load by default, warns under the explicit escape hatch
    spark.sql(
        "ALTER TABLE bkt_mh_fam UNSET TBLPROPERTIES ('gw.minhash_family')"
    )
    with pytest.raises(ValueError, match="no family fingerprint"):
        dedup.load_minhash_index(spark, "bkt_mh_fam")
    with pytest.warns(RuntimeWarning, match="no family fingerprint"):
        assert (
            dedup.load_minhash_index(
                spark, "bkt_mh_fam", allow_unfingerprinted=True
            ).count()
            > 0
        )
    # and append onto an unverifiable table refuses too
    with pytest.raises(ValueError, match="cannot append"):
        dedup.save_minhash_index(corpus, "bkt_mh_fam", mode="append")
    spark.sql("DROP TABLE IF EXISTS bkt_mh_fam")
