#!/usr/bin/env python
"""Scale-evidence probe for INCREMENTAL near-dup ingestion: a 999,000-doc
corpus is summarized ONCE into the MinHash band index (4 rows/doc, the
persistent side), then a 100,000-doc batch — half exact twins of corpus
docs, half from a disjoint token universe — is audited against it with
``neardup_against``, A/B-ing the two index layouts:

  A. plain parquet read by path (join on (band_idx, band_hash) must
     exchange the whole 3,996,000-row index every audit);
  B. the ``save_minhash_index`` layout — a table bucketed on
     (band_idx, band_hash), the probe join key — where the audit joins
     the index co-located (no index-side exchange), the same measured
     rationale as the exact-index 160M-doc table in BENCH/BASELINE.md.

Counts are asserted exactly in BOTH paths: each of the 50,000 planted
twins matches its one source doc at jaccard_est=1.0 (identical text ⇒
identical signature ⇒ every band collides), and the 50,000 disjoint-
universe docs share no shingle with any corpus doc, so any accidental
band-hash collision is killed by the signature-estimate filter.

Corpus is capped BELOW the 99,999,989 token-residue prime on purpose:
ids r and r+p would otherwise carry identical texts (the residue system
wraps), planting unintended corpus-side duplicates.

Run: python tools/neardup_ingest_probe.py [n_corpus]
(deterministic, no RNG; default 999,000 — pass e.g. 10000000 for the
40M-index-row layout measurement)
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowombat_spark.pipeline import dedup
from geowombat_spark.sources.tables import get_spark

N_CORPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 999_000
N_BATCH, N_TWINS = 100_000, 50_000
BANDS, ROWS = 4, 4
RESIDUE_PRIME = 99_999_989  # > any corpus size used: no residue wrap
assert N_CORPUS < RESIDUE_PRIME


def text_expr(prefix: str):
    """25 deterministic tokens per doc; token universes with different
    prefixes are fully disjoint (no shared shingles at any offset), and
    distinct ids below RESIDUE_PRIME share no token at any position."""
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"{prefix}{j}_"),
                ((F.col("id") * (j * 2 + 3)) % RESIDUE_PRIME).cast(
                    "string"
                ),
            )
            for j in range(25)
        ],
    )


def audit(tag: str, index, batch) -> float:
    t0 = time.time()
    pairs = dedup.neardup_against(
        batch, index, bands=BANDS, rows=ROWS, threshold=0.5
    ).persist()
    n_pairs = pairs.count()
    wall = time.time() - t0
    n_exact = pairs.filter(F.col("jaccard_est") == 1.0).count()
    n_matched = pairs.select("batch_id").distinct().count()
    # every planted twin found, at estimate 1.0, one corpus source each;
    # zero pairs from the disjoint-universe half
    assert n_pairs == N_TWINS, n_pairs
    assert n_exact == N_TWINS, n_exact
    assert n_matched == N_TWINS, n_matched
    hit_new = pairs.filter(F.col("batch_id") >= N_CORPUS + N_TWINS).count()
    assert hit_new == 0, hit_new
    pairs.unpersist()
    print(f"  {tag}: audit={wall:.1f}s pairs={n_pairs} (all est=1.0)")
    return wall


def main() -> None:
    spark = get_spark(
        app="neardup-ingest", master="local[16]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = spark.conf.get("spark.sql.warehouse.dir")

    corpus = spark.range(N_CORPUS).select(
        F.col("id").alias("doc_id"), text_expr("w").alias("text")
    )
    # ONE signature pass over the corpus, landed as plain parquet; both
    # layouts derive from this file so the md5 shingle stage runs once.
    plain_path = "/tmp/gw_neardup_index_plain"
    shutil.rmtree(plain_path, ignore_errors=True)
    t0 = time.time()
    dedup.minhash_band_index(corpus, bands=BANDS, rows=ROWS).write.mode(
        "overwrite"
    ).parquet(plain_path)
    t_build = time.time() - t0
    idx_plain = spark.read.parquet(plain_path)
    n_idx = idx_plain.count()
    assert n_idx == N_CORPUS * BANDS, n_idx
    print(f"index build (one corpus scan): {t_build:.1f}s rows={n_idx}")

    # layout B: the save_minhash_index bucketing, built from the parquet
    # re-read (no second signature pass)
    from geowombat_spark.plans.bucketing import write_bucketed

    spark.sql("DROP TABLE IF EXISTS neardup_probe_idx")
    # a crashed prior run can leave the managed location without a
    # catalog entry (fresh metastore) — DROP alone won't clear it
    shutil.rmtree(
        os.path.join(wh.removeprefix("file:"), "neardup_probe_idx"),
        ignore_errors=True,
    )
    t0 = time.time()
    write_bucketed(
        idx_plain,
        "neardup_probe_idx",
        n_buckets=64,
        bucket_col=["band_idx", "band_hash"],
        sort_col=["band_idx", "band_hash"],
        mode="overwrite",
    )
    print(f"bucketed layout from parquet re-read: {time.time() - t0:.1f}s")
    # the probe wrote the table via write_bucketed (skipping the second
    # signature pass save_minhash_index would run), so it stamps the
    # family fingerprint itself — load_minhash_index refuses
    # unfingerprinted tables by design
    fp = dedup.minhash_family_fingerprint(3, BANDS, ROWS)
    spark.sql(
        "ALTER TABLE neardup_probe_idx SET TBLPROPERTIES "
        f"('gw.minhash_family'='{fp}')"
    )
    idx_bucketed = dedup.load_minhash_index(
        spark, "neardup_probe_idx", bands=BANDS, rows=ROWS
    )

    # batch: 50k exact twins of corpus ids 0..50k, 50k disjoint-universe
    batch = spark.range(N_BATCH).select(
        (F.col("id") + N_CORPUS).alias("doc_id"),
        F.when(F.col("id") < N_TWINS, text_expr("w")).otherwise(
            text_expr("z")
        ).alias("text"),
    ).persist()
    batch.count()

    # interleave A/B twice so neither layout owns the colder window
    walls = {"plain": [], "bucketed": []}
    for _ in range(2):
        walls["plain"].append(audit("plain-parquet", idx_plain, batch))
        walls["bucketed"].append(audit("bucketed    ", idx_bucketed, batch))
    a, b = min(walls["plain"]), min(walls["bucketed"])
    print(
        f"RESULT corpus={N_CORPUS} index_rows={n_idx} batch={N_BATCH} "
        f"twins={N_TWINS} build={t_build:.1f}s "
        f"audit_plain={a:.1f}s audit_bucketed={b:.1f}s speedup={a / b:.2f}x"
    )
    spark.sql("DROP TABLE IF EXISTS neardup_probe_idx")
    shutil.rmtree(plain_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
