#!/usr/bin/env python
"""Scale-evidence probe for the incremental ingestion pattern: a
1,000,000-doc corpus is summarized ONCE into the exact-dedup content-hash
index (the persistent side), then a 100,000-doc batch — half genuinely
new, half exact duplicates of corpus docs — is audited against it via
dedup_against. Asserts the audit counts exactly; the point is that batch
cost is O(batch) + one index join (no corpus re-scan) and the job
completes with bounded memory at 200x the correctness-fixture scale.

Run: python tools/ingest_scale_probe.py   (deterministic, no RNG)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowombat_spark.pipeline import dedup
from geowombat_spark.sources.tables import get_spark


def text_expr():
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{j}_"),
                ((F.col("id") * (j * 2 + 3)) % 999_983).cast("string"),
            )
            for j in range(25)
        ],
    )


def main() -> None:
    spark = get_spark(
        app="ingest-scale", master="local[16]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_corpus, n_batch = 1_000_000, 100_000
    corpus = spark.range(n_corpus).withColumn("text", text_expr()).select(
        F.col("id").alias("doc_id"), "text"
    )
    t0 = time.time()
    idx = dedup.exact_index(corpus).persist()
    n_idx = idx.count()  # one corpus scan, run once
    t1 = time.time()
    # batch: ids n..n+100k; the first 50k repeat corpus texts verbatim
    # (ids 0..50k — corpus ids cover the full residue system mod 999983,
    # so newness must come from content, not residues), the other 50k get
    # a unique suffix token no corpus doc contains
    base_text = " || ' ' || ".join(
        f"concat('w{j}_', cast((id * {j * 2 + 3}) % 999983 as string))"
        for j in range(25)
    )
    batch = spark.range(n_batch).select(
        (F.col("id") + n_corpus).alias("doc_id"),
        F.when(F.col("id") < 50_000, F.expr(base_text))
        .otherwise(
            F.expr(
                f"{base_text} || ' fresh_' || cast(id as string)"
            )
        )
        .alias("text"),
    )
    audited = dedup.dedup_against(batch, idx).persist()
    got = {
        r["verdict"]: r["n"]
        for r in audited.groupBy(
            F.when(F.col("in_corpus"), "dup_of_corpus")
            .when(F.col("batch_survivor"), "new_kept")
            .otherwise("batch_dup_dropped")
            .alias("verdict")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t2 = time.time()
    print(
        f"RESULT index_rows={n_idx} index_wall={t1 - t0:.1f}s "
        f"batch_wall={t2 - t1:.1f}s verdicts={sorted(got.items())}"
    )
    assert got.get("dup_of_corpus") == 50_000, got
    assert got.get("new_kept") == 50_000, got
    print("ASSERTIONS OK (50k corpus-dups flagged, 50k new kept)")
    spark.stop()


if __name__ == "__main__":
    main()
