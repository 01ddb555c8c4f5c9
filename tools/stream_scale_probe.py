#!/usr/bin/env python
"""Streaming-ingestion scale probe: ``stream_dedup_against`` run over a
10,000,000-event file stream against a 4,000,000-doc corpus exact-index,
~65× the correctness-fixture volume.

Event ledger (deterministic, no RNG):
- 5,000,000 events are verbatim copies of corpus docs, covering docs
  0..4M once plus docs 0..1M a second time — the 4M distinct texts
  survive within-stream dedup and exit flagged ``in_corpus``; the 1M
  second copies are swallowed as within-stream dups;
- 2,500,000 events carry novel unique texts → exit ``kept``;
- 2,500,000 events repeat those novel texts (each novel text appears
  exactly TWICE in the stream, in different files ⇒ usually different
  micro-batches) → swallowed by the watermarked within-stream dedup
  state, regardless of which micro-batch saw the first copy.

Expected output: exactly 6,500,000 rows — 4,000,000 ``in_corpus`` +
2,500,000 ``kept`` — asserted exactly. The static index is persisted in
its prescribed layout (bucketed on ``dup_key``), so each micro-batch's
stream-static join shuffles only the batch, never the 4M-row index.

Run: python tools/stream_scale_probe.py
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowombat_spark.pipeline import dedup
from geowombat_spark.sources.tables import get_spark
from geowombat_spark.streaming.dedup import stream_dedup_against

N_CORPUS = 4_000_000
N_FILES, ROWS_PER_FILE = 20, 500_000  # 10M events
N_EVENTS = N_FILES * ROWS_PER_FILE
RESIDUE_PRIME = 99_999_989
ROOT = "/tmp/gw_stream_scale"


def text_expr(prefix: str, id_col: str = "id"):
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"{prefix}{j}_"),
                (
                    (F.col(id_col) * (j * 2 + 3)) % RESIDUE_PRIME
                ).cast("string"),
            )
            for j in range(12)
        ],
    )


def main() -> None:
    spark = get_spark(
        app="stream-scale", master="local[16]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    shutil.rmtree(ROOT, ignore_errors=True)
    for d in ("in", "out", "ckpt"):
        os.makedirs(f"{ROOT}/{d}", exist_ok=True)

    # static side: 4M-doc corpus summarized once, bucketed on dup_key
    corpus = spark.range(N_CORPUS).select(
        F.col("id").alias("doc_id"), text_expr("w").alias("text")
    )
    spark.sql("DROP TABLE IF EXISTS stream_probe_idx")
    shutil.rmtree(
        os.path.join(wh.removeprefix("file:"), "stream_probe_idx"),
        ignore_errors=True,
    )
    t0 = time.time()
    dedup.save_exact_index(corpus, "stream_probe_idx", n_buckets=32)
    idx = dedup.load_exact_index(spark, "stream_probe_idx")
    print(f"index: {idx.count()} keys in {time.time() - t0:.1f}s")

    # three event legs; files are hash-assigned so a novel text's two
    # copies land in DIFFERENT files (usually different micro-batches) —
    # first-seen state must span batches. The 5M corpus-copy events
    # cover docs 0..4M once plus docs 0..1M a second time; the second
    # copies are ALSO within-stream dups and are swallowed, so distinct
    # corpus texts reaching the join = exactly 4M.
    ev = time.time()
    corpus_leg = spark.range(5_000_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_CORPUS).alias("did"),
    ).select("event_id", text_expr("w", "did").alias("text"))
    novel_first = spark.range(2_500_000).select(
        (F.col("id") + 10_000_000).alias("event_id"),
        text_expr("z").alias("text"),
    )
    novel_second = spark.range(2_500_000).select(
        (F.col("id") + 20_000_000).alias("event_id"),
        text_expr("z").alias("text"),
    )
    events = corpus_leg.unionAll(novel_first).unionAll(novel_second)
    events = events.withColumn(
        "event_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    ).withColumn("bucket", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(N_FILES)))
    for b in range(N_FILES):
        events.filter(F.col("bucket") == b).drop("bucket").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{ROOT}/staging/{b}")
        part = [
            f
            for f in os.listdir(f"{ROOT}/staging/{b}")
            if f.startswith("part-")
        ][0]
        shutil.move(
            f"{ROOT}/staging/{b}/{part}", f"{ROOT}/in/f{b:03d}.parquet"
        )
    print(f"staged {N_EVENTS} events in {time.time() - ev:.1f}s")

    stream = (
        spark.readStream.schema(
            "event_id long, text string, event_ts timestamp"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{ROOT}/in")
    )
    out = stream_dedup_against(
        stream, idx, text_col="text", ts_col="event_ts",
        watermark="1 hour",
    )
    t1 = time.time()
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{ROOT}/out")
        .option("checkpointLocation", f"{ROOT}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t1

    res = spark.read.parquet(f"{ROOT}/out")
    n_out = res.count()
    n_corpus_hits = res.filter(F.col("in_corpus")).count()
    n_kept = res.filter(F.col("kept")).count()
    # within-stream dedup: 4M distinct corpus texts (the 5M corpus-copy
    # events repeat docs 0..1M) + 2.5M distinct novel texts
    assert n_out == 4_000_000 + 2_500_000, n_out
    assert n_corpus_hits == 4_000_000, n_corpus_hits
    assert n_kept == 2_500_000, n_kept
    print(
        f"RESULT events={N_EVENTS} files={N_FILES} out_rows={n_out} "
        f"in_corpus={n_corpus_hits} kept={n_kept} wall={wall:.1f}s "
        f"events_per_sec={N_EVENTS / wall:,.0f}"
    )
    spark.sql("DROP TABLE IF EXISTS stream_probe_idx")
    shutil.rmtree(ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
