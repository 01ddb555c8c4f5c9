"""Compaction scale probe: small-file fragmentation at corpus scale and
the maintenance pass that removes it (``plans/compact.py``).

The 100 TB failure mode: a streaming writer (or resumed/salted batch sink)
appends one small file per micro-batch per touched tile. After a day of
5-minute batches every tile holds hundreds of files; scan cost becomes
file-count-bound (task per file + footer fetch per file), not byte-bound.
Iceberg ships ``rewrite_data_files`` precisely for this; ``compact_tiles``
is the shim's equivalent, and this probe measures it beyond toy scale:

  - 4,000,000 rows over 512 tiles, written as 8 appends (one per
    synthetic "micro-batch") ⇒ 512 × 8 = 4,096 files before compaction.
  - ONE ``compact_tiles`` pass (bounded batches of 64 tiles ⇒ 8 batches,
    working set independent of corpus size) ⇒ exactly 512 files after.
  - Scan-cost evidence: the same full-table aggregate is timed against the
    fragmented layout and the compacted layout (identical rows, identical
    result — only the file count differs).

Asserted (structure, not wall-clock):
  - before: every tile has 8 files; after: every tile has exactly 1
  - per-tile row counts identical before/after (nothing lost/duplicated)
  - the compacted files are cell_id-sorted (data-skipping order restored)
  - total aggregate (count, sum) identical on both layouts

Reported (informational): compaction throughput (rows/s), fragmented-scan
vs compacted-scan wall for the same aggregate.
"""
import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from geowombat_spark.sources.tables import get_spark
from geowombat_spark.plans import compact as cx

N = 4_000_000
TILES = 512
CHUNKS = 8

spark = get_spark(app="compact-scale", master="local[16]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.range(N).select(
    F.col("id").alias("doc_id"),
    (F.col("id") % TILES).cast("long").alias("tile_id"),
    (F.col("id") * 7 % 100_000_000).cast("long").alias("cell_id"),
    (F.col("id") % 251).cast("double").alias("value"),
)

root = tempfile.mkdtemp(prefix="gw_compact_probe_")
frag = os.path.join(root, "frag")
try:
    # 8 synthetic micro-batches; splitter (id div TILES) is independent of
    # the tile key so every tile receives rows from every chunk
    t0 = time.time()
    for chunk in range(CHUNKS):
        (
            docs.filter(F.expr(f"id div {TILES}") % CHUNKS == chunk)
            .repartition(F.col("tile_id"))
            .write.mode("append")
            .partitionBy("tile_id")
            .parquet(frag)
        )
    t_write = time.time() - t0

    before = cx.tile_file_stats(frag)
    n_before = sum(s["n_files"] for s in before.values())
    assert len(before) == TILES
    assert all(s["n_files"] == CHUNKS for s in before.values()), "setup broke"

    agg = lambda: tuple(  # noqa: E731
        spark.read.parquet(frag).agg(F.count("*"), F.sum("value")).collect()[0]
    )
    t0 = time.time()
    frag_agg = agg()
    t_scan_frag = time.time() - t0

    rows_before = {
        r[0]: r[1]
        for r in spark.read.parquet(frag).groupBy("tile_id").count().collect()
    }

    t0 = time.time()
    report = cx.compact_tiles(spark, frag, batch_tiles=64)
    t_compact = time.time() - t0
    n_rewritten = report.count()

    after = cx.tile_file_stats(frag)
    n_after = sum(s["n_files"] for s in after.values())
    assert n_rewritten == TILES
    assert all(s["n_files"] == 1 for s in after.values()), "not compacted"

    rows_after = {
        r[0]: r[1]
        for r in spark.read.parquet(frag).groupBy("tile_id").count().collect()
    }
    assert rows_after == rows_before, "row counts changed"

    t0 = time.time()
    comp_agg = agg()
    t_scan_comp = time.time() - t0
    assert comp_agg == frag_agg, "aggregate changed"

    # data-skipping order restored: spot-check 8 compacted files
    import pyarrow.parquet as papq

    for t in range(0, TILES, TILES // 8):
        f = glob.glob(os.path.join(frag, f"tile_id={t}", "*.parquet"))[0]
        cells = papq.read_table(f, columns=["cell_id"])["cell_id"].to_pylist()
        assert cells == sorted(cells), f"tile {t} not sorted"

    # idempotence: second pass is a no-op
    assert cx.compact_tiles(spark, frag, batch_tiles=64).count() == 0

    print(f"rows={N:,} tiles={TILES} chunks={CHUNKS}")
    print(f"files before={n_before} after={n_after}")
    print(f"fragmented write: {t_write:.1f}s")
    print(
        f"compaction: {t_compact:.1f}s over {TILES} tiles in batches of 64 "
        f"({N / t_compact / 1e6:.2f}M rows/s)"
    )
    print(
        f"full-table aggregate: fragmented {t_scan_frag:.2f}s "
        f"vs compacted {t_scan_comp:.2f}s"
    )
    print("COMPACT PROBE OK")
finally:
    shutil.rmtree(root, ignore_errors=True)
