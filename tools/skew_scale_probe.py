"""Skew-handling scale probe: a pathologically hot tile through the
checkpointed tiling sink, salted vs unsalted, with STRUCTURAL assertions.

The north-rule requirement is that partitioning/shuffle/skew are handled
explicitly. This probe builds a 2,000,000-doc corpus where ONE tile holds
50% of all rows (1M docs in tile 0; the other million spread uniformly
over 255 tiles, ~3.9k each — a 256x producer skew) and writes it through
``write_tiled_checkpointed`` twice:

  unsalted  salt_threshold=None   -> tile 0 is ONE shuffle partition: a
                                     single task sorts+writes 1M rows while
                                     255 tasks write 4k each (the straggler)
  salted    salt_threshold=100k,  -> tile 0 fans out over n_salt=16 tasks;
            n_salt=16                cold tiles keep one task each

Evidence is structural, not a wall-clock lottery: each shuffle partition
writes exactly one parquet file into its tile directory, so per-file row
counts ARE per-task row counts. Asserted:

  - unsalted: tile 0 = 1 file of 1,000,000 rows (the straggler exists)
  - salted:   tile 0 = 16 files, max file <= 1.3x the ideal 62,500
              (hash(doc_id) spreads within 30% at this N), i.e. the
              slowest task shrank ~14x
  - both datasets hold IDENTICAL per-tile row counts (salting never
    changes WHAT is written, only how many tasks write it)
  - both manifests pass the sink's three-way audit (row_count sum = 2M)

Wall times for both runs are reported (the salted run should win on a
quiet host, but only the structure is asserted).
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from geowombat_spark.sources.tables import get_spark
from geowombat_spark.plans.checkpoint import write_tiled_checkpointed

N = 2_000_000
HOT_TILE_ROWS = N // 2
N_SALT = 16
IDEAL = HOT_TILE_ROWS / N_SALT

spark = get_spark(app="skew-scale", master="local[16]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

# even ids -> tile 0 (the hot producer); odd ids -> uniform over 1..255
docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 255) + 1)
        .cast("long")
        .alias("tile_id"),
        F.col("id").alias("cell_id"),
        F.concat(F.lit("payload for document "), F.col("id")).alias("text"),
    )
)


def tile_files(path: str, tile: int) -> list[int]:
    """Per-file row counts inside one tile directory (= per-task rows)."""
    d = os.path.join(path, f"tile_id={tile}")
    parts = [
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]
    counts = []
    for p in parts:
        counts.append(spark.read.parquet(p).count())
    return sorted(counts, reverse=True)


def per_tile_counts(path: str) -> dict[int, int]:
    rows = (
        spark.read.parquet(path)
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r["tile_id"]): int(r["n"]) for r in rows}


results = {}
for mode, kwargs in (
    ("unsalted", dict(salt_threshold=None)),
    ("salted", dict(salt_threshold=100_000, n_salt=N_SALT)),
):
    out = tempfile.mkdtemp(prefix=f"skew_{mode}_")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    manifest = write_tiled_checkpointed(
        docs, out, id_col="doc_id", batch_tiles=256, **kwargs
    )
    total = manifest.agg(F.sum("row_count")).collect()[0][0]
    wall = time.time() - t0
    assert total == N, (mode, total)
    hot = tile_files(out, 0)
    results[mode] = {
        "wall_s": round(wall, 2),
        "manifest_rows": int(total),
        "hot_tile_files": len(hot),
        "hot_tile_max_task_rows": hot[0],
        "counts": per_tile_counts(out),
        "path": out,
    }
    print(
        f"{mode}: wall {wall:.1f}s, tile-0 files {len(hot)}, "
        f"max task rows {hot[0]:,}"
    )

u, s = results["unsalted"], results["salted"]
assert u["hot_tile_files"] == 1 and u["hot_tile_max_task_rows"] == HOT_TILE_ROWS, u
assert s["hot_tile_files"] == N_SALT, s["hot_tile_files"]
assert s["hot_tile_max_task_rows"] <= IDEAL * 1.3, s["hot_tile_max_task_rows"]
assert u["counts"] == s["counts"], "salting changed WHAT was written"
assert u["counts"][0] == HOT_TILE_ROWS and len(u["counts"]) == 256

print(
    f"OK skew probe: straggler {u['hot_tile_max_task_rows']:,} rows -> "
    f"{s['hot_tile_max_task_rows']:,} rows across {N_SALT} tasks "
    f"({u['hot_tile_max_task_rows'] / s['hot_tile_max_task_rows']:.1f}x "
    f"balance gain); identical per-tile contents; "
    f"wall {u['wall_s']}s unsalted vs {s['wall_s']}s salted"
)
for r in results.values():
    shutil.rmtree(r["path"], ignore_errors=True)
spark.stop()
