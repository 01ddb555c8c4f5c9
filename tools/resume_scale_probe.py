"""Mid-job kill/resume scale probe for the checkpointed tiling sink.

North-rule evidence (BASELINE.json: "resumable from checkpoint with
per-partition lineage + metrics"): a job that dies halfway through its
batch walk must resume for the cost of the PENDING tiles only — never a
restart — and the resumed dataset must be indistinguishable from an
uninterrupted run. The unit tests (tests/test_checkpoint.py) pin the
semantics with fault injection at fixture scale; this probe demonstrates
the property at bench scale (the ~8M-doc flagship sink slice) with
measured wall times:

  1. clean run      -> wall_clean, manifest M0
  2. crashed run    -> fail_after_batches = half the batch walk
  3. resumed run    -> wall_resume, manifest M1

Asserts:
  * the crash left exactly the first half of the batches committed
    (manifest rows == tiles of the committed batches, batch ids 0..k-1)
  * resume completed ONLY the pending tiles (its new rows' batch ids
    continue the lineage: min new id == k, ids monotone, no tile written
    twice)
  * M1 and M0 agree tile-for-tile on row_count AND content checksum
    (the resumed dataset is byte-equivalent in audited content)
  * wall_resume is materially below wall_clean (O(pending), not O(all)) —
    reported, with the pending fraction, rather than hard-asserted, since
    this shared host has documented 1.3-1.9x noise windows.

Run: python tools/resume_scale_probe.py
Deterministic: the corpus is bench.synth_corpus (no RNG, no external data).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geowombat_spark.plans import checkpoint as cp  # noqa: E402


def manifest_key(mdf) -> dict[int, tuple[int, int]]:
    """tile_id -> (row_count, checksum) for cross-run comparison."""
    return {
        int(r["tile_id"]): (int(r["row_count"]), int(r["checksum"]))
        for r in mdf.collect()
    }


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "10000000"))
    spark = bench.build_spark(app="gw-resume-probe")
    spark.sparkContext.setLogLevel("ERROR")
    path = bench.ensure_corpus(spark, n_docs)
    docs = spark.read.parquet(path)

    # the same ~8M-doc slice the bench sink writes
    slice_tiles = 2_000_000 // (bench.FLAG_TILE * bench.FLAG_TILE) + 1
    grid = bench.flagship_grid(n_docs)
    keep = [t for t in range(slice_tiles * grid.tiles_x)][
        : max(slice_tiles * 4, 64)
    ]
    sub = docs.filter(F.col("tile_id").isin(keep))

    batch_tiles = 32  # a real batch walk: ~8 batches over ~256 tiles
    n_batches = (len(keep) + batch_tiles - 1) // batch_tiles
    half = n_batches // 2

    base = os.path.join(bench.CACHE_DIR, "resume_probe")
    clean_dir, crash_dir = base + "_clean", base + "_crash"
    for d in (clean_dir, crash_dir):
        shutil.rmtree(d, ignore_errors=True)

    # warm the lazily-built machinery so wall_clean vs wall_resume compares
    # plan cost, not first-touch session startup
    warm_dir = base + "_warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    cp.write_tiled_checkpointed(
        sub.filter(F.col("tile_id").isin(keep[:4])), warm_dir,
        batch_tiles=batch_tiles,
    )
    shutil.rmtree(warm_dir, ignore_errors=True)

    t0 = time.time()
    m_clean = cp.write_tiled_checkpointed(
        sub, clean_dir, batch_tiles=batch_tiles
    )
    wall_clean = time.time() - t0
    key_clean = manifest_key(m_clean)

    # crashed run: dies after committing the first half of the batch walk
    try:
        cp.write_tiled_checkpointed(
            sub, crash_dir, batch_tiles=batch_tiles, fail_after_batches=half
        )
        raise AssertionError("fault injection did not fire")
    except RuntimeError:
        pass
    m_partial = cp.read_manifest(spark, crash_dir)
    partial_rows = m_partial.collect()
    committed_tiles = {int(r["tile_id"]) for r in partial_rows}
    committed_batches = {int(r["batch_id"]) for r in partial_rows}
    assert committed_batches == set(range(half)), committed_batches
    assert len(committed_tiles) == half * batch_tiles

    t0 = time.time()
    m_resumed = cp.write_tiled_checkpointed(
        sub, crash_dir, batch_tiles=batch_tiles
    )
    wall_resume = time.time() - t0
    key_resumed = manifest_key(m_resumed)

    # lineage continues: the resumed batches start at `half`, are monotone,
    # and no tile appears twice
    resumed_rows = [
        r for r in m_resumed.collect() if int(r["batch_id"]) >= half
    ]
    resumed_tiles = {int(r["tile_id"]) for r in resumed_rows}
    assert resumed_tiles.isdisjoint(committed_tiles)
    assert committed_tiles | resumed_tiles == set(key_clean)
    assert min(int(r["batch_id"]) for r in resumed_rows) == half

    # the resumed dataset is content-identical to the clean run
    assert key_resumed == key_clean, "manifest mismatch after resume"

    pending_frac = 1.0 - len(committed_tiles) / len(key_clean)
    print(
        f"RESULT docs={sub.count()} tiles={len(key_clean)} "
        f"batches={n_batches} crashed_after={half} "
        f"wall_clean={wall_clean:.1f}s wall_resume={wall_resume:.1f}s "
        f"resume_ratio={wall_resume / wall_clean:.2f} "
        f"pending_frac={pending_frac:.2f} manifests_equal=True"
    )

    for d in (clean_dir, crash_dir):
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
