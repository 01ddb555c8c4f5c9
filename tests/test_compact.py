"""Tile compaction (Iceberg ``rewrite_data_files`` analogue,
``plans/compact.py``): fragmented salted writes collapse to the target
file count with bit-identical content, manifest lineage extends, interrupted
swaps recover. The reference never needed this — its windowed writer
(``/root/reference/src/geowombat/backends/rasterio_.py:131-135``) emits one
file per window and never appends; the Spark sink's salting/appends/resume
are what create fragmentation."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geowombat_spark.plans import checkpoint as cp
from geowombat_spark.plans import compact as cx


@pytest.fixture()
def sink_dir():
    d = tempfile.mkdtemp(prefix="gw_compact_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus(spark):
    """12 tiles, tile 3 is hot (4000 of 6000 rows)."""
    base = spark.range(6000).withColumnRenamed("id", "doc_id")
    return base.withColumns(
        {
            "tile_id": F.when(F.col("doc_id") < 4000, F.lit(3)).otherwise(
                F.col("doc_id") % 12
            ),
            "cell_id": F.col("doc_id") * 7 % 100000,
            "value": (F.col("doc_id") % 251).cast("double"),
        }
    ).cache()


def _fragmented_write(corpus, sink_dir):
    """salt_threshold=0 marks EVERY tile hot ⇒ n_salt files per tile."""
    cp.write_tiled_checkpointed(
        corpus, sink_dir, batch_tiles=6, salt_threshold=0, n_salt=4
    )


def _rows(spark, path):
    return (
        spark.read.option("basePath", path)
        .parquet(path)
        .select("doc_id", "tile_id", "cell_id", "value")
    )


def test_compact_to_one_file_per_tile(spark, corpus, sink_dir):
    _fragmented_write(corpus, sink_dir)
    before = cx.tile_file_stats(sink_dir)
    assert all(s["n_files"] > 1 for s in before.values())

    report = {r["tile_id"]: r for r in cx.compact_tiles(spark, sink_dir).collect()}
    after = cx.tile_file_stats(sink_dir)
    assert set(report) == set(before)
    for t, s in after.items():
        assert s["n_files"] == 1
        assert report[t]["files_before"] == before[t]["n_files"]
        assert report[t]["files_after"] == 1

    # content bit-identical: nothing lost, duplicated, or mutated
    got = _rows(spark, sink_dir)
    src = corpus.select("doc_id", "tile_id", "cell_id", "value")
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0
    # the three-way manifest audit still passes after compaction (the
    # 'compacted' rows carry identical checksum/lineage by construction)
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0
    man = cp.read_manifest(spark, sink_dir)
    statuses = {r["status"] for r in man.select("status").distinct().collect()}
    assert statuses == {"ok", "compacted"}
    # batch lineage stays a single monotone sequence across the two phases
    ok_max = man.filter("status='ok'").agg(F.max("batch_id")).collect()[0][0]
    cmp_min = man.filter("status='compacted'").agg(F.min("batch_id")).collect()[0][0]
    assert cmp_min > ok_max


def test_target_rows_keeps_big_tiles_split(spark, corpus, sink_dir):
    """A hot tile must NOT collapse to one giant file: with
    target_rows_per_file the tile keeps ceil(rows/target) files (compaction
    targets file size, not file count — rebuilding the skew the sink's
    salting removed would be a regression at scale)."""
    _fragmented_write(corpus, sink_dir)
    report = cx.compact_tiles(
        spark, sink_dir, target_rows_per_file=1500
    ).collect()
    after = cx.tile_file_stats(sink_dir)
    # tile 3 has 4000 rows -> ceil(4000/1500) = 3 files; cold tiles ~180 rows -> 1
    assert after[3]["n_files"] == 3
    for t, s in after.items():
        if t != 3:
            assert s["n_files"] == 1
    got = _rows(spark, sink_dir)
    src = corpus.select("doc_id", "tile_id", "cell_id", "value")
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0
    # tiles already at/below target are not rewritten again
    again = cx.compact_tiles(spark, sink_dir, target_rows_per_file=1500)
    assert again.count() == 0


def test_oversized_file_reselected(spark, corpus, sink_dir):
    """A lopsided tile whose file COUNT already equals ceil(rows/target)
    but whose largest file exceeds target must still be rewritten (one
    2999-row + one 1-row file at target 1500 is exactly the skew the
    option bounds) — and the rewrite is idempotent."""
    t0 = corpus.filter((F.col("tile_id") == 3) & (F.col("doc_id") < 3000))
    big = t0.filter(F.col("doc_id") < 2999)
    one = t0.filter(F.col("doc_id") == 2999)
    for part in (big, one):
        (
            part.coalesce(1)
            .write.mode("append")
            .partitionBy("tile_id")
            .parquet(sink_dir)
        )
    before = cx.tile_file_stats(sink_dir)
    assert before[3]["n_files"] == 2  # already at ceil(3000/1500)
    rep = cx.compact_tiles(spark, sink_dir, target_rows_per_file=1500)
    assert [r["tile_id"] for r in rep.collect()] == [3]
    import pyarrow.dataset as pads

    per_file = [
        frag.count_rows()
        for frag in pads.dataset(
            os.path.join(sink_dir, "tile_id=3"), format="parquet"
        ).get_fragments()
    ]
    assert sorted(per_file) == [1500, 1500]
    # bounded files ⇒ neither selection branch fires again
    assert cx.compact_tiles(spark, sink_dir, target_rows_per_file=1500).count() == 0


def test_midswap_failure_recovers_immediately(
    spark, corpus, sink_dir, monkeypatch
):
    """An in-process exception between rename-aside and rename-in must not
    leave the tile hidden until some later compaction call: _compact_batch's
    error path runs recovery itself, so every row is readable the moment
    the exception surfaces."""
    _fragmented_write(corpus, sink_dir)
    src_count = corpus.count()
    victim = os.path.join(sink_dir, "tile_id=5")
    real_rename = os.rename

    def failing_rename(src, dst):
        if dst == victim and cx.PRECOMPACT_PREFIX not in src:
            raise OSError(28, "No space left on device (injected)")
        real_rename(src, dst)

    monkeypatch.setattr(cx.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        cx.compact_tiles(spark, sink_dir)
    monkeypatch.undo()
    # no hidden asides or staging dirs remain, and no rows are lost
    leftovers = [
        e.name
        for e in os.scandir(sink_dir)
        if e.name.startswith((cx.PRECOMPACT_PREFIX, "_compact-stage-"))
    ]
    assert leftovers == []
    assert _rows(spark, sink_dir).count() == src_count
    # a clean retry finishes the job
    cx.compact_tiles(spark, sink_dir)
    assert all(
        s["n_files"] == 1 for s in cx.tile_file_stats(sink_dir).values()
    )
    got = _rows(spark, sink_dir)
    src = corpus.select("doc_id", "tile_id", "cell_id", "value")
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0


def test_compact_is_idempotent_and_scoped(spark, corpus, sink_dir):
    _fragmented_write(corpus, sink_dir)
    # scoped: only the requested tile is rewritten
    rep = cx.compact_tiles(spark, sink_dir, tiles=[3]).collect()
    assert [r["tile_id"] for r in rep] == [3]
    stats = cx.tile_file_stats(sink_dir)
    assert stats[3]["n_files"] == 1
    assert any(s["n_files"] > 1 for t, s in stats.items() if t != 3)
    # full pass compacts the rest; second full pass is a no-op
    cx.compact_tiles(spark, sink_dir)
    assert cx.compact_tiles(spark, sink_dir).count() == 0


def test_recover_rolls_back_interrupted_swap(spark, corpus, sink_dir):
    _fragmented_write(corpus, sink_dir)
    src_count = corpus.count()
    # simulate a crash between rename-aside and rename-in for tile 5:
    # the live dir is gone, only the hidden _precompact dir remains
    live = os.path.join(sink_dir, "tile_id=5")
    aside = os.path.join(sink_dir, f"{cx.PRECOMPACT_PREFIX}5-deadbeef")
    os.rename(live, aside)
    # readers ignore the hidden dir: rows are missing, never doubled
    assert _rows(spark, sink_dir).count() < src_count
    out = cx.recover_compaction(sink_dir)
    assert out["rolled_back"] == [5]
    assert _rows(spark, sink_dir).count() == src_count

    # completed-swap leftover (live dir present): cleaned, content intact
    aside2 = os.path.join(sink_dir, f"{cx.PRECOMPACT_PREFIX}7-cafe")
    shutil.copytree(os.path.join(sink_dir, "tile_id=7"), aside2)
    out2 = cx.recover_compaction(sink_dir)
    assert out2 == {"rolled_back": [], "cleaned": [7]}
    assert not os.path.exists(aside2)
    # compact_tiles runs recovery implicitly, then compacts as usual
    os.rename(
        os.path.join(sink_dir, "tile_id=5"),
        os.path.join(sink_dir, f"{cx.PRECOMPACT_PREFIX}5-f00d"),
    )
    cx.compact_tiles(spark, sink_dir)
    got = _rows(spark, sink_dir)
    src = corpus.select("doc_id", "tile_id", "cell_id", "value")
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0


def test_streaming_append_fragmentation_then_compact(spark, corpus, sink_dir):
    """The real 100 TB scenario: repeated appends to the same tiles (what a
    micro-batch writer produces) → many small files → one compaction pass
    restores the layout without touching row content."""
    src = corpus.select("doc_id", "tile_id", "cell_id", "value")
    # splitter must be independent of the tile key (doc_id % 12): doc_id % 3
    # would starve tiles of chunks, so split on doc_id div 12 instead
    for chunk in range(3):
        (
            src.filter(F.expr("doc_id div 12") % 3 == chunk)
            .repartition(F.col("tile_id"))
            .write.mode("append")
            .partitionBy("tile_id")
            .parquet(sink_dir)
        )
    before = cx.tile_file_stats(sink_dir)
    assert all(s["n_files"] >= 3 for s in before.values())
    cx.compact_tiles(spark, sink_dir)
    after = cx.tile_file_stats(sink_dir)
    assert all(s["n_files"] == 1 for s in after.values())
    got = _rows(spark, sink_dir)
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0
    # within-file ordering restored for data skipping: each compacted file's
    # cell_id values are sorted
    import pyarrow.parquet as papq

    f = sorted(glob.glob(os.path.join(sink_dir, "tile_id=3", "*.parquet")))[0]
    cells = papq.read_table(f, columns=["cell_id"])["cell_id"].to_pylist()
    assert cells == sorted(cells)


def test_manifest_compaction(spark, corpus, sink_dir):
    """The manifest is itself a small-file producer (one parquet per batch):
    compact_manifest packs it to one file, preserving every row, and resume
    semantics (completed_tiles) are unchanged."""
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=2)  # 6 batches
    mp = os.path.join(sink_dir, "_manifest")
    n_before = sum(
        1 for f in os.scandir(mp)
        if f.is_file() and not f.name.startswith((".", "_"))
    )
    assert n_before >= 6
    rows_before = sorted(map(tuple, cp.read_manifest(spark, sink_dir).collect()))
    done_before = cp.completed_tiles(spark, sink_dir)

    assert cx.compact_manifest(spark, sink_dir) == n_before
    n_after = sum(
        1 for f in os.scandir(mp)
        if f.is_file() and not f.name.startswith((".", "_"))
    )
    assert n_after == 1
    assert sorted(map(tuple, cp.read_manifest(spark, sink_dir).collect())) == rows_before
    assert cp.completed_tiles(spark, sink_dir) == done_before
    # second pass is a no-op (already one file)
    assert cx.compact_manifest(spark, sink_dir) == 1
    # the audit still holds end to end
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0


def test_manifest_midswap_failure_recovers_immediately(
    spark, corpus, sink_dir, monkeypatch
):
    """compact_manifest's swap has the same contract as the tile swap: an
    in-process failure between rename-out and rename-in restores the
    manifest before the exception surfaces (a manifest-less dataset makes
    a resumed sink rewrite everything)."""
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=2)
    mp = os.path.join(sink_dir, "_manifest")
    done = cp.completed_tiles(spark, sink_dir)
    real_rename = os.rename

    def failing_rename(src, dst):
        if dst == mp and "_manifest-stage-" in src:
            raise OSError(28, "No space left on device (injected)")
        real_rename(src, dst)

    monkeypatch.setattr(cx.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        cx.compact_manifest(spark, sink_dir)
    monkeypatch.undo()
    leftovers = [
        e.name
        for e in os.scandir(sink_dir)
        if e.name.startswith(("_manifest-old-", "_manifest-stage-"))
    ]
    assert leftovers == []
    assert cp.completed_tiles(spark, sink_dir) == done
    # a clean retry packs the log as usual
    assert cx.compact_manifest(spark, sink_dir) > 1
    assert cp.completed_tiles(spark, sink_dir) == done


def test_recover_restores_missing_manifest(spark, corpus, sink_dir):
    """A crash between the manifest swap renames must not leave the dataset
    manifest-less (a resumed sink would rewrite everything): recovery
    restores the aside copy."""
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=6)
    mp = os.path.join(sink_dir, "_manifest")
    done = cp.completed_tiles(spark, sink_dir)
    os.rename(mp, os.path.join(sink_dir, "_manifest-old-deadbeef"))
    assert cp.read_manifest(spark, sink_dir) is None
    out = cx.recover_compaction(sink_dir)
    assert out["rolled_back"] == ["manifest"]
    assert cp.completed_tiles(spark, sink_dir) == done
    # completed-swap leftover: cleaned, manifest untouched
    shutil.copytree(mp, os.path.join(sink_dir, "_manifest-old-cafe"))
    out2 = cx.recover_compaction(sink_dir)
    assert out2["cleaned"] == ["manifest"]
    assert cp.completed_tiles(spark, sink_dir) == done


def test_null_partition_dir_skipped_not_crashed(spark, corpus, sink_dir):
    """A dataset written with a NULL tile_id row carries a
    'tile_id=__HIVE_DEFAULT_PARTITION__' directory whose partition value
    has no int key: stats/compaction must skip it (left uncompacted),
    not ValueError before doing any work."""
    _fragmented_write(corpus, sink_dir)
    nulldir = os.path.join(sink_dir, "tile_id=__HIVE_DEFAULT_PARTITION__")
    os.makedirs(nulldir)
    with open(os.path.join(nulldir, "part-00000.parquet"), "wb") as f:
        f.write(b"not read by stats")
    stats = cx.tile_file_stats(sink_dir)
    assert all(isinstance(t, int) for t in stats)
    cx.compact_tiles(spark, sink_dir)
    after = cx.tile_file_stats(sink_dir)
    assert all(s["n_files"] == 1 for s in after.values())
    # the null-key dir is untouched
    assert os.path.exists(os.path.join(nulldir, "part-00000.parquet"))


def test_compact_generic_table_without_cell_id(spark, sink_dir):
    """compact_tiles on an arbitrary tile-partitioned dataset (no
    cell_id column — the generic id_col/sort_col surface): the audit
    checksum keys on id alone instead of raising UNRESOLVED_COLUMN."""
    base = (
        spark.range(1200)
        .withColumnRenamed("id", "rec_id")
        .withColumns(
            {
                "tile_id": F.col("rec_id") % 5,
                "payload": (F.col("rec_id") * 3 % 97).cast("double"),
            }
        )
    )
    base.repartition(12).write.partitionBy("tile_id").parquet(
        sink_dir, mode="overwrite"
    )
    assert sum(s["n_files"] for s in cx.tile_file_stats(sink_dir).values()) > 5
    rep = cx.compact_tiles(spark, sink_dir, id_col="rec_id", sort_col="rec_id")
    assert rep.count() == 5
    after = cx.tile_file_stats(sink_dir)
    assert all(s["n_files"] == 1 for s in after.values())
    got = (
        spark.read.option("basePath", sink_dir)
        .parquet(sink_dir)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("payload").alias("s"),
        )
        .collect()[0]
    )
    assert got["n"] == 1200
    exp = base.agg(F.sum("payload")).collect()[0][0]
    assert got["s"] == exp
