"""Checkpointed tiling sink: manifest metrics, mid-job kill/restart resume,
salted hot-tile writes (reference resume semantics:
``/root/reference/src/geowombat/backends/rasterio_.py:131-135`` per-window
files; ``/root/reference/src/geowombat/tasks/pipeline.py:176`` output-exists
short-circuit)."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geowombat_spark.plans import checkpoint as cp


@pytest.fixture()
def sink_dir():
    d = tempfile.mkdtemp(prefix="gw_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus(spark):
    """Skewed synthetic corpus: 12 tiles, tile 3 is 20x hotter."""
    base = spark.range(6000).withColumnRenamed("id", "doc_id")
    df = base.withColumns(
        {
            "tile_id": F.when(F.col("doc_id") < 4000, F.lit(3)).otherwise(
                F.col("doc_id") % 12
            ),
            "cell_id": F.col("doc_id") * 7 % 100000,
            "value": (F.col("doc_id") % 251).cast("double"),
        }
    )
    return df.cache()


def _stored(spark, path):
    return spark.read.option("basePath", path).parquet(path)


def test_full_write_and_manifest(spark, corpus, sink_dir):
    man = cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=5)
    got = _stored(spark, sink_dir)
    assert got.count() == corpus.count()
    # manifest covers every tile with correct counts
    mrows = {r["tile_id"]: r["row_count"] for r in man.collect()}
    exp = {
        r["tile_id"]: r["n"]
        for r in corpus.groupBy("tile_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert mrows == exp
    # audit passes
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0


def test_kill_and_resume(spark, corpus, sink_dir):
    # die after the first batch (5 of 12 tiles committed)
    with pytest.raises(RuntimeError, match="fault injection"):
        cp.write_tiled_checkpointed(
            corpus, sink_dir, batch_tiles=5, fail_after_batches=1
        )
    committed = cp.completed_tiles(spark, sink_dir)
    assert 0 < len(committed) < 12
    # resume: completes only the pending tiles
    man = cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=5)
    assert {r["tile_id"] for r in man.collect()} == {
        r["tile_id"] for r in corpus.select("tile_id").distinct().collect()
    }
    # content identical to the input — nothing lost, nothing duplicated
    got = _stored(spark, sink_dir).select("doc_id", "tile_id", "cell_id", "value")
    assert (
        got.exceptAll(corpus.select("doc_id", "tile_id", "cell_id", "value")).count()
        == 0
    )
    assert (
        corpus.select("doc_id", "tile_id", "cell_id", "value").exceptAll(got).count()
        == 0
    )
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0


def test_resume_is_idempotent(spark, corpus, sink_dir):
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=5)
    n_files = len(glob.glob(os.path.join(sink_dir, "tile_id=*", "*.parquet")))
    # a second identical run finds nothing pending and writes nothing
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=5)
    assert (
        len(glob.glob(os.path.join(sink_dir, "tile_id=*", "*.parquet"))) == n_files
    )


def test_orphan_batch_is_replaced(spark, corpus, sink_dir):
    """A kill between data commit and manifest commit leaves orphan tile
    files; the resumed batch's dynamic-partition overwrite replaces them."""
    # forge an orphan: write garbage rows into tile 7's directory with no
    # manifest entry
    orphan = corpus.filter(F.col("tile_id") == 7).withColumn(
        "value", F.lit(-999.0)
    )
    orphan.write.mode("append").partitionBy("tile_id").parquet(sink_dir)
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=5)
    got = _stored(spark, sink_dir).filter(F.col("tile_id") == 7)
    assert got.filter(F.col("value") == -999.0).count() == 0
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0


def test_hot_tile_salting_spreads_files(spark, corpus, sink_dir):
    cp.write_tiled_checkpointed(
        corpus, sink_dir, batch_tiles=12, salt_threshold=1000, n_salt=4
    )
    hot_files = glob.glob(os.path.join(sink_dir, "tile_id=3", "*.parquet"))
    cold_files = glob.glob(os.path.join(sink_dir, "tile_id=5", "*.parquet"))
    assert len(hot_files) >= 3  # hot tile fanned out over salt tasks
    assert len(cold_files) == 1  # cold tiles keep one file
    # salting never changes content
    got = _stored(spark, sink_dir)
    assert got.count() == corpus.count()
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0
    # every file is sort_col-ordered even with multi-tile/salted tasks —
    # guaranteed by leading the within-partition sort with tile_id (the
    # writer's required ordering; without it the writer inserts its own
    # non-stable tile_id sort and the data-skipping run order is luck)
    import pyarrow.parquet as papq

    for f in hot_files + cold_files:
        cells = papq.read_table(f, columns=["cell_id"])["cell_id"].to_pylist()
        assert cells == sorted(cells)


def test_hilbert_tile_order_batches_are_compact(spark, corpus, sink_dir):
    """tile_order='hilbert' writes the same complete dataset, and each
    batch covers a Hilbert-contiguous (spatially compact) tile block."""
    man = cp.write_tiled_checkpointed(
        corpus, sink_dir, batch_tiles=4, tile_order="hilbert", tiles_x=4
    )
    got = _stored(spark, sink_dir)
    assert got.count() == corpus.count()
    assert man.count() == 12

    from geowombat_spark.grid import hilbert_encode

    # reconstruct the batch walk: tiles sorted by hilbert key, chunks of 4
    import numpy as np

    tiles = np.array(sorted(r[0] for r in corpus.select("tile_id").distinct().collect()))
    # same minimal-order formula as the sink (plans/checkpoint.py): smallest
    # p with 2^p > max coordinate — the test must reconstruct the very walk
    # the sink committed, not a different-order curve
    order = max(
        int((tiles // 4).max()), int((tiles % 4).max())
    ).bit_length()
    hkey = hilbert_encode(tiles // 4, tiles % 4, max(order, 1))
    walk = [t for _, t in sorted(zip(hkey.tolist(), tiles.tolist()))]
    for i in range(0, len(walk), 4):
        batch = walk[i : i + 4]
        rows = tiles[np.isin(tiles, batch)] // 4
        cols = tiles[np.isin(tiles, batch)] % 4
        # compact: the bounding box of a 4-tile hilbert walk segment stays
        # small even when the lattice has gaps (12 of 16 tiles exist)
        area = (rows.max() - rows.min() + 1) * (cols.max() - cols.min() + 1)
        assert area <= 8
    # the committed manifest batches must be exactly the reconstructed walk
    man_batches = {
        int(r["tile_id"]): int(r["batch_id"]) for r in man.collect()
    }
    for i in range(0, len(walk), 4):
        for t in walk[i : i + 4]:
            assert man_batches[int(t)] == i // 4


def test_hilbert_tile_order_requires_tiles_x(spark, corpus, sink_dir):
    with pytest.raises(ValueError):
        cp.write_tiled_checkpointed(corpus, sink_dir, tile_order="hilbert")


def test_audit_catches_input_vs_stored_drift(spark, corpus, sink_dir):
    """The input leg of the three-way audit: if the input plan has rows
    the write never saw (the dropped-rows scenario the circular
    stored-vs-manifest check can't detect), the audit flags the tile."""
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=6)
    extra = spark.createDataFrame(
        [(999999, 5, 123, 1.0)], "doc_id long, tile_id long, cell_id long, value double"
    )
    drifted = corpus.unionByName(extra)
    bad = cp.verify_against_manifest(drifted, spark, sink_dir).collect()
    assert len(bad) == 1 and bad[0]["tile_id"] == 5


def test_audit_requires_manifest(spark, corpus, sink_dir):
    """A plain parquet dir without a manifest is a loud error, not an
    AttributeError (and not a silent pass)."""
    corpus.write.mode("overwrite").partitionBy("tile_id").parquet(sink_dir)
    with pytest.raises(ValueError, match="no manifest"):
        cp.verify_against_manifest(corpus, spark, sink_dir)


def test_hilbert_order_empty_input(spark, sink_dir):
    """Empty input with tile_order='hilbert' writes an empty manifest
    instead of crashing on a zero-size coordinate array."""
    empty = spark.createDataFrame(
        [], "doc_id long, tile_id long, cell_id long, value double"
    )
    man = cp.write_tiled_checkpointed(
        empty, sink_dir, tile_order="hilbert", tiles_x=4
    )
    assert man is None or man.count() == 0


def test_audit_catches_payload_mutation(spark, corpus, sink_dir):
    """The content checksum covers PAYLOAD columns, not just the keys: a
    corruption that mutates `value` while preserving doc_id/cell_id (a
    key-only checksum would certify it) flags every affected tile."""
    cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=6)
    mutated = corpus.withColumn(
        "value",
        F.when(F.col("tile_id") == 5, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    bad = cp.verify_against_manifest(mutated, spark, sink_dir).collect()
    assert {r["tile_id"] for r in bad} == {5}


def test_resume_continues_batch_lineage(spark, corpus, sink_dir):
    """A resumed write labels its batches AFTER the crashed run's max
    batch_id — the manifest's batch walk is one monotone sequence, never
    two disjoint tile sets both labeled batch 0."""
    with pytest.raises(RuntimeError):
        cp.write_tiled_checkpointed(
            corpus, sink_dir, batch_tiles=4, fail_after_batches=1
        )
    first = {
        int(r["batch_id"])
        for r in cp.read_manifest(spark, sink_dir).collect()
    }
    man = cp.write_tiled_checkpointed(corpus, sink_dir, batch_tiles=4)
    ids = [int(r["batch_id"]) for r in man.orderBy("batch_id").collect()]
    resumed = set(ids) - first
    assert first == {0}
    assert resumed and min(resumed) == 1  # continues, does not restart
    assert cp.verify_against_manifest(corpus, spark, sink_dir).count() == 0


def test_sink_missing_columns_fail_fast(spark, sink_dir):
    agg = spark.createDataFrame([(1, 2.0)], "tile_id long, stat double")
    with pytest.raises(ValueError, match="requires columns"):
        cp.write_tiled_checkpointed(agg, sink_dir)


def test_null_tile_id_raises_named_error(spark, tmp_path):
    """A NULL tile key fails loudly with an actionable message — not a
    bare TypeError in the pre-pass, and never a silent drop (NULL rows
    belong to no batch and would simply not be written)."""
    d = spark.createDataFrame(
        [(1, 0, 1.0), (2, None, 2.0)],
        "doc_id bigint, tile_id bigint, value double",
    ).withColumn("cell_id", F.col("doc_id"))
    with pytest.raises(ValueError, match="NULL tile_id"):
        cp.write_tiled_checkpointed(d, str(tmp_path / "nulltile"))
