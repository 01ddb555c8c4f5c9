"""Physical-plan contract pins — the scale guarantees value tests can't see.

A plan that silently loses partition pruning, filter pushdown, column
pruning, or a broadcast still returns correct answers at test scale while
becoming a full-scan or shuffle catastrophe at 100 TB. These tests pin the
plan SHAPE: they read Spark's physical plan string (the same text
``.explain`` prints) and assert the load-bearing operators are present —
and the catastrophic ones absent — so a regression shows up as a red test
at sf0.001 instead of a cluster incident at corpus scale.

Reference parity note: the reference gets the equivalent guarantees from
windowed rasterio reads (``backends/rasterio_.py``) — only requested
windows/bands are read. Here the same promises are Catalyst's job, so the
pins watch Catalyst output.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowombat_spark.grid import L8_GRID
from geowombat_spark.operators import sops
from geowombat_spark.operators.extract import extract_points


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_extract_broadcasts_aoi_no_corpus_shuffle(spark, docs, aoi_points_pdf):
    """extract joins a tiny AOI against the corpus: the AOI must be the
    broadcast side (zero corpus shuffle). A SortMergeJoin here would
    shuffle the full 100 TB corpus on cell_id to join 1024 points."""
    plan = _plan(extract_points(spark, docs, aoi_points_pdf, L8_GRID))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_subset_prunes_partitions_and_pushes_filters(docs):
    """gw.subset is a bbox read: the tile predicate must reach the scan as
    a PARTITION filter (directories never listed) and the row/col range as
    PUSHED filters (row groups skipped by min/max stats). If either
    regresses to a post-scan Filter, every query reads the whole corpus."""
    g = L8_GRID
    out = sops.subset(docs, g, left=g.left + 2 * g.cellx,
                      top=g.top - 2 * g.celly, rows=64, cols=64)
    scans = _scan_lines(_plan(out))
    assert scans, "expected a parquet scan in the subset plan"
    scan = scans[0]
    pf = scan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "tile_id" in pf[1].split("]", 1)[0]
    pushed = scan.split("PushedFilters: [", 1)
    assert len(pushed) == 2
    pushed_body = pushed[1].split("]", 1)[0]
    assert "row" in pushed_body and "col" in pushed_body


def test_column_pruning_reaches_scan(docs):
    """A two-column projection must scan two columns: parquet is columnar,
    and reading unused band/span columns multiplies IO by the full row
    width. ReadSchema is the scan's actual IO contract."""
    out = docs.select("doc_id", "band_blue").filter(F.col("band_blue") > 0)
    scan = _scan_lines(_plan(out))[0]
    schema = scan.split("ReadSchema: ", 1)[1]
    assert "doc_id" in schema and "band_blue" in schema
    for heavy in ("spans", "band_green", "band_red", "band_nir"):
        assert heavy not in schema, f"column pruning lost: scan reads {heavy}"


def test_aggregation_has_map_side_combine(docs):
    """groupBy aggregates must partial-aggregate before the exchange
    (map-side combine): shuffling raw rows instead of per-partition
    partials moves the full corpus through the shuffle."""
    out = docs.groupBy("tile_id").agg(F.sum("band_blue").alias("s"))
    plan = _plan(out)
    assert "partial_sum" in plan
    # exactly one exchange: partial -> shuffle by key -> final
    n_exchange = plan.count("Exchange ")
    assert n_exchange == 1, f"expected 1 shuffle, plan has {n_exchange}"


def test_band_math_stays_in_codegen(docs):
    """Band math is Column arithmetic: it must run inside whole-stage
    codegen (JVM, vectorized), not fall out to an interpreted project or a
    Python UDF (BatchEvalPython = per-row Python in the hot path)."""
    from geowombat_spark.functions import vi

    # the test corpus carries blue/green/red; norm_diff over any two bands
    # exercises the same Column-arithmetic path as ndvi/evi/etc.
    plan = _plan(vi.norm_diff(docs, "band_green", "band_red", out="nd"))
    # executedPlan().toString() marks codegen stages with "*(n) " prefixes
    # (the treeString form of WholeStageCodegen)
    assert "*(1) Project" in plan
    assert "BatchEvalPython" not in plan


ENTRY_LAZY_QUERIES = [
    # join-bearing and agg-bearing driver queries whose builders are
    # side-effect-free enough to plan at sf0.001 (no sinks, no ML training,
    # no streaming); together they cover every join family in the engine
    "q_extract_points",
    "q_extract_polygons",
    "q_extract_touched",
    "q_clip",
    "q_subset",
    "q_mask",
    "q_knn_join",
    "q_near_pairs",
    "q_mosaic",
    "q_concat",
    "q_band_math",
    "q_lineitem_pricing",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_jaccard_pairs",
    "q_decontaminate",
    "q_bm25",
    "q_ann_topk",
    "q_group_dates",
    "q_quality_buckets",
]


@pytest.mark.parametrize("qname", ENTRY_LAZY_QUERIES)
def test_no_cartesian_product_in_driver_queries(spark, qname):
    """No driver query may plan a CartesianProduct: at corpus scale an
    unintended cartesian is the difference between a job and an outage.
    (Scalar-broadcast crossJoins compile to BroadcastNestedLoopJoin over a
    1-row side — bounded and allowed; CartesianProduct is not.)"""
    import __spark_entry__ as entry

    df = entry.queries()[qname](spark, "/root/testdata/sf0.001")
    assert "CartesianProduct" not in _plan(df), qname


def test_extract_plan_row_parity(spark, docs, aoi_points_pdf):
    """The broadcast plan shape above must coexist with correctness: the
    same frame whose plan was pinned returns the golden row count (guards
    against pinning the plan of a frame that silently changed meaning)."""
    out = extract_points(spark, docs, aoi_points_pdf, L8_GRID)
    assert out.count() == 6
    assert np.isfinite(out.toPandas()["blue"]).all()
