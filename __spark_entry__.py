"""Driver contract for the spark-graft builder (PySpark target).

Every operator family from SURVEY.md §2 plus the training-data pipeline ops
is exposed as a ``queries()`` entry with a matching DuckDB ``oracle_sql()``
statement. The spatial operators run over a deterministic affine grid
derived from the ``documents`` table (doc_id → row/col/x/y, band values
from n_chars/doc_id arithmetic), so the identical relation is expressible
in ANSI SQL and every check is a value-level check.

Cross-engine parity rules used throughout (see geowombat_spark/pipeline):
- all hashes are md5-derived int64 arithmetic (identical in both engines);
- every float expression mirrors the same operation order; outputs are
  rounded to 6 dp (both engines round doubles HALF_UP);
- denominators are provably nonzero (Spark 4 runs ANSI mode; DuckDB
  returns NULL on x/0.0 — neither path is ever taken);
- count-like outputs are cast to bigint on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowombat_spark.grid import GridSpec, round_window
from geowombat_spark.operators import extract as ex
from geowombat_spark.operators import focal, knn, mosaic, sample, sops, temporal
from geowombat_spark.functions import vi
from geowombat_spark.pipeline import ann, dedup, multimodal, text

# ---------------------------------------------------------------------------
# The derived grid: doc_id → (row, col) on a 25-column, 30 m affine grid.
# ---------------------------------------------------------------------------

NCOLS = 25
CELL = 30.0

GRID = GridSpec(
    left=0.0,
    top=0.0,
    cellx=CELL,
    celly=CELL,
    nrows=4096,
    ncols=NCOLS,
    tile_rows=8,
    tile_cols=NCOLS,
    nodata=0.0,
)

BANDS = ("band_blue", "band_green", "band_red", "band_nir")


def grid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + derived grid columns (row/col/x/y/tile_id/cell_id/bands).

    The band derivations keep every value ≥ 1 so no nodata collisions and
    no zero denominators exist anywhere downstream.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = d.withColumns(
        {
            "col": (F.col("doc_id") % NCOLS).cast("long"),
            "row": F.expr(f"doc_id div {NCOLS}").cast("long"),
            "band_blue": (F.lit(1) + F.col("n_chars") % 255).cast("double"),
            "band_green": (F.lit(1) + (F.col("doc_id") * 7) % 255).cast("double"),
            "band_red": (F.lit(1) + (F.col("doc_id") * 13 + 5) % 255).cast("double"),
            "band_nir": (F.lit(1) + (F.col("doc_id") * 29 + 11) % 511).cast("double"),
        }
    )
    d = d.withColumns(
        {
            "x": (F.col("col").cast("double") + F.lit(0.5)) * CELL,
            "y": -((F.col("row").cast("double") + F.lit(0.5)) * CELL),
        }
    )
    # encode_cells re-derives row/col (identical values — centers truncate
    # back) and adds the Z-order cell_id + tile partition key.
    return ex.encode_cells(d.drop("row", "col"), GRID)


# The SQL mirror of grid_docs (DuckDB dialect, integer div via //).
G_SQL = f"""
g AS (
  SELECT doc_id, text, lang, source, n_chars,
    CAST(doc_id % {NCOLS} AS BIGINT) AS col,
    CAST(doc_id // {NCOLS} AS BIGINT) AS row,
    (CAST(doc_id % {NCOLS} AS DOUBLE) + 0.5) * {CELL} AS x,
    -((CAST(doc_id // {NCOLS} AS DOUBLE) + 0.5) * {CELL}) AS y,
    CAST(1 + n_chars % 255 AS DOUBLE) AS band_blue,
    CAST(1 + (doc_id * 7) % 255 AS DOUBLE) AS band_green,
    CAST(1 + (doc_id * 13 + 5) % 255 AS DOUBLE) AS band_red,
    CAST(1 + (doc_id * 29 + 11) % 511 AS DOUBLE) AS band_nir
  FROM documents
)"""

# ---------------------------------------------------------------------------
# Fixed AOIs (all coordinates chosen so no cell center sits on an edge)
# ---------------------------------------------------------------------------

AOI_POINTS = [
    (1, 76.3, -22.7),
    (2, 244.9, -95.1),
    (3, 419.9, -171.2),
    (4, 650.0, -310.5),
    (5, 15.0, -555.0),
    (6, 742.1, -588.8),
]

RECT = {  # axis-aligned rectangle polygon, fid=1
    "fid": 1,
    "minx": 95.2,
    "miny": -190.3,
    "maxx": 250.7,
    "maxy": -65.9,
}
RECT_RINGS = [
    [
        RECT["minx"], RECT["maxy"],
        RECT["maxx"], RECT["maxy"],
        RECT["maxx"], RECT["miny"],
        RECT["minx"], RECT["miny"],
    ]
]
# clockwise triangle, fid=2 — interior = all three cross products < 0
TRI = {"ax": 300.1, "ay": -50.2, "bx": 520.7, "by": -80.3, "cx": 400.4, "cy": -280.9}
TRI_RINGS = [[TRI["ax"], TRI["ay"], TRI["bx"], TRI["by"], TRI["cx"], TRI["cy"]]]


def _aoi_points_pdf() -> pd.DataFrame:
    return pd.DataFrame(AOI_POINTS, columns=["id", "x", "y"])


def _rect_pdf() -> pd.DataFrame:
    return pd.DataFrame([{"fid": 1, "rings": RECT_RINGS}])


def _polys_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [{"fid": 1, "rings": RECT_RINGS}, {"fid": 2, "rings": TRI_RINGS}]
    )


def _spread(df: DataFrame) -> DataFrame:
    """Single-file test inputs arrive as ONE scan partition (one parquet row
    group), which would serialize every downstream explode/UDF stage. A
    production corpus arrives as thousands of files, so the scan itself
    provides parallelism; this round-robin repartition restores that shape
    locally. AQE coalesces it away when the input is already wide."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


# ---------------------------------------------------------------------------
# entry — flagship: the extract+clip spatial join with span preservation
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: clip the corpus to a
    polygon window, extract band values at the AOI points, and carry the
    interleaved span payload through untouched (span_hash proves it)."""
    gd = grid_docs(spark, "/root/testdata/sf0.001")
    gd = multimodal.with_span_hash(multimodal.derive_spans(gd))
    clipped = sops.clip_by_polygon(gd, _polys_pdf(), GRID, bands=("band_blue",))
    out = ex.extract_points(
        spark,
        gd,
        _aoi_points_pdf(),
        GRID,
        bands=("blue", "green", "red"),
        keep_doc_columns=["doc_id", "span_hash"],
    )
    # union of information: points extraction + clip row count as a column
    return out.withColumn("clip_rows", F.lit(clipped.count()).cast("long"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_extract_points(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = ex.extract_points(
        spark, gd, _aoi_points_pdf(), GRID, bands=("blue", "green", "red")
    )
    return out.select("id", "x", "y", "blue", "green", "red")


def q_extract_polygons(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = ex.extract_polygons(spark, gd, _polys_pdf(), GRID, bands=("blue",))
    return out.select("fid", "point", "x", "y", "blue")


def q_clip(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = sops.clip_by_polygon(gd, _rect_pdf(), GRID, bands=("band_blue",))
    return out.select("doc_id", "row", "col", "band_blue")


def q_mask(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = sops.mask(
        gd, _rect_pdf(), GRID, keep="in", bands=("band_blue",), all_touched=False
    )
    return out.select("doc_id", "band_blue")


def q_subset(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = sops.subset(gd, GRID, left=90.0, top=-60.0, rows=8, cols=10)
    return out.select("doc_id", "row", "col", "band_red")


def q_replace(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = sops.replace(gd, {10: 110, 20: 120, 30: 130}, bands=("band_blue",))
    return out.select("doc_id", "band_blue")


def q_recode(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = sops.recode(gd, _rect_pdf(), GRID, {8: 208, 15: 215}, band="band_green")
    return out.select("doc_id", "band_green")


def q_calc_area(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    return sops.calc_area(gd, GRID, values=[50.0], band="band_green", op="lt")


def q_sample_systematic(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    return sample.sample_systematic(gd, GRID, spacing=150.0).select(
        "doc_id", "row", "col"
    )


def q_band_math(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    gd = vi.ndvi(gd, "band_red", "band_nir", out="ndvi")
    gd = vi.evi2(gd, "band_red", "band_nir", out="evi2")
    gd = vi.gcvi(gd, "band_green", "band_nir", out="gcvi")
    gd = vi.kndvi(gd, "band_red", "band_nir", out="kndvi")
    return gd.select(
        "doc_id",
        F.round("ndvi", 6).alias("ndvi"),
        F.round("evi2", 6).alias("evi2"),
        F.round("gcvi", 6).alias("gcvi"),
        F.round("kndvi", 6).alias("kndvi"),
    )


def q_mosaic(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    src_a = gd.select("row", "col", "band_blue")
    src_b = gd.select(
        "row",
        "col",
        F.when(F.col("doc_id") % 3 == 0, F.lit(0.0))
        .otherwise(F.col("band_green"))
        .alias("band_blue"),
    )
    out = mosaic.mosaic(
        [src_a, src_b],
        overlap="max",
        nodata=0.0,
        bands=("band_blue",),
        key_cols=("row", "col"),
    )
    return out.select("row", "col", "band_blue", "src_count")


def q_focal_mean(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = focal.moving(gd, GRID, stat="mean", w=3, band="band_blue", nodata=None)
    return out.select("doc_id", F.round("band_blue_mean", 6).alias("blue_mean"))


def q_near_pairs(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    out = knn.near_pairs(gd, GRID, min_dist=65.0)
    return out.select("a_id", "b_id", F.round("dist", 6).alias("dist"))


def q_knn_join(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    qpts = ex.encode_points_pdf(
        _aoi_points_pdf().rename(columns={"id": "qid"}), GRID
    )
    qdf = spark.createDataFrame(qpts[["qid", "x", "y", "row", "col"]])
    out = knn.knn_join(qdf, gd, GRID, k_neighbors=4, k_ring=2, query_id="qid")
    return out.select(
        "qid",
        "doc_id",
        F.round("dist", 6).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


N_TIMES = 8
SERIES_STATS = [
    "mean",
    "amp",
    "cv",
    "median",
    "norm_abs_energy",
    "percentile_25",
    "abs_slope_q1",
    "mean_abs_diff",
]


def q_series_stats(spark, sf_dir):
    gd = grid_docs(spark, sf_dir)
    stacked = None
    for i in range(N_TIMES):
        s = gd.select(
            "doc_id",
            F.lit(f"t{i}").alias("t"),
            (F.lit(1) + (F.col("doc_id") * 7 + i * 31) % 255)
            .cast("double")
            .alias("band_blue"),
        )
        stacked = s if stacked is None else stacked.unionByName(s)
    out = temporal.series_stats(
        stacked, SERIES_STATS, band="band_blue", nodata=None, key_cols=("doc_id",)
    )
    return out.select(
        "doc_id", *[F.round(s, 6).alias(s) for s in SERIES_STATS]
    )


def q_events_window(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_lineitem_pricing(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_token_stats(spark, sf_dir):
    d = text.token_stats(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars_calc").cast("long").alias("n_chars_calc"),
        "uniq_ratio",
        "mean_token_len",
    )


def q_quality(spark, sf_dir):
    d = text.quality_score(_docs(spark, sf_dir))
    return d.select("doc_id", "stop_ratio", "punct_ratio", "quality")


def q_lang_id(spark, sf_dir):
    d = text.lang_id(_docs(spark, sf_dir))
    return d.select("doc_id", "score_de", "score_en", "score_fr", "lang_pred")


def q_fingerprint(spark, sf_dir):
    d = text.fingerprint(_docs(spark, sf_dir))
    return d.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("survivor_id")
    )


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


def q_jaccard_pairs(spark, sf_dir):
    return dedup.jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


def q_minhash_sig(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir), n=3, k=16)


def q_minhash_lsh(spark, sf_dir):
    return dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir), n=3, bands=4, rows=4, threshold=0.8
    )


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir))


def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_embed_neardup(spark, sf_dir):
    return dedup.embedding_neardup_pairs(_emb(spark, sf_dir), threshold=0.4)


def q_ann_topk(spark, sf_dir):
    e = _emb(spark, sf_dir)
    out = ann.brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


def q_ann_ivf(spark, sf_dir):
    # rows-only check: centroid seeding is engine-internal
    e = _emb(spark, sf_dir)
    return ann.ivf_topk(e, e.filter(F.col("vec_id") < 5), k=10, nlist=16, nprobe=16)


def q_lsh_cosine_pairs(spark, sf_dir):
    # rows-only check: hyperplane RNG is engine-internal
    return ann.hyperplane_lsh_pairs(_emb(spark, sf_dir), threshold=0.45, n_planes=8)


def q_sample_random(spark, sf_dir):
    # rows-only check: Spark rand(seed) has no SQL mirror
    gd = grid_docs(spark, sf_dir)
    return sample.sample_random(gd, n=50, seed=42).select("doc_id", "row", "col")


def q_spans(spark, sf_dir):
    d = multimodal.with_span_hash(multimodal.derive_spans(_docs(spark, sf_dir)))
    return d.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.size(F.filter(F.col("spans"), lambda s: s["kind"] != "text"))
        .cast("long")
        .alias("n_media"),
        "span_hash",
    )


def q_media_decode(spark, sf_dir):
    d = multimodal.derive_spans(_docs(spark, sf_dir))
    media = multimodal.attach_media_bytes(multimodal.media_refs(d))
    return multimodal.decode_media(media)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_extract_points": q_extract_points,
        "q_extract_polygons": q_extract_polygons,
        "q_clip": q_clip,
        "q_mask": q_mask,
        "q_subset": q_subset,
        "q_replace": q_replace,
        "q_recode": q_recode,
        "q_calc_area": q_calc_area,
        "q_sample_systematic": q_sample_systematic,
        "q_band_math": q_band_math,
        "q_mosaic": q_mosaic,
        "q_focal_mean": q_focal_mean,
        "q_near_pairs": q_near_pairs,
        "q_knn_join": q_knn_join,
        "q_series_stats": q_series_stats,
        "q_events_window": q_events_window,
        "q_lineitem_pricing": q_lineitem_pricing,
        "q_token_stats": q_token_stats,
        "q_quality": q_quality,
        "q_lang_id": q_lang_id,
        "q_fingerprint": q_fingerprint,
        "q_dedup_exact": q_dedup_exact,
        "q_jaccard_pairs": q_jaccard_pairs,
        "q_minhash_sig": q_minhash_sig,
        "q_minhash_lsh": q_minhash_lsh,
        "q_simhash": q_simhash,
        "q_simhash_pairs": q_simhash_pairs,
        "q_embed_neardup": q_embed_neardup,
        "q_ann_topk": q_ann_topk,
        "q_ann_ivf": q_ann_ivf,
        "q_lsh_cosine_pairs": q_lsh_cosine_pairs,
        "q_sample_random": q_sample_random,
        "q_spans": q_spans,
        "q_media_decode": q_media_decode,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

MD5I = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

# shared text CTEs
TOKS = r"toks AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)"
LTOKS = r"ltoks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents)"
SH = (
    "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle "
    "FROM ltoks, UNNEST(range(1, greatest(len(t)-2, 1)+1)) AS u(i))"
)

_MH_TERMS = ",\n    ".join(
    f"min(({a} * h + {b}) % {dedup.PRIME31}) AS mh{i}"
    for i, (a, b) in enumerate(dedup.hash_params(16))
)
MH = (
    f"hashed AS (SELECT doc_id, {MD5I.format(x='shingle')} % {dedup.PRIME30} AS h FROM sh),\n"
    f"mh AS (SELECT doc_id,\n    {_MH_TERMS}\n  FROM hashed GROUP BY doc_id)"
)

_BANDED = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {bi} AS band_idx, "
    f"md5(concat_ws(',', mh{bi*4}, mh{bi*4+1}, mh{bi*4+2}, mh{bi*4+3})) AS band_hash FROM mh"
    for bi in range(4)
)

JAC = """
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
jac AS (
  SELECT doc_a, doc_b,
         round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b)
"""

SIMHASH = f"""
tok AS (SELECT doc_id, unnest(t) AS w FROM ltoks),
th AS (SELECT doc_id, {MD5I.format(x='w')} AS h FROM tok),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN UNNEST(range(60)) AS u(b)
  GROUP BY doc_id, b),
sh64 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id)
"""

SPANS = f"""
{TOKS},
u AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS r(i)),
spans AS (
  SELECT doc_id, i,
    CASE WHEN {MD5I.format(x='w')} % 7 = 0 THEN 'image' ELSE 'text' END AS kind,
    w,
    CASE WHEN {MD5I.format(x='w')} % 7 = 0 THEN concat('media://', md5(w)) ELSE '' END AS media_ref,
    CAST(i - 1 AS INTEGER) AS "offset"
  FROM u)
"""

# stopword / marker lists as SQL tuples
def _sql_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def _hit_sql(words) -> str:
    return (
        f"len(list_filter(t, x -> x IN {_sql_list(words)})) / greatest(len(t), 1)"
    )


# polygon-extract oracle pieces -------------------------------------------
def _local_grid_dims(minx, miny, maxx, maxy):
    return int((maxy - miny) / CELL), int((maxx - minx) / CELL)


_R_NR, _R_NC = _local_grid_dims(RECT["minx"], RECT["miny"], RECT["maxx"], RECT["maxy"])
_T_MINX = min(TRI["ax"], TRI["bx"], TRI["cx"])
_T_MAXX = max(TRI["ax"], TRI["bx"], TRI["cx"])
_T_MINY = min(TRI["ay"], TRI["by"], TRI["cy"])
_T_MAXY = max(TRI["ay"], TRI["by"], TRI["cy"])
_T_NR, _T_NC = _local_grid_dims(_T_MINX, _T_MINY, _T_MAXX, _T_MAXY)

_TRI_INSIDE = (
    f"(({TRI['bx']} - {TRI['ax']}) * (sy - ({TRI['ay']})) - "
    f"(({TRI['by']}) - ({TRI['ay']})) * (sx - {TRI['ax']})) < 0 AND "
    f"(({TRI['cx']} - {TRI['bx']}) * (sy - ({TRI['by']})) - "
    f"(({TRI['cy']}) - ({TRI['by']})) * (sx - {TRI['bx']})) < 0 AND "
    f"(({TRI['ax']} - {TRI['cx']}) * (sy - ({TRI['cy']})) - "
    f"(({TRI['ay']}) - ({TRI['cy']})) * (sx - {TRI['cx']})) < 0"
)

# clip window constants (the same driver arithmetic the engine runs)
_C_R0, _C_R1, _C_C0, _C_C1 = round_window(
    GRID, RECT["minx"], RECT["miny"], RECT["maxx"], RECT["maxy"]
)

_RECT_PIP = (
    f"(x > {RECT['minx']} AND x < {RECT['maxx']} "
    f"AND y > {RECT['miny']} AND y < {RECT['maxy']})"
)

# explicit casts: DuckDB infers DECIMAL for bare decimal literals and
# INTEGER for small ints — the Spark side is DOUBLE/BIGINT
_POINTS_VALUES = ", ".join(
    f"(CAST({i} AS BIGINT), CAST({x} AS DOUBLE), CAST({y} AS DOUBLE))"
    for i, x, y in AOI_POINTS
)

_SERIES_SRC = f"""
s AS (
  SELECT doc_id, i, CAST(1 + (doc_id * 7 + i * 31) % 255 AS DOUBLE) AS v
  FROM documents, UNNEST(range({N_TIMES})) AS u(i))
"""

_SCALE = "least(greatest(((1.0 - 0.0) * ({c} - 0.0)) / (0.05 - 0.0) + 0.0, 0.0), 1.0)"

_COS = (
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[]))"
)


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["q_extract_points"] = f"""
WITH {G_SQL}
SELECT p.id, p.x, p.y, g.band_blue AS blue, g.band_green AS green, g.band_red AS red
FROM (VALUES {_POINTS_VALUES}) AS p(id, x, y)
JOIN g ON g.row = CAST(floor((0.0 - p.y) / {CELL}) AS BIGINT)
      AND g.col = CAST(floor(p.x / {CELL}) AS BIGINT)
"""

    o["q_extract_polygons"] = f"""
WITH {G_SQL},
cand AS (
  SELECT CAST(1 AS BIGINT) AS fid, i, j,
         {RECT['minx']} + (CAST(j AS DOUBLE) + 0.5) * {CELL} AS sx,
         {RECT['maxy']} - (CAST(i AS DOUBLE) + 0.5) * {CELL} AS sy
  FROM UNNEST(range({_R_NR})) AS t1(i), UNNEST(range({_R_NC})) AS t2(j)
  UNION ALL
  SELECT CAST(2 AS BIGINT), i, j,
         {_T_MINX} + (CAST(j AS DOUBLE) + 0.5) * {CELL},
         {_T_MAXY} - (CAST(i AS DOUBLE) + 0.5) * {CELL}
  FROM UNNEST(range({_T_NR})) AS t1(i), UNNEST(range({_T_NC})) AS t2(j)),
hit AS (
  SELECT fid, i, j, sx, sy FROM cand
  WHERE fid = 1 OR (fid = 2 AND {_TRI_INSIDE})),
pts AS (
  SELECT fid, sx, sy,
         CAST(row_number() OVER (PARTITION BY fid ORDER BY i, j) - 1 AS BIGINT) AS point
  FROM hit)
SELECT p.fid, p.point, p.sx AS x, p.sy AS y, g.band_blue AS blue
FROM pts p
JOIN g ON g.row = CAST(floor((0.0 - p.sy) / {CELL}) AS BIGINT)
      AND g.col = CAST(floor(p.sx / {CELL}) AS BIGINT)
"""

    o["q_clip"] = f"""
WITH {G_SQL}
SELECT doc_id, row, col, band_blue FROM g
WHERE row >= {_C_R0} AND row < {_C_R1} AND col >= {_C_C0} AND col < {_C_C1}
"""

    o["q_mask"] = f"""
WITH {G_SQL}
SELECT doc_id, CASE WHEN {_RECT_PIP} THEN band_blue ELSE NULL END AS band_blue
FROM g
"""

    o["q_subset"] = f"""
WITH {G_SQL}
SELECT doc_id, row, col, band_red FROM g
WHERE row >= 2 AND row < 10 AND col >= 3 AND col < 13
"""

    o["q_replace"] = f"""
WITH {G_SQL}
SELECT doc_id,
  CASE WHEN band_blue = 10.0 THEN 110.0
       WHEN band_blue = 20.0 THEN 120.0
       WHEN band_blue = 30.0 THEN 130.0
       ELSE band_blue END AS band_blue
FROM g
"""

    o["q_recode"] = f"""
WITH {G_SQL}
SELECT doc_id,
  CASE WHEN {_RECT_PIP} AND band_green = 8.0 THEN 208.0
       WHEN {_RECT_PIP} AND band_green = 15.0 THEN 215.0
       ELSE band_green END AS band_green
FROM g
"""

    o["q_calc_area"] = f"""
WITH {G_SQL}
SELECT band_green AS value, count(*) * 900.0 * 1e-06 AS area
FROM g WHERE band_green < 50.0
GROUP BY band_green ORDER BY value
"""

    o["q_sample_systematic"] = f"""
WITH {G_SQL}
SELECT doc_id, row, col FROM g WHERE row % 5 = 0 AND col % 5 = 0
"""

    o["q_band_math"] = f"""
WITH {G_SQL}
SELECT doc_id,
  round(least(greatest((band_nir - band_red) / (band_nir + band_red), -1.0), 1.0), 6) AS ndvi,
  round(least(greatest(2.5 * ((band_nir - band_red) / (band_nir + 1.0 + 2.4 * band_red)), 0.0), 1.0), 6) AS evi2,
  round(least(greatest(band_nir / band_green - 1.0, 0.0), 10.0), 6) AS gcvi,
  round(least(greatest((exp(2.0 * (least(greatest((band_nir - band_red) / (band_nir + band_red), -1.0), 1.0) * least(greatest((band_nir - band_red) / (band_nir + band_red), -1.0), 1.0))) - 1.0) / (exp(2.0 * (least(greatest((band_nir - band_red) / (band_nir + band_red), -1.0), 1.0) * least(greatest((band_nir - band_red) / (band_nir + band_red), -1.0), 1.0))) + 1.0), -1.0), 1.0), 6) AS kndvi
FROM g
"""
    # NOTE: this DuckDB build has no tanh(); (exp(2x)-1)/(exp(2x)+1) differs
    # from JVM tanh by ≤1 ulp, absorbed by round(…, 6).

    o["q_mosaic"] = f"""
WITH {G_SQL},
u AS (
  SELECT row, col, band_blue AS v FROM g
  UNION ALL
  SELECT row, col, CASE WHEN doc_id % 3 = 0 THEN NULL ELSE band_green END FROM g)
SELECT row, col, max(v) AS band_blue, count(*) AS src_count
FROM u GROUP BY row, col
"""

    o["q_focal_mean"] = f"""
WITH {G_SQL}
SELECT a.doc_id, round(avg(b.band_blue), 6) AS blue_mean
FROM g a JOIN g b ON abs(a.row - b.row) <= 1 AND abs(a.col - b.col) <= 1
GROUP BY a.doc_id
"""

    o["q_near_pairs"] = f"""
WITH {G_SQL}
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < 4225.0
"""

    o["q_knn_join"] = f"""
WITH {G_SQL},
q AS (
  SELECT id AS qid, x AS qx, y AS qy,
         CAST(floor((0.0 - y) / {CELL}) AS BIGINT) AS qrow,
         CAST(floor(x / {CELL}) AS BIGINT) AS qcol
  FROM (VALUES {_POINTS_VALUES}) AS p(id, x, y)),
cand AS (
  SELECT q.qid, g.doc_id,
         (q.qx - g.x) * (q.qx - g.x) + (q.qy - g.y) * (q.qy - g.y) AS d2
  FROM q JOIN g ON abs(g.row - q.qrow) <= 2 AND abs(g.col - q.qcol) <= 2),
ranked AS (
  SELECT qid, doc_id, d2,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, doc_id ASC) AS BIGINT) AS rank
  FROM cand)
SELECT qid, doc_id, round(sqrt(d2), 6) AS dist, rank
FROM ranked WHERE rank <= 4
"""

    slope_guard = (
        "CASE WHEN slope1 IS NULL THEN NULL ELSE "
        + _SCALE.format(c="abs(slope1)")
        + " END"
    )
    o["q_series_stats"] = f"""
WITH {_SERIES_SRC.strip()},
base AS (
  SELECT doc_id,
    avg(v) AS mean, max(v) - min(v) AS amp,
    stddev_pop(v) / (avg(v) + 1e-09) AS cv,
    quantile_cont(v, 0.5) AS median,
    sum(v * v) / (max(v) * max(v) * {float(N_TIMES)}) AS norm_abs_energy,
    quantile_cont(v, 0.25) AS percentile_25,
    regr_slope(CASE WHEN i < 2 THEN v END, CASE WHEN i < 2 THEN CAST(i AS DOUBLE) END) AS slope1
  FROM s GROUP BY doc_id),
diffs AS (
  SELECT doc_id, abs(v - lag(v) OVER (PARTITION BY doc_id ORDER BY i)) AS d FROM s),
madt AS (
  SELECT doc_id, sum(d) / count(d) AS mad FROM diffs WHERE d IS NOT NULL GROUP BY doc_id)
SELECT b.doc_id,
  round(mean, 6) AS mean, round(amp, 6) AS amp, round(cv, 6) AS cv,
  round(median, 6) AS median, round(norm_abs_energy, 6) AS norm_abs_energy,
  round(percentile_25, 6) AS percentile_25,
  round({slope_guard}, 6) AS abs_slope_q1,
  round({_SCALE.format(c='m.mad')}, 6) AS mean_abs_diff
FROM base b JOIN madt m ON b.doc_id = m.doc_id
"""

    o["q_events_window"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

    o["q_lineitem_pricing"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

    o["q_token_stats"] = f"""
WITH {TOKS}
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_calc,
  round(len(list_distinct(t)) / greatest(len(t), 1), 6) AS uniq_ratio,
  round(list_sum(list_transform(t, w -> length(w))) / greatest(len(t), 1), 6) AS mean_token_len
FROM toks
"""

    stop = _hit_sql(text.STOPWORDS)
    o["q_quality"] = f"""
WITH {TOKS},
c AS (
  SELECT doc_id,
    {stop} AS stop_ratio,
    len(list_distinct(t)) / greatest(len(t), 1) AS uniq_ratio,
    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) / greatest(length(text), 1) AS punct_ratio,
    CASE WHEN length(text) >= 20 AND length(text) <= 10000 THEN 1.0 ELSE 0.3 END AS len_ok
  FROM toks)
SELECT doc_id, round(stop_ratio, 6) AS stop_ratio, round(punct_ratio, 6) AS punct_ratio,
  round(0.4 * len_ok + 0.2 * least(stop_ratio * 5.0, 1.0) + 0.3 * uniq_ratio
        + 0.1 * (1.0 - least(punct_ratio * 10.0, 1.0)), 6) AS quality
FROM c
"""

    de = _hit_sql(text.LANG_MARKERS["de"])
    en = _hit_sql(text.LANG_MARKERS["en"])
    fr = _hit_sql(text.LANG_MARKERS["fr"])
    o["q_lang_id"] = f"""
WITH {TOKS},
sc AS (
  SELECT doc_id, round({de}, 6) AS score_de, round({en}, 6) AS score_en,
         round({fr}, 6) AS score_fr
  FROM toks)
SELECT doc_id, score_de, score_en, score_fr,
  CASE WHEN score_de >= score_en AND score_de >= score_fr THEN 'de'
       WHEN score_en > score_de AND score_en >= score_fr THEN 'en'
       WHEN score_fr > score_de AND score_fr > score_en THEN 'fr'
       ELSE 'de' END AS lang_pred
FROM sc
"""

    o["q_fingerprint"] = f"""
WITH {LTOKS}
SELECT md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS survivor_id
FROM ltoks GROUP BY 1
"""

    o["q_dedup_exact"] = """
SELECT md5(lower(trim(text))) AS dup_key, min(doc_id) AS survivor_id,
       count(*) AS n_dupes
FROM documents GROUP BY 1 HAVING count(*) >= 2
"""

    o["q_jaccard_pairs"] = f"""
WITH {LTOKS},
{SH},
{JAC.strip()}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8
"""

    o["q_minhash_sig"] = f"""
WITH {LTOKS},
{SH},
{MH}
SELECT * FROM mh
"""

    o["q_minhash_lsh"] = f"""
WITH {LTOKS},
{SH},
{MH},
banded AS (
{_BANDED}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
{JAC.strip()}
SELECT c.doc_a, c.doc_b, j.jaccard
FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= 0.8
"""

    o["q_simhash"] = f"""
WITH {LTOKS},
{SIMHASH.strip()}
SELECT doc_id, simhash FROM sh64
"""

    o["q_simhash_pairs"] = f"""
WITH {LTOKS},
{SIMHASH.strip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh64 a JOIN sh64 b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

    o["q_embed_neardup"] = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({_COS}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS} >= 0.4
"""

    o["q_ann_topk"] = f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, round({_COS}, 6) AS cosine
  FROM embeddings a JOIN embeddings b ON true
  WHERE a.vec_id < 5),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 10
"""

    o["q_spans"] = f"""
WITH {SPANS.strip()}
SELECT doc_id,
  count(*) AS n_spans,
  count(*) FILTER (WHERE kind = 'image') AS n_media,
  md5(string_agg(concat_ws(',', kind, w, media_ref, CAST("offset" AS VARCHAR)), '|' ORDER BY i)) AS span_hash
FROM spans GROUP BY doc_id
"""

    o["q_media_decode"] = f"""
WITH {SPANS.strip()},
m AS (SELECT doc_id, media_ref, md5(media_ref) AS dg FROM spans WHERE kind = 'image'),
b AS (
  SELECT doc_id, media_ref,
    CAST(concat('0x', substr(dg, 1, 2)) AS INTEGER) AS b0,
    CAST(concat('0x', substr(dg, 3, 2)) AS INTEGER) AS b1,
    CAST(concat('0x', substr(dg, 5, 2)) AS INTEGER) AS b2,
    CAST(concat('0x', substr(dg, 7, 2)) AS INTEGER) AS b3,
    CAST(concat('0x', substr(dg, 9, 2)) AS INTEGER) AS b4,
    (SELECT sum(CAST(concat('0x', substr(dg, 2 * k + 1, 2)) AS INTEGER))
     FROM UNNEST(range(16)) AS u(k)) AS bsum
  FROM m)
SELECT doc_id, media_ref,
  CAST(1 + (b0 * 256 + b1) % 2048 AS INTEGER) AS width,
  CAST(1 + (b2 * 256 + b3) % 2048 AS INTEGER) AS height,
  CAST(1 + b4 % 32 AS INTEGER) AS n_frames,
  round((CAST(bsum AS DOUBLE) / 16) / 255.0, 6) AS mean_intensity
FROM b
"""

    return o
