"""Scale-evidence probe: the COMPLETE pretraining-data curation pipeline
chained end-to-end over a 1,000,000-doc deterministic corpus (200x the
sf0.1 fixture), local[16]:

    exact dedup -> quality filter -> benchmark decontamination
    -> sequence packing -> checkpointed tiled sink (manifest audit)

Three defect classes are PLANTED, 10,000 docs each, disjoint by id class:
verbatim duplicates (id%100==7 copies id-7), degenerate low-quality docs
(single token), and benchmark-contaminated docs (an eval sentence
appended). Every stage must remove EXACTLY its planted class — asserted,
not eyeballed — and the sink manifest's row_count sum must equal the
final survivor count (the three-way audit the batch sink always runs).
The point is that the composed pipeline holds its per-stage plan shapes
(one shuffle each; broadcast benchmark; shard-local packing; batched
sink) at 200x the correctness-fixture scale with exact row accounting."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from geowombat_spark.sources.tables import get_spark
from geowombat_spark.pipeline import curate, dedup, text as textops
from geowombat_spark.plans.checkpoint import write_tiled_checkpointed

N = 1_000_000
# prime ABOVE N: with M < N, ids >= M wrap mod M and produce accidental
# verbatim-duplicate pairs (id and id+M share every hash word), which
# breaks exact accounting — observed as 15 extra dedup drops with 999983
M = 1_000_003
PLANT = 10_000  # each id class 7/13/29 mod 100 has exactly N/100 docs

spark = get_spark(app="curation-scale", master="local[16]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

BENCH_SENTENCES = [
    f"the quick brown fox jumps over the lazy dog variant {i}"
    for i in range(20)
]
benchmark = spark.createDataFrame(
    [(s,) for s in BENCH_SENTENCES], "text string"
)

base_text = F.concat_ws(
    " ",
    *[
        F.concat(
            F.lit(f"w{j}_"), ((F.col("id") * (j * 2 + 3)) % M).cast("string")
        )
        for j in range(25)
    ],
)
# id%100==7 -> verbatim copy of id-7's text (base class 0: never planted
# otherwise); ==13 -> degenerate single-token doc; ==29 -> base text with
# a benchmark sentence appended (3-gram contamination).
docs = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.when(
        F.col("id") % 100 == 7,
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{j}_"),
                    (((F.col("id") - 7) * (j * 2 + 3)) % M).cast("string"),
                )
                for j in range(25)
            ],
        ),
    )
    .when(F.col("id") % 100 == 13, F.concat(F.lit("x"), F.col("id")))
    .when(
        F.col("id") % 100 == 29,
        F.concat(
            base_text,
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(s) for s in BENCH_SENTENCES]),
                (F.col("id") % 20 + 1).cast("int"),
            ),
        ),
    )
    .otherwise(base_text)
    .alias("text"),
).persist()
docs.count()

t0 = time.time()
# 1) exact dedup: keep each group's survivor (min id) + all non-dup docs
keyed = docs.withColumn("dup_key", F.md5(dedup.norm_text(F.col("text"))))
groups = dedup.exact_dedup(docs)
after_dedup = (
    keyed.join(F.broadcast(groups), "dup_key", "left")
    .filter(
        F.col("survivor_id").isNull()
        | (F.col("doc_id") == F.col("survivor_id"))
    )
    .select("doc_id", "text")
    .persist()
)
n1 = after_dedup.count()
t1 = time.time()
assert N - n1 == PLANT, f"dedup dropped {N - n1}, expected {PLANT}"

# 2) quality filter: hash-word docs score 0.8, single-token docs 0.52
scored = textops.quality_score(after_dedup)
after_quality = scored.filter(F.col("quality") >= 0.7).select(
    "doc_id", "text"
).persist()
n2 = after_quality.count()
t2 = time.time()
assert n1 - n2 == PLANT, f"quality dropped {n1 - n2}, expected {PLANT}"

# 3) decontamination: word-3-gram overlap with the broadcast benchmark
flags = curate.decontaminate(after_quality, benchmark, n=3, min_hits=1)
after_decon = (
    after_quality.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
).persist()
n3 = after_decon.count()
t3 = time.time()
assert n2 - n3 == PLANT, f"decon dropped {n2 - n3}, expected {PLANT}"

# 4) sequence packing: fixed 2048-token budget, 64 independent shards
packed = curate.pack_sequences(after_decon, max_tokens=2048, n_shards=64)
pk = packed.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum("n_tokens").alias("tok"),
    F.countDistinct("shard", "pack").alias("packs"),
).collect()[0]
t4 = time.time()
assert pk["n"] == n3, f"packing lost docs: {pk['n']} != {n3}"
assert pk["tok"] == n3 * 25, f"token accounting: {pk['tok']} != {n3 * 25}"

# 5) checkpointed tiled sink + manifest audit (the batch writer's
# three-way accounting: input rows == written rows == manifest rows)
out = tempfile.mkdtemp(prefix="gw_curation_sink_")
try:
    manifest = write_tiled_checkpointed(
        after_decon.withColumns(
            {
                "tile_id": (F.col("doc_id") / 4000).cast("long"),
                # the manifest checksum hashes (id, cell_id); this corpus
                # has no spatial cell, so the id doubles as the cell key
                "cell_id": F.col("doc_id"),
            }
        ),
        os.path.join(out, "corpus"),
        batch_tiles=64,
        sort_col="doc_id",
    )
    mrows = manifest.agg(
        F.sum("row_count").alias("rows"),
        F.count(F.lit(1)).alias("tiles"),
    ).collect()[0]
    t5 = time.time()
    assert mrows["rows"] == n3, f"sink manifest {mrows['rows']} != {n3}"
    print(
        f"RESULT docs={N} dedup_drop={N - n1} quality_drop={n1 - n2} "
        f"decon_drop={n2 - n3} survivors={n3} packs={pk['packs']} "
        f"sink_tiles={mrows['tiles']} "
        f"walls dedup={t1 - t0:.1f}s quality={t2 - t1:.1f}s "
        f"decon={t3 - t2:.1f}s pack={t4 - t3:.1f}s sink={t5 - t4:.1f}s "
        f"total={t5 - t0:.1f}s"
    )
finally:
    shutil.rmtree(out, ignore_errors=True)
spark.stop()
