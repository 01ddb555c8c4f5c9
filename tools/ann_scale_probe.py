"""Scale-evidence probe: ANN over a 1,000,000-vector corpus (100x the
sf0.1 embeddings fixture), local[16]. Deterministic 64-dim corpus built
from splitmix64 hashes (NO trig lattices — a sin(id*const) corpus has
near-exact duplicate vectors wherever const*delta approaches 2*pi*k,
which silently breaks planted-neighbor recall). The corpus is CLUSTERED
(64 hash-derived topic centers + 0.35 noise) — the operating regime IVF
exists for, and the shape of real embedding corpora. 100 queries are
tiny perturbations of known corpus vectors, so the true nearest neighbor
is planted and recall is exact, not estimated. Measures the brute-force
exact path and the IVF probe-limited path on the SAME queries: both must
find every planted top-1, and IVF recall@10 vs brute force must hold
>= 0.9 while scanning only nprobe/nlist of the corpus per query. The
point is bounded-memory completion and recall at 100x scale; walls are
reported for the throughput ratio, not as absolutes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from geowombat_spark.sources.tables import get_spark
from geowombat_spark.pipeline import ann

N = 1_000_000
DIM = 64
N_CLUSTERS = 64
N_Q = 100
STRIDE = 10_007  # queries perturb corpus ids 0, 10007, 20014, ...

_M64 = np.uint64((1 << 64) - 1)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — uniform uint64 stream, no periodic
    structure (numpy uint64 arithmetic wraps mod 2^64)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hvec(ids: np.ndarray, seed: int) -> np.ndarray:
    """(len(ids), DIM) floats in [-1, 1): hash of (seed, id, dim)."""
    seed_off = np.uint64((seed * 0x51_7C_C1_B7_27_22_0A_95) % (1 << 64))
    keys = (
        ids.astype(np.uint64)[:, None] * np.uint64(DIM)
        + np.arange(DIM, dtype=np.uint64)[None, :]
        + seed_off
    )
    return (_splitmix(keys) >> np.uint64(11)).astype(np.float64) / float(
        1 << 52
    ) - 1.0


_CENTERS = _hvec(np.arange(N_CLUSTERS, dtype=np.uint64), seed=1)
_CENTERS /= np.linalg.norm(_CENTERS, axis=1, keepdims=True)


def _vec(ids: np.ndarray) -> np.ndarray:
    cid = (_splitmix(ids.astype(np.uint64)) % np.uint64(N_CLUSTERS)).astype(
        np.int64
    )
    return _CENTERS[cid] + 0.35 * _hvec(ids, seed=3)


def main() -> None:
    spark = get_spark(
        app="ann-scale", master="local[16]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            m = _vec(ids).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

    corpus = (
        spark.range(0, N, 1, 64)
        .mapInPandas(_gen, "vec_id bigint, embedding array<float>")
        .persist()
    )
    corpus.count()

    q_src = np.arange(N_Q, dtype=np.int64) * STRIDE
    q_mat = _vec(q_src) + 0.001 * _hvec(q_src, seed=4)
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": q_src + N,  # disjoint id space from the corpus
                "embedding": list(q_mat.astype(np.float32)),
            }
        )
    )

    t0 = time.time()
    bf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ann.brute_force_topk(corpus, queries, k=10).collect()
    }
    t1 = time.time()
    ivf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ann.ivf_topk(
            corpus, queries, k=10, nlist=64, nprobe=8
        ).collect()
    }
    t2 = time.time()

    bf_sets: dict = {}
    ivf_sets: dict = {}
    for (qid, _rk), vid in bf.items():
        bf_sets.setdefault(qid, set()).add(vid)
    for (qid, _rk), vid in ivf.items():
        ivf_sets.setdefault(qid, set()).add(vid)

    planted_bf = sum(
        1 for i, qid in enumerate(q_src + N) if bf.get((qid, 1)) == q_src[i]
    )
    planted_ivf = sum(
        1 for i, qid in enumerate(q_src + N) if ivf.get((qid, 1)) == q_src[i]
    )
    recall10 = float(
        np.mean(
            [
                len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q])
                for q in bf_sets
            ]
        )
    )
    assert planted_bf == N_Q, f"brute force missed planted top-1: {planted_bf}/{N_Q}"
    assert planted_ivf == N_Q, f"IVF missed planted top-1: {planted_ivf}/{N_Q}"
    assert recall10 >= 0.9, f"IVF recall@10 vs brute force {recall10:.3f} < 0.9"
    print(
        f"RESULT vectors={N} dim={DIM} clusters={N_CLUSTERS} queries={N_Q} "
        f"planted_top1 bf={planted_bf}/{N_Q} ivf={planted_ivf}/{N_Q} "
        f"recall@10={recall10:.3f} "
        f"wall_brute={t1 - t0:.1f}s wall_ivf={t2 - t1:.1f}s "
        f"(ivf includes sample-train + assign; probe fraction "
        f"{8 / 64:.3f} of corpus per query)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
