"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k. Queries are broadcast as a dense
  numpy matrix; each corpus partition is scored with one Arrow-batched
  matmul and emits only its local top-k per query, so the shuffle carries
  O(#queries × k × #partitions) rows, never the full score matrix. A final
  window rank gives the global top-k. At 100 TB this is the right exact
  plan: one scan, no corpus shuffle.

- ``hyperplane_lsh``: random-hyperplane signatures (SRP) for cosine; the
  bucketed self-join is the approximate scale path for all-pairs search.

- ``ivf_topk``: IVF-style two-stage search — k-means-ish centroids sampled
  deterministically, corpus assigned to nearest centroid (one column of
  cluster id), queries probe only the ``nprobe`` nearest centroids. Cuts
  scored rows by ~nlist/nprobe at the cost of recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (  # noqa: F401  (round6 re-exported: cosine numerics)
    DEFAULT_MAX_BUCKET,
    capped_bucket_frame,
    round6,
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def cosine_expr(emb_a, emb_b, dp: int | None = 6):
    """Float64 cosine of two array columns as a pure Column fold.

    Every element is cast to double BEFORE multiplying: float32 products
    round differently from an exact float64 cosine at the 6-dp boundary
    for ~0.3% of pairs (measured at sf0.1), which both misfilters
    threshold-edge pairs and breaks value-level comparison against a
    float64 oracle. ``dp`` rounds the result (None = raw). This is THE
    shared cosine for every JVM-side verify/rescore path — keep the
    numerics in one place so a precision fix can never miss a copy."""
    a, b = F.col(emb_a) if isinstance(emb_a, str) else emb_a, (
        F.col(emb_b) if isinstance(emb_b, str) else emb_b
    )
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                c,
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        )

    cos = dot / (norm(a) * norm(b))
    return F.round(cos, dp) if dp is not None else cos


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Output: (query_id, vec_id, cosine, rank), rank 1..k, ties broken by
    vec_id ascending (deterministic). Scores rounded to 6 dp so results are
    bit-stable across engines.
    """
    query_id_col = query_id_col or id_col
    spark = corpus.sparkSession
    # id types follow the input schemas (ivf_topk/pq_topk's rule):
    # hardcoded bigint would crash string-id corpora in every batch
    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    qrows = queries.select(query_id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows])
    q_mat = _normalize([r[1] for r in qrows])
    bq = spark.sparkContext.broadcast((q_ids, q_mat))

    def _score(it):
        ids, qm = bq.value
        for pdf in it:
            c = _normalize(list(pdf[vec_col]))
            sims = round6(qm @ c.T)  # (nq, batch)
            cids = pdf[id_col].to_numpy()
            take = min(k, sims.shape[1])
            # Tie-SAFE *and bounded* local top-k per query: order each
            # row by the exact total order the global window uses
            # ((cosine desc, vec_id asc)) and take the first `take`.
            # argpartition alone picks arbitrarily among 6-dp-equal
            # cosines, so a tie straddling an Arrow batch boundary could
            # forward different members in two runs (or in brute-force vs
            # IVF, whose batch boundaries differ); a keep-all-ties filter
            # is deterministic but unbounded (a batch full of identical
            # cosines — e.g. zero vectors — would emit the whole batch
            # per query). Because local and global use the SAME total
            # order, every locally dropped row is dominated by `take`
            # batch-mates and can never enter the global top-k — so the
            # result is identical to keep-all-ties, at ≤ take rows per
            # query per batch.
            order = np.lexsort(
                (np.broadcast_to(cids, sims.shape), -sims), axis=-1
            )[:, :take]
            qi_idx = np.repeat(np.arange(sims.shape[0]), take)
            ci_idx = order.ravel()
            yield pd.DataFrame(
                {
                    "query_id": ids[qi_idx],
                    "vec_id": cids[ci_idx],
                    "cosine": sims[qi_idx, ci_idx],
                }
            )

    local = corpus.select(id_col, vec_col).mapInPandas(
        _score, f"query_id {qid_type}, vec_id {id_type}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection signature (int bucket id) per vector.

    Planes are regenerated on each executor from the seed (cheaper than
    broadcasting for small plane matrices, and dim-agnostic)."""

    def _sig(it):
        pl = None
        for pdf in it:
            m = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if pl is None:
                pl = np.random.default_rng(seed).standard_normal(
                    (n_planes, m.shape[1])
                )
            bits = (m @ pl.T) >= 0  # (n, planes)
            sig = np.zeros(len(pdf), dtype=np.int64)
            for b in range(pl.shape[0]):
                sig |= bits[:, b].astype(np.int64) << b
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "bucket": sig}
            )

    sig_id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        _sig, f"vec_id {sig_id_type}, bucket bigint"
    )


def hyperplane_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Approximate all-pairs cosine ≥ threshold via multi-table SRP-LSH.

    Candidates = pairs sharing a bucket in ANY of ``n_tables`` independent
    hyperplane sets; verified with an exact cosine on the candidate set
    (join back to the vectors, zip_with dot product — JVM-side).
    ``max_bucket_size`` drops pathological buckets (a bucket of m vectors
    emits m² pairs — same skew guard as ``dedup.lsh_candidate_pairs``);
    defaults to ``dedup.DEFAULT_MAX_BUCKET`` — pass ``None`` explicitly to
    opt out (exact recall, unbounded worst case).

    One corpus pass computes every table's signature (one Arrow batch
    transfer, n_tables matmuls against the same batch), and one self-join
    on (table, bucket) replaces the per-table join+union — the shuffle
    count is independent of n_tables. Per-table plane RNG matches the
    single-table :func:`hyperplane_signatures` (seed + 1000·t), so
    candidates are identical to the loop formulation.
    """

    def _sig_all(it):
        planes = None
        for pdf in it:
            m = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if planes is None:
                planes = [
                    np.random.default_rng(seed + 1000 * t).standard_normal(
                        (n_planes, m.shape[1])
                    )
                    for t in range(n_tables)
                ]
            ids = pdf[id_col].to_numpy()
            frames = []
            for t, pl in enumerate(planes):
                bits = (m @ pl.T) >= 0
                sig = np.zeros(len(pdf), dtype=np.int64)
                for b in range(n_planes):
                    sig |= bits[:, b].astype(np.int64) << b
                frames.append(
                    pd.DataFrame({"vec_id": ids, "table": t, "bucket": sig})
                )
            yield pd.concat(frames, ignore_index=True)

    sig = df.select(id_col, vec_col).mapInPandas(
        _sig_all,
        f"vec_id {df.schema[id_col].dataType.simpleString()},"
        " table int, bucket bigint",
    )
    # window-cap + MEMORY_AND_DISK persist: the matmul signature stage
    # runs exactly once, not once per join side + once for the size
    # aggregate (see dedup.capped_bucket_frame)
    sig = capped_bucket_frame(sig, ["table", "bucket"], max_bucket_size)
    a, b = sig.alias("a"), sig.alias("b")
    cands = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a")
    )
    vb = df.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b")
    )
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine", cosine_expr("emb_a", "emb_b"))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def _train_centroids(
    sample: np.ndarray, nlist: int, iters: int = 10
) -> np.ndarray:
    """Deterministic k-means over a (normalized) sample.

    Greedy farthest-point init (k-means++-style but deterministic: each new
    seed is the sample point farthest, in cosine distance, from its nearest
    chosen seed) followed by ``iters`` Lloyd rounds with spherical
    re-normalization. Empty clusters re-seed from the point worst-served by
    the current centroids, so all ``nlist`` cells stay live.
    """
    n = sample.shape[0]
    if n <= nlist:
        return sample.copy()
    chosen = [0]
    best = sample @ sample[0]
    for _ in range(1, nlist):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, sample @ sample[nxt])
    cents = sample[chosen].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(nlist):
            mask = assign == c
            if not mask.any():
                worst = int(np.argmin(np.max(sims, axis=1)))
                cents[c] = sample[worst]
                continue
            m = sample[mask].mean(axis=0)
            nm = np.linalg.norm(m)
            cents[c] = m / nm if nm > 0 else sample[int(np.argmax(mask))]
    return cents


def train_corpus_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 32,
    iters: int = 10,
) -> np.ndarray:
    """Bounded-sample centroid training shared by IVF / clustering /
    semantic-dedup blocking: take ``k·oversample`` vectors in
    ``md5_int(id)`` order (hash order is uncorrelated with id/storage
    order, so the sample spreads across the corpus), normalize, run the
    deterministic k-means. Driver work O(k·oversample·dim) — independent
    of corpus size."""
    from .text import md5_int

    rows = (
        df.select(id_col, vec_col)
        .orderBy(md5_int(F.col(id_col).cast("string")), id_col)
        .limit(int(k) * int(oversample))
        .collect()
    )
    return _train_centroids(_normalize([r[1] for r in rows]), int(k), iters)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF two-stage ANN: centroid assignment then probe-limited exact scan.

    Centroid training is a bounded-sample k-means: take the first
    ``nlist × oversample`` corpus vectors in ``md5_int(id)`` order (the
    hash order is uncorrelated with id order / storage layout, so the
    sample spreads across the corpus even when ids are sorted or clustered
    — the failure mode of ``orderBy(id).limit(nlist)`` seeding), then run
    deterministic Lloyd iterations on the driver. The driver-side work is
    O(nlist·oversample·dim) — independent of corpus size, so the plan holds
    at 100 TB (it is the standard FAISS train-on-sample recipe). The corpus
    gains a ``cluster`` column; a query scores only the rows of its
    ``nprobe`` nearest clusters.
    """
    spark = corpus.sparkSession
    cents = train_corpus_centroids(corpus, nlist, id_col, vec_col)
    bc = spark.sparkContext.broadcast(cents)
    # derive the pass-through types from the input schema: hardcoding
    # `array<float>` would silently downcast double embeddings before the
    # "exact" probe scoring, and `bigint` would crash string ids (the same
    # contract _cluster_cosine_pairs documents in dedup.py)
    id_type = corpus.schema[id_col].dataType.simpleString()
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    # query ids are typed from the QUERIES frame, not the corpus: probe
    # vectors routinely carry a different id type (spark.range bigints
    # against a string-id corpus) and a corpus-typed query_id schema
    # would fail every Arrow batch at runtime (pq_topk's qid_type rule)
    qid_type = queries.schema[id_col].dataType.simpleString()

    def _assign(it):
        cm = bc.value
        for pdf in it:
            m = _normalize(list(pdf[vec_col]))
            cl = np.argmax(m @ cm.T, axis=1).astype(np.int32)
            out = pdf[[id_col, vec_col]].copy()
            out["cluster"] = cl
            yield out

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        _assign, f"{id_col} {id_type}, {vec_col} {vec_type}, cluster int"
    )

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.asarray([r[0] for r in qrows])
    q_mat = _normalize([r[1] for r in qrows])
    probes = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    bq = spark.sparkContext.broadcast((q_ids, q_mat, probes))

    def _probe(it):
        ids, qm, pr = bq.value
        for pdf in it:
            c = _normalize(list(pdf[vec_col]))
            cl = pdf["cluster"].values
            # keep the id dtype native (int64 or str); str converts to a
            # fixed-width U array so np.lexsort's tiebreak stays total
            cids = np.asarray(pdf[id_col].values)
            if cids.dtype == object:
                cids = cids.astype("U")
            frames = []
            for qi in range(len(ids)):
                mask = np.isin(cl, pr[qi])
                if not mask.any():
                    continue
                sims = round6(qm[qi] @ c[mask].T)
                take = min(k, sims.shape[0])
                # tie-safe bounded local top-k (see brute_force_topk.
                # _score): same (cosine desc, vec_id asc) total order as
                # the global window, truncated at `take`.
                keep = np.lexsort((cids[mask], -sims))[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": ids[qi],
                            "vec_id": cids[mask][keep],
                            "cosine": sims[keep],
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"query_id": [], "vec_id": [], "cosine": []}
            )

    local = assigned.mapInPandas(
        _probe, f"query_id {qid_type}, vec_id {id_type}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-scan ANN with exact rescore
# ---------------------------------------------------------------------------
#
# The FAISS ADC recipe re-expressed as DataFrame plans: train per-subspace
# codebooks on a bounded hash-ordered sample (driver work independent of
# corpus size), encode the corpus once into m_sub small codes (one
# mapInPandas scan — at 100 TB the scan-side working set shrinks ~dim·4 /
# m_sub bytes per vector, e.g. 32x for 64-dim float vs 8 codes), score all
# queries against the codes via per-query lookup tables (asymmetric
# distance), then exact-rescore only the ADC candidates. No index build
# shuffle; the only wide op is the per-query top-k window, which runs on
# |Q|·k·refine rows, not the corpus.


def _train_centroids_l2(sample: np.ndarray, ksub: int, iters: int = 12) -> np.ndarray:
    """Deterministic euclidean k-means for one PQ subspace (farthest-point
    init + Lloyd; empty clusters re-seed from the worst-served point)."""
    n = sample.shape[0]
    if n <= ksub:
        return sample.copy()
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    chosen = [0]
    for _ in range(1, ksub):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    cents = sample[chosen].copy()
    for _ in range(iters):
        dist = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(dist, axis=1)
        for c in range(ksub):
            mask = assign == c
            if not mask.any():
                cents[c] = sample[int(np.argmax(np.min(dist, axis=1)))]
            else:
                cents[c] = sample[mask].mean(axis=0)
    return cents


def train_pq_codebooks(
    sample: np.ndarray, m_sub: int, ksub: int
) -> np.ndarray:
    """(m_sub, ksub, dim/m_sub) codebooks from a normalized sample."""
    dim = sample.shape[1]
    assert dim % m_sub == 0, "dim must divide by m_sub"
    ds = dim // m_sub
    return np.stack(
        [
            _train_centroids_l2(
                np.ascontiguousarray(sample[:, m * ds : (m + 1) * ds]), ksub
            )
            for m in range(m_sub)
        ]
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m_sub: int = 4,
    ksub: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """PQ-ADC candidate scan + exact cosine rescore.

    Output matches :func:`brute_force_topk`: (query_id, vec_id, cosine,
    rank). ``refine`` controls the ADC shortlist size (``k·refine`` per
    query) that gets exact-rescored against the original vectors — the
    accuracy/IO dial (refine=1 is pure ADC ranking).
    """
    from .text import md5_int

    query_id_col = query_id_col or id_col
    spark = corpus.sparkSession

    # 1. bounded-sample codebook training (hash order — uncorrelated with
    #    id order, same rationale as ivf_topk's seeding)
    sample_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(md5_int(F.col(id_col).cast("string")), id_col)
        .limit(max(ksub * 32, 512))
        .collect()
    )
    sample = _normalize([r[1] for r in sample_rows])
    books = train_pq_codebooks(sample, m_sub, ksub)
    dim = sample.shape[1]
    ds = dim // m_sub

    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    qrows = queries.select(query_id_col, vec_col).collect()
    q_ids = np.asarray([r[0] for r in qrows])
    q_mat = _normalize([r[1] for r in qrows])
    # per-query ADC lookup tables: LUT[q, m, c] = ||q_sub - codeword||^2
    lut = np.stack(
        [
            ((q_mat[:, None, m * ds : (m + 1) * ds] - books[m][None, :, :]) ** 2).sum(
                axis=2
            )
            for m in range(m_sub)
        ],
        axis=1,
    )  # (nq, m_sub, ksub)
    bb = spark.sparkContext.broadcast((books, q_ids, lut))
    shortlist = k * max(int(refine), 1)

    def _adc(it):
        bks, ids, tables = bb.value
        for pdf in it:
            c = _normalize(list(pdf[vec_col]))
            # encode the batch
            codes = np.stack(
                [
                    np.argmin(
                        ((c[:, None, m * ds : (m + 1) * ds] - bks[m][None, :, :]) ** 2).sum(
                            axis=2
                        ),
                        axis=1,
                    )
                    for m in range(m_sub)
                ],
                axis=1,
            )  # (batch, m_sub)
            # ADC distance per query: sum of LUT entries at the codes
            d = np.zeros((len(ids), c.shape[0]))
            for m in range(m_sub):
                d += tables[:, m, :][:, codes[:, m]]
            cids = np.asarray(pdf[id_col].values)
            if cids.dtype == object:
                cids = cids.astype("U")
            take = min(shortlist, c.shape[0])
            # tie-safe bounded local shortlist, O(nc) per query: the kept
            # SET must equal the global (adc asc, vec_id asc) order's
            # take-prefix (argpartition alone picks arbitrarily among
            # boundary ties — the failure mode brute_force_topk._score
            # documents), but a full lexsort of every row is O(nc log nc)
            # with string-key compares on the hottest stage. Instead:
            # argpartition for the threshold, keep everything strictly
            # under it, and resolve only the AT-threshold ties by vec_id.
            # Local output order is irrelevant — the global window below
            # re-sorts; only the set must be deterministic.
            sel_ids, sel_adc, sel_n = [], [], []
            for qi in range(d.shape[0]):
                drow = d[qi]
                # NaN-adc candidates (NaN query embedding → all-NaN LUT
                # row) are dropped, not emitted: argpartition sorts NaN
                # last, so cap k at the finite count or thr itself goes
                # NaN and every comparison below returns empty.
                k = min(take, int((~np.isnan(drow)).sum()))
                if k == 0:
                    keep = np.empty(0, dtype=np.int64)
                elif k == drow.shape[0]:
                    keep = np.arange(drow.shape[0])
                else:
                    part = np.argpartition(drow, k - 1)[:k]
                    thr = drow[part].max()
                    less = np.flatnonzero(drow < thr)
                    eq = np.flatnonzero(drow == thr)
                    need = k - less.size
                    eq_keep = eq[np.argsort(cids[eq], kind="stable")[:need]]
                    keep = np.concatenate([less, eq_keep])
                sel_ids.append(cids[keep])
                sel_adc.append(drow[keep])
                sel_n.append(keep.size)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, sel_n),
                    "vec_id": np.concatenate(sel_ids)
                    if sel_ids
                    else np.empty(0, dtype=cids.dtype),
                    "adc": np.concatenate(sel_adc)
                    if sel_adc
                    else np.empty(0),
                }
            )

    local = corpus.select(id_col, vec_col).mapInPandas(
        _adc, f"query_id {qid_type}, vec_id {id_type}, adc double"
    )
    w0 = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    cand = (
        local.withColumn("r0", F.row_number().over(w0))
        .filter(F.col("r0") <= shortlist)
        .select("query_id", "vec_id")
    )

    # 2. exact rescore: semi-join the (tiny) candidate set to the corpus
    #    vectors, exact cosine against the broadcast query matrix
    cand_vec = corpus.select(id_col, vec_col).join(
        F.broadcast(cand.withColumnRenamed("vec_id", id_col)), id_col
    )
    bq = spark.sparkContext.broadcast((q_ids, q_mat))

    def _rescore(it):
        ids, qm = bq.value
        pos = {q: i for i, q in enumerate(ids.tolist())}
        for pdf in it:
            c = _normalize(list(pdf[vec_col]))
            qi = pdf["query_id"].values
            rowsel = np.array([pos[q] for q in qi])
            cos = round6((qm[rowsel] * c).sum(axis=1))
            yield pd.DataFrame(
                {
                    "query_id": qi,
                    "vec_id": pdf[id_col].values,
                    "cosine": cos,
                }
            )

    scored = cand_vec.mapInPandas(
        _rescore, f"query_id {qid_type}, vec_id {id_type}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cluster_embeddings(
    df: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 32,
    iters: int = 10,
):
    """Spherical k-means clustering of an embedding column — the corpus
    organization step feeding semantic dedup / topic bucketing / IVF.

    Same scale shape as ``ivf_topk`` training: centroids learn on a
    bounded hash-ordered sample (driver work independent of corpus size),
    then ONE ``mapInPandas`` pass assigns every row its cluster and the
    cosine to its centroid. Returns ``(assigned_df, centroids)`` where
    ``assigned_df`` has (id, cluster, centroid_sim) and ``centroids`` is
    the (k, dim) unit-row numpy array (reusable as a plan literal).
    """
    spark = df.sparkSession
    cents = train_corpus_centroids(df, k, id_col, vec_col, oversample, iters)
    bc = spark.sparkContext.broadcast(cents)

    def _assign(it):
        cm = bc.value
        for pdf in it:
            m = _normalize(list(pdf[vec_col]))
            sims = m @ cm.T
            cl = np.argmax(sims, axis=1)
            out = pdf[[id_col]].copy()
            out["cluster"] = cl.astype(np.int32)
            out["centroid_sim"] = round6(sims[np.arange(len(cl)), cl])
            yield out

    cl_id_type = df.schema[id_col].dataType.simpleString()
    assigned = df.select(id_col, vec_col).mapInPandas(
        _assign, f"{id_col} {cl_id_type}, cluster int, centroid_sim double"
    )
    return assigned, cents
