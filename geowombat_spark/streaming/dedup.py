"""Streaming deduplication — the training-pipeline dedup ops in
Structured Streaming form.

The batch family (``pipeline/dedup.py``) prunes the quadratic pair space
with bucketing; streaming replaces the self-join with *state keyed by the
bucket*:

- ``stream_exact_dedup``: first-seen-wins on the content hash via
  ``dropDuplicatesWithinWatermark`` — Spark's built-in watermarked dedup
  state (state is evicted once the watermark passes an entry, so memory
  is bounded by the watermark horizon, not the stream length).
- ``stream_lsh_neardup_flags``: custom stateful operator
  (``applyInPandasWithState`` keyed by MinHash band bucket): the state is
  the min doc id ever seen in the bucket; a document whose every band
  bucket already existed is flagged as a near-dup candidate. This is the
  streaming analogue of LSH banding — state size is O(#live buckets),
  and a processing-time timeout evicts idle buckets.

Both run the same md5-based portable hash arithmetic as the batch path,
so a document flagged by the stream matches the batch
``minhash_dedup_pairs`` candidate set for the same (bands, rows) config.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..pipeline.dedup import band_hash_structs, minhash_sig_cols, norm_text


def content_key(text_col: str = "text") -> F.Column:
    """Portable content hash (md5 of normalized text) — identical to the
    batch ``exact_dedup`` key."""
    return F.md5(norm_text(F.col(text_col)))


def band_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
    rows: int = 4,
) -> DataFrame:
    """Stream of (doc_id, band_idx, band_hash): the row-local MinHash
    signature (``minhash_sig_cols`` — no stateful agg needed) exploded into
    its LSH bands, hashed with the SAME expressions as the batch
    ``lsh_candidate_pairs``, so streaming flags agree with batch pairs."""
    sig = stream.select(
        F.col(id_col).alias("doc_id"),
        *minhash_sig_cols(text_col, n, bands * rows),
    )
    return sig.select(
        "doc_id", F.explode(band_hash_structs(bands, rows)).alias("bh")
    ).select("doc_id", "bh.band_idx", "bh.band_hash")


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming exact dedup: the first document with a given
    content hash passes; later copies within the watermark horizon are
    dropped. State is evicted as the watermark advances — bounded memory,
    the streaming form of the one-shuffle batch groupBy."""
    keyed = stream.withColumn("dup_key", content_key(text_col))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["dup_key"]
    )


def stream_dedup_against(
    stream: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming incremental dedup against a STATIC corpus index
    (``pipeline/dedup.exact_index``) — the streaming analogue of
    ``dedup_against``, for continuous ingestion into an already-deduped
    corpus.

    Within-stream first occurrence survives via
    ``dropDuplicatesWithinWatermark`` on the content key (bounded state,
    exactly :func:`stream_exact_dedup`); corpus membership then comes from
    a **stream-static left join** — Spark joins each micro-batch against
    the static index as an ordinary batch relation (broadcast-able when
    small, bucketed on ``dup_key`` at corpus scale), no streaming state.
    Output: the stream's surviving rows with ``dup_key``, ``corpus_owner``
    (NULL = novel), ``in_corpus`` and ``kept = NOT in_corpus`` — stream
    copies of corpus docs flow through flagged, so the sink can route
    keeps and drops without a second pass."""
    keyed = stream.withColumn("dup_key", content_key(text_col))
    surv = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["dup_key"]
    )
    idx = index.select(
        "dup_key", F.col("owner_id").alias("corpus_owner")
    )
    out = surv.join(idx, "dup_key", "left")
    return out.withColumns(
        {
            "in_corpus": F.col("corpus_owner").isNotNull(),
            "kept": F.col("corpus_owner").isNull(),
        }
    )


_FLAG_SCHEMA = "doc_id bigint, band_idx int, band_hash string, seen_min bigint"
_STATE_SCHEMA = "min_doc bigint"


def _update_bucket(key, pdfs, state: GroupState):
    if state.hasTimedOut:
        state.remove()
    else:
        min_doc = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            for doc_id in sorted(int(d) for d in pdf["doc_id"]):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "band_idx": int(key[0]),
                        "band_hash": str(key[1]),
                        # min doc previously holding the bucket (-1 = fresh)
                        "seen_min": min_doc if min_doc is not None else -1,
                    }
                )
                min_doc = doc_id if min_doc is None else min(min_doc, doc_id)
        state.update((int(min_doc),))
        state.setTimeoutDuration(3600 * 1000)
        yield pd.DataFrame(rows)


def stream_lsh_neardup_flags(
    banded: DataFrame,
) -> DataFrame:
    """Stateful LSH-bucket membership: input is a stream of
    (doc_id, band_idx, band_hash) rows (the streaming side computes band
    hashes with the same ``lsh_candidate_pairs`` banding expressions);
    output marks each row with the minimum doc id that previously occupied
    the bucket (−1 = bucket was fresh). A doc whose every band emitted
    ``seen_min != -1`` is a near-dup candidate against those prior docs.

    State per bucket is one bigint; idle buckets are evicted by a
    processing-time timeout — the state store stays proportional to the
    live bucket set, never the stream length.
    """
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _update_bucket,
        _FLAG_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
