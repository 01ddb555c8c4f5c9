"""Multimodal (interleaved text+media) column plumbing.

The engine's canonical document shape (BASELINE.json input_hint) is

    doc_id: string/bigint
    spans:  array<struct<kind:string, text:string, media_ref:string,
                         offset:int>>

Spans are OPAQUE PAYLOAD to every spatial/dedup operator: they must survive
joins, shuffles and sinks byte-identically (span-sequence equality). The
invariant is enforced with ``span_hash`` — a canonical md5 over the ordered
(kind, text, media_ref, offset) tuples — computed as a pure Column
expression so it can be re-derived on either side of any shuffle and in the
SQL oracle.

Media handling: media bytes are opaque ``binary`` columns with typed
metadata. The decode / feature-extract step is a Pandas-UDF ``mapInPandas``
stage whose Spark-side plumbing (schema, batching, partitioning) is real;
the pixel decode itself is a deterministic md5-derived fake because no
image/audio codec library exists in this environment — swap ``_fake_decode``
for a PIL/ffmpeg call in production (clearly marked below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_int, tokens

SPAN_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def derive_spans(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an interleaved span sequence from plain text (JVM-side).

    Every token whose portable hash ≡ 0 (mod 7) becomes an ``image`` span
    pointing at ``media://<md5(token)>``; all others are ``text`` spans.
    ``offset`` is the token index. Deterministic, so the oracle can rebuild
    the identical sequence.
    """
    toks = tokens(F.col(text_col))
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.struct(
            F.when(md5_int(F.element_at(toks, i + 1)) % 7 == 0, "image")
            .otherwise("text")
            .alias("kind"),
            F.element_at(toks, i + 1).alias("text"),
            F.when(
                md5_int(F.element_at(toks, i + 1)) % 7 == 0,
                F.concat(F.lit("media://"), F.md5(F.element_at(toks, i + 1))),
            )
            .otherwise(F.lit(""))
            .alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return df.withColumn("spans", spans)


def span_hash_col(spans_col: str = "spans") -> Column:
    """Canonical hash of the ordered span sequence (the parity invariant).

    md5 over '|'-joined "kind,text,media_ref,offset" units, in array order.
    Any reorder, drop, or field mutation changes the hash.
    """
    units = F.transform(
        F.col(spans_col),
        lambda s: F.concat_ws(
            ",", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
        ),
    )
    return F.md5(F.concat_ws("|", units))


def with_span_hash(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    return df.withColumn("span_hash", span_hash_col(spans_col))


def media_refs(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Explode the media spans into a (doc_id, media_ref, offset) table."""
    media = F.filter(F.col(spans_col), lambda s: s["kind"] != "text")
    return df.select(
        "doc_id", F.explode(media).alias("m")
    ).select("doc_id", F.col("m.media_ref"), F.col("m.offset"))


def attach_media_bytes(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Materialize opaque media payload bytes for each ref.

    In production this is a join against a blob-store manifest table (or an
    Iceberg table with a binary column). Here the payload is a
    deterministic 16-byte md5 digest of the ref — opaque bytes with the
    same schema and the same Spark plan shape.
    """
    return df.withColumn(
        "media_bytes", F.unhex(F.md5(F.col(ref_col)))
    ).withColumn("media_len", F.length(F.col("media_bytes")))


# --- decode / feature extraction (the Pandas-UDF stage) -------------------

DECODE_SCHEMA = (
    "doc_id bigint, media_ref string, width int, height int, "
    "n_frames int, mean_intensity double"
)

_HAVE_CODECS = False
try:  # pragma: no cover - codec libs absent in this environment
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except Exception:
    _HAVE_CODECS = False


def _fake_decode(raw: bytes) -> tuple[int, int, int, float]:
    """STUB decode: deterministic pseudo-metadata from the payload bytes.

    Replace with a real codec (PIL / torchaudio / pyav) in production —
    the UDF signature, batching, and output schema stay identical.
    """
    b = np.frombuffer(raw, dtype=np.uint8)
    width = 1 + (int(b[0]) << 8 | int(b[1])) % 2048
    height = 1 + (int(b[2]) << 8 | int(b[3])) % 2048
    n_frames = 1 + int(b[4]) % 32
    mean_intensity = round(float(b.mean()) / 255.0, 6)
    return width, height, n_frames, mean_intensity


def decode_media(media_df: DataFrame) -> DataFrame:
    """Decode/feature-extract media payloads (Arrow-batched mapInPandas).

    Input: (doc_id, media_ref, media_bytes). One vectorized batch per Arrow
    chunk; per-element decode inside the batch (codecs are per-item by
    nature — the batching amortizes the Python/JVM boundary).
    """

    def _decode(it):
        for pdf in it:
            if _HAVE_CODECS:
                raise NotImplementedError(
                    "real codec path not wired in this sandbox"
                )
            raws = list(pdf["media_bytes"])
            lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
            if len(raws) and lens.min() >= 5 and (lens == lens[0]).all():
                # fixed-size payloads (the md5 fake): one vectorized pass
                m = np.frombuffer(b"".join(raws), dtype=np.uint8).reshape(
                    len(raws), lens[0]
                )
                w = 1 + ((m[:, 0].astype(np.int64) << 8) | m[:, 1]) % 2048
                h = 1 + ((m[:, 2].astype(np.int64) << 8) | m[:, 3]) % 2048
                nf = 1 + m[:, 4].astype(np.int64) % 32
                mi = np.round(m.mean(axis=1) / 255.0, 6)
            else:
                meta = [_fake_decode(raw) for raw in raws]
                w, h, nf, mi = (
                    np.array([mm[i] for mm in meta]) for i in range(4)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(np.int64),
                    "media_ref": pdf["media_ref"],
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "n_frames": nf.astype(np.int32),
                    "mean_intensity": mi.astype(np.float64),
                }
            )

    return media_df.select("doc_id", "media_ref", "media_bytes").mapInPandas(
        _decode, DECODE_SCHEMA
    )


def frame_sample(decoded: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling plan: explode frame indices 0..n_frames-1 step
    ``every`` (pure JVM sequence — the decode of each sampled frame would
    be another mapInPandas stage in production)."""
    return decoded.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )
