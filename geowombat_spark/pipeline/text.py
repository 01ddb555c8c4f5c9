"""Text analysis: tokenization, quality scoring, language-ID, fingerprints.

Everything here is pure JVM Column expressions (whole-stage codegen, no
Python in the hot path). Hashes are md5-derived so results are exactly
reproducible in any SQL engine (see pipeline/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit md5-derived integer hash: stable across engines, fits int64.
HEX_CHARS = 15


def md5_int(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (portable hash)."""
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("long")


def tokens(c: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.trim(c), r"\s+")


# Small stopword lists used by the language-ID heuristic and the quality
# score. Deliberately tiny and hard-coded: the heuristic's value is its
# determinism, not linguistic completeness.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "les", "et", "de"),
}
STOPWORDS = LANG_MARKERS["en"]


def _hit_ratio(toks: Column, words: tuple[str, ...]) -> Column:
    """Fraction of tokens (with multiplicity) found in ``words``."""
    hits = F.size(F.filter(toks, lambda w: w.isin(*words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, unique-token ratio, mean token length.

    NULL text coalesces to '' (module convention — see token_estimate):
    a NULL n_tokens/quality would silently pass or fail three-valued
    filters instead of scoring as an empty doc. Note the empty-doc score
    under the shared split semantics is ``n_tokens = 1`` (both Spark
    ``split`` and DuckDB ``regexp_split_to_array`` yield ``['']`` for
    '') — a deliberate cross-engine convention; ``token_estimate``'s
    ``n_ws_tokens`` is the 0-for-empty variant when a filter needs
    it."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(txt)
    n = F.size(toks)
    return df.withColumns(
        {
            "n_tokens": n,
            "n_chars_calc": F.length(txt),
            "uniq_ratio": F.round(
                F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)), 6
            ),
            "mean_token_len": F.round(
                F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
                / F.greatest(n, F.lit(1)),
                6,
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite document-quality score in [0, 1].

    Components (all cheap Column expressions): length band, stopword ratio,
    unique-token ratio, punctuation density. Mirrors the usual C4/Gopher-style
    filters in spirit; the exact weights are arbitrary but pinned by tests.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))  # module NULL convention
    toks = tokens(txt)
    n = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = _hit_ratio(toks, STOPWORDS)
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    text_len = F.length(txt)
    # txt, not the raw column: NULL text must score like '' (module
    # convention), not propagate a NULL punct_ratio/depressed quality
    punct = F.length(F.regexp_replace(txt, r"[^.,!?;:]", ""))
    punct_ratio = punct / F.greatest(text_len, F.lit(1))
    len_ok = F.when((text_len >= 20) & (text_len <= 10000), 1.0).otherwise(0.3)
    score = (
        0.4 * len_ok
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.3 * uniq_ratio
        + 0.1 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return df.withColumns(
        {
            "stop_ratio": F.round(stop_ratio, 6),
            "punct_ratio": F.round(punct_ratio, 6),
            "quality": F.round(score, 6),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax over per-language hit ratios.

    Ties break by language code order (deterministic). Adds one score
    column per language plus ``lang_pred``. NULL text coalesces to ''
    (module convention) — an empty doc ties every score at 0 and gets
    the first language code, never a NULL prediction.
    """
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    out = df
    for code, words in LANG_MARKERS.items():
        out = out.withColumn(f"score_{code}", F.round(_hit_ratio(toks, words), 6))
    best = None
    for code in sorted(LANG_MARKERS):
        cond = F.lit(True)
        for other in sorted(LANG_MARKERS):
            if other < code:
                cond = cond & (F.col(f"score_{code}") > F.col(f"score_{other}"))
            elif other > code:
                cond = cond & (F.col(f"score_{code}") >= F.col(f"score_{other}"))
        best = F.when(cond, code) if best is None else best.when(cond, code)
    return out.withColumn("lang_pred", F.coalesce(best, F.lit(sorted(LANG_MARKERS)[0])))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted unique token set.

    Equal fingerprints ⇔ equal bags-of-unique-tokens — the classic
    "fingerprint" key used for clustering near-identical documents.
    """
    toks = tokens(F.lower(F.col(text_col)))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.withColumn("fingerprint", F.md5(canon))


#: BPE-ish piece pattern: ≤4-letter runs (long words split into multiple
#: pieces, approximating subword merges), single digits, single
#: non-alnum marks — the regex restricted to the Java/RE2 common subset.
BPE_PIECE_PATTERN = r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"


def token_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LLM-token-count estimate: whitespace tokens plus a BPE-ish piece
    count (``BPE_PIECE_PATTERN`` matches ≈ subword pieces — a 10-letter
    word costs 3 pieces, digits one each, punctuation one each). Both are
    single JVM regex scans; ``pieces_per_token`` is the fertility ratio
    quality filters threshold on."""
    # coalesce NULL text to '' (as shingles_col does): size() over a NULL
    # split/extract is the legacy -1, which would poison every downstream
    # threshold — a null-text doc counts as an empty doc instead
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_ws = F.when(F.trim(txt) == "", F.lit(0)).otherwise(
        F.size(tokens(txt))
    )
    # F.lit pattern (not an F.expr SQL string: SQL literals would eat the
    # backslash in \s)
    n_bpe = F.size(
        F.regexp_extract_all(txt, F.lit(BPE_PIECE_PATTERN), F.lit(0))
    )
    return df.withColumns(
        {
            "n_ws_tokens": n_ws.cast("long"),
            "n_bpe_pieces": n_bpe.cast("long"),
            "pieces_per_token": F.round(
                n_bpe / F.greatest(n_ws, F.lit(1)), 6
            ),
        }
    )


def bm25_scores(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against ``query``
    (Robertson & Spärck Jones; the standard retrieval scorer).

    Plan: one pass computes per-doc term frequencies for the (tiny) query
    term set as Column expressions — no shuffle; the corpus statistics
    (N, avgdl, per-term document frequencies) are ONE partial-agg
    aggregate row, broadcast back via a literal-free crossJoin. IDF uses
    the standard ``ln(1 + (N - df + 0.5)/(df + 0.5))`` form. Emits
    ``(id, n_tokens, bm25)`` for every doc (score 0 when no term hits).
    """
    terms = sorted(set(t for t in query.lower().split() if t))
    if not terms:
        raise ValueError("empty query")
    toks = tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    d = docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("_dl"),
        *[
            # one-arg lambda factory: a default-arg lambda would have
            # arity 2 and be bound as F.filter's (element, index) form
            F.size(F.filter(toks, (lambda t: lambda w: w == F.lit(t))(t)))
            .cast("double")
            .alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
        )
        tf = F.col(f"_tf_{i}")
        score = score + idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    return scored.select(
        id_col,
        F.col("_dl").cast("long").alias("n_tokens"),
        F.round(score, 6).alias("bm25"),
    )


def _char_ngrams(c: Column, n: int) -> Column:
    """All character n-grams of a string as an array Column."""
    return F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))
        ),
        lambda i: F.substring(c, i, n),
    )


def char_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    alpha: float = 1.0,
    vocab: int = 64,
) -> DataFrame:
    """Per-document mean log-probability under a char n-gram LM trained on
    the corpus itself — the perplexity-style quality signal (KenLM-filter
    analogue, self-trained so no external model file is needed).

    Model: add-``alpha`` smoothed conditionals ``ln((c(g)+α)/(c(h)+α·V))``
    with g the n-gram, h its (n-1)-prefix, V a fixed vocab size. Plan:
    ONE explode+groupBy each for gram and prefix counts (partial-agg
    shuffles over the corpus n-grams), then the per-doc score reuses the
    same exploded grams joined to both count tables and one final per-doc
    average — every join key is a short string, every aggregate
    map-side-combined. Lower (more negative) = less natural text.
    """
    # NULL coalesces to '' (module convention): a NULL text yields a NULL
    # gram that never survives the inner count joins, silently dropping
    # the doc from the score table; '' scores via its single empty gram
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    grams = docs.select(
        F.col(id_col), F.explode(_char_ngrams(t, n)).alias("g")
    ).withColumn("h", F.substring(F.col("g"), 1, n - 1))
    gram_counts = grams.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("cg")
    )
    prefix_counts = grams.groupBy("h").agg(
        F.count(F.lit(1)).cast("double").alias("ch")
    )
    a = float(alpha)
    v = float(vocab)
    scored = (
        grams.join(gram_counts, "g")
        .join(prefix_counts, "h")
        .withColumn(
            "_lp",
            F.log((F.col("cg") + a) / (F.col("ch") + a * v)),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals, all in-row Column math (no
    shuffle): ``dup_line_frac`` — fraction of lines that are repeats of an
    earlier line; ``top_bigram_frac`` — share of all word bigrams taken by
    the most frequent one (of the doc itself). High values flag boilerplate
    / degenerate repetition for the quality filter. NULL text is
    coalesced to '' (as in ``shingles_col``/``token_estimate``) so
    null-text docs score as empty docs instead of the legacy
    ``size(NULL) = -1`` garbage."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    dup_lines = (F.size(lines) - F.size(F.array_distinct(lines))) / n_lines

    toks = tokens(F.lower(txt))
    sz = F.size(toks)
    nxt = F.slice(toks, 2, F.greatest(sz - 1, F.lit(0)))
    bi = F.slice(
        F.zip_with(toks, nxt, lambda a, b: F.concat_ws(" ", a, b)),
        1,
        F.greatest(sz - 1, F.lit(1)),
    )
    n_bi = F.greatest(F.size(bi), F.lit(1))
    # a <2-token doc has ZERO bigrams: the padded slice fabricates one
    # phantom gram, which scored every one-word/empty doc as maximally
    # repetitive (top_bigram_frac=1.0) — exactly the docs a Gopher
    # filter must NOT discard as boilerplate
    has_bi = sz >= 2
    # count of the modal bigram = longest equal run in the SORTED bigram
    # array: one array_sort (O(m log m)) + one linear fold, all in-row.
    # The former distinct×filter formulation re-scanned the full array per
    # distinct bigram — O(distinct·m) blows up on exactly the 100k-token
    # web documents a Gopher-style repetition filter exists to catch.
    def _run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            F.greatest(acc["best"], run).alias("best"),
            run.alias("run"),
            x.alias("prev"),
        )

    top = F.aggregate(
        F.array_sort(bi),
        F.struct(
            F.lit(0).alias("best"),
            F.lit(0).alias("run"),
            F.lit(None).cast("string").alias("prev"),
        ),
        _run_step,
        lambda acc: acc["best"],
    )
    return df.withColumns(
        {
            "dup_line_frac": F.round(dup_lines, 6),
            "top_bigram_frac": F.when(has_bi, F.round(top / n_bi, 6)).otherwise(
                F.lit(0.0)
            ),
        }
    )


def build_vocab(
    docs: DataFrame,
    top_k: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the ``top_k`` most frequent lowercased
    whitespace tokens as ``(token, tf_corpus, rank)``.

    The training-data analogue of tokenizer-vocab construction. Plan:
    explode once → ONE partial-aggregated shuffle keyed by token (the
    map-side combine collapses each partition's duplicates before the
    exchange, so the shuffle volume is per-partition *distinct* tokens,
    not corpus tokens) → a single top-k sort over the aggregated
    (vocab-sized) relation. Ties break on the token string so the vocab
    is deterministic across engines and partitionings.
    """
    # same tokenization chain as every other corpus op (tokens() =
    # split(trim(.), '\s+'); trim∘lower == lower∘trim for whitespace)
    txt = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    tok = F.explode(tokens(txt)).alias("token")
    counts = docs.select(tok).groupBy("token").agg(
        F.count(F.lit(1)).alias("tf_corpus")
    )
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # partial top-k per partition, NOT a single-reducer global sort of
    # all distinct tokens; the row_number window then ranks only the
    # already-collected top_k rows.
    top = counts.orderBy(F.desc("tf_corpus"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("tf_corpus"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w))


def oov_stats(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary statistics against ``vocab`` (a
    ``(token, ...)`` table, e.g. from :func:`build_vocab`):
    ``(id, n_tokens, n_oov, oov_frac)`` with token multiplicity.

    Plan: explode → **broadcast** left join on token (the vocab is
    top-k-bounded, so the membership probe is map-side; the corpus never
    shuffles for the join) → one partial-aggregated groupBy(id). The
    standard pre-filter for tokenizer coverage / gibberish detection.
    """
    txt = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    ex = docs.select(
        F.col(id_col),
        F.explode(tokens(txt)).alias("token"),
    )
    v = F.broadcast(vocab.select("token").withColumn("_iv", F.lit(1)))
    joined = ex.join(v, "token", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_frac",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6),
        )
    )
