"""Text analysis operators: tokenization, quality, language id, fingerprints.

All pure Column expressions (JVM-side, whole-stage codegen) — at 100 TB
these run at scan speed with zero Python. Regex patterns stick to
POSIX-ish classes (``[a-z0-9]``) that behave identically in Java regex
(Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "en"),
}


def tokens(text: Column | str) -> Column:
    """Lowercased word tokens (whitespace+punct split, empties removed).

    The str form parses ONE SQL expression instead of building the
    HOF lambda op-by-op (~10 py4j round-trips per call, and this is
    the most-called builder in the text battery — measured r17); both
    forms produce the identical Catalyst tree."""
    if isinstance(text, str):
        return F.expr(
            f"filter(split(lower({text}), '[^a-z0-9]+'), "
            "t -> length(t) > 0)"
        )
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def nonempty_trimmed_lines(text: Column | str) -> Column:
    """Non-empty trimmed lines of a text column — THE line grain every
    line-level operator keys on (gopher_rules' line flags,
    scrub.line_dedup, streaming line_dedup_stream), defined once so
    batch and stream can never disagree about what a line is.

    NOT ``F.transform(..., F.trim)``: trim(col, trim=None) is binary,
    so transform would feed it (element, index) and strip index digits
    from every line (the round-12 hypothesis-sweep bug)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(c, "\n", -1), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace/punct token count (the BPE-ish regex tokenizer's
    sequence length upper bound)."""
    return df.withColumn(out, F.size(tokens(text_col)).cast("long"))


# GPT-2-style pretokenizer, restricted to constructs RE2 also supports
# (no lookahead) so the DuckDB oracle tokenizes identically: English
# contractions, space-prefixed letter/digit runs, punctuation runs,
# whitespace runs.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"
BPE_SPLIT_RE_SQL = r"''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+"


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pretokens of the lowercased text — the sequence a
    GPT-2-family BPE would merge within; its length upper-bounds (and
    closely tracks) the real BPE token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    return df.withColumn(out, F.size(bpe_tokens(text_col)).cast("long"))


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """All character n-grams (shingles) of the normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(c), r"\s+", " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: F.substring(norm, i, n),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", prefix: str = "q_"
) -> DataFrame:
    """Heuristic quality features + composite score: length, mean word
    length, alpha ratio, punctuation density, stopword ratio. The score
    is a transparent linear blend — a placeholder for a learned filter,
    but the *features* are the standard pretraining-corpus ones."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(c).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z]", "")).cast("double")
    n_punct = n_chars - F.length(F.regexp_replace(c, PUNCT_RE, "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    ).cast("double")
    mean_word = F.when(n_tokens > 0, n_alpha / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.25
        + stop_ratio * 0.25
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.25
    )
    return df.withColumns(
        {
            f"{prefix}n_chars": n_chars,
            f"{prefix}n_tokens": n_tokens,
            f"{prefix}alpha_ratio": alpha_ratio,
            f"{prefix}punct_ratio": punct_ratio,
            f"{prefix}stop_ratio": stop_ratio,
            f"{prefix}mean_word_len": mean_word,
            f"{prefix}score": score,
        }
    )


def repetition_ratios(
    df: DataFrame, text_col: str = "text", prefix: str = "rep_"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1, public): the fraction of word tokens that are duplicates of
    an earlier token, and the same over word 2-grams. High values mark
    boilerplate / keyword-stuffed pages a pretraining filter drops.
    Pure column expressions — array ops stay in codegen, no UDF."""
    toks = tokens(text_col)
    n = F.size(toks)
    word_dup = F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)) / n,
    ).otherwise(F.lit(0.0))
    # zip heads with tails (slice degrades to [] for n <= 1, where
    # sequence(1, n-1) would go descending and index out of range)
    pair_len = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigram_dup = F.when(
        n > 1,
        F.lit(1.0) - F.size(F.array_distinct(bigrams)) / (n - 1),
    ).otherwise(F.lit(0.0))
    return df.withColumns(
        {
            f"{prefix}word_dup_ratio": word_dup,
            f"{prefix}bigram_dup_ratio": bigram_dup,
        }
    )


# The required-stopword list Gopher publishes (Rae et al. 2021 §A1.1):
# a document must contain at least 2 of these to survive.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    prefix: str = "g_",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021 §A1.1, public) as
    named per-rule violation flags plus the combined ``keep`` verdict —
    the thresholded-rules complement to ``quality_score``'s blended
    score (a curation pipeline wants to know WHICH rule fired, to audit
    the filter's yield per rule before committing to it at corpus
    scale). Default thresholds are the paper's.

    Emits ``{prefix}n_words``, ``{prefix}mean_word_len``, one boolean
    ``{prefix}flag_*`` per rule (True = violates = Gopher would drop),
    and ``{prefix}keep`` (no rule fired). An empty/wordless document
    fires ``flag_n_words``, ``flag_mean_word_len`` and
    ``flag_alpha_words`` (its ratios degrade to 0) — consistent with
    the paper, which never lets an empty page through.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#'-to-word and
    ellipsis-to-word ratios <= max_symbol_word_ratio; fraction of
    lines starting with a bullet <= max_bullet_line_ratio; fraction of
    lines ending in an ellipsis <= max_ellipsis_line_ratio; fraction
    of words containing a letter >= min_alpha_word_ratio; at least
    min_stop_hits DISTINCT ``GOPHER_STOPWORDS`` present.

    Pure Column expressions in the cross-engine regex subset (module
    docstring) — scan-speed projection, zero shuffles, oracle-ready.
    """
    # NULL text behaves as the empty page (ADVICE_r12): like the sibling
    # filters c4_line_filter/line_dedup, coalesce to '' so the empty-doc
    # flags fire instead of NULL keep verdicts silently propagating into
    # downstream boolean filters.
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(c)
    n = F.size(toks)
    nd = n.cast("double")
    # total token chars as length-of-concat: one O(n) join beats the
    # higher-order aggregate's per-element lambda dispatch (measured
    # 0.26s vs 0.29s on the sf0.1 corpus scan)
    mean_word_len = F.when(
        n > 0, F.length(F.array_join(toks, "")).cast("double") / nd
    ).otherwise(F.lit(0.0))
    n_hash = (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))).cast(
        "double"
    )
    # non-overlapping, like the paper's counting: '....' is one ellipsis
    n_ellipsis = F.regexp_count(c, F.lit(r"\.\.\.|…")).cast("double")
    hash_ratio = F.when(n > 0, n_hash / nd).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n > 0, n_ellipsis / nd).otherwise(F.lit(0.0))
    lines = nonempty_trimmed_lines(c)
    n_lines = F.size(lines).cast("double")
    bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike("^[-*•]"))
    ).cast("double")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    ).cast("double")
    bullet_ratio = F.when(n_lines > 0, bullet_lines / n_lines).otherwise(F.lit(0.0))
    ellipsis_line_ratio = F.when(n_lines > 0, ellipsis_lines / n_lines).otherwise(
        F.lit(0.0)
    )
    alpha_ratio = F.when(
        n > 0, F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / nd
    ).otherwise(F.lit(0.0))
    # distinct stopwords present = |tokens ∩ stopword set| (intersect
    # dedupes); 3x cheaper than 8 array_contains probes (0.15s vs
    # 0.48s on the sf0.1 corpus scan)
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*(F.lit(w) for w in GOPHER_STOPWORDS)))
    )
    flags = {
        f"{prefix}flag_n_words": (n < min_words) | (n > max_words),
        f"{prefix}flag_mean_word_len": (mean_word_len < min_mean_word_len)
        | (mean_word_len > max_mean_word_len),
        f"{prefix}flag_symbol_ratio": (hash_ratio > max_symbol_word_ratio)
        | (ellipsis_ratio > max_symbol_word_ratio),
        f"{prefix}flag_bullet_lines": bullet_ratio > max_bullet_line_ratio,
        f"{prefix}flag_ellipsis_lines": ellipsis_line_ratio
        > max_ellipsis_line_ratio,
        f"{prefix}flag_alpha_words": alpha_ratio < min_alpha_word_ratio,
        f"{prefix}flag_stopwords": stop_hits < min_stop_hits,
    }
    keep = None
    for flag in flags.values():
        keep = flag if keep is None else (keep | flag)
    return df.withColumns(
        {
            f"{prefix}n_words": n.cast("long"),
            f"{prefix}mean_word_len": mean_word_len,
            **flags,
            f"{prefix}keep": ~keep,
        }
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    out: str = "lang_pred",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Stopword-profile language id: count profile hits per language
    (duplicates count — frequency matters), argmax with deterministic
    tie-break on language code. 'und' when nothing matches."""
    profiles = profiles or LANG_PROFILES
    toks = tokens(text_col)

    def hits_in(words: tuple[str, ...]):
        # closure factory: PySpark derives lambda-variable count from the
        # Python signature, so captures must not be default args
        return lambda t: t.isin(*words)

    hit_structs = [
        F.struct(
            F.size(F.filter(toks, hits_in(words))).alias("hits"),
            # negate the code lexicographically for max: use code asc as
            # tiebreak by sorting desc on (hits, reversed_code)? Simpler:
            # array_max over (hits, code) prefers larger code on ties, so
            # invert: store a sort key that prefers smaller code.
            F.lit(code).alias("code"),
        )
        for code, words in sorted(profiles.items())
    ]
    arr = F.array(*hit_structs)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("zzz").alias("code")),
        lambda acc, x: F.when(
            (x["hits"] > acc["hits"])
            | ((x["hits"] == acc["hits"]) & (x["code"] < acc["code"])),
            x,
        ).otherwise(acc),
    )
    pred = F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))
    return df.withColumn(out, pred)


def fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Document fingerprint: md5 of the punctuation/whitespace/case
    normalized text — stable under reflow, the exact-dedup key."""
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), r"\s+", " "))
    return df.withColumn(out, F.md5(F.encode(norm, "UTF-8")))


# Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
# fingerprinter, public): polynomial hash over character k-grams, then
# keep the minimum hash of every `window` consecutive grams. A shared
# substring of length >= k + window - 1 is guaranteed to yield at least
# one shared fingerprint, while only ~2/(window+1) of gram hashes
# survive. Base 31 with k <= 10 ASCII chars keeps every hash below
# 2^53 — exact in Spark longs AND in the DuckDB oracle's int64, no
# modular reduction needed on either side.
#
# Plan shape (the hashing.py NOTE applies): an expression referenced
# inside a higher-order-function lambda is re-evaluated PER ELEMENT, so
# nesting `grams` inside the window-minima transform would make the
# whole thing O(n^2) per document. Instead each stage lands in its own
# projection and lambdas only ever reference materialized attributes:
#   P1: _wnorm  (normalize regex, once per doc)
#   P2: _wgrams (O(n*k) substr/ascii folds against the _wnorm attr)
#   P3: fps     (O(n*window) slice minima against the _wgrams attr)
# Each projection references its input >= 2 times, which stops
# Catalyst's CollapseProject from re-inlining the expensive child.
#
# Even staged, ArrayTransform/ArrayAggregate are CodegenFallback in
# Spark — every lambda element evaluates through the INTERPRETED
# expression walker (measured ~3 ms per 300-char doc; 16 s for the
# sf0.1 corpus). So the default implementation keeps only the
# normalize regex JVM-side (bit-parity with the DuckDB oracle's regex)
# and runs the gram/minima arithmetic as a vectorized Arrow kernel:
# int64 numpy correlate + sliding-window min, bit-identical values,
# ~100x faster. impl="expr" retains the pure-expression form as the
# cross-checked reference.
WINNOW_BASE = 31


def _gram_hashes(norm: Column, k: int) -> Column:
    """Polynomial hashes of all k-grams of a *materialized* string
    attribute. Horner over substr/ascii; ascii('') = 0 on both engines,
    so docs shorter than k hash their zero-padded tail identically."""
    m = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc * WINNOW_BASE
            + F.ascii(norm.substr(i + j, F.lit(1))).cast("long"),
        ),
    )


def _window_minima(norm: Column, grams: Column, window: int) -> Column:
    nw = F.greatest(F.size(grams) - (window - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), nw),
        lambda w: F.array_min(F.slice(grams, w, window)),
    )
    return F.when(
        F.length(norm) > 0, F.array_sort(F.array_distinct(wins))
    ).otherwise(F.array().cast("array<long>"))


def _winnow_arrow_udf(k: int, window: int):
    """Arrow-batched winnowing kernel over pre-normalized strings.

    numpy int64 throughout: correlate(codes, 31^[k-1..0]) reproduces the
    Horner fold exactly (values < 2^53, no overflow), sliding-window min
    + unique reproduces array_sort(array_distinct(minima)). Short docs
    zero-pad to k, matching ascii('') = 0 on the expression/oracle side.
    """
    weights = (WINNOW_BASE ** np.arange(k - 1, -1, -1)).astype(np.int64)

    def one(norm: str) -> list[int]:
        if not norm:
            return []
        codes = np.frombuffer(norm.encode("ascii"), dtype=np.uint8).astype(np.int64)
        if codes.size < k:
            codes = np.pad(codes, (0, k - codes.size))
        # correlate(a, v, "valid")[i] = sum_j a[i+j] * v[j]; v = descending
        # powers reproduces the Horner fold exactly
        grams = np.correlate(codes, weights, mode="valid")
        if grams.size <= window:
            mins = np.array([grams.min()], dtype=np.int64)
        else:
            view = np.lib.stride_tricks.sliding_window_view(grams, window)
            mins = view.min(axis=1)
        return np.unique(mins).tolist()

    @F.pandas_udf("array<long>")
    def udf(norm: pd.Series) -> pd.Series:
        return norm.map(one)

    return udf


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out: str = "fingerprints",
    k: int = 8,
    window: int = 4,
    impl: str = "arrow",
) -> DataFrame:
    """Adds ``out``: sorted distinct winnowed fingerprints (array<long>)
    of the normalized text. ``impl="arrow"`` (default) normalizes
    JVM-side and hashes in a vectorized Arrow kernel; ``impl="expr"``
    is the pure-column-expression reference (bit-identical, ~100x
    slower — interpreted HOF evaluation)."""
    from terra_bonobo_nodes_spark.llm.hashing import normalize

    if impl not in ("arrow", "expr"):
        raise ValueError(f"impl must be arrow|expr, got {impl!r}")
    if impl == "arrow":
        return df.withColumn(out, _winnow_arrow_udf(k, window)(normalize(F.col(text_col))))
    staged = df.withColumn("_wnorm", normalize(F.col(text_col))).withColumn(
        "_wgrams", _gram_hashes(F.col("_wnorm"), k)
    )
    return staged.withColumn(
        out, _window_minima(F.col("_wnorm"), F.col("_wgrams"), window)
    ).drop("_wnorm", "_wgrams")


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowed fingerprints: explode to
    an inverted index (fingerprint -> doc), self-join inside each
    posting list, count shared prints per pair. The classic MOSS match
    step as one shuffle-on-fingerprint + one shuffle-on-pair.

    Scale: posting lists are the skew hazard — a boilerplate fragment
    shared by millions of docs would make one fingerprint quadratic.
    ``max_fp_df`` drops fingerprints whose document frequency exceeds
    the cap (they carry no dedup signal anyway), exactly like
    ``max_shingle_df`` in ngram_jaccard_pairs.

    The fingerprint arrays sit behind an optimizer barrier on purpose:
    InferFiltersFromGenerate plants a ``size(fps) > 0`` predicate under
    the Generate, and filter-pushdown-through-project *always* inlines
    the referenced expression — without a barrier the whole staged
    winnow computation collapses into that one interpreted predicate
    (normalize regex re-run per lambda element, O(n^2·k) per doc;
    measured: minutes instead of seconds at 500 docs). The barrier is a
    lazy ``localCheckpoint`` rather than ``persist``: a persisted
    relation lives in the session CacheManager until explicitly
    unpersisted (every call would leak executor storage for the session
    lifetime), while a checkpoint RDD is owned by the returned
    DataFrame's plan and is released by Spark's ContextCleaner when the
    result is garbage-collected. It holds (id, fps) only — ~8 bytes per
    surviving gram, smaller than the text itself."""
    fps_df = winnow_fingerprints(df, text_col, "_fps", k, window).select(
        F.col(id_col).alias("doc"), F.col("_fps")
    ).localCheckpoint(eager=False)
    inv = fps_df.select("doc", F.explode("_fps").alias("fp"))
    if max_fp_df is not None:
        # heavy-hitter removal as a broadcast anti-join: the hot set
        # (df > cap) is tiny by construction, so this costs one partial
        # agg + a broadcast instead of a full sort of the posting list
        # (a window count over fp would sort every posting row).
        hot = (
            inv.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("fp_df"))
            .where(F.col("fp_df") > F.lit(max_fp_df))
            .select("fp")
        )
        inv = inv.join(F.broadcast(hot), "fp", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    return (
        a.join(
            b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc"))
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(min_shared))
    )


def tfidf_topk_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    idf: str = "log",
    max_vocab_df: int | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    ``idf="log"`` uses the smoothed sklearn-style
    ``ln((N+1)/(df+1)) + 1``; ``idf="raw"`` uses the rational
    ``(N+1)/(df+1)`` — same plumbing, and exactly reproducible across
    engines (no transcendental), which is what the oracle-checked
    query uses. Ties break on the term string so top-k is
    deterministic.

    Plan: explode tokens -> per-(doc, term) counts (one shuffle with
    map-side partial agg) -> document frequencies (second shuffle on
    term, vocabulary-sized output) -> join scores back on term ->
    window top-k per doc. The N scalar is a broadcast single-row
    cross join, not a collect. ``max_vocab_df`` optionally drops
    ubiquitous terms (df above the cap) before scoring — both a skew
    guard and a stopword filter at corpus scale.
    """
    if idf not in ("log", "raw"):
        raise ValueError(f"idf must be log|raw, got {idf!r}")
    toks = df.select(F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    if max_vocab_df is not None:
        dfreq = dfreq.where(F.col("dfc") <= F.lit(max_vocab_df))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("_n"))
    ratio = (F.col("_n") + F.lit(1.0)) / (F.col("dfc") + F.lit(1.0))
    idf_col = (F.log(ratio) + F.lit(1.0)) if idf == "log" else ratio
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * idf_col)
    )
    w = Window.partitionBy("_doc").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_doc").alias(id_col), "term", "tf", "dfc", "score", "rank"
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "tbns-split-v1",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 8 md5 hex
    chars of ``seed || id`` as a uniform u32, mapped to cumulative
    weight thresholds. Stable across runs, engines, partitionings and
    cluster sizes — the property a training pipeline needs so that
    re-runs and incremental appends never migrate a document between
    splits. Pure column expressions, no shuffle, no RNG state."""
    from terra_bonobo_nodes_spark.llm.hashing import hash32

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    u = hash32(F.concat(F.lit(seed), F.col(id_col).cast("string"))) / F.lit(
        4294967296.0
    )
    expr = None
    cum = 0.0
    items = sorted(weights.items())  # deterministic threshold order
    for name, wgt in items[:-1]:
        cum += wgt / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out, expr)


LM_ALPHABET_SIZE = 37  # a-z, 0-9, space: the normalize() output alphabet


def char_lm_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lm_entropy",
    m_col: str = "n_bigrams",
) -> DataFrame:
    """Per-document cross-entropy under a character-bigram language
    model TRAINED ON THE CORPUS ITSELF — the KenLM-style fluency signal
    quality pipelines threshold on (gibberish and boilerplate-stuffed
    documents sit in the tails), with add-one smoothing over the
    normalize() alphabet.

    Numerics: P(c2|c1) = (n(c1c2)+1)/(n(c1·)+37) from exact integer
    counts; each log is quantized to DECIMAL(20,6) before the exact
    per-doc sum, so reduction order cannot move the result and a 1-ulp
    ln() difference between engines is absorbed by the quantum.

    Plan: one shuffle for the bigram counts (the model — at most 37²
    rows — broadcasts back onto the exploded corpus), one shuffle for
    the per-doc aggregate. The corpus explodes to one row per character
    ONCE; nothing self-joins.
    """
    from terra_bonobo_nodes_spark.llm.hashing import normalize

    nd = df.select(F.col(id_col), normalize(F.col(text_col)).alias("_t"))
    # O(n) bigram build: char-split once, zip the array with its shift.
    # (substring(t, i, 2) per position would copy O(n) per element —
    # O(n²) per document in the interpreted higher-order evaluator;
    # measured 2x on the sf0.1 corpus.)
    chars = F.filter(F.split("_t", ""), lambda c: F.length(c) > 0)
    n = F.size(chars)
    bg = nd.select(
        id_col,
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(chars, 1, n - 1),
                    F.slice(chars, 2, n - 1),
                    lambda a, b: F.concat(a, b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_b"),
    )
    # Collapse occurrences to per-doc (bigram, n) FIRST: the alphabet is
    # ≤37², so map-side combine shrinks the shuffle to at most 37² rows
    # per input partition (wordcount shape), the model aggregates from
    # this small relation instead of a second explode pass, and scoring
    # multiplies the quantized log by the integer count — exactly equal
    # to summing the quantized log per occurrence, so the SQL oracle can
    # (and does) state the per-occurrence form. The checkpoint barrier
    # shares the relation between the model and scoring consumers
    # (winnow lifetime contract).
    bgc = (
        bg.groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    mc = bgc.groupBy("_b").agg(F.sum("_n").alias("_c"))
    pc = mc.groupBy(F.substring("_b", 1, 1).alias("_c1")).agg(
        F.sum("_c").alias("_pc")
    )
    model = mc.join(pc, F.substring(mc["_b"], 1, 1) == pc["_c1"]).select(
        "_b",
        (
            (F.col("_c") + 1).cast("double")
            / (F.col("_pc") + LM_ALPHABET_SIZE).cast("double")
        ).alias("_p"),
    )
    scored = bgc.join(F.broadcast(model), "_b").select(
        id_col,
        F.col("_n"),
        (F.log(F.col("_p")).cast("decimal(20,6)") * F.col("_n")).alias("_lp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("_n").alias(m_col),
        (-F.sum("_lp").cast("double") / F.sum("_n")).alias(out_col),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(m_col), F.lit(0)).cast("long").alias(m_col),
            F.coalesce(F.col(out_col), F.lit(0.0)).alias(out_col),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    out_col: str = "ppl_bucket",
    cutoffs: tuple[float, float] | None = None,
    exact: bool = False,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3,
    public): split the corpus into ``head`` / ``middle`` / ``tail`` by
    corpus quantiles of the char-bigram cross-entropy
    (:func:`char_lm_entropy` — lower = more fluent = head, the slice
    CCNet trains on first). Documents with no bigrams get ``empty``
    and do not influence the cutoffs.

    Buckets are decided on the 4-decimal-quantized entropy (the same
    quantum the registered entropy row pins cross-engine), so the
    boundary comparisons are engine-exact: for p = k/3 the
    interpolation fraction is in {0, 1/3, 2/3}, placing an interpolated
    cutoff at least 3.3e-5 inside an adjacent-value gap of the 1e-4
    grid — no quantized value can straddle it.

    Scale (100 TB): pass ``cutoffs=`` (computed once upstream, e.g.
    from a prior run or a sample) and the tagging is a pure projection
    over the entropy scores. ``cutoffs=None`` computes them in-plan:
    ``exact=False`` (default) uses ``percentile_approx`` — mergeable
    sketch, the production path; ``exact=True`` uses the exact
    ``percentile`` aggregate, which gathers the group's values on one
    reducer — the oracle/validation form, not the 100 TB one.

    Returns ``id_col``, ``n_bigrams``, ``lm_entropy`` (quantized), and
    ``out_col``.
    """
    scored = char_lm_entropy(df, id_col, text_col).withColumn(
        "_e4", F.round(F.col("lm_entropy"), 4)
    )
    if cutoffs is not None:
        tagged = scored.withColumns(
            {"_c1": F.lit(float(cutoffs[0])), "_c2": F.lit(float(cutoffs[1]))}
        )
    else:
        # the doc-grain scores feed BOTH the cutoff aggregation and the
        # final tagging — checkpoint so the char-LM subtree (explode +
        # model build) runs once, not twice (winnow lifetime contract)
        scored = scored.localCheckpoint(eager=False)
        nonempty = scored.where(F.col("n_bigrams") > 0)
        if exact:
            cut = nonempty.agg(
                F.percentile("_e4", F.lit(float(probs[0]))).alias("_c1"),
                F.percentile("_e4", F.lit(float(probs[1]))).alias("_c2"),
            )
        else:
            # accuracy 1e5: rank error <= n/1e5 — at most one grid
            # value off at the boundary, and exact below 1e5 values.
            cut = nonempty.agg(
                F.percentile_approx(
                    "_e4", F.lit(float(probs[0])), F.lit(100_000)
                ).alias("_c1"),
                F.percentile_approx(
                    "_e4", F.lit(float(probs[1])), F.lit(100_000)
                ).alias("_c2"),
            )
        tagged = scored.crossJoin(F.broadcast(cut))
    bucket = (
        F.when(F.col("n_bigrams") == 0, F.lit("empty"))
        .when(F.col("_e4") <= F.col("_c1"), F.lit("head"))
        .when(F.col("_e4") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return tagged.select(
        id_col,
        "n_bigrams",
        F.col("_e4").alias("lm_entropy"),
        bucket.alias(out_col),
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_col: str = "token",
) -> DataFrame:
    """Tokenizer-fit report: per group, how much of the token stream a
    fixed vocabulary covers — the signal that decides whether a
    tokenizer trained on one mix is reusable on another (a source with
    a high OOV rate fragments into bytes/unks and trains badly).
    Emits (group, n_tokens, n_oov, oov_rate_ppm) — the rate in exact
    integer parts-per-million ((n_oov * 1_000_000) div n_tokens), so
    the report hash-compares cross-engine.

    Plan: one posexplode of :func:`tokens` (the shared whitespace+punct
    grain), a LEFT join against the vocabulary (one row per distinct
    vocab token — broadcast at any real vocab size: 100k tokens is
    KBs), and one combinable groupBy on the group key. NULL text
    contributes zero tokens; a group whose every doc is NULL still
    reports (0, 0, NULL rate)."""
    toks = df.select(
        F.col(group_col).alias("group"),
        F.explode_outer(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "_tok"
        ),
    )
    vv = vocab.select(
        F.col(vocab_col).alias("_tok"), F.lit(True).alias("_in_vocab")
    ).distinct()
    joined = toks.join(F.broadcast(vv), "_tok", "left")
    agg = joined.groupBy("group").agg(
        F.count(F.col("_tok")).alias("n_tokens"),
        F.sum(
            F.when(
                F.col("_tok").isNotNull() & F.col("_in_vocab").isNull(), 1
            ).otherwise(0)
        ).alias("n_oov"),
    )
    return agg.select(
        "group",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_oov").cast("long").alias("n_oov"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(n_oov * 1000000) div n_tokens"),
        )
        .cast("long")
        .alias("oov_rate_ppm"),
    )


def top_tokens(
    df: DataFrame,
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """The corpus's k most frequent tokens — (token, n) with the
    deterministic (count desc, token asc) tie-break; the from-corpus
    vocabulary builder :func:`vocab_coverage` pairs with. One explode +
    one combinable count, then ``orderBy().limit(k)`` — Spark plans
    that as TakeOrderedAndProject (per-partition top-k heaps merged on
    the driver), NOT a single-partition global sort, so the plan holds
    at any distinct-token count. Total order: token is unique within
    the count frame, so the tie-break is unambiguous."""
    if k < 1:
        raise ValueError("top_tokens needs k >= 1")
    counts = (
        df.select(
            F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(int(k))
        .select("token", F.col("n").cast("long").alias("n"))
    )


def readability(
    df: DataFrame, text_col: str = "text", prefix: str = "r_"
) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade as EXACT integer
    milli-point columns — the classic readability pair (Flesch 1948,
    Kincaid et al. 1975, public) that quality filters use as a
    too-simple/too-dense text signal next to :func:`quality_score`'s
    ratios. Counts are deterministic heuristics: words = the shared
    :func:`tokens` grain; sentences = [.!?]+ runs (min 1 so ratios are
    total); syllables = vowel-group ([aeiouy]+) runs per word, min 1
    per word — the standard approximation.

    Formulas in scaled integer floor arithmetic (both engines agree):
    ``flesch_milli = 206835 - (1015 * W * 1000) div S div 1000 -
    (84600 * Syl) div W`` is algebraically restated below with all
    divisions as single floor divs; NULL when a document has no words.
    Pure Column expressions — no UDF, no shuffle."""
    # SQL-text expressions, not per-op Column/HOF building: the lambda
    # builders alone cost ~0.35s of py4j round-trips per build
    # (measured r17); the parsed text is the identical Catalyst tree.
    c = f"coalesce({text_col}, '')"
    toks_s = f"filter(split(lower({c}), '[^a-z0-9]+'), t -> length(t) > 0)"
    syl = F.expr(
        f"aggregate(transform({toks_s}, t -> greatest(1, "
        f"size(filter(split(t, '[^aeiouy]+'), x -> length(x) > 0)))), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    n_words = F.expr(f"CAST(size({toks_s}) AS BIGINT)")
    # Sentence fragments count only when they contain a character
    # outside the explicit ASCII whitespace class [ \t\n\x0B\f\r]
    # (Spark's ``trim`` strips only spaces, so "0?\n" counted 2
    # sentences — VERDICT_r14 item 1). The class is the CONTRACT, by
    # design C-locale: Java's \S is exactly that class, the SQL mirror
    # spells it out (RE2's \S omits \x0B), and the pinned Python
    # reference strips the same explicit set — a fragment of
    # NON-ASCII whitespace (U+00A0, U+2028, ...) counts as a sentence
    # on ALL engines identically. Unicode-whitespace definitions
    # (Java (?U)\s, RE2 \p{Z}, Python str.isspace) disagree with each
    # other at the edges, so no unicode contract can be cross-engine
    # exact; the ASCII class can, and is (pinned with a U+00A0 case).
    n_sent = F.expr(
        f"CAST(greatest(1, size(filter(split({c}, '[.!?]+'), "
        "s -> s rlike '\\\\S'))) AS BIGINT)"
    )
    flesch = F.when(
        n_words > 0,
        F.lit(206835)
        - F.expr(f"(1015 * {prefix}n_words) div {prefix}n_sentences")
        - F.expr(f"(84600 * {prefix}n_syllables) div {prefix}n_words"),
    ).cast("long")
    fk = F.when(
        n_words > 0,
        F.expr(f"(390 * {prefix}n_words) div {prefix}n_sentences")
        + F.expr(f"(11800 * {prefix}n_syllables) div {prefix}n_words")
        - F.lit(15590),
    ).cast("long")
    out = df.withColumns(
        {
            f"{prefix}n_words": n_words,
            f"{prefix}n_sentences": n_sent,
            f"{prefix}n_syllables": syl,
        }
    )
    return out.withColumns(
        {f"{prefix}flesch_milli": flesch, f"{prefix}fk_grade_milli": fk}
    )


def readability_sql(expr: str, prefix: str = "r_") -> str:
    """DuckDB SELECT-fragment mirror of :func:`readability` (append to
    a projection over the same relation)."""
    toks = (
        f"list_filter(str_split_regex(lower(coalesce({expr}, '')), "
        "'[^a-z0-9]+'), x -> length(x) > 0)"
    )
    syl = (
        f"list_sum(list_transform({toks}, t -> greatest(1, "
        "len(list_filter(str_split_regex(t, '[^aeiouy]+'), "
        "x -> length(x) > 0)))))"
    )
    sent = (
        f"greatest(1, len(list_filter(str_split_regex(coalesce({expr}, ''), "
        "'[.!?]+'), s -> regexp_matches(s, '[^ \\t\\n\\x0B\\f\\r]'))))"
    )
    return f"""
  CAST(len({toks}) AS BIGINT) AS {prefix}n_words,
  CAST({sent} AS BIGINT) AS {prefix}n_sentences,
  CAST(coalesce({syl}, 0) AS BIGINT) AS {prefix}n_syllables,
  CAST(CASE WHEN len({toks}) > 0 THEN
    206835 - (1015 * len({toks})) // {sent}
           - (84600 * coalesce({syl}, 0)) // len({toks})
  END AS BIGINT) AS {prefix}flesch_milli,
  CAST(CASE WHEN len({toks}) > 0 THEN
    (390 * len({toks})) // {sent}
    + (11800 * coalesce({syl}, 0)) // len({toks}) - 15590
  END AS BIGINT) AS {prefix}fk_grade_milli"""
