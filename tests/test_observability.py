"""Observable-cap metrics: every operator that DROPS data at a skew cap
(hot blocks, hot paragraphs, oversized LSH buckets, stop-shingles) must
surface what it excluded — the "no silent caps" discipline (SURVEY §7).
The contract is ``with_metrics=True -> (result, metrics_df)`` with a
1-row companion DataFrame (a deliberate choice over ``df.observe``:
AQE empty-relation propagation removes a CollectMetrics node together
with an empty join side, so observed metrics would vanish exactly when
everything — or nothing — was capped; reproduced in-session on
Spark 4.1). Each test constructs a degenerate input that trips the cap
and asserts the exact excluded counts, plus the zero case.
"""

from __future__ import annotations


def test_fuzzy_match_pairs_reports_dropped_blocks(spark):
    from terra_bonobo_nodes_spark.operators.linkage import fuzzy_match_pairs

    rows = [(i, f"hot name{i}") for i in range(5)] + [
        (10, "cool alpha"),
        (11, "cool alphb"),
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    out, metrics = fuzzy_match_pairs(
        df, "pid", "name", max_distance=3, max_block_size=3, with_metrics=True
    )
    # the 'hot' block (5 members > cap 3) is dropped whole; the 'cool'
    # pair survives
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(10, 11)}
    m = metrics.collect()[0]
    assert (m.n_hot_blocks, m.n_dropped_rows) == (1, 5)


def test_fuzzy_match_pairs_zero_metrics_when_no_hot_blocks(spark):
    from terra_bonobo_nodes_spark.operators.linkage import fuzzy_match_pairs

    df = spark.createDataFrame(
        [(1, "cool alpha"), (2, "cool alphb")], "pid long, name string"
    )
    out, metrics = fuzzy_match_pairs(df, "pid", "name", with_metrics=True)
    assert out.count() == 1
    m = metrics.collect()[0]
    assert (m.n_hot_blocks, m.n_dropped_rows) == (0, 0)


def test_remove_boilerplate_reports_hot_paragraphs(spark):
    from terra_bonobo_nodes_spark.llm.scrub import remove_boilerplate

    banner = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [(i, f"{banner} unique tail {i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, metrics = remove_boilerplate(
        df, "doc_id", "text", para_tokens=8, max_df=5, with_metrics=True
    )
    assert all(r.clean_text.startswith("unique tail") for r in out.collect())
    m = metrics.collect()[0]
    assert (m.n_hot_paragraphs, m.n_dropped_doc_paras) == (1, 8)


def test_remove_boilerplate_counts_within_doc_repeats(spark):
    """A hot paragraph repeated WITHIN one document drops every
    occurrence — the metric must count occurrences (so it balances
    against sum(n_para) - sum(n_kept)), not distinct documents."""
    from terra_bonobo_nodes_spark.llm.scrub import remove_boilerplate

    banner = "one two three four five six seven eight"
    rows = [(0, f"{banner} {banner} unique tail zero")] + [
        (i, f"{banner} unique tail {i}") for i in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, metrics = remove_boilerplate(
        df, "doc_id", "text", para_tokens=8, max_df=5, with_metrics=True
    )
    rows_out = out.collect()
    m = metrics.collect()[0]
    assert m.n_hot_paragraphs == 1
    assert m.n_dropped_doc_paras == 9  # 8 docs + doc 0's second copy
    assert m.n_dropped_doc_paras == sum(r.n_para - r.n_kept for r in rows_out)


def test_remove_boilerplate_zero_metrics_when_nothing_hot(spark):
    from terra_bonobo_nodes_spark.llm.scrub import remove_boilerplate

    df = spark.createDataFrame(
        [(1, "totally unique words alpha"), (2, "other unique words beta")],
        "doc_id long, text string",
    )
    out, metrics = remove_boilerplate(df, "doc_id", "text", max_df=5, with_metrics=True)
    assert out.count() == 2
    m = metrics.collect()[0]
    assert (m.n_hot_paragraphs, m.n_dropped_doc_paras) == (0, 0)


def test_minhash_lsh_pairs_reports_capped_buckets(spark):
    from terra_bonobo_nodes_spark.llm.dedup import minhash_lsh_pairs

    # 6 identical docs -> every (band, hash) bucket holds 6 rows > cap 4
    df = spark.createDataFrame(
        [(i, "identical spam cluster text body") for i in range(6)],
        "doc_id long, text string",
    )
    out, metrics = minhash_lsh_pairs(
        df, "text", "doc_id", n_hashes=8, bands=4, max_band_bucket=4,
        with_metrics=True,
    )
    assert out.collect() == []  # the whole cluster was capped away
    assert metrics.collect()[0].n_capped_band_rows == 24  # 6 docs x 4 bands


def test_minhash_lsh_pairs_cap_keeps_small_buckets(spark):
    from terra_bonobo_nodes_spark.llm.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, "identical spam cluster text body") for i in range(3)]
        + [(10, "a completely different document here")],
        "doc_id long, text string",
    )
    out, metrics = minhash_lsh_pairs(
        df, "text", "doc_id", n_hashes=8, bands=4, max_band_bucket=4,
        with_metrics=True,
    )
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(0, 1), (0, 2), (1, 2)}
    assert metrics.collect()[0].n_capped_band_rows == 0


def test_minhash_lsh_pairs_metrics_without_cap_is_zero(spark):
    from terra_bonobo_nodes_spark.llm.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(0, "some document text here"), (1, "another document body there")],
        "doc_id long, text string",
    )
    _, metrics = minhash_lsh_pairs(
        df, "text", "doc_id", n_hashes=8, bands=4, with_metrics=True
    )
    assert metrics.collect()[0].n_capped_band_rows == 0


def test_minhash_lsh_match_reports_capped_corpus_buckets(spark):
    from terra_bonobo_nodes_spark.llm.dedup import minhash_lsh_match

    new = spark.createDataFrame(
        [(100, "identical spam cluster text body")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, "identical spam cluster text body") for i in range(6)],
        "doc_id long, text string",
    )
    out, metrics = minhash_lsh_match(
        new, corpus, "text", "doc_id", n_hashes=8, bands=4,
        max_band_bucket=4, with_metrics=True,
    )
    assert out.collect() == []
    assert metrics.collect()[0].n_capped_band_rows == 24


def test_ngram_jaccard_reports_capped_postings(spark):
    from terra_bonobo_nodes_spark.llm.dedup import ngram_jaccard_pairs

    # 'stop shingle here' appears in 5 docs (> cap 3) and is the ONLY
    # overlap between docs, so capping it leaves zero pairs
    rows = [(i, f"stop shingle here unique{i} word{i} tail{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, metrics = ngram_jaccard_pairs(
        df, "text", "doc_id", shingle_n=3, word_grams=True,
        min_jaccard=0.01, max_shingle_df=3, with_metrics=True,
    )
    assert out.collect() == []
    assert metrics.collect()[0].n_capped_posting_rows == 5
