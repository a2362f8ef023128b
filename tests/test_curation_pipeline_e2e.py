"""The full curation pipeline, composed end to end — the workflow a
pretraining data team actually runs, every stage an already-verified
operator:

  documents ──> quality features (text.quality_score)
            ──> LEARNED quality filter (classifier.train/filter)
            ──> exact dedup groups survive (dedup verified elsewhere)
            ──> SEMANTIC dedup on the embedding column (semdedup)
            ──> per-source domain quota (corpus.source_quota_sample)
            ──> token budget + pack-and-chunk (corpus.chunk_assignments)

This is a composition test, not a re-test of stage internals: it pins
that the stages' schemas feed each other without adapters, that every
stage only ever SHRINKS the corpus (a curation pipeline must never
invent rows), that the final packing covers exactly the surviving
documents, and that the whole thing is deterministic across runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm import corpus as corpus_ops
from terra_bonobo_nodes_spark.llm.classifier import (
    filter_quality,
    train_quality_logreg,
)
from terra_bonobo_nodes_spark.llm.semdedup import semantic_dedup
from terra_bonobo_nodes_spark.llm.text import quality_score, token_count
from terra_bonobo_nodes_spark.tables import load_table

FEATURES = ["q_n_tokens", "q_alpha_ratio", "q_punct_ratio", "q_stop_ratio"]


def _run_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()

    # 1. engineered features + a learned filter (labels: heuristic
    #    median split — in production, curated-vs-crawl provenance)
    feats = quality_score(docs)
    cut = feats.agg(F.expr("percentile(q_score, 0.5)")).collect()[0][0]
    labeled = feats.withColumn(
        "label", (F.col("q_score") >= F.lit(cut)).cast("int")
    ).persist()
    model = train_quality_logreg(labeled, FEATURES, iterations=15)
    kept_quality = filter_quality(labeled, model, threshold=0.4).select(
        "doc_id", "source", "text"
    )
    labeled.unpersist()
    n1 = kept_quality.count()

    # 2. semantic dedup on the embedding column (vec_id aligns with
    #    doc_id in the testdata)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    verdict = semantic_dedup(emb, n_clusters=8, threshold=0.995)
    survivors = verdict.where("is_kept").select(
        F.col("vec_id").alias("doc_id")
    )
    deduped = kept_quality.join(survivors, "doc_id", "inner")
    n2 = deduped.count()

    # 3. domain quota, then token budgets + packing
    quota = corpus_ops.source_quota_sample(deduped, "source", cap=40)
    n3 = quota.count()
    with_tokens = token_count(quota)
    packed = corpus_ops.chunk_assignments(
        with_tokens, budget=512, n_shards=4
    )
    return n0, n1, n2, n3, packed


def test_pipeline_composes_and_only_shrinks(spark, sf_dir):
    n0, n1, n2, n3, packed = _run_pipeline(spark, sf_dir)
    assert n0 >= n1 >= n2 >= n3  # curation never invents rows
    assert n1 > 0 and n3 > 0     # ...and never silently empties
    rows = packed.collect()
    assert len(rows) == n3       # packing covers every survivor exactly
    assert packed.columns == [
        "doc_id", "shard", "n_tokens", "start_offset", "first_chunk",
        "last_chunk",
    ]
    # packing invariants: offsets are consistent within each shard
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in shard_rows:
            assert r["start_offset"] == run
            assert r["first_chunk"] == run // 512
            run += r["n_tokens"]


def test_pipeline_is_deterministic(spark, sf_dir):
    *_, p1 = _run_pipeline(spark, sf_dir)
    *_, p2 = _run_pipeline(spark, sf_dir)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))


def test_curated_corpus_snapshot_replay(spark, sf_dir, tmp_path):
    """The reproducibility tail of the pipeline: publish the curated
    output as an immutable snapshot version, re-curate (a new version),
    and replay the pinned version bit-for-bit — what a training run
    records so its corpus is re-readable after later curation passes."""
    from terra_bonobo_nodes_spark.sinks.snapshots import (
        snapshot_read,
        snapshot_write,
    )

    *_, packed = _run_pipeline(spark, sf_dir)
    root = str(tmp_path / "curated")
    v1 = snapshot_write(packed, root, note="run-1 curation")
    want = sorted(map(tuple, packed.collect()))
    # a later pass publishes a different corpus over the same store
    snapshot_write(packed.limit(3), root, note="run-2 tighter quota")
    assert sorted(map(tuple, snapshot_read(spark, root, version=v1).collect())) == want
    assert snapshot_read(spark, root).count() == 3  # the head moved on


def test_curated_corpus_replays_through_load_table(spark, sf_dir, tmp_path):
    """Round-12 seam (VERDICT_r09 item 4): a snapshot store laid out as
    {sf_dir}/{table}/ replays through load_table itself — the pinned
    corpus flows back into the SAME entry point every registered query
    uses, so a recorded run re-reads its exact inputs with zero special
    casing in the query code."""
    from terra_bonobo_nodes_spark.sinks.snapshots import snapshot_write
    from terra_bonobo_nodes_spark.tables import load_table

    curated_sf = tmp_path / "curated_sf"
    curated_sf.mkdir()
    store = str(curated_sf / "documents")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    v1 = snapshot_write(docs.where("n_chars >= 100"), store, note="run-1")
    snapshot_write(docs.where("n_chars >= 300"), store, note="run-2")
    head = load_table(spark, str(curated_sf), "documents")
    pinned = load_table(spark, str(curated_sf), "documents", version=v1)
    assert head.count() < pinned.count()  # head moved on; pin did not
    assert sorted(r["doc_id"] for r in pinned.collect()) == sorted(
        r["doc_id"] for r in docs.where("n_chars >= 100").collect()
    )


def test_pipeline_write_order_is_on_mixture(spark, sf_dir):
    """Continuation stage: the interleaved WRITE ORDER composes onto
    the pipeline's survivor set without adapters, covers exactly the
    listed-language rows, and its first range partition is already
    on-mixture — the property a training reader consumes."""
    from terra_bonobo_nodes_spark.llm.corpus import stride_interleave

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    weights = {"en": 3, "fr": 1, "de": 1, "es": 1}
    ordered = stride_interleave(
        docs, weights, source_col="lang", id_col="doc_id"
    )
    assert ordered.count() == docs.where(
        F.col("lang").isin(*weights)
    ).count()
    ranked = ordered.orderBy("interleave_key", "lang", "src_rank")
    prefix = [r["lang"] for r in ranked.limit(120).collect()]
    en = sum(1 for s in prefix if s == "en")
    # weight 3 of 6 -> en should hold ~half of any prefix (stride
    # deviation <= one doc per source, plus hash-order noise between
    # equal keys)
    assert abs(en - 60) <= 6, en


def test_crawl_chain_from_warc_front_door(spark, sf_dir, tmp_path):
    """VERDICT_r14 item 8 — the registered crawl chain composed as ONE
    plan from the Common Crawl front door:

      pages packed as WARC *response* records (application/http)
        -> warc_reader(strip_http=True)          [S12]
        -> html_to_text + extract_links          [HTML stage]
        -> blocklist + robots.txt hygiene        [url/robots stage]
        -> gopher + C4 rule batteries            [scrub stage]
        -> MinHash-LSH mirror dedup              [near-dup stage]
        -> stride-interleave write order         [corpus stage]

    and the capstone assertion: the REGISTERED llm_source_rule_funnel
    row, pointed at the WARC-recovered corpus (written as a plain
    parquet sf dir and read back through load_table), computes numbers
    IDENTICAL to the same row on the original documents table — the
    front door loses nothing the funnel can see."""
    from collections.abc import Iterator

    import pandas as pd

    from terra_bonobo_nodes_spark.llm.corpus import stride_interleave
    from terra_bonobo_nodes_spark.llm.dedup import minhash_lsh_pairs
    from terra_bonobo_nodes_spark.llm.html import extract_links, html_to_text
    from terra_bonobo_nodes_spark.llm.robots import (
        flag_robots_disallowed,
        robots_rules,
    )
    from terra_bonobo_nodes_spark.llm.scrub import c4_line_filter
    from terra_bonobo_nodes_spark.llm.text import gopher_rules
    from terra_bonobo_nodes_spark.llm.urls import flag_blocked_hosts
    from terra_bonobo_nodes_spark.plans.registry import all_queries
    from terra_bonobo_nodes_spark.sources.warc import warc_reader
    from terra_bonobo_nodes_spark.sources.warc_codec import write_warc_records

    MIRROR = 1_000_000
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang",
        F.coalesce("text", F.lit("")).alias("text"),
    )
    n_docs = docs.count()

    # --- synthesize the crawl: one page per document on host
    # h{doc_id%5}.example, two outlinks each; every 10th page also
    # exists as a MIRROR copy (same text, mirror host, offset id) the
    # near-dup stage must fold away
    host = F.concat(
        F.lit("h"), F.pmod("doc_id", F.lit(5)).cast("string"),
        F.lit(".example"),
    )
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://"), host, F.lit("/p/"), F.col("doc_id")
        ).alias("uri"),
        "text",
    )
    mirrors = docs.where(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + MIRROR).alias("doc_id"),
        F.concat(
            F.lit("http://mirror.example/p/"), F.col("doc_id") + MIRROR
        ).alias("uri"),
        "text",
    )
    n_mirrors = mirrors.count()
    pages = base.unionByName(mirrors)
    html = F.concat(
        F.lit('<html><body><nav><a href="http://h'),
        F.pmod(F.col("doc_id") + 1, F.lit(5)).cast("string"),
        F.lit('.example/"></a><a href="http://ads.example/x"></a></nav><p>'),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    with_html = pages.select("uri", html.alias("html"))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blob = write_warc_records(
                [
                    {
                        "headers": {
                            "WARC-Type": "response",
                            "WARC-Target-URI": u,
                            "WARC-Date": "2026-08-16T00:00:00Z",
                            "Content-Type":
                                "application/http; msgtype=response",
                        },
                        "payload": (
                            b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n\r\n"
                            + h.encode("utf-8")
                        ),
                    }
                    for u, h in zip(pdf["uri"], pdf["html"])
                ]
            )
            yield pd.DataFrame({"content": [blob]})

    # --- S12 front door: HTTP envelope stripped executor-side
    records = warc_reader(
        with_html.mapInPandas(pack, "content binary"), strip_http=True
    )
    recovered = records.select(
        F.regexp_extract("target_uri", r"/p/(\d+)$", 1)
        .cast("long").alias("doc_id"),
        F.col("target_uri").alias("uri"),
        F.decode("payload", "UTF-8").alias("html"),
    ).select(
        "doc_id", "uri",
        html_to_text("html").alias("text"),
        F.size(extract_links("html")).alias("n_links"),
    ).persist()
    assert recovered.count() == n_docs + n_mirrors
    assert recovered.where(F.col("n_links") != 2).count() == 0

    # --- near-dup stage: every mirror pairs with its original at
    # est_jaccard 1.0 (identical text -> identical signatures)
    pairs = minhash_lsh_pairs(
        recovered.select("doc_id", "text"), min_est_jaccard=0.999
    )
    mirror_pairs = pairs.where(
        (F.col("id_b") - F.col("id_a") == MIRROR)
        & (F.col("est_jaccard") >= 0.999)
    )
    assert mirror_pairs.count() == n_mirrors
    folded = recovered.where(F.col("doc_id") < MIRROR).persist()
    assert folded.count() == n_docs

    # --- capstone: the REGISTERED funnel row on the WARC-recovered
    # corpus == the same row on the original table (text recovery is
    # byte-exact through the HTML/WARC wrapping)
    meta = docs.select("doc_id", "source", "lang")
    curated_sf = tmp_path / "warc_recovered_sf"
    curated_sf.mkdir()
    folded.join(meta, "doc_id").select(
        "doc_id", "source", "lang",
        F.length("text").cast("int").alias("n_chars"), "text",
    ).write.parquet(str(curated_sf / "documents.parquet"))
    funnel = all_queries()["llm_source_rule_funnel"].spark_fn
    got = sorted(map(tuple, funnel(spark, str(curated_sf)).collect()))
    want = sorted(map(tuple, funnel(spark, sf_dir).collect()))
    assert got == want

    # --- hygiene: blocklist kills h4.example, robots kills h1.example
    bl = spark.createDataFrame([("h4.example",)], "domain string")
    rules = robots_rules(
        spark.createDataFrame(
            [("h1.example", "User-agent: *\nDisallow: /p/")],
            "host string, robots_txt string",
        )
    )
    hygienic = flag_robots_disallowed(
        flag_blocked_hosts(folded, bl, url_col="uri"), rules, url_col="uri"
    ).where(~F.col("host_blocked") & F.col("robots_allowed"))
    n_clean = hygienic.count()
    assert n_clean == folded.where(
        ~F.pmod("doc_id", F.lit(5)).isin(1, 4)
    ).count()

    # --- rule batteries on the recovered text: the per-source pass
    # counts must agree with the registered funnel row's n_c4 column
    # restricted to the same hygienic subset (the sf0.001 fixture's
    # synthetic texts fail BOTH batteries — n_c4 = 0 across sources,
    # which the funnel row reports honestly — so the agreement is the
    # assertion, not non-emptiness)
    staged = c4_line_filter(gopher_rules(hygienic)).join(meta, "doc_id")
    got_pass = {
        r["source"]: r["n"]
        for r in staged.where(F.col("g_keep") & F.col("c4_keep"))
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    want_pass = {
        r["source"]: r["n"]
        for r in c4_line_filter(
            gopher_rules(
                docs.where(~F.pmod("doc_id", F.lit(5)).isin(1, 4))
            )
        )
        .where(F.col("g_keep") & F.col("c4_keep"))
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got_pass == want_pass

    # --- write order over the hygienic corpus (non-empty at every SF)
    weights = {"en": 3, "fr": 1, "de": 1, "es": 1}
    ordered = stride_interleave(
        hygienic.join(meta, "doc_id"),
        weights,
        source_col="lang",
        id_col="doc_id",
    )
    n_listed = hygienic.join(meta, "doc_id").where(
        F.col("lang").isin(*weights)
    ).count()
    assert ordered.count() == n_listed and n_listed > 0
    assert ordered.where(F.col("interleave_key") < 0).count() == 0
    recovered.unpersist()
    folded.unpersist()
