"""Registry of correctness queries: Spark plan + DuckDB oracle SQL pairs.

Each entry exercises one operator (or a small composition) from
SURVEY.md §2 on the driver's parquet tables. Conventions that keep the
driver's order-insensitive value-hash comparison stable across engines:

- every float output is ``round(x, 4..6)`` in BOTH the Spark plan and
  the oracle SQL (kills summation-order last-ulp drift);
- no raw arrays/structs/timestamps in oracle-checked outputs — arrays
  are reduced or joined to strings, timestamps cast to epoch BIGINT;
- every computed column is aliased identically on both sides.

Queries whose semantics are not SQL-expressible (streaming state,
geometry kernels without a DuckDB spatial extension) register with
``oracle=None`` → the driver records a weaker rows-only check, and the
full semantics are covered by pytest unit tests instead.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, headline, tags)
        return fn

    return deco


# Driver-check ordering. The correctness driver walks the registry in
# dict order and checks exactly the first DRIVER_CAP queries per round,
# so order is part of the verification contract. THE RULE (standing,
# amended round 7 — the round-6 hand-maintained list misfiled one r03
# green at the tail and sequenced r04 greens after r05 greens, so the
# stale-green ordering is now COMPUTED from the CORRECTNESS_r*.json
# artifacts at import time instead of hand-edited):
#
#   (1) the DUE COHORT first — every query whose last driver green is
#       >= 2 rounds old (it would breach the freshness contract if it
#       missed the next round's window), oldest round first, within a
#       round in that round's artifact order. This section is computed,
#       not hand-listed, and is INVIOLABLE: it must always fit inside
#       DRIVER_CAP together with section (2).
#   (2) queries whose underlying operator code CHANGED since their last
#       green row (_CHANGED_THIS_ROUND, hand-maintained per round) — a
#       green row for old code is not a green row.
#   (3) new queries taking their first driver row this round
#       (_NEW_THIS_ROUND), as many as fit under DRIVER_CAP.
#   (4) changed/new overflow that did NOT fit this round
#       (_DEFERRED_TO_NEXT_ROUND) — heads the queue next round, each
#       with a ledger note below.
#   (5) everything else, stalest green first (computed), so next
#       round's due cohort is already in order; never-checked
#       stragglers (should not exist) sort before all of these.
#
# ROUND-9 BUDGET: due cohort = 43 (the 45 r06 greens, minus the two
# retired into the fn_scalar_surface merge below) + 2 changed-code
# re-greens (s1/pipeline — the csv header fix; llm_ivf_ann_topk also
# changed but is already in the due cohort) + 2 new first rows = 47 of
# DRIVER_CAP, 3 slots of slack (filled by the computed stalest-green
# tail: the oldest r07 greens pre-pay round 10's due cohort).
#
# CAPACITY POLICY (standing, decided round 9 per VERDICT_r08 item 4):
# the registry is CAPPED at 144 registered queries — 144/50 = a
# 2.88-round refresh cycle, leaving >= 6 checks of churn headroom
# (changed-code re-greens + new first rows) per 3-round freshness
# window. Adding a query REQUIRES retiring or merging one in the same
# commit (precedent: the round-9 fn_* consolidation — the three
# row-level scalar surfaces shared a grain and became one wide
# projection, identical per-function coverage, two slots freed); new
# capability work that cannot free a slot routes through pytest +
# test_plan_audit.py instead (the mojibake/BPE/kdb precedent).
# test_rotation_freshness.py::test_budget_arithmetic_holds enforces the
# per-round arithmetic; test_registry_capacity_cap pins the cap.
#
# ROUND-11 CLOSING (rewritten in round 12 per ADVICE_r11 low — the
# original prose here was authored mid-round and went stale at HEAD):
# round 11 was short (48 turns) and landed exactly ONE new
# registration, g7_transform_surface (the ADVICE_r10 planar-CRS merge
# — green r11), plus the CDATA unwrap-and-escape fix in
# sources/formats.py (no registered query touched it yet). The three
# other rows the mid-round notes promised (llm_semantic_dedup,
# llm_quality_filter_score, s11_xml_document_roundtrip) were NOT
# authored in round 11; true round-11 capacity was 141 registered
# (140 after round 10's G7 deletions + 1 new), and the r11 driver
# window ran 46 due + 1 new + 3 stalest-green fillers.
#
# ROUND-12 MAINTENANCE NOTES. The three carried rows land now:
# - llm_semantic_dedup: SemDeDup (llm/semdedup.py, pytest-only since
#   r9 — VERDICT_r09/r11 #1) through the centroids= seam: a literal
#   one-hot codebook makes cell assignment bit-exact cross-engine
#   (d_k = 1 - 2*v[k]); the oracle composes the cell-blocked cosine
#   pairs + recursive-CTE components + keep-policy window patterns
#   already green as separate rows (queries_llm.py tail).
# - llm_quality_filter_score: the learned quality filter
#   (llm/classifier.py, pytest-only since r9) with a pinned
#   LogRegModel over integer-exact features — scoring is pure
#   arithmetic (sigmoid of a standardized dot) DuckDB replays.
# - s11_xml_document_roundtrip: driver-proves formats.py's lexical
#   layer (commented-out records stay dead, CDATA field content
#   survives escaped) — paired with the round-12 lexer fix (split on
#   ']]>' only; a literal '<![CDATA[' inside a section is content,
#   the ADVICE_r11 medium) and its new pytest pins.
# Late round-12 additions (add-one-retire-one policy honored):
# - llm_text_counts_surface: merge of llm_token_count +
#   llm_bpe_token_count (fn_scalar precedent — the bpe row already
#   carried n_tokens, same doc grain, byte-identical column
#   expressions; identical per-function coverage, one slot freed).
# - e4_osm_points_roundtrip: E4 leaves the n/a-by-design set — the
#   round-12 pure-Python points-layer converter
#   (sources/osm.py::osm_points_geojson_runner) makes the OSM->GeoJSON
#   chain runnable in-process, so the roundtrip row verifies XML
#   synthesis -> executor-side conversion -> geojson_reader against
#   the events projection (the s5_k2 stand-in precedent).
# - s6_overpass_http_roundtrip: OverpassExtract proven over a REAL
#   socket (in-process Overpass stand-in + stdlib POST client — the
#   s3_http precedent), feeding the E4 in-process chain. S6 leaves the
#   n/a set. Paired retirement: e3_transit_time_one_to_one merged INTO
#   e2_transit_time_one_to_many (same customer grain; the widened row
#   runs BOTH operators and adds times_one).
# - e5_shapefile_points_roundtrip: ZipShapefileToGeojson with the
#   round-12 from-spec pure-Python .shp/.shx/.dbf codec
#   (sources/shp_codec.py) — executor-side pack, in-process convert,
#   exact binary-double geometry roundtrip. E5 leaves the n/a set.
#   Paired retirement: llm_embedding_cosine_pairs_blocked merged INTO
#   llm_embedding_cosine_pairs (same pair grain; the widened row runs
#   both the exact crossJoin form and the block_col equi-join and
#   flags each pair with in_lsh_block).
# Capacity: 141 + 7 new - 2 merged-away + ... = 144, exactly at the
# cap (check: len(all_queries()) == 144). Budget: due cohort = the 41
# r09 greens minus the retired blocked row = 40 (the widened cosine
# row is due AND changed — one check); + 1 changed (e2, r10 green,
# code widened) + 7 new = 48 <= 50, 2 slots of stalest-green slack.
# Round-12 code changes staling registered rows: the formats.py lexer
# rewrite has no previously-registered query (s11 takes its FIRST row
# against the fixed code); llm/semdedup.py's cc_max_iterations change
# lands BEFORE llm_semantic_dedup's first row (new this round);
# sinks/snapshots.py gc changes have no registered query (pytest-only
# by design); bench.py's probe touches no query plan.
#
# ROUND-13 CANDIDATES (pytest-only as of round 12 — CANDIDATES, not
# commitments; round 13 budgets them against its own due cohort and
# the add-one-retire-one policy). Late round 12 added SEVEN curation
# operators with no registered row yet. For ALL SEVEN, COMPLETE
# (spark_fn, oracle) pairs are already authored and hash-verified at
# sf0.001 AND sf0.01 in plans/queries_candidates.py (NOT imported by
# all_queries(), so they don't count against the cap; re-pinned every
# suite run by tests/test_candidates_oracle.py under the driver's
# exact compare contract); promotion is a registration edit plus a
# retire/merge per candidate:
# - llm_url_dedup_groups (llm/urls.py::canonical_url + url_dedup_groups
#   over a synthesized 4-variant URL projection; oracle via
#   canonical_url_sql). Parity also pinned by tests/test_urls.py,
#   including a hypothesis cross-engine sweep on generated URLs.
# - llm_gopher_rules (llm/text.py::gopher_rules; oracle restates the
#   flags in DuckDB list/regexp SQL, quality_score precedent). Parity
#   also pinned by tests/test_gopher.py.
# - llm_c4_line_filter (llm/scrub.py::c4_line_filter, C4 §2.2 line
#   rules + page flags); pinned by tests/test_c4.py including a
#   hypothesis sweep against a pure-Python reference.
# - llm_blocked_hosts (llm/urls.py::flag_blocked_hosts over 5 host
#   shapes; oracle restates suffix semantics as EXISTS + LIKE);
#   pinned by tests/test_urls.py.
# - llm_source_rule_yield (per-source per-rule violation counts +
#   keep rates for BOTH rule batteries in one scan + one aggregate;
#   oracle reuses the gopher/c4 per-doc oracles verbatim as CTEs).
# - llm_line_dedup (llm/scrub.py::line_dedup, CCNet corpus-level
#   first-occurrence line dedup over a synthesized header/footer
#   corpus — the testdata documents are single-line); pinned by
#   tests/test_line_dedup.py including a hypothesis sweep against a
#   pure-Python reference.
# - llm_perplexity_buckets (llm/text.py::perplexity_buckets, CCNet
#   head/middle/tail by char-LM entropy terciles on the 4-decimal
#   quantized entropy; exact=True oracle form, percentile_approx +
#   cutoffs= seam as the scale path); pinned by
#   tests/test_perplexity_buckets.py. NOTE for promotion: the in-plan
#   cutoff broadcast is a 1-row BroadcastNestedLoopJoin — add a
#   test_plan_audit allowlist entry with it.
# The shp_codec .prj-declaration guard (round 12, post-window) is
# covered by e5's round-12 row (the guard is on e5's execution path
# and the row re-verified green after it landed).

DRIVER_CAP = 50  # rows the correctness driver records per round

# (2) operator code changed since the query's last green:
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    "llm_embedding_cosine_pairs",   # widened: + in_lsh_block (merge)
    "e2_transit_time_one_to_many",  # widened: + times_one (e3 merge)
)

# (3) first driver row this round:
_NEW_THIS_ROUND: tuple[str, ...] = (
    "llm_semantic_dedup",
    "llm_quality_filter_score",
    "s11_xml_document_roundtrip",
    "llm_text_counts_surface",
    "e4_osm_points_roundtrip",
    "s6_overpass_http_roundtrip",
    "e5_shapefile_points_roundtrip",
)

# (4) overflow — heads round 10's queue:
_DEFERRED_TO_NEXT_ROUND: tuple[str, ...] = ()


def _last_green_rounds() -> tuple[int, dict[str, tuple[int, int]]]:
    """Scan the repo-root CORRECTNESS_r*.json artifacts: returns
    (latest_round, {query: (last_green_round, position_in_artifact)}).
    A row is green if it hash-matched, or had rows under the documented
    no-oracle (rows-only) contract."""
    root = Path(__file__).resolve().parents[2]
    latest = 0
    last: dict[str, tuple[int, int]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        latest = max(latest, rnd)
        for pos, (name, v) in enumerate(rows.items()):
            green = v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            )
            if green and (name not in last or rnd >= last[name][0]):
                last[name] = (rnd, pos)
    return latest, last


def _compute_priority(registered: Iterable[str]) -> list[str]:
    """The five-section ordering documented above, generated from the
    artifacts so a bookkeeping slip can't silently age a query out of
    the rotation (the round-6 failure mode)."""
    names = list(registered)
    latest, last = _last_green_rounds()
    if not last:
        # Without the artifacts the "stalest green first" sections
        # silently degrade to registration order — the exact failure
        # mode the computed ordering exists to prevent. Warn loudly so
        # an installed-package / moved-artifacts deployment can't
        # pretend the freshness contract is being honored.
        import warnings

        warnings.warn(
            "registry: no CORRECTNESS_r*.json artifacts found next to the "
            "package — correctness-rotation ordering degrades to "
            "registration order (freshness contract NOT enforced)",
            RuntimeWarning,
            stacklevel=2,
        )
    due = [n for n in names if n in last and last[n][0] <= latest - 2]
    due.sort(key=lambda n: last[n])
    order: list[str] = []
    seen: set[str] = set()
    for block in (due, _CHANGED_THIS_ROUND, _NEW_THIS_ROUND, _DEFERRED_TO_NEXT_ROUND):
        for n in block:
            if n in names and n not in seen:
                order.append(n)
                seen.add(n)
    rest = [n for n in names if n not in seen]
    # never-checked stragglers (default round 0) before stalest greens
    rest.sort(key=lambda n: last.get(n, (0, -1)))
    order.extend(rest)
    return order


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.
    from terra_bonobo_nodes_spark.plans import (  # noqa: F401
        queries_functions,
        queries_geo,
        queries_llm,
        queries_pipelines,
        queries_relational,
        queries_sources,
        queries_streaming,
    )

    order = _compute_priority(_REGISTRY)
    return {name: _REGISTRY[name] for name in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
