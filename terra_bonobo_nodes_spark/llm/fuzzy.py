"""Edit-distance similarity join — record linkage / entity resolution
(Gravano et al. 2001 "Approximate String Joins in a Database (Almost)
for Free", public: q-gram blocking + count filtering is the classic
recipe). Finds all pairs of strings within Levenshtein distance
``max_dist`` WITHOUT a cartesian product: candidates come from shared
blocks, the exact distance filter runs only inside blocks.

COMPLETENESS (no pair with dist <= d is ever missed) is guaranteed by
tiered block emission over the normalized key (L = key length, q =
gram size):

- ``L >= q*(d+1)``: emit each distinct q-gram. d edits destroy at most
  ``d*q`` of the ``L-q+1 >= d*q+1`` grams, so two long strings within
  distance d share at least one q-gram.
- ``L < q*(d+1) + d``: ALSO emit each distinct character (q=1 grams).
  d edits destroy at most d of the ``L >= 2d+1`` characters (this tier
  only matters above the tiny tier), so at least d+1 survive into any
  partner within distance d — they share a character. The ``+ d``
  margin makes the LONGER side of a mixed mid/long pair emit
  characters too (its length is < q*(d+1)+d by the length bound).
- ``L <= 3d``: ALSO emit the constant TINY block. Two strings can be
  within distance d yet share no character (``ab`` vs ``cd``, d=2)
  only when both are short; a partner of a ``<= 2d`` string has
  ``L <= 3d`` by the length bound, so the TINY block covers every
  such pair.

Every tier is an equi-join key — no cartesian anywhere; pairs found in
several blocks dedupe on (id_a, id_b) before the distance filter runs.

EXACTNESS / oracle scope: Spark's ``levenshtein`` is character-level,
DuckDB's is BYTE-level — they agree exactly on ASCII, which is what
:func:`hashing.normalize` produces ([a-z0-9 ]). The operator therefore
normalizes keys by default (``normalize_key=True``); pass False only
Spark-side where unicode-aware distances are wanted (not
oracle-mirrorable, documented).

100 TB shape: one explode to (block, id) — bounded by total distinct
grams per key; a self-equi-join on the block; distinct on the pair;
one JVM levenshtein per surviving candidate. The hazard is a stopword
gram ('the') forming a quadratic hot block — same hazard, same answer
as MinHash banding: ``block_cap`` drops blocks larger than the cap
(recall tradeoff, observable; production sets it, the oracle-checked
form leaves it None on synthetic data). AQE skew-join splits what the
cap keeps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.hashing import normalize, normalize_sql


def _blocks(key: Column, q: int, d: int) -> Column:
    """Array of tiered block keys for one normalized string (tags keep
    the tiers from colliding: 'G:' grams, 'C:' chars, 'T' tiny)."""
    L = F.length(key)
    grams = F.when(
        L >= q * (d + 1),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(L - (q - 1), F.lit(1))),
                lambda i: F.concat(F.lit("G:"), F.substring(key, i, q)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    chars = F.when(
        L < q * (d + 1) + d,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(L, F.lit(1))),
                lambda i: F.concat(F.lit("C:"), F.substring(key, i, 1)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    tiny = F.when(L <= 3 * d, F.array(F.lit("T"))).otherwise(
        F.array().cast("array<string>")
    )
    return F.concat(grams, chars, tiny)


def edit_distance_pairs(
    df: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 2,
    q: int = 3,
    normalize_key: bool = True,
    block_cap: int | None = None,
) -> DataFrame:
    """All pairs (id_a, id_b, dist) with ``dist <= max_dist``, id_a <
    id_b. Empty keys participate (two empty strings are distance 0);
    NULL keys are dropped (no linkage semantics for NULL). ``key_col``
    is meant to be a LINKAGE KEY — a title, name, or URL, tens of
    characters — not document bodies: keys travel through the block
    join and the pair dedup, and edit distance on kilobyte strings is
    the wrong similarity anyway (use MinHash for those)."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1 (use exact dedup for 0)")
    key = F.col(key_col)
    if normalize_key:
        key = normalize(key)
    keyed = df.select(
        F.col(id_col).alias("_id"), key.alias("_k")
    ).where(key.isNotNull())
    keyed = keyed.localCheckpoint(eager=False)
    ex = keyed.select(
        "_id", "_k", F.explode(_blocks(F.col("_k"), q, max_dist)).alias("_b")
    )
    if block_cap is not None:
        sizes = ex.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
        ex = ex.join(
            sizes.where(F.col("_n") <= int(block_cap)).select("_b"), "_b", "left_semi"
        )
    a = ex.select(F.col("_id").alias("id_a"), F.col("_k").alias("_ka"), "_b")
    b = ex.select(F.col("_id").alias("id_b"), F.col("_k").alias("_kb"), "_b")
    cand = (
        a.join(b, "_b")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.abs(F.length("_ka") - F.length("_kb")) <= F.lit(int(max_dist))
        )
        .select("id_a", "id_b", "_ka", "_kb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("_ka", "_kb"))
        .where(F.col("dist") <= F.lit(int(max_dist)))
        .select("id_a", "id_b", "dist")
    )


def edit_distance_match(
    df: DataFrame,
    reference: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    ref_key_col: str = "text",
    ref_id_col: str = "ref_id",
    max_dist: int = 2,
    q: int = 3,
    normalize_key: bool = True,
) -> DataFrame:
    """Asymmetric linkage — match incoming records against a STATIC
    reference/master table: (``id_col``, ``ref_id``, ``dist``) for
    every reference entry within ``max_dist`` of a record's key. Same
    tiered blocks and completeness argument as
    :func:`edit_distance_pairs`, run as an equi-join between the two
    sides' block sets instead of a self-join — which makes it a
    STREAM-STATIC join: ``df`` may be a readStream (append mode, no
    state; the per-record dedup across blocks uses dropDuplicates
    WITHIN the record's own exploded rows, a stateless projection via
    a distinct-free formulation: blocks are emitted distinct per side,
    and a (record, reference) pair surviving in several blocks is
    collapsed by the final aggregate-free distinct ONLY in batch — in
    streaming the caller gets at-least-once pair delivery and dedups
    downstream, documented). Pinned batch and over readStream by
    tests/test_fuzzy.py."""
    key = F.col(key_col)
    rkey = F.col(ref_key_col)
    if normalize_key:
        key, rkey = normalize(key), normalize(rkey)
    left = df.select(F.col(id_col).alias("_id"), key.alias("_k")).where(
        key.isNotNull()
    )
    right = reference.select(
        F.col(ref_id_col).alias("ref_id"), rkey.alias("_rk")
    ).where(rkey.isNotNull())
    lex = left.select(
        "_id", "_k", F.explode(_blocks(F.col("_k"), q, max_dist)).alias("_b")
    )
    rex = right.select(
        "ref_id", "_rk", F.explode(_blocks(F.col("_rk"), q, max_dist)).alias("_b")
    )
    cand = (
        lex.join(rex, "_b")
        .where(F.abs(F.length("_k") - F.length("_rk")) <= F.lit(int(max_dist)))
        .withColumn("dist", F.levenshtein("_k", "_rk"))
        .where(F.col("dist") <= F.lit(int(max_dist)))
        .select(F.col("_id").alias(id_col), "ref_id", "dist")
    )
    if cand.isStreaming:
        return cand  # at-least-once per shared block; dedup downstream
    return cand.distinct()


def edit_distance_pairs_sql(
    source_sql: str,
    key_expr: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 2,
    q: int = 3,
    block_cap: int | None = None,
) -> str:
    """DuckDB restatement (normalized keys — the ASCII range where
    byte-level and character-level Levenshtein coincide). ``block_cap``
    mirrors the Spark cap exactly: block sizes are deterministic counts,
    so both engines drop the same blocks."""
    d = int(max_dist)
    norm = normalize_sql(key_expr)
    cap_cte = (
        ""
        if block_cap is None
        else f""", blocks AS (
  SELECT * FROM blocks_all
  WHERE b IN (SELECT b FROM blocks_all GROUP BY b
              HAVING count(*) <= {int(block_cap)})
)"""
    )
    blocks_name = "blocks_all" if block_cap is not None else "blocks"
    return f"""
WITH keyed AS (
  SELECT {id_col} AS id, {norm} AS k FROM ({source_sql})
  WHERE {norm} IS NOT NULL
), {blocks_name} AS (
  SELECT id, k, unnest(
    list_distinct(
      CASE WHEN length(k) >= {q * (d + 1)}
           THEN list_transform(range(1, greatest(length(k) - {q - 1}, 1) + 1),
                               i -> 'G:' || substr(k, i, {q}))
           ELSE CAST([] AS VARCHAR[]) END
      || CASE WHEN length(k) < {q * (d + 1) + d}
              THEN list_transform(range(1, greatest(length(k), 1) + 1),
                                  i -> 'C:' || substr(k, i, 1))
              ELSE CAST([] AS VARCHAR[]) END
      || CASE WHEN length(k) <= {3 * d}
              THEN ['T'] ELSE CAST([] AS VARCHAR[]) END
    )
  ) AS b
  FROM keyed
){cap_cte}, cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.k AS ka, b.k AS kb
  FROM blocks a JOIN blocks b ON a.b = b.b AND a.id < b.id
  WHERE abs(length(a.k) - length(b.k)) <= {d}
)
SELECT id_a, id_b, CAST(levenshtein(ka, kb) AS INT) AS dist
FROM cand WHERE levenshtein(ka, kb) <= {d}
"""
