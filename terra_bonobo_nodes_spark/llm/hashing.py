"""Deterministic cross-engine hashing primitives for dedup operators.

Every primitive here exists in TWO forms that produce bit-identical
results: a PySpark Column builder and a DuckDB SQL-fragment generator,
both driven by the same module-level constants. That is what lets the
driver's oracle re-run MinHash/SimHash/LSH *exactly* in SQL.

The base hash is the first 8 hex chars of md5 → unsigned 32-bit int.
md5 is available and identical in Spark (JVM) and DuckDB; the engines'
native ``hash()``/``xxhash64`` functions differ, so we don't use them
in anything oracle-checked. MinHash permutations are the classic
``(a*h + b) mod p`` family with ``a < 2^17`` so ``a*h + b < 2^49``
never overflows a signed 64-bit int on either engine.

At 100 TB these expressions run entirely inside whole-stage codegen —
no Python, no UDFs; md5-per-shingle is the dominant cost and scales
linearly with scanned bytes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime > 2^32 for the MinHash permutation modulus.
MINHASH_P = 4294967311
# Bound on the multiplier keeps a*h+b within signed 64-bit.
_A_BOUND = 100003
_SEED = "tbns-minhash-v1"


def perm_params(n_hashes: int) -> list[tuple[int, int]]:
    """The (a, b) pairs for the n_hashes MinHash permutations.

    Derived from md5 of a fixed seed so Spark-side literals and
    oracle-SQL literals are always the same values.
    """
    out = []
    for i in range(n_hashes):
        h = hashlib.md5(f"{_SEED}-{i}".encode()).hexdigest()
        a = (int(h[:8], 16) % _A_BOUND) | 1  # odd, < 2^17
        b = int(h[8:16], 16)  # < 2^32
        out.append((a, b))
    return out


# --- 32-bit md5 hash --------------------------------------------------------


def hash32(c: Column) -> Column:
    """Unsigned 32-bit int from the first 8 md5 hex chars (Column)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def shingle_hash_fast(c: Column) -> Column:
    """Production-speed shingle hash: ONE JVM xxhash64 (no md5 + hex +
    conv round-trip) reduced into [0, MINHASH_P) so the permutation
    arithmetic (h·a+b, a < 2^17) still fits signed 64-bit. Measured at
    sf0.1 this is the dominant term of minhash signature cost — see
    ``dedup.minhash_signatures(hash_fn=...)``. NOT oracle-mirrorable
    (DuckDB has no xxhash64), which is the only reason md5 stays the
    default."""
    return F.pmod(F.xxhash64(c), F.lit(MINHASH_P))


def hash32_sql(expr: str) -> str:
    """DuckDB fragment matching :func:`hash32`."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# --- fixed-length polynomial hash -------------------------------------------
# RETAINED FOR REFERENCE, no longer the minhash default: re-measured at
# sf0.1 (1.46M shingles) the unrolled substr/ascii chain runs ~5x
# SLOWER than one md5+conv call — per-expression call overhead
# dominates tiny-operand arithmetic, so fewer expression calls win
# (see dedup.minhash_signatures). The algebra still holds: with base >
# max codepoint the pre-mod value is the injective base-B
# representation of the string, so collision behavior is that of the
# single `mod p` — a fine hash when an engine makes the chain cheap.
# Both engines return ascii('') = 0, so a trailing short shingle (doc
# shorter than n) hashes identically too.

_POLY_B = 1009  # > any codepoint in normalize()'s output alphabet


def hash32_poly(c: Column, n: int) -> Column:
    """Polynomial hash of the first ``n`` chars (Column form).

    Horner with a mod per step keeps every intermediate below
    MINHASH_P * _POLY_B ≈ 2^42 — no 64-bit overflow at any ``n``.
    """
    acc = None
    for i in range(1, n + 1):
        code = F.ascii(F.substring(c, i, 1)).cast("bigint")
        acc = code if acc is None else (acc * _POLY_B + code) % MINHASH_P
    return acc


def hash32_poly_sql(expr: str, n: int) -> str:
    """DuckDB fragment matching :func:`hash32_poly`."""
    acc = None
    for i in range(1, n + 1):
        code = f"ascii(substr({expr}, {i}, 1))"
        acc = code if acc is None else f"(({acc}) * {_POLY_B} + {code}) % {MINHASH_P}"
    return f"CAST({acc} AS BIGINT)"


# --- shingling --------------------------------------------------------------


def normalize(c: Column) -> Column:
    """Lowercase, collapse non-alphanumerics to single spaces, trim."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " +", " ")
    )


def normalize_sql(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower("
        f"{expr}), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"
    )


def char_shingles(c: Column, n: int) -> Column:
    """All character n-grams of the normalized text (with duplicates)."""
    norm = normalize(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: F.substring(norm, i, n),
    )


def char_shingles_sql(expr: str, n: int) -> str:
    norm = normalize_sql(expr)
    return (
        f"list_transform(range(1, greatest(length({norm}) - {n - 1}, 1) + 1), "
        f"i -> substr({norm}, i, {n}))"
    )


def word_shingles(c: Column, n: int) -> Column:
    """All word n-grams (space-joined) of the normalized text."""
    toks = F.split(normalize(c), " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def explode_char_shingles(df, id_col: str, text_col: str, n: int):
    """(id, shingle) rows — one per character n-gram position.

    Shaped so the normalized text is computed ONCE per document: a
    Project materializes ``_norm``, a Generate explodes positions, and
    the shingle substring runs per exploded row against the attribute.
    The lambda form (transform over sequence) re-evaluates the
    normalize() regex chain per element once Catalyst collapses
    projects — O(|doc|) regex per doc instead of O(1)."""
    normed = df.select(F.col(id_col), normalize(F.col(text_col)).alias("_norm"))
    pos = normed.select(
        id_col,
        "_norm",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("_norm") - (n - 1), F.lit(1)))
        ).alias("_i"),
    )
    return pos.select(
        id_col, F.col("_norm").substr(F.col("_i"), F.lit(n)).alias("shingle")
    )


def explode_word_shingles(df, id_col: str, text_col: str, n: int):
    """(id, shingle) rows — one per word n-gram position; tokens are
    materialized once per document (same rationale as the char form)."""
    toked = df.select(
        F.col(id_col), F.split(normalize(F.col(text_col)), " ").alias("_toks")
    )
    pos = toked.select(
        id_col,
        "_toks",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("_toks") - (n - 1), F.lit(1)))
        ).alias("_i"),
    )
    return pos.select(
        id_col,
        F.array_join(F.slice(F.col("_toks"), F.col("_i"), n), " ").alias("shingle"),
    )


def word_shingles_sql(expr: str, n: int) -> str:
    toks = f"str_split({normalize_sql(expr)}, ' ')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


# --- MinHash / LSH banding --------------------------------------------------
# NOTE: signatures are intentionally NOT built as per-row array
# expressions (array_min(transform(...)) per permutation): Catalyst's
# project collapsing re-inlines the shingle+hash pipeline into each of
# the k references. dedup.minhash_signatures / simhash_col use the
# inverted explode + groupBy-aggregate formulation instead.


# --- multi-position digest slicing (Bloom / Count-Min) ----------------------
# One md5 digest per key, its four 8-hex-char windows used as up to 4
# independent 32-bit hashes (Kirsch-Mitzenmacher-style derivation):
# the sketch operators pay ONE digest per key instead of k/d. Shared
# here so the cross-engine-critical slice-and-mod arithmetic and its
# DuckDB mirror exist exactly once (llm/bloom.py and llm/sketch.py
# both consume these with their own seeds).

DIGEST_SLICES = 4  # md5 = 32 hex chars = 4 x 8-hex 32-bit windows


def seeded_digest(c: Column, seed: str) -> Column:
    """md5 hex digest of ``seed + '-' + value`` (NULL in -> NULL out)."""
    return F.md5(F.concat(F.lit(f"{seed}-"), c))


def digest_slice(digest: Column, i: int, mod: int) -> Column:
    """32-bit slice ``i`` (0..3) of an md5 hex digest, mod ``mod``."""
    return F.pmod(
        F.conv(F.substring(digest, 1 + 8 * i, 8), 16, 10).cast("bigint"),
        F.lit(mod),
    )


def digest_slice_sql(expr: str, seed: str, i: int, mod: int) -> str:
    """DuckDB fragment matching ``digest_slice(seeded_digest(expr))``."""
    digest = f"md5('{seed}-' || {expr})"
    return f"(('0x' || substr({digest}, {1 + 8 * i}, 8))::BIGINT % {mod})"


def band_hash(sig: Column, band: int, rows_per_band: int) -> Column:
    """md5 of one signature band (rows_per_band consecutive components)."""
    piece = F.slice(sig, band * rows_per_band + 1, rows_per_band)
    return F.md5(F.array_join(F.transform(piece, lambda x: x.cast("string")), ","))


def band_hash_sql(sig_expr: str, band: int, rows_per_band: int) -> str:
    lo = band * rows_per_band + 1
    hi = lo + rows_per_band - 1
    return (
        f"md5(array_to_string(list_transform(list_slice({sig_expr}, {lo}, {hi}), "
        "x -> CAST(x AS VARCHAR)), ','))"
    )


def band_hash_sparksql(sig_expr: str, band: int, rows_per_band: int) -> str:
    """Spark-SQL text form of :func:`band_hash` — same tree parsed in
    one py4j round-trip instead of built op-by-op (the generated-
    expression rule: ~0.3-5 ms of driver latency per Column op)."""
    lo = band * rows_per_band + 1
    return (
        f"md5(array_join(transform(slice({sig_expr}, {lo}, {rows_per_band}), "
        "x -> CAST(x AS STRING)), ','))"
    )


