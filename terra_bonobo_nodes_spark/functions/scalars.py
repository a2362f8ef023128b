"""The engine's supported scalar-function surface, by category.

Where the reference escapes to arbitrary Python per record, this engine
stays declarative: every function here is a Spark builtin (JVM-side,
codegen, null-safe per ANSI-off semantics) with a DuckDB equivalent the
fn_* queries verify value-for-value. The table below is the public
contract — a user porting a reference pipeline maps their lambdas onto
these.

Cross-engine parity notes baked into the choices:
- ``round`` is HALF_UP in both engines (2.5→3, −2.5→−3);
- ``strpos``/``instr`` are 1-based, 0 when absent, in both;
- transcendental functions (exp/log/sin…) are NOT in the verified
  surface — libm vs JVM StrictMath may differ in the last ulp; they
  work, but aren't oracle-checked;
- Spark ``dayofweek`` is 1=Sunday while DuckDB's is 0=Sunday: the
  verified weekday form is ISO (``weekday()+1`` ≡ DuckDB ``isodow``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Category → function name → Spark builtin. The names are the engine's
# public vocabulary; each has the same semantics in the DuckDB oracle
# (modulo documented renames, e.g. instr↔strpos, size↔len).
SURFACE: dict[str, dict[str, object]] = {
    "string": {
        "upper": F.upper,
        "lower": F.lower,
        "trim": F.trim,
        "length": F.length,
        "substring": F.substring,
        "concat_ws": F.concat_ws,
        "lpad": F.lpad,
        "rpad": F.rpad,
        "replace": F.replace,
        "reverse": F.reverse,
        "repeat": F.repeat,
        "left": lambda c, n: F.substring(c, 1, n),
        "instr": F.instr,
        "translate": F.translate,
        "split": F.split,
        "regexp_replace": F.regexp_replace,
        "regexp_extract": F.regexp_extract,
        "md5": F.md5,
        "sha2": F.sha2,
    },
    "datetime": {
        "year": F.year,
        "month": F.month,
        "day": F.dayofmonth,
        "hour": F.hour,
        "minute": F.minute,
        "second": F.second,
        "isodow": lambda c: F.weekday(c) + F.lit(1),
        "date_trunc": F.date_trunc,
        "date_add": F.date_add,
        "datediff": F.datediff,
        "last_day": F.last_day,
        "unix_timestamp": F.unix_timestamp,
        "to_date": F.to_date,
        "make_date": F.make_date,
    },
    "math": {
        "abs": F.abs,
        "ceil": F.ceil,
        "floor": F.floor,
        "round": F.round,
        "sqrt": F.sqrt,
        "sign": F.signum,
        "mod": lambda a, b: a % b,
        "greatest": F.greatest,
        "least": F.least,
        "pow2": lambda c: c * c,
    },
    "array": {
        "array": F.array,
        "size": F.size,
        "element_at": F.element_at,
        "array_contains": F.array_contains,
        "sort_array": F.sort_array,
        "array_distinct": F.array_distinct,
        "array_join": F.array_join,
        "array_min": F.array_min,
        "array_max": F.array_max,
        "slice": F.slice,
        "sequence": F.sequence,
        "flatten": F.flatten,
        "transform": F.transform,
        "filter": F.filter,
        "aggregate": F.aggregate,
        "zip_with": F.zip_with,
    },
    "map": {
        "map_from_arrays": F.map_from_arrays,
        "map_keys": F.map_keys,
        "map_values": F.map_values,
        "str_to_map": F.str_to_map,
        "map_filter": F.map_filter,
    },
    "json": {
        "get_json_object": F.get_json_object,
        "from_json": F.from_json,
        "to_json": F.to_json,
        "json_tuple": F.json_tuple,
    },
}


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """num/den with 0-denominator → default (the reference's ratio ops
    guard divisions the same way, terra.py:444-446)."""
    return F.when(den != 0, num / den).otherwise(F.lit(default))
