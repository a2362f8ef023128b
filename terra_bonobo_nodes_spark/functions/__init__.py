"""Scalar function surface of the engine.

The reference exposes arbitrary per-record Python (``MapProperties``,
``FilterByProperties`` lambdas — common.py:269-283, common.py:196-211);
this engine's equivalent contract is the Column expression language.
``scalars.SURFACE`` documents the supported builtin surface by category
(string/datetime/math/array/map/json) — all JVM-evaluated, whole-stage
codegen, verified cross-engine by the fn_* oracle queries.
"""

from terra_bonobo_nodes_spark.functions.scalars import SURFACE, safe_div  # noqa: F401
