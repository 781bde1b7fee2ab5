"""MongoDB-style JSON filter DSL → Spark Column predicates.

Re-expresses the SDK's filter compiler
(pgml-sdks/pgml/src/filter_builder.rs, 406 LoC: $eq/$ne :107-120,
$gt/$gte/$lt/$lte :26-29+131-141, $in/$nin :30-51+121-129,
$and/$or/$not :79-99) against either struct columns or JSON-string
columns. The reference compiles to JSONB containment SQL; here the
filter becomes a Catalyst boolean expression, so predicate pushdown and
partition pruning apply for free.

Also the order-by DSL (order_by_builder.rs:37-85): nested path + asc/
desc with NULLS LAST, compiled to Column sort expressions.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "compile_filter",
    "compile_filter_py",
    "compile_order_by",
    "struct_resolver",
    "json_resolver",
]

_CMP = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: c != v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$in": lambda c, v: c.isin(*v) if isinstance(v, (list, tuple)) else c.isin(v),
    "$nin": lambda c, v: ~(
        c.isin(*v) if isinstance(v, (list, tuple)) else c.isin(v)
    ),
}

Resolver = Callable[[list[str], Any], Column]


def struct_resolver(root: str | None = None) -> Resolver:
    """Resolve dotted paths against struct/top-level columns."""

    def resolve(path: list[str], sample_value: Any) -> Column:
        full = ".".join(([root] if root else []) + path)
        return F.col(full)

    return resolve


def json_resolver(json_col: str) -> Resolver:
    """Resolve paths against a JSON-string column via get_json_object,
    casting to the comparison value's type (JSONB comparisons in the
    reference are type-aware; get_json_object returns strings)."""

    def resolve(path: list[str], sample_value: Any) -> Column:
        c = F.get_json_object(F.col(json_col), "$." + ".".join(path))
        if isinstance(sample_value, bool):
            return c.cast("boolean")
        if isinstance(sample_value, int):
            return c.cast("bigint")
        if isinstance(sample_value, float):
            return c.cast("double")
        if isinstance(sample_value, (list, tuple)) and sample_value:
            return resolve(path, sample_value[0])
        return c

    return resolve


def compile_filter(doc: dict, resolve: Resolver, path: list[str] | None = None) -> Column:
    """Compile a Mongo-style filter document to a boolean Column.

    Semantics match filter_builder.rs: scalars are implicit $eq, sibling
    keys are implicit $and, $and/$or/$not nest arbitrarily.
    """
    path = path or []
    preds: list[Column] = []
    for key, value in doc.items():
        if key == "$and":
            preds.append(_all([compile_filter(d, resolve, path) for d in value]))
        elif key == "$or":
            preds.append(_any([compile_filter(d, resolve, path) for d in value]))
        elif key == "$not":
            inner = (
                _all([compile_filter(d, resolve, path) for d in value])
                if isinstance(value, list)
                else compile_filter(value, resolve, path)
            )
            preds.append(~inner)
        elif key in _CMP:
            preds.append(_CMP[key](resolve(path, value), value))
        elif isinstance(value, dict):
            preds.append(compile_filter(value, resolve, path + [key]))
        else:
            preds.append(resolve(path + [key], value) == value)
    return _all(preds)


def _all(preds: list[Column]) -> Column:
    out = None
    for p in preds:
        out = p if out is None else out & p
    return out if out is not None else F.lit(True)


def _any(preds: list[Column]) -> Column:
    out = None
    for p in preds:
        out = p if out is None else out | p
    return out if out is not None else F.lit(False)


# ---------------------------------------------------------------------------
# Driver-side (Python) predicate — the served tier's filter evaluator.
#
# The resident serving path (collections/serving.py) evaluates the SAME
# filter DSL against already-parsed document metadata without a Spark
# job — the analog of pgvector 0.8's iterative index scans, where the
# index scan itself honors the WHERE clause instead of forcing a seq
# scan. Semantics mirror compile_filter∘json_resolver under Spark's
# SQL three-valued logic: a missing key or a failed type cast is
# UNKNOWN (None), UNKNOWN never satisfies the top-level filter, and
# NOT/AND/OR propagate UNKNOWN the Kleene way (so `$not` of a missing
# key excludes the row on BOTH paths).

_MISSING = object()


def _py_lookup(doc, path: list[str]):
    cur = doc
    for key in path:
        if not isinstance(cur, dict) or key not in cur:
            return _MISSING
        cur = cur[key]
    return cur


def _py_coerce(value, sample):
    """Mirror json_resolver's cast: the stored JSON value is coerced to
    the comparison sample's type; an impossible cast is None (SQL NULL).
    bool is checked before int — json_resolver casts to boolean for a
    bool sample, and a bigint cast of "true" is NULL in Spark."""
    if value is _MISSING or value is None:
        return None
    if isinstance(sample, bool):
        return value if isinstance(value, bool) else None
    if isinstance(sample, (int, float)):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        return value
    if isinstance(sample, str):
        # get_json_object renders non-string scalars as JSON literals
        if isinstance(value, str):
            return value
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, (int, float)):
            import json as _json

            return _json.dumps(value)
        return None
    return value


def _py_cmp(op: str, value, operand):
    """value is the coerced stored value (None = SQL NULL) — returns
    True/False/None with NULL-propagating comparison semantics."""
    if op == "$in" or op == "$nin":
        seq = operand if isinstance(operand, (list, tuple)) else [operand]
        v = _py_coerce(value, seq[0]) if seq else None
        if v is None:
            return None
        hit = any(v == e for e in seq)
        return hit if op == "$in" else not hit
    v = _py_coerce(value, operand)
    if v is None:
        return None
    try:
        if op == "$eq":
            return v == operand
        if op == "$ne":
            return v != operand
        if op == "$gt":
            return v > operand
        if op == "$gte":
            return v >= operand
        if op == "$lt":
            return v < operand
        if op == "$lte":
            return v <= operand
    except TypeError:
        return None
    raise ValueError(f"unknown comparison operator {op!r}")


def _k_and(vals):
    out = True
    for v in vals:
        if v is False:
            return False
        if v is None:
            out = None
    return out


def _k_or(vals):
    out = False
    for v in vals:
        if v is True:
            return True
        if v is None:
            out = None
    return out


def _py_eval(doc: dict, spec: dict, path: list[str]):
    preds = []
    for key, value in spec.items():
        if key == "$and":
            preds.append(_k_and([_py_eval(doc, d, path) for d in value]))
        elif key == "$or":
            preds.append(_k_or([_py_eval(doc, d, path) for d in value]))
        elif key == "$not":
            inner = (
                _k_and([_py_eval(doc, d, path) for d in value])
                if isinstance(value, list)
                else _py_eval(doc, value, path)
            )
            preds.append(None if inner is None else not inner)
        elif key in _CMP:
            preds.append(_py_cmp(key, _py_lookup(doc, path), value))
        elif isinstance(value, dict):
            preds.append(_py_eval(doc, value, path + [key]))
        else:
            preds.append(_py_cmp("$eq", _py_lookup(doc, path + [key]), value))
    return _k_and(preds)


def compile_filter_py(spec: dict) -> Callable[[dict], bool]:
    """Compile the filter document to a plain-Python predicate over a
    parsed metadata dict. Returns True only for a definite match —
    UNKNOWN (missing key / failed cast) is excluded, exactly like the
    Spark plan's `WHERE` treats NULL predicates."""

    def pred(doc: dict) -> bool:
        return _py_eval(doc, spec, []) is True

    return pred


def compile_order_by(spec: dict, resolve: Resolver) -> list[Column]:
    """order-by DSL: {"path": "asc"|"desc"} or nested {"a":{"b":"desc"}}.

    NULLS LAST in both directions, matching order_by_builder.rs:60-66.
    """

    def walk(d: dict, path: list[str]) -> list[Column]:
        cols: list[Column] = []
        for k, v in d.items():
            if isinstance(v, dict):
                cols.extend(walk(v, path + [k]))
            else:
                c = resolve(path + [k], None)
                direction = str(v).lower()
                cols.append(
                    c.desc_nulls_last() if direction == "desc" else c.asc_nulls_last()
                )
        return cols

    return walk(spec, [])
