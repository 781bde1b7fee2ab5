"""Vector math over ``array<float>``/``array<double>`` columns.

Re-expresses the reference's vector function surface
(pgml-extension/src/vectors.rs — element-wise ops :4-114, norms
:116-174, normalize :176-236, distances :238-274, dot :276-292, cosine
:294-318, and the element-wise UDAFs sum/max/min/max_abs/min_abs
:320-900) as pure Spark SQL higher-order-function expressions.

Everything here stays inside whole-stage codegen: ``transform`` /
``zip_with`` / ``aggregate`` are Catalyst expressions evaluated on the
JVM, so there is no Python boundary and no serialization cost — at
100 TB these run at scan speed. Accumulation is done in DOUBLE for
numeric stability (the reference accumulates f32 via BLAS; our oracle
comparisons use tolerance/rounding per FIXTURES.md).

The element-wise aggregates (vec_sum etc.) are the reference's two-phase
``state/combine`` UDAFs; in Spark we get the same partial/final split
for free from the built-in aggregate on a posexploded layout, or — the
faster path used here — ``reduce`` over ``collect_list`` is avoided in
favor of exploding to (pos, value) and re-assembling, which keeps the
partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vec_add",
    "vec_subtract",
    "vec_multiply",
    "vec_divide",
    "vec_add_scalar",
    "vec_subtract_scalar",
    "vec_multiply_scalar",
    "vec_divide_scalar",
    "norm_l0",
    "norm_l1",
    "norm_l2",
    "norm_max",
    "normalize_l1",
    "normalize_l2",
    "matryoshka_truncate",
    "normalize_max",
    "distance_l1",
    "distance_l2",
    "dot_product",
    "cosine_similarity",
    "vec_sum_agg",
    "vec_min_agg",
    "vec_max_agg",
    "vec_max_abs_agg",
    "vec_min_abs_agg",
    "register_sql_functions",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(x: Column) -> Column:
    return x.cast("double")


# ---------------------------------------------------------------------------
# Element-wise scalar ops (vectors.rs:4-42)
# ---------------------------------------------------------------------------

def vec_add_scalar(v: Column | str, s) -> Column:
    return F.transform(_c(v), lambda x: _d(x) + s)


def vec_subtract_scalar(v: Column | str, s) -> Column:
    return F.transform(_c(v), lambda x: _d(x) - s)


def vec_multiply_scalar(v: Column | str, s) -> Column:
    return F.transform(_c(v), lambda x: _d(x) * s)


def vec_divide_scalar(v: Column | str, s) -> Column:
    return F.transform(_c(v), lambda x: _d(x) / s)


# ---------------------------------------------------------------------------
# Element-wise vector-vector ops (vectors.rs:44-114)
# ---------------------------------------------------------------------------

def vec_add(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) + _d(y))


def vec_subtract(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) - _d(y))


def vec_multiply(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) * _d(y))


def vec_divide(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) / _d(y))


# ---------------------------------------------------------------------------
# Norms (vectors.rs:116-174)
# ---------------------------------------------------------------------------

def norm_l0(v: Column | str) -> Column:
    """Count of non-zero elements."""
    return F.size(F.filter(_c(v), lambda x: x != 0)).cast("bigint")


def norm_l1(v: Column | str) -> Column:
    """Sum of absolute values (BLAS sasum analog)."""
    return F.aggregate(_c(v), F.lit(0.0), lambda acc, x: acc + F.abs(_d(x)))


def norm_l2(v: Column | str) -> Column:
    """Euclidean norm (BLAS snrm2 analog)."""
    return F.sqrt(F.aggregate(_c(v), F.lit(0.0), lambda acc, x: acc + _d(x) * _d(x)))


def norm_max(v: Column | str) -> Column:
    """Max absolute value (BLAS isamax analog)."""
    return F.array_max(F.transform(_c(v), lambda x: F.abs(_d(x))))


# ---------------------------------------------------------------------------
# Normalization (vectors.rs:176-236)
# ---------------------------------------------------------------------------

def _normalize(v: Column | str, norm: Column) -> Column:
    return F.transform(_c(v), lambda x: _d(x) / norm)


def normalize_l1(v: Column | str) -> Column:
    return _normalize(v, norm_l1(v))


def normalize_l2(v: Column | str) -> Column:
    return _normalize(v, norm_l2(v))


def normalize_max(v: Column | str) -> Column:
    return _normalize(v, norm_max(v))


# ---------------------------------------------------------------------------
# Distances / products (vectors.rs:238-318)
# ---------------------------------------------------------------------------

def distance_l1(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: F.abs(_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def distance_l2(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a|| * ||b||) — the canonical ANN score
    (reference: vectors.rs:294-318; used as `1 - (a <=> b)` in
    search_query_builder.rs:150)."""
    return dot_product(a, b) / (norm_l2(a) * norm_l2(b))


# -- literal-query fast paths -------------------------------------------------
# Catalyst evaluates higher-order-function lambdas (zip_with/aggregate)
# interpreted, outside whole-stage codegen — fine for ad-hoc column-vs-
# column math, but the ANN hot path scores the whole corpus against ONE
# driver-known query vector per query. Unrolling that into a flat
# element_at×constant expression keeps scoring inside codegen. The
# expression is built as ONE SQL string parsed server-side (building it
# Column-by-Column costs ~3 gateway round-trips per dimension — measured
# ~1 s of per-query driver overhead at dim 64). Addition order matches
# the left fold of F.aggregate (0.0 + t1 + t2 + ...), so results are
# bit-equal to the general path.


def _vec_sql(vec: str) -> str:
    """Backtick-quote a plain column name; pass SQL expressions through."""
    return f"`{vec}`" if vec.isidentifier() else vec


def dot_product_lit(vec: str, q: list[float]) -> Column:
    """dot_product(vec, q) for a driver-side literal q. `vec` is a SQL
    expression string (usually a column name)."""
    v = _vec_sql(vec)
    terms = " + ".join(
        f"CAST(element_at({v}, {i + 1}) AS DOUBLE) * {float(x)!r}"
        for i, x in enumerate(q)
    )
    return F.expr(f"(0.0 + {terms})")


def cosine_similarity_lit(vec: str, q: list[float]) -> Column:
    """cosine_similarity(vec, lit(q)) for a driver-side query vector,
    fully codegen. Assumes len(vec) == len(q) (uniform embedding dim —
    the ANN store's invariant); the query norm is a Python constant."""
    import math

    v = _vec_sql(vec)
    sq = " + ".join(
        f"CAST(element_at({v}, {i + 1}) AS DOUBLE)"
        f" * CAST(element_at({v}, {i + 1}) AS DOUBLE)"
        for i in range(len(q))
    )
    qn = math.sqrt(sum(x * x for x in q))
    return dot_product_lit(vec, q) / F.expr(f"(sqrt(0.0 + {sq}) * {qn!r})")


# ---------------------------------------------------------------------------
# Element-wise aggregates over grouped vectors (vectors.rs:320-900)
#
# Strategy: posexplode → (pos, value) rows → standard groupBy aggregate
# (partial/final 2-phase, map-side combine for free) → re-assemble with
# array_agg sorted by pos. This shuffles (group_keys × dim) rows of
# doubles instead of whole arrays, parallelizes across the dimension,
# and uses only codegen'd built-ins. The caller does:
#
#   df.select("g", F.posexplode(v).alias("pos", "x"))
#     .groupBy("g").agg(vec_sum_agg())
#
# via the `grouped_vec_agg` helper below.
# ---------------------------------------------------------------------------

def grouped_vec_agg(df, group_cols, vec_col, ops: dict[str, str]):
    """Element-wise aggregate of an array column per group.

    ops: {output_name: one of sum|min|max|max_abs|min_abs}
    Returns a DataFrame[group_cols..., {name: array<double>}...].
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    exploded = df.select(
        *group_cols, F.posexplode(_c(vec_col)).alias("__pos", "__x")
    ).withColumn("__x", F.col("__x").cast("double"))

    agg_fns = {
        "sum": lambda c: F.sum(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "max_abs": lambda c: F.max(F.abs(c)),
        "min_abs": lambda c: F.min(F.abs(c)),
    }
    per_pos = exploded.groupBy(*group_cols, "__pos").agg(
        *[agg_fns[op](F.col("__x")).alias(f"__v_{name}") for name, op in ops.items()]
    )
    # Re-assemble arrays ordered by position (array_sort on (pos, v) structs).
    assembled = per_pos.groupBy(*group_cols).agg(
        *[
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col(f"__v_{name}")))
                ),
                lambda s: s[f"__v_{name}"],
            ).alias(name)
            for name in ops
        ]
    )
    return assembled


def vec_sum_agg(df, group_cols, vec_col, name="vec_sum"):
    return grouped_vec_agg(df, group_cols, vec_col, {name: "sum"})


def vec_min_agg(df, group_cols, vec_col, name="vec_min"):
    return grouped_vec_agg(df, group_cols, vec_col, {name: "min"})


def vec_max_agg(df, group_cols, vec_col, name="vec_max"):
    return grouped_vec_agg(df, group_cols, vec_col, {name: "max"})


def vec_max_abs_agg(df, group_cols, vec_col, name="vec_max_abs"):
    return grouped_vec_agg(df, group_cols, vec_col, {name: "max_abs"})


def vec_min_abs_agg(df, group_cols, vec_col, name="vec_min_abs"):
    return grouped_vec_agg(df, group_cols, vec_col, {name: "min_abs"})


# ---------------------------------------------------------------------------
# SQL registration: expose the scalar surface as `pgml_*` SQL functions so
# spark.sql("SELECT pgml_cosine_similarity(a, b) ...") works like the
# reference's `pgml.cosine_similarity`.
# ---------------------------------------------------------------------------

def register_sql_functions(spark) -> None:
    """Register pgml_* SQL scalar functions (Spark SQL lambda syntax)."""
    defs = {
        "pgml_norm_l1": "aggregate(v, 0D, (acc, x) -> acc + abs(cast(x as double)))",
        "pgml_norm_l2": "sqrt(aggregate(v, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))",
        "pgml_norm_max": "array_max(transform(v, x -> abs(cast(x as double))))",
        "pgml_norm_l0": "cast(size(filter(v, x -> x != 0)) as bigint)",
    }
    for name, expr in defs.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(v ARRAY<FLOAT>) "
            f"RETURNS DOUBLE RETURN {expr}"
        )
    two_arg = {
        "pgml_dot_product": (
            "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),"
            " 0D, (acc, x) -> acc + x)"
        ),
        "pgml_distance_l1": (
            "aggregate(zip_with(a, b, (x, y) -> abs(cast(x as double) - cast(y as double))),"
            " 0D, (acc, x) -> acc + x)"
        ),
        "pgml_distance_l2": (
            "sqrt(aggregate(zip_with(a, b, (x, y) -> (cast(x as double) - cast(y as double)) *"
            " (cast(x as double) - cast(y as double))), 0D, (acc, x) -> acc + x))"
        ),
        "pgml_cosine_similarity": (
            "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, x) -> acc + x)"
            " / (sqrt(aggregate(a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
            " * sqrt(aggregate(b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))"
        ),
    }
    for name, expr in two_arg.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(a ARRAY<FLOAT>, b ARRAY<FLOAT>) "
            f"RETURNS DOUBLE RETURN {expr}"
        )


def matryoshka_truncate(v: Column | str, dim: int, renormalize: bool = True) -> Column:
    """Matryoshka (MRL) embedding truncation: keep the first ``dim``
    components and L2-renormalize — how MRL-trained models
    (OpenAI text-embedding-3, nomic-embed) trade dimensions for cost.
    Pure codegen (slice + the existing norm expressions); at 100 TB
    this runs in the scan's projection, shrinking every downstream
    shuffle/cache/index by dim_full/dim."""
    t = F.slice(_c(v), 1, dim)
    return normalize_l2(t) if renormalize else t
