"""Golden-value tests for the vector math library.

Mirrors the reference's vector op tests (pgml-extension/src/vectors.rs:902-1222)
with their tolerance policy (3e-7 f32 / 5e-16 f64, vectors.rs:907-908).
"""

import math

import pytest
from pyspark.sql import functions as F

from postgresml_spark.functions import vectors as V

TOL = 3e-7


@pytest.fixture(scope="module")
def vdf(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, [0.0, -2.0, 0.5], [1.0, 1.0, 1.0]),
        (3, [0.0, 0.0, 0.0], [2.0, 2.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "id int, a array<float>, b array<float>")


def _one(df, col, id_=1):
    return df.filter(F.col("id") == id_).select(col).head()[0]


def test_elementwise_scalar(vdf):
    out = vdf.select("id", V.vec_add_scalar("a", 1.0).alias("r"))
    assert _one(out, "r") == [2.0, 3.0, 4.0]
    out = vdf.select("id", V.vec_multiply_scalar("a", 2.0).alias("r"))
    assert _one(out, "r") == [2.0, 4.0, 6.0]
    out = vdf.select("id", V.vec_divide_scalar("a", 2.0).alias("r"))
    assert _one(out, "r") == [0.5, 1.0, 1.5]


def test_elementwise_vector(vdf):
    assert _one(vdf.select("id", V.vec_add("a", "b").alias("r")), "r") == [5.0, 7.0, 9.0]
    assert _one(vdf.select("id", V.vec_subtract("a", "b").alias("r")), "r") == [-3.0, -3.0, -3.0]
    assert _one(vdf.select("id", V.vec_multiply("a", "b").alias("r")), "r") == [4.0, 10.0, 18.0]


def test_norms(vdf):
    assert _one(vdf.select("id", V.norm_l0("a").alias("r")), "r") == 3
    assert _one(vdf.select("id", V.norm_l0("a").alias("r")), "r", 2) == 2
    assert abs(_one(vdf.select("id", V.norm_l1("a").alias("r")), "r") - 6.0) < TOL
    assert abs(_one(vdf.select("id", V.norm_l2("a").alias("r")), "r") - math.sqrt(14)) < TOL
    assert abs(_one(vdf.select("id", V.norm_max("a").alias("r")), "r", 2) - 2.0) < TOL


def test_normalize(vdf):
    r = _one(vdf.select("id", V.normalize_l2("a").alias("r")), "r")
    n = math.sqrt(14)
    for got, want in zip(r, [1 / n, 2 / n, 3 / n]):
        assert abs(got - want) < TOL
    r = _one(vdf.select("id", V.normalize_l1("a").alias("r")), "r")
    for got, want in zip(r, [1 / 6, 2 / 6, 3 / 6]):
        assert abs(got - want) < TOL


def test_distances_and_products(vdf):
    assert abs(_one(vdf.select("id", V.distance_l1("a", "b").alias("r")), "r") - 9.0) < TOL
    assert abs(
        _one(vdf.select("id", V.distance_l2("a", "b").alias("r")), "r") - math.sqrt(27)
    ) < TOL
    assert abs(_one(vdf.select("id", V.dot_product("a", "b").alias("r")), "r") - 32.0) < TOL
    cos = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert abs(
        _one(vdf.select("id", V.cosine_similarity("a", "b").alias("r")), "r") - cos
    ) < TOL


def test_grouped_vec_agg(spark):
    rows = [(0, [1.0, -5.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])]
    df = spark.createDataFrame(rows, "g int, v array<float>")
    out = V.grouped_vec_agg(
        df, "g", "v", {"s": "sum", "mx": "max", "mn": "min", "ma": "max_abs", "mi": "min_abs"}
    )
    r = {row["g"]: row for row in out.collect()}
    assert r[0]["s"] == [4.0, -1.0]
    assert r[0]["mx"] == [3.0, 4.0]
    assert r[0]["mn"] == [1.0, -5.0]
    assert r[0]["ma"] == [3.0, 5.0]
    assert r[0]["mi"] == [1.0, 4.0]
    assert r[1]["s"] == [10.0, 20.0]


def test_sql_registration(spark):
    V.register_sql_functions(spark)
    row = spark.sql(
        "SELECT pgml_dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, "
        "pgml_norm_l2(array(3.0F, 4.0F)) AS n, "
        "pgml_cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c"
    ).head()
    assert abs(row["d"] - 11.0) < TOL
    assert abs(row["n"] - 5.0) < TOL
    assert abs(row["c"] - 1.0) < TOL


def test_literal_query_fast_paths_bit_equal(spark, sf_dir):
    """dot_product_lit / cosine_similarity_lit (unrolled codegen SQL)
    must be bit-equal to the general HOF path on real embeddings."""
    from postgresml_spark.session import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(100)
    qv = [float((i * 7) % 11 - 5) / 3.0 for i in range(64)]
    q = F.array(*[F.lit(float(x)) for x in qv])
    rows = e.select(
        "vec_id",
        V.dot_product(F.col("embedding"), q).alias("dot_hof"),
        V.dot_product_lit("embedding", qv).alias("dot_lit"),
        V.cosine_similarity(F.col("embedding"), q).alias("cos_hof"),
        V.cosine_similarity_lit("embedding", qv).alias("cos_lit"),
    ).collect()
    assert rows
    for r in rows:
        assert r["dot_hof"] == r["dot_lit"], r["vec_id"]
        assert r["cos_hof"] == r["cos_lit"], r["vec_id"]
