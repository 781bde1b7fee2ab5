"""Preprocessing semantics tests (reference: snapshot.rs §2.J; FIXTURES F4)."""

import math

import pytest
from pyspark.sql import functions as F

from postgresml_spark.preprocess import (
    Snapshot,
    analyze_columns,
    fit_preprocessor,
    train_test_split,
)


@pytest.fixture(scope="module")
def diamonds(spark):
    # miniature diamonds_cat-style fixture: numeric + categorical + NULLs
    rows = [
        (1, 1.0, "Ideal", "D", 100.0),
        (2, 2.0, "Good", "E", 200.0),
        (3, 3.0, "Ideal", None, 300.0),
        (4, 4.0, "Fair", "D", 400.0),
        (5, 5.0, "Good", "F", 500.0),
        (6, 6.0, "Premium", "E", 600.0),
        (7, 7.0, "Ideal", "D", 700.0),
        (8, 8.0, "Fair", None, 800.0),
    ]
    return spark.createDataFrame(
        rows, "id int, carat double, cut string, color string, price double"
    )


def test_split_last(diamonds):
    train, test = train_test_split(diamonds, test_size=0.25, sampling="last", order_col="id")
    assert [r["id"] for r in train.orderBy("id").collect()] == [1, 2, 3, 4, 5, 6]
    assert [r["id"] for r in test.orderBy("id").collect()] == [7, 8]


def test_split_random_deterministic(diamonds):
    t1, s1 = train_test_split(diamonds, 0.25, "random", order_col="id", seed=7)
    t2, s2 = train_test_split(diamonds, 0.25, "random", order_col="id", seed=7)
    assert sorted(r["id"] for r in t1.collect()) == sorted(r["id"] for r in t2.collect())
    assert t1.count() == 6 and s1.count() == 2


def test_split_stratified_proportions(spark):
    rows = [(i, "a" if i % 4 else "b") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id int, label string")
    train, test = train_test_split(df, 0.2, "stratified", label_col="label", order_col="id")
    tr = {r["label"]: 0 for r in train.collect()}
    for r in train.collect():
        tr[r["label"]] += 1
    # 75 a's, 25 b's → train gets ceil(75*.8)=60 and ceil(25*.8)=20
    assert tr == {"a": 60, "b": 20}
    assert train.count() + test.count() == 100


def test_analyze_stats(diamonds):
    stats = analyze_columns(diamonds, ["carat", "cut", "color"])
    c = stats["carat"]
    assert c["min"] == 1.0 and c["max"] == 8.0
    assert abs(c["mean"] - 4.5) < 1e-9
    assert abs(c["median"] - 4.5) < 1e-9  # P50 of 1..8
    assert c["missing"] == 0 and c["distinct"] == 8
    assert abs(c["std_dev"] - math.sqrt(sum((x - 4.5) ** 2 for x in range(1, 9)) / 8)) < 1e-9
    assert stats["color"]["missing"] == 2
    assert stats["cut"]["mode"] == "Ideal"


def test_dictionary_first_appearance_order(diamonds):
    m = fit_preprocessor(diamonds.orderBy("id"), ["cut"], label_col="price")
    cats = m.plans[0].categories
    # __NULL__=0, then Ideal(row1), Good(row2), Fair(row4), Premium(row6)
    assert cats == {"__NULL__": 0, "Ideal": 1, "Good": 2, "Fair": 3, "Premium": 4}
    out = m.transform(diamonds)
    got = {r["id"]: r["cut__f"] for r in out.collect()}
    assert got[1] == 1.0 and got[2] == 2.0 and got[4] == 3.0 and got[6] == 4.0


def test_null_category_and_unseen(spark, diamonds):
    m = fit_preprocessor(diamonds, ["color"], label_col="price")
    out = m.transform(diamonds)
    null_codes = [r["color__f"] for r in out.filter(F.col("color").isNull()).collect()]
    assert null_codes == [0.0, 0.0]
    unseen = spark.createDataFrame([(99, "Z")], "id int, color string")
    code = m.transform(unseen).head()["color__f"]
    assert math.isnan(code)


def test_target_encode(diamonds):
    m = fit_preprocessor(
        diamonds, ["cut"], label_col="price", preprocess={"cut": {"encode": "target"}}
    )
    out = m.transform(diamonds)
    got = {r["id"]: r["cut__f"] for r in out.collect()}
    # Ideal rows: 100,300,700 → 366.67; Good: 200,500 → 350
    assert abs(got[1] - (100 + 300 + 700) / 3) < 1e-6
    assert abs(got[2] - 350.0) < 1e-6
    # unseen at predict time → global mean (450)
    unseen_df = diamonds.sparkSession.createDataFrame([(9, "Wonky")], "id int, cut string")
    assert abs(m.transform(unseen_df).head()["cut__f"] - 450.0) < 1e-6


def test_one_hot_k_minus_1(diamonds):
    m = fit_preprocessor(
        diamonds, ["color"], label_col="price", preprocess={"color": {"encode": "one_hot"}}
    )
    # reference layout (snapshot.rs:203-222): indicators for ids 0..k-2
    # → __NULL__=0 KEEPS a column, last category F=3 is dropped
    assert m.feature_names == ["color____NULL__", "color__D", "color__E"]
    out = m.transform(diamonds)
    r1 = out.filter(F.col("id") == 1).head()  # D
    assert (r1["color____NULL__"], r1["color__D"], r1["color__E"]) == (0.0, 1.0, 0.0)
    r3 = out.filter(F.col("id") == 3).head()  # NULL → null column set
    assert (r3["color____NULL__"], r3["color__D"], r3["color__E"]) == (1.0, 0.0, 0.0)
    # F (last category) row → all zeros
    rF = out.filter(F.col("color") == "F").head()
    assert (rF["color____NULL__"], rF["color__D"], rF["color__E"]) == (0.0, 0.0, 0.0)


def test_large_dictionary_broadcast_join(spark):
    # above _DICT_JOIN_THRESHOLD the encode must be a broadcast join,
    # not a 300-branch when-chain; semantics identical (NULL→0, unseen→NaN)
    n = 300
    rows = [(i, f"cat_{i:04d}", float(i)) for i in range(n)] + [(n, None, 0.0)]
    df = spark.createDataFrame(rows, "id int, c string, y double")
    m = fit_preprocessor(df.orderBy("id"), ["c"], label_col="y")
    assert len(m.plans[0].categories) == n + 1  # + __NULL__
    out = m.transform(df)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    got = {r["id"]: r["c__f"] for r in out.collect()}
    assert got[0] == 1.0 and got[n - 1] == float(n) and got[n] == 0.0
    unseen = spark.createDataFrame([(999, "nope", 0.0)], "id int, c string, y double")
    assert math.isnan(m.transform(unseen).head()["c__f"])
    # target encode over a large dictionary also joins
    mt = fit_preprocessor(
        df.orderBy("id"), ["c"], label_col="y", preprocess={"c": {"encode": "target"}}
    )
    outt = mt.transform(df)
    gott = {r["id"]: r["c__f"] for r in outt.collect()}
    assert abs(gott[5] - 5.0) < 1e-9  # singleton category → its own label mean


def test_array_feature_flattening(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], 10.0), (2, [4.0, 5.0, 6.0], 20.0)],
        "id int, emb array<double>, y double",
    )
    m = fit_preprocessor(df, ["emb", "y"])
    assert m.feature_names == ["emb__0", "emb__1", "emb__2", "y__f"]
    assert m.plans[0].array_width == 3
    # pooled element stats: mean of 1..6 = 3.5
    assert abs(m.plans[0].stats["mean"] - 3.5) < 1e-9
    out = m.transform(df)
    r1 = out.filter(F.col("id") == 1).head()
    assert (r1["emb__0"], r1["emb__1"], r1["emb__2"]) == (1.0, 2.0, 3.0)
    assert r1["features"] == [1.0, 2.0, 3.0, 10.0]
    # pooled standard scaling applies one mu/sigma to every position
    ms = fit_preprocessor(df, ["emb"], preprocess={"emb": {"scale": "standard"}})
    sigma = ms.plans[0].stats["std_dev"]
    got = ms.transform(df).filter(F.col("id") == 2).head()
    assert abs(got["emb__0"] - (4.0 - 3.5) / sigma) < 1e-9


def test_array_feature_width_mismatch(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], "id int, emb array<double>"
    )
    with _pytest.raises(ValueError, match="Mismatched array length"):
        fit_preprocessor(df, ["emb"])
    # fit on uniform widths, transform rows with a wrong width → runtime error
    ok = spark.createDataFrame([(1, [1.0, 2.0])], "id int, emb array<double>")
    m = fit_preprocessor(ok, ["emb"])
    bad = spark.createDataFrame([(3, [9.0, 9.0, 9.0])], "id int, emb array<double>")
    with _pytest.raises(Exception, match="Mismatched array length|USER_RAISED"):
        m.transform(bad).collect()


def test_ordinal_encode(diamonds):
    m = fit_preprocessor(
        diamonds,
        ["cut"],
        label_col="price",
        preprocess={"cut": {"encode": {"ordinal": ["Fair", "Good", "Premium", "Ideal"]}}},
    )
    out = m.transform(diamonds)
    got = {r["id"]: r["cut__f"] for r in out.collect()}
    assert got[4] == 1.0 and got[2] == 2.0 and got[6] == 3.0 and got[1] == 4.0


def test_histogram_20_bins(spark):
    # 1..20 uniform → one value per equal-width bin; max lands in bin 20
    df = spark.createDataFrame([(float(v),) for v in range(1, 21)], "x double")
    st = analyze_columns(df, ["x"], with_histogram=True)["x"]
    assert st["histogram"] == [1] * 20
    # constant column: everything in the last bin (min==max degenerate)
    cdf = spark.createDataFrame([(5.0,)] * 7, "x double")
    st2 = analyze_columns(cdf, ["x"], with_histogram=True)["x"]
    assert sum(st2["histogram"]) == 7 and st2["histogram"][19] == 7


def test_ordinal_unseen_errors(spark, diamonds):
    import pytest as _pytest

    m = fit_preprocessor(
        diamonds, ["cut"], label_col="price",
        preprocess={"cut": {"encode": {"ordinal": ["Fair", "Good"]}}},
    )
    bad = diamonds.filter(F.col("cut") == "Ideal")  # not in the ordinal list
    with _pytest.raises(Exception, match="not present in ordinal|USER_RAISED"):
        m.transform(bad).collect()


def test_scalers_reference_semantics(spark):
    vals = list(range(1, 21))  # 1..20
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], "id int, x double")
    for scale, fn in {
        "standard": lambda v, s: (v - s["mean"]) / s["std_dev"],
        "min_max": lambda v, s: (v - s["min"]) / (s["max"] - s["min"]),
        "max_abs": lambda v, s: v / s["max_abs"],
        "robust": lambda v, s: (v - s["median"]) / (s["ventiles"][15] - s["ventiles"][5]),
    }.items():
        m = fit_preprocessor(df, ["x"], preprocess={"x": {"scale": scale}})
        s = m.plans[0].stats
        out = {r["id"]: r["x__f"] for r in m.transform(df).collect()}
        for i, v in enumerate(vals):
            assert abs(out[i] - fn(v, s)) < 1e-9, (scale, v)


def test_robust_scale_uses_p30_p80(spark):
    # explicit check of the non-standard quantile pair (snapshot.rs:163-173)
    df = spark.createDataFrame([(i, float(i)) for i in range(101)], "id int, x double")
    m = fit_preprocessor(df, ["x"], preprocess={"x": {"scale": "robust"}})
    s = m.plans[0].stats
    assert abs(s["ventiles"][15] - 80.0) < 1.0  # P80
    assert abs(s["ventiles"][5] - 30.0) < 1.0   # P30


def test_impute_variants(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0), (4, 30.0)], "id int, x double"
    )
    for mode, want in {
        "mean": 20.0, "median": 20.0, "min": 10.0, "max": 30.0, "zero": 0.0
    }.items():
        m = fit_preprocessor(df, ["x"], preprocess={"x": {"impute": mode}})
        got = m.transform(df).filter(F.col("id") == 2).head()["x__f"]
        assert got == want, mode


def test_impute_error_is_default(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None)], "id int, x double")
    m = fit_preprocessor(df, ["x"])
    out = m.transform(df).filter(F.col("id") == 2).head()["x__f"]
    assert out is None  # passes through; training layer raises on NULL features


def test_validation_rules(spark):
    df = spark.createDataFrame([(1, 1.0, "a")], "id int, x double, c string")
    with pytest.raises(ValueError, match="continuous"):
        fit_preprocessor(df, ["x"], preprocess={"x": {"encode": "one_hot"}})
    with pytest.raises(ValueError, match="target"):
        fit_preprocessor(df, ["c"], preprocess={"c": {"impute": "mean"}})


def test_snapshot_facade(diamonds):
    snap = Snapshot(
        diamonds.select("id", "carat", "cut", "price"),
        y_column="price",
        test_size=0.25,
        sampling="last",
        order_col="id",
        preprocess={"carat": {"scale": "standard"}},
    )
    feats = snap.features("train")
    assert "features" in feats.columns
    row = feats.orderBy("id").head()
    assert len(row["features"]) == 3  # id, carat, cut (id is a feature here)
    # train stats only: carat mean over train rows 1..6 = 3.5
    carat_plan = [p for p in snap.model.plans if p.name == "carat"][0]
    assert abs(carat_plan.stats["mean"] - 3.5) < 1e-9


def test_snapshot_label_null_errors(spark):
    df = spark.createDataFrame([(1, 1.0, None)], "id int, x double, y double")
    with pytest.raises(ValueError, match="NULL"):
        Snapshot(df, y_column="y", sampling="last", order_col="id")
