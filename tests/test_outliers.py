"""Robust per-column outlier detection (dataset/outliers.py): Tukey
IQR fences + Iglewicz-Hoaglin modified z-score (median/MAD) — row-level
violations with data-derived thresholds the outliers themselves can't
drag."""

import pytest
from pyspark.sql import functions as F

from protovalidate_spark.dataset.outliers import (
    iqr_fences, iqr_outlier_violations, mad_outlier_violations, mad_params,
)


@pytest.fixture(scope="module")
def df(spark):
    # 1..100 bulk + two planted extremes; a constant column (MAD==0);
    # a NULL-bearing column
    rows = [(i, float(i), 7.0, float(i) if i % 2 else None)
            for i in range(1, 101)]
    rows += [(101, 10_000.0, 7.0, None), (102, -10_000.0, 7.0, 10_000.0)]
    return spark.createDataFrame(
        rows, "id int, x double, const double, sparse double")


def test_iqr_fences_exact(df):
    f = iqr_fences(df, ["x"], k=1.5, exact=True)
    lo, hi, q1, q3 = f["x"]
    # quartiles of the 102 values: bulk 1..100 dominates, extremes can't
    # drag q1/q3 beyond one rank
    assert 20 < q1 < 30 and 70 < q3 < 82
    assert lo == pytest.approx(q1 - 1.5 * (q3 - q1))
    assert hi == pytest.approx(q3 + 1.5 * (q3 - q1))


def test_iqr_violations_flag_planted_only(df):
    v = iqr_outlier_violations(df, ["x"], row_key_cols=["id"],
                               k=1.5, exact=True)
    got = {(r["id"], r["field_path"], r["rule_id"]) for r in v.collect()}
    assert got == {(101, "/x", "OUTLIER"), (102, "/x", "OUTLIER")}


def test_iqr_multi_column_single_scan(df):
    v = iqr_outlier_violations(df, ["x", "sparse"], row_key_cols=["id"],
                               k=1.5, exact=True)
    rows = v.collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r["field_path"], set()).add(r["id"])
    assert by_path["/x"] == {101, 102}
    assert by_path["/sparse"] == {102}  # NULLs never flag
    # the flag pass is shuffle-free: fences are inlined literals
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_iqr_constant_column_no_flags(df):
    v = iqr_outlier_violations(df, ["const"], row_key_cols=["id"],
                               exact=True)
    assert v.count() == 0


def test_iqr_precomputed_fences_skip_param_scan(df):
    v = iqr_outlier_violations(
        df, ["x"], row_key_cols=["id"],
        fences={"x": (-20000.0, 200.0, 25.0, 75.0)})
    got = {r["id"] for r in v.collect()}
    # data-derived fences would flag both extremes; the injected lo of
    # -20000 admits the negative one -> proves the injected fences win
    assert got == {101}


def test_iqr_all_null_column_empty_result_keeps_key_dtype(spark):
    d = spark.createDataFrame([(1, None), (2, None)],
                              "id int, y double")
    v = iqr_outlier_violations(d, ["y"], row_key_cols=["id"], exact=True)
    assert v.count() == 0
    assert dict(v.dtypes)["id"] == "int"
    assert set(v.columns) == {"id", "field_path", "rule_id", "message",
                              "actual"}


def test_mad_params_exact(df):
    p = mad_params(df, ["x", "const"], exact=True)
    med, mad = p["x"]
    assert med == pytest.approx(50.5)
    # |x - 50.5| over 1..100 has median 25; the 2 extremes shift it ~0
    assert 24 < mad < 27
    assert p["const"] == (7.0, 0.0)


def test_mad_violations_and_degenerate_skip(df):
    v = mad_outlier_violations(df, ["x", "const"], row_key_cols=["id"],
                               k=3.5, exact=True)
    got = {(r["id"], r["field_path"]) for r in v.collect()}
    # const has MAD==0 -> skipped entirely; x flags only the plants
    assert got == {(101, "/x"), (102, "/x")}
    msg = v.filter(F.col("id") == 101).collect()[0]["message"]
    assert "median=50.5" in msg


def test_mad_tighter_k_flags_bulk_tails(df):
    v = mad_outlier_violations(df, ["x"], row_key_cols=["id"], k=1.0,
                               exact=True)
    ids = {r["id"] for r in v.collect()}
    assert {101, 102} <= ids and len(ids) > 10  # bulk tails join in


def test_approx_mode_matches_exact_on_smooth_data(spark):
    d = spark.createDataFrame([(i, float(i % 1000)) for i in range(5000)]
                              + [(5000, 1e7)], "id int, x double")
    ve = iqr_outlier_violations(d, ["x"], row_key_cols=["id"], exact=True)
    va = iqr_outlier_violations(d, ["x"], row_key_cols=["id"], exact=False)
    assert {r["id"] for r in ve.collect()} == {r["id"] for r in va.collect()}


def test_suite_outlier_spec(df, spark):
    """ValidationSuite.outliers wires the check in like every other
    dataset check: violations carry row keys and the OUTLIER code."""
    from protovalidate_spark import Object
    from protovalidate_spark.suite import ValidationSuite
    suite = ValidationSuite(
        rules=Object().with_unknown(), row_keys=["id"],
        outliers=[{"cols": ["x"], "k": 1.5, "exact": True},
                  {"cols": ["x"], "method": "mad", "k": 3.5,
                   "exact": True}])
    res = suite.run(df, persist=False)
    rows = res.violations.filter(F.col("rule_id") == "OUTLIER").collect()
    assert {r["id"] for r in rows} == {101, 102}
    assert len(rows) == 4  # both detectors flag both plants


def test_outlier_localizes(df, spark):
    from protovalidate_spark.dictionary import localize
    v = iqr_outlier_violations(df, ["x"], row_key_cols=["id"], exact=True)
    loc = localize(v).filter(F.col("id") == 101).collect()[0]
    assert "robust-statistical outlier" in loc["localized_message"]
    assert "10000" in loc["localized_message"]
