"""Cross-row / cross-table integrity checks (dataset/integrity.py):
reconciliation, monotonicity, volume anomalies, calendar completeness."""

from pyspark.sql import functions as F

from protovalidate_spark.dataset import (
    calendar_gap_violations, monotonic_violations,
    reconciliation_violations, volume_anomalies,
)


def _fact(spark):
    # order 1: sums to 100 (exact), order 2: sums to 90 (10% off 100),
    # order 3: no dim row needed here; order 4 has no fact rows
    return spark.createDataFrame(
        [(1, 60.0), (1, 40.0), (2, 90.0), (3, 55.0)], "k int, amt double")


def _dim(spark):
    return spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 50.0), (4, 77.0)],
        "dk int, total double")


def test_reconciliation_exact_and_tolerance(spark):
    fact, dim = _fact(spark), _dim(spark)
    v = reconciliation_violations(
        fact, dim, "k", "dk", F.sum("amt"), "total")
    got = {(r["dk"], r["rule_id"]) for r in v.collect()}
    # exact: 2 (90 vs 100) and 3 (55 vs 50) mismatch; 4 has no fact rows
    assert got == {(2, "RECONCILE"), (3, "RECONCILE"), (4, "REQUIRED")}

    v = reconciliation_violations(
        fact, dim, "k", "dk", F.sum("amt"), "total", rel_tol=0.11)
    got = {(r["dk"], r["rule_id"]) for r in v.collect()}
    # 10% off passes at rel_tol 0.11; 3 is 10% off too (55/50)
    assert got == {(4, "REQUIRED")}

    v = reconciliation_violations(
        fact, dim, "k", "dk", F.sum("amt"), "total", abs_tol=6.0)
    got = {(r["dk"], r["rule_id"]) for r in v.collect()}
    # abs 6 admits 55-vs-50, not 90-vs-100
    assert got == {(2, "RECONCILE"), (4, "REQUIRED")}


def test_reconciliation_missing_fact_optional(spark):
    v = reconciliation_violations(
        _fact(spark), _dim(spark), "k", "dk", F.sum("amt"), "total",
        rel_tol=0.11, report_missing_fact=False)
    assert v.count() == 0


def test_reconciliation_carries_expected_actual(spark):
    v = reconciliation_violations(
        _fact(spark), _dim(spark), "k", "dk", F.sum("amt"), "total")
    row = {r["dk"]: r for r in v.collect()}
    assert row[2]["expected"] == 100.0 and row[2]["actual_agg"] == 90.0
    assert row[4]["actual_agg"] is None
    assert row[2]["field_path"] == "/total"


def _seq(spark):
    # key 1: 10, 20, 15 (one break), key 2: 5, 5 (flat),
    # key 3: NULL in the middle never violates
    return spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 15),
         (2, 1, 5), (2, 2, 5),
         (3, 1, 7), (3, 2, None), (3, 3, 6)],
        "k int, pos int, v int")


def test_monotonic_non_decreasing(spark):
    v = monotonic_violations(_seq(spark), ["k"], ["pos"], "v",
                             row_key_cols=["k", "pos"])
    got = {(r["k"], r["pos"], r["rule_id"]) for r in v.collect()}
    assert got == {(1, 3, "MONOTONIC")}


def test_monotonic_strict_flags_ties(spark):
    v = monotonic_violations(_seq(spark), ["k"], ["pos"], "v", strict=True,
                             row_key_cols=["k", "pos"])
    got = {(r["k"], r["pos"]) for r in v.collect()}
    assert got == {(1, 3), (2, 2)}


def test_monotonic_non_increasing(spark):
    v = monotonic_violations(_seq(spark), ["k"], ["pos"], "v",
                             direction="non_increasing",
                             row_key_cols=["k", "pos"])
    got = {(r["k"], r["pos"]) for r in v.collect()}
    # 10→20 breaks descending order
    assert got == {(1, 2)}


def test_monotonic_null_predecessor_skipped(spark):
    # key 3: 7 → NULL → 6: the NULL row never violates, and 6 compares
    # against the lag (NULL), not against 7 — also no violation
    v = monotonic_violations(_seq(spark), ["k"], ["pos"], "v",
                             row_key_cols=["k", "pos"])
    assert not [r for r in v.collect() if r["k"] == 3]


def test_volume_anomalies(spark):
    rows = [(d, i) for d in ("a", "b", "c") for i in range(100)]
    rows += [("d", i) for i in range(10)]  # d has 10 rows, mean 77.5
    df = spark.createDataFrame(rows, "g string, i int")
    v = volume_anomalies(df, F.col("g"), "grp", max_rel_dev=0.5)
    got = {(r["grp"], r["cnt"], r["rule_id"]) for r in v.collect()}
    assert got == {("d", 10, "DRIFT")}


def test_volume_min_count_floor(spark):
    rows = [("a", 1)] * 50 + [("b", 1)] * 40
    df = spark.createDataFrame(rows, "g string, i int")
    # mean 45, both within 50% — only the absolute floor fires
    v = volume_anomalies(df, F.col("g"), "grp", max_rel_dev=0.5,
                         min_count=45)
    got = {(r["grp"], r["cnt"]) for r in v.collect()}
    assert got == {("b", 40)}


def test_calendar_gaps(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-02",), ("2024-01-05",), (None,)],
        "d string").select(F.col("d").cast("date").alias("d"))
    v = calendar_gap_violations(df, F.col("d"), "day")
    got = {(str(r["day"]), r["rule_id"], r["actual"]) for r in v.collect()}
    assert got == {("2024-01-03", "REQUIRED", "2024-01-03"),
                   ("2024-01-04", "REQUIRED", "2024-01-04")}


def test_calendar_no_gaps(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-02",)], "d string") \
        .select(F.col("d").cast("date").alias("d"))
    assert calendar_gap_violations(df, F.col("d"), "day").count() == 0


def test_suite_integration_integrity_checks(spark):
    """ValidationSuite carries the integrity family: monotonic rows keep
    their row keys; volume/calendar/reconciliation rows ride with NULL
    keys and the identifying value in the message."""
    from protovalidate_spark import Int64, Object
    from protovalidate_spark.suite import ValidationSuite

    df = spark.createDataFrame(
        [("2024-01-01", 1, 1, 10), ("2024-01-01", 1, 2, 5),
         ("2024-01-03", 2, 1, 7)] + [("2024-01-03", 3, 1, 1)] * 9,
        "d string, k int, pos int, v int") \
        .select(F.col("d").cast("date").alias("d"), "k", "pos", "v")
    dim = spark.createDataFrame([(1, 15), (2, 7), (9, 1)],
                                "dk int, total int")
    suite = ValidationSuite(
        rules=Object().with_unknown().with_key(
            "v", Int64().with_required()),
        row_keys=["k", "pos"],
        monotonic=[{"key_cols": ["k"], "order_cols": ["pos"],
                    "value_col": "v"}],
        reconciliations=[{"dim": dim, "fact_key": "k", "dim_key": "dk",
                          "fact_expr": F.sum("v"), "dim_col": "total"}],
        volume_specs=[{"group_col": "d", "max_rel_dev": 0.5}],
        calendar_cols=["d"])
    res = suite.run(df)
    rows = res.violations.collect()
    by_rule = {}
    for r in rows:
        by_rule.setdefault(r["rule_id"], []).append(r)
    # k=1: 10 -> 5 breaks monotonicity, keyed to the violating row
    assert len(by_rule["MONOTONIC"]) == 1
    assert by_rule["MONOTONIC"][0]["k"] == 1
    # dim 9 has no fact rows (REQUIRED); dim 1 sums to 15 = exact match,
    # dim 2 sums to 7 = exact match -> only the missing-fact row
    assert any("[dk=9]" in r["message"] for r in by_rule["REQUIRED"])
    # 2024-01-02 missing from the calendar
    assert any(r["actual"] == "2024-01-02" for r in by_rule["REQUIRED"])
    # day counts 2 / 10 vs mean 6 -> both days flagged DRIFT
    drift_days = [r for r in by_rule["DRIFT"] if "[d=" in r["message"]]
    assert len(drift_days) == 2


def test_reconciliation_zero_expected_no_ansi_crash(spark):
    """A ZERO dim value must not crash ANSI division: relative tolerance
    is undefined there (try_divide → NULL → no admit); abs_tol still
    applies, and 0-vs-0 reconciles exactly."""
    fact = spark.createDataFrame([(1, 5.0), (2, 0.0)], "k int, amt double")
    dim = spark.createDataFrame([(1, 0.0), (2, 0.0)],
                                "dk int, total double")
    v = reconciliation_violations(fact, dim, "k", "dk", F.sum("amt"),
                                  "total", rel_tol=0.1)
    got = {(r["dk"], r["rule_id"]) for r in v.collect()}
    assert got == {(1, "RECONCILE")}  # 5 vs 0 flags; 0 vs 0 passes
    v = reconciliation_violations(fact, dim, "k", "dk", F.sum("amt"),
                                  "total", abs_tol=5.0)
    assert v.count() == 0


def test_schema_contract(spark):
    from protovalidate_spark.dataset import schema_violations
    df = spark.createDataFrame([(1, "a", 2.0)],
                               "id bigint, name string, v double")
    spec = {"id": "bigint", "name": "string", "v": "double"}
    assert schema_violations(df, spec).count() == 0
    got = {(r["field_path"], r["rule_id"]) for r in schema_violations(
        df, {"id": "int", "name": "string", "missing": "date"}).collect()}
    assert got == {("/id", "TYPE"), ("/missing", "REQUIRED"),
                   ("/v", "UNEXPECTED")}
    # allow_extra suppresses UNEXPECTED only
    got = {(r["field_path"], r["rule_id"]) for r in schema_violations(
        df, {"id": "int"}, allow_extra=True).collect()}
    assert got == {("/id", "TYPE")}
    # type normalization: decimal spacing and case are cosmetic
    from decimal import Decimal
    d = spark.createDataFrame([(Decimal("1.00"),)], "x decimal(10,2)")
    assert schema_violations(d, {"x": "DECIMAL(10, 2)"}).count() == 0


def test_group_size_bounds(spark):
    from protovalidate_spark.dataset import group_size_violations
    rows = ([(1, i) for i in range(3)] + [(2, 0)]
            + [(3, i) for i in range(8)] + [(None, 0)])
    df = spark.createDataFrame(rows, "k int, i int")
    v = group_size_violations(df, ["k"], min_n=2, max_n=6)
    got = {(r["k"], r["group_n"], r["rule_id"]) for r in v.collect()}
    # NULL keys skipped; 1 (n=3) within bounds
    assert got == {(2, 1, "MIN"), (3, 8, "MAX")}
    # one-sided bounds
    assert group_size_violations(df, ["k"], max_n=10).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        group_size_violations(df, ["k"])


def test_freshness_global_and_per_group(spark):
    from protovalidate_spark.dataset import freshness_violations
    d = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 11:59:00"),
         ("b", "2024-01-01 09:00:00"), ("c", None)],
        "src string, ts string").withColumn("ts", F.to_timestamp("ts"))
    # global: newest row (11:59) within 1h of noon -> fresh
    g = freshness_violations(d, F.col("ts"), "ts", 1.0,
                             "2024-01-01 12:00:00")
    assert g.count() == 0
    # global with a 30s budget -> stale, one EXPIRED row
    g2 = freshness_violations(d, F.col("ts"), "ts", 30 / 3600,
                              "2024-01-01 12:00:00").collect()
    assert len(g2) == 1 and g2[0]["rule_id"] == "EXPIRED"
    assert g2[0]["field_path"] == "/ts"
    # per-group: only b is stale at a 1h budget; c (all-NULL ts) is
    # filtered out, not a crash and not a finding here
    pg = freshness_violations(d, F.col("ts"), "ts", 1.0,
                              "2024-01-01 12:00:00",
                              group_col="src").collect()
    assert [(r["src"], r["rule_id"]) for r in pg] == [("b", "EXPIRED")]
    assert str(pg[0]["max_ts"]).startswith("2024-01-01 09:00:00")


def test_freshness_suite_spec(spark):
    from protovalidate_spark import Object
    from protovalidate_spark.suite import ValidationSuite
    d = spark.createDataFrame(
        [(1, "a", "2024-01-01 11:30:00"), (2, "b", "2024-01-01 08:00:00")],
        "id int, src string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    suite = ValidationSuite(
        rules=Object().with_unknown(), row_keys=["id"],
        freshness=[{"ts_col": "ts", "max_age_hours": 1.0,
                    "as_of": "2024-01-01 12:00:00", "group_col": "src"}])
    rows = suite.run(d, persist=False).violations \
        .filter(F.col("rule_id") == "EXPIRED").collect()
    assert len(rows) == 1 and "[src=b]" in rows[0]["message"]


def test_functional_dependency(spark):
    from protovalidate_spark.dataset import functional_dependency_violations
    d = spark.createDataFrame(
        [("c1", "wav"), ("c1", "wav"),            # consistent
         ("c2", "wav"), ("c2", "flac"),           # conflict
         ("c3", None), ("c3", "opus"),            # NULL dep ignored
         (None, "wav"), (None, "flac")],          # NULL key skipped
        "clip string, codec string")
    v = functional_dependency_violations(d, ["clip"], "codec")
    rows = v.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["clip"] == "c2" and r["n_values"] == 2
    assert (r["dep_min"], r["dep_max"]) == ("flac", "wav")
    assert r["rule_id"] == "CONSISTENT" and r["field_path"] == "/codec"
    assert "2 values, e.g. flac vs wav" == r["actual"]


def test_functional_dependency_single_shuffle(spark):
    from protovalidate_spark.dataset import functional_dependency_violations
    d = spark.createDataFrame([("a", 1)] * 10, "k string, v int")
    v = functional_dependency_violations(d, ["k"], "v")
    plan = v._jdf.queryExecution().executedPlan().toString()
    # count_distinct expands to a two-phase agg over ONE key exchange;
    # no join, no second scan
    assert "Join" not in plan
    assert v.count() == 0
