"""ObjectRuleSet.apply — the reference's full Apply semantics
(object.go:711-876): coerce → evaluate → assign typed output; NULL on
coercion failure; output formatting (WithOutputLayout/WithFixedOutput)."""

import datetime as dt

from pyspark.sql import functions as F

from protovalidate_spark import Float64, Int32, Object, String, Time


def test_apply_assigns_coerced_values(spark):
    df = spark.createDataFrame(
        [(1, "42"), (2, "nope"), (3, "99999999999")], "id long, v string")
    rs = Object().with_unknown().with_key("v", Int32().min(0))
    out = rs.apply(df)
    assert dict(out.dtypes)["v"] == "bigint"
    rows = {r["id"]: (r["v"], len(r["violations"])) for r in out.collect()}
    assert rows[1] == (42, 0)
    assert rows[2] == (None, 1)      # unparseable -> NULL + TYPE violation
    assert rows[3] == (None, 1)      # int32 overflow -> NULL + TYPE

def test_apply_passthrough_and_violations_on_original(spark):
    df = spark.createDataFrame([("a", 5), ("b", -1)], "k string, n int")
    rs = Object().with_unknown().with_key("n", Int32().min(0))
    out = rs.apply(df)
    rows = {r["k"]: (r["n"], [v["rule_id"] for v in r["violations"]])
            for r in out.collect()}
    assert rows["a"] == (5, [])
    assert rows["b"] == (-1, ["MIN"])  # assigned (coercion ok), rule failed


def test_apply_time_output_layout(spark):
    df = spark.createDataFrame([(1, "2026-03-15T10:30:00")], "id long, t string")
    rs = Object().with_unknown().with_key(
        "t", Time().with_layouts("yyyy-MM-dd'T'HH:mm:ss")
        .with_output_layout("yyyy/MM/dd"))
    out = rs.apply(df)
    assert out.collect()[0]["t"] == "2026/03/15"


def test_apply_float_fixed_output(spark):
    df = spark.createDataFrame([(1, 3.14159)], "id long, x double")
    rs = Object().with_unknown().with_key("x", Float64().with_fixed_output(2))
    assert rs.apply(df).collect()[0]["x"] == "3.14"


def test_apply_from_json_appends_typed_keys(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": 50}')], "event_id long, props string")
    rs = Object().with_json("props").with_key("k", Int32().min(10))
    out = rs.apply(df)
    rows = {r["event_id"]: (r["k"], len(r["violations"])) for r in out.collect()}
    assert rows == {1: (5, 1), 2: (50, 0)}
