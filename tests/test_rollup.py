"""Salted rollup (dataset/rollup.py): the two-level salted aggregation
must be result-identical to the plain groupBy, null-aware for avg."""

from pyspark.sql import functions as F

from protovalidate_spark.dataset import salted_rollup

METRICS = [("count", None, "n"), ("sum", "v", "v_sum"),
           ("min", "v", "v_min"), ("max", "v", "v_max"),
           ("avg", "v", "v_avg")]


def _df(spark):
    rows = [("a", 1), ("a", 3), ("a", None), ("b", 10),
            ("a", 2), ("b", None), ("c", 7)]
    return spark.createDataFrame(rows, "k string, v int")


def test_salted_equals_plain(spark):
    df = _df(spark)
    plain = {tuple(r) for r in salted_rollup(df, ["k"], METRICS, 0).collect()}
    salted = {tuple(r) for r in salted_rollup(df, ["k"], METRICS, 8).collect()}
    assert plain == salted
    got = {r["k"]: r for r in salted_rollup(df, ["k"], METRICS, 8).collect()}
    assert got["a"]["n"] == 4 and got["a"]["v_sum"] == 6
    assert got["a"]["v_avg"] == 2.0      # null-aware: 6/3, not 6/4
    assert got["b"]["v_min"] == 10 and got["c"]["v_max"] == 7


def test_salted_plan_has_two_aggregates(spark):
    df = _df(spark)
    plan = salted_rollup(df, ["k"], METRICS, 8) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") >= 2  # partial(keys,salt) + merge(keys)
