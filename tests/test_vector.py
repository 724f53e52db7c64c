"""Vector/embedding rule set (rules/vector.py): dim, finiteness,
L2-norm bounds — JVM higher-order expressions, zero UDF."""

import math

from pyspark.sql import functions as F

from protovalidate_spark import Object, Vector
from protovalidate_spark.rules.vector import l2_norm


def _df(spark):
    nan, inf = float("nan"), float("inf")
    return spark.createDataFrame(
        [(1, [0.6, 0.8]),          # unit, 2-dim
         (2, [3.0, 4.0]),          # norm 5
         (3, [0.0, 0.0]),          # zero vector
         (4, [1.0, nan]),          # NaN element
         (5, [1.0, inf]),          # Inf element
         (6, [1.0, None]),         # NULL element
         (7, [1.0, 0.0, 0.0]),     # wrong dim
         (8, None)],               # NULL vector
        "id int, v array<double>")


def _codes(vdf):
    out = {}
    for r in vdf.collect():
        out.setdefault(r["id"], set()).add(r["rule_id"])
    return out


def test_vector_rules(spark):
    rs = Object().with_unknown().with_key(
        "v", Vector().dim(2).finite().norm_min(0.5).norm_max(1.5))
    got = _codes(rs.violations(_df(spark), row_key_cols=["id"]))
    assert got[2] == {"MAX"}
    assert got[3] == {"MIN"}
    # NaN norm: both bounds use NaN-greater-than-all ordering ⇒ MAX only
    assert got[4] == {"RANGE", "MAX"}
    assert got[5] == {"RANGE", "MAX"}
    # NULL element: finiteness violation; fold norm is NULL ⇒ neither
    # bound predicate passes nor fails deterministically — coalesce(False)
    # in the rule entry makes a NULL predicate a violation
    assert "RANGE" in got[6]
    assert got[7] == {"TYPE"}
    # NULL vector (not required, no with_nil): NULL code from base
    assert got[8] == {"NULL"}
    assert 1 not in got


def test_vector_unit_tolerance(spark):
    rs = Object().with_unknown().with_key("v", Vector().unit(0.01))
    df = _df(spark).filter(F.col("id").isin(1, 2))
    got = _codes(rs.violations(df, row_key_cols=["id"]))
    assert 1 not in got and got[2] == {"MAX"}


def test_l2_norm_value(spark):
    df = _df(spark).filter(F.col("id") == 2)
    n = df.select(l2_norm(F.col("v")).alias("n")).collect()[0]["n"]
    assert math.isclose(n, 5.0)


def test_vector_accumulates_all(spark):
    # 3-dim NaN vector against dim(2): TYPE and RANGE both fire
    df = spark.createDataFrame([(1, [1.0, float("nan"), 2.0])],
                               "id int, v array<double>")
    rs = Object().with_unknown().with_key("v", Vector().dim(2).finite())
    got = _codes(rs.violations(df, row_key_cols=["id"]))
    assert got[1] == {"TYPE", "RANGE"}


def test_vector_inherits_array_rules(spark):
    # min_len from ArrayRuleSet still chains
    df = spark.createDataFrame([(1, [1.0])], "id int, v array<double>")
    rs = Object().with_unknown().with_key("v", Vector().min_len(2))
    got = _codes(rs.violations(df, row_key_cols=["id"]))
    assert got[1] == {"MIN_LEN"}


def test_vector_plan_is_udf_free(spark):
    df = _df(spark)
    rs = Object().with_unknown().with_key(
        "v", Vector().dim(2).finite().norm_min(0.5).norm_max(1.5))
    plan = rs.violations(df, row_key_cols=["id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan