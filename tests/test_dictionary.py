"""Error dictionary / i18n (reference errors/dict.go, _examples/i18n):
message templates broadcast-joined onto violations at report time."""

from pyspark.sql import functions as F

from protovalidate_spark import Int32, Object
from protovalidate_spark.dictionary import DEFAULT_DICT, localize


def _violations(spark):
    df = spark.createDataFrame([(1, 4000), (2, 16000)], "id long, sr int")
    rs = Object().with_unknown().with_key("sr", Int32().min(8000))
    return rs.violations(df, row_key_cols=["id"])


def test_localize_default(spark):
    v = localize(_violations(spark))
    rows = {r["id"]: r["localized_message"] for r in v.collect()}
    assert rows == {1: "field /sr is below the minimum (got 4000)"}


def test_localize_custom_locale_with_fallback(spark):
    de = {**DEFAULT_DICT, "MIN": "Feld {path} unterschreitet das Minimum ({actual})"}
    v = localize(_violations(spark), templates=de, locale="de")
    assert v.collect()[0]["localized_message"] == \
        "Feld /sr unterschreitet das Minimum (4000)"


def test_localize_unknown_rule_falls_back_to_builtin(spark):
    v = _violations(spark).withColumn("rule_id", F.lit("CUSTOM_X"))
    out = localize(v)
    # no template for CUSTOM_X -> engine's built-in message preserved
    assert out.collect()[0]["localized_message"] == out.collect()[0]["message"]


def test_interface_with_cast(spark):
    # Interface().with_cast: stacked casts, newest first, first non-null
    # wins (reference inerface.go:69-74,131-144)
    from protovalidate_spark.rules.misc import Interface
    rs = (Interface()
          .with_cast(lambda c: F.try_to_timestamp(c, F.lit("yyyy-MM-dd")))
          .with_cast(lambda c: F.try_to_timestamp(c, F.lit("dd.MM.yyyy"))))
    df = spark.createDataFrame(
        [(1, "2026-01-02"), (2, "03.01.2026"), (3, "nope")], "id long, v string")
    out = df.select("id", F.explode_outer(
        rs.compile_violations(F.col("v"), "/v", "string")).alias("e"))
    got = {r["id"]: (r["e"]["rule_id"] if r["e"] else None) for r in out.collect()}
    assert got == {1: None, 2: None, 3: "TYPE"}
