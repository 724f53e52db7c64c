"""Rule-set serde (rules/serde.py): fluent DSL ⇄ JSON round-trips are
behaviorally identical (compiled violations compared row-for-row), and
lambda-bearing constructs refuse to serialize instead of silently
dropping constraints."""

import datetime as dt
import json

import pytest

from protovalidate_spark import (
    Binary, Constant, Duration, Float64, Int16, Object, SerdeError,
    Slice, String, Time, load_ruleset, ruleset_from_dict,
    ruleset_to_dict, save_ruleset,
)


def roundtrip(rs):
    doc = ruleset_to_dict(rs)
    json.dumps(doc)          # must be pure-JSON
    return ruleset_from_dict(doc)


def assert_same_violations(spark, rs, rs2, df, keys=("id",)):
    a = sorted(map(tuple, rs.violations(df, row_key_cols=list(keys))
                   .collect()))
    b = sorted(map(tuple, rs2.violations(df, row_key_cols=list(keys))
                   .collect()))
    assert a == b and a  # non-degenerate: at least one violation row


def test_scalar_object_roundtrip(spark):
    rs = (Object().with_unknown()
          .with_key("name", String().with_required().min_len(3)
                    .max_len(10).regex("^[a-z]+$")
                    .rejected_values("forbidden"))
          .with_key("qty", Int16().with_required().min(1).max(100))
          .with_key("price", Float64().with_nil().min_exclusive(0.0))
          .with_key("flag", String().allowed_values("A", "B")))
    rs2 = roundtrip(rs)
    df = spark.createDataFrame(
        [(1, "ok", 5, 2.5, "A"),
         (2, "x", 200, 0.0, "C"),
         (3, None, None, None, "UPPER"),
         (4, "forbidden", 1, 1.0, "B")],
        "id int, name string, qty int, price double, flag string")
    assert_same_violations(spark, rs, rs2, df)


def test_typed_fields_roundtrip(spark):
    rs = (Object()
          .with_key("ts", Time().with_layouts("yyyy-MM-dd")
                    .min(dt.datetime(2024, 1, 1))
                    .max(dt.datetime(2024, 12, 31)))
          .with_key("dur", Duration().with_unit("s").min(10).max(600))
          .with_key("payload", Binary().min_len(4).magic(b"RIFF")))
    rs2 = roundtrip(rs)
    df = spark.createDataFrame(
        [(1, "2024-06-01", 60, bytearray(b"RIFFxxxx")),
         (2, "2023-01-01", 5, bytearray(b"JPEG")),
         (3, "2025-06-01", 1000, bytearray(b"ab"))],
        "id int, ts string, dur int, payload binary")
    assert_same_violations(spark, rs, rs2, df)


def test_width_base_fields_survive():
    rs = Int16().with_base(16).with_rounding("half_even")
    doc = ruleset_to_dict(rs)
    assert doc["width"] == "int16" and doc["base"] == 16
    rs2 = ruleset_from_dict(doc)
    assert rs2.width == "int16" and rs2.base == 16 \
        and rs2.rounding == "half_even"


def test_min_len_chars_disambiguated(spark):
    rs = Object().with_key("s", String().min_len_chars(3))
    rs2 = roundtrip(rs)
    # 2-char multibyte string: 6 octets (passes octet min_len 3) but
    # 2 chars — only the CHARS form flags it, so a mis-roundtrip to
    # the octet form would produce zero violations
    df = spark.createDataFrame([(1, "éé")], "id int, s string")
    assert_same_violations(spark, rs, rs2, df)


def test_constant_and_slice_roundtrip(spark):
    rs = (Object()
          .with_key("version", Constant(3))
          .with_key("tags", Slice().min_len(1).with_item_rule_set(
              String().min_len(2))))
    rs2 = roundtrip(rs)
    df = spark.createDataFrame(
        [(1, 3, ["ok", "x"]), (2, 4, [])],
        "id int, version int, tags array<string>")
    assert_same_violations(spark, rs, rs2, df)


def test_dynamic_key_roundtrip(spark):
    rs = (Object().with_unknown()
          .with_dynamic_key(r"m_.*", Float64().min(0.0)))
    rs2 = roundtrip(rs)
    df = spark.createDataFrame(
        [(1, -1.0, 2.0)], "id int, m_a double, m_b double")
    assert_same_violations(spark, rs, rs2, df)


def test_save_load_file(spark, tmp_path):
    rs = Object().with_key("n", Int16().min(0))
    p = str(tmp_path / "rules.json")
    save_ruleset(rs, p)
    rs2 = load_ruleset(p)
    df = spark.createDataFrame([(1, -5)], "id int, n int")
    assert_same_violations(spark, rs, rs2, df)


def test_suggestions_compile_and_roundtrip(spark):
    """The suggest → build_ruleset → serde → apply loop holds."""
    from protovalidate_spark.dataset import build_ruleset, suggest_rules
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(20)],
        "id bigint, flag string")
    obj, _ = build_ruleset(suggest_rules(df, exact_distinct=True),
                           dict(df.dtypes))
    obj2 = roundtrip(obj)
    bad = spark.createDataFrame([(99, "C")], "id bigint, flag string")
    got = {r["rule_id"] for r in
           obj2.violations(bad, row_key_cols=["id"]).collect()}
    assert "MAX" in got and "NOTALLOWED" in got


def test_lambda_rules_refuse():
    from pyspark.sql import functions as F
    rs = Object().with_key(
        "x", String().with_rule_func(lambda c: c != F.lit("no"),
                                     rule_id="CUSTOM", message="custom"))
    with pytest.raises(SerdeError):
        ruleset_to_dict(rs)


def test_conditional_key_refuses():
    rs = Object().with_conditional_key(
        "x", lambda cols: cols["y"].isNotNull(), String().min_len(1),
        deps=("y",))
    with pytest.raises(SerdeError):
        ruleset_to_dict(rs)


def test_net_family_refuses():
    from protovalidate_spark import Email
    with pytest.raises(SerdeError):
        ruleset_to_dict(Email())