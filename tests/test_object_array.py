"""Object (row) + array rule set tests — reference object.go / slice.go
semantics: conditional keys, unknown keys, whole-object rules, per-item
array validation with index paths, dependency-cycle build panic."""

import pytest
from pyspark.sql import functions as F

from protovalidate_spark import Code, Int32, Object, ObjectRule, Slice, String
from protovalidate_spark.errors import CompileError


def viols(spark, rs, df):
    return {(r["field_path"], r["rule_id"])
            for r in rs.violations(df).collect()}


def test_object_multiple_keys(spark):
    df = spark.createDataFrame([("ab", 5)], "name string, n int")
    rs = (Object().with_key("name", String().min_len(3))
                  .with_key("n", Int32().min(10)))
    assert viols(spark, rs, df) == {("/name", Code.MIN_LEN), ("/n", Code.MIN)}


def test_unknown_key_unexpected(spark):
    # unknown keys ⇒ UNEXPECTED unless WithUnknown (object.go:647-656)
    df = spark.createDataFrame([("a", 1)], "name string, extra int")
    rs = Object().with_key("name", String())
    assert viols(spark, rs, df) == {("/extra", Code.UNEXPECTED)}
    assert viols(spark, rs.with_unknown(), df) == set()


def test_missing_required_key(spark):
    # missing key + required ⇒ REQUIRED (object.go:493-500)
    df = spark.createDataFrame([("a",)], "name string")
    rs = (Object().with_key("name", String())
                  .with_key("gone", String().with_required()))
    assert viols(spark, rs, df) == {("/gone", Code.REQUIRED)}


def test_conditional_key(spark):
    # rules run only when the condition over the row passes (object.go:306-359)
    df = spark.createDataFrame(
        [("F", None), ("O", None)], "status string, closed_at string")
    rs = (Object().with_unknown()
          .with_key("status", String().allowed_values("F", "O"))
          .with_conditional_key(
              "closed_at", lambda get: get("status") == "F",
              String().with_required(), deps=("status",)))
    got = {(r["status"], r["field_path"], r["rule_id"])
           for r in rs.violations(df, row_key_cols=["status"]).collect()}
    assert got == {("F", "/closed_at", Code.REQUIRED)}


def test_conditional_cycle_raises(spark):
    with pytest.raises(CompileError):
        (Object()
         .with_conditional_key("a", lambda g: g("b").isNotNull(),
                               String(), deps=("b",))
         .with_conditional_key("b", lambda g: g("a").isNotNull(),
                               String(), deps=("a",)))


def test_whole_object_rule(spark):
    # cross-column rule runs after key rules (object.go:662-693)
    df = spark.createDataFrame([(1, 10), (20, 10)], "lo int, hi int")
    rs = (Object().with_unknown()
          .with_rule(ObjectRule(
              Code.RANGE, lambda get: get("lo") <= get("hi"),
              "lo must be <= hi", field_path="/lo")))
    got = {(r["lo"], r["field_path"], r["rule_id"])
           for r in rs.violations(df, row_key_cols=["lo"]).collect()}
    assert got == {(20, "/lo", Code.RANGE)}


def test_dynamic_key(spark):
    # pattern-matched keys (object.go:211-235; fixed schema ⇒ column names)
    df = spark.createDataFrame([("a", "b", 1)],
                               "tag_x string, tag_y string, n int")
    rs = (Object().with_unknown()
          .with_dynamic_key(r"tag_.*", String().min_len(2)))
    got = viols(spark, rs, df)
    assert got == {("/tag_x", Code.MIN_LEN), ("/tag_y", Code.MIN_LEN)}


def test_with_json(spark):
    # WithJson: parse JSON string first (object.go:818-846)
    df = spark.createDataFrame(
        [('{"name":"ab","n":5}',), ('{"name":"abcd","n":50}',)], "payload string")
    rs = (Object()
          .with_key("name", String().min_len(3))
          .with_key("n", Int32().min(10))
          .with_json("payload"))
    got = {(r["payload"], r["field_path"], r["rule_id"])
           for r in rs.violations(df, row_key_cols=["payload"]).collect()}
    assert got == {('{"name":"ab","n":5}', "/name", Code.MIN_LEN),
                   ('{"name":"ab","n":5}', "/n", Code.MIN)}


# ---- arrays ------------------------------------------------------------------

def test_array_len_rules(spark):
    df = spark.createDataFrame([([1, 2],), ([],)], "xs array<int>")
    rs = Object().with_unknown().with_key("xs", Slice().min_len(1).max_len(5))
    got = {(tuple(r["xs"]), r["field_path"], r["rule_id"])
           for r in rs.violations(df, row_key_cols=["xs"]).collect()}
    assert got == {((), "/xs", Code.MIN_LEN)}


def test_array_item_rules_with_index_paths(spark):
    # per-item violations carry /field/<index> (slice.go:311-327)
    df = spark.createDataFrame([(["ok", "x", "alsook", None],)], "xs array<string>")
    rs = (Object().with_unknown()
          .with_key("xs", Slice().with_item_rule_set(String().min_len(2))))
    got = {(r["field_path"], r["rule_id"])
           for r in rs.violations(df).collect()}
    assert got == {("/xs/1", Code.MIN_LEN), ("/xs/3", Code.NULL)}


def test_array_maxlen_gates_item_checks(spark):
    # proactive early-stop past max_len (slice.go:300-309)
    df = spark.createDataFrame([(["x"] * 10,)], "xs array<string>")
    rs = (Object().with_unknown()
          .with_key("xs", Slice().max_len(3)
                    .with_item_rule_set(String().min_len(2))))
    got = {(r["field_path"], r["rule_id"]) for r in rs.violations(df).collect()}
    assert got == {("/xs", Code.MAX_LEN)}  # item checks skipped


# ---- error customization -------------------------------------------------------

def test_error_message_and_code_override(spark):
    df = spark.createDataFrame([("x",)], "v string")
    rs = (Object().with_unknown()
          .with_key("v", String().min_len(5)
                    .with_error_code("MY_CODE")
                    .with_error_message("too short")))
    r = rs.violations(df).collect()[0]
    assert r["rule_id"] == "MY_CODE" and r["message"] == "too short"


def test_path_serializers():
    from protovalidate_spark.errors import (
        path_default, path_dot, path_json_pointer, path_jsonpath)
    segs = ["a", "b", 0]
    assert path_default(segs) == "/a/b/0"
    assert path_dot(segs) == "a.b[0]"
    assert path_json_pointer(["a/b", "c~d"]) == "/a~1b/c~0d"
    assert path_jsonpath(segs) == "$.a.b[0]"


# -- struct-side dynamic buckets (object.go:237-279 + setter.go:30-52) -----

def test_object_dynamic_bucket_routes_and_suppresses_unknown(spark):
    """Undeclared columns matching the bucket pattern route to the bucket
    map and stop being UNEXPECTED; explicit keys are never bucketed;
    non-matching unknowns still trip UNEXPECTED; apply() consumes routed
    columns from the top level (setter.go:30-52)."""
    df = spark.createDataFrame(
        [("a", 7, 9)], "name string, x_a int, y_z int")
    rs = Object().with_key("name", String()).with_dynamic_bucket("^x_", "xs")
    assert viols(spark, rs, df) == {("/y_z", Code.UNEXPECTED)}
    b = df.select(rs.bucket_output(df).alias("b")).first()["b"]
    assert b == {"xs": {"x_a": "7"}}
    out = rs.with_unknown().apply(df)
    assert "x_a" not in out.columns and "y_z" in out.columns
    assert out.first()["xs"] == {"x_a": "7"}


def test_object_dynamic_bucket_multi_membership_and_absent(spark):
    """A column matching several bucket patterns lands in ALL of them; a
    bucket with no matches does not appear (setter.go SetBucket)."""
    df = spark.createDataFrame([(1, 5)], "id int, ab int")
    rs = (Object().with_unknown()
          .with_dynamic_bucket("^a", "bucket_a")
          .with_dynamic_bucket("b$", "bucket_b")
          .with_dynamic_bucket("^zz", "bucket_zz"))
    b = df.select(rs.bucket_output(df).alias("b")).first()["b"]
    assert b == {"bucket_a": {"ab": "5"}, "bucket_b": {"ab": "5"}}
    out = rs.apply(df).first()
    assert out["bucket_a"] == {"ab": "5"}
    assert out["bucket_zz"] is None  # nothing routed


def test_object_conditional_dynamic_bucket(spark):
    """Routed only on rows where the condition holds; on other rows the
    column falls back to UNEXPECTED (per-row analog of object.go:266-279
    — the column itself cannot leave a fixed schema)."""
    df = spark.createDataFrame(
        [(99, 3), (1, 4)], "k int, y_b int")
    rs = (Object().with_key("k", Int32())
          .with_conditional_dynamic_bucket(
              "^y_", lambda get: get("k") >= 50, "ys"))
    v = {(r["k"], r["field_path"], r["rule_id"])
         for r in rs.violations(df, row_key_cols=("k",)).collect()}
    assert v == {(1, "/y_b", Code.UNEXPECTED)}
    rows = {r["k"]: r["b"] for r in df.select(
        "k", rs.bucket_output(df).alias("b")).collect()}
    assert rows[99] == {"ys": {"y_b": "3"}}
    assert rows[1] == {}
    # conditional buckets keep the column at top level in apply()
    out = rs.with_unknown().apply(df)
    assert "y_b" in out.columns
