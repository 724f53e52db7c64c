"""MapRuleSet — validation over MapType columns (reference Map[K,V](),
object.go:112-128; WithKey/WithDynamicKey/WithUnknown over map keys)."""

from pyspark.sql import functions as F

from protovalidate_spark import Code, Int32, String
from protovalidate_spark.rules import Map, MapOfStrings


def triples(spark, rs, data, map_type="map<string,int>"):
    df = spark.createDataFrame(data, f"i long, m {map_type}")
    out = df.select("i", F.explode_outer(rs.compile_violations(
        F.col("m"), "/m", map_type)).alias("e"))
    return {(r["i"], r["e"]["field_path"], r["e"]["rule_id"])
            for r in out.collect() if r["e"] is not None}


def test_map_fixed_keys(spark):
    rs = (Map().with_unknown()
          .with_key("a", Int32().min(5))
          .with_key("b", Int32().with_required()))
    data = [(0, {"a": 7, "b": 1}),   # pass
            (1, {"a": 2, "b": 1}),   # a MIN
            (2, {"a": 9})]           # b missing -> REQUIRED
    assert triples(spark, rs, data) == {
        (1, "/m/a", Code.MIN), (2, "/m/b", Code.REQUIRED)}


def test_map_missing_optional_key_passes(spark):
    rs = Map().with_unknown().with_key("a", Int32().min(5))
    assert triples(spark, rs, [(0, {"x": 1})]) == set()


def test_map_dynamic_keys(spark):
    rs = (Map().with_unknown()
          .with_dynamic_key(r"^score_.*", Int32().min(0).max(100)))
    data = [(0, {"score_a": 50, "other": -5}),   # other not matched
            (1, {"score_b": 150}),               # MIN? no — MAX... first code is MIN
            (2, {"score_c": -1})]
    got = triples(spark, rs, data)
    assert (1, "/m/score_b", Code.MIN) in got or \
           (1, "/m/score_b", Code.MAX) in got
    assert any(t[0] == 2 and t[1] == "/m/score_c" for t in got)
    assert not any(t[0] == 0 for t in got)


def test_map_unknown_keys_flagged(spark):
    rs = Map().with_key("a", Int32())
    got = triples(spark, rs, [(0, {"a": 1, "zzz": 2})])
    assert got == {(0, "/m/zzz", Code.UNEXPECTED)}


def test_map_unknown_with_dynamic_not_flagged(spark):
    rs = (Map().with_key("a", Int32())
          .with_dynamic_key(r"^x_.*", Int32()))
    got = triples(spark, rs, [(0, {"a": 1, "x_q": 2, "boom": 3})])
    assert got == {(0, "/m/boom", Code.UNEXPECTED)}


def test_map_null_and_string_values(spark):
    rs = (MapOfStrings()
          .with_dynamic_key(r".*", String().min_len(2)))
    data = [(0, {"k": "ab"}), (1, {"k": "a"}), (2, {"k": None})]
    got = triples(spark, rs, data, "map<string,string>")
    assert got == {(1, "/m/k", Code.MIN_LEN), (2, "/m/k", Code.NULL)}


def test_map_null_map_column(spark):
    rs = Map().with_key("a", Int32().with_required())
    got = triples(spark, rs, [(0, None)])
    assert got == {(0, "/m", Code.NULL)}


def test_dynamic_bucket_routes_and_suppresses_unknown(spark):
    """WithDynamicBucket (reference object.go:237-264): matching keys are
    routed to the bucket map and stop being UNEXPECTED; explicit keys are
    never bucketed; non-matching keys still trip UNEXPECTED."""
    from protovalidate_spark import Int64, Map
    df = spark.createDataFrame(
        [(1, {"k": 5, "x_a": 7, "y_z": 9})],
        "id int, m map<string,bigint>")
    rs = Map().with_key("k", Int64()).with_dynamic_bucket("^x_", "xs")
    v = df.select(F.explode(rs.compile_violations(
        F.col("m"), "/m", "map<string,bigint>")).alias("e"))
    got = {(r["e"]["field_path"], r["e"]["rule_id"]) for r in v.collect()}
    assert got == {("/m/y_z", "UNEXPECTED")}
    b = df.select(rs.bucket_output(F.col("m")).alias("b")).first()["b"]
    assert b == {"xs": {"x_a": 7}}


def test_dynamic_bucket_multi_membership_and_absent(spark):
    """A key matching several bucket patterns lands in ALL of them; a
    bucket with no matches does not appear (setter.go SetBucket)."""
    from protovalidate_spark import Map
    df = spark.createDataFrame(
        [(1, {"ab": 1}), (2, {"zz": 2})], "id int, m map<string,bigint>")
    rs = (Map().with_unknown()
          .with_dynamic_bucket("^a", "bucket_a")
          .with_dynamic_bucket("b$", "bucket_b"))
    rows = {r["id"]: r["b"] for r in df.select(
        "id", rs.bucket_output(F.col("m")).alias("b")).collect()}
    assert rows[1] == {"bucket_a": {"ab": 1}, "bucket_b": {"ab": 1}}
    assert rows[2] == {}


def test_conditional_dynamic_bucket(spark):
    """WithConditionalDynamicBucket (object.go:266-279): routed only when
    the condition holds; otherwise the key falls back to unknown."""
    from protovalidate_spark import Int64, Map
    df = spark.createDataFrame(
        [(1, {"k": 99, "y_b": 3}), (2, {"k": 1, "y_b": 4})],
        "id int, m map<string,bigint>")
    rs = (Map().with_key("k", Int64())
          .with_conditional_dynamic_bucket(
              "^y_", lambda m: F.element_at(m, "k") >= 50, "ys"))
    v = df.select("id", F.explode_outer(rs.compile_violations(
        F.col("m"), "/m", "map<string,bigint>")).alias("e"))
    got = {(r["id"], r["e"]["field_path"] if r["e"] else None)
           for r in v.collect()}
    assert got == {(1, None), (2, "/m/y_b")}
    rows = {r["id"]: r["b"] for r in df.select(
        "id", rs.bucket_output(F.col("m")).alias("b")).collect()}
    assert rows[1] == {"ys": {"y_b": 3}}
    assert rows[2] == {}
