"""Collection-API parity (reference pkg/errors/collection.go:7-141 +
dict.go:115-216): For(path)/ForPathAs as DataFrame filters, and the
Internal/Permission/Validation precedence as a single aggregation."""

import pytest

from protovalidate_spark import (
    Code, collection_status, error_type, violations_for, with_error_type,
)


@pytest.fixture(scope="module")
def viols(spark):
    rows = [
        ("r1", "/email", Code.PATTERN, "bad format", "x@"),
        ("r1", "/email", Code.MAX_LEN, "too long", "x@"),
        ("r1", "/tags/0", Code.DENIED, "forbidden", "spam"),
        ("r2", "/age", Code.MIN, "too small", "-1"),
        ("r3", "/sys", Code.INTERNAL, "boom", ""),
        ("r3", "/tags/2", Code.NOTALLOWED, "not allowed", "z"),
    ]
    return spark.createDataFrame(
        rows, "row_id string, field_path string, rule_id string, "
              "message string, actual string")


def test_error_type_classification():
    """dict.go defaultEntries: UNKNOWN/INTERNAL/TIMEOUT/CANCELED →
    internal; Forbidden(DENIED)/NotAllowed → permission; the rest →
    validation; unknown codes fall back to internal (Entry default)."""
    assert error_type(Code.INTERNAL) == "internal"
    assert error_type(Code.TIMEOUT) == "internal"
    assert error_type(Code.DENIED) == "permission"
    assert error_type(Code.NOTALLOWED) == "permission"
    assert error_type(Code.MIN) == "validation"
    assert error_type(Code.PATTERN) == "validation"
    assert error_type(Code.UNIQUE) == "validation"
    assert error_type("NO_SUCH_CODE") == "internal"


def test_violations_for_default_path(spark, viols):
    got = violations_for(viols, "/email").collect()
    assert {r["rule_id"] for r in got} == {Code.PATTERN, Code.MAX_LEN}
    assert violations_for(viols, "/nope").count() == 0


def test_violations_for_other_serializers(spark, viols):
    """ForPathAs: the query path may arrive in dot / JSONPath / JSON
    Pointer form; it normalizes to the stored default form."""
    assert {r["actual"] for r in
            violations_for(viols, "tags[0]", "dot").collect()} == {"spam"}
    assert {r["actual"] for r in
            violations_for(viols, "$.tags[2]", "jsonpath").collect()} == {"z"}
    assert violations_for(viols, "/email", "json_pointer").count() == 2


def test_with_error_type_column(spark, viols):
    got = {(r["rule_id"], r["error_type"])
           for r in with_error_type(viols).collect()}
    assert (Code.DENIED, "permission") in got
    assert (Code.INTERNAL, "internal") in got
    assert (Code.MIN, "validation") in got


def test_collection_status_precedence(spark, viols):
    """collection.go:104-141: internal wins over permission wins over
    validation; validation requires non-empty."""
    per_row = {r["row_id"]: (r["internal"], r["permission"], r["validation"])
               for r in collection_status(viols, by="row_id").collect()}
    assert per_row["r1"] == (False, True, False)   # has DENIED, no internal
    assert per_row["r2"] == (False, False, True)   # pure validation
    assert per_row["r3"] == (True, False, False)   # INTERNAL beats NOTALLOWED
    whole = collection_status(viols).collect()[0]
    assert (whole["internal"], whole["permission"], whole["validation"]) == \
        (True, False, False)
    assert whole["n_errors"] == 6


def test_collection_status_empty_collection_is_all_false(spark):
    """Empty collection: internal/permission/validation are False (not
    NULL) — F.max over zero rows is NULL without the coalesce guard
    (reference collection.go: an empty collection has no status)."""
    from protovalidate_spark.errors import collection_status
    empty = spark.createDataFrame([], "rule_id string")
    r = collection_status(empty).collect()[0]
    assert r["internal"] is False
    assert r["permission"] is False
    assert r["validation"] is False
    assert r["n_errors"] == 0


def test_violations_for_as_alias(spark, viols):
    """ForPathAs (collection.go:85-102): serializer-required variant is
    the same pushable-equality filter."""
    from protovalidate_spark import violations_for_as
    assert {r["actual"] for r in
            violations_for_as(viols, "tags[0]", "dot").collect()} == {"spam"}
    assert violations_for_as(viols, "/email", "json_pointer").count() == 2


def test_violations_for_as_typed_actual(spark, viols):
    """ForPathAs typed accessor: ``dtype`` appends ``actual_typed`` =
    try_cast(actual, dtype) — the violating value back in its original
    type. A stored string that does not parse as dtype yields NULL
    (Go's failed type assertion), never an ANSI cast error."""
    from protovalidate_spark import violations_for_as
    got = violations_for_as(viols, "/age", "json_pointer",
                            dtype="double").collect()
    assert len(got) == 1
    assert got[0]["actual_typed"] == -1.0
    assert got[0]["actual"] == "-1"
    # non-numeric actuals ('spam') must cast to NULL, not raise
    spam = violations_for_as(viols, "tags[0]", "dot",
                             dtype="double").collect()
    assert spam[0]["actual_typed"] is None
    # no dtype -> no extra column (backwards compatible)
    assert "actual_typed" not in violations_for_as(
        viols, "/age", "json_pointer").columns


def test_cap_exemplars_exact_global_topk(spark):
    """Two-phase cap == exact global top-k per rule, independent of the
    input partitioning (phase 1 keys on spark_partition_id, so the
    partitioning changes intermediate volume, never the result)."""
    from protovalidate_spark.errors import cap_exemplars, violation_summary
    from pyspark.sql import functions as F
    # hot rule: 1000 rows of one (path, rule); cold rule: 3 rows
    hot = spark.range(1000).select(
        F.col("id").alias("row_idx"), F.lit("/a").alias("field_path"),
        F.lit("MIN").alias("rule_id"))
    cold = spark.range(3).select(
        (F.col("id") + 5000).alias("row_idx"),
        F.lit("/b").alias("field_path"), F.lit("REQUIRED").alias("rule_id"))
    df = hot.unionByName(cold)
    for nparts in (1, 7, 32):
        capped = cap_exemplars(df.repartition(nparts), ["row_idx"], 5)
        rows = {(r["field_path"], r["rule_id"], r["row_idx"])
                for r in capped.collect()}
        expect = {("/a", "MIN", i) for i in range(5)} | \
                 {("/b", "REQUIRED", i) for i in (5000, 5001, 5002)}
        assert rows == expect, f"nparts={nparts}"
    # counts come from the FULL stream
    counts = {(r["field_path"], r["rule_id"]): r["violations"]
              for r in violation_summary(df).collect()}
    assert counts == {("/a", "MIN"): 1000, ("/b", "REQUIRED"): 3}


def test_cap_exemplars_null_order_keys_last(spark):
    """Dataset-level violations carry NULL row keys — they sort last, so
    row-keyed exemplars win the cap slots."""
    from protovalidate_spark.errors import cap_exemplars
    df = spark.createDataFrame(
        [(None, "/a", "DRIFT"), (1, "/a", "DRIFT"), (2, "/a", "DRIFT")],
        "row_idx long, field_path string, rule_id string")
    got = sorted((r["row_idx"] or -1) for r in
                 cap_exemplars(df, ["row_idx"], 2).collect())
    assert got == [1, 2]


def test_suite_cap_keeps_verdicts_exact(spark):
    """max_exemplars_per_rule bounds RunResult.violations but verdict
    counts still reflect the full stream."""
    from protovalidate_spark.clips import clips_suite
    from protovalidate_spark.fixtures import TINY, clips_df
    df = clips_df(spark, TINY)
    full = clips_suite(spark).run(df)
    suite = clips_suite(spark)
    suite.max_exemplars_per_rule = 1
    capped = suite.run(df)
    # verdict totals identical
    tot = lambda res: sum(r["violations"] for r in res.verdicts.collect())
    assert tot(capped) == tot(full)
    # capped rows: at most 1 per rule, and a subset of the full rows
    per_rule = (capped.violations.groupBy("field_path", "rule_id")
                .count().collect())
    assert per_rule and all(r["count"] == 1 for r in per_rule)
    key = lambda r: (r["row_idx"], r["field_path"], r["rule_id"])
    assert {key(r) for r in capped.violations.collect()} <= \
           {key(r) for r in full.violations.collect()}
