"""Property-based tests (hypothesis): for random inputs, the compiled
Catalyst plan must emit exactly the violation codes a pure-Python
evaluation of the reference semantics produces (SURVEY.md §1.2, §3A:
null/required/nil → coercion lossless-check → accumulate-all rules)."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from protovalidate_spark import Code, Int32, Object, String

I32 = (-(2**31), 2**31 - 1)


def py_int32_codes(v, lo, hi, allowed):
    """Pure-Python oracle for Int32().min(lo).max(hi).allowed_values(...)
    over a string-typed input column (string→int coercion path)."""
    if v is None:
        return [Code.NULL]
    try:
        n = int(v)
    except ValueError:
        return [Code.TYPE]
    if not (I32[0] <= n <= I32[1]):
        return [Code.TYPE]
    out = []
    if n < lo:
        out.append(Code.MIN)
    if n > hi:
        out.append(Code.MAX)
    if allowed and n not in allowed:
        out.append(Code.NOTALLOWED)
    return sorted(out)


def py_string_codes(v, min_len, max_len, pattern):
    if v is None:
        return [Code.NULL]
    out = []
    b = len(v.encode("utf-8"))  # Go len() = bytes
    if b < min_len:
        out.append(Code.MIN_LEN)
    if b > max_len:
        out.append(Code.MAX_LEN)
    if not re.search(pattern, v):  # Java rlike = unanchored find
        out.append(Code.PATTERN)
    return sorted(out)


int_strings = st.one_of(
    st.none(),
    st.integers(-(2**40), 2**40).map(str),
    st.text(alphabet="0123456789-x ", max_size=8),
)


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(int_strings, min_size=1, max_size=60),
       lo=st.integers(-100, 0), hi=st.integers(1, 100),
       allowed=st.one_of(st.just(()), st.lists(
           st.integers(-50, 50), min_size=1, max_size=5).map(tuple)))
def test_int32_coercion_property(spark, vals, lo, hi, allowed):
    rs = Int32().min(lo).max(hi)
    if allowed:
        rs = rs.allowed_values(*allowed)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v string")
    got_rows = df.select("i", rs.compile_violations(
        F.col("v"), "/v", "string").alias("e")).collect()
    got = {r["i"]: sorted(x["rule_id"] for x in r["e"]) for r in got_rows}
    want = {i: py_int32_codes(v, lo, hi, allowed) for i, v in enumerate(vals)}
    assert got == want


texts = st.one_of(st.none(), st.text(max_size=12))


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(texts, min_size=1, max_size=60),
       min_len=st.integers(0, 4), max_len=st.integers(5, 10))
def test_string_rules_property(spark, vals, min_len, max_len):
    pattern = "[a-z]"
    rs = String().min_len(min_len).max_len(max_len).regex(pattern)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v string")
    got_rows = df.select("i", rs.compile_violations(
        F.col("v"), "/v", "string").alias("e")).collect()
    got = {r["i"]: sorted(x["rule_id"] for x in r["e"]) for r in got_rows}
    want = {i: py_string_codes(v, min_len, max_len, pattern)
            for i, v in enumerate(vals)}
    assert got == want


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 20)),
              st.one_of(st.none(), st.integers(0, 20))),
    min_size=1, max_size=40))
def test_object_required_nil_property(spark, rows):
    """required vs with_nil vs default-NULL semantics across two columns."""
    rs = (Object().with_unknown()
          .with_key("a", Int32().with_required().min(5))
          .with_key("b", Int32().with_nil().max(10)))
    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(rows)],
                               "i long, a int, b int")
    got_rows = df.select("i", rs.compile_violations_column(df).alias("e")).collect()
    got = {r["i"]: sorted((x["field_path"], x["rule_id"]) for x in r["e"])
           for r in got_rows}
    want = {}
    for i, (a, b) in enumerate(rows):
        w = []
        if a is None:
            w.append(("/a", Code.REQUIRED))
        elif a < 5:
            w.append(("/a", Code.MIN))
        if b is not None and b > 10:
            w.append(("/b", Code.MAX))
        want[i] = sorted(w)
    assert got == want
