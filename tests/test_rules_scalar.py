"""Per-rule unit tests — the MustApply/MustNotApply pattern from the
reference test harness (/root/reference/pkg/testhelpers/util.go:50-125):
each rule × (pass input, fail input asserting the exact error code)."""

import pytest
from pyspark.sql import functions as F

from protovalidate_spark import (
    Bool, Code, Constant, Duration, Int32, Int64, Float64, String, Time,
)
from protovalidate_spark.errors import CompileError


def codes_for(spark, rs, value, input_type="string"):
    df = spark.createDataFrame([(value,)], f"v {input_type}")
    out = df.select(F.explode(
        rs.compile_violations(F.col("v"), "/v", input_type)).alias("e"))
    return sorted(r["e"]["rule_id"] for r in out.collect())


# ---- string ----------------------------------------------------------------

def test_string_minlen_pass_fail(spark):
    rs = String().min_len(3).max_len(7)
    assert codes_for(spark, rs, "abc") == []
    assert codes_for(spark, rs, "ab") == [Code.MIN_LEN]
    assert codes_for(spark, rs, "abcdefgh") == [Code.MAX_LEN]


def test_string_len_is_bytes(spark):
    # Go len() counts bytes — 'é' is 2 UTF-8 bytes (rule_minlen.go:16-23)
    rs = String().min_len(2)
    assert codes_for(spark, rs, "é") == []
    assert codes_for(spark, rs, "e") == [Code.MIN_LEN]


def test_string_regex(spark):
    rs = String().regex(r"^clip-[0-9]{10}$")
    assert codes_for(spark, rs, "clip-0000000001") == []
    assert codes_for(spark, rs, "clip-1") == [Code.PATTERN]


def test_string_lexicographic_bounds(spark):
    rs = String().min("b").max_exclusive("x")
    assert codes_for(spark, rs, "m") == []
    assert codes_for(spark, rs, "a") == [Code.MIN]
    assert codes_for(spark, rs, "x") == [Code.MAX_EXCLUSIVE]


def test_string_allowed_rejected(spark):
    rs = String().allowed_values("wav", "flac")
    assert codes_for(spark, rs, "wav") == []
    assert codes_for(spark, rs, "xm") == [Code.NOTALLOWED]
    rs2 = String().rejected_values("xm")
    assert codes_for(spark, rs2, "xm") == [Code.DENIED]


def test_string_allowed_values_cumulative(spark):
    # allow-lists merge across calls (string_rule_values.go:99-124)
    rs = String().allowed_values("a").allowed_values("b")
    assert codes_for(spark, rs, "a") == []
    assert codes_for(spark, rs, "b") == []
    assert codes_for(spark, rs, "c") == [Code.NOTALLOWED]


def test_accumulate_all_errors(spark):
    # every failing rule reports; no short-circuit (string.go:188-196)
    rs = String().min_len(6).regex(r"^clip-")
    assert codes_for(spark, rs, "x") == sorted([Code.MIN_LEN, Code.PATTERN])


# ---- nil/required/strict ----------------------------------------------------

def test_null_semantics(spark):
    assert codes_for(spark, String(), None) == [Code.NULL]
    assert codes_for(spark, String().with_required(), None) == [Code.REQUIRED]
    assert codes_for(spark, String().with_nil(), None) == []


def test_strict_type_mismatch_raises(spark):
    with pytest.raises(CompileError):
        codes_for(spark, String().with_strict(), 5, "int")


# ---- coercion ----------------------------------------------------------------

def test_string_to_int_coercion(spark):
    rs = Int64().min(0)
    assert codes_for(spark, rs, "42", "string") == []
    assert codes_for(spark, rs, "4x2", "string") == [Code.TYPE]
    assert codes_for(spark, rs, "-1", "string") == [Code.MIN]


def test_int_width_range(spark):
    from protovalidate_spark import Int8
    assert codes_for(spark, Int8(), 127, "int") == []
    assert codes_for(spark, Int8(), 128, "int") == [Code.RANGE]


def test_float_to_int_whole_number(spark):
    # within 1e-9 of whole else TYPE (number_coerce.go:14,27-58)
    assert codes_for(spark, Int32(), 3.0, "double") == []
    assert codes_for(spark, Int32(), 3.5, "double") == [Code.TYPE]
    assert codes_for(spark, Int32().with_rounding("down"), 3.5, "double") == []


def test_int_to_float32_exactness(spark):
    from protovalidate_spark import Float32
    assert codes_for(spark, Float32(), 2**24, "bigint") == []
    assert codes_for(spark, Float32(), 2**24 + 1, "bigint") == [Code.RANGE]


def test_int_with_base(spark):
    rs = Int32().with_base(16)
    assert codes_for(spark, rs, "ff", "string") == []
    assert codes_for(spark, rs, "fg", "string") == [Code.TYPE]


def test_bool_coercion(spark):
    assert codes_for(spark, Bool(), "true", "string") == []
    assert codes_for(spark, Bool(), "maybe", "string") == [Code.TYPE]
    assert codes_for(spark, Bool(), 1, "int") == []
    assert codes_for(spark, Bool(), 2, "int") == [Code.TYPE]
    assert codes_for(spark, Bool().true(), False, "boolean") == [Code.NOTALLOWED]


# ---- numeric bounds ----------------------------------------------------------

def test_numeric_bounds(spark):
    rs = Int32().min(8000).max(192000)
    assert codes_for(spark, rs, 8000, "int") == []
    assert codes_for(spark, rs, 4000, "int") == [Code.MIN]
    assert codes_for(spark, rs, 200000, "int") == [Code.MAX]
    rs2 = Int32().min_exclusive(0)
    assert codes_for(spark, rs2, 0, "int") == [Code.MIN_EXCLUSIVE]
    rs3 = Float64().max_exclusive(1.0)
    assert codes_for(spark, rs3, 1.0, "double") == [Code.MAX_EXCLUSIVE]


# ---- conflict resolution ------------------------------------------------------

def test_min_last_wins(spark):
    # second WithMin replaces first (string.go:207-242)
    rs = Int32().min(100).min(5)
    assert len(rs.rules) == 1
    assert codes_for(spark, rs, 50, "int") == []


def test_min_replaces_min_exclusive(spark):
    rs = Int32().min_exclusive(10).min(10)
    assert len(rs.rules) == 1
    assert codes_for(spark, rs, 10, "int") == []


def test_constant(spark):
    rs = Constant("wav")
    assert codes_for(spark, rs, "wav") == []
    assert codes_for(spark, rs, "mp3") == [Code.NOTALLOWED]
    assert Constant("wav") is Constant("wav")  # interning (constant.go:29-53)


# ---- temporal -----------------------------------------------------------------

def test_time_bounds(spark):
    import datetime as dt
    rs = Time().min(dt.datetime(2020, 1, 1)).max(dt.datetime(2030, 1, 1))
    assert codes_for(spark, rs, dt.datetime(2025, 6, 1), "timestamp") == []
    assert codes_for(spark, rs, dt.datetime(2031, 1, 1), "timestamp") == [Code.MAX]


def test_time_layouts_first_match(spark):
    rs = Time().with_layouts("yyyy/MM/dd", "dd-MM-yyyy")
    assert codes_for(spark, rs, "2024/05/01", "string") == []
    assert codes_for(spark, rs, "01-05-2024", "string") == []
    assert codes_for(spark, rs, "May 1 2024", "string") == [Code.TYPE]


def test_duration_unit_and_bounds(spark):
    rs = Duration().with_unit("s").min(1).max(10)  # seconds
    assert codes_for(spark, rs, 5, "int") == []      # 5s ⇒ 5000ms
    assert codes_for(spark, rs, 11, "int") == [Code.MAX]


def test_duration_ms_column(spark):
    rs = Duration().min_exclusive(0).max(600_000)
    assert codes_for(spark, rs, 1500, "int") == []
    assert codes_for(spark, rs, 0, "int") == [Code.MIN_EXCLUSIVE]


# ---- any / forbidden ------------------------------------------------------------

def test_any_forbidden(spark):
    from protovalidate_spark import Any
    assert codes_for(spark, Any(), None) == []
    assert codes_for(spark, Any().forbidden(), "x") == [Code.DENIED]


def test_duration_rounding_modes(spark):
    """Each mode pinned against the reference's rounding table
    (rounding.go:10-18 applied to unit remainders, duration.go:245-275):
    1500us = 1.5ms and 2500us = 2.5ms exercise the half-value cases."""
    def ms_value(rs, v):
        df = spark.createDataFrame([(v,)], "v int")
        return df.select(rs.coerced(F.col("v"), "int").alias("o")).first()["o"]

    for mode, at_1500us, at_2500us in [("down", 1, 2), ("up", 2, 3),
                                       ("half_up", 2, 3), ("half_even", 2, 2)]:
        rs = Duration().with_unit("us").with_rounding(mode)
        assert ms_value(rs, 1500) == at_1500us, mode
        assert ms_value(rs, 2500) == at_2500us, mode


def test_duration_rounding_none_requires_whole(spark):
    # RoundingNone (the default): a remainder is a coercion error, never
    # silently rounded (reference rounding.go:13)
    rs = Duration().with_unit("us")
    assert codes_for(spark, rs, 2000, "int") == []
    assert codes_for(spark, rs, 1500, "int") == [Code.TYPE]
    assert codes_for(spark, rs.with_rounding("half_up"), 1500, "int") == []
    with pytest.raises(CompileError):
        rs.with_rounding("sideways")
