"""End-to-end: full rule-set pass over the deterministic clips fixture with
known injected violations (FIXTURES.md §1/§4/§6) — the engine's output must
match the pure-Python oracle EXACTLY (triple set equality), and verdicts
must be bit-stable across parallelism levels."""

from pyspark.sql import functions as F

from protovalidate_spark.clips import clips_suite
from protovalidate_spark.fixtures import TINY, clips_df, expected_violations


def test_full_pass_matches_oracle(spark, tiny_clips):
    suite = clips_suite(spark)
    res = suite.run(tiny_clips)
    got = {(r["row_idx"], r["field_path"], r["rule_id"])
           for r in res.violations.collect()}
    assert got == expected_violations(TINY)


def test_verdicts_per_partition(spark, tiny_clips):
    suite = clips_suite(spark)
    res = suite.run(tiny_clips)
    verdicts = {str(r["part_date"]): r for r in res.verdicts.collect()}
    assert len(verdicts) == 16
    assert sum(r["rows_scanned"] for r in verdicts.values()) == TINY.n_rows
    # pass ⇔ zero violations in partition
    viol_parts = {str(r["part_date"]) for r in res.violations
                  .filter(F.col("part_date").isNotNull()).collect()}
    for pd_, r in verdicts.items():
        assert r["pass"] == (pd_ not in viol_parts)
        assert r["pass"] == (r["violations"] == 0)


def test_violation_rows_shape(spark, tiny_clips):
    # violation rows carry (field_path, rule_id, message, actual) — the
    # reference's error fixture shape (validation_error.go:11-27)
    res = clips_suite(spark).run(tiny_clips)
    r = (res.violations.filter(F.col("field_path") == "/codec")
         .filter(F.col("rule_id") == "NOTALLOWED").first())
    assert r["actual"] == "xm"
    assert len(r["actual"]) <= 50
    assert r["message"]


def test_deterministic_across_parallelism(spark):
    # same violations at 2 vs 8 partitions (FIXTURES.md: bit-identical)
    a = clips_df(spark, TINY, partitions=2)
    b = clips_df(spark, TINY, partitions=8)
    sa = clips_suite(spark)
    va = {(r["row_idx"], r["field_path"], r["rule_id"])
          for r in sa.run(a).violations.collect()}
    vb = {(r["row_idx"], r["field_path"], r["rule_id"])
          for r in sa.run(b).violations.collect()}
    assert va == vb


def test_stats_pass(spark, tiny_clips):
    res = clips_suite(spark).run(tiny_clips, with_stats=True)
    st = {r["column"]: r for r in res.stats.collect()}
    assert st["clip_id"]["null_rate"] > 0  # injected NULLs
    assert st["sr_hz"]["min"] == "4000"    # injected out-of-range
