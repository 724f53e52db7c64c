"""Deterministic hash splits + sampling: partition-independence,
append-stability, weight accuracy, SQL-oracle parity."""

import hashlib

import pytest
from pyspark.sql import functions as F

from protovalidate_spark.pipeline.sampling import (
    _BUCKETS, sample_fraction, split_sql, stratified_sample, with_split,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _py_bucket(ident: str, salt: str = "") -> int:
    return int(hashlib.md5((ident + salt).encode()).hexdigest()[:15],
               16) % _BUCKETS


def test_split_matches_python_md5(spark):
    df = spark.range(500).select(F.concat(F.lit("id"), "id").alias("k"))
    got = {r["k"]: r["split"]
           for r in with_split(df, "k", WEIGHTS).collect()}
    for k, label in got.items():
        b = _py_bucket(k)
        expect = ("train" if b < 800000 else
                  "val" if b < 900000 else "test")
        assert label == expect, k


def test_split_weights_approximately_hold(spark):
    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    counts = dict(with_split(df, "k", WEIGHTS)
                  .groupBy("split").count().collect())
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_split_partition_independent(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    a = set(map(tuple, with_split(df.repartition(1), "k", WEIGHTS)
                .select("k", "split").collect()))
    b = set(map(tuple, with_split(df.repartition(16), "k", WEIGHTS)
                .select("k", "split").collect()))
    assert a == b


def test_split_append_stable(spark):
    """Rows keep their split when the table grows — the property
    df.randomSplit/sample cannot give."""
    small = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    big = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    a = dict(with_split(small, "k", WEIGHTS).select("k", "split").collect())
    b = dict(with_split(big, "k", WEIGHTS).select("k", "split").collect())
    assert all(b[k] == v for k, v in a.items())


def test_split_salt_gives_independent_assignment(spark):
    df = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    a = dict(with_split(df, "k", WEIGHTS).select("k", "split").collect())
    b = dict(with_split(df, "k", WEIGHTS, salt="v2")
             .select("k", "split").collect())
    changed = sum(1 for k in a if a[k] != b[k])
    # an independent re-split moves ~1-2*0.8*0.2+... ~ 34% of rows
    assert changed > 1000


def test_split_weights_must_sum_to_one():
    with pytest.raises(ValueError):
        split_sql("k", {"train": 0.5, "test": 0.4})


def test_split_sql_oracle_parity(spark):
    """The committed SQL form computes the SAME labels in DuckDB."""
    import duckdb
    df = spark.range(300).select(F.concat(F.lit("c"), "id").alias("k"))
    spark_rows = sorted(map(tuple, with_split(df, "k", WEIGHTS, salt="s1")
                            .select("k", "split").collect()))
    duck_rows = sorted(duckdb.sql(
        "SELECT k, " + split_sql("k", WEIGHTS, salt="s1") + " AS split "
        "FROM (SELECT 'c' || CAST(range AS VARCHAR) AS k FROM range(300))"
    ).fetchall())
    assert spark_rows == duck_rows


def test_sample_fraction_deterministic_and_subset(spark):
    df = spark.range(10000).select(F.col("id").cast("string").alias("k"))
    s10 = {r["k"] for r in sample_fraction(df, "k", 0.10).collect()}
    s20 = {r["k"] for r in sample_fraction(df, "k", 0.20).collect()}
    assert abs(len(s10) / 10000 - 0.10) < 0.01
    # growing the fraction only ADDS rows (nested samples) — the
    # hash-threshold property that lets a pipeline scale a sample up
    # without invalidating work done on the smaller one
    assert s10 <= s20
    again = {r["k"] for r in
             sample_fraction(df.repartition(13), "k", 0.10).collect()}
    assert again == s10


def test_stratified_sample(spark):
    df = spark.range(12000).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") % 100 < 90, "wav").otherwise("flac").alias("codec"))
    out = stratified_sample(df, "k", "codec",
                            {"wav": 0.1, "flac": 1.0}).groupBy("codec") \
        .count().collect()
    counts = {r["codec"]: r["count"] for r in out}
    assert counts["flac"] == 1200          # rare stratum kept whole
    assert abs(counts["wav"] / 10800 - 0.1) < 0.02
    # unlisted strata default to 0
    out2 = stratified_sample(df, "k", "codec", {"flac": 1.0})
    assert out2.filter(F.col("codec") == "wav").count() == 0


def test_split_is_map_only(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    plan = with_split(df, "k", WEIGHTS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_null_ids_get_null_split_and_are_dropped_from_samples(spark):
    """NULL ids must never be concentrated into one split label or
    silently kept: with_split gives them a NULL label (Spark AND the
    SQL oracle form), samplers always drop them."""
    import duckdb
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "k string")
    got = {r["k"]: r["split"]
           for r in with_split(df, "k", WEIGHTS).collect()}
    assert got[None] is None and got["a"] is not None
    duck = dict(duckdb.sql(
        "SELECT k, " + split_sql("k", WEIGHTS) + " FROM (VALUES ('a'), "
        "(NULL), ('b')) t(k)").fetchall())
    assert duck[None] is None and duck["a"] == got["a"]
    assert sample_fraction(df, "k", 1.0).count() == 2
    df2 = spark.createDataFrame([("a", "x"), (None, "x")], "k string, s string")
    assert stratified_sample(df2, "k", "s", {}, default_fraction=1.0) \
        .count() == 1
