"""Information-theoretic and dependence column metrics with bound
gates (Shannon entropy, Pearson correlation, mutual information) — the
Deequ-style dataset metrics the stats family doesn't cover.

Where ``column_stats`` judges each column's VALUES (nulls, range,
cardinality) and the drift family judges a column against ITS OWN
history, these judge a column's SHAPE and RELATIONSHIPS in one
snapshot: entropy catches a categorical collapsing to one value (a
producer pinning a field) or exploding into noise; a correlation bound
pins a relationship two numeric columns must keep (price grows with
quantity); mutual information catches categorical pairs that silently
decouple (or couple — a leak) without either marginal moving.

Scale design (10^12 rows):
- Entropy: ONE map-side-combined ``groupBy(col, value).count`` per
  stacked column (hot values collapse to a row per partition before
  the shuffle), a per-column re-agg over distinct-value rows, total
  row count via a 1-row broadcast. Shuffle bytes are O(distinct
  values), never O(rows).
- Correlation: guarded co-moments (covar_samp / stddevs) inside ONE
  single-row aggregate scan — map-side partials, no shuffle beyond
  the 1-row exchange.
- Mutual information: ONE ``groupBy(x, y).count`` shuffle; marginals
  are derived FROM the tiny joint frame (re-agg of distinct pairs,
  not a second table scan) and joined back within it.

All three emit single-row (or row-per-column) metric frames with the
decisive float ROUNDed to 6 decimals — integer-count divisions keep
the arithmetic bit-identical across engines, and the round absorbs
sum-order/libm ulps (the psi/ks oracle convention).

Reference analog: value-at-a-time rules only (pkg/rules); dataset
metrics reuse the reference error model (violation row shape,
errors/validation_error.go:11-40) like the rest of SURVEY §2.9.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import Code


def column_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Shannon entropy (nats) of each listed column's value
    distribution: ``(column, n, n_distinct, entropy)``, one row per
    column, NULLs counted as a real category (a producer pinning a
    field to NULL is exactly the collapse this catches). An empty
    table produces no rows (there is no distribution to score).

    All columns ride ONE stacked pass: values are cast to string and
    melted to (column, value) rows map-side, counted with map-side
    partials, re-aggregated per column. ``-sum(c/n * ln(c/n))`` over
    integer counts — exact operands, 6-decimal round on the result."""
    pairs = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    melted = df.select(F.explode(F.create_map(*pairs)).alias("column", "v"))
    counts = melted.groupBy("column", "v").agg(F.count("*").alias("c"))
    per_col = (counts.groupBy("column")
               .agg(F.sum("c").alias("n"),
                    F.count("*").alias("n_distinct"),
                    F.sum(F.col("c") * F.log("c")).alias("sum_clnc")))
    # H = ln(n) - sum(c*ln(c))/n  (algebraically -sum(p ln p); this
    # form needs no second pass for n and keeps every term's operands
    # integer-derived)
    return per_col.select(
        "column", F.col("n").cast("bigint").alias("n"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.round(F.log("n") - F.col("sum_clnc") / F.col("n"), 6)
         .alias("entropy"))


def entropy_violations(df: DataFrame, cols: Sequence[str],
                       min_entropy: Optional[float] = None,
                       max_entropy: Optional[float] = None) -> DataFrame:
    """Columns whose entropy leaves [min_entropy, max_entropy], as
    violation rows — MIN flags a collapsing categorical (one value
    dominating), MAX an exploding one (key-like noise in a field that
    should be low-cardinality)."""
    e = column_entropy(df, cols)
    checks = []
    if min_entropy is not None:
        checks.append(
            e.filter(F.col("entropy") < F.lit(float(min_entropy)))
             .select(F.concat(F.lit("/"), "column").alias("field_path"),
                     F.lit(Code.MIN).alias("rule_id"),
                     F.lit(f"entropy below minimum {min_entropy} nats "
                           "(collapsing categorical)").alias("message"),
                     F.col("entropy").cast("string").alias("actual")))
    if max_entropy is not None:
        checks.append(
            e.filter(F.col("entropy") > F.lit(float(max_entropy)))
             .select(F.concat(F.lit("/"), "column").alias("field_path"),
                     F.lit(Code.MAX).alias("rule_id"),
                     F.lit(f"entropy above maximum {max_entropy} nats "
                           "(key-shaped noise)").alias("message"),
                     F.col("entropy").cast("string").alias("actual")))
    if not checks:
        raise ValueError("entropy_violations: set min_entropy and/or "
                         "max_entropy")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def correlation(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Pearson correlation of two numeric columns as a 1-row frame
    ``(n, r)`` — ONE aggregate scan (streaming co-moments, map-side
    partials). ``n`` counts the pairs where both sides are non-NULL
    (the pairs ``F.corr`` actually uses); ``r`` is NULL when either
    column is constant or n < 2, rounded to 6 decimals."""
    both = F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
    # r = cov/(sx*sy) from guarded co-moments rather than F.corr: under
    # ANSI mode (Spark 4 default) corr on a zero-variance column throws
    # DIVIDE_BY_ZERO instead of returning NULL
    x = F.when(both, F.col(col_x).cast("double"))
    y = F.when(both, F.col(col_y).cast("double"))
    agg = df.agg(
        F.sum(both.cast("bigint")).cast("bigint").alias("n"),
        F.covar_samp(x, y).alias("cov"),
        F.stddev_samp(x).alias("sx"),
        F.stddev_samp(y).alias("sy"))
    return agg.select(
        "n",
        F.when((F.col("n") >= 2) & (F.col("sx") > 0) & (F.col("sy") > 0),
               F.round(F.col("cov") / (F.col("sx") * F.col("sy")), 6))
         .alias("r"))


def correlation_violations(df: DataFrame, col_x: str, col_y: str,
                           min_r: Optional[float] = None,
                           max_r: Optional[float] = None) -> DataFrame:
    """Violation row (field_path "/col_x,col_y") when Pearson r leaves
    [min_r, max_r] — the relationship contract two numeric columns must
    keep (e.g. extendedprice must track quantity at r ≥ 0.5; a silent
    unit change on one side breaks it while every per-column stat
    stays green). A NULL r (constant column) violates a min_r bound —
    no correlation is not evidence of the required correlation."""
    if min_r is None and max_r is None:
        raise ValueError("correlation_violations: set min_r and/or max_r")
    r = correlation(df, col_x, col_y)
    path = F.lit(f"/{col_x},{col_y}")
    checks = []
    if min_r is not None:
        checks.append(r.filter(F.col("r").isNull()
                               | (F.col("r") < F.lit(float(min_r))))
                      .select(path.alias("field_path"),
                              F.lit(Code.MIN).alias("rule_id"),
                              F.lit(f"Pearson r below minimum {min_r} "
                                    "(required relationship broken)")
                               .alias("message"),
                              F.coalesce(F.col("r").cast("string"),
                                         F.lit("null")).alias("actual")))
    if max_r is not None:
        checks.append(r.filter(F.col("r") > F.lit(float(max_r)))
                      .select(path.alias("field_path"),
                              F.lit(Code.MAX).alias("rule_id"),
                              F.lit(f"Pearson r above maximum {max_r}")
                               .alias("message"),
                              F.col("r").cast("string").alias("actual")))
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def mutual_information(df: DataFrame, col_x: str,
                       col_y: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns as a
    1-row frame ``(n, mi)``; rows where either side is NULL are
    excluded (NULL-rate is column_stats' finding). MI = 0 ⇔
    independent; MI = min(H(x), H(y)) ⇔ one determines the other (the
    soft version of the functional-dependency check).

    ONE ``groupBy(x, y).count`` shuffle over the table; both marginals
    re-aggregate the resulting joint frame (O(distinct pairs) rows, no
    second scan) and join back within it — at 10^12 rows the joint
    frame for genuine categoricals is thousands of rows, so the
    marginal joins broadcast. ``sum(c_xy * ln(n * c_xy / (c_x * c_y)))
    / n`` over integer counts, rounded to 6."""
    base = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    joint = (base.groupBy(F.col(col_x).cast("string").alias("x"),
                          F.col(col_y).cast("string").alias("y"))
             .agg(F.count("*").alias("c_xy")))
    mx = joint.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = joint.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = joint.agg(F.sum("c_xy").alias("n"))
    j = (joint.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
         .crossJoin(F.broadcast(n)))
    # double casts BEFORE the products: n * c_xy at 10^12 rows
    # overflows bigint; as doubles the products stay exact (< 2^53 for
    # genuine categoricals) so both engines see identical operands
    return (j.agg(F.first("n").alias("n"),
                  F.round(F.sum(F.col("c_xy")
                                * F.log((F.col("n").cast("double")
                                         * F.col("c_xy"))
                                        / (F.col("c_x").cast("double")
                                           * F.col("c_y"))))
                          / F.first("n"), 6).alias("mi"))
            .select(F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
                    .alias("n"), "mi"))


def mutual_information_violations(df: DataFrame, col_x: str, col_y: str,
                                  min_mi: Optional[float] = None,
                                  max_mi: Optional[float] = None
                                  ) -> DataFrame:
    """Violation row when MI(col_x; col_y) leaves [min_mi, max_mi]:
    MIN catches a pair that silently decoupled (a join key gone
    stale), MAX a pair that must stay independent coupling up (a
    target leaking into a feature)."""
    if min_mi is None and max_mi is None:
        raise ValueError("mutual_information_violations: set min_mi "
                         "and/or max_mi")
    m = mutual_information(df, col_x, col_y)
    path = F.lit(f"/{col_x},{col_y}")
    checks = []
    if min_mi is not None:
        checks.append(m.filter(F.col("mi").isNull()
                               | (F.col("mi") < F.lit(float(min_mi))))
                      .select(path.alias("field_path"),
                              F.lit(Code.MIN).alias("rule_id"),
                              F.lit(f"mutual information below minimum "
                                    f"{min_mi} nats (pair decoupled)")
                               .alias("message"),
                              F.coalesce(F.col("mi").cast("string"),
                                         F.lit("null")).alias("actual")))
    if max_mi is not None:
        checks.append(m.filter(F.col("mi") > F.lit(float(max_mi)))
                      .select(path.alias("field_path"),
                              F.lit(Code.MAX).alias("rule_id"),
                              F.lit(f"mutual information above maximum "
                                    f"{max_mi} nats (leak-shaped "
                                    "coupling)").alias("message"),
                              F.col("mi").cast("string").alias("actual")))
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def grouped_column_entropy(df: DataFrame, group_col: str,
                           cols: Sequence[str]) -> DataFrame:
    """Shannon entropy per (group, column): the segmented form of
    :func:`column_entropy` — one producer/shard/day whose categorical
    collapsed is invisible to the GLOBAL entropy while the other groups
    keep mixing (exactly the per-group freshness/drift motivation).
    Output ``(group_col, column, n, n_distinct, entropy)``; NULL groups
    are skipped (a NULL shard key is the stats family's finding).

    Same shape as the global metric with the group key prepended: ONE
    stacked melt, map-side-combined (group, column, value) counts —
    shuffle O(groups × distinct values) — then a per-(group, column)
    re-agg. Identical integer-count arithmetic, 6-decimal round."""
    pairs = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    melted = (df.filter(F.col(group_col).isNotNull())
              .select(F.col(group_col).alias("__g"),
                      F.explode(F.create_map(*pairs)).alias("column", "v")))
    counts = melted.groupBy("__g", "column", "v") \
        .agg(F.count("*").alias("c"))
    per = (counts.groupBy("__g", "column")
           .agg(F.sum("c").alias("n"),
                F.count("*").alias("n_distinct"),
                F.sum(F.col("c") * F.log("c")).alias("sum_clnc")))
    return per.select(
        F.col("__g").alias(group_col), "column",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.round(F.log("n") - F.col("sum_clnc") / F.col("n"), 6)
         .alias("entropy"))


def grouped_entropy_violations(df: DataFrame, group_col: str,
                               cols: Sequence[str],
                               min_entropy: Optional[float] = None,
                               max_entropy: Optional[float] = None,
                               min_group_rows: int = 1) -> DataFrame:
    """Groups whose per-column entropy leaves the bounds, as violation
    rows with the group identity in the message (the table-level
    convention). ``min_group_rows`` skips tiny groups whose entropy is
    noise (a 2-row group can only score 0 or ln 2)."""
    if min_entropy is None and max_entropy is None:
        raise ValueError("grouped_entropy_violations: set min_entropy "
                         "and/or max_entropy")
    e = grouped_column_entropy(df, group_col, cols) \
        .filter(F.col("n") >= int(min_group_rows))
    msg_tail = (F.lit(f" [{group_col}="),
                F.col(group_col).cast("string"), F.lit("]"))
    checks = []
    if min_entropy is not None:
        checks.append(
            e.filter(F.col("entropy") < F.lit(float(min_entropy)))
             .select(F.concat(F.lit("/"), "column").alias("field_path"),
                     F.lit(Code.MIN).alias("rule_id"),
                     F.concat(F.lit(f"group entropy below minimum "
                                    f"{min_entropy} nats"), *msg_tail)
                      .alias("message"),
                     F.col("entropy").cast("string").alias("actual")))
    if max_entropy is not None:
        checks.append(
            e.filter(F.col("entropy") > F.lit(float(max_entropy)))
             .select(F.concat(F.lit("/"), "column").alias("field_path"),
                     F.lit(Code.MAX).alias("rule_id"),
                     F.concat(F.lit(f"group entropy above maximum "
                                    f"{max_entropy} nats"), *msg_tail)
                      .alias("message"),
                     F.col("entropy").cast("string").alias("actual")))
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
