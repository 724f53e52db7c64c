"""End-to-end document curation: quality gates + exact dedup + optional
near-dup removal, with drops reported through the ENGINE'S violation
model (field_path, rule_id, message, actual) — the training-data
pipeline and the validation engine share one error vocabulary, so a
curation run's drop report reads exactly like a rule-set violation
report (SURVEY.md §2.9 error shape; driver brief: dedup/quality as
first-class pipeline components).

Scale design: quality gates are pure JVM column expressions (one
projection); exact dedup is the fingerprint groupBy with a broadcast
join-back of the (tiny) duplicate-group set; near-dup drops reuse the
bucketed MinHash-LSH path. The keep policy is deterministic
(keep-smallest-id), so curation is idempotent and re-runnable per
partition.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, ngram_jaccard_dedup
from .text import normalize_text, punct_ratio, token_count


def _viol(id_col: str, id_val: Column, path: str, rule_id: str,
          message: str, actual: Column) -> list:
    return [id_val.alias(id_col), F.lit(path).alias("field_path"),
            F.lit(rule_id).alias("rule_id"), F.lit(message).alias("message"),
            F.substring(actual.cast("string"), 1, 50).alias("actual")]


def curate_documents(
    df: DataFrame, id_col: str, text_col: str,
    min_tokens: int = 10, max_punct_ratio: float = 0.30,
    near_dup: bool = False, jaccard_threshold: float = 0.85,
    shingle_n: int = 3,
) -> Tuple[DataFrame, DataFrame]:
    """(kept, dropped) — dropped carries one violation row per reason:

    - ``MIN_LEN``  /text: fewer than ``min_tokens`` whitespace tokens
    - ``MAX``      /text: punctuation ratio above ``max_punct_ratio``
    - ``UNIQUE``   /text: exact duplicate of a kept (smaller-id) doc
    - ``DUPLICATE``/text: near-duplicate (verified Jaccard ≥ threshold)
      of a kept doc — only when ``near_dup=True``

    A document appears in ``kept`` iff it produced NO violation. Quality
    gates are evaluated first; only quality-passing docs participate in
    dedup (a dropped doc cannot crowd out its duplicates)."""
    tid = F.col(id_col)
    txt = F.col(text_col)

    n_tok = token_count(txt)
    p_ratio = punct_ratio(txt)
    quality_v = df.filter(n_tok < min_tokens).select(*_viol(
        id_col, tid, f"/{text_col}", "MIN_LEN",
        f"document has fewer than {min_tokens} tokens", n_tok))
    quality_v = quality_v.unionByName(
        df.filter((n_tok >= min_tokens) & (p_ratio > max_punct_ratio))
          .select(*_viol(id_col, tid, f"/{text_col}", "MAX",
                         f"punctuation ratio above {max_punct_ratio}",
                         F.round(p_ratio, 4))))

    clean = df.filter((n_tok >= min_tokens) & (p_ratio <= max_punct_ratio))

    # exact dedup among quality-passing docs: keep the smallest id per
    # fingerprint group (deterministic); duplicate groups are tiny vs
    # the corpus ⇒ broadcast the keeper map back
    fp = F.md5(normalize_text(txt))
    with_fp = clean.select(tid.alias("__id"), fp.alias("__fp"))
    keepers = (with_fp.groupBy("__fp")
               .agg(F.min("__id").alias("__keep"),
                    F.count(F.lit(1)).alias("__n"))
               .filter(F.col("__n") > 1))
    exact_v = (with_fp.join(F.broadcast(keepers), "__fp")
               .filter(F.col("__id") != F.col("__keep"))
               .select(*_viol(id_col, F.col("__id"), f"/{text_col}",
                              "UNIQUE",
                              "exact duplicate of a kept document",
                              F.col("__keep"))))

    dropped = quality_v.unionByName(exact_v)

    if near_dup:
        already = dropped.select(F.col(id_col).alias("__gone")).distinct()
        survivors = clean.join(
            already, clean[id_col] == F.col("__gone"), "left_anti")
        pairs = ngram_jaccard_dedup(survivors, id_col, text_col,
                                    shingle_n=shingle_n,
                                    threshold=jaccard_threshold)
        # keep-smallest-id policy, resolved TRANSITIVELY: connected
        # components over the verified-pair graph, one smallest-id
        # representative per cluster. (Pair-greedy dropping over-removed
        # chains a~b, b~c and could report a dropped doc as the 'kept'
        # keeper — round-2 ADVICE/VERDICT.) The representative always
        # survives: components only contain quality+exact survivors.
        comp = connected_components(pairs)
        near_v = (comp.filter(F.col("__id") != F.col("__rep"))
                  .select(*_viol(id_col, F.col("__id"), f"/{text_col}",
                                 "DUPLICATE",
                                 "near-duplicate of a kept document",
                                 F.col("__rep"))))
        dropped = dropped.unionByName(near_v)

    gone = dropped.select(F.col(id_col).alias("__gone")).distinct()
    kept = df.join(gone, df[id_col] == F.col("__gone"), "left_anti")
    return kept, dropped
