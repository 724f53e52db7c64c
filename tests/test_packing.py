"""Sequence packing (pipeline/packing.py) + vocabulary top-k
(pipeline/text.py vocab_topk).

The packing output is a pure function of (id order, token counts) —
every test cross-checks against a serial pandas reference, and the
partition-invariance test is the load-bearing one: the distributed
prefix sum must agree with the serial answer for ANY partition count.
"""

import re

import pytest

from pyspark.sql import Row, functions as F

from protovalidate_spark.pipeline import pack_offsets, vocab_topk
from protovalidate_spark.pipeline.text import tokens


DOCS = [
    (0, "alpha beta gamma"),              # 3 tokens
    (1, ""),                              # 0 tokens (consumes nothing)
    (2, "  one   two  "),                 # ragged whitespace: 2 tokens
    (3, "a b c d e f g"),                 # 7
    (4, None),                            # NULL text
    (5, "x" * 5),                         # 1
    (6, "lorem ipsum dolor sit amet"),    # 5
]


def _serial_reference(rows, window):
    """Plain-Python packing over rows sorted by id."""
    out, off = {}, 0
    for i, text in sorted(rows):
        n = len(text.split()) if text and text.strip() else 0
        cid = off // window
        cend = (off + max(n - 1, 0)) // window
        out[i] = (n, off, cid, cend)
        off += n
    return out


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _collect(out):
    return {r["doc_id"]: (r["n_tokens"], r["offset"],
                          r["chunk_id"], r["chunk_end"])
            for r in out.collect()}


def test_pack_matches_serial_reference(spark, docs_df):
    # NULL text must behave as 0 tokens (size(split(NULL)) is -1 raw;
    # the operator clamps), so no fillna here — NULL is the fixture
    got = _collect(pack_offsets(docs_df, "doc_id",
                                text_col="text", window_tokens=4,
                                partitions=3))
    want = _serial_reference(
        [(i, t or "") for i, t in DOCS], 4)
    assert got == want


def test_pack_invariant_to_partitioning(spark, docs_df):
    d = docs_df.fillna({"text": ""})
    base = _collect(pack_offsets(d, "doc_id", text_col="text",
                                 window_tokens=4, partitions=1))
    for p in (2, 5, 16):
        shuffled = d.repartition(p)  # scramble the input layout
        assert _collect(pack_offsets(shuffled, "doc_id", text_col="text",
                                     window_tokens=4, partitions=p)) == base


def test_pack_empty_doc_spans_nothing(spark, docs_df):
    got = _collect(pack_offsets(docs_df.fillna({"text": ""}), "doc_id",
                                text_col="text", window_tokens=2,
                                partitions=2))
    n, off, cid, cend = got[1]            # the empty doc
    assert n == 0 and cid == cend == off // 2


def test_pack_token_count_col_path(spark):
    df = spark.createDataFrame(
        [Row(k=10, n=5), Row(k=11, n=0), Row(k=12, n=9)])
    got = {r["k"]: (r["offset"], r["chunk_id"], r["chunk_end"])
           for r in pack_offsets(df, "k", token_count_col="n",
                                 window_tokens=4, partitions=2).collect()}
    assert got == {10: (0, 0, 1), 11: (5, 1, 1), 12: (5, 1, 3)}


def test_pack_arg_validation(spark, docs_df):
    with pytest.raises(ValueError, match="exactly one"):
        pack_offsets(docs_df, "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        pack_offsets(docs_df, "doc_id", text_col="text",
                     token_count_col="n")
    with pytest.raises(ValueError, match="window_tokens"):
        pack_offsets(docs_df, "doc_id", text_col="text", window_tokens=0)


def test_pack_plan_is_one_range_shuffle(spark, docs_df):
    """The scale claim, pinned: one Exchange rangepartitioning, NO
    SinglePartition exchange (the global-window prefix-sum trap), and
    the per-row stage is Arrow MapInPandas. Fresh lazy frame — an
    executed AQE plan double-prints (memory: plan-toString gotcha)."""
    lazy = pack_offsets(docs_df.fillna({"text": ""}), "doc_id",
                        text_col="text", window_tokens=4, partitions=3,
                        eager=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan
    assert "MapInPandas" in plan
    # InMemoryRelation prints its child twice; dedup by plan_id
    ex_ids = set(re.findall(r"Exchange \w+partitioning[^\[]*\[plan_id=(\d+)",
                            plan))
    assert len(ex_ids) <= 2  # the one range exchange, printed <=2x


def test_vocab_topk_matches_serial(spark, docs_df):
    d = docs_df.fillna({"text": ""})
    got = [(r["token"], r["freq"]) for r in vocab_topk(d, "text", 4).collect()]
    # serial reference with the same tie-break (freq desc, token asc)
    from collections import Counter
    c = Counter(t for _, txt in DOCS for t in (txt or "").split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert got == want


def test_vocab_topk_plan_is_take_ordered(spark, docs_df):
    v = vocab_topk(docs_df.fillna({"text": ""}), "text", 3)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan   # no global sort shuffle
    assert plan.count("HashAggregate") == 2  # map-side partial + final
