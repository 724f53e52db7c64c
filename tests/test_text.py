"""lang_id breadth (round-2 VERDICT item 7): script branches for
non-Latin languages + extended stopword tables, and Spark↔DuckDB oracle
parity on the same synthetic multilingual rows."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from protovalidate_spark.pipeline import lang_id

ROWS = [
    (1, "the cat sat on the mat and it is that good for a while", "en"),
    (2, "der hund ist nicht mit der katze und das ist ein problem", "de"),
    (3, "le chat est dans la maison et les chiens pour une fois", "fr"),
    (4, "el perro es un animal para la casa con los gatos", "es"),
    (5, "il gatto è un animale che vive per la casa con noi e non dorme", "it"),
    (6, "o gato é um animal de casa que vive em um lugar para o dono", "pt"),
    (7, "de hond is een dier dat niet op de bank mag van het baasje", "nl"),
    (8, "这是一个中文句子没有任何外来词汇只有汉字组成的文本内容", "zh"),
    (9, "これはにほんごのぶんしょうですかなだけでかいています", "ja"),
    (10, "이것은 한국어 문장입니다 한글로만 작성되었습니다", "ko"),
    (11, "это русское предложение написано кириллицей целиком", "ru"),
    (12, "هذه جملة عربية مكتوبة بالحروف العربية فقط", "ar"),
    (13, "यह एक हिंदी वाक्य है जो देवनागरी में लिखा गया है", "hi"),
    (14, "αυτή είναι μια ελληνική πρόταση γραμμένη στα ελληνικά", "el"),
    (15, "זה משפט בעברית שנכתב באותיות עבריות בלבד", "he"),
    (16, "นี่คือประโยคภาษาไทยที่เขียนด้วยอักษรไทยทั้งหมด", "th"),
    (17, "zxqv wk jh plm qrs", "und"),
    (18, "", "und"),
    (19, "jag har inte sett det som är på teve och att du vet", "sv"),
    (20, "jeg er ikke glad og det er til at se som regel på den", "da"),
    (21, "nie wiem czy to jest tak jak się wydaje ale że co", "pl"),
    (22, "bu bir deneme ve çok daha iyi ama ne için gibi ile", "tr"),
    (23, "ini adalah kalimat yang ditulis dengan bahasa itu dan di"
         " untuk tidak dari akan", "id"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t, _ in ROWS],
                                 "doc_id int, text string")


def test_lang_id_breadth(spark, docs):
    got = {r["doc_id"]: r["lang_pred"]
           for r in lang_id(docs, "text").collect()}
    for i, _, want in ROWS:
        assert got[i] == want, (i, got[i], want)


def test_lang_id_oracle_parity(spark, docs):
    """The composed DuckDB CASE chain must predict identically to the
    Spark expression on every synthetic row (the contract documents
    table is Latin-only; this pins the non-Latin branches)."""
    import duckdb

    import __spark_entry__ as entry
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame({"doc_id": [i for i, _, _ in ROWS],
                               "text": [t for _, t, _ in ROWS]}))
    oracle = {r[0]: r[1]
              for r in con.execute(entry._langid_oracle_sql()).fetchall()}
    got = {r["doc_id"]: r["lang_pred"]
           for r in lang_id(docs, "text").collect()}
    assert oracle == got


def test_lang_id_japanese_beats_cjk(spark):
    """Mixed kanji+kana text (real Japanese) must classify ja, not zh —
    the kana branch is checked first."""
    df = spark.createDataFrame(
        [(1, "日本語の文章は漢字とかなで書かれています")],
        "doc_id int, text string")
    assert lang_id(df, "text").collect()[0]["lang_pred"] == "ja"


# -- Gopher/C4 repetition + PII operators (round 4) -------------------------

def test_repetition_features_values(spark):
    from protovalidate_spark.pipeline import repetition_features
    df = spark.createDataFrame([
        (1, "the cat sat on the mat with the cat again and again today"),
        (2, "a a a a a a a a a a"),
        (3, ""),
        (4, "line one\n" + "x" * 80 + "\nline three"),
    ], "doc_id int, text string")
    r = {x["doc_id"]: x for x in repetition_features(df).collect()}
    assert r[1]["n_tokens"] == 13
    assert r[1]["dup_word_frac"] == pytest.approx(4 / 13)
    assert r[1]["dup_3gram_frac"] == 0.0
    assert r[2]["dup_word_frac"] == pytest.approx(0.9)
    assert r[2]["dup_2gram_frac"] == pytest.approx(8 / 9)
    assert r[2]["mean_word_len"] == 1.0
    # empty doc: every feature 0, never NULL/NaN
    assert all(r[3][k] == 0 for k in
               ("n_tokens", "dup_word_frac", "dup_2gram_frac",
                "dup_3gram_frac", "mean_word_len", "symbol_word_ratio",
                "max_line_frac"))
    assert r[4]["max_line_frac"] == pytest.approx(80 / len(
        "line one\n" + "x" * 80 + "\nline three"))


def test_gopher_gates(spark):
    from protovalidate_spark.pipeline import gopher_quality_violations
    df = spark.createDataFrame([
        (1, "a a a a a a a a a a"),            # repetition + short + mwl
        (2, "normal words flowing nicely here"),  # short only (min 5 ok)
        (3, "### ## # lots of # symbols here plus more words"),
    ], "doc_id int, text string")
    got = {(r["doc_id"], r["rule_id"])
           for r in gopher_quality_violations(
               df, "doc_id", min_tokens=5).collect()}
    assert (1, "REPETITION") in got and (1, "RANGE") in got
    assert (3, "MAX") in got          # symbol ratio
    assert not any(d == 2 for d, _ in got)


def test_pii_counts(spark):
    from protovalidate_spark.pipeline import pii_counts
    df = spark.createDataFrame([
        (1, "reach a@b.io and c.d+tag@ex.co.uk or +44 20 7946 0958"),
        (2, "server at 192.168.0.1 and 10.0.0.255; version 1.2 is not an ip"),
        (3, "clean text with no identifiers at all"),
    ], "doc_id int, text string")
    r = {x["doc_id"]: x for x in pii_counts(df).collect()}
    assert (r[1]["n_emails"], r[1]["n_phones"]) == (2, 1)
    assert r[2]["n_ipv4"] == 2 and r[2]["n_emails"] == 0
    assert (r[3]["n_emails"], r[3]["n_ipv4"], r[3]["n_phones"]) == (0, 0, 0)


def test_c4_line_features(spark):
    from protovalidate_spark.pipeline import c4_line_features
    page = ("This line survives the filter just fine.\n"
            "short one\n"
            "Home | About | Contact\n"
            "Please enable JavaScript to view this site\n"
            "Another proper sentence ends with punctuation!")
    df = spark.createDataFrame(
        [(1, page), (2, "lorem ipsum dolor"), (3, "code { return 1; }"),
         (4, ""), (5, None)],
        "doc_id int, text string")
    r = {x["doc_id"]: x for x in c4_line_features(df).collect()}
    assert r[1]["n_lines"] == 5 and r[1]["n_kept_lines"] == 2
    assert abs(r[1]["kept_line_frac"] - 0.4) < 1e-9
    assert r[1]["n_sentences"] == 2 and r[1]["n_js_lines"] == 1
    assert r[2]["has_lorem"] and not r[2]["has_brace"]
    assert r[3]["has_brace"] and not r[3]["has_lorem"]
    # empty page: 1 empty line, nothing kept, no sentences
    assert r[4]["n_kept_lines"] == 0 and r[4]["n_sentences"] == 0
    assert not r[5]["has_lorem"]  # NULL text never trips a boolean gate


def test_c4_clean_text(spark):
    from pyspark.sql import functions as F

    from protovalidate_spark.pipeline import c4_clean_text
    page = ("  Padded but a real sentence here.  \n"
            "nav menu\n"
            "This page requires JavaScript to work properly.\n"
            "Second real sentence stays too!")
    df = spark.createDataFrame([(1, page)], "doc_id int, text string")
    out = df.select(c4_clean_text(F.col("text")).alias("clean")) \
            .first()["clean"]
    assert out == ("Padded but a real sentence here.\n"
                   "Second real sentence stays too!")


def test_c4_gates(spark):
    from protovalidate_spark.pipeline import c4_quality_violations
    df = spark.createDataFrame([
        (1, "First sentence. Second one! Third here? All proper lines."),
        (2, "lorem ipsum filler without a single sentence mark"),
        (3, "a { b } page with code. One sentence. Two. Three."),
        (4, "plain word salad with no punctuation at all"),
    ], "doc_id int, text string")
    got = {(r["doc_id"], r["rule_id"])
           for r in c4_quality_violations(df, "doc_id").collect()}
    assert (1, "MIN_LEN") not in got          # 4 sentence marks
    assert (2, "DENIED") in got and (2, "MIN_LEN") in got
    assert (3, "DENIED") in got               # brace page
    assert (3, "MIN_LEN") not in got          # 4 marks
    assert (4, "MIN_LEN") in got
    # opt-in kept-line floor fires on the salad page, not on page 1
    got2 = {(r["doc_id"], r["rule_id"])
            for r in c4_quality_violations(
                df, "doc_id", min_kept_line_frac=0.5).collect()}
    assert (4, "MIN") in got2 and (1, "MIN") not in got2


def test_oov_rate(spark):
    from protovalidate_spark.pipeline import oov_rate, oov_violations
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("sat",)], "token string")
    df = spark.createDataFrame([
        (1, "the cat sat"),                    # 0/3 oov
        (2, "the dog ran far"),                # 3/4 oov
        (3, ""),                               # zero tokens
        (4, "the the the cat"),                # repeats count per token
    ], "doc_id int, text string")
    r = {x["doc_id"]: x for x in
         oov_rate(df, "doc_id", vocab).collect()}
    assert (r[1]["n_oov"], r[1]["oov_rate"]) == (0, 0.0)
    assert (r[2]["n_tokens"], r[2]["n_oov"]) == (4, 3)
    assert (r[3]["n_tokens"], r[3]["oov_rate"]) == (0, 0.0)
    assert (r[4]["n_tokens"], r[4]["n_oov"]) == (4, 0)
    v = {x["doc_id"] for x in
         oov_violations(df, "doc_id", vocab, max_rate=0.5).collect()}
    assert v == {2}
    # broadcast membership, no sort-merge join
    plan = oov_rate(df, "doc_id", vocab) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_pii(spark):
    from protovalidate_spark.pipeline import pii_counts, with_redacted_text
    rows = [
        (1, "mail a@b.io and c.d+x@e.org, call +1 (555) 123-4567"),
        (2, "server at 10.0.0.1 and 192.168.1.255 ok"),
        (3, "clean text, no pii at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    red = with_redacted_text(df)
    got = {r["id"]: r["text_redacted"] for r in red.collect()}
    assert got[1] == "mail [EMAIL] and [EMAIL], call [PHONE]"
    assert got[2] == "server at [IP] and [IP] ok"
    assert got[3] == "clean text, no pii at all"
    assert got[4] is None
    # convergence: detection on the scrubbed column finds nothing
    post = pii_counts(red.drop("text").withColumnRenamed(
        "text_redacted", "text"), "text")
    assert post.filter(
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0
    ).count() == 0


def test_bigram_logprob(spark):
    """Corpus-LM quality signal vs a pure-Python oracle, plus the
    zero-bigram edge (one-token / empty / NULL docs → NULL mean_nll)."""
    import math
    from collections import Counter

    from protovalidate_spark.pipeline import (bigram_logprob,
                                              perplexity_violations)
    rows = [(1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "xyzzy"),
            (4, ""),
            (5, None),
            (6, "the cat sat on the mat again and again")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_nll"])
           for r in bigram_logprob(df, "doc_id").collect()}

    k = 0.5
    toks = {i: (t.split() if t else []) for i, t in rows}
    c1 = Counter(w for ws in toks.values() for w in ws)
    c2 = Counter((ws[i], ws[i + 1]) for ws in toks.values()
                 for i in range(len(ws) - 1))
    vocab = len(c1)
    for i, ws in toks.items():
        bs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        if not bs:
            assert got[i] == (0, None)
            continue
        lp = sum(math.log((c2[b] + k) / (c1[b[0]] + k * vocab))
                 for b in bs)
        assert got[i] == (len(bs), round(-lp / len(bs), 6))

    # the rare-transition doc scores strictly worse than the repeated one
    assert got[2][1] > got[1][1]

    # gate: exactly the docs above the threshold; zero-bigram docs pass
    thr = got[1][1] + 1e-9
    expected = {i for i, (nb, nll) in got.items()
                if nll is not None and nll > thr}
    v = {r["doc_id"] for r in perplexity_violations(
        df, "doc_id", max_nll=thr).collect()}
    assert v == expected and 2 in v
    assert {3, 4, 5}.isdisjoint(v)


def test_bigram_logprob_plan(spark):
    """Scale-shape pins: map-side partial aggregation on the count
    frames and the per-doc re-agg; the 1-row vocab side is a broadcast;
    no Python UDF stage anywhere."""
    from protovalidate_spark.pipeline import bigram_logprob
    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], "doc_id int, text string")
    plan = bigram_logprob(df, "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
