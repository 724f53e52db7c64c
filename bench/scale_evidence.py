"""Scale-up evidence (round-2 VERDICT item 9): run the headline
operators an order of magnitude above their per-round bench sizes and
report throughput, so the plans' scaling story is measured rather than
asserted.

- clips full validation pass (the BASELINE.json metric) at 400k rows
  (8× the per-round 50k) on local[32]: warm-up + median of 3.
- multi-band embedding LSH near-dup at 200k vectors (10× the 20k
  fixture), with planted pairs, LSH only (brute at 200k is 4e10 sims —
  exactly the path the buckets exist to avoid); reports pairs found and
  planted-pair recall.

Usage: python bench/scale_evidence.py [--cores 32]
Prints one JSON line; paste the numbers into BENCH.md §scale-up.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def big_embeddings(spark, n_rows: int = 200000, dim: int = 64,
                   planted: int = 2000):
    """Deterministic in-memory 200k-vector frame: gaussian + planted
    near-dups of rows 0..planted-1 at cosine ~0.95 (generated
    per-partition on executors — nothing driver-side or committed)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rng = np.random.RandomState(1234)
            out_ids, out_vecs = [], []
            for i in idx:
                # planted rows copy row (i - (n_rows - planted)) — NOT
                # i % planted, which only coincides when n_rows is a
                # multiple of planted and otherwise pairs nothing
                r = np.random.RandomState(
                    int(i) - (n_rows - planted) if i >= n_rows - planted
                    else int(i))
                v = r.randn(dim)
                if i >= n_rows - planted:
                    u = v / np.linalg.norm(v)
                    w = rng.randn(dim)
                    w -= (w @ u) * u
                    w /= np.linalg.norm(w)
                    c = 0.95
                    v = (c * u + np.sqrt(1 - c * c) * w) * np.linalg.norm(v)
                out_ids.append("s%06d" % i)
                out_vecs.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": out_ids, "vec": out_vecs})

    return (spark.range(n_rows).repartition(32)
            .mapInPandas(gen, "vec_id string, vec array<double>"))


def big_documents(spark, n_rows: int = 50000, words_per_doc: int = 120,
                  planted: int = 500):
    """Deterministic word-salad documents (10× the sf0.1 corpus):
    row i < n_rows-planted is ~120 words drawn by RandomState(i) from the
    clips fixture vocabulary; the last ``planted`` rows are copies of
    rows 0..planted-1 with 4 words swapped (3-gram shingle Jaccard ≈0.8,
    comfortably above the 0.7 verify threshold). Generated per-partition
    on executors — nothing driver-side or committed."""
    import numpy as np
    import pandas as pd
    from protovalidate_spark.fixtures import WORDS

    vocab = np.array(WORDS)

    def gen(batches):
        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"].to_numpy():
                src = int(i) - (n_rows - planted) \
                    if i >= n_rows - planted else int(i)
                r = np.random.RandomState(src)
                w = vocab[r.randint(0, len(vocab), words_per_doc)].copy()
                if i >= n_rows - planted:
                    rm = np.random.RandomState(1_000_000 + src)
                    pos = rm.choice(words_per_doc, 4, replace=False)
                    w[pos] = vocab[rm.randint(0, len(vocab), 4)]
                ids.append("d%06d" % i)
                texts.append(" ".join(w))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (spark.range(n_rows).repartition(32)
            .mapInPandas(gen, "doc_id string, text string"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--clips-rows", type=int, default=400000)
    ap.add_argument("--emb-rows", type=int, default=200000)
    ap.add_argument("--doc-rows", type=int, default=50000)
    args = ap.parse_args()

    import bench as benchmod
    from protovalidate_spark.conf import local_session
    spark = local_session(cores=args.cores, app="pv-scale-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cores": args.cores}

    # --- clips full pass at 400k ---
    path = benchmod.ensure_clips_bench(spark, args.clips_rows)
    baseline = benchmod.ensure_drift_baseline(spark, path)
    n, nv, _ = benchmod.run_clips_pass(spark, path, baseline)  # warm-up
    passes = [benchmod.run_clips_pass(spark, path, baseline)[2]
              for _ in range(3)]
    med = sorted(passes)[1]
    out["clips_rows"] = n
    out["clips_violations"] = nv
    out["clips_pass_secs"] = [round(x, 2) for x in passes]
    out["clips_per_sec"] = round(n / med, 1)

    # --- multi-band LSH near-dup at 200k ---
    df = big_embeddings(spark, args.emb_rows).persist()
    df.count()
    from protovalidate_spark.pipeline import embedding_near_dups
    lsh = embedding_near_dups(df, "vec_id", "vec", threshold=0.9,
                              planes=8, bands=12)
    lsh.count()  # warm-up
    t0 = time.time()
    pairs = lsh.collect()
    dt = time.time() - t0
    planted = {("s%06d" % i, "s%06d" % (args.emb_rows - 2000 + i))
               for i in range(2000)}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    out["emb_rows"] = args.emb_rows
    out["lsh_sec"] = round(dt, 2)
    out["lsh_vectors_per_sec"] = round(args.emb_rows / dt, 1)
    out["lsh_pairs"] = len(pairs)
    out["planted_recall"] = round(len(got & planted) / len(planted), 4)
    df.unpersist()

    # --- text dedup (MinHash+LSH→Jaccard, SimHash) at 50k docs ---
    from protovalidate_spark.pipeline import (ngram_jaccard_dedup,
                                              simhash_near_dups)
    docs = big_documents(spark, args.doc_rows).persist()
    docs.count()
    n_plant = 500
    planted_docs = {("d%06d" % i, "d%06d" % (args.doc_rows - n_plant + i))
                    for i in range(n_plant)}
    ngram_jaccard_dedup(docs, "doc_id", "text").count()  # warm-up
    t0 = time.time()
    mh_pairs = ngram_jaccard_dedup(docs, "doc_id", "text").collect()
    dt = time.time() - t0
    got_mh = {(r["id_a"], r["id_b"]) for r in mh_pairs}
    out["doc_rows"] = args.doc_rows
    out["minhash_sec"] = round(dt, 2)
    out["minhash_docs_per_sec"] = round(args.doc_rows / dt, 1)
    out["minhash_pairs"] = len(mh_pairs)
    out["minhash_planted_recall"] = round(
        len(got_mh & planted_docs) / n_plant, 4)
    t0 = time.time()
    out["simhash_pairs"] = simhash_near_dups(docs, "doc_id", "text").count()
    out["simhash_sec"] = round(time.time() - t0, 2)
    docs.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
