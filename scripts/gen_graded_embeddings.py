"""Generate the graded-cosine embeddings fixture (committed once).

20 000 gaussian 64-dim vectors; the last 400 are planted near-duplicates
of rows 0..399 at EXACT target cosines graded uniformly over
[0.905, 0.97] — constructed as cos*u + sin*w with w a unit vector
orthogonal to u, so brute-force at threshold 0.9 returns exactly the
400 planted pairs (random 64-dim gaussian pairs concentrate at
|cos| ~ N(0, 1/64) and never reach 0.9). This is the recall yardstick
for the OR-amplified multi-band LSH (round-2 VERDICT top item): at
cosine 0.905 a single 8-plane signature recalls ~0.30 of pairs; 12
bands recall ~0.986.

Usage: python scripts/gen_graded_embeddings.py
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N, DIM, PLANTED = 20000, 64, 400
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "_fixtures", "embeddings_graded_N%d.parquet" % N)


def main():
    rng = np.random.RandomState(42)
    X = rng.randn(N, DIM)
    targets = np.linspace(0.905, 0.97, PLANTED)
    for j in range(PLANTED):
        u = X[j] / np.linalg.norm(X[j])
        r = rng.randn(DIM)
        w = r - (r @ u) * u
        w /= np.linalg.norm(w)
        c = targets[j]
        X[N - PLANTED + j] = (c * u + np.sqrt(1.0 - c * c) * w) \
            * np.linalg.norm(X[j])
    ids = pa.array(["g%06d" % i for i in range(N)])
    vecs = pa.FixedSizeListArray.from_arrays(
        pa.array(X.reshape(-1)), DIM).cast(pa.list_(pa.float64()))
    pq.write_table(pa.table({"vec_id": ids, "vec": vecs}), OUT)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
