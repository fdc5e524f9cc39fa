"""Generate a 10x (sf1-equivalent) documents/embeddings fixture for
the scale-exponent measurement (VERDICT r7 task 4).

/root/testdata is read-only and the driver only ships sf<=0.1, so the
10x point is generated HERE, calibrated against the measured sf0.1
statistics (the quantities that drive each operator's cost curve):

- documents: the same 31-word vocabulary (read from sf0.1), document
  word-lengths RESAMPLED from the sf0.1 empirical distribution (so
  shingle counts per doc match), language/source mix matched, and the
  same template-duplication structure: ~4.7% of docs are a copy of an
  earlier doc with a " dup" suffix (sf0.1 has 235 shared-prefix pairs
  per 5000 docs — that candidate density is exactly what PPJoin and
  MinHash-LSH costs scale with).
- embeddings: unit-normalized 64-dim Gaussian vectors with uniform
  labels 0-9 — sf0.1's vectors measure as isotropic random on the
  sphere (within-label mean cosine 0.0000, P(cos>=0.4) = 4.6e-4 =
  the pure-random expectation), so random IS the calibrated model.

Deterministic (numpy PCG64 seed 42). Output: testdata_scale/<out>/
{documents,embeddings}.parquet next to the repo root (gitignored).
Usage: python scripts/gen_scale_fixture.py [mult] [out_name]
    # defaults: mult=10, out_name=sf1. mult=50 + out_name=sf5 is the
    # 100k-vector ANN crossing-point fixture (VERDICT r8 task 2).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
_SCALE_DIR = os.path.join(os.path.dirname(__file__), "..", "testdata_scale")
DUP_FRAC = 0.047  # 235 shared-prefix pairs / 5000 docs at sf0.1
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.151, 0.149, 0.148, 0.140]  # sf0.1 mix
EMB_DIM = 64
N_LABELS = 10


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_name = sys.argv[2] if len(sys.argv) > 2 else "sf1"
    OUT = os.path.join(_SCALE_DIR, out_name)
    import duckdb

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            f"""WITH w AS (SELECT unnest(string_split(lower(text), ' '))
                           AS tok FROM '{SRC}/documents.parquet')
               SELECT DISTINCT tok FROM w ORDER BY tok"""
        ).fetchall()
    ]
    base_lens = [
        r[0]
        for r in con.sql(
            f"""SELECT len(string_split(text, ' '))
               FROM '{SRC}/documents.parquet'"""
        ).fetchall()
    ]
    n_docs = 5000 * mult
    n_vecs = 2000 * mult
    rng = np.random.default_rng(42)

    lens = rng.choice(np.array(base_lens), size=n_docs, replace=True)
    vocab_arr = np.array(vocab)
    texts: list[str] = []
    dup_flags = rng.random(n_docs) < DUP_FRAC
    for i in range(n_docs):
        if dup_flags[i] and i > 0:
            base = int(rng.integers(0, i))
            texts.append(texts[base] + " dup")
        else:
            words = vocab_arr[rng.integers(0, len(vocab_arr), size=lens[i])]
            texts.append(" ".join(words))
    langs = rng.choice(np.array(LANGS), size=n_docs, p=np.array(LANG_P))
    sources = np.char.add("src", rng.integers(0, 20, size=n_docs).astype(str))
    os.makedirs(OUT, exist_ok=True)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    pq.write_table(docs, os.path.join(OUT, "documents.parquet"))

    X = rng.standard_normal((n_vecs, EMB_DIM))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(
                rng.integers(0, N_LABELS, size=n_vecs).astype(np.int32),
                pa.int32(),
            ),
        }
    )
    pq.write_table(emb, os.path.join(OUT, "embeddings.parquet"))
    print(
        f"wrote {n_docs} docs ({int(dup_flags.sum())} dups), "
        f"{n_vecs} vectors -> {os.path.abspath(OUT)}"
    )


if __name__ == "__main__":
    main()
