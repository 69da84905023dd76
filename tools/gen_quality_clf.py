"""Train and commit the fasttext-style quality classifier weight table.

The model-based quality gate used by GPT-3-style pipelines (filter web text
with a linear classifier trained on a known-good reference corpus vs raw
web): here a logistic regression over hashed bag-of-words features — mean of
one-hot bucket vectors per document, B = 4096 buckets shared with the DSIR
feature contract (web_crawler_spark/operators/selection.py: normalize ->
split on ' ' -> md5(token)[:3]).

Training is deterministic: fixed embedded corpora (positives = formal
English sentences; negatives = web chrome / clickbait / spam), zero init,
fixed learning rate and iteration count, full-batch gradient descent in
float64 — then weights are quantized to integer micro-units:

    parquet rows: (bucket, w)  for all 4096 buckets, plus the bias stored
    under bucket='' (a real bucket is 3 hex chars)

The Spark/DuckDB scorer then decides keep <=> sum_w + bias * n_tokens >= 0
in exact BIGINT arithmetic (see selection.quality_clf_df).

Regenerate with:  python tools/gen_quality_clf.py
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_crawler_spark.operators.selection import (  # noqa: E402
    N_BUCKETS, py_bucket, py_features)

OUT = os.path.join(os.path.dirname(__file__), "..", "web_crawler_spark",
                   "data", "quality_clf_v1.parquet")

MICRO = 1_000_000

POSITIVE = [
    "All human beings are born free and equal in dignity and rights.",
    "They are endowed with reason and conscience and should act towards "
    "one another in a spirit of brotherhood.",
    "The history of the region is documented in primary sources held by "
    "the national archive.",
    "Photosynthesis converts light energy into chemical energy stored in "
    "glucose molecules.",
    "The court held that the statute violated the equal protection clause.",
    "A prime number is a natural number greater than one with no positive "
    "divisors other than one and itself.",
    "The committee published its findings in a peer reviewed journal.",
    "Rivers transport sediment from mountain ranges to coastal deltas.",
    "The novel examines memory and loss through an unreliable narrator.",
    "Vaccination produces immunity by exposing the immune system to a "
    "weakened form of a pathogen.",
    "The treaty was ratified by parliament after extensive public debate.",
    "Glaciers advance and retreat in response to long term climate cycles.",
]

NEGATIVE = [
    "click here to subscribe now and get the best deals in your inbox",
    "accept all cookies manage preferences privacy policy terms of service",
    "you won't believe what happened next number seven will shock you",
    "buy now limited time offer free shipping on all orders act fast",
    "sign up login register home about contact us follow us",
    "top ten weird tricks doctors hate local mom discovers one simple trick",
    "sponsored content advertisement continue reading below trending now",
    "win a free iphone enter your email claim your prize now",
    "this site uses cookies to improve your experience opt out settings",
    "hot singles in your area cheap pills no prescription needed",
    "casino bonus free spins deposit now withdraw instantly jackpot",
    "breaking exclusive must see viral video share like and subscribe",
]


def mean_bag(text: str) -> np.ndarray:
    x = np.zeros(N_BUCKETS, dtype=np.float64)
    toks = py_features(text, bigrams=False)
    for t in toks:
        x[int(py_bucket(t), 16)] += 1.0
    if toks:
        x /= len(toks)
    return x


def train():
    """Deterministic full-batch logistic regression; returns (w, b, acc)
    as float64 — a pure function of the embedded corpora."""
    xs = np.stack([mean_bag(t) for t in POSITIVE + NEGATIVE])
    ys = np.array([1.0] * len(POSITIVE) + [0.0] * len(NEGATIVE))

    w = np.zeros(N_BUCKETS, dtype=np.float64)
    b = 0.0
    lr = 2.0
    for _ in range(500):
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - ys
        w -= lr * (xs.T @ g) / len(ys)
        b -= lr * g.mean()

    acc = float((((xs @ w + b) >= 0) == (ys == 1.0)).mean())
    return w, b, acc


def main() -> None:
    w, b, acc = train()
    buckets = [format(i, "03x") for i in range(N_BUCKETS)] + [""]
    ws = [int(round(v * MICRO)) for v in w] + [int(round(b * MICRO))]
    table = pa.table({
        "bucket": pa.array(buckets, type=pa.string()),
        "w": pa.array(ws, type=pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    nz = sum(1 for v in ws[:-1] if v != 0)
    print(f"wrote {table.num_rows} rows ({nz} nonzero buckets, "
          f"bias {ws[-1]} micro, train acc {acc:.3f}) to "
          f"{os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
