"""Materialize DSIR hashed-n-gram importance weights as a committed parquet
side-table (the gen_langid_trigrams.py pattern).

DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023) —
scores a raw-web document by how much more likely its hashed n-gram features
are under a TARGET distribution (formal, book/encyclopedia-like text) than
under the RAW web distribution:

    log w(x) = sum_f [ log p_target(bucket(f)) - log p_raw(bucket(f)) ]

Features are word unigrams + bigrams hashed into B=4096 buckets by the first
3 hex chars of md5(feature) — a spelling that parses identically in Spark
(substring(md5(f),1,3)), DuckDB (substr(md5(f),1,3)) and Python, so the
Spark scorer and the SQL oracle can never diverge on the hash. Both bucket
unigram models use add-one smoothing over ALL 4096 buckets, so every bucket
has a defined weight and the scorer's model join is a plain inner broadcast
join (no unseen-key branch):

    w[b] = round(1e6 * (log((ct[b]+1)/(Nt+B)) - log((cr[b]+1)/(Nr+B))))

Integer micro-log-ratio weights ON PURPOSE (the langid/BPE discipline):
document scores are exact BIGINT sums — partition-order-independent on
Spark and bit-equal in the DuckDB oracle.

Seed corpora are embedded and deterministic: TARGET is formal English
(UDHR Article 1 — public domain — plus encyclopedic sentences composed for
this tool); RAW is web chrome / clickbait / spam phrasing composed for this
tool. Regenerate with:  python tools/gen_dsir_weights.py
"""

import math
import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_crawler_spark.operators.selection import (  # noqa: E402
    N_BUCKETS, py_bucket, py_features)

OUT = os.path.join(os.path.dirname(__file__), "..", "web_crawler_spark",
                   "data", "dsir_weights_v1.parquet")

MICRO = 1_000_000

#: formal / reference-like English — what a curation pass upsamples
TARGET = (
    "All human beings are born free and equal in dignity and rights. "
    "They are endowed with reason and conscience and should act towards one "
    "another in a spirit of brotherhood. "
    "The history of the region is documented in a series of primary sources "
    "held by the national archive. "
    "Photosynthesis converts light energy into chemical energy stored in "
    "glucose molecules. "
    "The court held that the statute violated the equal protection clause "
    "of the constitution. "
    "In mathematics, a prime number is a natural number greater than one "
    "with no positive divisors other than one and itself. "
    "The committee published its findings in a peer reviewed journal after "
    "two years of field research. "
    "Rivers transport sediment from mountain ranges to coastal deltas over "
    "geological time scales. "
    "The novel examines memory and loss through the eyes of an unreliable "
    "narrator. "
    "Vaccination produces immunity by exposing the immune system to a "
    "weakened or inactive form of a pathogen."
)

#: web chrome / clickbait / spam — what a curation pass downsamples
RAW = (
    "click here to subscribe now and get the best deals in your inbox. "
    "accept all cookies manage preferences privacy policy terms of service. "
    "you won't believe what happened next number seven will shock you. "
    "buy now limited time offer free shipping on all orders act fast. "
    "sign up login register home about contact us follow us on social "
    "media. "
    "top ten weird tricks doctors hate local mom discovers one simple "
    "trick. "
    "sponsored content advertisement continue reading below more stories "
    "trending now. "
    "win a free iphone enter your email claim your prize now winner "
    "selected today. "
    "this site uses cookies to improve your experience opt out settings "
    "learn more. "
    "hot singles in your area cheap pills no prescription needed casino "
    "bonus spins."
)


def bucket_counts(text: str) -> Counter:
    return Counter(py_bucket(f) for f in py_features(text))


def compute_weights() -> dict:
    """Pure function of the embedded corpora: bucket -> micro-log-ratio."""
    ct = bucket_counts(TARGET)
    cr = bucket_counts(RAW)
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for i in range(N_BUCKETS):
        b = format(i, "03x")
        out[b] = round(MICRO * (math.log((ct[b] + 1) / (nt + N_BUCKETS)) -
                                math.log((cr[b] + 1) / (nr + N_BUCKETS))))
    return out


def main() -> None:
    ct = bucket_counts(TARGET)
    cr = bucket_counts(RAW)
    nt, nr = sum(ct.values()), sum(cr.values())
    wmap = compute_weights()
    buckets = sorted(wmap)
    ws = [wmap[b] for b in buckets]

    table = pa.table({
        "bucket": pa.array(buckets, type=pa.string()),
        "w": pa.array(ws, type=pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    n_hit = sum(1 for x in ws if x != round(
        MICRO * (math.log(1 / (nt + N_BUCKETS)) -
                 math.log(1 / (nr + N_BUCKETS)))))
    print(f"wrote {table.num_rows} buckets ({n_hit} non-baseline; "
          f"target feats {nt}, raw feats {nr}) to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
