"""Materialize the trained IVF coarse quantizer as a committed parquet
side-table (the tools/gen_hyperplanes.py pattern).

Production IVF trains the quantizer ONCE per corpus and serves every query
from the committed centroid table; round 3 benched quantizer training inside
the ivf_cosine_topk query path (~13 s of its 15.4 s at sf0.1 — round-3
verdict "What's wrong #2"). This script runs the same seeded distributed
k-means (operators/similarity.kmeans_centroids: 16 clusters, 2 Lloyd
passes, first-n init, decimal-summed means) over the sf0.001 embeddings
fixture — the committed-fixture convention bpe_merges.json already uses —
and writes (cid: int64, cv: list<double>[64]) sorted by cid.

The table is a pure function of (fixture, k, iters, seed-free first-n
init), so it is byte-reproducible; tests/test_training_ops.py retrains and
compares. Training itself stays value-gated by the embedding_clusters
oracle (which unrolls the Lloyd passes in DuckDB). Regenerate with:

    python tools/gen_ivf_centroids.py
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, ITERS = 16, 2
FIXTURE = "/root/testdata/sf0.001/embeddings.parquet"
OUT = os.path.join(os.path.dirname(__file__), "..", "web_crawler_spark",
                   "data", f"ivf_centroids_k{K}_i{ITERS}.parquet")


def main() -> None:
    from web_crawler_spark.operators.similarity import kmeans_centroids
    from web_crawler_spark.session import get_spark
    spark = get_spark("gen-ivf-centroids", cores=8)
    emb = spark.read.parquet(FIXTURE)
    cents = sorted(
        kmeans_centroids(emb, n_clusters=K, n_iters=ITERS).collect(),
        key=lambda r: r["__cid"])
    table = pa.table({
        "cid": pa.array([r["__cid"] for r in cents], type=pa.int64()),
        "cv": pa.array([list(r["__cv"]) for r in cents],
                       type=pa.list_(pa.float64())),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {len(cents)} centroids (k={K}, iters={ITERS}) "
          f"to {os.path.abspath(OUT)}")
    spark.stop()


if __name__ == "__main__":
    main()
