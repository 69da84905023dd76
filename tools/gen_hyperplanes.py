"""Materialize the seeded random-hyperplane matrix used by
web_crawler_spark.operators.similarity.lsh_cosine_topk as a parquet
side-table, so the driver's DuckDB oracle can restate the LSH signature as
plain sign-of-dot-product folds (the same style the ivf_cosine_topk oracle
already uses).

The matrix is a pure function of (dim, n_bits, seed) — identical to
`_hyperplane_sig_udf`'s `rng.normal(size=(dim, n_bits))` — so the committed
file is reproducible byte-for-byte from this script. Schema: one row per
signature bit, (bit: int32, plane: list<double>[dim]). Regenerate with:

    python tools/gen_hyperplanes.py
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM, N_BITS, SEED = 64, 16, 42
OUT = os.path.join(os.path.dirname(__file__), "..", "web_crawler_spark",
                   "data", f"hyperplanes_d{DIM}_b{N_BITS}_s{SEED}.parquet")


def main() -> None:
    rng = np.random.RandomState(SEED)
    planes = rng.normal(size=(DIM, N_BITS)).astype(np.float64)
    table = pa.table({
        "bit": pa.array(range(N_BITS), type=pa.int32()),
        "plane": pa.array([planes[:, j].tolist() for j in range(N_BITS)],
                          type=pa.list_(pa.float64())),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {N_BITS} planes (dim {DIM}) to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
