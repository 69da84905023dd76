"""Learn the committed BPE merge table and the oracle lookup side-table.

Learns N_MERGES merges from the sf0.001 documents fixture word frequencies
(deterministic: greedy most-frequent pair, lexicographic tie-break — see
web_crawler_spark/functions/bpe.py), then writes:

* web_crawler_spark/data/bpe_merges.json — the merge table the Spark-side
  tokenizer UDF applies at query time (the real algorithm, not a lookup).
* web_crawler_spark/data/bpe_word_tokens.parquet — word → n_tokens for
  every distinct word across all fixture scale factors, so the driver's
  DuckDB oracle can restate per-document counts as a lookup join while the
  Spark side runs the actual merge loop. An out-of-vocabulary word in a
  future fixture would drop from the oracle join and surface as a mismatch
  rather than silently passing.

N_MERGES=64 deliberately leaves rare words multi-token (the full ~150
merges would collapse every word in the 31-word fixture vocabulary to a
single token, degenerating the statistic to whitespace counting).

Regenerate with: python tools/gen_bpe_vocab.py
"""

import json
import os
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from web_crawler_spark.functions.bpe import (MERGES_JSON,  # noqa: E402
                                             WORD_TOKENS_PARQUET,
                                             BpeTokenizer, learn_merges)

N_MERGES = 64
TRAIN_SF = "/root/testdata/sf0.001/documents.parquet"
ALL_SFS = [f"/root/testdata/sf{sf}/documents.parquet"
           for sf in ("0.001", "0.01", "0.1")]


def word_freqs(path: str) -> Counter:
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT w, count(*) FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM '{path}')
        WHERE w <> '' GROUP BY w""").fetchall()
    return Counter(dict(rows))


def main() -> None:
    freqs = word_freqs(TRAIN_SF)
    merges = learn_merges(dict(freqs), N_MERGES)
    os.makedirs(os.path.dirname(MERGES_JSON), exist_ok=True)
    with open(MERGES_JSON, "w") as f:
        json.dump({"n_merges": len(merges), "train_fixture": TRAIN_SF,
                   "merges": [list(m) for m in merges]}, f, indent=1)

    vocab = set()
    for p in ALL_SFS:
        vocab |= set(word_freqs(p))
    tok = BpeTokenizer(merges)
    words = sorted(vocab)
    pq.write_table(pa.table({
        "word": pa.array(words),
        "n_tokens": pa.array([len(tok.encode(w)) for w in words],
                             type=pa.int64()),
    }), WORD_TOKENS_PARQUET)
    multi = [w for w in words if len(tok.encode(w)) > 1]
    print(f"learned {len(merges)} merges; vocab {len(words)} words, "
          f"{len(multi)} multi-token: "
          f"{ {w: tok.encode(w) for w in multi} }")


if __name__ == "__main__":
    main()
