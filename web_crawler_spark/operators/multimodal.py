"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns (same as the pages
table's html per input_hint). The Spark-side machinery — schema, Arrow batch
shape, mapInPandas iterator contract, partition sizing — is real and tested;
the actual codec step is STUBBED behind ``decode_stub`` with a deterministic
fake (the decode libs are not in this container). Swapping in PIL/ffmpeg is
a one-function change inside the iterator.

Batch-shape contract: mapInPandas receives an iterator of pandas DataFrames
(one per Arrow batch, ~spark.sql.execution.arrow.maxRecordsPerBatch rows);
per-batch numpy work amortizes Python overhead exactly like the parse UDF.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = ("media_id bigint, kind string, payload binary, mime string, "
             "width int, height int, duration_ms int")

FEATURE_DDL = ("media_id bigint, kind string, feat array<float>, "
               "decode_ok boolean")


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.blake2b(f"{seed}:{i}".encode(),
                                  digest_size=32).digest() * 4
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}",
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     1000 * (i % 7) if kind != "image" else None))
    return spark.createDataFrame(rows, schema=MEDIA_DDL)


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: replace with PIL.Image.open / soundfile / pyav frame-sample.
    Deterministic fake 'feature': 8 floats folded from the payload digest."""
    d = hashlib.blake2b(payload or b"", digest_size=32).digest()
    return np.frombuffer(d, dtype=np.uint8).reshape(8, 4).sum(axis=1) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out; payload
    column pruned away on output so the (large) binary never reshuffles."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append([float(x) for x in decode_stub(payload, kind)])
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feat": feats, "decode_ok": ok})

    return media.mapInPandas(run, schema=FEATURE_DDL)
