"""Sequence packing for training-data assembly.

The standard concat-and-chunk pretraining layout: within each shard group,
documents are concatenated in a deterministic order and the token stream is
cut every `budget` tokens; each cut is one training sequence ("bin"). This
operator computes the bin layout — which documents land in which bin and how
many of their tokens — without ever materializing the token stream.

All JVM built-ins end to end (window cumsum + sequence/explode); no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, n_tokens_col: str, budget: int,
                   group_col: str = "source",
                   order_col: str = "doc_id") -> DataFrame:
    """Assign documents to fixed-size token bins by concat-and-chunk.

    Within each group (shard), documents are laid end-to-end in order_col
    order; the stream is cut every `budget` tokens. A document whose span
    crosses a cut contributes tokens to several bins. Output is one row per
    (group, bin): (group_col, bin_id, n_docs, n_tokens, first_doc,
    last_doc). Every bin is exactly `budget` tokens except each group's
    last.

    100-TB story: only (group, order, n_tokens) rows enter the window — the
    text column is pruned before the exchange, so the sort shuffles ~24 B
    per document. Groups are shards (host / date / input file), so the
    window parallelizes across groups; within a group the cumsum is a
    single-pass sort — the same order the writer job would need anyway. The
    bin explode emits ceil(n_tokens/budget)+1 rows per doc (almost always
    1-2) and the final rollup is map-side partial-aggregated on
    (group, bin).
    """
    n = F.col(n_tokens_col).cast("bigint")
    w = (Window.partitionBy(group_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    spans = (df.select(group_col, order_col, n.alias("_n"))
             .filter(F.col("_n") > 0)
             .withColumn("_end", F.sum("_n").over(w))
             .withColumn("_start", F.col("_end") - F.col("_n")))
    b = F.lit(int(budget)).cast("bigint")
    first_bin = F.floor(F.col("_start") / b)
    last_bin = F.floor((F.col("_end") - 1) / b)
    exploded = (spans
                .withColumn("bin_id", F.explode(
                    F.sequence(first_bin, last_bin)))
                .withColumn("_tok_in_bin",
                            F.least(F.col("_end"), (F.col("bin_id") + 1) * b)
                            - F.greatest(F.col("_start"),
                                         F.col("bin_id") * b)))
    return (exploded.groupBy(group_col, "bin_id")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("_tok_in_bin").cast("bigint").alias("n_tokens"),
                 F.min(order_col).alias("first_doc"),
                 F.max(order_col).alias("last_doc")))


def mixture_sample(df: DataFrame, weights: dict, group_col: str = "source",
                   id_col: str = "doc_id", salt: str = "mix1") -> DataFrame:
    """Deterministic mixture sampling: keep each row of group g with
    probability weights[g] (unlisted groups are dropped), decided by a
    salted md5 of the row id — the Pile/Dolma-style source-weighting step
    of corpus assembly.

    No RNG state and no shuffle: the keep decision is a pure map-side
    filter on a hash, so the sample is reproducible across runs, retries,
    cluster sizes, and partitionings, and composes with any downstream
    operator without a materialization barrier. The comparison is exact
    integer (first 8 md5 hex chars as a uint32 vs floor(w * 2^32)), so no
    float rounding can flip a row between engines or platforms.
    """
    thr = None
    for g, w in sorted(weights.items()):
        lit = F.lit(int(w * 2 ** 32)).cast("bigint")
        thr = (F.when(F.col(group_col) == g, lit) if thr is None
               else thr.when(F.col(group_col) == g, lit))
    if thr is None:
        return df.filter(F.lit(False))
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"),
                                   F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("bigint")
    # unlisted group -> thr NULL -> predicate NULL -> row dropped
    return df.filter(u < thr)


def chunk_documents(df: DataFrame, window: int, stride: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking (the retrieval/RAG-prep sibling of
    pack_sequences): split each document's normalized whitespace tokens
    into chunks of ``window`` tokens every ``stride`` tokens (overlap =
    window - stride), the standard long-document windowing for embedding
    and retrieval indexes.

    Chunk starts are 0, stride, 2*stride, ...; the last chunk may be short;
    a document with no tokens yields no chunks. n_chunks is closed-form
    ((max(n - window, 0) + stride - 1) DIV stride + 1), so the fan-out is a
    sequence+explode over JVM arrays — no Python, no shuffle: chunking is
    a map-side projection of the scan stage at any corpus size.

    Returns (id_col, chunk_id int, start_tok bigint, chunk_tokens bigint,
    chunk_md5 string) where chunk_md5 fingerprints the space-joined chunk
    (content-addressed — downstream exact dedup composes directly).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    from ..operators.selection import tokens_norm_col
    toks = tokens_norm_col(F.col(text_col))
    n_chunks = F.when(F.size(F.col("__toks")) <= 0, F.lit(0)).otherwise(
        F.expr(f"(greatest(size(__toks) - {window}, 0) + {stride - 1}) "
               f"DIV {stride} + 1"))
    base = (df.select(id_col, toks.alias("__toks"))
            .withColumn("__nc", n_chunks)
            .filter(F.col("__nc") > 0))
    out = (base.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
        F.col("__toks"))
        .withColumn("__start", F.col("chunk_id").cast("bigint") * stride)
        .withColumn("__chunk",
                    F.slice(F.col("__toks"),
                            (F.col("__start") + 1).cast("int"), window)))
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("__start").alias("start_tok"),
        F.size("__chunk").cast("bigint").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("__chunk"))).alias("chunk_md5"))
