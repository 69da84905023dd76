"""BM25-shaped ranked retrieval over a document corpus, in exact integers.

The missing retrieval primitive next to the LIKE-search (J2) and ANN ops:
score documents against a bag of query terms with the Okapi BM25 form
(Robertson & Spärck Jones probabilistic relevance framework; k1 = 1.2,
b = 0.75), computing corpus statistics (df, N, avgdl) in the same plan.

Scoring is EXACT INTEGER RATIONAL arithmetic — the repo's langid/BPE
discipline — so the ranking is partition-order-independent and bit-equal in
the DuckDB oracle. The one substitution vs textbook BM25: the idf keeps the
RSJ odds ratio un-logged, as a scaled integer division

    idf_scaled = (2N - 2df + 1) * IDF_SCALE  div  (2df + 1)
               = IDF_SCALE * (N - df + 1/2) / (df + 1/2)

(a log would drag in float libm, whose last-ulp behavior differs across
engines and could flip a floor — rarer terms simply weigh more steeply).
The tf saturation term is textbook BM25 with k1 = 6/5, b = 3/4 cleared of
denominators (multiply num/den by 20 * dl_sum, avgdl = dl_sum / N):

    tf_part = 44 * tf * dl_sum * TF_SCALE
              div (20 * tf * dl_sum + 6 * dl_sum + 18 * N * dl)

score(doc) = sum over matched terms of idf_scaled * tf_part.

100-TB shape: tokens explode into a map-side partial (doc, term) count
pre-filtered by the broadcast term list (the filter is pushed into the scan
stage — text never shuffles); df/N/dl_sum are one tiny agg broadcast back;
the final top-k is a TakeOrderedAndProject, never a global sort. Overflow
headroom: |score term| <= (2N+1) * IDF_SCALE * 2.2 * TF_SCALE; the default
scales hold BIGINT to N ~ 4e8 docs per retrieval partition — shrink
IDF_SCALE for a larger corpus (ranking is scale-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .selection import tokens_norm_col

IDF_SCALE = 100_000
TF_SCALE = 10_000


def bm25_topk(df: DataFrame, terms: list, k: int = 20,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents for a bag of query terms; returns
    (id_col, bm25_score bigint), score-descending, ties broken by id."""
    toks = (df.select(id_col,
                      F.explode(tokens_norm_col(F.col(text_col)))
                      .alias("_t"))
            .filter(F.col("_t").isin([t.lower() for t in terms])))
    tf = toks.groupBy(id_col, "_t").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("_t").agg(F.count("*").alias("df_t"))
    dl = df.select(id_col,
                   F.size(tokens_norm_col(F.col(text_col)))
                   .cast("bigint").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("dl_sum"))
    j = (tf.join(F.broadcast(dft), "_t")
         .join(dl, id_col)
         .crossJoin(F.broadcast(stats)))
    scored = (j.withColumn(
        "_c",
        F.expr(f"((2 * n_docs - 2 * df_t + 1) * {IDF_SCALE}L"
               f" div (2 * df_t + 1)) *"
               f" ((44 * tf * dl_sum * {TF_SCALE}L)"
               f" div (20 * tf * dl_sum + 6 * dl_sum + 18 * n_docs * dl))"))
        .groupBy(id_col).agg(F.sum("_c").alias("bm25_score")))
    return (scored
            .orderBy(F.desc("bm25_score"), F.asc(id_col))
            .limit(k))
