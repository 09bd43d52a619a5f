"""Salient-term extraction: per-document TF-IDF top-k.

The classic corpus-statistics op a training-data pipeline runs for topic
sampling, quality heuristics, and index keying. Pure DataFrame algebra:
token explode → per-(doc, term) tf → per-term document frequency →
score join → per-doc top-k window. Three hash shuffles (tf agg, df agg,
rank window); the df table is the corpus vocabulary — broadcastable at
scale. No floats cross engines unrounded: ranking uses the ROUNDED
score (+ term as tiebreak) so the DuckDB oracle selects identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textkit


def top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top ``k`` terms per document by tf·ln(N/df), deterministic
    tiebreak on the term itself. Returns (doc_id, term, tf, df, tfidf,
    rank)."""
    n_docs = docs.count()  # one scalar; at scale a cached agg, not a scan
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(textkit.normalized(F.col(text_col)), " ")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
