"""Statistical language-model scoring for webtext quality filtering.

The CCNet/KenLM-family signal: documents whose token stream is
improbable under a corpus-trained n-gram model are boilerplate,
gibberish, or generated spam. Here: an add-one-smoothed bigram model
trained ON THE CORPUS ITSELF (self-perplexity), scored per document as
average negative log-likelihood over its bigrams.

Cross-engine exactness: per-bigram NLL is rounded to integer
MICRO-NATS (round(-ln(p)·1e6) → long) BEFORE the per-doc sum, so the
aggregation is integer arithmetic — immune to float summation order
(Spark sums partitions in nondeterministic order; a raw double sum can
differ in the last ulp from DuckDB's sequential fold and flip a
rounded value). The ln itself matches bit-for-bit (both engines call
libm; established by q50's tf-idf gate).

Scale shape (10^10 docs): the unigram table is vocab-sized —
broadcastable after a frequency floor; the bigram-count join is the one
big shuffle, keyed by the bigram string whose Zipf head is exactly the
AQE skew-join case. Per-doc aggregation re-shuffles only
(doc_id, micro-NLL) longs. Training and scoring are the same two
passes here; a frozen-model variant broadcasts the count tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textkit


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc (n_bigrams, avg_nll) under the corpus-trained add-one
    bigram model: P(w2|w1) = (c(w1 w2)+1) / (c(w1)+V). Docs with fewer
    than two tokens have no bigrams and emit no row."""
    text = F.col(text_col)
    uni_stream = docs.select(
        F.explode(F.split(textkit.normalized(text), " ")).alias("t")
    )
    # materialize BEFORE the eager |V| count: without it the count job
    # and the scored join each run their own full explode+groupBy over
    # the corpus. localCheckpoint (not persist): checkpointed blocks
    # are freed by the ContextCleaner when the DataFrame is GC'd, so
    # repeated calls in one session don't pin vocab-sized tables in
    # executor storage forever
    uni = uni_stream.groupBy("t").agg(F.count("*").alias("c1"))
    uni = uni.localCheckpoint(eager=True)
    vocab = uni.count()  # one scalar to the driver — the |V| constant

    big = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(textkit.word_shingles(text, 2)).alias("bg"),
    )
    bgc = big.groupBy("bg").agg(F.count("*").alias("c12"))
    scored = (
        big.join(bgc, "bg")
        .withColumn("t", F.split(F.col("bg"), " ")[0])
        .join(uni, "t")
        .select(
            "doc_id",
            F.round(
                -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(float(vocab))))
                * 1e6,
                0,
            ).cast("long").alias("micro_nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.sum("micro_nll") / (F.count("*") * 1e6), 4).alias("avg_nll"),
    )
