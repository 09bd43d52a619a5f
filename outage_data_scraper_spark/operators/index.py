"""Inverted-index construction (positional posting lists) over a corpus.

The search-side artifact a crawled corpus feeds: per term, the document
frequency, total term frequency, and a positional posting list
"doc:p1|p2,doc:p1,...". The reference repo has no search/index analog;
this is training-data/retrieval-pipeline surface (the same structure
BM25 retrieval, phrase queries, and n-gram analyzers consume).

Scale shape: two shuffles — (term, doc) for position folding, then term
for the posting merge — both map-side combined. The Zipf head is the
classic skew case: a stopword's full posting list at 10^10 docs must
never materialize in ONE task, so ``doc_buckets > 1`` shards the final
group by (term, doc_id mod B), emitting per-bucket posting rows that
concatenate lazily at query time (how real indexes shard postings);
AQE's skew-join handles the residue. Determinism: positions sort
inside ``sort_array``, postings sort by doc_id via a struct sort —
``collect_list`` order never leaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textkit


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    doc_buckets: int = 1,
) -> DataFrame:
    """(term, df, total_tf, postings[, doc_bucket]) with postings =
    "doc:p1|p2,...", docs ascending, positions ascending (0-based)."""
    toks = textkit.tokens(textkit.normalized(F.col(text_col)))
    pos = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    per_doc = pos.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("plist")
    )
    entry = F.concat(
        F.col(id_col).cast("string"),
        F.lit(":"),
        F.concat_ws("|", F.transform("plist", lambda p: p.cast("string"))),
    )
    keyed = per_doc.select(
        "term",
        F.col(id_col),
        F.size("plist").alias("tf"),
        entry.alias("entry"),
    )
    group_cols = ["term"]
    if doc_buckets > 1:
        keyed = keyed.withColumn(
            "doc_bucket", F.pmod(F.col(id_col), F.lit(doc_buckets)).cast("int")
        )
        group_cols.append("doc_bucket")
    agg = keyed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col(id_col), F.col("entry")))),
                lambda s: s["entry"],
            ),
        ).alias("postings"),
    )
    return agg.filter(F.col("df") >= min_df)
