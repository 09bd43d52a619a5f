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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval: top-k docs for a bag of query terms.

    Scale shape: the token explode is filtered to the query terms
    IMMEDIATELY (the corpus side never shuffles anything but matches —
    rare by construction), df(t) is a query-terms-sized table that
    broadcasts, and N/avgdl are two driver scalars (the SQ8-codebook
    class). Ranking is float-immune: each term's contribution is
    rounded to integer MICRO-UNITS before the per-doc sum, so the
    aggregate is an integer sum (order-free) and the gate needs no
    rounded-ordering games — score_u is exact in both engines
    (the q57 micro-nat pattern).
    """
    toks = textkit.tokens(textkit.normalized(F.col(text_col)))
    base = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("toks")).alias("sum_dl")
    ).collect()[0]
    if int(stats.n) == 0:
        # all-empty corpus: avgdl is undefined; the result is vacuously empty
        return base.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("score_u"),
            F.lit(None).cast("long").alias("n_terms"),
        ).limit(0)
    n_docs, avgdl = int(stats.n), stats.sum_dl / stats.n
    pos = base.select(
        F.col(id_col),
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    ).filter(F.col("term").isin(query_terms))
    tfdf = pos.groupBy("term", id_col, "dl").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tfdf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = tfdf.join(F.broadcast(df_t), "term")
    # expression shapes mirrored verbatim in the q71 oracle
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    tfn = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / F.lit(avgdl))
    )
    contrib_u = F.round(idf * tfn * F.lit(1e6), 0).cast("long")
    return (
        j.select(F.col(id_col), contrib_u.alias("cu"))
        .groupBy(id_col)
        .agg(F.sum("cu").alias("score_u"), F.count(F.lit(1)).alias("n_terms"))
        .orderBy(F.col("score_u").desc(), id_col)
        .limit(top_k)
    )


def posting_size_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term index STORAGE planner: the byte cost of each posting
    list under delta + LEB128-varint encoding (how real inverted
    indexes store doc-id lists) vs raw 8-byte ids — the sizing input
    for shard/replica planning before building a 10^10-doc index.

    Per term: df, raw_bytes = 8·df, varint_bytes = Σ ceil(bitlen(δ)/7)
    over doc-id deltas (first delta = doc_id + 1 so id 0 still costs
    one byte). All-integer: bit length via length(bin(δ)) — both
    engines render minimal binary strings — and ceil as (len+6) DIV 7.

    Scale shape: one (doc, term) distinct projection, then the deltas
    come from a lag window PARTITIONED BY TERM — bounded by each term's
    df, the same Zipf-head caveat build_inverted_index documents (shard
    stopword terms by doc-bucket there; sizes then sum per bucket).
    Final agg is map-side combined on term.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(textkit.tokens(textkit.normalized(F.col(text_col))))
        ).alias("term"),
    ).filter(F.col("term") != "")
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy("doc_id")
    delta = (
        toks.select("term", "doc_id", F.lag("doc_id").over(w).alias("__prev"))
        .select(
            "term",
            F.when(F.col("__prev").isNull(), F.col("doc_id") + 1)
            .otherwise(F.col("doc_id") - F.col("__prev"))
            .alias("delta"),
        )
    )
    return delta.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        (F.count(F.lit(1)) * 8).cast("long").alias("raw_bytes"),
        F.sum(F.expr("(length(bin(delta)) + 6) DIV 7"))
        .cast("long")
        .alias("varint_bytes"),
    )


def bm25_max_score_table(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term WAND / MaxScore upper bounds (Broder et al. 2003;
    Turtle & Flood 1995): for every vocabulary term, the MAXIMUM BM25
    contribution any single document can earn from it, in the same
    integer micro-units bm25_topk sums. A top-k query engine reads this
    term-sized table to skip whole posting lists (if the sum of the
    remaining terms' upper bounds cannot beat the current k-th score,
    stop) — the pruning structure that makes top-k retrieval affordable
    over a 10^10-doc index, computed once at index-build time.

    Returns (term, df, ub_u). Scale shape: one (term, doc) tf
    aggregation (the inverted-index shuffle, map-side combined), df as
    a second term-keyed agg over it, one term-keyed join back (reuses
    the agg's hash partitioning; vocabulary-sized relation — the Zipf
    head is bounded because both sides are already per-term
    aggregates), then a map-side-combined max per term. N and avgdl are
    the two driver scalars bm25_topk already uses; the contribution
    expression is IDENTICAL to bm25_topk's, so ub_u is a true bound for
    every score it would sum (asserted in tests)."""
    toks = textkit.tokens(textkit.normalized(F.col(text_col)))
    base = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("toks")).alias("sum_dl")
    ).collect()[0]
    if int(stats.n) == 0:
        return base.select(
            F.lit("").alias("term"),
            F.lit(None).cast("long").alias("df"),
            F.lit(None).cast("long").alias("ub_u"),
        ).limit(0)
    n_docs, avgdl = int(stats.n), stats.sum_dl / stats.n
    pos = base.select(
        F.col(id_col),
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    ).filter(F.col("term") != "")
    tfdf = pos.groupBy("term", id_col, "dl").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tfdf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = tfdf.join(df_t, "term")
    # the exact bm25_topk contribution expression — ub must bound it
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    tfn = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / F.lit(avgdl))
    )
    contrib_u = F.round(idf * tfn * F.lit(1e6), 0).cast("long")
    return j.select("term", "df", contrib_u.alias("cu")).groupBy(
        "term"
    ).agg(
        F.max("df").cast("long").alias("df"),
        F.max("cu").cast("long").alias("ub_u"),
    )


def merge_inverted_index(
    base: DataFrame,
    delta: DataFrame,
    min_df: int = 1,
) -> DataFrame:
    """Incremental index maintenance: merge a DELTA index segment into
    a BASE segment without rescanning the base corpus — the Lucene-
    style segment merge a continuous crawl needs (re-building a
    10^10-doc index per refresh is the thing this avoids; the refresh
    pass only tokenizes NEW docs, then merges term-sized rows).

    Contract: both inputs are build_inverted_index outputs
    (doc_buckets=1) over DISJOINT doc-id sets (new docs get new ids;
    updates route through delete + reinsert). df/total_tf add; posting
    lists concatenate and RE-SORT by doc id (numeric, not lexical — doc
    10 sorts after doc 9), so interleaved id ranges merge correctly and
    `merge(build(A), build(B)) ≡ build(A ∪ B)` exactly (the q117 gate).
    ``min_df`` applies AFTER the merge — a term at df 1+1 across
    segments survives a min_df=2 cut, exactly as a full rebuild would
    count it.

    Scale shape: ONE term-keyed full-outer join of two term-sized
    relations (both already aggregated — the Zipf head is one row per
    side per segment), then pure array algebra per row; no corpus-sized
    shuffle anywhere."""
    a = base.select(
        "term",
        F.col("df").alias("__dfa"),
        F.col("total_tf").alias("__tfa"),
        F.col("postings").alias("__pa"),
    )
    b = delta.select(
        "term",
        F.col("df").alias("__dfb"),
        F.col("total_tf").alias("__tfb"),
        F.col("postings").alias("__pb"),
    )
    empty = F.array().cast("array<string>")
    both = F.concat(
        F.coalesce(F.split(F.col("__pa"), ","), empty),
        F.coalesce(F.split(F.col("__pb"), ","), empty),
    )
    keyed = F.transform(
        both,
        lambda e: F.struct(
            F.substring_index(e, ":", 1).cast("long").alias("d"),
            e.alias("e"),
        ),
    )
    merged = a.join(b, "term", "full_outer").select(
        "term",
        (F.coalesce("__dfa", F.lit(0)) + F.coalesce("__dfb", F.lit(0)))
        .cast("long")
        .alias("df"),
        (F.coalesce("__tfa", F.lit(0)) + F.coalesce("__tfb", F.lit(0)))
        .cast("long")
        .alias("total_tf"),
        F.concat_ws(
            ",", F.transform(F.sort_array(keyed), lambda s: s["e"])
        ).alias("postings"),
    )
    return merged.filter(F.col("df") >= min_df)


def remove_docs_from_index(
    index: DataFrame,
    removed: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Tombstone COMPACTION: rewrite an index segment without the given
    documents — the delete half of incremental maintenance (updates =
    remove old doc ids, then merge_inverted_index the re-built delta;
    between compactions a real system serves base ⊖ tombstones, and
    this is the rewrite the compactor runs). Terms whose posting lists
    empty out drop entirely.

    Scale shape: posting rows explode to (term, entry) — the index's
    own cardinality, NOT the corpus token count (an entry is one doc's
    whole position list) — anti-join the removed-id relation (hash
    join; removed sets are delete batches, no broadcast assumption),
    and regroup per term with the same deterministic struct sort the
    builder uses. tf per entry is recomputed from the position list,
    so df/total_tf stay exact without consulting the corpus."""
    entries = index.select(
        "term", F.explode(F.split("postings", ",")).alias("__e")
    ).select(
        "term",
        "__e",
        F.substring_index("__e", ":", 1).cast("long").alias("__doc"),
        F.size(F.split(F.substring_index("__e", ":", -1), "\\|")).alias("__tf"),
    )
    rm = removed.select(F.col(id_col).cast("long").alias("__doc")).distinct()
    kept = entries.join(rm, "__doc", "left_anti")
    return kept.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("__tf").cast("long").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct("__doc", "__e"))),
                lambda s: s["__e"],
            ),
        ).alias("postings"),
    )
