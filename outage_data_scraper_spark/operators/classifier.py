"""Naive-Bayes document quality classifier — the learned counterpart
of the rule-based filters (textkit.gopher_keep, q43/q59).

The production pattern this re-expresses: LLM data pipelines train a
lightweight linear/fastText-style classifier to separate "good" text
from raw crawl (GPT-3 §A WebText-vs-CommonCrawl; LLaMA's
Wikipedia-reference classifier) and score every document with it.
Multinomial NB over unigrams IS that linear classifier (weights =
per-token log-likelihood ratios) with a closed-form, count-based
training step — which is what makes it VALUE-GATABLE cross-engine,
where SGD-trained weights are not. Labels come from any boolean
column; the q96 registration bootstraps them from the Gopher rules
(heuristic-label self-training, the standard cold-start).

Cross-engine law: per-token weight = round(ln(((cp+1)/(Np+V)) /
((cn+1)/(Nn+V))) · 1e6) as a long (micro-nats; Laplace smoothing;
Np/Nn = class token totals, V = vocab). Weights are summed as
INTEGERS per doc (order-free — the q57 micro-nat pattern); the ln
halves are never exactly .5 so Spark HALF_UP and DuckDB
round-half-away agree on the negatives too. The decision is
score ≥ 0 (no prior term: the prior is a driver-side constant whose
rounding has no shared law, and threshold-at-zero is how these
filters are deployed anyway — the score IS the artifact).

Scale shape (100 TB): training is ONE map-side-combined (token,
class-counts) shuffle — vocab-sized output; scoring joins the token
stream against that table (broadcast when it fits, bucketed
otherwise) and regroups (doc_id, long) — exactly the frozen-LM
table shape (lm.score_bigram_lm_table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textkit


def nb_quality_scores(
    docs: DataFrame,
    label,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, score_micro, predicted_keep) for every doc:
    multinomial-NB log-likelihood-ratio score under Laplace smoothing,
    trained on ``label`` (a boolean Column over ``docs`` rows) and
    scored on the same corpus (heuristic-label self-training).
    predicted_keep = score_micro ≥ 0."""
    lab = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(textkit.normalized(F.col(text_col)), " ").alias("toks"),
        label.alias("pos"),
    )
    tok = lab.select("doc_id", "pos", F.explode("toks").alias("t"))
    cnt = (
        tok.groupBy("t")
        .agg(
            F.sum(F.col("pos").cast("long")).alias("cp"),
            F.sum((~F.col("pos")).cast("long")).alias("cn"),
        )
        .localCheckpoint(eager=True)  # counted then joined — one compute
    )
    tot = cnt.agg(
        F.sum("cp").alias("np"), F.sum("cn").alias("nn"), F.count("*").alias("v")
    ).collect()[0]
    np_, nn_, v = float(tot["np"]), float(tot["nn"]), float(tot["v"])
    weight = F.round(
        F.log(
            ((F.col("cp") + 1.0) / (F.lit(np_) + F.lit(v)))
            / ((F.col("cn") + 1.0) / (F.lit(nn_) + F.lit(v)))
        )
        * 1e6,
        0,
    ).cast("long")
    scored = tok.join(F.broadcast(cnt), "t").select("doc_id", weight.alias("m"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("m").cast("long").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_micro",
            (F.col("score_micro") >= 0).alias("predicted_keep"),
        )
    )
