"""Distributed BPE (byte-pair-encoding) merge training over a corpus.

Sennrich et al. 2016 trainer semantics, re-expressed for Spark's
execution model: the corpus-sized work happens exactly ONCE (the
word-frequency count — one shuffle at scan scale), and every merge
iteration after that touches only the VOCABULARY table (distinct words
+ freq), which is millions of rows at 100 TB corpus scale, not
trillions — the reason real tokenizer trainers are feasible at all.
Per iteration: adjacent-symbol pairs explode out of the vocab table,
one vocab-sized groupBy picks the most frequent pair (deterministic
(freq DESC, left, right) tiebreak), and a pure-column fold rewrites the
symbol arrays. The per-round ``localCheckpoint`` is the CLAUDE.md
iterative-loop invariant (nested lineage blows up Catalyst analysis).

Merging is a left-to-right non-overlapping scan, implemented as an
``F.aggregate`` fold with a (out, prev) struct accumulator — pure JVM
column algebra, no UDF. ``train_bpe_py`` is the exact driver-side twin
(same tokenization, same tiebreak, same fold) used by the committed
q68 oracle, since an iterative argmax loop is not ANSI SQL.

The reference repo has no tokenizer-training analog; this is part of
the training-data-pipeline surface the task adds.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textkit

#: end-of-word marker symbol (a distinct symbol, never split into chars)
END_TOKEN = "</w>"

MERGE_SCHEMA = "step int, left string, right string, merged string, pair_freq long"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the single corpus-sized
    pass; everything downstream operates on this table only."""
    toks = textkit.tokens(textkit.normalized(F.col(text_col)))
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(word: Column) -> Column:
    """Initial symbol array: one symbol per character, plus END_TOKEN."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_TOKEN)))


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Replace every left-to-right non-overlapping adjacent (a, b) with
    a+b: an aggregate fold carrying (emitted array, pending symbol)."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        return (
            F.when(
                (acc["prev"] == a) & (s == b),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .when(
                acc["prev"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("prev")),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    s.alias("prev"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(sym, init, step, fin)


def _adjacent_pairs(sym_col: str = "sym") -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (every occurrence
    counts, so 'aaa' contributes (a,a) twice — trainer semantics).
    size()-based slice lengths per the CLAUDE.md zip_with trap."""
    n = F.size(sym_col)
    return F.zip_with(
        F.slice(sym_col, F.lit(1), n - 1),
        F.slice(sym_col, F.lit(2), n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, left, right, merged, pair_freq) — the artifact a tokenizer
    ships. Stops early if the vocabulary is fully merged."""
    spark = docs.sparkSession
    vocab = (
        word_freq_table(docs, text_col)
        .select("word", "freq", _symbols(F.col("word")).alias("sym"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step_i in range(n_merges):
        best = (
            vocab.select("freq", F.explode(_adjacent_pairs()).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.desc("pf"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, pf = best[0].a, best[0].b, int(best[0].pf)
        merges.append((step_i, a, b, a + b, pf))
        vocab = vocab.select(
            "word", "freq", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def encode_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge list to a table of distinct words — the
    encode side. At corpus scale the right shape is: distinct words →
    encode here (vocab-sized) → hash/broadcast join the symbol arrays
    back onto the corpus; encoding cost is O(vocabulary), never
    O(corpus). Checkpoints every 8 merges to bound plan depth."""
    out = words.select(
        F.col(word_col), _symbols(F.col(word_col)).alias("sym")
    )
    for i, (a, b) in enumerate(merges):
        out = out.select(word_col, _apply_merge(F.col("sym"), a, b).alias("sym"))
        if (i + 1) % 8 == 0:
            out = out.localCheckpoint(eager=False)
    return out


def train_bpe_collected(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Collected-vocab fast path: ONE corpus-sized Spark pass (the same
    ``word_freq_table`` shuffle as ``train_bpe``), then the merge loop
    runs DRIVER-SIDE over the collected (word, freq) table. Identical
    output to ``train_bpe`` (pytest parity on seeded corpora).

    Why this exists: the distributed loop pays one Spark job + one
    driver collect per merge round (~0.2 s/job scheduling floor), so a
    production 32k-merge tokenizer would spend hours on pure
    scheduling. The word-freq table is already VOCAB-sized after the
    single corpus shuffle — millions of rows at 100 TB corpus scale, a
    driver-feasible collect — and each Python merge round is O(vocab
    symbols), micro-seconds at demo scale. Use the distributed loop
    only when the vocabulary itself cannot fit on the driver (which at
    word granularity it essentially always can; byte-level BPE over
    unsegmented text is the exception). scripts/bpe_crossover.py
    measures the crossover (see BENCH.md).
    """
    spark = docs.sparkSession
    wf = {
        r.word: int(r.freq)
        for r in word_freq_table(docs, text_col).collect()
    }
    return spark.createDataFrame(_merge_loop_py(wf, n_merges), MERGE_SCHEMA)


# -- driver-side twin (oracle generator) --------------------------------------

def _apply_merge_py(sym: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    prev: str | None = None
    for s in sym:
        if prev == a and s == b:
            out.append(a + b)
            prev = None
        elif prev is None:
            prev = s
        else:
            out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return out


def train_bpe_py(
    texts: list[str | None], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Exact Python twin of train_bpe: same normalization (collapse
    whitespace, strip, lower — textkit.normalized), same every-occurrence
    pair counting, same (freq DESC, a, b) tiebreak (ASCII corpus: Python
    code-point order == Spark UTF8 binary order), same fold."""
    wf: Counter[str] = Counter()
    for t in texts:
        if not t:
            continue
        for w in re.sub(r"\s+", " ", t, flags=re.ASCII).strip().lower().split(" "):
            if w:
                wf[w] += 1
    return _merge_loop_py(wf, n_merges)


def _merge_loop_py(
    wf: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The merge loop over a (word, freq) map — shared by the oracle
    twin and the collected-vocab fast path. Same every-occurrence pair
    counting and (freq DESC, a, b) tiebreak as the distributed loop
    (Python code-point order == Spark UTF8 binary order: UTF-8 byte
    order is code-point-preserving)."""
    vocab: dict[str, list[str]] = {w: list(w) + [END_TOKEN] for w in wf}
    merges: list[tuple[int, str, str, str, int]] = []
    for step_i in range(n_merges):
        pc: Counter[tuple[str, str]] = Counter()
        for w, sym in vocab.items():
            f = wf[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += f
        if not pc:
            break
        (a, b), pf = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step_i, a, b, a + b, pf))
        vocab = {w: _apply_merge_py(sym, a, b) for w, sym in vocab.items()}
    return merges


def encode_words_py(
    words: list[str], merges: list[tuple[str, str]]
) -> dict[str, list[str]]:
    """Exact Python twin of encode_words (the q79 oracle generator)."""
    out = {w: list(w) + [END_TOKEN] for w in words}
    for a, b in merges:
        out = {w: _apply_merge_py(sym, a, b) for w, sym in out.items()}
    return out
