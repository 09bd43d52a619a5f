"""Deduplication family for web-scale training-data pipelines.

Five dedup modes over a documents table, each chosen for a different
scale/fidelity point:

- exact          md5-fingerprint groupBy (one shuffle, whole-stage codegen)
- minhash_lsh    shingle→minhash→band→bucket self-join (near-dup at scale;
                 candidates only pair within a band bucket, never O(n²))
- simhash        64-bit simhash + banded hamming join (bit_count native)
- ngram_jaccard  exact Jaccard over shingle sets via explode + self-join
                 (small/medium corpora; the verifier for minhash recall)
- embedding      cosine near-dup pairs (see similarity.py for the kernel)

All shingle/minhash hashing runs JVM-side (xxhash64 / md5 inside
higher-order functions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textkit


# -- exact -------------------------------------------------------------------

def exact_dedup_map(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id): every doc mapped to the min-id doc sharing
    its normalized-text fingerprint. Keep rows where doc_id==canonical_id
    to materialize the deduped corpus."""
    fp = docs.select(
        F.col(id_col), textkit.fingerprint(F.col(text_col)).alias("fp")
    )
    canon = fp.groupBy("fp").agg(F.min(id_col).alias("canonical_id"))
    return fp.join(canon, "fp").select(id_col, "canonical_id")


# -- minhash + LSH -----------------------------------------------------------

def minhash_signature(text_col, k_shingle: int = 5, num_perm: int = 32):
    """Column: array<long> minhash signature. Permutation i is the
    independent hash family xxhash64(shingle, i) — min over shingles.

    The permutation index is bound via a closure factory, NOT a default
    arg on the transform lambda: pyspark introspects lambda arity, so a
    two-arg lambda becomes an (element, array_index) transform and every
    signature entry would collapse to the same hash family.
    """
    shingles = textkit.word_shingles(text_col, k_shingle)

    def _perm(i: int):
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))

    return F.array(*[_perm(i) for i in range(num_perm)])


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 5,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash LSH,
    with the signature-estimated Jaccard attached.

    Scale shape: explode to (band_id, band_hash) keys → self-join per
    bucket. Bucket sizes are data-dependent; hot buckets are exactly the
    near-dup clusters we want, and AQE's skew-join handles the residue.
    """
    rows_per_band = num_perm // bands
    sig = docs.select(
        F.col(id_col),
        minhash_signature(F.col(text_col), k_shingle, num_perm).alias("sig"),
    ).filter(F.size("sig") > 0)

    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            (
                F.size(
                    F.filter(
                        F.zip_with("l.sig", "r.sig", lambda a, b: (a == b).cast("int")),
                        lambda x: x == 1,
                    )
                )
                / F.size("l.sig")
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


# -- simhash ------------------------------------------------------------------

def simhash64(text_col, n_tokens_cap: int = 512):
    """Column: 64-bit simhash of the token stream, built natively:
    per bit b, sign = Σ_tokens (bit b of xxhash64(token) ? +1 : −1).
    Implemented as 64 aggregate expressions over the token array —
    heavy but JVM-side and codegen'd; cap tokens for bound cost."""
    toks = F.slice(textkit.tokens(textkit.normalized(text_col)), 1, n_tokens_cap)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _vote(bit: int):
        # closure factory: pyspark introspects lambda arity, so the bit
        # index must not be a default arg of the merge lambda itself
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), _vote(b)) for b in range(64)]
    out = F.lit(0).cast("long")
    for b, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return out


def simhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, found by
    banding the 64-bit hash into 8×8-bit chunks (pigeonhole: ≤7 bit
    diffs ⇒ ≥1 identical chunk) and verifying with native bit_count."""
    sh = docs.select(F.col(id_col), simhash64(F.col(text_col)).alias("sh"))
    chunks = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("sh", c * 8).bitwiseAND(F.lit(0xFF)).alias("cv"),
                    )
                    for c in range(8)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "sh", F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv"))
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# -- exact n-gram Jaccard ------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 5,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles.

    Physical shape (chosen over the naive explode+self-join, which
    shuffles the exploded table twice on 32-byte md5 strings): hash each
    shingle to 64 bits JVM-side, group the exploded (shingle → doc list)
    once, generate co-occurrence pairs inside each group with two
    generators, then count per pair — one wide shuffle on longs plus one
    on (id,id). Set sizes come straight off the un-exploded array
    (size(array_distinct(...))), no second aggregation over the exploded
    data. Results are identical to the md5-based DuckDB oracle because
    only shingle *identity* feeds the counts.
    """
    arr = F.array_distinct(
        F.transform(textkit.word_shingles(F.col(text_col), k_shingle), lambda s: F.xxhash64(s))
    )
    base = docs.select(F.col(id_col), arr.alias("arr")).filter(F.size("arr") > 0)
    sizes = base.select(F.col(id_col), F.size("arr").alias("n"))
    sh = base.select(F.col(id_col), F.explode("arr").alias("sh"))
    grouped = (
        sh.groupBy("sh")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        grouped.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("common"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    # no broadcast hint: sizes is one row per doc (10^10 at target scale);
    # AQE broadcasts it automatically when it is actually small
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
