"""Integer-micro k-means + SemDeDup (operators/cluster.py)."""

import math
import random

from pyspark.sql import functions as F

from outage_data_scraper_spark.operators.cluster import (
    OFFSET,
    kmeans_micro,
    quantize_micro,
    semdedup,
)


def _brute_kmeans(vecs: dict[int, list[float]], k: int, n_iter: int):
    """Plain-Python twin of the integer law: floor-quantize + offset,
    argmin with lowest-cid ties, floor-div update (sums non-negative so
    // == DIV), empty clusters keep their centroid."""
    q = {
        i: [math.floor(x * 1_000_000) + OFFSET for x in v]
        for i, v in vecs.items()
    }
    cent = {c: list(q[i]) for c, i in enumerate(sorted(q)[:k])}
    assign = {}
    for _ in range(n_iter):
        for i, qs in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(qs, cent[c])), c)
                for c in range(k)
            )
            assign[i] = best[1]
        for c in range(k):
            members = [q[i] for i in q if assign[i] == c]
            if members:
                cent[c] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    return assign


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_micro_brute_parity(spark):
    """Seeded random corpus incl. negative coordinates vs the
    plain-Python integer twin — every label."""
    rng = random.Random(92)
    vecs = {
        i: [rng.uniform(-1.5, 1.5) for _ in range(8)] for i in range(60)
    }
    got = {
        r.vec_id: r.cluster
        for r in kmeans_micro(_emb_df(spark, vecs), k=4, n_iter=3).collect()
    }
    assert got == _brute_kmeans(vecs, 4, 3)


def test_kmeans_micro_tie_goes_to_lowest_cid(spark):
    """A vector equidistant from two centroids joins the lower cid."""
    vecs = {0: [0.0, 0.0], 1: [2.0 - 1e-6, 0.0], 2: [1.0 - 1e-6, 0.0]}
    # quantized: c0=(0+OFF,OFF), c1=(1999999+OFF,OFF); vec 2 at 999999
    # is 999999 from c0 and 1000000 from c1 -> c0; exact midpoint case:
    vecs2 = {0: [0.0], 1: [1.0], 2: [0.5]}
    got = {
        r.vec_id: r.cluster
        for r in kmeans_micro(_emb_df(spark, vecs2), k=2, n_iter=1).collect()
    }
    # q: 0 -> OFF, 1 -> 1000000+OFF, 2 -> 500000+OFF: exactly midway,
    # tie resolves to cid 0
    assert got[2] == 0
    assert got == _brute_kmeans(vecs2, 2, 1)


def test_quantize_micro_range_guard(spark):
    import pytest as _pytest

    df = _emb_df(spark, {0: [3.0, 0.0]})
    with _pytest.raises(Exception, match="out of range"):
        quantize_micro(df).collect()


def test_semdedup_drops_planted_twins(spark):
    """Base vectors + scaled near-identical twins (higher ids): every
    dropped id is a twin, and twins sharing their base's cluster are
    all dropped; bases all survive."""
    rng = random.Random(93)
    base = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    vecs = dict(base)
    for i, v in base.items():
        vecs[1000 + i] = [x * 1.01 for x in v]
    out = semdedup(_emb_df(spark, vecs), k=4, n_iter=2, tau=0.99)
    rows = {r.vec_id: (r.cluster, r.keep) for r in out.collect()}
    assert len(rows) == 80
    dropped = {i for i, (_, keep) in rows.items() if not keep}
    assert dropped and all(i >= 1000 for i in dropped)
    for i in base:
        assert rows[i][1], f"base {i} must be kept"
        if rows[i][0] == rows[1000 + i][0]:
            assert not rows[1000 + i][1], f"co-clustered twin {i} kept"


def test_semdedup_no_cartesian_and_final_assignment_is_projection(spark):
    from outage_data_scraper_spark.plans import count_exchanges, formatted_plan

    rng = random.Random(94)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(20)}
    df = _emb_df(spark, vecs)
    plan = formatted_plan(semdedup(df, k=2, n_iter=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the labels themselves: assignment is a pure projection over the
    # checkpointed quantized table — zero shuffle exchanges
    assert count_exchanges(kmeans_micro(df, k=2, n_iter=1)) == 0


def test_kmeans_table_assignment_parity(spark):
    """The broadcast centroid-array assignment (max_literal_cells
    forced to 0) must produce labels identical to the literal-
    expression path across k/n_iter regimes (r8 — the literal plan
    grows O(k*dim) and was the VERDICT scale-shape finding)."""
    rng = random.Random(96)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(60)}
    df = _emb_df(spark, vecs)
    for k, n_iter in [(2, 1), (5, 2), (8, 3)]:
        lit = {
            r.vec_id: r.cluster for r in kmeans_micro(df, k=k, n_iter=n_iter).collect()
        }
        tab = {
            r.vec_id: r.cluster
            for r in kmeans_micro(
                df, k=k, n_iter=n_iter, max_literal_cells=0
            ).collect()
        }
        assert tab == lit, f"k={k} n_iter={n_iter}"


def test_semdedup_precomputed_labels_parity(spark):
    """semdedup(labels=...) must equal the self-clustering path when
    given kmeans_micro's own output."""
    rng = random.Random(95)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(30)}
    for i in range(30):
        vecs[100 + i] = [x * 1.005 for x in vecs[i]]
    df = _emb_df(spark, vecs)
    base = {
        (r.vec_id): (r.cluster, r.keep)
        for r in semdedup(df, k=3, n_iter=2, tau=0.99).collect()
    }
    labels = kmeans_micro(df, k=3, n_iter=2)
    reused = {
        (r.vec_id): (r.cluster, r.keep)
        for r in semdedup(df, k=3, n_iter=2, tau=0.99, labels=labels).collect()
    }
    assert reused == base
