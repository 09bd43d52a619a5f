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


def test_chunk_windows_hand_cases(spark):
    """Fixed-stride law: short doc → one chunk; exact window → one;
    one past → two with ragged tail; empty doc emits nothing."""
    from outage_data_scraper_spark.operators.packing import chunk_windows

    sized = spark.createDataFrame(
        [(0, 10), (1, 64), (2, 65), (3, 200), (4, 0)],
        "doc_id long, n long",
    )
    got = {}
    for r in chunk_windows(sized, "n", window_len=64, stride=48).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.start, r.length))
    for v in got.values():
        v.sort()
    assert got[0] == [(0, 0, 10)]
    assert got[1] == [(0, 0, 64)]
    assert got[2] == [(0, 0, 64), (1, 48, 17)]
    # n=200: ceil((200-64)/48) = 3 extra chunks; last covers to 200
    assert got[3] == [(0, 0, 64), (1, 48, 64), (2, 96, 64), (3, 144, 56)]
    assert 4 not in got


def test_chunk_windows_coverage_and_overlap_law(spark):
    """Every token is covered; consecutive chunks overlap by exactly
    window_len − stride except at the ragged tail; last chunk ends at n."""
    from outage_data_scraper_spark.operators.packing import chunk_windows

    sized = spark.createDataFrame(
        [(i, 1 + (i * 37) % 500) for i in range(50)], "doc_id long, n long"
    )
    rows = chunk_windows(sized, "n", window_len=96, stride=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    ns = {i: 1 + (i * 37) % 500 for i in range(50)}
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        assert rs[0].start == 0
        for a, b in zip(rs, rs[1:]):
            assert b.start == a.start + 64
        last = rs[-1]
        assert last.start + last.length == ns[d]
        assert all(0 < r.length <= 96 for r in rs)


def test_chunk_windows_rejects_stride_over_window(spark):
    """stride > window_len would mint a trailing chunk whose start
    exceeds n (silent negative length — r8 advisor finding): must
    raise, not emit."""
    import pytest

    from outage_data_scraper_spark.operators.packing import chunk_windows

    sized = spark.createDataFrame([(1, 111)], "doc_id long, n long")
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(sized, "n", window_len=10, stride=100)
