"""Sequence packing vs a pure-Python oracle: exact token layout,
offsets, partial final sequence, partition-count invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.training import pack


def _make(spark, docs, parts=None):
    df = spark.createDataFrame(
        [(f"doc-{i:04d}", toks, len(toks)) for i, toks in docs],
        "doc_id string, tokens array<int>, n_tok int",
    )
    return df.repartition(parts) if parts else df


def _py_pack(docs, L):
    stream = []
    for _, toks in sorted(docs, key=lambda d: f"doc-{d[0]:04d}"):
        stream.extend(toks)
    seqs = {}
    for g, tok in enumerate(stream):
        seqs.setdefault(g // L, []).append(tok)
    return seqs


def test_offsets_are_exclusive_prefix_sums(spark):
    docs = [(3, [1, 2]), (1, [5]), (2, [7, 8, 9])]
    out = pack.token_offsets(_make(spark, docs)).collect()
    got = {r["doc_id"]: r["tok_offset"] for r in out}
    assert got == {"doc-0001": 0, "doc-0002": 1, "doc-0003": 4}


def test_pack_sequences_exact_layout(spark):
    docs = [(i, [(i * 10 + j) % 97 for j in range(i % 5 + 1)]) for i in range(20)]
    L = 7
    rows = pack.pack_sequences(_make(spark, docs), L).collect()
    got = {r["seq_id"]: r["tokens"] for r in rows}
    assert got == _py_pack(docs, L)
    # every sequence full except possibly the last
    n = max(got)
    for s, toks in got.items():
        assert len(toks) == (L if s < n else len(toks))
        assert 1 <= len(toks) <= L


def test_partition_count_invariance(spark):
    """The two-phase scan must give identical output at any
    parallelism (the N vs 4N cluster-size criterion in miniature)."""
    docs = [(i, [i % 11, (i * 3) % 11, (i * 7) % 11]) for i in range(50)]
    a = pack.pack_stats(_make(spark, docs, parts=1), 16).collect()
    b = pack.pack_stats(_make(spark, docs, parts=7), 16).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_pack_stats_match_python(spark):
    docs = [(i, [(i * 13 + j * 5) % 50 for j in range(i % 4 + 2)]) for i in range(30)]
    L = 10
    seqs = _py_pack(docs, L)
    expect = {
        s: (
            len(toks),
            sum(toks),
            sum(t * (p + 1) for p, t in enumerate(toks)),
        )
        for s, toks in seqs.items()
    }
    rows = pack.pack_stats(_make(spark, docs), L).collect()
    got = {r["seq_id"]: (r["n_tokens"], r["sum_tok"], r["weighted_tok"]) for r in rows}
    assert got == expect
    # n_docs: doc spanning a boundary counts in both sequences
    nd = {r["seq_id"]: r["n_docs"] for r in rows}
    assert all(v >= 1 for v in nd.values())


def test_vocab_stats_planted(spark):
    from beats_spark.training import pack

    df = spark.createDataFrame(
        [(1, [1, 1, 2]), (2, [2, 1]), (3, [7])],
        "doc_id long, tokens array<int>",
    )
    got = [
        (r["rank"], r["token"], r["n"], r["coverage_ppm"])
        for r in pack.vocab_stats(df, k=2).orderBy("rank").collect()
    ]
    assert got == [(1, 1, 3, 500000), (2, 2, 2, 833333)]
    # tie at n=1: token id asc breaks it deterministically
    all3 = pack.vocab_stats(df, k=3).orderBy("rank").collect()
    assert (all3[2]["token"], all3[2]["coverage_ppm"]) == (7, 1000000)
