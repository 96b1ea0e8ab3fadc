"""Curation ops (decontamination / splits / sampling) vs pure-Python
oracles; catalog twins q30-q32 cover the DuckDB side."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from beats_spark.training import curate


def _py_bucket(x, salt="split:", mod=100):
    return int(hashlib.md5(f"{salt}{x}".encode()).hexdigest()[:8], 16) % mod


def _py_ngrams(text: str, n: int) -> set[str]:
    ws = [w for w in text.split() if w]
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_word_ngrams_matches_python(spark):
    rows = [
        (0, "a b c d e f"),
        (1, "one two"),          # shorter than n -> empty
        (2, "  x \t y  z w v "),  # whitespace edges
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = df.select(
        "doc_id", curate.word_ngrams(F.col("text"), 3).alias("g")
    ).collect()
    got = {r["doc_id"]: set(r["g"]) for r in out}
    assert got == {i: _py_ngrams(t, 3) for i, t in rows}


def test_contamination_and_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words here entirely now"),
            (3, "prefix alpha beta gamma delta suffix"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in curate.contamination(corpus, bench, n=5).collect()
    }
    # doc 1 contains both benchmark 5-grams' worth? bench has 1 distinct
    # 5-gram; doc 1 contains it, doc 3 does not (different window), doc 2 clean
    assert hits == {1: 1}
    clean = sorted(
        r["doc_id"] for r in curate.decontaminate(corpus, bench, n=5).collect()
    )
    assert clean == [2, 3]


def test_assign_split_matches_python_md5(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = curate.assign_split(df).collect()

    def expect(i):
        b = _py_bucket(i)
        return "train" if b < 96 else ("val" if b < 98 else "test")

    for r in out:
        assert r["split"] == expect(r["doc_id"]), r
    # all three splits non-empty at n=300
    assert {r["split"] for r in out} == {"train", "val", "test"}


def test_split_stable_under_corpus_growth(spark):
    small = curate.assign_split(
        spark.range(0, 100).withColumnRenamed("id", "doc_id")
    )
    big = curate.assign_split(
        spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    )
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(b[i] == s[i] for i in s)  # no doc migrates when corpus grows


def test_hash_sample_deterministic_and_decorrelated(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = sorted(r["doc_id"] for r in curate.hash_sample(df, percent=10).collect())
    s2 = sorted(r["doc_id"] for r in curate.hash_sample(df, percent=10).collect())
    assert s1 == s2
    assert 120 <= len(s1) <= 280  # ~10% of 2000
    # different salt -> different membership (decorrelated decisions)
    s3 = sorted(
        r["doc_id"]
        for r in curate.hash_sample(df, percent=10, salt="other:").collect()
    )
    assert s3 != s1
    # nested property: a 5% sample with the same salt is a subset of 10%
    s5 = set(
        r["doc_id"] for r in curate.hash_sample(df, percent=5).collect()
    )
    assert s5 <= set(s1)


# --- round 3: n-gram counts / source mixing ----------------------------------


def _py_all_ngrams(text: str, n: int) -> list[str]:
    ws = [w for w in text.split() if w]
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def test_ngram_counts_matches_python(spark):
    rows = [
        (0, "a b a b a b"),      # "a b" x3, "b a" x2
        (1, "a b c"),
        (2, "x"),                # shorter than n -> nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["g"]: (r["n_occurrences"], r["n_docs"])
        for r in curate.ngram_counts(df, n=2, min_count=1).collect()
    }
    from collections import Counter

    occ = Counter()
    docs = {}
    for i, t in rows:
        grams = _py_all_ngrams(t, 2)
        occ.update(grams)
        for g in set(grams):
            docs[g] = docs.get(g, 0) + 1
    assert got == {g: (c, docs[g]) for g, c in occ.items()}
    # min_count prunes the tail
    top = curate.top_ngrams(df, n=2, k=1, min_count=2).collect()
    assert [(r["g"], r["n_occurrences"]) for r in top] == [("a b", 4)]


def test_rebalance_sources_matches_python(spark):
    # 3 sources with 30/12/5 docs -> target=5, rates 16/41/100
    rows = [(i, f"s{0 if i < 30 else (1 if i < 42 else 2)}") for i in range(47)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {
        r["source"]: (r["n_docs"], r["rate_pct"])
        for r in curate.source_mix_rates(df).collect()
    }
    assert rates == {"s0": (30, 16), "s1": (12, 41), "s2": (5, 100)}
    kept = sorted(r["doc_id"] for r in curate.rebalance_sources(df).collect())
    expect = sorted(
        i
        for i, s in rows
        if _py_bucket(i, "mix:") < {"s0": 16, "s1": 41, "s2": 100}[s]
    )
    assert kept == expect
    # explicit target overrides the min
    r100 = {
        r["source"]: r["rate_pct"]
        for r in curate.source_mix_rates(df, target=12).collect()
    }
    assert r100 == {"s0": 40, "s1": 100, "s2": 100}


def test_temperature_mix_weights():
    counts = {"web": 1000, "books": 10, "code": 100}
    # alpha=1 -> natural proportions -> every doc sampled at rate 1
    assert curate.temperature_mix_weights(counts, alpha=1.0) == {
        "web": 1.0,
        "books": 1.0,
        "code": 1.0,
    }
    # alpha=0 -> uniform mix -> rare source at full rate, big thinned 100x
    w0 = curate.temperature_mix_weights(counts, alpha=0.0)
    assert w0["books"] == 1.0
    assert abs(w0["web"] - 0.01) < 1e-12
    assert abs(w0["code"] - 0.1) < 1e-12
    # alpha=0.5 is between, monotone in source size
    wh = curate.temperature_mix_weights(counts, alpha=0.5)
    assert wh["books"] == 1.0 and w0["web"] < wh["web"] < 1.0
    assert curate.temperature_mix_weights({}) == {}


def test_funnel_first_failing_attribution(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 50, 5), (3, 50, 99), (4, 50, 50)],
        ["id", "a", "b"],
    )
    checks = {"a_small": F.col("a") >= 20, "b_big": F.col("b") <= 60}
    got = {
        r["id"]: r["drop_stage"] for r in curate.funnel(df, checks).collect()
    }
    # row 1 fails BOTH but attributes to the FIRST check only
    assert got == {1: "a_small", 2: None, 3: "b_big", 4: None}
    counts = {
        r["stage"]: (r["n_docs"], r["sum_weight"])
        for r in curate.funnel_counts(df, checks, weight_col="b").collect()
    }
    assert counts == {"a_small": (1, 5), "b_big": (1, 99), "kept": (2, 55)}
    assert sum(n for n, _ in counts.values()) == df.count()


def test_temperature_mix_weights_zero_count_source():
    w = curate.temperature_mix_weights({"web": 1000, "empty": 0}, alpha=0.5)
    assert w["empty"] == 0.0 and w["web"] == 1.0


def test_stratified_sample_exact_counts_and_determinism(spark):
    """Exactly min(k, n_g) per group; membership is a pure function of
    (salt, id) — Spark matches a pure-Python rank over the same md5
    hash, a rerun is identical, and a different salt redraws."""
    rows = [(i, f"g{i % 3}") for i in range(40)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = curate.stratified_sample(df, group_col="source", k=5).collect()
    by_g: dict = {}
    for r in got:
        by_g.setdefault(r.source, []).append((r.sample_rank, r.doc_id))
    assert {g: len(v) for g, v in by_g.items()} == {
        "g0": 5, "g1": 5, "g2": 5, "tiny": 1
    }

    def h(i):
        return int(hashlib.md5(f"strat:{i}".encode()).hexdigest()[:15], 16)

    for g, members in by_g.items():
        ids = [i for i, src in rows if src == g]
        want = sorted(ids, key=lambda i: (h(i), i))[:5]
        assert [i for _, i in sorted(members)] == want
    again = curate.stratified_sample(df, group_col="source", k=5).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in got)
    other = curate.stratified_sample(df, group_col="source", k=5, salt="x:").collect()
    assert sorted(r.doc_id for r in other) != sorted(r.doc_id for r in got)


def test_stratified_sample_plan_window_group_limit(spark):
    """The map-side local-top-k rewrite must fire: shuffle carries
    <= k*|groups| rows per task, not the corpus."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("source")
    )
    plan = (
        curate.stratified_sample(df, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_weighted_sample_matches_python_and_is_calibrated(spark):
    """Membership matches the pure-Python hash arithmetic row-for-row,
    a rerun is identical, another salt redraws, and the kept count is
    within binomial noise of sum(weights)."""
    import math

    n = 4_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), ((F.col("id") % 100) / 100.0).alias("w")
    )
    kept = sorted(r.doc_id for r in curate.weighted_sample(df, "w").collect())

    def u(i):
        return int(hashlib.md5(f"wsamp:{i}".encode()).hexdigest()[:13], 16) / float(
            1 << 52
        )

    want = sorted(i for i in range(n) if u(i) < (i % 100) / 100.0)
    assert kept == want
    again = sorted(r.doc_id for r in curate.weighted_sample(df, "w").collect())
    assert again == kept
    other = sorted(
        r.doc_id for r in curate.weighted_sample(df, "w", salt="x:").collect()
    )
    assert other != kept
    ew = sum((i % 100) / 100.0 for i in range(n))
    sd = math.sqrt(sum((i % 100) / 100.0 * (1 - (i % 100) / 100.0) for i in range(n)))
    assert abs(len(kept) - ew) < 4 * sd


def test_bloom_contamination_superset_of_exact(spark):
    # corpus doc 1 quotes a benchmark passage; doc 2 is clean
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "noise alpha beta gamma delta epsilon more noise words here"),
            (2, "totally unrelated text with many distinct words present okay"),
        ],
        ["doc_id", "text"],
    )
    exact = {
        r.doc_id: r.n_hits
        for r in curate.contamination(corpus, bench, n=5).collect()
    }
    bloom = {
        r.doc_id: r.n_hits
        for r in curate.bloom_contamination(
            corpus, bench, n=5, m_bits=1 << 14, k=4
        ).collect()
    }
    # Bloom can only over-report (false positives), never miss
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n
    assert exact == {1: 1}
    # at this m/n the filter is far from saturation: no false positive
    assert bloom == {1: 1}


def test_bloom_false_positives_match_pure_python_twin(spark):
    # tiny m forces collisions; the exact false-positive set must be
    # the deterministic function of the md5 double-hash arithmetic
    # that a pure-Python replay predicts
    def positions(gram: str, m: int, k: int) -> list[int]:
        h1 = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        h2 = int(hashlib.md5(f"bloom2:{gram}".encode()).hexdigest()[:15], 16) | 1
        return [(h1 + j * h2) % m for j in range(k)]

    def grams(text: str, n: int = 5) -> list[str]:
        ws = text.split()
        return sorted({" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)})

    bench_txt = "one two three four five six seven eight nine ten"
    docs = [
        (1, "completely different content with plenty of words to probe"),
        (2, "another unrelated document probing the tiny filter for hits"),
        (3, "one two three four five quoted verbatim from the benchmark"),
    ]
    m, k = 64, 3
    bits = set()
    for g in grams(bench_txt):
        bits.update(positions(g, m, k))
    expect = {}
    for d, t in docs:
        n = sum(1 for g in grams(t) if all(p in bits for p in positions(g, m, k)))
        if n:
            expect[d] = n
    bench = spark.createDataFrame([(9, bench_txt)], ["doc_id", "text"])
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: r.n_hits
        for r in curate.bloom_contamination(
            corpus, bench, n=5, m_bits=m, k=k
        ).collect()
    }
    assert out == expect
    assert 3 in out  # the true contamination is always flagged


def test_dsir_scores_match_pure_python_twin(spark):
    """dsir_scores (q84 operator) vs an independent Python
    implementation of the hashed-ngram importance model: identical
    bucket hash (md5-60bit), add-one smoothing, per-bucket 1e6
    rounding, per-doc integer sums. Also the behavioral property:
    raw docs written in the target's vocabulary outrank docs from a
    disjoint vocabulary."""
    import hashlib
    import math

    from beats_spark.training.curate import dsir_scores

    B = 64
    raw = [
        ("r1", "cat sat on the mat with a cat"),
        ("r2", "dog ran over the hill fast dog dog"),
        ("r3", "cat purred near the warm mat"),
        ("r4", "stock market index fell two points"),
    ]
    tgt = [
        ("t1", "the cat and the mat"),
        ("t2", "a cat sat on a mat"),
    ]

    def bucket(g):
        h = int(hashlib.md5(("dsir:" + g).encode()).hexdigest()[:15], 16)
        return h % B

    def grams(text):
        ws = [w for w in text.strip().split() if w]
        return ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]

    rc, tc = {}, {}
    for _, t in raw:
        for g in grams(t):
            rc[bucket(g)] = rc.get(bucket(g), 0) + 1
    for _, t in tgt:
        for g in grams(t):
            tc[bucket(g)] = tc.get(bucket(g), 0) + 1
    R, T = sum(rc.values()), sum(tc.values())
    w = {
        b: int(
            round(
                (
                    math.log(tc.get(b, 0) + 1)
                    - math.log(T + B)
                    - math.log(rc[b] + 1)
                    + math.log(R + B)
                )
                * 1e6
            )
        )
        for b in rc
    }
    exp = {
        did: (len(grams(t)), sum(w[bucket(g)] for g in grams(t)))
        for did, t in raw
    }

    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_grams, r.score_micro)
        for r in dsir_scores(raw_df, tgt_df, n_buckets=B).collect()
    }
    assert got == exp
    # cat-vocabulary docs outrank dog/finance docs toward the cat target
    scores = {d: s for d, (_, s) in got.items()}
    assert min(scores["r1"], scores["r3"]) > max(scores["r2"], scores["r4"])
