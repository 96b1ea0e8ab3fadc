"""Reciprocal-rank fusion (relevance.rrf_fuse): pure-Python twin,
single-list membership semantics, determinism, and the
WindowGroupLimit plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.relevance import rrf_fuse

SCALE = 10**12


def _py_rrf(rankings, k=60, topk=10):
    scores: dict[tuple[int, int], list[int]] = {}
    for r in rankings:
        for q, d, rank in r:
            scores.setdefault((q, d), []).append(SCALE // (k + rank))
    fused = [
        (q, d, len(cs), sum(cs)) for (q, d), cs in scores.items()
    ]
    out = []
    for q in sorted({q for q, _, _, _ in fused}):
        rows = sorted(
            [f for f in fused if f[0] == q], key=lambda f: (-f[3], f[1])
        )
        for i, f in enumerate(rows[:topk], 1):
            out.append((q, f[1], f[2], f[3], i))
    return out


def _spark_rrf(spark, rankings, **kw):
    dfs = [
        spark.createDataFrame(r, "query_id long, doc_id long, rank int")
        for r in rankings
    ]
    got = rrf_fuse(dfs, **kw).orderBy("query_id", "rank").collect()
    return [
        (r.query_id, r.doc_id, r.n_lists, r.score_scaled, r.rank) for r in got
    ]


def test_rrf_matches_python_twin(spark):
    import random

    rng = random.Random(93)
    for trial in range(3):
        rankings = []
        for _ in range(3):
            lst = []
            for q in range(2):
                docs = rng.sample(range(30), 12)
                lst += [(q, d, i + 1) for i, d in enumerate(docs)]
            rankings.append(lst)
        assert _spark_rrf(spark, rankings) == _py_rrf(rankings), trial


def test_rrf_single_list_docs_still_fuse(spark):
    # a doc found by only one ranker keeps a score (n_lists=1) and an
    # agreed doc at worse ranks beats it — the calibration-free win
    a = [(0, 1, 1), (0, 2, 2)]
    b = [(0, 3, 1), (0, 2, 2)]
    got = _spark_rrf(spark, [a, b], topk=3)
    by_doc = {d: (n, s) for _, d, n, s, _ in got}
    assert by_doc[2][0] == 2 and by_doc[1][0] == 1 and by_doc[3][0] == 1
    # doc 2: 2/(60+2) shares beat doc 1/doc 3's single 1/(60+1)
    assert got[0][1] == 2
    assert by_doc[2][1] == 2 * (SCALE // 62)
    assert by_doc[1][1] == SCALE // 61


def test_rrf_validation_and_plan(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="bad k_rrf"):
        rrf_fuse(
            [spark.createDataFrame([(0, 0, 1)], "query_id long, doc_id long, rank int")],
            topk=0,
        )
    df = spark.createDataFrame(
        [(q, d, d + 1) for q in range(2) for d in range(20)],
        "query_id long, doc_id long, rank int",
    )
    fused = rrf_fuse([df, df], topk=5)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert fused.filter(F.col("rank") > 5).count() == 0
