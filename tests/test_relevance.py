"""significant_terms (relevance.py): planted-vocabulary ranking,
JLH integer arithmetic against a pure-Python twin, and the
TakeOrderedAndProject global-top-k plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.relevance import significant_terms

SCALE = 10**6


def _corpus(spark):
    rows = []
    # 20 background docs over a shared vocabulary
    for i in range(20):
        rows.append((i, f"alpha beta gamma w{i % 5}", "bg"))
    # 4 foreground docs: share 'alpha', add exclusive 'zebra quokka'
    for i in range(4):
        rows.append((100 + i, "alpha zebra quokka", "fg"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _py_jlh(docs, scale=SCALE, min_fg=2):
    fg_docs = [d for d in docs if d[2] == "fg"]
    F_, B = len(fg_docs), len(docs)
    counts: dict[str, list[int]] = {}
    for _, text, src in docs:
        for t in set(text.split()):
            c = counts.setdefault(t, [0, 0])
            c[1] += 1
            if src == "fg":
                c[0] += 1
    out = []
    for t, (fg, bg) in counts.items():
        lift = fg * B - bg * F_
        if fg >= min_fg and lift > 0:
            out.append((t, fg, bg, (scale * fg * lift) // (F_ * F_ * bg)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out


def test_significant_terms_planted_vocabulary(spark):
    got = significant_terms(
        _corpus(spark), F.col("source") == "fg", k=10
    ).collect()
    want = _py_jlh([(r[0], r[1], r[2]) for r in _corpus(spark).collect()])
    assert [(r.term, r.fg_docs, r.bg_docs, r.score_scaled) for r in got] == want
    # the exclusive planted terms outrank everything, tie alphabetical
    assert [r.term for r in got[:2]] == ["quokka", "zebra"]
    assert got[0].rank == 1 and got[1].rank == 2
    # a term in every doc (alpha) has zero lift: fgPct == bgPct only
    # when fg/F == bg/B; here alpha is in all docs → lift 0 → excluded
    assert "alpha" not in {r.term for r in got}


def test_significant_terms_validation_and_plan(spark):
    with pytest.raises(ValueError, match="empty foreground"):
        significant_terms(_corpus(spark), F.lit(False))
    out = significant_terms(_corpus(spark), F.col("source") == "fg", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
