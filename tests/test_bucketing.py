"""Storage bucketing: co-bucketed joins plan with zero exchanges."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from beats_spark.bucketing import cobucketed_join, write_bucketed


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    docs = spark.range(0, 2_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("score"),
    )
    meta = spark.range(0, 2_000, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("lang"),
    )
    sfx = uuid.uuid4().hex[:8]
    lt, rt = f"bkt_docs_{sfx}", f"bkt_meta_{sfx}"
    write_bucketed(docs, lt, ["doc_id"], 8, path=str(tmp_path / "l"))
    write_bucketed(meta, rt, ["doc_id"], 8, path=str(tmp_path / "r"))
    try:
        joined = cobucketed_join(spark, lt, rt, on=["doc_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point: both scans expose the bucket spec as their
        # output partitioning, so the SMJ needs no shuffle AND (sorted
        # buckets) no sort
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # correctness unchanged
        assert joined.count() == 1_000
        s = joined.agg(F.sum("score"), F.sum("lang")).first()
        want = (
            sum(i % 97 for i in range(0, 2000, 2)),
            sum(i % 13 for i in range(0, 2000, 2)),
        )
        assert (s[0], s[1]) == want

        # differential: the same join on plain (non-bucketed) reads
        # DOES exchange both sides
        plain = docs.hint("merge").join(meta, "doc_id")
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert pplan.count("Exchange") >= 2, pplan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_groupby_reuses_layout(spark, tmp_path):
    """Aggregation on the bucket key also skips its exchange."""
    df = spark.range(0, 1_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    t = f"bkt_agg_{uuid.uuid4().hex[:8]}"
    write_bucketed(df, t, ["k"], 4, path=str(tmp_path / "t"))
    try:
        agg = spark.table(t).groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 50
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
