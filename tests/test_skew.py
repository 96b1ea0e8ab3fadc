"""Salted skew mitigation (skew.py): result equivalence + partition
spread of the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.datagen import load_token_events
from beats_spark.skew import repartition_salted, salted_count

SF = "/root/testdata/sf0.001"


def test_salted_count_equals_plain_groupby(spark):
    df = load_token_events(spark, SF)
    salted = {
        (r.source,): r.events for r in salted_count(df, ["source"]).collect()
    }
    plain = {
        (r.source,): r.n
        for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert salted == plain


def test_hot_key_spreads_over_partitions(spark):
    """src-0 holds ~40% of rows; salted repartition must spread it over
    many partitions instead of one."""
    df = load_token_events(spark, SF)
    out = repartition_salted(df, 16, "source", buckets=16)
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("source") == "src-0")
        .groupBy("pid")
        .count()
        .collect()
    )
    n_parts = len(per_part)
    total = sum(r["count"] for r in per_part)
    biggest = max(r["count"] for r in per_part)
    assert n_parts >= 8  # hot key fanned out
    assert biggest < total * 0.5  # no partition holds the hot key alone


def test_plain_repartition_would_concentrate(spark):
    """Control: repartitioning on raw source puts the hot key in ONE
    partition — the failure mode salting prevents."""
    df = load_token_events(spark, SF)
    out = df.repartition(16, F.col("source"))
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("source") == "src-0")
        .select("pid")
        .distinct()
        .count()
    )
    assert per_part == 1


def test_salted_join_matches_plain_join(spark):
    """Same rows/values as the unsalted join; join keys carry the salt
    (the hot key fans over `buckets` reducers)."""
    from beats_spark.skew import salted_join

    # one hot key: 80% of facts hit dim key 0
    fact = spark.range(0, 2_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") % 11).alias("v"),
    )
    dim = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    plain = fact.join(dim, "k")
    salted_ = salted_join(fact, dim, "k", buckets=8)
    assert salted_.count() == plain.count() == 2_000
    a = plain.agg(F.sum("v"), F.sum("w")).first()
    b = salted_.agg(F.sum("v"), F.sum("w")).first()
    assert (a[0], a[1]) == (b[0], b[1])
    assert set(salted_.columns) == set(plain.columns)
    plan = salted_._jdf.queryExecution().executedPlan().toString()
    assert "__salt__" in plan
