"""10x scaling probe for the 5 most expensive catalog queries.

Verdict-r02 item 10: direct evidence for the "survives 100x" claim.
The driver tables stop at sf0.1, so the probe synthesizes its OWN two
input points with identical distributions (beats_spark.datagen
generate_documents / generate_embeddings / generate_token_events-style
orders) at sf0.1-equivalent counts (x1) and 10x those counts, times
each query at both (JIT-warmed at sf0.001, best-of-N, cache cleared
between runs — the bench.py protocol), and reports the per-query
scaling exponent alpha = log10(t_10x / t_x1):

  alpha ~= 1.0  -> linear in input size (what a scan/shuffle op should be)
  alpha  > 1.0  -> super-linear (quadratic would be 2.0)

Note the x1 times include fixed scheduling/plan overhead that deflates
alpha slightly; both raw times are reported so the ratio is auditable.

Usage: python scripts/probe_scale.py [--runs 3] [--out PROBE_10X.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# sf0.1-equivalent row counts (the bench scale)
X1 = {"documents": 5_000, "embeddings": 2_000, "orders": 150_000, "events": 100_000}
PROBE_QUERIES = [
    "q16_minhash_lsh",
    "q17_simhash",
    "q24_token_window_dups",
    "q26_ivf_topk",
    "q28_embedding_dups",
    # round-3 corpus ops
    "q34_repetition",
    "q37_scrub",
    "q38_quality_funnel",
    # round-4 ops (q41 consumes embeddings, q42 only o_orderkey)
    "q41_ivf_dup_pairs",
    "q42_kv",
    # event-time windowed rollups + temporal joins + percentiles
    # (consume events)
    "q43_windowed_metrics",
    "q44_sessions",
    "q46_asof_join",
    "q47_range_join",
    "q48_percentiles",
    "q49_interval_join",
    "q50_counter_rate",
    "q51_histogram",
    # log-analytics ops (q52 consumes the token table via o_orderkey)
    "q52_log_templates",
    "q53_zscore_anomalies",
    "q54_funnel",
    "q57_retention",
    "q58_rollup",
    "q59_transitions",
    # q61 consumes the full documents table; q62 the events table
    "q61_stratified_sample",
    "q62_session_paths",
    "q63_sketch_rollup",
    "q64_weighted_sample",
    # round-5: sliding windows, grouped top-k, pivot, KLL rollup
    "q45_sliding_metrics",
    "q55_topk_per_group",
    "q56_pivot_matrix",
    "q65_kll_quantile_rollup",
    # round-5 analytics/IR (q67/q70 consume documents, q68/q69 events)
    "q67_bm25",
    "q68_anomaly_mad",
    "q69_theta_overlap",
    "q70_cooccurrence",
    # round-5: iterative link-graph rank (consumes documents)
    "q74_pagerank",
    # round-5 session 3: PQ ANN (embeddings), triangles + bloom
    # (documents), CMS heavy hitters (events)
    "q79_pq_topk",
    "q80_triangles",
    "q81_bloom_decontaminate",
    "q82_cms_heavy_hitters",
    # round-5 session 3: exact-substring spans + perplexity filter
    # (token table via orders), DSIR + BPE (documents), SemDeDup
    # (embeddings)
    "q83_substring_spans",
    "q84_dsir_select",
    "q85_semdedup",
    "q86_perplexity_filter",
    "q87_bpe_encode",
    # round-5 session 4: iterative graph peeling/communities
    # (documents), normalization (documents text), z-order layout
    # (events), RRF hybrid retrieval (documents + embeddings)
    "q89_kcore",
    "q90_normalize",
    "q91_lpa_communities",
    "q92_zorder_layout",
    "q93_rrf_fusion",
    # round-5 session 4: significant terms + line dedup (documents),
    # pipeline aggs + EWMA (events), HyperBall (documents graph)
    "q94_significant_terms",
    "q95_pipeline_aggs",
    "q96_neighborhood",
    "q97_line_dedup",
    "q98_ewma",
    # round-5 session 5: geo grid + composite paging + percentile
    # ranks + Holt + auto histogram (events), rare 3-grams (documents)
    "q99_geohash_grid",
    "q100_composite_page",
    "q101_percentile_ranks",
    "q102_holt",
    "q103_auto_histogram",
    "q104_rare_terms",
    # round-5 session 5b: adjacency matrix + serial diff + top metrics
    # (events)
    "q105_adjacency_matrix",
    "q106_serial_diff",
    "q107_top_metrics",
]


def _winnow_op(spark: SparkSession, sf_dir: str):
    """q60's catalog query caps its corpus at 30 docs (the planted-
    quoter gate); the probe measures the OPERATOR uncapped over the
    full probe documents table — same parameters as the query."""
    from pyspark.sql import functions as F

    from beats_spark.training import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return dedup.winnow_dup_pairs(docs, k=4, w=4, min_shared=2, portable=True)


def _media_probe(builder: str, chain: str = "features", kind: str | None = None,
                 agg_idx: int = 8):
    """q66/q71/q72 cap their gates at 48 planted docs (the oracle's
    bounded driver-side construction), so their catalog α would only
    measure the fixed plant. The probe measures the DISTRIBUTED stage
    uncapped: replicate the 48 planted payloads over the full probe
    documents table (broadcast join on doc_id % 48) and run the real
    decode chain over every row — the regime where n payloads decode
    on n rows."""

    def run(spark: SparkSession, sf_dir: str):
        from pyspark.sql import functions as F

        from beats_spark import queries as Q
        from beats_spark.training.multimodal import (
            extract_features,
            sample_frames,
        )

        planted = spark.createDataFrame(
            getattr(Q, builder)(), "pid long, media binary"
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        media = (
            docs.withColumn("pid", F.col("doc_id") % 48)
            .join(F.broadcast(planted), "pid")
            .select(F.col("doc_id").cast("string").alias("key"), "media")
        )
        if chain == "frames":
            sampled = sample_frames(media, n_frames=2)
            media = sampled.select(
                F.concat_ws(":", "key", "frame_idx").alias("key"),
                F.col("frame").alias("media"),
            )
        if kind is not None:
            media = media.withColumn("kind", F.lit(kind))
            feats = extract_features(media, key_col="key", kind_col="kind")
        else:
            feats = extract_features(media, key_col="key")
        return feats.select(
            F.count("*").alias("n"),
            F.sum(F.element_at("feat", agg_idx)).alias("px"),
        )

    return run


def _probe_meta_op(spark: SparkSession, sf_dir: str):
    """q76's operator uncapped: header-probe every row of the probe
    corpus (48 planted assets replicated via doc_id % 48)."""
    from pyspark.sql import functions as F

    from beats_spark import queries as Q
    from beats_spark.training.multimodal import probe_media_meta

    planted = spark.createDataFrame(
        Q._probe_planted_rows(), "pid long, media binary"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    media = (
        docs.withColumn("pid", F.col("doc_id") % 48)
        .join(F.broadcast(planted), "pid")
        .select(F.col("doc_id").cast("string").alias("key"), "media")
    )
    out = probe_media_meta(media)
    return out.select(
        F.count("*").alias("n"), F.sum("duration_ms").alias("dur")
    )


EXTRA_PROBES = {
    "q60_winnow_operator": _winnow_op,
    "q76_probe_operator": _probe_meta_op,
    "q66_png_operator": _media_probe("_png_planted_rows"),
    "q71_jpeg_operator": _media_probe("_jpeg_planted_rows"),
    "q72_gif_operator": _media_probe("_gif_planted_rows", chain="frames"),
    "q73_webp_operator": _media_probe("_webp_planted_rows"),
    "q75_webp_anim_operator": _media_probe("_webp_anim_planted_rows", chain="frames"),
    "q77_audio_operator": _media_probe("_audio_planted_rows", kind="audio", agg_idx=2),
    "q78_avi_operator": _media_probe("_avi_planted_rows", chain="frames"),
}


def build_dir(spark: SparkSession, path: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from beats_spark import datagen

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    datagen.generate_documents(spark, X1["documents"] * mult).write.parquet(
        f"{path}/documents.parquet"
    )
    # A growing corpus adds topics rather than densifying the same ten:
    # n_clusters ∝ n holds cluster size (and the per-vector near-dup
    # rate) constant, the regime the 10× exponent is meant to measure.
    # A fixed 10 clusters makes the ≥τ pair count itself quadratic in n
    # (measured α=1.78 on q41 before this change) — that exponent is a
    # property of the synthetic data, not of the operators.
    datagen.generate_embeddings(
        spark, X1["embeddings"] * mult, n_clusters=10 * mult
    ).write.parquet(f"{path}/embeddings.parquet")
    # q24's loader only consumes o_orderkey (the token-table seed);
    # q37 also reads o_custkey — derive it deterministically so both
    # probe scales share the distribution
    spark.range(1, X1["orders"] * mult + 1).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") * 37 % 15000 + 1).alias("o_custkey"),
    ).write.parquet(f"{path}/orders.parquet")
    # events for q43/q44: sf0.1 distribution is 100k events / 1500 users
    # over a fixed 30-day span. Users scale ∝ n (constant per-user rate —
    # a bigger corpus is more users, not the same users densified), the
    # regime where session counts stay ∝ n; timestamps are a Knuth-mix
    # pseudo-uniform spread over the span.
    n_users = 1_500 * mult
    span_us = 30 * 86_400 * 1_000_000
    base_us = 1_704_067_200 * 1_000_000  # 2024-01-01 UTC
    types = F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")])
    spark.range(1, X1["events"] * mult + 1).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(base_us) + (F.col("id") * 2654435761) % span_us
        ).alias("ts"),
        (F.col("id") * 31 % n_users).alias("user_id"),
        F.element_at(types, (F.col("id") % 5 + 1).cast("int")).alias("event_type"),
        ((F.col("id") % 10000) / 100.0).alias("value"),
    ).write.parquet(f"{path}/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="PROBE_10X.json")
    ap.add_argument("--tmp", default="/tmp/beats_spark_probe")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated probe names: run just these and MERGE "
        "into --out (solo mini-probe mode; existing entries kept)",
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from beats_spark.queries import catalog

    cat = catalog()
    d1 = f"{args.tmp}/x1"
    d10 = f"{args.tmp}/x10"
    t0 = time.perf_counter()
    build_dir(spark, d1, 1)
    build_dir(spark, d10, 10)
    print(f"generated probe dirs in {time.perf_counter() - t0:.1f}s", flush=True)

    def timed(fn, d: str) -> float:
        t = time.perf_counter()
        fn(spark, d).collect()
        elapsed = time.perf_counter() - t
        spark.catalog.clearCache()
        return elapsed

    names = PROBE_QUERIES + list(EXTRA_PROBES)
    if args.only:
        wanted = set(args.only.split(","))
        names = [n for n in names if n in wanted]

    results: dict[str, dict] = {}
    for name in names:
        fn = EXTRA_PROBES.get(name) or cat[name]
        timed(fn, "/root/testdata/sf0.001")  # JIT/codegen warmup
        t1 = min(timed(fn, d1) for _ in range(args.runs))
        t10 = min(timed(fn, d10) for _ in range(args.runs))
        alpha = math.log10(t10 / t1)
        results[name] = {
            "t_x1_sec": round(t1, 3),
            "t_x10_sec": round(t10, 3),
            "ratio": round(t10 / t1, 2),
            "alpha": round(alpha, 3),
        }
        print(f"{name}: x1={t1:.2f}s x10={t10:.2f}s alpha={alpha:.3f}", flush=True)

    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
        out["queries"].update(results)
    else:
        out = {"x1_rows": X1, "mult": 10, "runs": args.runs, "queries": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(args.tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
