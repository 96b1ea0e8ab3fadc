"""Sequence packing: pre-tokenized documents → fixed-length training
sequences (the canonical LLM training-prep step over the BASELINE
input table (doc_id, tokens:array<int>, n_tok, source)).

Deterministic "concatenate in doc_id order, cut every L tokens"
packing — the layout a data loader reproduces exactly given the same
corpus, independent of Spark partitioning, task order, or cluster
size. (Greedy bin-packing variants trade that determinism away; this
is the reproducible one.)

Scale shape — the global prefix-sum (each doc's start offset in the
token stream) is the only part that naively wants a total order, and a
single-partition window would serialize a 10¹²-token corpus through
one task. Instead the classic two-phase scan:

  1. repartitionByRange on doc_id → partitions hold disjoint,
     ordered doc_id ranges;
  2. per-partition token totals → collected to the driver (ONE row
     per partition, a few KB at any scale) → cumulative bases;
  3. within-partition window cumsum (parallel across partitions)
     + broadcast-joined base = exact global offset.

After that everything is embarrassingly parallel: posexplode tokens,
seq_id = global_pos DIV L, one shuffle on the dense/uniform seq_id
(skew-free by construction) to assemble or aggregate sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PART_COL = "__scan_part__"


def token_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    n_col: str = "n_tok",
    num_parts: int | None = None,
) -> DataFrame:
    """Adds `tok_offset`: the document's global start position in the
    doc_id-ordered token stream (exclusive prefix sum of n_col).
    Requires unique ids (doc_id is a key). Two-phase distributed scan —
    no single-task total-order window."""
    spark = df.sparkSession
    p = num_parts or spark.sparkContext.defaultParallelism
    # persist: the totals job and the final job must see the SAME
    # range boundaries / partition ids (they do even on recompute —
    # the range sampler is seeded deterministically — but persisting
    # also avoids scanning the input twice)
    ranged = (
        df.repartitionByRange(p, F.col(id_col))
        .withColumn(PART_COL, F.spark_partition_id())
        .persist()
    )
    # phase 1+2: per-partition totals (≤ p rows) → cumulative bases
    totals = {
        r[PART_COL]: r["t"]
        for r in ranged.groupBy(PART_COL)
        .agg(F.sum(n_col).alias("t"))
        .collect()
    }
    bases, acc = [], 0
    for part in sorted(totals):
        bases.append((part, acc))
        acc += totals[part]
    base_df = spark.createDataFrame(
        bases, f"{PART_COL} int, __base__ long"
    )
    # phase 3: parallel within-partition exclusive cumsum + base
    w = (
        Window.partitionBy(PART_COL)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(base_df), PART_COL)
        .withColumn(
            "tok_offset",
            (
                F.coalesce(F.sum(n_col).over(w), F.lit(0)) + F.col("__base__")
            ).cast("long"),
        )
        .drop(PART_COL, "__base__")
    )


def explode_positions(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    n_col: str = "n_tok",
) -> DataFrame:
    """(id_col, seq_id, pos_in_seq, tok) for every token: global
    position = tok_offset + index, seq_id = gpos DIV seq_len."""
    off = token_offsets(df, id_col, n_col)
    ex = off.select(
        F.col(id_col),
        F.col("tok_offset"),
        F.posexplode(tok_col).alias("pos", "tok"),
    ).withColumn("gpos", F.col("tok_offset") + F.col("pos"))
    return ex.select(
        F.col(id_col),
        F.expr(f"gpos DIV {int(seq_len)}").alias("seq_id"),
        (F.col("gpos") % seq_len).alias("pos_in_seq"),
        F.col("tok"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    n_col: str = "n_tok",
) -> DataFrame:
    """(seq_id, tokens, n_tokens, n_docs): fixed-length training
    sequences (last one may be partial). Token order inside a sequence
    is reconstructed with array_sort over (pos_in_seq, tok) structs —
    aggregation-order independent."""
    ex = explode_positions(df, seq_len, id_col, tok_col, n_col)
    return (
        ex.groupBy("seq_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos_in_seq", "tok"))
                ),
                lambda s: s["tok"],
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
    )


def pack_stats(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    n_col: str = "n_tok",
) -> DataFrame:
    """Per-sequence integrity stats (oracle-friendly): token count,
    contributing docs, token sum, and a position-weighted sum that
    pins every token to its slot (catches ordering/offset bugs a bare
    sum would miss)."""
    ex = explode_positions(df, seq_len, id_col, tok_col, n_col)
    return (
        ex.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.sum("tok").alias("sum_tok"),
            F.sum(F.col("tok") * (F.col("pos_in_seq") + 1)).alias(
                "weighted_tok"
            ),
        )
        .orderBy("seq_id")
    )


def vocab_stats(
    df: DataFrame,
    tokens_col: str = "tokens",
    k: int = 20,
) -> DataFrame:
    """Token vocabulary histogram with cumulative coverage: the top-k
    token ids by frequency, each with its count and the cumulative
    share of the total token mass (integer ppm) — the vocab-coverage /
    tokenizer-audit primitive over the pre-tokenized training table.

    Scale shape: posexplode-free explode → groupBy(token) with
    map-side partial counts (the hot tokens combine inside each task);
    the ordered cumulative window runs on the AGGREGATED histogram
    (vocab-sized, thousands of rows at any corpus scale), never on the
    token stream. Total mass rides along as a window-free broadcastable
    scalar via a second aggregate of the same histogram.

    Ties break by token id asc — deterministic, engine-portable.
    """
    hist = (
        df.select(F.explode(F.col(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = hist.agg(F.sum("n").alias("__total"))
    w = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token"))))
        .filter(F.col("rank") <= k)
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        F.col("rank").cast("long").alias("rank"),
        "token",
        "n",
        F.round(F.col("cum").cast("double") * 1e6 / F.col("__total").cast("double"))
        .cast("long")
        .alias("coverage_ppm"),
    )


def unigram_nll(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document unigram-LM negative log likelihood — the
    perplexity quality filter (CCNet, Wenzek et al. 2020: docs whose
    LM perplexity is an outlier get down-weighted or cut; the unigram
    fit is the deterministic, oracle-reproducible stand-in for the
    KenLM 5-gram and keeps the identical pipeline shape).

    Scale shape: the LM fit is one map-side-combined token count
    (≤ |vocab| rows out — a broadcast no matter the corpus size, the
    q84 DSIR model shape); scoring is ONE corpus scan: explode →
    broadcast-join token nll weights → per-doc integer sums riding
    the scan partitioning. Per-token nll collapses to a rounded
    micro-int (×1e6) before summation, so doc scores are exact int64
    arithmetic; ln IEEE parity across engines is the q67/q84 recipe.

    Returns (id_col, n_tok, nll_micro_sum, mean_nll_micro) where
    mean uses integer `div` (both corpora are positive, so trunc ==
    floor in both engines).
    """
    ex = df.select(
        F.col(id_col), *(F.col(c) for c in keep_cols), F.explode(tokens_col).alias("t")
    )
    cnt = ex.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("N"))
    w = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "t",
            F.round((F.log(F.col("N")) - F.log(F.col("c"))) * 1e6)
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        ex.join(F.broadcast(w), "t")
        .groupBy(id_col, *keep_cols)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("nll_micro").alias("nll_micro_sum"),
        )
        .withColumn(
            "mean_nll_micro", F.expr("nll_micro_sum div n_tok")
        )
    )
