"""Corpus curation for training-data pipelines: benchmark
decontamination, deterministic train/val/test splits, hash sampling.

All portable arithmetic (md5 buckets, raw-string n-grams) so every op
has an exact DuckDB oracle twin, and all native Column expressions —
the 100 TB corpus scan stays in whole-stage codegen.

Scale notes:
- decontamination joins the corpus's exploded n-grams against the
  benchmark n-gram set. Benchmark suites are tiny relative to the
  corpus (10³-10⁶ docs vs 10⁹⁺), so the benchmark side is broadcast —
  the corpus is never shuffled on gram, only once on doc id for the
  per-doc hit count.
- splits/sampling are pure per-row hash arithmetic: no shuffle at all
  until the caller aggregates. The md5 bucket is salted so independent
  decisions (split vs subsample) decorrelate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.training.text import words


def word_ngrams_all(col: Column, n: int = 2) -> Column:
    """ALL word n-gram occurrences as raw space-joined strings
    (duplicates kept — repetition and frequency stats need
    multiplicity). Empty array for docs with < n words. The single
    home of the gram-slice arithmetic; the distinct variant derives
    from it."""
    ws = words(col)

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", F.slice(ws, i + 1, n))

    grams = F.transform(F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))), gram)
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_all_sql(n: int) -> str:
    """DuckDB twin of word_ngrams_all over a `ws` word-list column."""
    concat = ", ' ', ".join(f"ws[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len(ws) >= {n} THEN "
        f"list_transform(range(1, greatest(len(ws) - {n - 1}, 0) + 1), "
        f"i -> concat({concat})) ELSE CAST([] AS VARCHAR[]) END"
    )


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Distinct word n-grams (membership semantics — dedup/
    decontamination). Portable: no hash, so the DuckDB twin is the
    same list arithmetic."""
    return F.array_distinct(word_ngrams_all(col, n))


def ngram_sql(n: int) -> str:
    """DuckDB twin of word_ngrams over a `ws` word-list column (1-indexed)."""
    return f"list_distinct({ngram_all_sql(n)})"


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_count: int = 2,
    exact_doc_freq: bool = True,
) -> DataFrame:
    """Corpus-level word n-gram statistics: (g, n_occurrences, n_docs)
    for every n-gram occurring ≥ min_count times — the n-gram LM count /
    vocabulary-mining primitive (reference analog: none; Beats counts
    events, a training pipeline counts grams).

    Scale shape: explode → groupBy(g) count is map-side partially
    aggregated (hot grams combine inside each task before the shuffle);
    min_count prunes the long tail BEFORE any further join. n_docs is a
    count(DISTINCT id) expand — exact by default; pass
    exact_doc_freq=False for approx_count_distinct at corpus scale
    (the distinct expand doubles the shuffle on a 100 TB gram stream).
    """
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_ngrams_all(F.col(text_col), n)).alias("g"),
    )
    docs_agg = (
        F.count_distinct(F.col("__id"))
        if exact_doc_freq
        else F.approx_count_distinct(F.col("__id"))
    )
    return (
        ex.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            docs_agg.alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Top-k corpus n-grams by (count desc, gram asc) — deterministic
    tie-break. The global sort runs on the min_count-pruned aggregate
    (small); Spark 4's WindowGroupLimit/TakeOrderedAndProject keeps it
    a top-k, never a full sort of the gram universe."""
    return (
        ngram_counts(df, text_col, id_col, n, min_count)
        .orderBy(F.desc("n_occurrences"), F.asc("g"))
        .limit(k)
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id_col, n_hits) for every corpus doc sharing ≥1 word n-gram
    with the benchmark set — the standard pre-training decontamination
    check (drop or flag docs that contain eval-set n-grams). n_hits is
    the number of DISTINCT benchmark n-grams the doc contains.

    Docs with zero hits are absent (anti-join against this result is
    the "decontaminated corpus"). The benchmark gram set is broadcast;
    the corpus side never shuffles on gram.
    """
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    ).distinct()
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Corpus minus every doc flagged by `contamination` (left-anti on
    the id — no row explosion survives into the output plan)."""
    hits = contamination(corpus, benchmark, text_col, id_col, n)
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def split_bucket(col: Column, salt: str = "split:", mod: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, mod): md5 over the
    salted id string, first 8 hex chars as an integer. DuckDB twin:
    ('0x' || substring(md5('<salt>' || CAST(id AS VARCHAR)), 1, 8))::BIGINT % mod
    """
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, int], ...] = (("train", 96), ("val", 2), ("test", 2)),
    salt: str = "split:",
) -> DataFrame:
    """Adds a `split` column by hashing the id into percent buckets —
    stable across runs, partitioning, and engines (a doc never migrates
    between splits when the corpus grows, unlike randomSplit).
    `fractions` are integer percents summing to 100."""
    assert sum(p for _, p in fractions) == 100, "fractions must sum to 100"
    b = split_bucket(F.col(id_col), salt)
    expr = None
    hi = 0
    for name, pct in fractions[:-1]:
        hi += pct
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    percent: int = 10,
    salt: str = "sample:",
) -> DataFrame:
    """Deterministic ~percent% subsample by id hash — reproducible and
    consistent across engines/reruns (membership is a pure function of
    the id, so incremental reruns sample the same docs)."""
    return df.filter(split_bucket(F.col(id_col), salt) < percent)


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    k: int = 10,
    id_col: str = "doc_id",
    salt: str = "strat:",
) -> DataFrame:
    """Exactly min(k, n_g) rows per group — the distributed reservoir
    sample, deterministically: rank rows inside each group by a salted
    engine-portable hash of the id (uniform pseudo-order, id tiebreak)
    and keep `sample_rank` <= k. Membership is a pure function of
    (salt, id), so reruns, backfills and the DuckDB oracle pick the
    SAME rows (unlike randomSplit/reservoir state); a different salt
    is an independent redraw.

    Scale shape: the row_number() <= k form is the one Spark 4
    rewrites to WindowGroupLimit — every map task heap-selects its
    local k per group BEFORE the exchange (asserted in tests), so the
    shuffle carries <= k * |groups| rows per task, not the corpus.
    DuckDB twin of the rank hash:
      ('0x' || substring(md5('<salt>' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    with_h = df.withColumn("__h", h)
    w = Window.partitionBy(group_col).orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        with_h.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__h")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsamp:",
) -> DataFrame:
    """Independent Bernoulli keep with PER-DOC probability
    clamp(weight, 0, 1) — importance sampling by a continuous score
    (quality, dedup confidence, domain weight), the doc-level
    counterpart of `rebalance_sources`' integer per-source rates.
    Deterministic: the uniform draw is u = md5-52bit(salt||id) / 2^52 —
    a 52-bit integer is exact in an IEEE double and the divisor is a
    power of two, so u's BITS are identical in every engine and rerun;
    membership is a pure function of (salt, id), E[kept] = Σ weights.
    A different salt is an independent redraw. Pure scan-stage
    arithmetic: no shuffle, no UDF."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = h / F.lit(float(1 << 52))
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(u < w)


# --- curation funnel ------------------------------------------------------------


def funnel(
    df: DataFrame, checks: dict[str, Column], stage_col: str = "drop_stage"
) -> DataFrame:
    """First-failing-filter attribution: `checks` maps stage name →
    PASS condition, evaluated in insertion order; `stage_col` is the
    name of the first check a row fails, NULL for kept rows. The
    training-corpus analog of the reference pipeline's per-processor
    drop accounting (events.filtered in libbeat's pipeline observer):
    every dropped doc is attributed to exactly one filter, so the
    funnel's stage counts sum to the corpus.

    One chained when() Column — no row explosion, no shuffle; the
    funnel label is computed in the same scan as the signals. Checks
    must be null-safe (a NULL condition falls through to later
    stages)."""
    e = None
    for name, cond in checks.items():
        e = F.when(~cond, F.lit(name)) if e is None else e.when(~cond, F.lit(name))
    if e is None:
        return df.withColumn(stage_col, F.lit(None).cast("string"))
    return df.withColumn(stage_col, e.otherwise(F.lit(None).cast("string")))


def funnel_counts(
    df: DataFrame,
    checks: dict[str, Column],
    weight_col: str | None = None,
) -> DataFrame:
    """(stage, n_docs[, sum_weight]) per funnel stage, kept rows under
    stage='kept' — map-side-combined groupBy over the stage label."""
    staged = funnel(df, checks)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("sum_weight"))
    return (
        staged.groupBy(F.coalesce(F.col("drop_stage"), F.lit("kept")).alias("stage"))
        .agg(*aggs)
    )


# --- source/domain mixing ------------------------------------------------------


def source_mix_rates(
    df: DataFrame, source_col: str = "source", target: int | None = None
) -> DataFrame:
    """Per-source integer sampling rates (source, n_docs, rate_pct)
    that flatten the source mix toward `target` docs per source
    (default: the smallest source's count — a uniform mix).

    rate_pct = min(100, floor(100 * target / n_s)) — integer-exact, so
    the DuckDB oracle twin reproduces it bit-for-bit (the
    temperature-weighted float variant is `temperature_mix_weights`).

    Scale shape: one map-side-combined groupBy(source) over the corpus;
    the result is dimension-sized (#sources rows), so the global-window
    min and the downstream join both stay broadcast-side.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql.window import Window

    tgt = F.lit(target) if target is not None else F.min("n_docs").over(
        Window.partitionBy()
    )
    return counts.select(
        F.col(source_col),
        F.col("n_docs"),
        F.least(F.lit(100), F.floor(F.lit(100) * tgt / F.col("n_docs")))
        .cast("int")
        .alias("rate_pct"),
    )


def rebalance_sources(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target: int | None = None,
    salt: str = "mix:",
) -> DataFrame:
    """Deterministic source-mix rebalancing: subsample each source at
    its `source_mix_rates` rate via the salted id hash. Over-represented
    sources thin toward `target`; membership is a pure function of
    (id, salt), so reruns and engine twins agree row-for-row.

    The rates table is broadcast — the corpus is never shuffled; the
    filter is per-row hash arithmetic in the scan stage."""
    rates = source_mix_rates(df, source_col, target)
    return df.join(
        F.broadcast(rates.select(source_col, "rate_pct")), source_col
    ).filter(split_bucket(F.col(id_col), salt) < F.col("rate_pct")).drop("rate_pct")


def temperature_mix_weights(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-flattened sampling probabilities for a multi-source
    training mix (the multilingual-LM recipe: p_s ∝ n_s^alpha, then
    per-doc sampling rate r_s ∝ p_s / n_s, normalized so max(r) = 1).
    alpha=1 keeps natural proportions; alpha→0 flattens to uniform.

    Driver-side float math over the dimension-sized counts dict (NOT
    oracle-reproducible — use rebalance_sources for the exact path);
    feed the result to hash_sample percents or weighted samplers."""
    nonzero = {s: n for s, n in counts.items() if n > 0}
    if not nonzero:
        return {s: 0.0 for s in counts}
    w = {s: n**alpha for s, n in nonzero.items()}
    r = {s: (w[s] / nonzero[s]) for s in nonzero}
    peak = max(r.values())
    out = {s: r[s] / peak for s in nonzero}
    # empty sources contribute no documents: weight 0, never a crash
    return {s: out.get(s, 0.0) for s in counts}


# --- Bloom-filter decontamination (the 100 TB membership path) ---------------
#
# `contamination` broadcasts the exact benchmark gram SET — fine while
# the distinct grams fit a broadcast hash relation (10^6-ish). At a
# 100 TB corpus vs a large eval battery the exact set can reach tens
# of GB; a Bloom filter (Bloom, CACM 1970) compresses it to m bits at
# a false-POSITIVE rate (1 - e^(-kn/m))^k — over-removal by epsilon,
# never under-removal, which is the safe direction for
# decontamination. Hashing is Kirsch-Mitzenmacher double hashing
# (h1 + j*h2, "Less Hashing, Same Performance", ESA 2006) over
# md5-60bit values, so the bit positions — and therefore the exact
# false-positive set — are reproducible in any engine: the DuckDB
# oracle replays membership bit-for-bit.


def bloom_positions(gram: Column, m_bits: int, k: int) -> Column:
    """array<long> of k bit positions for one gram. h1/h2 are
    md5-60bit (< 2^60); h1 + (k-1)*h2 stays < 2^63 for k <= 8, so the
    arithmetic is overflow-safe in engines that trap (DuckDB) and ones
    that wrap (JVM) alike. h2 is forced odd so the probe sequence
    cycles the full power-of-two bit space."""
    assert k <= 8, "k > 8 risks int64 overflow in h1 + j*h2"
    h1 = F.conv(F.substring(F.md5(gram.cast("binary")), 1, 15), 16, 10).cast("long")
    h2 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bloom2:"), gram).cast("binary")), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .bitwiseOR(F.lit(1))
    )
    return F.array(*[(h1 + F.lit(j) * h2) % F.lit(m_bits) for j in range(k)])


def bloom_positions_sql(gram_expr: str, m_bits: int, k: int) -> str:
    """DuckDB twin of bloom_positions (a list expression)."""
    h1 = f"('0x' || substring(md5({gram_expr}), 1, 15))::BIGINT"
    h2 = f"(('0x' || substring(md5('bloom2:' || {gram_expr}), 1, 15))::BIGINT | 1)"
    terms = ", ".join(f"({h1} + {j} * {h2}) % {m_bits}" for j in range(k))
    return f"[{terms}]"


def bloom_build(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Benchmark word n-grams → a ONE-ROW DataFrame holding the filter
    as array<long> `bloom_words` (32 bits used per word — the sign bit
    never set, so the same values are exact BIGINTs in any engine).
    m_bits/4 bytes of broadcast data regardless of benchmark size."""
    assert m_bits % 32 == 0
    n_words = m_bits // 32
    pos = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
        .distinct()
        .select(F.explode(bloom_positions(F.col("g"), m_bits, k)).alias("p"))
        .distinct()
    )
    per_word = pos.groupBy(F.shiftright("p", 5).alias("wid")).agg(
        F.expr("bit_or(shiftleft(1L, cast(p % 32 as int)))").alias("bits")
    )
    return per_word.agg(
        F.map_from_entries(F.collect_list(F.struct("wid", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda i: F.coalesce(F.try_element_at("wm", i), F.lit(0).cast("long")),
        ).alias("bloom_words")
    )


def bloom_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """(id_col, n_hits) for corpus docs with >= 1 distinct word n-gram
    whose k filter bits are all set — `contamination` semantics with a
    constant-size broadcast. The probe is one whole-stage scan: per
    doc, filter its distinct-gram array through the bit test; no
    explode, no join key, no shuffle until the caller aggregates.
    False positives are a deterministic function of (benchmark, salt)
    and are reproduced exactly by the SQL twin.

    Known trade (plan-read): Catalyst pushes the n_hits >= 1 filter
    into the broadcast-join condition, so the gram+md5 chain evaluates
    twice per row — 2x codegen'd scan CPU. The alternative (a
    repartition/persist barrier) adds a full-corpus exchange, which
    loses at 100 TB (the q42 put_fields lesson: zero extra shuffle
    wins)."""
    filt = bloom_build(benchmark, text_col, n, m_bits, k)

    def bit_set(p: Column) -> Column:
        word = F.element_at("bloom_words", F.shiftright(p, 5).cast("int") + 1)
        return (
            F.call_function("shiftright", word, (p % 32).cast("int"))
            .bitwiseAND(F.lit(1))
            == 1
        )

    def gram_hits(g: Column) -> Column:
        return F.forall(bloom_positions(g, m_bits, k), bit_set)

    return (
        corpus.join(F.broadcast(filt))
        .select(
            F.col(id_col),
            F.size(F.filter(word_ngrams(F.col(text_col), n), gram_hits)).alias(
                "n_hits"
            ),
        )
        .filter(F.col("n_hits") >= 1)
    )


# --- DSIR importance selection ------------------------------------------------


def dsir_bucket(gram: Column, n_buckets: int) -> Column:
    """Hashed-feature bucket for one gram occurrence: md5-60bit of the
    salted gram mod n_buckets — portable (DuckDB twin below), and the
    same 60-bit-safe construction as bloom_positions."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dsir:"), gram).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def dsir_bucket_sql(gram_expr: str, n_buckets: int) -> str:
    """DuckDB twin of dsir_bucket."""
    return (
        f"(('0x' || substring(md5('dsir:' || {gram_expr}), 1, 15))::BIGINT"
        f" % {n_buckets})"
    )


def _dsir_grams(col: Column) -> Column:
    """DSIR's feature stream: every unigram AND bigram occurrence
    (multiplicity kept — the feature vector counts occurrences)."""
    return F.concat(word_ngrams_all(col, 1), word_ngrams_all(col, 2))


def dsir_scores(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by the log importance ratio of a hashed-n-gram bag-of-
    features model fit on a small TARGET corpus vs the raw corpus.
    Per-doc log weight = sum over gram occurrences of
    ln p_target[b] - ln p_raw[b] with add-one smoothing over the
    n_buckets hashed features.

    Scale shape: the two distribution fits reduce each corpus scan to
    an n_buckets-row counter table (map-side combined groupBy on the
    bucket — the CMS/q82 shape), so the model is a <= n_buckets-row
    broadcast no matter how large either corpus is. Scoring is ONE
    raw-corpus scan: explode grams -> bucket hash (codegen) ->
    broadcast-join the weight table -> per-doc sum riding the scan's
    partitioning (map-side partial agg). Nothing row-proportional
    ever shuffles except (id, score) pairs.

    Determinism: per-bucket weights collapse the four ln() terms to
    ONE rounded micro-int (x1e6) before any per-doc summation, so doc
    scores are exact int64 arithmetic; ln IEEE parity across engines
    on the count inputs is the q67/q48 recipe, pinned by the 3-scale
    gate. Returns (id_col, n_grams, score_micro).
    """
    grams = _dsir_grams(F.col(text_col))
    b = dsir_bucket(F.col("gram"), n_buckets)
    r_ex = df.select(F.explode(grams).alias("gram")).select(b.alias("bucket"))
    t_ex = target.select(F.explode(grams).alias("gram")).select(b.alias("bucket"))
    rc = r_ex.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tc = t_ex.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    totals = rc.agg(F.sum("rc").alias("R")).crossJoin(
        tc.agg(F.sum("tc").alias("T"))
    )
    # target buckets are a subset of raw buckets (target ⊆ feature
    # space actually hit by ANY corpus; docs can only score on buckets
    # their own grams occupy, which raw counts by construction)
    w = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log(F.coalesce(F.col("tc"), F.lit(0)) + 1)
                    - F.log(F.col("T") + n_buckets)
                    - F.log(F.col("rc") + 1)
                    + F.log(F.col("R") + n_buckets)
                )
                * 1e6
            )
            .cast("long")
            .alias("w_micro"),
        )
    )
    scored = (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(id_col, b.alias("bucket"))
        .join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w_micro").alias("score_micro"),
        )
    )
    return scored


def dsir_topk(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-k raw docs by DSIR importance (deterministic id tiebreak).
    orderBy().limit(k) — TakeOrderedAndProject, never a global-window
    single partition (the q55 global-top-k lesson)."""
    s = dsir_scores(df, target, text_col, id_col, n_buckets)
    return s.orderBy(F.col("score_micro").desc(), F.col(id_col).asc()).limit(k)
