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


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Distinct word n-grams as raw space-joined strings (portable —
    no hash, so the DuckDB twin is a list_transform over the same
    split). Empty array for docs with < n words."""
    ws = words(col)

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", F.slice(ws, i + 1, n))

    grams = F.transform(F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))), gram)
    return F.array_distinct(
        F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def ngram_sql(n: int) -> str:
    """DuckDB twin of word_ngrams over a `ws` word-list column (1-indexed)."""
    concat = ", ' ', ".join(f"ws[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len(ws) - {n - 1}, 0) + 1), "
        f"i -> concat({concat})))"
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
