"""Byte-pair-encoding tokenization — the training-data pipeline's
tokenizer stage (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; the GPT-2 merge-rank formulation).

Three pieces, mirroring how real pipelines split the work:

- bpe_train / bpe_train_sample: learn a merge table. Training is a
  frequency argmax loop — inherently sequential — so like
  train_centroids it runs driver-side on a bounded deterministic
  sample (word-count dicts are vocabulary-sized, not corpus-sized).
  The merge table is then an ARTIFACT the distributed encode consumes,
  exactly like a production tokenizer.json.
- bpe_apply: canonical greedy encode (repeatedly merge the lowest-rank
  pair present). Pure Python, used inside the pandas UDF and as the
  pytest oracle.
- bpe_encode_words: the distributed encode — an Arrow-batched pandas
  UDF over a WORD column. The intended scale shape (q87) encodes each
  DISTINCT word once and joins the (word → tokens) map back to the
  occurrence stream: UDF cost is vocabulary-bounded, the corpus itself
  never enters Python. At web scale the map outgrows a broadcast and
  the join degrades to SMJ on the word key — still a vocabulary-sized
  build side against one corpus scan.

Rank-order equivalence (what makes a SQL twin possible): for a merge
table in TRAINING order, applying each merge exhaustively in rank
order yields the same tokens as the canonical min-rank-present loop.
Merging rank i replaces (u,v) with uv; any pair containing uv was
necessarily trained LATER than i, so no pair of rank < i can newly
appear and the single forward sweep per rank is exhaustive. (For an
arbitrary, non-training-ordered table the two differ — e.g. merges
[(x,ab),(a,b)] on "xab" — but such tables cannot arise from training,
where every merge's parts already exist when it is learned.) The
equivalence is property-tested in tests/test_bpe.py; bpe_stage_sql
emits one DuckDB list_reduce sweep per rank for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bpe_train(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency dict. Deterministic:
    best pair = (max summed count, then lexicographically smallest
    pair) — the tie-break makes the merge table a pure function of the
    counts, independent of dict ordering."""
    seqs: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in sorted(word_counts.items()) if len(w) >= 2
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for toks, c in seqs:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for toks, _ in seqs:
            i = 0
            while i < len(toks) - 1:
                if toks[i] == a and toks[i + 1] == b:
                    toks[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_train_sample(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    max_docs: int = 512,
    salt: str = "bpe:",
) -> list[tuple[str, str]]:
    """Train a merge table on a bounded deterministic document sample
    (the train_centroids pattern: the sequential argmax loop runs
    driver-side; only a vocabulary-sized word-count dict is ever
    collected). Sample membership is a pure function of (salt, id),
    so retrains on the same corpus yield the same table."""
    from beats_spark.training.curate import stratified_sample
    from beats_spark.training.text import words

    sample = (
        stratified_sample(
            df.select(F.lit(1).alias("__g__"), text_col, "doc_id"),
            group_col="__g__",
            k=max_docs,
            salt=salt,
        )
        .select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return bpe_train({r.w: r.c for r in sample}, n_merges)


def bpe_apply(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical greedy BPE encode: repeatedly merge every occurrence
    of the lowest-rank pair present (left-to-right within a rank)."""
    toks = list(word)
    while len(toks) >= 2:
        best_rank, best = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (toks[i], toks[i + 1])
        if best is None:
            break
        a, b = best
        i = 0
        while i < len(toks) - 1:
            if toks[i] == a and toks[i + 1] == b:
                toks[i : i + 2] = [a + b]
            else:
                i += 1
    return toks


def bpe_apply_rank_order(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Rank-order exhaustive application — one forward sweep per merge.
    Equal to bpe_apply for training-ordered tables (module docstring
    lemma); this is the exact algorithm the SQL twin runs."""
    toks = list(word)
    for a, b in merges:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == a and t == b:
                out[-1] = a + b
            else:
                out.append(t)
        toks = out
    return toks


def bpe_encode_words(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Arrow-batched pandas UDF encoding a word column with a fixed
    merge table (broadcast inside the closure — merge tables are KBs).
    Per-batch memoization: corpora repeat words heavily, so each
    distinct word in a batch is encoded once."""
    import pandas as pd  # noqa: F401 (worker-side)

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(ws):  # type: ignore[no-untyped-def]
        cache: dict[str, list[str]] = {}

        def one(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = bpe_apply(w, ranks)
            return got

        return ws.map(one)

    return df.withColumn(out_col, enc(F.col(word_col)))


def bpe_stage_sql(col: str, a: str, b: str) -> str:
    """DuckDB expression applying ONE merge (a,b) -> ab exhaustively
    to a VARCHAR[] column via a single forward list_reduce sweep
    (accumulator = the rebuilt list; elements wrapped as singleton
    lists so the fold is list-typed with a list_prepend initial, the
    repo's standard fold-with-init idiom)."""
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    qab = (a + b).replace("'", "''")
    return (
        f"list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
        f"list_transform({col}, t -> [t])), "
        f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '{qa}' "
        f"AND x[1] = '{qb}' "
        f"THEN list_append(acc[1:len(acc) - 1], '{qab}') "
        f"ELSE list_append(acc, x[1]) END)"
    )


def bpe_tokens_sql_ctes(
    words_cte: str, merges: list[tuple[str, str]]
) -> str:
    """Chained CTE stages t0..tN turning `{words_cte}`(word VARCHAR)
    into tN(word, toks VARCHAR[]) — one bpe_stage_sql sweep per rank."""
    parts = [
        f"t0 AS (SELECT word, list_transform(range(1, length(word) + 1), "
        f"i -> word[i]) AS toks FROM {words_cte})"
    ]
    for i, (a, b) in enumerate(merges, start=1):
        parts.append(
            f"t{i} AS (SELECT word, {bpe_stage_sql('toks', a, b)} AS toks "
            f"FROM t{i - 1})"
        )
    return ",\n".join(parts)
