"""BPE tokenizer (q87 operator): pure-Python exactness, the
rank-order equivalence lemma the SQL oracle relies on, and the
distributed encode path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from beats_spark.training.bpe import (
    bpe_apply,
    bpe_apply_rank_order,
    bpe_encode_words,
    bpe_train,
    bpe_train_sample,
)

SF = "/root/testdata/sf0.001"


def test_bpe_train_hand_case():
    merges = bpe_train({"ab": 2, "bc": 1}, 4)
    assert merges == [("a", "b"), ("b", "c")]  # exhausts after 2
    # tie-break: equal counts -> lexicographically smallest pair
    merges = bpe_train({"xy": 1, "ab": 1}, 1)
    assert merges == [("a", "b")]


def test_bpe_apply_canonical_min_rank():
    # rank 0 applies before rank 1 even when rank 1's pair comes first
    ranks = {("s", "t"): 0, ("e", "s"): 1}
    assert bpe_apply("test", ranks) == ["t", "e", "st"]
    # all occurrences of the chosen pair merge left-to-right
    assert bpe_apply("aaaa", {("a", "a"): 0}) == ["aa", "aa"]
    assert bpe_apply("x", {}) == ["x"]


def test_rank_order_equivalence_on_trained_tables():
    """The lemma bpe_tokens_sql_ctes depends on: for TRAINING-ordERED
    merge tables, one exhaustive sweep per rank == canonical
    min-rank-present greedy. Random corpora, random words (including
    words never seen in training)."""
    rng = random.Random(42)
    alpha = "abcdefgh"
    for trial in range(30):
        vocab = {
            "".join(rng.choice(alpha) for _ in range(rng.randint(2, 10))): rng.randint(1, 9)
            for _ in range(rng.randint(3, 25))
        }
        merges = bpe_train(vocab, rng.randint(1, 30))
        ranks = {p: i for i, p in enumerate(merges)}
        probes = list(vocab) + [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
            for _ in range(40)
        ]
        for w in probes:
            assert bpe_apply(w, ranks) == bpe_apply_rank_order(w, merges), (
                trial,
                w,
                merges,
            )


def test_rank_order_differs_on_invalid_tables():
    """The lemma's boundary: a NON-training-ordered table (a merge
    whose part is produced by a later merge) breaks the equivalence —
    documenting why the oracle only accepts trained tables."""
    merges = [("x", "ab"), ("a", "b")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_apply_rank_order("xab", merges) == ["x", "ab"]
    assert bpe_apply("xab", ranks) == ["xab"]


def test_bpe_train_sample_and_distributed_encode(spark):
    """Driver-side sampled training on the real corpus, then the
    pandas-UDF encode over distinct words must match bpe_apply
    word-for-word, and round-trip: concatenated tokens == word."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe_train_sample(docs, n_merges=16, max_docs=200)
    assert 1 <= len(merges) <= 16
    # determinism: retrain yields the identical artifact
    assert bpe_train_sample(docs, n_merges=16, max_docs=200) == merges

    from beats_spark.training.text import words

    vocab = docs.select(
        F.explode(words(F.col("text"))).alias("word")
    ).distinct()
    enc = {
        r.word: list(r.bpe_tokens)
        for r in bpe_encode_words(vocab, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    assert len(enc) >= 30
    for w, toks in enc.items():
        assert toks == bpe_apply(w, ranks)
        assert "".join(toks) == w
