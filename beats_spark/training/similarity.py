"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products via
  F.zip_with + F.aggregate (JVM-side); broadcast the query set.
- LSH-bucketed ANN (random hyperplanes): sign-bit sketch → bucket
  join — the scale path: candidate generation shuffles (docs × tables)
  rows instead of the full cross product.
- IVF-style coarse quantization: assign each vector to its nearest of
  K seed centroids (deterministic seeds = hashed unit vectors), probe
  only matching cells.

All deterministic (seeded hyperplanes derived from xxhash-free integer
mixing so reruns and tests are stable).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors for every query vector.

    Broadcast the (small) query set against the (huge) corpus; rank
    with a window per query. Corpus scan is one pass, no corpus
    shuffle — only the (n_queries × corpus) scores shuffle for top-k,
    and those are 3-column rows.
    """
    from pyspark.sql.window import Window

    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = df.alias("c").join(F.broadcast(q)).filter(
        F.col("query_id") != F.col(id_col)
    )
    sim = cosine(F.col("q_vec"), F.col(vec_col))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(sim, round_to).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG + Box-Muller)."""
    state = seed

    def nxt() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (state >> 11) / float(1 << 52)  # U(0,1)

    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range((dim + 1) // 2):
            u1, u2 = max(nxt(), 1e-12), nxt()
            r = math.sqrt(-2 * math.log(u1))
            v.extend([r * math.cos(2 * math.pi * u2), r * math.sin(2 * math.pi * u2)])
        planes.append(v[:dim])
    return planes


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit sketch: bit i = (v · plane_i) >= 0. Returns long."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing a sign
    sketch with the query in ANY of `n_tables` hyperplane tables, then
    exact cosine re-rank of candidates only."""
    from pyspark.sql.window import Window

    tables = [
        _hyperplanes(dim, n_planes, seed=7 + 1000 * t) for t in range(n_tables)
    ]

    def bucketed(frame: DataFrame, prefix: str) -> DataFrame:
        cols = [
            F.concat(F.lit(f"{t}:"), signature_bits(F.col(vec_col), planes)).alias(
                f"__b{t}__"
            )
            for t, planes in enumerate(tables)
        ]
        return frame.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.explode(F.array(*cols)).alias("bucket"),
        )

    cand = (
        bucketed(df, "c")
        .join(bucketed(query_df, "q"), "bucket")
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", "q_vec", "c_vec")
        .dropDuplicates(["q_id", "c_id"])
    )
    sim = cosine(F.col("q_vec"), F.col("c_vec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        cand.select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 14,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold) via LSH
    candidate generation + exact verification — the embedding analog of
    MinHash dedup."""
    tables = [
        _hyperplanes(dim, n_planes, seed=11 + 1000 * t) for t in range(n_tables)
    ]
    cols = [
        F.concat(F.lit(f"{t}:"), signature_bits(F.col(vec_col), planes)).alias(
            f"__b{t}__"
        )
        for t, planes in enumerate(tables)
    ]
    # persist: both sides of the pair self-join read this — without it
    # the hyperplane projections compute twice
    buckets = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(F.array(*cols)).alias("bucket"),
    ).persist()
    a = buckets.select("bucket", F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = buckets.select("bucket", F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
