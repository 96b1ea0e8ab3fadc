"""Duplicate-cluster assignment: connected components over near-dup
candidate pairs, Spark-native.

Pair generators (exact hash groups, n-gram Jaccard, MinHash/SimHash
LSH, embedding LSH) emit *edges*; real dedup needs the transitive
closure — if A~B and B~C, all three are one duplicate cluster and a
single representative survives. The reference pipeline has no such
operator (Beats is row-at-a-time); this is part of the LLM-training-
data surface built on the same engine.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature), the standard shuffle-bounded formulation:

  large-star(u): attach every neighbor v > u to m = min(Γ(u) ∪ {u})
  small-star(u): attach every neighbor v ≤ u (and u itself) to m

Each half-round is one groupBy (min per node) plus one co-partitioned
join back on the same key — two shuffles — and the edge set provably
converges to per-component stars rooted at the component minimum in
O(log² n) rounds (≈2-3 in practice for dedup graphs, whose components
are near-cliques). No collect_set anywhere: a 10⁸-member component
never materializes a neighbor list on one executor, the per-node state
is a single min. Driver-side loop iterates over ROUNDS (a scalar
convergence probe per round), never over rows; each round's edge set
is persisted and the previous one unpersisted so lineage stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _half_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star (large=False) pass.

    `edges` is an undirected edge list (a, b), a != b, canonical or
    not. Returns the rewritten directed edge set, distinct, without
    self-loops.
    """
    nbrs = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    if not large:
        # small-star operates on the ≤ side only; the min must be
        # computed over that same side (plus self)
        nbrs = nbrs.filter(F.col("v") < F.col("u"))
    mins = nbrs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    joined = nbrs.join(mins, "u")
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
    else:
        out = joined.select(F.col("v").alias("a"), F.col("m").alias("b")).unionAll(
            mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
        )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in `pairs`, where
    cluster_id = the minimum node id of its connected component.
    Nodes with no edges (singletons) are not in the graph and are not
    returned — callers keep them as their own representatives.

    Convergence is detected with a deterministic scalar probe per
    round (edge count + sum of a canonical pair hash); identical probe
    two rounds running ⇒ the edge set is a fixpoint (stars), at which
    point every edge is (member, root).
    """
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("a"),
            F.col(id_b).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def probe(e: DataFrame) -> tuple[int, int]:
        # bit_xor, not sum: order-independent, can't overflow under
        # ANSI mode (edges are distinct, so nothing self-cancels)
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(
                    F.xxhash64(F.least("a", "b"), F.greatest("a", "b"))
                ),
                F.lit(0),
            ).alias("h"),
        ).first()
        return (r["n"], r["h"])

    # localCheckpoint, not persist: persist truncates re-EXECUTION but
    # the logical plan still accretes every prior round, and Catalyst
    # analysis cost grows super-linearly with plan depth — the loop
    # must cut lineage each round. (On a real cluster with executor
    # loss concerns, swap for reliable .checkpoint() to HDFS; the
    # round structure is identical.)
    edges = edges.localCheckpoint(eager=True)
    last = probe(edges)
    for _ in range(max_rounds):
        nxt = _half_round(
            _half_round(edges, large=True), large=False
        ).localCheckpoint(eager=True)
        sig = probe(nxt)
        edges = nxt
        if sig == last:
            break
        last = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # fixpoint edges are (member, root); roots map to themselves
    labels = (
        edges.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
        .unionAll(
            edges.select(
                F.col("b").alias("id"), F.col("b").alias("cluster_id")
            )
        )
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return labels


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment + size: (id, cluster_id, n_members).
    The survivor of each cluster is its cluster_id (min id) — the same
    keep-the-minimum rule exact_dedup uses."""
    from pyspark.sql.window import Window

    labels = connected_components(pairs, id_a, id_b)
    return labels.withColumn(
        "n_members",
        F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
    )
