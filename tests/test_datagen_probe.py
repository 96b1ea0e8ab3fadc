"""Scale-probe generators (datagen.generate_documents / _embeddings).

These back scripts/probe_scale.py (the 10x scaling-exponent probe):
the driver's documents/embeddings tables stop at sf0.1, so the probe
synthesizes both of its input points itself. The tests pin the
properties the probe's validity rests on: determinism, schema parity
with the driver tables, and the constant planted-dup rate that keeps
dedup/near-dup outputs linear in n.
"""

import math

from pyspark.sql import functions as F

from beats_spark import datagen


def test_generate_documents_deterministic_and_shaped(spark):
    d1 = datagen.generate_documents(spark, 500)
    d2 = datagen.generate_documents(spark, 500)
    assert d1.exceptAll(d2).count() == 0 and d2.exceptAll(d1).count() == 0
    assert [f.name for f in d1.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    rows = d1.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("text").alias("n_texts"),
        F.min("n_chars").alias("lo"),
        F.max("n_chars").alias("hi"),
    ).collect()[0]
    assert rows.n == 500
    # every 25th doc repeats the previous content key -> 4% dups
    assert rows.n_texts == 500 - 500 // 25
    assert rows.lo > 20 and rows.hi < 700


def test_generate_documents_dup_rate_is_scale_invariant(spark):
    # the property the 10x probe's linearity claim rests on
    for n in (250, 2500):
        d = datagen.generate_documents(spark, n)
        n_dups = n - d.select("text").distinct().count()
        assert n_dups == n // 25


def test_generate_embeddings_clusters_and_planted_dups(spark):
    e = datagen.generate_embeddings(spark, 500)
    assert [f.name for f in e.schema.fields] == ["vec_id", "embedding", "label"]
    rows = {r.vec_id: r.embedding for r in e.filter(F.col("vec_id") < 50).collect()}
    assert len(rows[0]) == 64

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    # planted dup: id 24 copies id 23 (content key AND label)
    assert cos(rows[23], rows[24]) > 0.999999
    # same-label vectors share a centroid: clearly positive cosine
    assert cos(rows[0], rows[10]) > 0.4
    # different-label vectors are near-orthogonal on average
    cross = [cos(rows[i], rows[j]) for i in range(5) for j in range(5, 10)]
    assert abs(sum(cross) / len(cross)) < 0.3
    # deterministic
    e2 = datagen.generate_embeddings(spark, 500)
    assert e.exceptAll(e2).count() == 0
