"""Local stand-in for the driver's correctness compare: run a Spark
query and its DuckDB oracle on the same sf dir, compare row multisets
(order-insensitive, column-name-sorted, floats rounded)."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _key(t: tuple):
    return tuple((v is None, str(type(v)), str(v)) for v in t)


def spark_rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_key
    )


def duck_rows(con, sql: str) -> list[tuple]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(
        (tuple(_norm(row[i]) for i in order) for row in cur.fetchall()), key=_key
    )


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> None:
    sr = spark_rows(fn(spark, sf_dir))
    con = duck_connection(sf_dir)
    dr = duck_rows(con, sql)
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs oracle {len(dr)}"
    mism = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[0]}"
