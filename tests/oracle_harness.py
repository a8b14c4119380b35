"""Local replica of the driver's DuckDB correctness harness: run the Spark
query and the oracle SQL side-by-side, compare row count + column set +
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pandas as pd

from rel_db_to_graph_spark.sources.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact: any engine difference must surface
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(_canon(v) for v in row))
    out.sort()
    return out


def compare(spark_df, sql: str, sf_dir: str) -> None:
    sp = spark_df.toPandas()
    con = duck_con(sf_dir)
    du = con.execute(sql).df()
    con.close()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
    assert len(sp) == len(du), f"row counts differ: spark={len(sp)} duck={len(du)}"
    rs, rd = canonical_rows(sp), canonical_rows(du)
    mismatches = [(a, b) for a, b in zip(rs, rd) if a != b]
    assert not mismatches, (
        f"{len(mismatches)}/{len(rs)} rows differ; first 3: {mismatches[:3]}")
