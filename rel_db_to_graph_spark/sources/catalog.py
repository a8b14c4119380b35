"""Schema registry — the Spark replacement for SQLite PRAGMA catalog scans.

The reference discovers tables from ``sqlite_master`` (convert_to_graph.py:62),
PKs from ``PRAGMA table_info`` (convert_to_graph.py:66-71) and FKs from
``PRAGMA foreign_key_list`` (convert_to_graph.py:87-94, 147-152). Parquet
carries no constraint metadata, so the engine takes an explicit registry with
the same shape (SURVEY.md §2 S3-S5). The registry is a handful of rows —
constant-folded / broadcast everywhere it is joined.

``seq`` on primary_keys is the PK column ordinal: it replaces the reference's
*implicit row-order* pairing of junction source/target columns
(convert_to_graph.py:125 "first record per junction as source") with an
explicit, deterministic ordering — mandatory on Spark, where row order is
never guaranteed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: every driver-testdata table (TESTDATA.md)
TABLES: list[str] = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: (table_name, key, seq) — seq = PK ordinal (FIXTURES.md §2)
PRIMARY_KEYS: list[tuple[str, str, int]] = [
    ("region", "r_regionkey", 0),
    ("nation", "n_nationkey", 0),
    ("customer", "c_custkey", 0),
    ("supplier", "s_suppkey", 0),
    ("part", "p_partkey", 0),
    ("orders", "o_orderkey", 0),
    ("lineitem", "l_orderkey", 0),
    ("lineitem", "l_partkey", 1),
    ("events", "event_id", 0),
    ("documents", "doc_id", 0),
    ("embeddings", "vec_id", 0),
]

#: (source_table, from_col, target_table, to_col) — FIXTURES.md §2
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def tables(spark: SparkSession) -> DataFrame:
    """Catalog scan (S3) as a DataFrame: one row per table."""
    return spark.createDataFrame([(t,) for t in TABLES],
                                 "table_name string").coalesce(1)


def primary_keys(spark: SparkSession) -> DataFrame:
    """PK metadata scan (S4): (table_name, key, seq).

    coalesce(1): a dozen metadata rows spread over default-parallelism
    partitions turns every downstream registry join into 32-task
    shuffle stages — single-partition metadata keeps those jobs sub-ms.
    """
    return spark.createDataFrame(
        PRIMARY_KEYS, "table_name string, key string, seq int").coalesce(1)


def foreign_keys(spark: SparkSession) -> DataFrame:
    """FK metadata scan (S5): (source_table, from_col, target_table, to_col)."""
    return spark.createDataFrame(
        FOREIGN_KEYS,
        "source_table string, from_col string, target_table string, to_col string"
    ).coalesce(1)


#: known testdata schemas (FIXTURES.md §1). Supplying the schema skips the
#: footer-sampling inference job per read — pennies locally, real money at
#: 100 TB where inference samples many files. events.ts is a native
#: parquet timestamp[us]; declaring anything else silently coerces
#: (timestamp->bigint casts to SECONDS) — tests/test_testdata_schema.py
#: pins the real dtypes so a testdata regeneration fails loudly.
TABLE_SCHEMAS: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": ("c_custkey bigint, c_name string, c_nationkey int, "
                 "c_acctbal double, c_mktsegment string"),
    "supplier": "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part": ("p_partkey bigint, p_name string, p_brand string, p_type string, "
             "p_size int, p_retailprice double"),
    "orders": ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
    "lineitem": ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
                 "l_linenumber int, l_quantity double, l_extendedprice double, "
                 "l_discount double, l_tax double, l_returnflag string, "
                 "l_linestatus string, l_shipdate timestamp"),
    "events": ("event_id bigint, ts timestamp, user_id bigint, event_type string, "
               "value double, props string"),
    "documents": ("doc_id bigint, text string, lang string, source string, "
                  "n_chars bigint"),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Self-defend against externally-created sessions (the driver hands
    us a SparkSession we didn't configure): ns-timestamp parquet support
    and a fixed UTC render zone — both runtime-settable SQL confs, both
    required for oracle-identical results."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Full table scan (S6) — lazy parquet read; Catalyst prunes/pushes."""
    ensure_session_confs(spark)
    reader = spark.read
    if name in TABLE_SCHEMAS:
        reader = reader.schema(TABLE_SCHEMAS[name])
    return reader.parquet(f"{sf_dir}/{name}.parquet")


def _values(rows: list[tuple]) -> str:
    def lit(v) -> str:
        return f"'{v}'" if isinstance(v, str) else str(v)
    return ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)


def registry_cte() -> str:
    """The registry as a SQL WITH-clause prefix for the DuckDB oracle, so
    every registry-driven query has a bit-identical constant catalog on
    both engines."""
    return (
        "WITH primary_keys(table_name, key, seq) AS (VALUES "
        + _values(PRIMARY_KEYS)
        + "), foreign_keys(source_table, from_col, target_table, to_col) AS (VALUES "
        + _values(FOREIGN_KEYS)
        + "), catalog_tables(table_name) AS (VALUES "
        + _values([(t,) for t in TABLES])
        + ")"
    )
