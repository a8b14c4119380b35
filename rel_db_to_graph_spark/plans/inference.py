"""G1 — node/edge schema inference (`determine_nodes_and_edges`).

Re-expresses convert_to_graph.py:60-139 as a lazy DataFrame plan over the
registry (sources/catalog.py):

  * table with exactly 1 PK column  -> node table   (C:73-84)
  * table with exactly 2 PK columns -> junction -> edge type (C:106-115)
  * FK column whose SOURCE table is a node table -> edge type (C:86-104;
    the edge's source endpoint is the source table's single PK, so FKs on
    junction tables — e.g. lineitem.l_suppkey — do NOT form FK edges,
    exactly as the reference's inner join at C:99-104 drops them)
  * junction PK columns are resolved to node tables by *normalized* PK
    name equality (C:119-120 matches raw names; our star schema prefixes
    every column with a 1-2 letter table tag, so we strip it:
    l_orderkey ~ o_orderkey ~ 'orderkey')
  * relation naming: 'has' + Ucfirst(normalized ref column minus 'key'),
    the analog of `'has' + target_id.replace('Id','')` at C:181 —
    o_custkey -> hasCust, l_partkey -> hasPart.
  * junction source/target = PK ordinal seq 0/1 — the explicit-order
    replacement for the reference's row-parity pairing (C:125-134, W1).

Everything here is metadata-scale (dozens of rows): Catalyst constant-folds
it, and joins against it downstream are broadcast.

At 100 TB none of this touches data — inference reads only the registry, so
the same plan works unchanged against a lakehouse catalog with thousands of
tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rel_db_to_graph_spark.sources.catalog import foreign_keys, primary_keys

# strip the 1-2 letter table prefix: 'l_orderkey' -> 'orderkey'.
_NORM_RE = "^[a-z]{1,2}_"


def norm_key(col: Column) -> Column:
    return F.regexp_replace(col, _NORM_RE, "")


def relation_name(ref_col_norm: Column) -> Column:
    """'custkey' -> 'hasCust' (reference naming rule, C:181)."""
    stem = F.regexp_replace(ref_col_norm, "key$", "")
    return F.concat(
        F.lit("has"),
        F.upper(stem.substr(F.lit(1), F.lit(1))),
        stem.substr(F.lit(2), F.length(stem)),
    )


def table_kinds(spark: SparkSession) -> DataFrame:
    """PK-arity classification (A1): (table_name, pk_cols, kind)."""
    pks = primary_keys(spark)
    return (
        pks.groupBy("table_name")
        .agg(F.count("*").alias("pk_cols"))
        .withColumn(
            "kind",
            F.when(F.col("pk_cols") == 1, F.lit("node"))
            .when(F.col("pk_cols") == 2, F.lit("junction"))
            .otherwise(F.lit("other")),
        )
    )


def node_tables(spark: SparkSession) -> DataFrame:
    """(table_name, key) for every single-PK table."""
    pks = primary_keys(spark)
    singles = (
        pks.groupBy("table_name").agg(F.count("*").alias("n"))
        .filter(F.col("n") == 1).select("table_name")
    )
    return pks.join(singles, "table_name", "inner").select("table_name", "key")


def junction_tables(spark: SparkSession) -> DataFrame:
    """(table_name, key, seq) rows of every two-PK table."""
    pks = primary_keys(spark)
    doubles = (
        pks.groupBy("table_name").agg(F.count("*").alias("n"))
        .filter(F.col("n") == 2).select("table_name")
    )
    return pks.join(doubles, "table_name", "inner").select("table_name", "key", "seq")


def edge_catalog(spark: SparkSession) -> DataFrame:
    """Full edge-type inference: one row per heterogeneous edge type.

    Returns (src_table, relation, dst_table, pair_table, src_col, dst_col)
    where pair_table is the physical table holding both endpoint columns
    (the FK's source table, or the junction table).
    """
    nodes = node_tables(spark)
    fks = foreign_keys(spark)

    # FK edges (J1): FK rows whose source table is a node table; the edge
    # source endpoint is that table's own PK.
    fk_edges = (
        fks.join(
            nodes.withColumnsRenamed({"table_name": "src_table", "key": "src_pk"}),
            fks.source_table == F.col("src_table"), "inner")
        .select(
            F.col("src_table"),
            relation_name(norm_key(F.col("from_col"))).alias("relation"),
            F.col("target_table").alias("dst_table"),
            F.col("source_table").alias("pair_table"),
            F.col("src_pk").alias("src_col"),
            F.col("from_col").alias("dst_col"),
        )
    )

    # Junction edges (J2/J3/W1): pair the seq-0 and seq-1 PK columns, then
    # resolve each to its node table by normalized-name equality.
    jt = junction_tables(spark)
    src_side = jt.filter(F.col("seq") == 0).select(
        F.col("table_name").alias("pair_table"), F.col("key").alias("src_col"))
    dst_side = jt.filter(F.col("seq") == 1).select(
        F.col("table_name").alias("pair_table"), F.col("key").alias("dst_col"))
    nodes_norm = nodes.select(
        F.col("table_name"), norm_key(F.col("key")).alias("norm_pk"))
    jn_edges = (
        src_side.join(dst_side, "pair_table")
        .join(nodes_norm.withColumnRenamed("table_name", "src_table"),
              norm_key(F.col("src_col")) == F.col("norm_pk"), "inner")
        .drop("norm_pk")
        .join(nodes_norm.withColumnRenamed("table_name", "dst_table"),
              norm_key(F.col("dst_col")) == F.col("norm_pk"), "inner")
        .drop("norm_pk")
        .select(
            "src_table",
            relation_name(norm_key(F.col("dst_col"))).alias("relation"),
            "dst_table", "pair_table", "src_col", "dst_col",
        )
    )

    # U2 union-by-name (columns are aligned here; the reference needed
    # `how='diagonal'` because its frames differed, C:137)
    return fk_edges.unionByName(jn_edges)


# ---- driver-side (pure python) twins ------------------------------------
# The graph builder consults the catalog dozens of times; metadata is a
# handful of registry rows, so re-running Spark jobs for it wastes whole
# seconds of job-scheduling overhead per build. These compute the SAME
# classification from the same constants; test_inference pins them equal
# to the DataFrame versions (which remain the oracle-checked queries).

def _norm_py(key: str) -> str:
    import re
    return re.sub(_NORM_RE, "", key)


def _relation_py(ref_col_norm: str) -> str:
    import re
    stem = re.sub("key$", "", ref_col_norm)
    return "has" + stem[:1].upper() + stem[1:]


def node_tables_py() -> list[tuple[str, str]]:
    from collections import Counter

    from rel_db_to_graph_spark.sources.catalog import PRIMARY_KEYS
    counts = Counter(t for t, _k, _s in PRIMARY_KEYS)
    return [(t, k) for t, k, _s in PRIMARY_KEYS if counts[t] == 1]


def edge_catalog_py() -> list[dict]:
    from collections import Counter

    from rel_db_to_graph_spark.sources.catalog import FOREIGN_KEYS, PRIMARY_KEYS
    nodes = dict(node_tables_py())
    out = []
    for src, from_col, dst, _to in FOREIGN_KEYS:
        if src not in nodes:
            continue                      # FKs on junction tables: no edge
        out.append({"src_table": src,
                    "relation": _relation_py(_norm_py(from_col)),
                    "dst_table": dst, "pair_table": src,
                    "src_col": nodes[src], "dst_col": from_col})
    counts = Counter(t for t, _k, _s in PRIMARY_KEYS)
    by_norm = {_norm_py(k): t for t, k in nodes.items()}
    junctions: dict[str, dict[int, str]] = {}
    for t, k, s in PRIMARY_KEYS:
        if counts[t] == 2:
            junctions.setdefault(t, {})[s] = k
    for j, cols in junctions.items():
        src_col, dst_col = cols[0], cols[1]
        src_t = by_norm.get(_norm_py(src_col))
        dst_t = by_norm.get(_norm_py(dst_col))
        if src_t and dst_t:
            out.append({"src_table": src_t,
                        "relation": _relation_py(_norm_py(dst_col)),
                        "dst_table": dst_t, "pair_table": j,
                        "src_col": src_col, "dst_col": dst_col})
    return out
