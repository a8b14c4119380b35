"""SQL API surface — register the star schema (and optionally a built
graph) as temp views so every capability is reachable through
``spark.sql`` as well as the DataFrame API.

The reference's users interact through SQL strings against SQLite
(convert_to_graph.py:62-173, inference.py:85-92); this module gives a
migrating user the same ergonomics on Spark: ``register_views`` then
``spark.sql("SELECT ... FROM lineitem JOIN part ...")`` — same Catalyst
plans as the DataFrame path, so everything in SCALE.md applies verbatim.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from rel_db_to_graph_spark.sources.catalog import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str,
                   prefix: str = "") -> list[str]:
    """One temp view per testdata table; returns the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def register_graph_views(spark: SparkSession, graph: dict,
                         prefix: str = "g_") -> list[str]:
    """Views over a built graph: ``g_nodes_<type>`` and
    ``g_edges_<src>__<rel>__<dst>``."""
    names = []
    for t, df in graph["nodes"].items():
        name = f"{prefix}nodes_{t}"
        df.createOrReplaceTempView(name)
        names.append(name)
    for (s, r, d), df in graph["edges"].items():
        name = f"{prefix}edges_{s}__{r}__{d}"
        df.createOrReplaceTempView(name)
        names.append(name)
    return names
