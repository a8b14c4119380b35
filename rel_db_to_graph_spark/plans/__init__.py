from rel_db_to_graph_spark.plans.inference import (
    edge_catalog,
    junction_tables,
    node_tables,
    table_kinds,
)

__all__ = ["table_kinds", "node_tables", "junction_tables", "edge_catalog"]
