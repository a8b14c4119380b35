from rel_db_to_graph_spark.sources.catalog import (
    FOREIGN_KEYS,
    PRIMARY_KEYS,
    TABLES,
    foreign_keys,
    load_table,
    primary_keys,
    registry_cte,
    tables,
)

__all__ = [
    "TABLES", "PRIMARY_KEYS", "FOREIGN_KEYS",
    "tables", "primary_keys", "foreign_keys", "load_table", "registry_cte",
]
