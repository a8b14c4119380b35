"""rel_db_to_graph_spark — a PySpark-native re-expression of the
kennethlongshaw/rel_db_to_graph pipeline (relational DB → heterogeneous
graph → features → link-prediction dataflow), plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) such a pipeline needs at 100 TB.

Design principles (see SURVEY.md):
  * Everything is a lazy DataFrame plan — Catalyst handles pushdown,
    pruning, broadcast, AQE. No collected dicts, no driver-side loops
    over data (the reference's `{pk: dense_id}` dict at
    convert_to_graph.py:27 is the anti-pattern we replace with joins).
  * Graph = plain node/edge DataFrames (Parquet-partitioned by type),
    not a binary blob (reference: torch.save at convert_to_graph.py:271).
  * Metadata (PK/FK registry) is tiny → always broadcast.
  * Python UDFs only where DataFrame ops can't express the semantics,
    and then Arrow-batched (mapInPandas / pandas_udf), never per-row.
"""

from rel_db_to_graph_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
