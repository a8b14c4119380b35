"""Production-step-count probe of the sampled hetero trainer (round 11
— the r10 `weak` was explicitly about step counts: a ~6 s/step driver
floor is invisible at the registry's max_batches=2 but IS the training
tier's throughput ceiling once steps/epoch grow with data). Runs the
same sf1 graph/store configuration as q_hetero_link_train_sampled but
with max_batches=STEPS, one epoch, on a chosen step engine.

One invocation per mode (same-session A/Bs are contaminated); quiet
box before timing.

Usage: python tools/audit_trainer_steps.py local|dataframe [steps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from rel_db_to_graph_spark import get_spark  # noqa: E402

SF1 = "/root/repo/benchdata/sf1"


def main() -> None:
    engine = sys.argv[1] if len(sys.argv) > 1 else "local"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyspark.sql import functions as F  # noqa: F401

    from rel_db_to_graph_spark.ml.gat_train import train_hetero_gat_sampled
    from rel_db_to_graph_spark.ml.hetero import node_features_normalized
    from rel_db_to_graph_spark.operators.sampling import negative_sample
    from rel_db_to_graph_spark.queries import build_graph
    from rel_db_to_graph_spark.sources.bucketed import write_edge_store

    spark = get_spark(app_name=f"audit_trainer_steps_{engine}")
    spark.sparkContext.setLogLevel("ERROR")

    g = build_graph(spark, SF1)
    pos = g["edges"][("orders", "hasCust", "customer")]
    labeled = negative_sample(pos, g["nodes"]["customer"].select("node_id"),
                              ratio=1, seed=42)
    feats_raw = node_features_normalized(
        {t: g["nodes"][t] for t in ("orders", "customer")})
    feats = {t: feats_raw[t][0] for t in feats_raw}
    sub_edges = {et: df.select("src", "dst")
                 for et, df in g["edges"].items()
                 if et[0] in feats and et[2] in feats}
    tables = write_edge_store(sub_edges, num_buckets=16,
                              prefix=f"audit_steps_{engine}")
    print(f"== setup done; timing {engine} x {steps} steps", flush=True)
    t0 = time.time()
    res = train_hetero_gat_sampled(
        sub_edges, feats, labeled, src_type="orders",
        dst_type="customer", hidden=2, fanouts=[15], batch_size=512,
        max_batches=steps, epochs=1, lr=0.05, seed=42,
        edge_tables=tables, step_engine=engine)
    secs = time.time() - t0
    n = res.history[-1]["train_n"]
    print(f"== {engine}: {steps} steps, {n} examples, {secs:.1f}s "
          f"({steps / secs:.2f} steps/s trainer-inclusive)", flush=True)


if __name__ == "__main__":
    main()
