"""sf1 scale audit of the round-6 query additions: run each once at
/root/repo/benchdata/sf1 (and sf0.1 for the ratio), print name, sf0.1 s,
sf1 s, ratio. Completion + plan survival is the point, not benchmarking
precision (see BASELINE.md noise notes)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from rel_db_to_graph_spark import get_spark  # noqa: E402
from rel_db_to_graph_spark import queries as Q  # noqa: E402

NEW = ["bpe_tokenize", "dsir_select", "knn_classify", "label_prop",
       "centrality_audit", "snapshot_diff",
       "merge_upsert", "graph_features", "profile_orders",
       # ADVICE r6: added in the same round but after the first audit
       # run — re-audited separately (see BASELINE.md round-6 addendum)
       "node_strength", "assortativity"]


def main() -> None:
    spark = get_spark(app_name="audit_sf1_r6")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or NEW
    fns = {n: getattr(Q, f"q_{n}") for n in names}
    for n, fn in fns.items():           # warm codegen at smoke SF
        fn(spark, "/root/testdata/sf0.001").write.format("noop") \
            .mode("overwrite").save()
    for n, fn in fns.items():
        ts = {}
        for tag, d in (("sf0.1", "/root/testdata/sf0.1"),
                       ("sf1", "/root/repo/benchdata/sf1")):
            Q._COPURCHASE_CACHE.clear()
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            ts[tag] = time.time() - t0
        print(f"{n}: sf0.1={ts['sf0.1']:.1f}s sf1={ts['sf1']:.1f}s "
              f"ratio={ts['sf1'] / max(ts['sf0.1'], 0.01):.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
