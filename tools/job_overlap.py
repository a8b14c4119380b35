"""Evidence probe for the graph_build thread-pool materialization
(optimization round 13, guide §2.6): polls statusTracker while the
bench's graph_build forcer runs and records how many Spark jobs are
ACTIVE simultaneously. The r12 lazy shape executed the 19 cached
node/edge subtrees strictly serially (max 1 active job); the thread-
pool shape overlaps them.

Usage: python tools/job_overlap.py [sf_dir]  (default sf0.1)
Writes a timeline summary to stdout.
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from rel_db_to_graph_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="job_overlap")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    spark.range(1000).count()
    # warm codegen the way bench does, then clear
    bench.bench_graph_build(spark, "/root/testdata/sf0.001")
    from rel_db_to_graph_spark.operators.graph_build import _GRAPH_CACHE
    for g in list(_GRAPH_CACHE.values()):
        for df in list(g["nodes"].values()) + list(g["edges"].values()):
            df.unpersist()
    _GRAPH_CACHE.clear()

    samples: list[tuple[float, int]] = []
    stop = threading.Event()

    def poll() -> None:
        t0 = time.perf_counter()
        while not stop.is_set():
            samples.append((time.perf_counter() - t0,
                            len(tracker.getActiveJobsIds())))
            time.sleep(0.02)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    t0 = time.perf_counter()
    n = bench.bench_graph_build(spark, sf_dir)
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=2)

    active = [c for _, c in samples if c > 0]
    hist: dict[int, int] = {}
    for c in active:
        hist[c] = hist.get(c, 0) + 1
    print(f"rows={n} wall={wall:.2f}s samples={len(samples)} "
          f"max_concurrent_jobs={max(active) if active else 0}")
    print("active-job-count histogram (20ms samples):",
          {k: hist[k] for k in sorted(hist)})
    frac = (sum(v for k, v in hist.items() if k >= 2)
            / max(1, len(active)))
    print(f"fraction of busy time with >=2 jobs in flight: {frac:.2f}")


if __name__ == "__main__":
    main()
