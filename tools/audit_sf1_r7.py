"""sf1 scale audit of the round-7 query additions/changes: run each
once at /root/repo/benchdata/sf1 (and sf0.1 for the ratio), print name,
sf0.1 s, sf1 s, ratio. Completion + plan survival is the point, not
benchmarking precision (see BASELINE.md noise notes).

Round-7 surface: the two new modality parsers (audio RIFF/WAVE, video
AVI/RIFF + real frame-chunk extraction), SentencePiece-style raw BPE,
and the five rows-only->hash-checked upgrades (md5-draw sampling
variants + the layout-compaction invariant audit).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from rel_db_to_graph_spark import get_spark  # noqa: E402
from rel_db_to_graph_spark import queries as Q  # noqa: E402

NEW = ["audio_meta", "video_meta", "frame_sample", "bpe_train_raw",
       "link_split", "neighbor_sample", "negative_sample",
       "hetero_neighbor_sample", "layout_compact"]


def _clear_caches() -> None:
    from rel_db_to_graph_spark.operators.graph_build import _GRAPH_CACHE
    for g in _GRAPH_CACHE.values():
        for df in list(g["nodes"].values()) + list(g["edges"].values()):
            df.unpersist()
    _GRAPH_CACHE.clear()
    for df in Q._COPURCHASE_CACHE.values():
        df.unpersist()
    Q._COPURCHASE_CACHE.clear()


def main() -> None:
    spark = get_spark(app_name="audit_sf1_r7")
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
            _clear_caches()
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            ts[tag] = time.time() - t0
        print(f"{n}: sf0.1={ts['sf0.1']:.1f}s sf1={ts['sf1']:.1f}s "
              f"ratio={ts['sf1'] / max(ts['sf0.1'], 0.01):.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
