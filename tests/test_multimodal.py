"""Multimodal plumbing: binary payload column + Arrow-batched decode stub."""

from __future__ import annotations

import pytest

from rel_db_to_graph_spark.operators.multimodal import (
    attach_payload,
    decode_metadata,
    real_decode,
)
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_payload_schema(spark):
    media = attach_payload(load_table(spark, SF_SMOKE, "documents"))
    assert dict(media.dtypes)["payload"] == "binary"


def test_decode_deterministic_and_complete(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    meta = decode_metadata(attach_payload(docs)).cache()
    assert meta.count() == docs.count()
    row = meta.filter("doc_id = 0").collect()[0]
    assert 64 <= row["fake_width"] <= 64 + 15 * 8
    assert len(row["payload_md5"]) == 32
    again = decode_metadata(attach_payload(docs))
    assert meta.exceptAll(again).count() == 0


def test_real_decode_is_stubbed(spark):
    media = attach_payload(load_table(spark, SF_SMOKE, "documents"))
    with pytest.raises(NotImplementedError):
        real_decode(media)


def test_frame_sample_fanout_and_determinism(spark):
    from rel_db_to_graph_spark.operators.multimodal import (
        attach_payload,
        sample_frames,
    )
    from rel_db_to_graph_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    media = attach_payload(load_table(spark, SF_SMOKE, "documents").limit(20))
    frames = sample_frames(media, k=4).collect()
    assert len(frames) == 80                      # exact 1 -> k fan-out
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        idx = sorted(r.frame_index for r in rows)
        assert idx == [0, 1, 2, 3]
        ts = [r.frame_ts_ms for r in sorted(rows, key=lambda r: r.frame_index)]
        assert ts == sorted(ts) and ts[0] == 0    # evenly spaced from 0
    # repartitioning does not change the sample
    again = sample_frames(media.repartition(8), k=4).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))
