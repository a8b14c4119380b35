"""Multimodal plumbing: binary payload column, Arrow-batched decode,
and the REAL dependency-free image-header parser (round 6)."""

from __future__ import annotations

from rel_db_to_graph_spark.operators.multimodal import (
    attach_image_payload,
    attach_payload,
    decode_image_meta,
    decode_metadata,
    parse_image_header,
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


def test_parse_image_header_real_formats():
    """Parse genuine (hand-assembled) container headers, including a
    real-world-shaped JPEG with multiple leading segments before SOF0."""
    import struct
    import zlib

    # a REAL minimal PNG (valid CRC) via zlib: 3x2 RGB
    ihdr = struct.pack(">II", 3, 2) + b"\x08\x02\x00\x00\x00"
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    assert parse_image_header(png) == ("png", 3, 2, None)

    # JPEG: SOI, APP0, COM, then SOF2 (progressive marker variant)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    sof2 = (b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x01\x11\x00\x00")
    assert parse_image_header(b"\xff\xd8" + app0 + com + sof2) == \
        ("jpeg", 640, 480, None)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == ("gif", 320, 200, None)

    bmp = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50)
           + b"\x00" * 10)
    assert parse_image_header(bmp) == ("bmp", 100, 50, None)  # top-down h<0


def test_parse_image_header_corrupt_paths():
    assert parse_image_header(b"")[3] == "unknown_format"
    assert parse_image_header(b"\x89PNG\r")[3] == "unknown_format"
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00")[3] == "truncated"
    assert parse_image_header(b"\xff\xd8\x00\x00" + b"\x00" * 20)[3] == \
        "bad_segment"
    assert parse_image_header(b"\xff\xd8\xff\xe0")[3] == "no_sof"
    assert parse_image_header(b"garbage bytes here too long")[3] == \
        "unknown_format"


def test_decode_image_meta_parses_constructed_headers(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    meta = decode_image_meta(attach_image_payload(docs)).collect()
    assert len(meta) == 60
    for r in meta:
        if r.doc_id % 17 == 0:
            assert r.error is not None and r.byte_len == 5
        else:
            assert r.error is None
            assert r.width == 16 + r.doc_id % 256
            assert r.height == 16 + (r.doc_id * 7) % 256
            fmt = ["png", "jpeg", "gif"][r.doc_id % 3]
            assert r.format == fmt


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
