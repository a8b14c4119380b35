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


def test_parse_wav_real_container():
    """Hand-built RIFF/WAVE bytes (with a LIST chunk before fmt and an
    odd-size pad to exercise word alignment) parse exactly."""
    import math
    import struct

    from rel_db_to_graph_spark.operators.multimodal import parse_wav

    samples = [100, -200, 300, -400, 500, -600]          # 3 frames x 2 ch
    pcm = struct.pack("<6h", *samples)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"   # pad byte
    wav = (b"RIFF" + struct.pack("<I", 36 + len(odd) + len(pcm)) + b"WAVE"
           + odd
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000,
                                   8000 * 4, 4, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    sr, ch, bits, n_frames, rms, err = parse_wav(wav)
    assert (sr, ch, bits, n_frames, err) == (8000, 2, 16, 3, None)
    want = round(math.sqrt(sum(v * v for v in samples) / 6), 6)
    assert rms == want


def test_parse_wav_corrupt_paths():
    import struct

    from rel_db_to_graph_spark.operators.multimodal import parse_wav

    assert parse_wav(b"RIFF\x00\x00")[5] == "unknown_format"
    assert parse_wav(b"OggS" + b"\x00" * 40)[5] == "unknown_format"
    # declared chunk size runs past the buffer
    bad = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"fmt " + struct.pack("<I", 999) + b"\x00" * 4)
    assert parse_wav(bad)[5] == "truncated_chunk"
    # no fmt chunk at all
    nofmt = (b"RIFF" + struct.pack("<I", 12) + b"WAVE"
             + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    assert parse_wav(nofmt)[5] == "no_fmt"
    # non-PCM encoding (IEEE float = 3)
    enc = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                   32000, 4, 32))
    assert parse_wav(enc)[5] == "unsupported_encoding"
    # fmt but zero data
    nodata = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
              + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                      16000, 2, 16)
              + b"data" + struct.pack("<I", 0))
    assert parse_wav(nodata)[5] == "no_data"


def test_decode_audio_meta_matches_arithmetic(spark):
    """Spark-side byte parse must equal the doc_id arithmetic the
    payload builder encoded (the same property the oracle checks)."""
    from rel_db_to_graph_spark.operators.multimodal import (
        attach_audio_payload,
        decode_audio_meta,
    )
    from rel_db_to_graph_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(120)
    rows = decode_audio_meta(attach_audio_payload(docs)).collect()
    assert len(rows) == 120
    for r in rows:
        if r.doc_id % 17 == 0:
            assert r.error == "unknown_format" and r.byte_len == 5
            assert r.format is None and r.rms is None
        else:
            sr = (8000, 16000, 22050, 44100)[r.doc_id % 4]
            ch = 1 + r.doc_id % 2
            nf = 50 + r.doc_id % 101
            assert r.error is None and r.format == "wav"
            assert (r.sample_rate, r.channels, r.bits) == (sr, ch, 16)
            assert r.n_frames == nf
            assert r.byte_len == 44 + 2 * nf * ch
            assert r.duration_ms == nf * 1000 // sr
            assert r.rms is not None and 0 < r.rms < 1024
