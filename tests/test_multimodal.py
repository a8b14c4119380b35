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


def test_frame_sample_extracts_real_chunks(spark):
    """k-frame uniform sampling reads ACTUAL '00dc' chunk payloads out
    of the AVI container: lengths and byte sums must equal the builder
    arithmetic, corrupt docs yield zero frames, and the sample is
    partitioning-invariant."""
    from rel_db_to_graph_spark.operators.multimodal import (
        attach_video_payload,
        sample_frames,
    )
    from rel_db_to_graph_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    media = attach_video_payload(
        load_table(spark, SF_SMOKE, "documents").limit(40))
    frames = sample_frames(media, k=4).collect()
    good = [d for d in range(40) if d % 17 != 0]
    assert len(frames) == 4 * len(good)           # corrupt docs -> 0 rows
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == good
    for doc_id, rows in by_doc.items():
        nf = 4 + doc_id % 13
        fps = (10, 15, 24, 30)[doc_id % 4]
        for r in sorted(rows, key=lambda r: r.frame_index):
            f = r.frame_index * nf // 4
            assert r.src_frame == f
            assert r.frame_ts_ms == f * (1_000_000 // fps) // 1000
            flen = 16 + 2 * ((doc_id + 3 * f) % 16)
            assert r.frame_len == flen
            assert r.frame_sum == sum(
                (doc_id * 31 + f * 17 + i * 7) % 256 for i in range(flen))
    again = sample_frames(media.repartition(8), k=4).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_parse_avi_real_container():
    """Hand-built RIFF/AVI bytes — with an out-of-order extra chunk and
    an odd-size frame (pad byte) — parse exactly, frames included."""
    import struct

    from rel_db_to_graph_spark.operators.multimodal import parse_avi

    avih = struct.pack("<10I", 40000, 0, 0, 0, 2, 0, 1, 0, 320, 240) \
        + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHI", 0, 0, 0, 0)
            + struct.pack("<II", 1, 25) + struct.pack("<III", 0, 2, 0)
            + struct.pack("<II", 0, 0) + struct.pack("<4H", 0, 0, 320, 240))
    strl = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
    hdrl = (b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
            + b"LIST" + struct.pack("<I", len(strl)) + strl)
    f0 = b"\x01\x02\x03"                           # odd length -> pad byte
    f1 = b"\x04\x05\x06\x07"
    movi = (b"movi"
            + b"00dc" + struct.pack("<I", len(f0)) + f0 + b"\x00"
            + b"00db" + struct.pack("<I", len(f1)) + f1)
    junk = b"JUNK" + struct.pack("<I", 4) + b"zzzz"
    body = (b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
            + junk + b"LIST" + struct.pack("<I", len(movi)) + movi)
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    w, h, fps, nf, frames, err = parse_avi(raw)
    assert (w, h, fps, nf, err) == (320, 240, 25, 2, None)
    assert frames == [f0, f1]


def test_parse_avi_corrupt_paths():
    import struct

    from rel_db_to_graph_spark.operators.multimodal import parse_avi

    assert parse_avi(b"RIFF\x00")[5] == "unknown_format"
    assert parse_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")[5] == \
        "unknown_format"
    # declared chunk size runs past the buffer
    bad = (b"RIFF" + struct.pack("<I", 100) + b"AVI "
           + b"avih" + struct.pack("<I", 999) + b"\x00" * 8)
    assert parse_avi(bad)[5] == "truncated_chunk"
    # well-formed RIFF tree but no avih header
    noav = (b"RIFF" + struct.pack("<I", 16) + b"AVI "
            + b"JUNK" + struct.pack("<I", 4) + b"zzzz")
    assert parse_avi(noav)[5] == "no_avih"


def test_decode_video_meta_matches_arithmetic(spark):
    """Spark-side byte parse must equal the doc_id arithmetic the
    payload builder encoded (the same property the oracle checks)."""
    from rel_db_to_graph_spark.operators.multimodal import (
        attach_video_payload,
        decode_video_meta,
    )
    from rel_db_to_graph_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(120)
    rows = decode_video_meta(attach_video_payload(docs)).collect()
    assert len(rows) == 120
    for r in rows:
        if r.doc_id % 17 == 0:
            assert r.error == "unknown_format" and r.byte_len == 5
            assert r.format is None and r.frame_bytes == 0
        else:
            fps = (10, 15, 24, 30)[r.doc_id % 4]
            nf = 4 + r.doc_id % 13
            assert r.error is None and r.format == "avi"
            assert r.width == 32 + (r.doc_id % 64) * 4
            assert r.height == 24 + ((r.doc_id * 5) % 64) * 4
            assert (r.fps, r.n_frames) == (fps, nf)
            assert r.duration_ms == nf * (1_000_000 // fps) // 1000
            fb = sum(16 + 2 * ((r.doc_id + 3 * f) % 16) for f in range(nf))
            assert r.frame_bytes == fb
            assert r.byte_len == 224 + 8 * nf + fb


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


def test_parse_avi_deeply_nested_lists_quarantine_not_crash():
    """ADVICE r7: a few KB of nested LIST headers used to blow the
    recursion limit inside the Arrow worker (task failure). The walk is
    now iterative — the crafted blob must come back as a quarantine
    row (error string), never raise."""
    import struct

    from rel_db_to_graph_spark.operators.multimodal import parse_avi

    depth = 50_000
    # innermost-first: each level wraps the previous in LIST(size)
    body = b""
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", 4 + len(body)) + b"nest" + body
    raw = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    w, h, fps, nf, frames, err = parse_avi(raw)
    assert err == "no_avih"
    assert frames == []
