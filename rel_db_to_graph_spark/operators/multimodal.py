"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode itself is STUBBED (no image/audio libs in this container): the
stub derives deterministic fake dimensions from the payload's md5, so the
Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and testable, and the output is oracle-checkable (DuckDB reproduces
the same md5/ascii arithmetic). Swap ``_decode_stub`` for a real
PIL/ffmpeg call and nothing else changes.

Scale notes: mapInPandas streams Arrow record batches — peak memory is
one batch, not one partition, so binary payloads of MBs/row are safe if
``spark.sql.execution.arrow.maxRecordsPerBatch`` is sized to the payload
(set it to ~64 for 1 MB images). Decode is map-only: zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id long, byte_len int, fake_width int, "
                  "fake_height int, payload_md5 string")


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: (doc_id, payload binary, media_type)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': (doc_id, byte_len, fake_width, fake_height,
    payload_md5).

    The worker function is fully self-contained (locals + in-function
    imports) so cloudpickle ships it BY VALUE: Spark's Python workers
    never need this package importable on their own sys.path — required
    for driver harnesses that import ``__spark_entry__`` by file path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                # fake "decode": dimensions derived from the digest —
                # deterministic; replace with PIL.Image.open(...).size
                # for real images
                "fake_width": [64 + (int(d[0], 16) % 16) * 8 for d in digests],
                "fake_height": [64 + (int(d[1], 16) % 16) * 8 for d in digests],
                "payload_md5": digests,
            })

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


IMAGE_META_SCHEMA = ("doc_id long, byte_len int, format string, "
                     "width int, height int, error string")


def _build_parser():
    """Factory so the parser function pickles BY VALUE (a closure
    product is not importable by qualified name, so cloudpickle ships
    its code): mapInPandas workers never need this package on their
    sys.path — the same self-containment rule every other worker
    closure in this module follows."""

    def parse_image_header(raw: bytes):
        import struct

        n = len(raw)
        if n >= 8 and raw[:8] == b"\x89PNG\r\n\x1a\n":
            if n < 24:
                return "png", 0, 0, "truncated"
            w, h = struct.unpack(">II", raw[16:24])
            return "png", w, h, None
        if n >= 2 and raw[:2] == b"\xff\xd8":
            i = 2
            while i + 9 <= n:
                if raw[i] != 0xFF:
                    return "jpeg", 0, 0, "bad_segment"
                marker = raw[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                             0xCC):
                    h, w = struct.unpack(">HH", raw[i + 5:i + 9])
                    return "jpeg", w, h, None
                seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
                i += 2 + seg_len
            return "jpeg", 0, 0, "no_sof"
        if n >= 10 and raw[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", raw[6:10])
            return "gif", w, h, None
        if n >= 26 and raw[:2] == b"BM":
            w, h = struct.unpack("<ii", raw[18:26])
            return "bmp", w, abs(h), None
        return None, 0, 0, "unknown_format"

    return parse_image_header


#: (format, width, height, error) from real container headers — a
#: dependency-free decode of the metadata a curation pipeline filters
#: on. PNG: 8-byte signature + IHDR u32be dims at 16..24. JPEG: SOI +
#: segment walk to SOF0..SOF15 (skipping DHT/DAC/JPG), u16be dims at
#: sof+5. GIF: GIF87a/89a logical screen u16le at 6..10. BMP: 'BM' +
#: BITMAPINFOHEADER i32le at 18..26. Corrupt payloads return an error
#: string instead of raising — at 100 TB a bad blob must become a
#: quarantine row, never a task failure.
parse_image_header = _build_parser()


def attach_image_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a multimodal table with REAL container headers:
    (doc_id, payload binary, media_type). Each doc gets a genuine
    PNG / JPEG / GIF header (cycled by doc_id % 3) whose encoded
    dimensions are deterministic functions of doc_id, followed by the
    text bytes as payload body; every 17th doc is truncated to 5 bytes
    (the corrupt-blob path). The dimensions/lengths being pure
    arithmetic in doc_id is what lets the DuckDB oracle check the
    byte-level parser without itself parsing binary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as _pd

        def build(doc_id: int, text: str) -> bytes:
            w = 16 + doc_id % 256
            h = 16 + (doc_id * 7) % 256
            body = text.encode("utf-8")
            kind = doc_id % 3
            if kind == 0:   # PNG: sig + IHDR chunk (zero CRC: header-only)
                ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
                raw = (b"\x89PNG\r\n\x1a\n"
                       + struct.pack(">I", 13) + b"IHDR" + ihdr
                       + b"\x00\x00\x00\x00" + body)
            elif kind == 1:  # JPEG: SOI + APP0(JFIF) + SOF0
                app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
                sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                        + struct.pack(">HH", h, w) + b"\x01\x11\x00\x00")
                raw = b"\xff\xd8" + app0 + sof0 + body
            else:            # GIF89a logical screen descriptor
                raw = (b"GIF89a" + struct.pack("<HH", w, h)
                       + b"\x00\x00\x00" + body)
            if doc_id % 17 == 0:
                raw = raw[:5]
            return raw

        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [build(int(i), str(t))
                            for i, t in zip(pdf["doc_id"], pdf["text"])],
                "media_type": ["image/synthetic"] * len(pdf),
            })

    return (docs.select("doc_id", F.col(text_col).alias("text"))
            .mapInPandas(run, schema="doc_id long, payload binary, "
                                     "media_type string"))


def decode_image_meta(media: DataFrame) -> DataFrame:
    """REAL header decode over the binary column (replaces the r5
    NotImplementedError stub): Arrow-batched mapInPandas →
    (doc_id, byte_len, format, width, height, error). Map-only, zero
    shuffle; corrupt payloads yield error rows, not task failures.
    The worker is self-contained (parser inlined via closure) so
    cloudpickle ships it by value."""
    parser = parse_image_header

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "byte_len": [], "format": [],
                   "width": [], "height": [], "error": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                fmt, w, h, err = parser(raw)
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(raw))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["error"].append(err)
            yield _pd.DataFrame(out)

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = ("doc_id long, byte_len int, format string, "
                     "sample_rate int, channels int, bits int, "
                     "n_frames long, duration_ms long, rms double, "
                     "error string")


def _build_wav_parser():
    """Factory → pickled by value (same self-containment rule as the
    image parser above)."""

    def parse_wav(raw: bytes):
        """(sample_rate, channels, bits, n_frames, rms, error) from a
        RIFF/WAVE container: 12-byte RIFF header, then a chunk walk
        ('fmt ' → PCM format fields, 'data' → interleaved samples;
        chunks are word-aligned so odd sizes skip a pad byte). RMS is
        sqrt(mean(sample^2)) over the int16 PCM payload, rounded to
        6 dp (repo float-parity convention). Corrupt payloads return an
        error string — at 100 TB a bad blob must become a quarantine
        row, never a task failure."""
        import math
        import struct

        n = len(raw)
        if n < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return 0, 0, 0, 0, None, "unknown_format"
        fmt_fields = None
        data = None
        i = 12
        while i + 8 <= n:
            cid = raw[i:i + 4]
            size = struct.unpack("<I", raw[i + 4:i + 8])[0]
            body = raw[i + 8:i + 8 + size]
            if len(body) < size:
                return 0, 0, 0, 0, None, "truncated_chunk"
            if cid == b"fmt " and size >= 16:
                fmt_fields = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if fmt_fields is None:
            return 0, 0, 0, 0, None, "no_fmt"
        audio_format, ch, sr, _rate, _align, bits = fmt_fields
        if audio_format != 1 or bits != 16 or ch == 0 or sr == 0:
            return sr, ch, bits, 0, None, "unsupported_encoding"
        if data is None:
            return sr, ch, bits, 0, None, "no_data"
        n_samples = len(data) // 2
        n_frames = n_samples // ch
        if n_samples == 0:
            return sr, ch, bits, 0, None, "no_data"
        samples = struct.unpack(f"<{n_samples}h", data[:n_samples * 2])
        rms = round(math.sqrt(sum(v * v for v in samples) / n_samples), 6)
        return sr, ch, bits, n_frames, rms, None

    return parse_wav


#: Dependency-free audio analog of parse_image_header (VERDICT r6 next
#: item 7): genuine RIFF/WAVE chunk walk + PCM16 RMS stats.
parse_wav = _build_wav_parser()


def attach_audio_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an audio table with REAL RIFF/WAVE containers:
    (doc_id, payload binary, media_type). Sample rate / channels /
    frame count are pure arithmetic in doc_id and the PCM16 sample at
    interleaved index i is ((doc_id*31 + i*7) % 2048) - 1024, so the
    DuckDB oracle can recompute every output — byte length, duration
    and even the RMS — without touching binary. Every 17th doc is
    truncated to 5 bytes (the corrupt-blob path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as _pd

        def build(doc_id: int) -> bytes:
            sr = (8000, 16000, 22050, 44100)[doc_id % 4]
            ch = 1 + doc_id % 2
            n_frames = 50 + doc_id % 101
            n = n_frames * ch
            pcm = struct.pack(
                f"<{n}h",
                *[((doc_id * 31 + i * 7) % 2048) - 1024 for i in range(n)])
            raw = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                   + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                           sr * ch * 2, ch * 2, 16)
                   + b"data" + struct.pack("<I", len(pcm)) + pcm)
            if doc_id % 17 == 0:
                raw = raw[:5]
            return raw

        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [build(int(i)) for i in pdf["doc_id"]],
                "media_type": ["audio/wav"] * len(pdf),
            })

    return (docs.select("doc_id")
            .mapInPandas(run, schema="doc_id long, payload binary, "
                                     "media_type string"))


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """REAL WAV header + PCM decode over the binary column: Arrow-
    batched mapInPandas → (doc_id, byte_len, format, sample_rate,
    channels, bits, n_frames, duration_ms, rms, error). Map-only, zero
    shuffle; the worker is self-contained (parser inlined via closure)
    so cloudpickle ships it by value. duration_ms is integer floor
    arithmetic (n_frames * 1000 // sample_rate) so the oracle twin is
    exact."""
    parser = parse_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "byte_len", "format",
                                   "sample_rate", "channels", "bits",
                                   "n_frames", "duration_ms", "rms",
                                   "error")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                sr, ch, bits, n_frames, rms, err = parser(raw)
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(raw))
                out["format"].append(None if err == "unknown_format"
                                     else "wav")
                out["sample_rate"].append(sr)
                out["channels"].append(ch)
                out["bits"].append(bits)
                out["n_frames"].append(n_frames)
                out["duration_ms"].append(
                    n_frames * 1000 // sr if sr else 0)
                out["rms"].append(rms)
                out["error"].append(err)
            yield _pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_META_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_index int, frame_ts_ms long, frame_md5 string"


def sample_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """Uniform frame sampling for 'video' payloads — k frames per doc at
    evenly-spaced timestamps (fake duration = byte length in ms). The
    frame content hash is derived from the payload digest (deterministic
    stub; a real build decodes the frame at frame_ts_ms with ffmpeg and
    hashes the pixels — the Arrow plumbing, 1→k row fan-out, and schema
    stay identical).

    Self-contained worker (cloudpickle-by-value), map-only, output is
    k× the rows but only metadata-sized columns.
    """
    kk = int(k)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_index": [], "frame_ts_ms": [],
                   "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                digest = hashlib.md5(raw).hexdigest()
                dur = len(raw)
                for i in range(kk):
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * dur // kk)
                    out["frame_md5"].append(
                        hashlib.md5(f"{digest}:{i}".encode()).hexdigest())
            yield _pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
