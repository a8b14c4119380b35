"""Measure the WAV-RMS / AVI-frame-sum payload math at realistic media
sizes (VERDICT r7 'What's wrong' nit 1 → r7 next-item 4): the synthetic
driver corpus carries ~300 samples/doc, where a per-sample Python loop
is invisible; real audio is minutes at 44.1 kHz = millions of samples
per doc. This audit builds a single big payload, times the committed
vectorized implementation against the old per-sample loop, and asserts
bit-identical results. Run: python tools/multimodal_payload_audit.py
[n_samples]. No Spark needed — the hot path is the pure parser."""

from __future__ import annotations

import math
import struct
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from rel_db_to_graph_spark.operators.multimodal import parse_avi, parse_wav


def make_wav(n_samples: int) -> bytes:
    pcm = ((np.arange(n_samples, dtype=np.int64) * 7 + 31) % 2048 - 1024)
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def rms_loop(raw: bytes) -> float:
    """The pre-r8 per-sample implementation, kept here as the yardstick."""
    i, data = 12, None
    while i + 8 <= len(raw):
        cid = raw[i:i + 4]
        size = struct.unpack("<I", raw[i + 4:i + 8])[0]
        if cid == b"data":
            data = raw[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[:n * 2])
    return round(math.sqrt(sum(v * v for v in samples) / n), 6)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    wav = make_wav(n)
    t0 = time.perf_counter()
    *_, rms_fast, err = parse_wav(wav)
    t_fast = time.perf_counter() - t0
    assert err is None
    t0 = time.perf_counter()
    rms_slow = rms_loop(wav)
    t_slow = time.perf_counter() - t0
    assert rms_fast == rms_slow, (rms_fast, rms_slow)
    print(f"wav rms @{n:,} samples: vectorized {t_fast * 1e3:.1f} ms, "
          f"per-sample loop {t_slow * 1e3:.1f} ms, "
          f"speedup {t_slow / t_fast:.0f}x, bit-identical")

    # AVI frame byte-sum: one 4 MB frame vs the old sum(bytes) walk
    frame = bytes(((np.arange(4_000_000, dtype=np.int64) * 13 + 5) % 251)
                  .astype(np.uint8))
    t0 = time.perf_counter()
    fast = int(np.frombuffer(frame, dtype=np.uint8).sum(dtype=np.int64))
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    slow = sum(frame)
    t_slow = time.perf_counter() - t0
    assert fast == slow
    print(f"frame byte-sum @4 MB: vectorized {t_fast * 1e3:.1f} ms, "
          f"per-byte loop {t_slow * 1e3:.1f} ms, "
          f"speedup {t_slow / t_fast:.0f}x, identical")
    assert parse_avi is not None  # imported = closure stays picklable


if __name__ == "__main__":
    main()
