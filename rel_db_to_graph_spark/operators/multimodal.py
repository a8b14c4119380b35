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


def real_decode(media: DataFrame) -> DataFrame:  # pragma: no cover
    """Placeholder for the real image decode path."""
    raise NotImplementedError(
        "image/audio decoding libraries are not available in this "
        "environment; use decode_metadata (deterministic stub) instead")


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
