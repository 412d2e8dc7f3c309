"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_payload`` raises ``NotImplementedError`` unless
``fake='deterministic'``), but everything Spark-side is real and tested:

* schema: payloads travel as ``binary`` columns with a ``media_type`` tag;
* batching: feature extraction is an Arrow-batched ``mapInPandas`` whose
  per-batch cost is O(batch bytes) — the shape that holds when the payload
  is a 5 MB JPEG instead of a 500-byte text blob;
* partitioning: payload tables should be written with
  ``spark.sql.files.maxPartitionBytes`` sized so one task holds a bounded
  number of payloads; features are small rows that shuffle freely.

The deterministic fake decoder derives pseudo width/height from the payload
md5 so tests (and the DuckDB oracle) can verify the full pipeline without a
codec library.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, content_md5 string, fake_w int, fake_h int"


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata
    (stand-in for real image/audio bytes; byte-exact: UTF-8 encoding)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def decode_payload(payload: bytes, media_type: str, fake: str | None = None) -> dict:
    """Decode one payload to raw media. STUB: real decoding needs a codec
    library absent from this container.

    ``fake='deterministic'`` returns md5-derived pseudo-dimensions —
    reproducible everywhere (used by tests and the SQL oracle).
    """
    if fake != "deterministic":
        raise NotImplementedError(
            "media decode requires an image/audio codec library not present "
            "in this environment; pass fake='deterministic' for the test fake"
        )
    h = hashlib.md5(payload).hexdigest()
    return {
        "content_md5": h,
        "fake_w": int(h[:2], 16) % 64 + 1,
        "fake_h": int(h[2:4], 16) % 64 + 1,
    }


def extract_features(payloads: DataFrame, fake: str = "deterministic") -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_type).

    -> (doc_id, media_type, n_bytes, content_md5, fake_w, fake_h). This is
    where a real pipeline would resize images / sample frames / embed audio;
    the batch loop, schema and partition behavior are identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                payload = bytes(payload)
                feats = decode_payload(payload, mt, fake=fake)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mt,
                        "n_bytes": len(payload),
                        **feats,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "content_md5",
                    "fake_w",
                    "fake_h",
                ],
            )

    return payloads.mapInPandas(run, schema=FEATURE_SCHEMA)
