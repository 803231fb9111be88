"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched Pandas stages.

The pattern for image/audio/video at 100 TB: store the payload as a
`binary` column next to a metadata struct (mime, byte size, checksum),
keep all filtering/routing on the metadata (native expressions, no
payload deserialization), and run decode/feature-extraction through
`mapInPandas` so payload bytes cross into Python once, Arrow-batched,
with per-partition parallelism.

The actual media decoders (PIL/ffmpeg/soundfile) are NOT available in
this container, so `decode_payload` STUBS them behind
NotImplementedError, keeping the Spark-side plumbing — schema, batch
iteration, UDF signature — real and tested.  `text/plain` payloads get
a deterministic byte-level feature extraction so the full path runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, byte_len int, n_space int, n_alpha int, "
    "head_fingerprint long"
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Wrap a text column as an opaque binary asset + metadata struct —
    the shape every multimodal table shares regardless of media type."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("asset_meta"),
    )


def decode_payload(mime: str, payload: bytes) -> bytes:
    """Decode a media payload to a canonical representation.

    Real decoders are not installed in this environment; anything that
    needs one fails loudly instead of producing fake media.
    """
    if mime == "text/plain":
        return payload
    raise NotImplementedError(
        f"decoder for {mime!r} requires media libraries (PIL/ffmpeg) "
        "not present in this environment"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch byte-level feature extraction (deterministic)."""
    for pdf in batches:
        rows = []
        for doc_id, payload, meta in zip(
            pdf["doc_id"], pdf["payload"], pdf["asset_meta"]
        ):
            mime = meta["mime"]
            raw = decode_payload(mime, bytes(payload))
            n_space = raw.count(b" ")
            n_alpha = sum(1 for x in raw if 97 <= x <= 122)
            fp = 0
            for x in raw[:16]:  # bounded-head rolling hash
                fp = (fp * 131 + x) % 1_000_000_007
            rows.append((doc_id, mime, len(raw), n_space, n_alpha, fp))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "mime", "byte_len", "n_space", "n_alpha",
                "head_fingerprint",
            ],
        )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode + featurize over the binary payloads."""
    return assets.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)
