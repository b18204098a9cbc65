"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct; decode
/ feature-extraction run as Arrow-batched mapInPandas over whole partitions.
The decode kernels themselves are STUBBED (codec libraries are not available
in this environment — clearly marked below); everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes int, payload_sha string, "
    "feature array<float>"
)


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the text,
    metadata derived from its length. Stands in for real image/audio blobs."""
    # kind is md5-derived (not xxhash64) so the DuckDB oracle reproduces it:
    # first 15 hex chars of md5(id) as a 60-bit int, mod 3
    kind_idx = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("bigint"),
        F.lit(3),
    )
    return docs.select(
        F.concat(F.lit("m"), F.col(id_col).cast("string")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (kind_idx + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            (F.length(text_col) * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation would decode via PIL/libjpeg (not installed).

    Deterministic fake: 8-dim feature from the payload's md5 bytes so the
    pipeline shape (binary -> fixed-dim float vector) is exercised end-to-end.
    """
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0
    # real path (requires PIL):
    # raise NotImplementedError("image decode requires PIL/libjpeg")


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch per Python call; within a batch the work is vectorizable
    per-kind. Output partitioning follows the input — no shuffle introduced.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            payloads = b["payload"]
            feats = [_decode_image(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_sha": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
