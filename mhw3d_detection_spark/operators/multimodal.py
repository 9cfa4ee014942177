"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11 E5,
beyond-reference).

Media payloads are opaque ``binary`` columns with typed metadata
alongside; decode / feature-extract run as Arrow-batched ``mapInPandas``
over the binary column — the schema, partitioning, UDF signature and
batch shape are the real, tested part. The actual codec step is STUBBED
(image/audio libraries are not available in this environment): the
default ``fake_decode`` derives deterministic pseudo-metadata from the
bytes so the plumbing is end-to-end verifiable; swap in a real decoder
(PIL / torchaudio / pyav) via the ``decode_fn`` hook in production.

Scale notes: mapInPandas streams Arrow batches — no per-row Python
overhead and no full-partition materialization; binary payloads never
shuffle (all derivation is narrow); keep media tables partitioned by a
content-hash prefix so hot keys spread evenly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, first_byte int, phash string"
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a media codec: byte length, first
    byte, and an md5-prefix perceptual-hash placeholder.

    STUB — raises nothing but is NOT a real decoder; production swaps
    this for PIL/pyav and returns width/height/duration/etc.
    """
    import hashlib

    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "phash": hashlib.md5(payload).hexdigest()[:16],
    }


def decode_media(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], dict] = fake_decode,
    schema: str = DECODED_SCHEMA,
) -> DataFrame:
    """Arrow-batched decode of a binary media column via mapInPandas."""
    id_name, payload_name = id_col, payload_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_fn(b) for b in pdf[payload_name]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_name].to_numpy())
            yield out

    return media.select(id_col, payload_col).mapInPandas(batches, schema=schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the synthetic documents' text as an opaque binary
    payload (the driver's tables have no real media column)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
