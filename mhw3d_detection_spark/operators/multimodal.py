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


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_payload binary, frame_hash string"


def fake_frame_extract(payload: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Deterministic stand-in for video frame sampling: treat the bytes
    as a stream of 16-byte 'frames', keep every ``every_n``-th.

    STUB — production swaps this for pyav keyframe extraction; the
    Spark-side contract (one input row -> many output rows, Arrow
    batches, schema) is the real, tested part.
    """
    frames = []
    for idx, off in enumerate(range(0, len(payload), 16)):
        if idx % every_n == 0:
            frames.append((idx, payload[off : off + 16]))
    return frames


def sample_frames(
    media: DataFrame,
    *,
    every_n: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    extract_fn: Callable[[bytes, int], list] = fake_frame_extract,
    schema: str = FRAME_SCHEMA,
) -> DataFrame:
    """UDTF-shaped frame sampler: each media row expands to one row per
    sampled frame via ``mapInPandas`` (the §2.8 U3 one-to-many surface).

    Narrow (no shuffle): expansion happens inside the scan partition;
    downstream per-frame feature extraction chains onto the same stage.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_payload": [], "frame_hash": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for idx, frame in extract_fn(bytes(payload), every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(frame)
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest()[:16])
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(batches, schema=schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the synthetic documents' text as an opaque binary
    payload (the driver's tables have no real media column)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
