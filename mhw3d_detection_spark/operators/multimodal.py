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

import struct
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


#: header sniff output — REAL (not stubbed): container format and the
#: dimensions/PCM params readable from the public byte layouts alone
SNIFF_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "n_channels int, sample_rate int, bit_depth int, "
    "duration_ms double, n_bytes bigint"
)


def sniff_media(payload: bytes) -> dict:
    """REAL container-header parsing (r8) — no codec library needed:
    the byte layouts of PNG (IHDR), JPEG (SOFn markers), GIF (logical
    screen), BMP (BITMAPINFOHEADER) and WAV (RIFF ``fmt ``/``data``
    chunks) are public specs, so format, dimensions and PCM parameters
    are extractable from the first kilobyte without decoding a single
    pixel/sample. This upgrades the E5 metadata stage from stub to
    real; only the pixel/sample DECODE itself stays behind the
    ``decode_fn`` hook (no codecs in this environment).

    Returns a dict matching :data:`SNIFF_SCHEMA` (minus doc_id);
    unknown containers yield ``format="unknown"`` with sizes only —
    never raises on garbage bytes (corrupt inputs are data, not
    errors, at corpus scale). The guard is scoped to the three
    exception types malformed BYTES can produce (short struct reads,
    slice overruns, bad values) — a parser BUG (TypeError, NameError,
    …) propagates instead of masquerading as a corrupt file."""
    _st = struct

    out = {
        "format": "unknown", "width": None, "height": None,
        "n_channels": None, "sample_rate": None, "bit_depth": None,
        "duration_ms": None, "n_bytes": len(payload),
    }
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = _st.unpack_from(">II", payload, 16)
            bit_depth, color_type = payload[24], payload[25]
            out.update(
                format="png", width=w, height=h, bit_depth=bit_depth,
                n_channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type),
            )
        elif payload[:2] == b"\xff\xd8":
            # JPEG: walk the marker stream to the first SOFn frame
            # header (C0-CF except C4/C8/CC), which carries dims
            off = 2
            while off + 9 < len(payload):
                if payload[off] != 0xFF:
                    break
                # spec allows 0xFF fill bytes before any marker: skip
                # padding so b"\xff\xff\xc0..." reads SOF0, not a
                # phantom 0xFF segment with a garbage length
                while off + 9 < len(payload) and payload[off + 1] == 0xFF:
                    off += 1
                marker = payload[off + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    off += 2
                    continue
                seg_len = _st.unpack_from(">H", payload, off + 2)[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    prec = payload[off + 4]
                    h, w = _st.unpack_from(">HH", payload, off + 5)
                    nc = payload[off + 9]
                    out.update(
                        format="jpeg", width=w, height=h,
                        n_channels=nc, bit_depth=prec,
                    )
                    break
                off += 2 + seg_len
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _st.unpack_from("<HH", payload, 6)
            out.update(format="gif", width=w, height=h)
        elif payload[:2] == b"BM" and len(payload) >= 26:
            w, h = _st.unpack_from("<ii", payload, 18)
            bpp = _st.unpack_from("<H", payload, 28)[0] if len(payload) >= 30 else None
            out.update(format="bmp", width=w, height=abs(h), bit_depth=bpp)
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            # chunk walk: fmt (PCM params) + data (payload size)
            off, fmt, data_len = 12, None, None
            while off + 8 <= len(payload):
                cid = payload[off:off + 4]
                clen = _st.unpack_from("<I", payload, off + 4)[0]
                if cid == b"fmt " and off + 24 <= len(payload):
                    nc, sr = _st.unpack_from("<HI", payload, off + 10)
                    bits = _st.unpack_from("<H", payload, off + 22)[0]
                    fmt = (nc, sr, bits)
                elif cid == b"data":
                    data_len = clen
                off += 8 + clen + (clen % 2)
            if fmt:
                nc, sr, bits = fmt
                out.update(
                    format="wav", n_channels=nc, sample_rate=sr,
                    bit_depth=bits,
                )
                if data_len is not None and nc and sr and bits:
                    out["duration_ms"] = (
                        data_len / (nc * sr * bits / 8.0) * 1000.0
                    )
    except (struct.error, IndexError, ValueError):
        # truncated/garbage headers: report what was safely read —
        # these three are the only shapes malformed bytes can raise
        # here; anything else is a code defect and must propagate
        pass
    return out


def probe_media(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL media metadata probe: :func:`sniff_media` over the binary
    column as Arrow-batched ``mapInPandas`` — same narrow plan shape as
    :func:`decode_media`, but the extraction is genuine header parsing
    (format, dimensions, PCM params), not the stub. The corpus-scale
    use: partition/route by container format, drop zero-dimension
    corrupt files, and budget decode work by duration/pixel count
    BEFORE any codec runs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [sniff_media(bytes(b)) for b in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return media.select(id_col, payload_col).mapInPandas(
        batches, schema=SNIFF_SCHEMA
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the synthetic documents' text as an opaque binary
    payload (the driver's tables have no real media column)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
