"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via mapInPandas in Arrow batches.

The decode kernels are STUBBED (no image/audio libraries in this container):
`decode_image_meta` parses a deterministic fake header; `extract_frames`
raises NotImplementedError unless the fake codec is used. The Spark-side
plumbing — schema, batch iteration, partition sizing — is real and tested;
swapping in PIL/ffmpeg is a kernel-only change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, dur_ms int"
)

# deterministic fake codec: b'FAKE' + u16 width + u16 height + u32 dur_ms
_MAGIC = b"FAKE"


def encode_fake_media(media_id: int, kind: str, width: int, height: int, dur_ms: int):
    payload = _MAGIC + struct.pack("<HHI", width, height, dur_ms) + bytes(
        (media_id * 7 + i) % 251 for i in range(64)
    )
    return (media_id, kind, payload, None, None, None)


def decode_header(payload: bytes) -> tuple[int, int, int]:
    if payload is None or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decode requires an image/audio library not present in "
            "this environment; only the FAKE test codec is implemented"
        )
    w, h, d = struct.unpack("<HHI", payload[4:12])
    return w, h, d


def synth_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake-codec media table from an id column — the oracle can
    recompute width/height/dur_ms as pure arithmetic on the id, so the whole
    encode -> mapInPandas decode round-trip is SQL-verifiable:
        kind   = image|audio|video by id % 3
        width  = 16 + (id * 7)  % 1280
        height = 16 + (id * 11) % 720
        dur_ms = (id * 131) % 60000
    """
    kinds = {0: "image", 1: "audio", 2: "video"}

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                encode_fake_media(
                    int(i),
                    kinds[int(i) % 3],
                    16 + (int(i) * 7) % 1280,
                    16 + (int(i) * 11) % 720,
                    (int(i) * 131) % 60000,
                )
                for i in pdf[id_col]
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height", "dur_ms"]
            )

    return ids_df.mapInPandas(_gen, schema=MEDIA_SCHEMA)


def with_media_meta(df: DataFrame) -> DataFrame:
    """Fill width/height/dur_ms by decoding payload headers — mapInPandas so
    each Arrow batch is decoded in one Python call, schema preserved."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decode_header)
            pdf = pdf.assign(
                width=[m[0] for m in meta],
                height=[m[1] for m in meta],
                dur_ms=[m[2] for m in meta],
            )
            yield pdf

    return df.mapInPandas(_decode, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """One row per sampled frame timestamp — the video path's explode.
    Timestamps come from the decoded duration; frame pixel decode is stubbed
    (payload passthrough)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_ts_ms": [], "payload": []}
            for _, row in pdf.iterrows():
                _, _, dur = decode_header(row["payload"])
                for ts in range(0, max(dur, 1), every_ms):
                    out["media_id"].append(row["media_id"])
                    out["frame_ts_ms"].append(ts)
                    out["payload"].append(row["payload"])
            yield pd.DataFrame(out)

    return df.mapInPandas(_frames, schema="media_id long, frame_ts_ms int, payload binary")
