"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through ``mapInPandas``.

The container ships no codec libraries, so the decode step is STUBBED two
ways (per the build brief):

* ``mode="stub"`` — a deterministic fake: features are a normalized
  16-bin byte histogram and metadata is parsed from a tiny fake header.
  Fully deterministic, so the Spark-side plumbing (schema, partitioning,
  UDF signature, Arrow batch shape) is real and testable.
* ``mode="real"`` — raises NotImplementedError at plan-build time with the
  integration point named (plug PIL/torchaudio/av decode into `_decode`).

At scale this stage is embarrassingly parallel over ``mapInPandas``
batches; binary payloads never leave the executor that read them, and
column pruning means the scan reads only (id, payload).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_BINS = 16

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def make_fake_media(media_id: int, kind: str, width: int, height: int,
                    payload: bytes) -> bytes:
    """Deterministic fake container: magic + kind byte + dims + payload."""
    kind_code = {"image": 1, "audio": 2, "video": 3}[kind]
    return b"FAKE" + struct.pack("<BII", kind_code, width, height) + payload


def _decode_stub(blob: bytes) -> tuple[str, int, int, np.ndarray]:
    if blob[:4] == b"FAKE":
        kind_code, width, height = struct.unpack("<BII", blob[4:13])
        kind = {1: "image", 2: "audio", 3: "video"}.get(kind_code, "image")
        payload = blob[13:]
    else:
        kind, width, height, payload = "image", 0, 0, blob
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) >> 4,
        minlength=FEATURE_BINS).astype(np.float32)
    total = counts.sum()
    feats = counts / total if total else counts
    return kind, width, height, feats


def decode_media_features(df: DataFrame, binary_col: str,
                          id_col: str = "media_id",
                          mode: str = "stub") -> DataFrame:
    """(id, binary) → MEDIA_SCHEMA rows via Arrow-batched mapInPandas."""
    if mode == "real":
        raise NotImplementedError(
            "no image/audio codecs in this container — plug a real decoder "
            "into multimodal._decode_stub (PIL.Image.open / soundfile / "
            "av.open) and keep the same (kind, width, height, features) "
            "contract")
    if mode != "stub":
        raise ValueError(f"unknown mode {mode!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                if blob is None:
                    continue
                kind, w, h, feats = _decode_stub(bytes(blob))
                rows.append((int(mid), kind, w, h, len(blob),
                             feats.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return df.select(id_col, binary_col).mapInPandas(fn, MEDIA_SCHEMA)


def sample_video_frames(df: DataFrame, binary_col: str,
                        id_col: str = "media_id",
                        every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' (byte window in
    the stub).  Real decode would substitute av.open + frame iteration."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_features", T.ArrayType(T.FloatType())),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                payload = b[13:] if b[:4] == b"FAKE" else b
                for i in range(0, max(len(payload), 1), every_n_bytes):
                    window = payload[i:i + every_n_bytes]
                    if not window:
                        break
                    _, _, _, feats = _decode_stub(b"FAKE" + b"\x01" + b"\x00" * 8 + window)
                    rows.append((int(mid), i // every_n_bytes, feats.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.select(id_col, binary_col).mapInPandas(fn, schema)
