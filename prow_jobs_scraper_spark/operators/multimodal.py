"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The image/audio codec libraries are not present in this container, so the
actual decode is STUBBED — :func:`_decode_image_stub` raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which case
it derives a deterministic fake pixel tensor from the bytes (so the whole
Spark-side pipeline — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested end-to-end).

Schema contract:

    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feat array<float>"
)

RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def _decode_image_stub(payload: bytes, width: int, height: int,
                       deterministic_fake: bool) -> np.ndarray:
    """STUB: real decode would use PIL/libjpeg (not in this container).

    deterministic_fake derives an (h, w, 3) uint8 tensor from the bytes —
    stable across runs/executors so tests can assert exact values."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg — not available in this "
            "container; pass deterministic_fake=True for the test path"
        )
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_features(media: DataFrame, deterministic_fake: bool = True,
                     feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract per media row (mapInPandas, Arrow batches).

    The 'feature' is channel-wise mean/std pooling of the (fake-)decoded
    tensor — the real model call slots into the same batch loop."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 4)
                h = int(meta["height"] or 4)
                img = _decode_image_stub(payload, w, h, deterministic_fake)
                v = img.reshape(-1, 3).astype(np.float64)
                f8 = np.concatenate([v.mean(axis=0), v.std(axis=0),
                                     [v.min(), v.max()]])
                feats.append(f8[:feat_dim].astype(np.float32).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feat": feats,
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  deterministic_fake: bool = True) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw bytes out).
    Real JPEG re-encode is part of the stubbed decode boundary."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 4)
                h = int(meta["height"] or 4)
                img = _decode_image_stub(payload, w, h, deterministic_fake)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                payloads.append(img[yi][:, xi].tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": out_w,
                "height": out_h,
                "payload": payloads,
            })

    return media.where(F.col("kind") == "image").mapInPandas(
        op, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2,
                  deterministic_fake: bool = True) -> DataFrame:
    """Video frame sampling: explode every_n-th frame index per video row
    (frame decode itself stubbed like images)."""
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        "payload", "meta",
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta, fi in zip(pdf["payload"], pdf["meta"],
                                         pdf["frame_idx"]):
                img = _decode_image_stub(
                    payload + int(fi).to_bytes(4, "little"),
                    int(meta["width"] or 4), int(meta["height"] or 4),
                    deterministic_fake)
                feats.append(float(img.mean()))
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "frame_idx": pdf["frame_idx"],
                                "mean_intensity": feats})

    return frames.mapInPandas(
        op, schema="media_id long, frame_idx int, mean_intensity double")


def media_from_docs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from a text corpus, entirely in
    Catalyst: payload = UTF-8 bytes of the text, kind/meta keyed off the
    id. Exists so the media pipeline's driver entry has a DuckDB oracle —
    the payload byte length is ``octet_length(encode(text))`` in SQL —
    while still exercising the real binary-column + mapInPandas path."""
    # pmod, not % — Spark's % is signed, and engine doc ids (xxhash64)
    # are negative ~half the time: element_at(kinds, -1%3 + 1) would be
    # index 0 (runtime error) and the meta dims would go negative. pmod
    # keeps the mapping total over all int64 ids and matches the DuckDB
    # oracle's ((doc_id % 3) + 3) % 3.
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"))
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.col(id_col), F.lit(13)) + 4).cast("int").alias("width"),
            # reduce mod 13 BEFORE the ×7: id*7 overflows int64 (ANSI
            # error) near the extremes; pmod(pmod(id,13)*7,13) is equal
            (F.pmod(F.pmod(F.col(id_col), F.lit(13)) * 7, F.lit(13)) + 4)
             .cast("int").alias("height"),
            F.when(kind == "audio", 16000).otherwise(0)
             .cast("int").alias("sample_rate"),
            F.when(kind == "video", (F.pmod(F.col(id_col), F.lit(7)) + 2))
             .otherwise(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def synth_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 64)))
        rows.append((
            i, kind, bytearray(payload),
            {"width": int(rng.integers(4, 17)),
             "height": int(rng.integers(4, 17)),
             "sample_rate": 16000 if kind == "audio" else 0,
             "n_frames": int(rng.integers(2, 9)) if kind == "video" else 1},
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
