"""Multimodal (image/audio/video) column plumbing (north-star extension).

Convention: media rows carry an opaque ``payload: binary`` plus a typed
``meta`` struct — the lakehouse pattern for multimodal training data
(decode happens as late as possible, at the consumer).

    media(media_id long, kind string, payload binary,
          meta struct<format string, width int, height int,
                      sample_rate int, duration_ms int>)

The Spark-side machinery (schema, Arrow-batched ``mapInPandas``, batch
shapes, partition sizing) is real and tested; the *codec* step is stubbed
behind ``_decode_payload`` because no image/audio libraries ship in this
container — it raises ``NotImplementedError`` unless ``allow_stub=True``
selects the deterministic fake decoder (byte-statistics features), which
keeps the pipeline end-to-end runnable and testable.

Scale notes: payloads dominate row size, so ops here must avoid shuffling
payload bytes. Feature extraction is map-only (``mapInPandas``); the one
repartition knob offered is by ``media_id`` for downstream joins *after*
features are extracted and payloads dropped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("feat_mean", LongType()),   # deterministic byte statistics
        StructField("feat_head", LongType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the media
    pipeline is exercisable on the driver testdata (no real image files in
    the environment)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("utf-8").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _make_decode_payload():
    """Factory so the decode stub's qualname contains ``<locals>`` and
    cloudpickle ships it to Python workers BY VALUE (workers don't have
    this package importable — see similarity._make_dot_q_batch)."""

    def _decode_payload(payload: bytes, kind: str, allow_stub: bool) -> tuple[int, int]:
        """Codec boundary. Real decoders (PIL/libav/...) are not available
        in this container; the stub produces deterministic byte statistics
        so the surrounding distributed plumbing stays fully testable."""
        if not allow_stub:
            raise NotImplementedError(
                f"no codec available for kind={kind!r}; install decoders or "
                "pass allow_stub=True for deterministic fake features"
            )
        if not payload:
            return 0, 0
        total = sum(payload) // len(payload)
        head = int.from_bytes(payload[:4].ljust(4, b"\0"), "big")
        return total, head

    return _decode_payload


_decode_payload = _make_decode_payload()


def extract_features(media: DataFrame, allow_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    ``mapInPandas`` keeps this map-only (no shuffle of payloads) and
    batch-oriented: each pandas batch holds whole payloads, the return
    drops them — the output is narrow feature rows.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p if p is not None else b"", k, allow_stub)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feat_mean": [f[0] for f in feats],
                    "feat_head": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_head_hex", StringType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4, allow_stub: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: keep every ``stride``-th frame.

    The 1→N ``mapInPandas`` shape — each input row yields a variable
    number of narrow frame rows, payload bytes never shuffle. Real
    pipelines plug a container demuxer into the codec boundary; the stub
    treats the payload as concatenated fixed-size byte frames
    (deterministic, so the distributed plumbing is oracle-checkable).
    """
    if not allow_stub:
        raise NotImplementedError(
            "no video demuxer available in this container; "
            "pass allow_stub=True for the fixed-size-frame stub"
        )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, heads = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    chunk = p[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(chunk))
                    heads.append(chunk[:4].hex().upper())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_head_hex": pd.Series(heads, dtype="object"),
                }
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, allow_stub: bool = True
) -> DataFrame:
    """Resize for image payloads: payload → payload with updated meta —
    the payload-preserving ``mapInPandas`` shape. The stub crops/pads the
    byte buffer to width*height (a real pipeline swaps in an image codec
    at the same boundary; schema and batch shape are unchanged)."""
    if not allow_stub:
        raise NotImplementedError(
            "no image codec available in this container; "
            "pass allow_stub=True for the crop/pad stub"
        )
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                (bytes(p) if p is not None else b"")[:target].ljust(target, b"\0")
                for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = [
                {
                    "format": (m or {}).get("format"),
                    "width": width,
                    "height": height,
                    "sample_rate": (m or {}).get("sample_rate"),
                    "duration_ms": (m or {}).get("duration_ms"),
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Payload-size stats per kind — pure relational (oracle-checkable):
    the metadata-only pass a pipeline runs before deciding what to decode."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min(F.length("payload")).alias("min_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
