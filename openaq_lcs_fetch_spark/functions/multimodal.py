"""Multimodal columns (north-star, BASELINE.json).

Images/audio/video travel as opaque ``binary`` payload columns with
typed metadata (schemas.MULTIMODAL). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` transforms —
the only sane shape at 100 TB: payloads never leave the executor, one
Python worker per partition, batch-columnar transfer.

The actual codecs (PIL/libav) are NOT in this container, so the decode
step is stubbed: ``decode_stub`` raises NotImplementedError unless
``deterministic_fake=True``, which produces a seeded fake feature
vector from the payload digest — making the full Spark plumbing
(schema, partitioning, UDF signature, batch shape) real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_features
FEATURE_SCHEMA = (
    "asset_id string, modality string, n_bytes int, digest string, "
    "feature array<float>, decode_status string"
)

_FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats derived from
    the sha256 digest (stable across engines/runs)."""
    dig = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in dig[:_FEATURE_DIM]]


def decode_stub(payload: bytes, modality: str, deterministic_fake: bool = False):
    """The decode boundary. Real codecs are not installed here — gate
    them behind this function so the pipeline shape is final."""
    if deterministic_fake:
        return _fake_feature(payload)
    raise NotImplementedError(
        f"no {modality} codec in this environment; pass deterministic_fake=True "
        "for plumbing tests or install a decoder"
    )


def extract_features(assets: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over payload binaries.

    Batch shape: one pandas DataFrame per Arrow batch; payload bytes
    stay in the worker. Output is flat + typed so downstream similarity
    search (plans/simsearch.py) composes directly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                }
            )
            feats, status = [], []
            for payload, modality in zip(payloads, pdf["modality"]):
                if payload is None:
                    feats.append(None)
                    status.append("null_payload")
                    continue
                try:
                    feats.append(decode_stub(payload, modality, deterministic_fake))
                    status.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    status.append("no_codec")
            out["feature"] = feats
            out["decode_status"] = status
            yield out

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (asset_id, frame_index) rows
    for the frames a decoder would extract — the partition-explode
    shape is real; the pixel decode is behind decode_stub."""
    n_frames = (F.length("payload") / F.lit(1024)).cast("int") + 1  # fake frame count
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


#: output schema of resize_images
RESIZE_SCHEMA = (
    "asset_id string, target_w int, target_h int, n_bytes_in int, "
    "resized_digest string, resize_status string"
)


def resize_images(
    assets: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas image resize — the remaining brief op alongside
    decode / feature-extract / frame-sample. Real pixel work is behind
    the same env-gated boundary as ``decode_stub``; the deterministic
    fake emits sha256(payload || 'WxH') so the full Arrow plumbing
    (batch shape, schema, per-partition execution) is testable and the
    output is reproducible across engines. Payloads never leave the
    executor; at 100 TB this is a map-only stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{target_w}x{target_h}".encode()
        for pdf in batches:
            digests, status = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    digests.append(None)
                    status.append("null_payload")
                elif deterministic_fake:
                    digests.append(hashlib.sha256(bytes(payload) + tag).hexdigest())
                    status.append("ok")
                else:
                    digests.append(None)
                    status.append("no_codec")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "n_bytes_in": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int32"),
                    "resized_digest": digests,
                    "resize_status": status,
                }
            )

    return assets.mapInPandas(run, RESIZE_SCHEMA)
