"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark-side contract is fully real and tested — schemas, partitioning
behavior, UDF signatures, batch shapes, metadata extraction. The actual
media codecs are NOT available in this environment, so the decode kernels
are stubbed: ``decoder="fake"`` is a deterministic byte-derived decoder
(stable across runs/processes — usable in tests and benchmarks), while
``decoder="real"`` raises NotImplementedError at the exact seam where a
production deployment plugs in PIL/ffmpeg inside the same mapInPandas
iterator.

Scale notes:
* media bytes never pass through a shuffle in any operator here — every
  stage is a narrow mapInPandas over the scan, and outputs carry only
  metadata/features (KBs, not MBs);
* `mapInPandas` streams an *iterator* of batches, so one task never holds
  more than spark.sql.execution.arrow.maxRecordsPerBatch media blobs in
  memory — the knob that keeps 100 MB videos from OOMing a 4 GB executor;
* metadata extraction (`binary_meta`) is pure JVM expression — the common
  "manifest pass" over 100 TB of media runs with zero Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, declared_w int, "
    "declared_h int"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "features array<float>"
)

FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def pack_media(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id",
    media_type: str = "image",
) -> DataFrame:
    """Build a typed media table from any source column: payload =
    utf-8 bytes (deterministic stand-in for real media bytes), declared
    dims derived from byte length. JVM-only (encode/length/hash)."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        (F.pmod(F.octet_length(payload), F.lit(64)) + 1).cast("int")
        .alias("declared_w"),
        (F.pmod(F.octet_length(payload), F.lit(48)) + 1).cast("int")
        .alias("declared_h"),
    )


def binary_meta(media: DataFrame) -> DataFrame:
    """Manifest pass: per-item byte count + sha256 — pure JVM expressions
    (the 100 TB integrity/inventory scan costs no Python at all). The sha
    here is over the payload bytes, the same per-row invariant the index
    build enforces on text (BASELINE content-sha equality)."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in decoder: dims + features derived purely from
    the bytes (stable across processes; no RNG, no hash())."""
    n = len(payload)
    width = n % 64 + 1
    height = n % 48 + 1
    arr = np.frombuffer(payload, dtype=np.uint8)
    # 16 bucket-means over the byte stream = a cheap, deterministic
    # "embedding" with the right shape/dtype for downstream ANN ops.
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    feats = arr.reshape(FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
    return width, height, feats


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract stage: mapInPandas over (doc_id, payload)
    batches → (doc_id, n_bytes, width, height, features[16]).

    ``decoder="real"`` marks the production seam (PIL/libav decode inside
    the same iterator) — NotImplementedError here, per environment.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media codecs are not available in this "
                    "environment; plug PIL/ffmpeg decode in here"
                )
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                w, h, feats = _fake_decode(b)
                rows.append((doc_id, mtype, len(b), w, h, feats.tolist()))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "width", "height",
                    "features",
                ],
            )

    return media.select(
        "doc_id", "media_type", "payload"
    ).mapInPandas(run, DECODED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling stub: split the payload into n_frames
    evenly-spaced byte slices (the real implementation seeks keyframes with
    libav inside the identical iterator shape). Output is exploded —
    (doc_id, frame_idx, frame_bytes) — ready for per-frame decode_media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not b:
                    continue
                step = max(1, len(b) // n_frames)
                for i in range(min(n_frames, len(b))):
                    rows.append((doc_id, i, b[i * step:(i + 1) * step]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes"]
            )

    return media.select("doc_id", "payload").mapInPandas(run, FRAMES_SCHEMA)
