"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
Pandas functions over ``mapInPandas`` (SURVEY.md §2.7 north star). The
container has no image/audio libraries, so the actual codec step is
STUBBED — gated behind an import-try with a clearly-marked
deterministic fake — while everything Spark-side (schema, partitioning,
UDF signatures, batch iteration) is real and tested.

Scale notes: binary payloads dominate row size, so asset tables should
be written with small ``maxRecordsPerFile`` / row-group targets;
``mapInPandas`` streams Arrow batches, keeping peak memory to one batch
of payloads per task, and decode parallelism is just partition count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a real binary-column asset table from the documents table
    (UTF-8 payloads) — exercises the exact plumbing media would use."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("data"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias(
            "meta"
        ),
    )


def _bmp_dims(payload: bytes) -> tuple[int, int] | None:
    """REAL decode for one format: BMP headers are parseable with the
    stdlib alone — 'BM' magic, then the BITMAPINFOHEADER carries
    int32-LE width at byte 18 and height at byte 22 (negative height =
    top-down row order; dimension is its magnitude). Returns None for
    non-BMP payloads."""
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    return abs(width), abs(height)


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decoder (no codecs in this container): derives
    pseudo-dimensions from payload bytes. Used only when neither the
    stdlib BMP parse nor PIL can decode — the Spark-side contract is
    identical."""
    h = sum(payload[:16]) if payload else 0
    return 16 + h % 64, 16 + (h // 64) % 64


def _pil_dims(payload: bytes) -> tuple[int, int] | None:
    """Real decode via PIL when the codec library is present (PNG/JPEG/
    GIF/...); None when PIL is absent or the payload isn't an image it
    recognizes."""
    if not HAVE_PIL:
        return None
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height)
    except Exception:
        return None


def _decode_dims(payload: bytes) -> tuple[int, int]:
    """Real decode first (stdlib BMP parse, then PIL if installed);
    clearly-marked deterministic fake only as the last resort."""
    return _bmp_dims(payload) or _pil_dims(payload) or _fake_decode_dims(payload)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode step over ``mapInPandas``: Arrow batches in, decoded
    metadata out. BMP payloads decode for real (stdlib header parse);
    other formats decode via PIL when it is installed, else fall back
    to the marked deterministic fake."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["data"].map(_decode_dims)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return assets.mapInPandas(decode, DECODED)


def byte_histogram_features(assets: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction over ``mapInPandas``: normalized byte
    histogram (a real, deterministic stand-in for an embedding model;
    the batch shape — binary in, fixed-dim vector out — is the same)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["data"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % n_bins, minlength=n_bins).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.mapInPandas(featurize, FEATURES)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub for video assets: emits deterministic byte
    offsets (real implementation would emit decoded frames as binary)."""
    video = assets.filter(F.col("kind") == "video")
    n = F.octet_length("data")
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (n * i / F.lit(n_frames)).cast("long"),
    )
    return video.select("asset_id", F.explode(offsets).alias("frame_offset"))
