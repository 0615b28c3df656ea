"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` — the only sane shape at 100 TB (no per-row Python, no
driver collection; each batch is one Arrow buffer).

The actual media codecs are NOT available in this environment, so the
decode kernel is a clearly-marked deterministic stub
(:func:`fake_decode_batch`); the Spark-side plumbing — schema, batch
iteration, partitioning — is real and tested. Swapping the stub for
Pillow/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Schema of a multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

#: Output of the decode/feature-extract stage.
DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def text_as_assets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat UTF-8 text bytes as an opaque media payload.

    Lets every downstream multimodal operator be exercised against the
    driver's ``documents`` table until real media arrives.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("application/octet-stream").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def fake_decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """STUB decode kernel (real codecs unavailable in this container).

    Deterministic fake: "dimensions" derive from the payload length and
    an md5 checksum is computed — exercising the real batch shape
    (payload bytes in, typed metadata out) end to end. Replace the body
    with PIL/av/librosa for real decoding; the mapInPandas contract is
    unchanged.
    """
    import hashlib

    import pandas as pd

    for pdf in batches:
        n = pdf["payload"].map(lambda b: 0 if b is None else len(b))
        checksum = pdf["payload"].map(
            lambda b: None if b is None else hashlib.md5(b).hexdigest()
        )
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n.astype("int64"),
                "width": (n % 1920).astype("int32"),
                "height": (n % 1080).astype("int32"),
                "checksum": checksum,
            }
        )


def decode_assets(assets: DataFrame, decoder=None) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched ``mapInPandas``.

    Narrow transformation — runs in place on each input split, no
    shuffle; batch size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.

    ``decoder`` is the codec seam: any ``Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame]`` kernel producing :data:`DECODED_SCHEMA`
    columns (a Pillow/av-backed implementation drops in unchanged);
    defaults to the deterministic :func:`fake_decode_batch` stub
    because real media codecs are absent in this environment.
    """
    return assets.mapInPandas(
        decoder or fake_decode_batch, schema=DECODED_SCHEMA
    )


#: Output of the resize stage: the downsized payload plus its new
#: metadata (the real-kernel contract: bytes in, smaller bytes out).
RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("r_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def fake_resize_batch(target_w: int = 64, target_h: int = 48):
    """STUB resize kernel factory (no image libs in this container).

    Deterministic fake with a SQL-replicable shape: the "resized"
    payload is the payload's first ``target_w * target_h`` bytes (a
    crop — real kernels would decode + interpolate; the mapInPandas
    contract, batch shape, and output schema are what's real here).
    Emits the resized byte count and an md5 checksum of the resized
    payload so the Arrow boundary is hash-checkable byte-for-byte.
    """

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        cap = target_w * target_h
        for pdf in batches:
            cropped = pdf["payload"].map(
                lambda b: None if b is None else bytes(b)[:cap]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": target_w,
                    "height": target_h,
                    "r_bytes": cropped.map(
                        lambda b: 0 if b is None else len(b)
                    ).astype("int64"),
                    "checksum": cropped.map(
                        lambda b: None
                        if b is None
                        else hashlib.md5(b).hexdigest()
                    ),
                }
            ).astype({"width": "int32", "height": "int32"})

    return _resize


def resize_assets(
    assets: DataFrame,
    target_w: int = 64,
    target_h: int = 48,
    resizer=None,
) -> DataFrame:
    """Resize stage over ``ASSET_SCHEMA`` rows — Arrow-batched
    ``mapInPandas``; ``resizer`` is the kernel seam (swap in a
    PIL/OpenCV kernel with the same batch contract)."""
    return assets.mapInPandas(
        resizer or fake_resize_batch(target_w, target_h),
        schema=RESIZED_SCHEMA,
    )


#: Output of the frame-sampling stage: one row per sampled frame.
FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: one asset row → ``n_frames`` frame rows.

    STUB frame extraction (no video codecs in this container): frames
    are equal byte-slices of the payload, deterministic per asset. The
    Spark-side contract is the real one — a row-expanding
    ``mapInPandas`` (Arrow in, Arrow out, no shuffle), exactly how a
    pyav-based sampler would run; only the slicing body changes.
    """

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame_bytes": [], "n_bytes": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step] or data[:step]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(chunk)
                    out["n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return assets.mapInPandas(_sample, schema=FRAME_SCHEMA)


#: Output of the feature-extraction stage.
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def byte_histogram_features(
    frames: DataFrame, bins: int = 16, normalize: bool = True
) -> DataFrame:
    """Feature extraction over frames — NOT a stub: an L2-normalized
    byte-value histogram is a genuine (if crude) content signature for
    any binary payload. Runs as a vectorized ``mapInPandas`` with
    numpy doing the binning per Arrow batch.

    The output ``features`` column is the same ``array<double>`` shape
    as the ``embeddings`` table, so the ANN operators
    (:mod:`capital.llm.similarity`, :mod:`capital.llm.ivf`) consume it
    directly — the multimodal → similarity pipeline end to end.

    ``normalize=False`` emits the raw integer counts (exact doubles):
    the hash-stable form the DuckDB oracle replicates — normalized
    values would hinge on cross-engine round() tie-breaking.
    """

    def _featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for blob in pdf["frame_bytes"]:
                arr = np.frombuffer(
                    b"" if blob is None else bytes(blob), dtype=np.uint8
                )
                if arr.size == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(
                    arr // (256 // bins), minlength=bins
                ).astype("float64")
                norm = np.linalg.norm(hist) if normalize else 0.0
                feats.append((hist / norm if norm else hist).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "frame_idx": pdf["frame_idx"],
                    "features": feats,
                }
            )

    return frames.mapInPandas(_featurize, schema=FEATURE_SCHEMA)
