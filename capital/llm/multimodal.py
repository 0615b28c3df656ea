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
    BinaryType,
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


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched ``mapInPandas``.

    Narrow transformation — runs in place on each input split, no
    shuffle; batch size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    return assets.mapInPandas(fake_decode_batch, schema=DECODED_SCHEMA)
