"""Schema-enforced file ingestion with a corrupt-record dead letter.

The REST sources dead-letter malformed *rows* (sources/rest.py
non-dict drop, streaming late-data dead letter); this is the same
contract at the file boundary: bronze JSON/CSV drops land with
whatever upstream wrote, and a malformed line must neither kill the
job (FAILFAST) nor silently vanish (DROPMALFORMED). PERMISSIVE mode
routes each bad line's raw text into the corrupt-record column; the
split returns (good rows, dead letters) so the pipeline loads clean
data and quarantines the rest for inspection — the reference's
retry/skip ingestion posture, made auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Column that carries a bad line's raw text.
CORRUPT_COL = "_corrupt_record"


def read_with_dead_letter(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    options: dict[str, str] | None = None,
    scope=None,
) -> tuple[DataFrame, DataFrame]:
    """Read ``path`` under ``schema``; return ``(good, dead)``.

    ``good`` carries exactly the declared schema; ``dead`` is one
    string column (``raw``) of the malformed lines. The source frame
    is cached before splitting: Spark disallows filtering on the
    internal corrupt-record column of a lazy scan (the parser would
    need the raw line after pruning dropped it), and the cache also
    guarantees both halves come from ONE read of the input.

    The cache is scan-sized and cannot be dropped here (either half
    may be read later). Per-batch ingestion loops MUST pass an
    ``operators.caching.CacheScope`` as ``scope`` and release it once
    both halves are consumed — otherwise each call accumulates a
    session-lifetime cached scan on the driver-heap-bounded local
    engine. ``scope=None`` keeps the session-scoped behavior for
    one-shot loads.
    """
    aug = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    reader = (
        spark.read.schema(aug)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path)
    df = scope.persist(df) if scope is not None else df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, dead
