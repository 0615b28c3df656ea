"""Layered-lake IO: readers and ``ymd``-partitioned writers.

The reference organizes an S3 lake as landing/bronze/silver/gold with
Hive-style ``ymd=YYYY-MM-DD`` partition keys on every bronze dataset
(reference: dags/common/constants.py:23-33) and idempotent per-partition
overwrites (dags/common/s3_utils.py:13; glue_job_scripts/
industry_code_glue_job.py:56-66). Here that becomes:

- one root path per layer (plain parquet; any object store URI works),
- ``partitionBy("ymd")`` writes with *dynamic* partition overwrite so a
  backfill of one day never truncates the table,
- schema-pinned reads via :mod:`capital.schemas` at the bronze→silver
  edge (the Glue-crawler-then-pin pattern, SURVEY.md §1.3).

At 100 TB the partition column is what makes any daily query feasible:
Catalyst prunes ``ymd`` partitions before the scan, so per-day work
reads one day, not the lake.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Lake layers, mirroring the medallion constants
#: (reference: dags/common/constants.py:23-28).
LAYERS = ("landing", "bronze", "silver", "gold")

#: Canonical partition key (reference: dags/common/constants.py:30-33).
YMD = "ymd"

#: Tables materialized by the test-data driver (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class Lake:
    """A rooted medallion lake; paths only, no session state."""

    root: str

    def path(self, layer: str, table: str) -> str:
        if layer not in LAYERS:
            raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
        return os.path.join(self.root, layer, table)


#: (applicationId, sessionUUID, sf_dir, name) → DataFrame. A DataFrame
#: is an immutable plan, so handing the same one to every caller is
#: safe; the win is skipping the per-call file listing + parquet footer
#: read (~0.1–0.15 s of fixed driver-side latency per query, measured
#: at sf0.1 — the dominant share of the small-query gap vs the DuckDB
#: anchor). Keyed per session (not just per application) because
#: ``newSession()`` siblings share an applicationId but not runtime SQL
#: conf — a plan analyzed under one timezone must not serve another.
_TABLE_CACHE: dict[tuple[str, str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table from a scale-factor dir.

    ``events.ts`` has shipped as two different parquet physical types
    across driver generations, both normalized to a plain UTC
    ``timestamp`` here so downstream code sees one type:

    - TIMESTAMP(NANOS): illegal for Spark's reader; with ``nanosAsLong``
      (set by :mod:`capital.session`) it arrives as LongType nanos and
      is floored to a microsecond timestamp — the same truncation
      DuckDB applies when surfacing TIMESTAMP_NS.
    - timestamp[us] without timezone: Spark reads TIMESTAMP_NTZ; under
      the engine's pinned-UTC session a cast to ``timestamp``
      reinterprets the wall clock as UTC — exactly how DuckDB treats
      the same naive value, so oracle ``CAST(ts AS TIMESTAMP)`` parity
      holds.
    """
    from capital.session import session_cache_key

    app, sess = session_cache_key(spark)
    key = (app, sess, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # Evict plans from stopped applications (pytest and long-lived
    # drivers create many sessions per process; dead appIds never hit
    # again). Sibling sessions of the live app are kept.
    for stale in [k for k in _TABLE_CACHE if k[0] != app]:
        del _TABLE_CACHE[stale]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Integer division: nanos exceed 2^53, a double round-trip
            # would lose precision.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Wall clock → UTC instant (session timezone is pinned UTC).
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every driver table; keys match DuckDB's pre-registered views."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> None:
    """Expose driver tables as temp views for ``spark.sql`` use.

    Pass ``tables`` to register only what the query touches — the
    default registers all ten, which re-plans ten reads per call.
    """
    for name in tables if tables is not None else TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def clear_engine_cache(spark: SparkSession) -> None:
    """Release every DataFrame the engine persisted (LSH signatures,
    shingle sets, bucketed corpora). The long-lived driver session
    accumulates these otherwise; call between unrelated workloads."""
    spark.catalog.clearCache()


def plan_checkpointer(spark: SparkSession, checkpoint_dir: str | None):
    """Plan-truncation strategy for iterative operators (connected
    components, PageRank): returns a ``df -> df`` function.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-local
    blocks: fastest, but an executor loss mid-job loses the truncated
    lineage AND the data — on a 1000-executor cluster a multi-hour
    iteration dies with one machine). A reliable-storage directory
    (HDFS/S3 path) → ``setCheckpointDir`` + ``checkpoint``: each
    round's state survives executor churn, the reference's
    Glue-bookmark restartability posture
    (glue_job_scripts/industry_code_glue_job.py:26-31) applied to
    iteration state. Output is bit-identical either way (tested);
    only failure recovery differs. Checkpoint files accumulate per
    round — point it at a job-scoped temp path and clean up after.

    The localCheckpoint is LAZY (round 16, guide §1.2 — the job-floor
    model): the returned frame's logical plan is already the truncated
    LogicalRDD either way, and the first downstream action computes
    and persists every partition (LocalRDDCheckpointData's
    end-of-job fill-in covers partial actions like ``take``), so the
    eager form's dedicated materialization job bought nothing — one
    job per barrier instead of two, output identical. The
    reliable-storage path stays eager: a non-local ``checkpoint``
    recomputes its RDD during the checkpoint job unless persisted
    first, so a lazy form would double every consumer's work.
    """
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=False)
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)


@contextmanager
def overlapped_job(fn, *args, **kwargs):
    """Run one independent Spark action on a driver thread (guide §2.6
    "overlap independent jobs": FIFO scheduling back-fills the small
    job into idle task slots) and yield its future.

    Failure hygiene (round 17): if the caller's body raises before it
    consumes the future, the bare ``submit`` pattern leaked a running
    background Spark job against the session (the worker thread is
    non-daemon, so it also kept the process alive). On exit this
    cancels the future if it is still queued and joins the worker —
    a bounded wait, since the overlapped work is by contract one
    bounded action — so no background job ever outlives the call.
    In the success path the future is already done and the shutdown
    returns immediately.
    """
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    future = pool.submit(fn, *args, **kwargs)
    try:
        yield future
    finally:
        future.cancel()
        pool.shutdown(wait=True)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = YMD,
    mode: str = "overwrite",
) -> None:
    """Write a ``ymd=``-partitioned parquet dataset.

    With ``partitionOverwriteMode=dynamic`` (set by
    :func:`capital.session.get_spark`) mode="overwrite" replaces only the
    partitions present in ``df`` — the engine's version of the
    reference's idempotent ``replace=True`` S3 upload
    (dags/common/s3_utils.py:13).
    """
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


#: Hidden working dirs for :func:`compact_partition` — leading ``.``
#: keeps them invisible to Spark/Hive partition discovery (Hadoop's
#: hidden-path convention), so a concurrent reader of the parent table
#: can never pick up staged or backed-up files as bogus partitions.
_COMPACT_TMP = ".__compact_tmp__"
_COMPACT_OLD = ".__compact_old__"


def compact_partition(
    spark: SparkSession,
    path: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-file compaction for one lake partition directory: rewrite
    ``path`` as ``ceil(current_bytes / target_bytes)`` parquet files.

    Streaming sinks and per-day incremental appends accumulate many
    small files; at 100 TB small files dominate scan planning time and
    NameNode/S3-listing load, so compaction is a standing maintenance
    job (the reference's daily ``replace=True`` rewrite had the same
    effect implicitly). Reads the partition once, coalesces (no
    shuffle — file-merge only), then swaps the compacted directory in.

    Crash safety (this is *crash-recoverable*, not atomic): staging and
    backup live under hidden dirs in the table root
    (``.__compact_tmp__`` / ``.__compact_old__``) that partition
    discovery skips, so readers never see half-written or duplicate
    data. The swap itself is two renames; a crash between them leaves
    the partition ABSENT with the data intact in the backup — run
    :func:`recover_compaction` (idempotent, at job start) to restore.
    Single-writer per partition is assumed, as with any lake
    maintenance job. This implementation drives a local filesystem
    (pathlib/shutil); an object-store deployment swaps the rename
    primitives, the protocol is unchanged. Returns the file count.
    """
    import math
    import pathlib
    import shutil

    part = pathlib.Path(path.rstrip("/"))
    current = sum(f.stat().st_size for f in part.rglob("*.parquet"))
    n_files = max(1, math.ceil(current / target_bytes))
    staging = part.parent / _COMPACT_TMP / part.name
    backup = part.parent / _COMPACT_OLD / part.name
    shutil.rmtree(staging, ignore_errors=True)
    staging.parent.mkdir(parents=True, exist_ok=True)
    df = spark.read.parquet(str(part))
    df.coalesce(n_files).write.mode("overwrite").parquet(str(staging))
    shutil.rmtree(backup, ignore_errors=True)
    backup.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), str(backup))   # crash after this: recoverable
    shutil.move(str(staging), str(part))  # via recover_compaction()
    shutil.rmtree(backup)
    return n_files


def recover_compaction(path: str) -> bool:
    """Restore a partition lost to a compaction crashed mid-swap:
    if ``path`` is absent but its ``.__compact_old__`` backup exists,
    move the backup into place. Idempotent; run before compacting.
    Returns True when a recovery happened."""
    import pathlib
    import shutil

    part = pathlib.Path(path.rstrip("/"))
    backup = part.parent / _COMPACT_OLD / part.name
    if not part.exists() and backup.exists():
        shutil.move(str(backup), str(part))
        return True
    return False


#: analyzed-plan nodes that preserve their child's partitioning — a
#: chain of these above a file relation means the frame's splits ARE
#: the scan's splits.
_NARROW_NODES = (
    "Project", "Filter", "Generate", "SubqueryAlias", "MapInPandas",
    "Relation", "LogicalRelation", "View",
)


def _scan_split_decision(plan: str) -> str:
    """Walk the analyzed plan TOP-DOWN and classify the frame's
    partitioning at the first decisive node (round-15 review — tree
    order matters: a keyed aggregate BELOW a coalesce is still
    starved):

    - ``"exchange"``: the first non-narrow node is a keyed Aggregate
      (two bracket groups — a global aggregate collapses to one
      partition), a Deduplicate, a Window with a NON-empty partition
      spec, or a global Sort (``…, true`` — a range exchange;
      sortWithinPartitions prints ``false`` and exchanges nothing) →
      the frame carries ``spark.sql.shuffle.partitions`` splits by
      engine policy; no probe, and no double-shuffle "fix".
    - ``"scan"``: only narrow nodes down to a file relation → splits
      follow the file layout; estimate from ``inputFiles``.
    - ``"unknown"``: anything else first (Join — broadcast inherits
      the probe scan's splits; Repartition — may be coalesce(1);
      empty-spec Window; Union, Limit, LocalRelation, checkpointed
      RDDs, …) → exact probe.
    """
    import re

    for m in re.finditer(r"(?m)^[\s+:\-]*'?(\w+)([^\n]*)", plan):
        node, rest = m.group(1), m.group(2)
        if node.startswith("Deduplicate"):
            return "exchange"
        if node == "Aggregate":
            return (
                "exchange"
                if re.match(r" \[[^\]]+\], \[", rest)
                else "unknown"
            )
        if node == "Window":
            spec = re.search(r"\], \[([^\]]*)\], \[", rest)
            return (
                "exchange"
                if spec and spec.group(1).strip()
                else "unknown"
            )
        if node == "Sort":
            return (
                "exchange" if rest.rstrip().endswith("true")
                else "unknown"
            )
        if node.startswith(_NARROW_NODES):
            if node.startswith(("Relation", "LogicalRelation")):
                return "scan"
            continue
        return "unknown"
    return "unknown"


def _parse_bytes(v: str) -> int:
    """Spark size-string ('128MB', '4m', '134217728b', bare int) → bytes."""
    s = str(v).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    return int(float(s)) * mult


def _estimate_scan_splits(df: DataFrame, files: list[str]) -> int | None:
    """FileSourceScan split estimate from local file sizes (Spark's
    packing formula: per-core bytes vs maxPartitionBytes/openCost),
    ~1 ms instead of the ~0.1 s DataFrame→RDD translation. Returns
    None when any file is non-local (can't stat cheaply)."""
    import math
    import os

    sizes = []
    for f in files:
        p = f
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        if not p.startswith("/"):
            return None
        try:
            sizes.append(os.stat(p).st_size)
        except OSError:
            return None
    spark = df.sparkSession
    maxpb = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    opencost = _parse_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4MB")
    )
    par = spark.sparkContext.defaultParallelism
    total = sum(sizes) + len(sizes) * opencost
    max_split = min(maxpb, max(opencost, total // max(par, 1) + 1))
    return max(1, math.ceil(total / max_split))


def parallelize_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a DataFrame that arrived with too few input splits
    before CPU-heavy narrow work (hashing, similarity kernels).

    Small files scan as one split; a per-row-expensive projection then
    runs on one core no matter how many the cluster has. One cheap
    shuffle of the raw rows buys full parallelism — measured 14× on the
    MinHash signature stage. At 100 TB inputs already have thousands of
    splits and this is a no-op.

    Split-starvation probe (round 15): the old
    ``.rdd.getNumPartitions()`` check paid ~0.1 s of plan translation
    on EVERY call (the round-14 verdict's micro item, multiplied
    across most sub-second queries). The ANALYZED plan (cheap,
    rule-based, cached on the same QueryExecution the action uses;
    the unresolved plan hides withColumn-built operators) is walked
    top-down by :func:`_scan_split_decision`: a keyed exchange first
    → no-op with no probe; narrow-to-file-relation → split estimate
    from ``inputFiles()`` + local stat (~1 ms, Spark's packing
    formula); anything else (join/repartition/sort/window/union/
    LocalRelation/checkpoint roots) → the exact RDD probe,
    byte-identical decisions to the old form.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().analyzed().toString()
    decision = _scan_split_decision(plan)
    if decision == "exchange":
        # A keyed exchange generally lands on shuffle.partitions
        # splits — but an explicit min_partitions ABOVE that width can
        # still be starved (the old probe would have repartitioned).
        # Only the cheap no-op when the exchange width already covers
        # the target; otherwise fall through to the exact probe for
        # byte-identical decisions with the pre-round-15 form.
        try:
            width = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            width = None
        if width is not None and target <= width:
            return df
    est = None
    if decision == "scan":
        try:
            files = df.inputFiles()
        except Exception:
            files = []
        if files:
            # NOT len(files) — packing merges many small files into
            # few splits, so file count alone over-states parallelism.
            # Caveat (documented): inputFiles ignores partition
            # pruning, so a partition-filtered scan over-estimates —
            # missing a repartition (slow, never wrong); pass
            # min_partitions explicitly for pruned-scan kernels.
            est = _estimate_scan_splits(df, files)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def right_size_narrow(
    df: DataFrame,
    rows_per_task: int = 256,
    max_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """:func:`parallelize_narrow` with the split count scaled to the
    actual row count: ``ceil(rows / rows_per_task)`` capped at default
    parallelism. One cheap count job (metadata-only over a parquet
    scan) buys the right fan-out — a 2000-row vector table on
    local[32] otherwise pays 32-task scheduling on EVERY stage for
    ~60 rows of work per task (measured 0.87 s → 0.56 s on the
    embedding-cosine query at sf0.1).

    Use for cheap-per-row kernels (64-float vector math) where task
    scheduling dominates below ~``rows_per_task`` rows. CPU-heavy
    per-row kernels (document shingling/hashing) should keep
    :func:`parallelize_narrow`'s full fan-out. At cluster scale
    ``rows / rows_per_task`` far exceeds default parallelism, the cap
    engages, and this is exactly ``parallelize_narrow``.
    """
    sc = df.sparkSession.sparkContext
    cap = max_partitions or sc.defaultParallelism
    if n_rows is None:
        n_rows = df.count()
    target = max(1, min(cap, -(-n_rows // max(1, rows_per_task))))
    # No getNumPartitions() pre-check: the DataFrame→RDD conversion it
    # needs costs ~0.1 s of plan translation — more than the tiny
    # exchange it would sometimes avoid. parallelize_narrow keeps the
    # check (no count job there); here we already paid for exactness.
    if target < cap:
        return df.repartition(target)
    return parallelize_narrow(df, cap)


def union_evolving(frames: list[DataFrame]) -> DataFrame:
    """Union bronze drops whose schemas drifted across vintages:
    by-name alignment with missing columns null-filled
    (``unionByName(allowMissingColumns=True)`` folded over the list).
    The reference's multi-year API payloads gain/lose fields across
    vintages; positional ``union`` would silently misalign columns —
    this is the schema-evolution-safe form. Narrow op: no shuffle,
    the scans union at the plan level."""
    if not frames:
        raise ValueError("union_evolving needs at least one frame")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def stamp_ymd(df: DataFrame, date_col: str) -> DataFrame:
    """Derive the ``ymd`` partition key from an event-time column.

    Mirrors the reference's key templates ``.../ymd=<logical date>/...``
    (plugins/operators/yfinance_operator.py:16).
    """
    return df.withColumn(YMD, F.to_date(F.col(date_col)))


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1: JSON sink. Spark writes UTF-8 natively — the reference's
    ``ensure_ascii=False`` dance for Korean text
    (dags/common/s3_utils.py:7-14) is unnecessary here."""
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: CSV sink with header (the tempfile-and-upload path,
    dags/common/s3_utils.py:17-26, collapses to one write)."""
    df.write.mode(mode).option("header", "true").csv(path)


def execute_jdbc_statements(
    spark: SparkSession,
    url: str,
    statements: Sequence[str],
    properties: dict[str, str] | None = None,
) -> None:
    """Run DDL/DML statements over a JDBC connection from the driver.

    The reference's warehouse writes ship ``preactions`` — "DROP TABLE
    IF EXISTS …; CREATE TABLE …" executed before the COPY
    (glue_job_scripts/industry_code_glue_job.py:89-101), against an
    *authenticated* warehouse. This is that contract: statements run in
    order on one connection, outside Spark's writer, so the subsequent
    ``mode='append'`` write lands in a freshly-defined table.
    ``properties`` carries the connection credentials (``user`` /
    ``password`` plus any driver-specific keys — e.g. ``ssl``), exactly
    the keys Spark's own JDBC writer forwards. Uses the JVM's
    DriverManager via the active gateway — the same classpath Spark's
    JDBC writer uses, no extra Python driver needed.
    """
    jvm = spark._jvm  # noqa: SLF001
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    preactions: Sequence[str] = (),
    options: dict[str, str] | None = None,
) -> None:
    """S11/K4: warehouse sink over real JDBC with DDL preactions.

    Mirrors the reference's Redshift edge (preactions then load,
    glue_job_scripts/industry_code_glue_job.py:89-101): ``preactions``
    run first on a driver-side connection, then executors write
    partition-parallel batches. With preactions doing DROP/CREATE, use
    ``mode='append'`` (the DDL already emptied the table) — that is the
    reference's exact recipe. Credential ``options`` (``user`` /
    ``password``) are forwarded to the preactions connection too, so
    the DDL authenticates the same way the bulk write does. Scale: each
    partition opens one connection; repartition to the warehouse's
    ingest-friendly parallelism before calling for very wide clusters.
    """
    if preactions:
        cred_keys = ("user", "password", "ssl", "sslmode")
        props = {k: v for k, v in (options or {}).items() if k in cred_keys}
        execute_jdbc_statements(df.sparkSession, url, preactions, props)
    writer = df.write.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


#: SQL identifiers interpolated into upsert DDL/DML must look like
#: identifiers — table/column names reaching here from config or user
#: input would otherwise be an injection vector.
_IDENT_RE = None


def _check_identifier(name: str) -> None:
    global _IDENT_RE
    if _IDENT_RE is None:
        import re

        _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")
    if not _IDENT_RE.match(name):
        raise ValueError(
            f"unsafe SQL identifier {name!r}: expected "
            "[schema.]name of word characters (upsert_jdbc interpolates "
            "identifiers into DELETE/INSERT statements)"
        )


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    staging_table: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Keyed warehouse upsert: stage → transactional DELETE+INSERT.

    The reference's silver jobs refresh by preaction DROP/CREATE (full
    replace); incremental daily loads need the merge form instead:
    write the batch to a staging table (partition-parallel, like any
    JDBC write), then on one driver-side connection atomically delete
    the target rows whose ``keys`` appear in staging and insert the
    staged rows. DELETE+INSERT rather than MERGE because it is the
    portable recipe (Redshift's own documented upsert pattern; MERGE
    arrived late and unevenly across warehouses). The two statements
    run in a single transaction — a reader never observes the gap —
    and re-running the same batch is idempotent (same keys deleted,
    same rows inserted).

    Scale: the staged batch is a day's increment, not the warehouse;
    the DELETE's subquery is key-only. Repartition ``df`` to the
    warehouse's ingest-friendly connection count before calling.

    String keys: pass ``createTableColumnTypes`` in ``options`` so the
    staging table gets comparable types — Spark's default StringType
    mapping is the dialect's LOB type on some warehouses (Derby: CLOB),
    which cannot be equality-compared against the target's VARCHAR.

    Caller contract: the batch is key-unique (DELETE+INSERT does not
    dedupe within the batch — duplicate key tuples would insert
    duplicate rows; pre-aggregate with
    :func:`capital.operators.dedup.first_wins` if the feed can
    re-deliver). Concurrent upserts to the same target are safe only
    because each run stages to a unique suffixed table (dropped after
    commit); the DELETE+INSERT transactions still serialize on the
    warehouse's locking.
    """
    import uuid

    for name in (table, *keys, *df.columns):
        _check_identifier(name)
    staging = staging_table or f"{table}_stg_{uuid.uuid4().hex[:10]}"
    _check_identifier(staging)
    write_jdbc(
        df,
        url,
        staging,
        mode="overwrite",
        options=options,
    )
    # Correlated EXISTS, not a multi-column IN row constructor — row
    # constructors in IN-subqueries are not portable (Derby rejects
    # them); explicit column lists keep INSERT immune to column-order
    # drift between staging (df order) and the target DDL. Staging-side
    # identifiers are double-quoted: Spark's JDBC writer creates the
    # staging table with quoted (case-exact) column names, while the
    # target's identifiers are the caller's DDL, referenced as given.
    match = " AND ".join(f's."{k}" = {table}.{k}' for k in keys)
    cols = ", ".join(df.columns)
    staged_cols = ", ".join(f'"{c}"' for c in df.columns)
    cred_keys = ("user", "password", "ssl", "sslmode")
    props = {k: v for k, v in (options or {}).items() if k in cred_keys}
    jvm = df.sparkSession._jvm  # noqa: SLF001
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            stmt.execute(
                f"DELETE FROM {table} WHERE EXISTS "
                f"(SELECT 1 FROM {staging} s WHERE {match})"
            )
            stmt.execute(
                f"INSERT INTO {table} ({cols}) "
                f"SELECT {staged_cols} FROM {staging}"
            )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            try:
                # Best-effort cleanup: the unique-suffix staging table
                # is garbage after commit (and after rollback). Own
                # commit — autoCommit is off and the main txn is over.
                stmt.execute(f"DROP TABLE {staging}")
                conn.commit()
            except Exception:  # noqa: BLE001 - cleanup must not mask
                pass
            stmt.close()
    finally:
        conn.close()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S11: warehouse query source over real JDBC.

    ``table`` may be a table name or a pushdown subquery alias
    (``"(SELECT …) q"``) — the reference's SQL-result sources
    (SURVEY.md §2.1 S11/S12). For large tables pass
    ``partitionColumn/lowerBound/upperBound/numPartitions`` in
    ``options`` so executors read range-parallel instead of one
    connection streaming everything.
    """
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def save_warehouse_table(
    df: DataFrame, table: str, partition_col: str | None = None
) -> None:
    """K4: warehouse sink with DROP/CREATE semantics.

    The reference ships ``preactions="DROP TABLE IF EXISTS …; CREATE
    TABLE …"`` to Redshift over JDBC (glue_job_scripts/
    industry_code_glue_job.py:89-101). In-engine the same contract is
    ``saveAsTable(mode="overwrite")`` against the session catalog; for
    an external warehouse swap in ``df.write.jdbc(url, table,
    mode="overwrite")`` — same plan, different committer.
    """
    writer = df.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.saveAsTable(table)
