"""Z-order (Morton) clustering for multi-column data skipping.

Parquet readers prune with per-file (and per-row-group) min/max stats.
Sorting by one column gives perfect skipping on that column and none on
any other; interleaving the bits of several columns' normalized ranks
(the Z-order / Morton curve) gives *each* indexed column locality, so a
predicate on any of them skips most files. This is the standard
lakehouse clustering technique (Delta/Iceberg ``OPTIMIZE ZORDER BY``);
here it is plain Spark: a codegen'd integer expression + one range
repartition, writable to any parquet lake.

Shape at 100 TB: one min/max aggregate over the indexed columns (scalar
row, broadcast), a narrow z-value projection (pure bit arithmetic in
whole-stage codegen), and ONE range exchange on the z-value —
the same cost as the single-column sort a naive layout pays, with
multi-column skipping instead of one-column.

The z computation is deterministic integer arithmetic, generated from
the same constants for the Spark plan and the DuckDB oracle SQL
(``z_value_oracle_sql``), so it is hash-checkable like every other
engine expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits of precision per indexed column. Interleaved bits must stay out
#: of a signed long's sign bit, so the *effective* precision is capped
#: at ``63 // ncols`` (16 at 1-3 columns, 15 at 4) — see
#: :func:`effective_bits`.
Z_BITS = 16
_MAX_COLS = 4


def effective_bits(ncols: int, bits: int = Z_BITS) -> int:
    """Per-column bit budget that keeps the top interleaved bit at
    position ``<= 62``: bit ``i`` of column ``j`` lands at
    ``i * ncols + j``, so 16 bits x 4 columns would reach position 63 —
    the sign bit — and z ordering would wrap negative. Both the Spark
    expression and the DuckDB oracle derive from this one function."""
    return min(bits, 63 // ncols)


def normalized_rank(col: Column, cmin: Column, cmax: Column, bits: int = Z_BITS) -> Column:
    """Map ``col`` into ``[0, 2^bits)`` by min/max scaling — the cheap
    rank proxy (exact quantile ranks would cost a global sort; min/max
    scaling is one scalar agg and is what engine OPTIMIZE
    implementations use for numeric columns)."""
    top = F.lit((1 << bits) - 1)
    span = (cmax - cmin).cast("double")
    scaled = F.when(
        span > 0,
        ((col.cast("double") - cmin.cast("double")) / span * top.cast("double")),
    ).otherwise(F.lit(0.0))
    return F.least(F.greatest(F.floor(scaled).cast("long"), F.lit(0)), top.cast("long"))


def z_interleave(ranks: list[Column], bits: int = Z_BITS) -> Column:
    """Morton interleave: bit ``i`` of rank ``j`` lands at position
    ``i * ncols + j``. Pure shift/and/or integer arithmetic — stays in
    whole-stage codegen."""
    ncols = len(ranks)
    if not 1 <= ncols <= _MAX_COLS:
        raise ValueError(f"z_interleave takes 1..{_MAX_COLS} columns, got {ncols}")
    if bits * ncols > 63:
        raise ValueError(
            f"z_interleave: {bits} bits x {ncols} cols reaches the sign "
            f"bit of a long; pass bits <= effective_bits(ncols) = "
            f"{effective_bits(ncols, bits)}"
        )
    z = F.lit(0).cast("long")
    for j, r in enumerate(ranks):
        for i in range(bits):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def _with_numeric_proxies(df: DataFrame, cols: list[str]) -> DataFrame:
    """Attach a monotone numeric proxy ``__zp_<c>`` per indexed column
    so non-numeric types z-order too — the reference's actual layout
    key is (ticker, date) (plugins/operators/yfinance_operator.py:16
    ymd+ticker Hive layout):

    - numerics: passthrough;
    - date → ``unix_date`` (epoch days), timestamp → ``unix_micros``;
    - string → **dictionary rank**: ``dense_rank() - 1`` over the
      column's sorted non-null distinct values, broadcast-joined back
      (NULL → rank 0, below every ranked value — DuckDB's window
      NULLS LAST would otherwise diverge). Exact order-preserving
      scaling for dimension-cardinality strings (tickers, segments,
      categories). The distinct set sorts on one task, so this is for
      dimension-like columns; z-clustering a *high-cardinality* string
      (a URL, an id) is a modeling error — its rank carries no
      locality a range predicate could use — so no prefix-bit fallback
      is offered.
    """
    from pyspark.sql import Window

    out = df
    for c in cols:
        dtype = dict(df.dtypes)[c]
        if dtype == "string":
            ranked = (
                df.select(F.col(c).alias("__zv"))
                .filter(F.col("__zv").isNotNull())
                .distinct()
                .withColumn(
                    f"__zr_{c}",
                    F.dense_rank().over(Window.orderBy("__zv")) - 1,
                )
            )
            out = (
                out.join(
                    F.broadcast(ranked), out[c] == ranked["__zv"], "left"
                )
                .drop("__zv")
                .withColumn(
                    f"__zp_{c}",
                    F.coalesce(F.col(f"__zr_{c}"), F.lit(0)).cast("long"),
                )
                .drop(f"__zr_{c}")
            )
        elif dtype == "date":
            out = out.withColumn(f"__zp_{c}", F.unix_date(F.col(c)))
        elif dtype.startswith("timestamp"):
            # unix_micros takes TIMESTAMP only; NTZ casts through the
            # (UTC-pinned) session zone, so the wall clock IS the epoch.
            out = out.withColumn(
                f"__zp_{c}", F.unix_micros(F.col(c).cast("timestamp"))
            )
        else:
            out = out.withColumn(f"__zp_{c}", F.col(c))
    return out


def with_z_value(
    df: DataFrame, cols: list[str], bits: int = Z_BITS, out_col: str = "z_value"
) -> DataFrame:
    """Attach the Morton key for ``cols``: one scalar min/max aggregate
    broadcast into a narrow projection. String/date/timestamp columns
    go through order-preserving numeric proxies first (see
    :func:`_with_numeric_proxies`). The frame is otherwise
    untouched — callers choose what to do with the key (range
    repartition, bucket, sort). ``bits`` is clamped to
    :func:`effective_bits` so 4-column keys stay non-negative."""
    bits = effective_bits(len(cols), bits)
    proxied = _with_numeric_proxies(df, cols)
    aggs = []
    for c in cols:
        aggs.append(F.min(f"__zp_{c}").alias(f"__min_{c}"))
        aggs.append(F.max(f"__zp_{c}").alias(f"__max_{c}"))
    bounds = proxied.agg(*aggs)
    ranks = [
        normalized_rank(
            F.col(f"__zp_{c}"), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    return (
        proxied.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, z_interleave(ranks, bits))
        .drop(
            *[f"__min_{c}" for c in cols],
            *[f"__max_{c}" for c in cols],
            *[f"__zp_{c}" for c in cols],
        )
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    bits: int = Z_BITS,
    mode: str = "overwrite",
) -> None:
    """Rewrite a table Z-clustered on ``cols``: compute the Morton key,
    range-repartition on it (each output file owns a contiguous z
    range → tight min/max stats on EVERY indexed column), and write
    parquet without the key column.

    This is the lake-maintenance twin of :func:`capital.io.
    compact_partition`: run it on cold partitions so the dominant
    query predicates skip files. ``num_files`` defaults to the
    session's shuffle parallelism.
    """
    keyed = with_z_value(df, cols, bits)
    n = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        keyed.repartitionByRange(n, "z_value")
        .sortWithinPartitions("z_value")
        .drop("z_value")
        .write.mode(mode)
        .parquet(path)
    )


def z_value_oracle_sql(
    cols: list[str],
    table: str,
    bits: int = Z_BITS,
    kinds: dict[str, str] | None = None,
) -> str:
    """DuckDB SQL computing the identical z key — generated from the
    same constants as the Spark expression so the driver can
    hash-compare them. Applies the same :func:`effective_bits` clamp
    as :func:`with_z_value`. ``kinds`` maps a column to
    ``"string" | "date" | "timestamp"`` (default numeric) and mirrors
    :func:`_with_numeric_proxies`: dictionary dense_rank for strings
    (non-null distinct, NULL → 0), epoch days / micros for temporals."""
    ncols = len(cols)
    bits = effective_bits(ncols, bits)
    kinds = kinds or {}
    dict_ctes = []
    joins = []
    proxy_exprs = []
    for c in cols:
        kind = kinds.get(c, "numeric")
        if kind == "string":
            dict_ctes.append(
                f"dict_{c} AS (SELECT {c} AS v_{c}, "
                f"CAST(dense_rank() OVER (ORDER BY {c}) - 1 AS BIGINT) "
                f"AS zr_{c} FROM (SELECT DISTINCT {c} FROM {table} "
                f"WHERE {c} IS NOT NULL))"
            )
            joins.append(f"LEFT JOIN dict_{c} ON t.{c} = dict_{c}.v_{c}")
            proxy_exprs.append(f"COALESCE(zr_{c}, 0) AS zp_{c}")
        elif kind == "date":
            proxy_exprs.append(
                f"CAST(t.{c} - DATE '1970-01-01' AS BIGINT) AS zp_{c}"
            )
        elif kind == "timestamp":
            proxy_exprs.append(f"CAST(epoch_us(t.{c}) AS BIGINT) AS zp_{c}")
        else:
            proxy_exprs.append(f"t.{c} AS zp_{c}")
    mins = ", ".join(
        f"MIN(zp_{c}) AS mn_{c}, MAX(zp_{c}) AS mx_{c}" for c in cols
    )
    top = (1 << bits) - 1
    rank_exprs = []
    for c in cols:
        rank_exprs.append(
            f"least(greatest(CAST(floor(CASE WHEN mx_{c} > mn_{c} THEN "
            f"(CAST(zp_{c} AS DOUBLE) - mn_{c}) / (mx_{c} - mn_{c}) * {top}.0 "
            f"ELSE 0.0 END) AS BIGINT), 0), {top}) AS r_{c}"
        )
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"(((r_{c} >> {i}) & 1) << {i * ncols + j})")
    z = " | ".join(terms)
    with_dicts = ("" if not dict_ctes else ", ".join(dict_ctes) + ",")
    return f"""
    WITH {with_dicts}
    p AS (SELECT t.*, {", ".join(proxy_exprs)}
          FROM {table} t {" ".join(joins)}),
    b AS (SELECT {mins} FROM p),
    r AS (SELECT *, {", ".join(rank_exprs)} FROM p, b)
    SELECT *, ({z}) AS z_value FROM r
    """
