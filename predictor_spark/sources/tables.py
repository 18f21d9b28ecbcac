"""Parquet table catalog for the driver-generated synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. Parquet scans get predicate pushdown + column
pruning from Catalyst for free — operators downstream must keep their
filters/projections expressible (no opaque UDF wrappers around filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
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


def canonical_ts(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize event-time columns to TIMESTAMP (LTZ) across the parquet
    layouts the generator has produced over time:
    - TIMESTAMP(NANOS) read as bigint via nanosAsLong -> floor to micros
      (same truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP);
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ -> cast
      (wall clock interpreted in the session TZ; sessions here run UTC,
      matching DuckDB's naive-timestamp reading bit-for-bit);
    - already TIMESTAMP -> untouched."""
    for field, dtype in df.dtypes:
        if field in cols:
            if dtype == "bigint":
                df = df.withColumn(field, F.timestamp_micros(F.expr(f"{field} div 1000")))
            elif dtype == "timestamp_ntz":
                df = df.withColumn(field, F.col(field).cast("timestamp"))
    return df


def table_fingerprint(sf_dir: str, name: str) -> str:
    """Content fingerprint (mtime+size, recursive for directory parquet) of
    a source table, for keying derived /tmp fixtures: if the parquet at
    sf_dir is regenerated, every cache keyed with this moves, instead of
    silently serving stale chunks while the oracle reads fresh data
    (ADVICE r3)."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    parts: list[str] = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_mtime_ns}:{st.st_size}")
    else:
        st = os.stat(path)
        parts.append(f"{st.st_mtime_ns}:{st.st_size}")
    return "|".join(parts)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Some generators write TIMESTAMP(NANOS) parquet (pandas datetime64[ns]),
    # which Spark rejects by default; nanosAsLong lets those read as long for
    # canonical_ts to convert.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - immutable conf on some builds
        pass
    return canonical_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_events_range(
    spark: SparkSession,
    sf_dir: str,
    lo: str | None = None,
    hi: str | None = None,
) -> DataFrame:
    """Events table with a time-range predicate that reaches the parquet
    scan. The nanos->micros floor conversion is a projection, so a filter
    on the converted ``ts`` cannot push down (the scan reads every row
    group). But floor(ns/1000) < C  <=>  ns < C*1000, so the equivalent
    predicate on the RAW nanos column pushes into the scan and prunes row
    groups on their int64 min/max stats — the difference between scanning
    a day and scanning 100 TB. Bounds are ``lo <= ts < hi`` (UTC)."""
    from datetime import datetime, timezone

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")

    def ns(bound: str) -> int:
        dt = datetime.fromisoformat(bound).replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000) * 1000

    if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
        if lo is not None:
            df = df.filter(F.col("ts") >= ns(lo))
        if hi is not None:
            df = df.filter(F.col("ts") < ns(hi))
    elif ts_type == "timestamp_ntz":
        # filter on the RAW NTZ column with an NTZ literal so the predicate
        # pushes into the scan (row-group pruning on the parquet stats);
        # filtering after the LTZ cast-projection would scan everything
        if lo is not None:
            df = df.filter(F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
        if hi is not None:
            df = df.filter(F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
    else:  # plain TIMESTAMP
        if lo is not None:
            df = df.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            df = df.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
    return canonical_ts(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (so spark.sql can reference them)
    and return the DataFrame dict."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
