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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Some generators write TIMESTAMP(NANOS) parquet (pandas datetime64[ns]),
    # which Spark rejects by default. Read nanos as long, then floor-convert
    # to microsecond timestamps (same truncation DuckDB applies when casting
    # TIMESTAMP_NS -> TIMESTAMP, so oracle comparisons agree).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - immutable conf on some builds
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field, dtype in df.dtypes:
        if dtype == "bigint" and field in ("ts",):
            df = df.withColumn(field, F.timestamp_micros(F.expr(f"{field} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (so spark.sql can reference them)
    and return the DataFrame dict."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
