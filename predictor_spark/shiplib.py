"""Ship the predictor_spark package to Python workers.

Operators that run Python in executors (applyInPandas / mapInPandas)
pickle their functions BY REFERENCE to this package, so every Python
worker must be able to ``import predictor_spark``. The external driver
may launch Spark from any cwd without the repo on PYTHONPATH; calling
``ensure_workers_can_import(spark)`` inside those operators zips the
package once and registers it with ``sparkContext.addPyFile`` — the
Spark-native way to ship a library to executors (works identically on a
real cluster, where workers are remote machines).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import SparkSession

_shipped_apps: set[str] = set()
_zip_path: str | None = None


def _build_zip() -> str:
    global _zip_path
    if _zip_path and os.path.exists(_zip_path):
        return _zip_path
    pkg_dir = Path(__file__).resolve().parent          # .../predictor_spark
    base = os.path.join(tempfile.gettempdir(), "predictor_spark_pkg")
    _zip_path = shutil.make_archive(base, "zip", root_dir=pkg_dir.parent,
                                    base_dir=pkg_dir.name)
    return _zip_path


def ensure_workers_can_import(spark: SparkSession) -> None:
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _shipped_apps:
        return
    sc.addPyFile(_build_zip())
    _shipped_apps.add(app_id)
