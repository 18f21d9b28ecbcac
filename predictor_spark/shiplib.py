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

import hashlib
import os
import shutil
import tempfile
import threading
from pathlib import Path

from pyspark.sql import SparkSession

_shipped_apps: set[str] = set()
_zip_path: str | None = None
_lock = threading.Lock()


def _build_zip() -> str:
    """Build the package zip ONCE per process, content-hash-named and
    atomically renamed into place. The hash name matters twice over: a
    fixed name raced with Spark's executor-side fetch when concurrent
    search candidates triggered a rebuild mid-fetch ("exists and does not
    match contents"), and a name keyed by content means an edited package
    ships as a NEW file instead of mutating one Spark already cached."""
    global _zip_path
    if _zip_path and os.path.exists(_zip_path):
        return _zip_path
    pkg_dir = Path(__file__).resolve().parent          # .../predictor_spark
    with tempfile.TemporaryDirectory() as td:
        tmp = shutil.make_archive(os.path.join(td, "pkg"), "zip",
                                  root_dir=pkg_dir.parent,
                                  base_dir=pkg_dir.name)
        with open(tmp, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:12]
        final = os.path.join(tempfile.gettempdir(),
                             f"predictor_spark_pkg_{digest}.zip")
        if not os.path.exists(final):
            os.replace(tmp, final)                     # atomic
    _zip_path = final
    return _zip_path


def ensure_workers_can_import(spark: SparkSession) -> None:
    # addPyFile is NOT idempotent under concurrency: parallel candidates
    # (plans/model_search.py fans a generation out from threads) must not
    # build/ship simultaneously
    with _lock:
        sc = spark.sparkContext
        app_id = sc.applicationId
        if app_id in _shipped_apps:
            return
        sc.addPyFile(_build_zip())
        _shipped_apps.add(app_id)
