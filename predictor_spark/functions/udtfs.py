"""Python UDTFs — the table-function face of the extensibility surface
(SURVEY §2.10 lists UDF/UDAF/UDTF; scalar+aggregate forms live in
operators/* and sqlfuncs.py, this is the one-row-to-many-rows form).

``ps_chunk_plan`` emits the halo-chunk layout used by the single-giant-
series FFT path (operators/spectral.py fft_window_features_chunked):
given a series length, a chunk size, and a halo width, it yields one row
per chunk with the padded [start, end) range and the core (non-halo)
[core_start, core_end) range. Exposing the planner as a UDTF lets SQL
users drive the same partitioning: ``SELECT * FROM ps_chunk_plan(10000,
4096, 64)`` or a LATERAL join against per-series lengths.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, start int, end int, core_start int, core_end int")
class ChunkPlan:
    """One row per chunk: [start, end) padded by halo, core range inside."""

    def eval(self, n: int, chunk: int, halo: int):  # noqa: D102
        if n is None or chunk is None or halo is None or chunk <= 0 or n <= 0:
            return
        if halo < 0 or halo >= chunk:
            raise ValueError("halo must satisfy 0 <= halo < chunk")
        cid = 0
        for core_start in range(0, n, chunk):
            core_end = min(core_start + chunk, n)
            yield (cid, max(core_start - halo, 0), min(core_end + halo, n),
                   core_start, core_end)
            cid += 1


def register_udtfs(spark: SparkSession) -> list[str]:
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(spark)
    spark.udtf.register("ps_chunk_plan", ChunkPlan)
    return ["ps_chunk_plan"]
