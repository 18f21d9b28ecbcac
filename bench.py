"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is materialized through the noop sink (all output columns are
computed; nothing collects to the driver), timed after a warm-up of the
session + parquet footers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # forecast core (the reference's own query shapes)
    "flagship_persistence_metrics",
    "ar1_train_eval",
    "w9_log_returns",
    "w5_lead_targets",
    "w20_rolling_stats",
    "w15_fft_features",
    # relational core
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_nation_revenue",
    "topk_parts_per_brand",
    "sessionize_counts",
    "json_props_extract",
    # LLM-data-pipeline extensions
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "text_quality_score",
    "text_winnow_fingerprint",
    # scale-path custom operators
    "range_join_event_windows",
    "ar_order_select_aic",
    # distributed deep-model training (1 numpy N-BEATS per series)
    "nbeats_train_eval",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from predictor_spark.session import get_spark

    spark = get_spark("predictor_spark_bench")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # warm-up: JVM, parquet footers, codegen
    materialize(qs["q1_pricing_summary"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
