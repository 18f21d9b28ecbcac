"""Scaling evidence — run the bench headline at every available scale
factor and report per-query wall-clock plus the sf0.01 -> sf0.1 growth
ratio (data grows 10x; a scan-bound operator should grow well under 10x
at these tiny sizes where fixed overhead dominates, and must never grow
super-linearly).

Usage: python tools/scale_check.py [out_md]
Writes SCALING.md (or out_md) with one table, and prints it.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from predictor_spark.session import get_spark
    import __spark_entry__ as entry_mod
    from bench import HEADLINE, materialize

    spark = get_spark("scale_check")
    qs = entry_mod.queries()
    # warm-up once per sf dir (parquet footers), plus codegen warm-up
    timings: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for sf in SFS:
        # warm every table's footer + the ts-conversion path, like bench.py
        from predictor_spark.sources.tables import TABLES, load_table

        for t in TABLES:
            try:
                load_table(spark, sf, t).count()
            except Exception:
                pass
        materialize(qs["q1_pricing_summary"](spark, sf))
        for name in HEADLINE:
            best = None
            for _ in range(2):  # min-of-2, like bench.py: single shots at
                # these sizes are GC/scheduler noise, not plan signal
                t0 = time.perf_counter()
                materialize(qs[name](spark, sf))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name].append(round(best, 3))

    lines = [
        "# SCALING — headline wall-clock by scale factor",
        "",
        "Same plans, 100x data range. `x10 ratio` = sf0.1 / sf0.01 time for",
        "10x the rows (fixed overhead keeps it far below 10 at these sizes;",
        "anything >10 would flag a super-linear plan).",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | x10 ratio |",
        "|---|---|---|---|---|",
    ]
    for name, ts in timings.items():
        ratio = round(ts[2] / ts[1], 2) if ts[1] > 0 else float("nan")
        lines.append(f"| {name} | {ts[0]} | {ts[1]} | {ts[2]} | {ratio} |")
    out = "\n".join(lines) + "\n"
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALING.md"
    with open(path, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
