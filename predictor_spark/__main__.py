"""CLI runner — the command-line surface a reference user lands on:

    python -m predictor_spark list [substring]
    python -m predictor_spark run <query> [--sf DIR] [--limit N] [--json]
    python -m predictor_spark explain <query> [--sf DIR]

`run` executes a catalog query against the parquet tables in --sf
(default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01) and prints the
result; `explain` prints the formatted physical plan (the same text
tools/explain_audit.py asserts against).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    return entry.queries()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="predictor_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list catalog queries")
    p_list.add_argument("filter", nargs="?", default="")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
            p.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    qs = _load()
    if args.cmd == "list":
        for n in sorted(qs):
            if args.filter in n:
                print(n)
        return 0

    if args.query not in qs:
        near = [n for n in sorted(qs) if args.query in n]
        print(f"unknown query {args.query!r}" +
              (f"; did you mean: {', '.join(near[:5])}" if near else ""),
              file=sys.stderr)
        return 2

    from predictor_spark.session import get_spark

    spark = get_spark("predictor_spark_cli")
    df = qs[args.query](spark, args.sf)
    if args.cmd == "explain":
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
        return 0
    if args.json:
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
