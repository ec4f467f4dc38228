"""CLI entry points (the reference's ``python etl_pipeline/load.py`` driver
and per-query verification runs, SURVEY §3.1, as one command surface).

    python -m bigdata_etl_elt_dashboard_spark query q3_top5_nations_by_revenue
    python -m bigdata_etl_elt_dashboard_spark list
    python -m bigdata_etl_elt_dashboard_spark pipeline \
        --local-csv raw.csv --api-csv api.csv --out /tmp/wh

`query` prints the result preview + wall-clock the way the reference logs
each verification query (load.py:341-361); `pipeline` is the full
extract → transform → DQ → star-build → write run.
"""

from __future__ import annotations

import argparse
import sys
import time

from .plans import REGISTRY
from .schemas import SALES_RAW
from .session import get_spark
from .sources.catalog import DEFAULT_SF_DIR
from .sources.readers import read_csv


def _cmd_list() -> int:
    for name, q in REGISTRY.items():
        kind = "oracle" if q.oracle else "rows-only"
        print(f"{name:32s} {kind}")
    return 0


def _cmd_query(args) -> int:
    spark = get_spark(app_name=f"query:{args.name}")
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    rows = df.limit(args.limit).collect()
    secs = time.perf_counter() - t0
    print(f"-- {args.name} ({secs:.3f}s, showing <= {args.limit} rows)")
    print(" | ".join(df.columns))
    for r in rows:
        print(" | ".join(str(v) for v in r))
    return 0


def _cmd_pipeline(args) -> int:
    from .pipeline import run_pipeline

    spark = get_spark(app_name="pipeline")
    local = read_csv(spark, args.local_csv, schema=SALES_RAW)
    api = read_csv(spark, args.api_csv, schema=SALES_RAW) if args.api_csv else local.limit(0)
    wh, report, metrics = run_pipeline(spark, local, api, warehouse_path=args.out)
    print(f"quality passed: {report.passed}")
    for stage, m in metrics.stages.items():
        print(f"stage={stage} seconds={m['seconds']} rows={m['rows']}")
    print(f"warehouse written to {args.out}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bigdata_etl_elt_dashboard_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.add_argument("--limit", type=int, default=20)

    pl = sub.add_parser("pipeline", help="run the ETL pipeline from CSVs")
    pl.add_argument("--local-csv", required=True)
    pl.add_argument("--api-csv", default=None)
    pl.add_argument("--out", required=True)

    args = p.parse_args(argv)
    if args.cmd == "list":
        return _cmd_list()
    if args.cmd == "query":
        return _cmd_query(args)
    return _cmd_pipeline(args)


if __name__ == "__main__":
    sys.exit(main())
