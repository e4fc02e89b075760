"""CLI for the engine: run registry queries, show plans, list coverage.

    python -m luma_etl_data_platform_spark list
    python -m luma_etl_data_platform_spark run q1_pricing_summary [--sf-dir DIR] [--limit N]
    python -m luma_etl_data_platform_spark explain q5_local_supplier_volume
    python -m luma_etl_data_platform_spark oracle q1_pricing_summary
"""

from __future__ import annotations

import argparse
import sys

from . import api
from .core.session import get_spark
from .sources.tables import DEFAULT_SF_DIR


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="luma_etl_data_platform_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry queries")
    for cmd in ("run", "explain", "oracle"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if cmd == "run":
            sp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    queries = api.all_queries()
    oracles = api.all_oracles()

    if args.cmd == "list":
        for name in sorted(queries):
            mark = "oracle" if name in oracles else "rows-only"
            print(f"{name:35} [{mark}]")
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        print(oracles.get(args.query, "-- no SQL oracle (rows-only check)"))
        return 0

    spark = get_spark(app_name=f"luma-cli-{args.cmd}")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
