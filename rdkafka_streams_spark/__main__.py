"""CLI for the engine: list, run, and explain registered queries.

    python -m rdkafka_streams_spark list [substr]
    python -m rdkafka_streams_spark run q01 [--sf DIR] [--limit N]
    python -m rdkafka_streams_spark explain q12 [--sf DIR] [--mode formatted]
    python -m rdkafka_streams_spark sql "SELECT ..." [--sf DIR]

The ``sql`` verb registers the parquet tables as views and executes an
arbitrary SQL string — the full spark.sql surface over the same data the
query registry uses.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rdkafka_streams_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substr", nargs="?", default="")

    for verb in ("run", "explain"):
        sp = sub.add_parser(verb)
        sp.add_argument("query")
        sp.add_argument("--sf", default=DEFAULT_SF)
        if verb == "run":
            sp.add_argument("--limit", type=int, default=20)
        else:
            sp.add_argument("--mode", default="formatted")

    p_sql = sub.add_parser("sql", help="run a SQL string over the tables")
    p_sql.add_argument("stmt")
    p_sql.add_argument("--sf", default=DEFAULT_SF)
    p_sql.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from rdkafka_streams_spark.queries import REGISTRY

    if args.cmd == "list":
        for name, q in sorted(REGISTRY.items()):
            if args.substr in name:
                mode = "oracle" if q.oracle else "rows-only"
                doc = (q.doc or "").strip().splitlines()[0]
                print(f"{name:28s} [{mode}] {doc}")
        return 0

    from rdkafka_streams_spark import get_spark, register_views

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "sql":
        register_views(spark, args.sf)
        spark.sql(args.stmt).show(args.limit, truncate=False)
        return 0

    if args.query not in REGISTRY:
        matches = [n for n in sorted(REGISTRY) if args.query in n]
        if len(matches) != 1:
            print(f"unknown query {args.query!r}; candidates: {matches}", file=sys.stderr)
            return 2
        args.query = matches[0]
    df = REGISTRY[args.query].fn(spark, args.sf)

    if args.cmd == "explain":
        from rdkafka_streams_spark.core.plan import plan_string

        print(plan_string(df, args.mode))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
