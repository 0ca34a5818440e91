"""Command-line entry point for the engine.

    python -m customer_segmentation_pyspark_spark list
    python -m customer_segmentation_pyspark_spark run <query> \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--json]
    python -m customer_segmentation_pyspark_spark explain <query> \
        [--sf-dir ...]

``run`` executes one registry query and prints rows (tabular or JSON
lines); ``explain`` prints the formatted physical plan — the same
surfaces the driver contract and the EXPLAINS.md generator use.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="customer_segmentation_pyspark_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry queries (oracle flag per row)")
    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument(
            "--sf-dir",
            default=os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
            ),
        )
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
            sp.add_argument("--json", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from customer_segmentation_pyspark_spark.queries import REGISTRY

    if args.cmd == "list":
        try:
            for name in sorted(REGISTRY):
                kind = "oracle" if REGISTRY[name].oracle else "rows-only"
                print(f"{name}\t{kind}")
        except BrokenPipeError:  # `... | head` closed the pipe; fine
            sys.stderr.close()
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    from customer_segmentation_pyspark_spark import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        print(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        ))
        return 0
    if args.json:
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
