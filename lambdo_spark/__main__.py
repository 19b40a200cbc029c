"""CLI: ``python -m lambdo_spark workflow.json`` — the successor of
the reference's ``lambdo workflow.json`` entry point
(/root/reference/lambdo/main.py:31-58).

Executes the workflow's table DAG; ``sink`` tables write eagerly,
everything else stays lazy unless --show is given.
"""

from __future__ import annotations

import argparse
import sys

from lambdo_spark.plans.compiler import Workflow, strip_comments
from lambdo_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lambdo_spark")
    ap.add_argument("workflow", help="workflow JSON file (// comments ok)")
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--show", metavar="TABLE", action="append", default=[],
                    help="show N rows of a result table (repeatable)")
    ap.add_argument("--show-rows", type=int, default=20)
    args = ap.parse_args(argv)

    with open(args.workflow) as f:
        spec = f.read()

    spark = get_spark(app_name=f"lambdo_spark:{args.workflow}", master=args.master)
    try:
        wf = Workflow(spec, spark)
        tables = wf.execute()
        print(f"executed {len(tables)} tables in {len(wf.layers)} layers:")
        for layer in wf.layers:
            print("  layer:", ", ".join(layer))
        for t in args.show:
            print(f"\n== {t} ==")
            tables[t].show(args.show_rows, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
