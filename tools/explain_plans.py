"""Physical-plan audit: .explain("formatted") for the key operators,
checking the properties that matter at scale — PushedFilters reaching the
parquet scan, pruned ReadSchema, WholeStageCodegen spans, broadcast joins
where a side is small, and no unexpected exchanges.

Usage: python tools/explain_plans.py [sf_dir] [query ...]
Prints a per-query summary plus grep-able plan excerpts.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from srag_spark.session import get_spark

CHECKS = {
    "pushed_filters": re.compile(r"PushedFilters: \[[^\]]*\w"),
    "topk": re.compile(r"TakeOrderedAndProject"),
    "broadcast_join": re.compile(r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    "sortmerge_join": re.compile(r"SortMergeJoin"),
    "exchanges": re.compile(r"\bExchange \(\d+\)"),
    "bcast_exchanges": re.compile(r"BroadcastExchange \(\d+\)"),
    "python_eval": re.compile(r"ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas|BatchEvalPython"),
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain", master="local[4]", shuffle_partitions=4)
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"== {name}: ERROR {e}")
            continue
        counts = {k: len(rx.findall(plan)) for k, rx in CHECKS.items()}
        read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widths = [len(s.split(",")) for s in read_schemas]
        print(
            f"== {name}: shuffles={counts['exchanges']} "
            f"bcast={counts['bcast_exchanges']} bhj={counts['broadcast_join']} "
            f"smj={counts['sortmerge_join']} topk={counts['topk']} "
            f"pushed={counts['pushed_filters']} "
            f"python={counts['python_eval']} scan_cols={widths}"
        )
        if "-v" in sys.argv:
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
