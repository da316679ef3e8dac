"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt (the optimization round's before/after
evidence).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r06 before ann_knn_graph
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from srag_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-capture", master="local[8]", shuffle_partitions=8)
    queries = entrymod.queries()
    for name in names or list(queries):
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote plans/{tag}/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
