"""Extra benchmarks for the optimization rounds (guide §1.4).

``bench.py`` is FROZEN for measurement; this side harness reuses its
exact methodology (noop sink, warmup + median-of-3) but lets us time a
SUBSET of queries at any sf dir, so a single optimization can be
re-measured in seconds instead of re-running the whole suite.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    python bench_extra.py --runs 3 ann_knn_graph dedup_embedding_cosine
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from srag_spark.session import get_spark

    import __spark_entry__ as entrymod

    args = [a for a in sys.argv[1:]]
    n_runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        n_runs = int(args[i + 1])
        del args[i : i + 2]

    spark = get_spark(
        "srag-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32,
    )
    queries = entrymod.queries()
    names = args or list(queries)
    per_query: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name} warmup")
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"bench_extra: {name} run {i}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(round(time.monotonic() - t0, 3))
        per_query[name] = round(statistics.median(runs), 3)
        samples[name] = runs
        spark.catalog.clearCache()
        print(json.dumps({"query": name, "median": per_query[name], "runs": runs}),
              flush=True)
    print(json.dumps({
        "metric": "bench_extra_seconds",
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "queries": per_query,
        "samples": samples,
        "total": round(sum(per_query.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
