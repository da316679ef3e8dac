"""Benchmark harness.

Default mode: runs the headline suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line ``{"metric": ..., "value": seconds, "unit": "sec", "queries": {...},
"sf": ...}``.

``--scaling`` mode: runs the same extraction job at two parallelism
levels (local[8] = N and local[32] = 4N — the sandbox proxy for N vs 4N
executors) on the SAME deterministic input, and writes throughput at both
plus scaling efficiency to BENCH/BASELINE.md (north-rule evidence:
efficiency ≥ 0.8).

The extraction input is synthesized deterministically (seed=42, per-doc
seeding — identical bytes at any parallelism) and cached as parquet under
/tmp so generation cost never pollutes the timing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# extraction corpus size scales with the sf dir used
_N_DOCS = {"sf0.001": 200, "sf0.01": 800, "sf0.1": 4000}
N_DOCS = _N_DOCS.get(Path(SF_DIR).name, 4000)
SYNTH_CACHE = f"/tmp/srag_bench_docs_{N_DOCS}"

HEADLINE_QUERY_NAMES = [
    "p1_text_word_spans",
    "p8_word_group_chunks",
    "q2_vector_topk",
    "q3_bm25_topk",
    "q4_rrf_fusion",
    "dedup_exact",
    "text_quality",
    "events_tumbling_agg",
    "tpch_q1",
    "tpch_q3",
]


def ensure_synth_docs(spark, n_docs: int = N_DOCS, path: str = SYNTH_CACHE) -> str:
    """Deterministic corpus cache.  Written as ~5000-doc files (min 64)
    so every parallelism level under test has enough input splits and each
    task carries seconds of parse compute — too few files caps the stage's
    task count; too many drowns it in per-task Python round-trip cost."""
    from srag_spark.synth import synth_documents_df

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        n_files = max(64, n_docs // 5000)
        synth_documents_df(spark, n_docs, seed=42, mega_every=500).repartition(
            n_files
        ).write.mode("overwrite").parquet(path)
    return path


def run_extraction(spark, docs_path: str) -> tuple[float, int]:
    """Time the extraction stage (parse + flatten + count). Returns
    (seconds, docs)."""
    from srag_spark.operators.parse import explode_extracted, extract_documents

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()  # warms the scan; the timed region is the parse
    t0 = time.monotonic()
    flat = explode_extracted(extract_documents(docs))
    flat.write.mode("overwrite").format("noop").save()
    dt = time.monotonic() - t0
    return dt, n_docs


def bench_default() -> dict:
    from srag_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("srag-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    docs_path = ensure_synth_docs(spark)

    queries = entrymod.queries()
    per_query: dict[str, float] = {}

    # extraction headline
    ext_sec, n_docs = run_extraction(spark, docs_path)
    per_query["extract_pipeline"] = round(ext_sec, 3)

    for name in HEADLINE_QUERY_NAMES:
        fn = queries[name]
        # warmup run absorbs one-time codegen/AQE/broadcast setup; the
        # recorded number is steady-state latency
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        per_query[name] = round(time.monotonic() - t0, 3)

    total = round(sum(per_query.values()), 3)
    sf = Path(SF_DIR).name.replace("sf", "")
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extract_docs_per_sec": round(n_docs / ext_sec, 2),
        "cpus": CPUS,
    }
    spark.stop()
    return result


def _scaling_child(cpus: int) -> None:
    """Child process: run extraction at local[cpus], print one JSON line."""
    from srag_spark.session import get_spark

    spark = get_spark(
        f"srag-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    n = SCALING_N_DOCS
    docs_path = ensure_synth_docs(spark, n_docs=n, path=f"/tmp/srag_bench_docs_{n}")
    # warm-up run (JIT, arrow init, python workers), then best-of-3:
    # this VM shows heavy run-to-run variance (steal time, page cache),
    # so min-of-N measures capability instead of neighbor noise
    run_extraction(spark, docs_path)
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    runs = [run_extraction(spark, docs_path) for _ in range(n_runs)]
    sec = min(s for s, _ in runs)
    n_docs = runs[0][1]
    print(json.dumps({"cpus": cpus, "sec": sec, "docs": n_docs,
                      "tput": n_docs / sec,
                      "all_secs": [round(s, 2) for s, _ in runs]}))
    spark.stop()


SCALING_N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1000000"))


def _mp_work(args):
    from srag_spark import golden, synth

    lo, hi = args
    for i in range(lo, hi):
        doc_id = f"doc-{i:08d}"
        golden.extract_document(
            synth.generate_doc(doc_id, seed=42, mega=(i % 500 == 499))
        )
    return hi - lo


def machine_baseline(levels=(8, 32), n_docs: int = 32000) -> dict:
    """Hardware ceiling: the same parse kernel under raw multiprocessing
    (no Spark, no Arrow, no shuffle).  If this doesn't scale 4x, no
    framework can — report it alongside the Spark number so the scaling
    efficiency is judged against what the machine actually offers."""
    import multiprocessing as mp

    out = {}
    for procs in levels:
        chunks = [
            (i * n_docs // procs, (i + 1) * n_docs // procs) for i in range(procs)
        ]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            with mp.Pool(procs) as p:
                p.map(_mp_work, chunks)
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[procs] = {"sec": best, "tput": n_docs / best}
    n, m = levels
    out["efficiency"] = out[m]["tput"] / (out[n]["tput"] * (m / n))
    return out


def bench_scaling(levels=(8, 32)) -> dict:
    """Run the extraction at two parallelism levels in fresh JVMs; write
    BENCH/BASELINE.md with throughputs + efficiency.  Uses a corpus large
    enough that compute dominates fixed job overheads — scaling
    efficiency on a toy input only measures scheduler latency."""
    results = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
            env={**os.environ, "PYTHONPATH": str(Path(__file__).resolve().parent)},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    n, m = levels
    eff = results[m]["tput"] / (results[n]["tput"] * (m / n))
    base = machine_baseline(levels)
    base_eff = base["efficiency"]
    rel = eff / base_eff if base_eff > 0 else float("nan")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — extraction scaling evidence (north rule)

Same job, same deterministic input ({results[n]['docs']} interleaved docs,
seed=42, incl. mega-docs), two parallelism levels in fresh JVMs — the
sandbox proxy for N vs 4N executors.  Each level reports best-of-3 (this
shared VM shows heavy run-to-run noise — steal time was observed up to a
few percent and aggregate throughput varies ~2x over minutes), and the
same-time-window **machine baseline** runs the identical parse kernel
under raw multiprocessing (no Spark) at both levels: it is the scaling
the hardware itself offers, the ceiling any framework can reach.

| level | Spark wall (s) | Spark docs/sec | raw-mp docs/sec (gen+parse; ratio comparable, absolute not) |
|---|---|---|---|
| local[{n}] (N) | {results[n]['sec']:.2f} | {results[n]['tput']:.1f} | {base[n]['tput']:.1f} |
| local[{m}] (4N) | {results[m]['sec']:.2f} | {results[m]['tput']:.1f} | {base[m]['tput']:.1f} |

- Spark wall-clock scaling efficiency = tput(4N) / (4 x tput(N)) = **{eff:.3f}**
- machine (raw-mp) scaling efficiency in the same window = **{base_eff:.3f}**
- **normalized efficiency (Spark / machine) = {rel:.3f}** - >= 1.0 means the
  pipeline adds no scaling bottleneck beyond what the hardware provides.

Raw per-run walls: local[{n}] {results[n].get('all_secs')}, local[{m}] {results[m].get('all_secs')}.
"""
        )
    return {
        "levels": results,
        "efficiency": round(eff, 4),
        "machine_efficiency": round(base_eff, 4),
        "normalized_efficiency": round(rel, 4),
    }


if __name__ == "__main__":
    if "--machine-baseline" in sys.argv:
        print(json.dumps(machine_baseline()))
    elif "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    else:
        print(json.dumps(bench_default()))
