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

# extraction corpus size scales with the sf dir used; large enough that
# parse compute dominates fixed job overhead (a 4k-doc corpus at 32 cores
# measures only task setup)
_N_DOCS = {"sf0.001": 8000, "sf0.01": 40000, "sf0.1": 200000}
N_DOCS = _N_DOCS.get(Path(SF_DIR).name, 200000)
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
    # round 2 additions (keep the r1 list above stable for trend reads)
    "p7_recursive_chunks",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "retrieve_context",
    "curate_corpus",
    # round 3 additions
    "curate_corpus_cc",
    "mm_extract_features",
    "dedup_lines",
    # round 4 additions
    "dedup_lines_agg",
    "corpus_pack_sequences",
    "corpus_sample_mixture",
    "corpus_decontaminate",
    # round 5 additions
    "corpus_build",
    "q3_bm25_filtered",
    "text_pii_scrub",
    "lm_ppl",
    "dsir_weights",
    "dedup_strip_substr",
    "dedup_incremental",
    "dedup_semdedup",
    "ngram_topk",
    "events_asof_join",
    "s5_range_scan",
    "ann_knn_graph",
    "pmi_pairs",
    "bpe_encode",
    "ann_lsh_recall",
    "s5_zorder_scan",
    "corpus_cluster_sample",
    "bloom_probe",
    "train_ict_pairs",
    "train_hard_negatives",
    "corpus_sample_weighted",
    "train_paraphrase_pairs",
    "train_bitext_pairs",
    "graph_pagerank",
    "corpus_tokenized_packs",
    "corpus_pack_interleaved",
]


def ensure_synth_docs(spark, n_docs: int = N_DOCS, path: str = SYNTH_CACHE) -> str:
    """Deterministic corpus cache.  Written as ~5000-doc files (min 64)
    so every parallelism level under test has enough input splits and each
    task carries seconds of parse compute — too few files caps the stage's
    task count; too many drowns it in per-task Python round-trip cost."""
    from srag_spark.synth import synth_documents_df

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # file count divisible by every parallelism level under test:
        # 200 files at 32 cores = 6.25 waves → the 8-task last wave idles
        # 24 cores for a full task duration (~8% of the stage); 256 = 8
        # exact waves at 32, 16 at 16, ... — no remainder tail anywhere
        n_files = max(64, -(-n_docs // 4000))
        n_files = ((n_files + 31) // 32) * 32  # round up to a multiple of 32
        synth_documents_df(spark, n_docs, seed=42, mega_every=500).repartition(
            n_files
        ).write.mode("overwrite").parquet(path)
    return path


def run_extraction(spark, docs_path: str) -> tuple[float, int]:
    """Time the extraction stage (parse + flatten + count). Returns
    (seconds, docs)."""
    from srag_spark.operators.parse import extract_documents_flat

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()  # warms the scan; the timed region is the parse
    t0 = time.monotonic()
    flat = extract_documents_flat(docs)
    flat.write.mode("overwrite").format("noop").save()
    dt = time.monotonic() - t0
    return dt, n_docs


def bench_default(n_runs: int = 3) -> dict:
    """Headline suite.  Each figure is the MEDIAN of ``n_runs`` timed
    runs after one warmup (VERDICT r3 #4 — this box's noise swings
    1.5-2x, and single-shot numbers made real regressions and contention
    indistinguishable; the raw samples are kept in the JSON for reading
    the spread)."""
    import statistics

    from srag_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("srag-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    docs_path = ensure_synth_docs(spark)

    queries = entrymod.queries()
    per_query: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    # extraction headline (warmup run absorbs worker spawn + codegen,
    # matching the per-query treatment below)
    run_extraction(spark, docs_path)
    ext_samples = []
    n_docs = 0
    for _ in range(n_runs):
        ext_sec, n_docs = run_extraction(spark, docs_path)
        ext_samples.append(round(ext_sec, 3))
    ext_sec = statistics.median(ext_samples)
    per_query["extract_pipeline"] = round(ext_sec, 3)
    samples["extract_pipeline"] = ext_samples

    for name in HEADLINE_QUERY_NAMES:
        fn = queries[name]
        # warmup run absorbs one-time codegen/AQE/broadcast setup; the
        # recorded number is steady-state latency
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(round(time.monotonic() - t0, 3))
        per_query[name] = round(statistics.median(runs), 3)
        samples[name] = runs
        # release operator-persisted relations between queries: each
        # query's warmup rebuilds (and its timed runs reuse, via the
        # CacheManager's plan matching) its OWN caches, but nothing
        # accumulates across queries for the session lifetime
        spark.catalog.clearCache()

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
        "estimator": f"median_of_{n_runs}",
        "samples": samples,
    }
    spark.stop()
    return result


def _scaling_child(cpus: int) -> None:
    """Child process: run extraction at local[cpus], print one JSON line.

    Warm-up (JIT, Arrow init, python worker spawn) happens on a small
    corpus so the expensive levels don't pay a full extra pass; the
    measured run(s) use the full corpus."""
    from srag_spark.session import get_spark

    spark = get_spark(
        f"srag-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    n = SCALING_N_DOCS
    docs_path = ensure_synth_docs(spark, n_docs=n, path=f"/tmp/srag_bench_docs_{n}")
    warm_n = min(64000, n)
    warm_path = ensure_synth_docs(
        spark, n_docs=warm_n, path=f"/tmp/srag_bench_docs_{warm_n}"
    )
    run_extraction(spark, warm_path)
    # warm the FULL corpus bytes JVM-side: count() alone reads only
    # row-group metadata, so the first full-corpus run would otherwise
    # also pay a cold disk read of every span page.  NOTE this does not
    # remove the whole first-run penalty at high core counts (observed
    # 221 s vs 24.7 s back-to-back at local[32], and still ~3× with this
    # warm in place): the first full-scale run additionally pays JVM
    # heap/allocator ramp-up that grows with parallelism.  That is why
    # the child reports best-of-``SPARK_GRAFT_SCALING_RUNS`` — run 1 is
    # effectively the full-scale warmup, matching the machine baseline's
    # warmed pools.
    from pyspark.sql import functions as F  # noqa: PLC0415

    spark.read.parquet(docs_path).select(F.sum(F.size("spans"))).collect()
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    runs = [run_extraction(spark, docs_path) for _ in range(n_runs)]
    sec = min(s for s, _ in runs)
    n_docs = runs[0][1]
    print(json.dumps({"cpus": cpus, "sec": sec, "docs": n_docs,
                      "tput": n_docs / sec,
                      "all_secs": [round(s, 2) for s, _ in runs]}))
    spark.stop()


SCALING_N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1000000"))


_MB_DOCS: list = []  # fork-shared corpus for machine_baseline workers


def _mb_gen_chunk(args):
    from srag_spark import synth

    lo, hi = args
    return [
        synth.generate_doc(f"doc-{i:08d}", seed=42, mega=(i % 500 == 499))
        for i in range(lo, hi)
    ]


def _mb_parse_chunk(idxs):
    from srag_spark import golden

    for i in idxs:
        golden.extract_document(_MB_DOCS[i])
    return len(idxs)


def machine_baseline(levels=(8, 32), n_docs: int = 96000) -> dict:
    """Hardware ceiling: the same parse-only workload under raw
    multiprocessing (no Spark, no Arrow, no shuffle).  If this doesn't
    scale 4x, no framework can — report it alongside the Spark number so
    the scaling efficiency is judged against what the machine offers.

    Protocol matched to the Spark job: the corpus is pre-generated (the
    Spark job reads cached parquet, so generation must not pollute the
    baseline either) and fork-inherited by workers (no pickle transfer);
    pools are created and warmed before the timed region; doc indices are
    deterministically shuffled so mega-docs spread across workers (the
    Spark job handles the same skew via salting)."""
    import multiprocessing as mp
    import random

    global _MB_DOCS
    if len(_MB_DOCS) != n_docs:
        gen_procs = max(levels)
        with mp.Pool(gen_procs) as p:
            chunks = p.map(
                _mb_gen_chunk,
                [(i * n_docs // 64, (i + 1) * n_docs // 64) for i in range(64)],
            )
        _MB_DOCS = [d for c in chunks for d in c]
    idxs = list(range(n_docs))
    random.Random(0).shuffle(idxs)

    out = {}
    for procs in levels:
        buckets = [idxs[i::procs] for i in range(procs)]
        with mp.Pool(procs) as p:
            p.map(_mb_parse_chunk, [b[:1] for b in buckets])  # warm workers
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                p.map(_mb_parse_chunk, buckets)
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
        out[procs] = {"sec": best, "tput": n_docs / best}
    n, m = levels[0], levels[-1]
    out["efficiency"] = out[m]["tput"] / (out[n]["tput"] * (m / n))
    return out


SCALING_LEVELS = (2, 4, 8, 16, 32)
SCALING_PAIRS = ((2, 8), (4, 16), (8, 32))


def bench_focused_pair(n: int, m: int) -> dict:
    """Focused criterion-pair run (VERDICT r4 #6): the full-matrix
    protocol interleaves five levels per cycle, so each cycle's pair
    comparison integrates ~25 min of shared-VM window noise.  This mode
    runs ONLY the two levels of one pair back-to-back per cycle (minutes
    apart, not tens of minutes), plus the in-cycle machine baseline —
    the tightest pair measurement the box allows.  Prints JSON; does NOT
    rewrite BENCH/BASELINE.md (append the verdict there by hand so the
    full-matrix tables stay intact)."""
    import statistics

    n_cycles = int(os.environ.get("SPARK_GRAFT_SCALING_CYCLES", "5"))
    cycles: list[dict] = []
    for _ in range(n_cycles):
        cyc = {"spark": {}, "machine": {}}
        for cpus in (n, m):
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(cpus)],
                capture_output=True,
                text=True,
                check=True,
                env={
                    **os.environ,
                    "PYTHONPATH": str(Path(__file__).resolve().parent),
                    "SPARK_GRAFT_SCALING_RUNS": os.environ.get(
                        "SPARK_GRAFT_SCALING_RUNS", "2"
                    ),
                    "SPARK_GRAFT_DRIVER_MEM": f"{max(8, (cpus * 3) // 4)}g",
                },
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            cyc["spark"][cpus] = json.loads(line)
        base = machine_baseline(levels=(n, m))
        cyc["machine"] = {c: base[c] for c in (n, m)}
        eff = cyc["spark"][m]["tput"] / (cyc["spark"][n]["tput"] * (m / n))
        meff = cyc["machine"][m]["tput"] / (cyc["machine"][n]["tput"] * (m / n))
        cyc["spark_eff"] = round(eff, 4)
        cyc["machine_eff"] = round(meff, 4)
        cyc["normalized"] = round(eff / meff, 4) if meff > 0 else None
        cycles.append(cyc)

    effs = [c["spark_eff"] for c in cycles]
    meffs = [c["machine_eff"] for c in cycles]
    norms = [c["normalized"] for c in cycles]
    return {
        "pair": [n, m],
        "cycles": cycles,
        "spark_eff_per_cycle": effs,
        "spark_eff_median": round(statistics.median(effs), 4),
        "machine_eff_per_cycle": meffs,
        "machine_eff_median": round(statistics.median(meffs), 4),
        "normalized_per_cycle": norms,
        "normalized_median": round(statistics.median(norms), 4),
    }


def bench_scaling(levels=SCALING_LEVELS, pairs=SCALING_PAIRS) -> dict:
    """Scaling evidence, noise-robust: this shared VM's throughput swings
    ~1.5-2× over minutes, so comparing levels measured in different time
    windows measures the neighbors, not the job.  Protocol: CYCLES — in
    each cycle every level runs once (fresh JVM, small-corpus warmup,
    one measured full-corpus run) plus the raw-multiprocessing machine
    baseline, all inside one tight window; efficiency is computed WITHIN
    each cycle and the reported figure is the median across cycles."""
    import statistics

    n_cycles = int(os.environ.get("SPARK_GRAFT_SCALING_CYCLES", "3"))
    cycles: list[dict] = []
    for _ in range(n_cycles):
        cyc = {"spark": {}, "machine": {}}
        for cpus in levels:
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(cpus)],
                capture_output=True,
                text=True,
                check=True,
                env={
                    **os.environ,
                    "PYTHONPATH": str(Path(__file__).resolve().parent),
                    # best-of-2 inside the child: the first post-warmup run
                    # at high levels still pays stragglers of worker spawn
                    "SPARK_GRAFT_SCALING_RUNS": os.environ.get(
                        "SPARK_GRAFT_SCALING_RUNS", "2"
                    ),
                    # hold JVM heap per core constant across levels, as a
                    # real cluster does (executor memory scales with nodes)
                    "SPARK_GRAFT_DRIVER_MEM": f"{max(8, (cpus * 3) // 4)}g",
                },
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            cyc["spark"][cpus] = json.loads(line)
        base = machine_baseline(levels)
        cyc["machine"] = {c: base[c] for c in levels}
        cycles.append(cyc)

    return write_baseline_md(cycles, levels, pairs)


def write_baseline_md(cycles, levels=SCALING_LEVELS, pairs=SCALING_PAIRS) -> dict:
    """Render BENCH/BASELINE.md from measured cycles (also callable on a
    saved --scaling JSON via --rewrite-md, so reporting changes never
    force a 1.5 h re-measure)."""
    import statistics

    n_cycles = len(cycles)

    def pair_effs(key):
        out = {}
        for n, m in pairs:
            out[(n, m)] = [
                c[key][m]["tput"] / (c[key][n]["tput"] * (m / n)) for c in cycles
            ]
        return out

    spark_effs = pair_effs("spark")
    mach_effs = pair_effs("machine")

    best = {
        c: max(cy["spark"][c]["tput"] for cy in cycles) for c in levels
    }
    best_m = {
        c: max(cy["machine"][c]["tput"] for cy in cycles) for c in levels
    }
    n_docs = cycles[0]["spark"][levels[0]]["docs"]

    level_rows = "\n".join(
        "| local[{c}] | {t:.1f} | {m:.1f} | {runs} |".format(
            c=c,
            t=best[c],
            m=best_m[c],
            runs=[round(cy["spark"][c]["tput"], 0) for cy in cycles],
        )
        for c in levels
    )
    pair_rows = []
    best_rows = []
    summary = {}
    for n, m in pairs:
        se = statistics.median(spark_effs[(n, m)])
        me = statistics.median(mach_effs[(n, m)])
        rel = se / me if me > 0 else float("nan")
        per_cycle_norm = [
            s / mm if mm > 0 else float("nan")
            for s, mm in zip(spark_effs[(n, m)], mach_effs[(n, m)])
        ]
        pair_rows.append(
            f"| {n}→{m} | **{se:.3f}** | {me:.3f} | {rel:.3f} | "
            f"{[round(x, 3) for x in spark_effs[(n, m)]]} |"
        )
        # best-of-cycles estimator: min-time (max-tput) per level across
        # cycles — the standard uncontended-cost estimator on a noisy
        # shared box.  The median estimator above is biased AGAINST the
        # framework at high levels: a 1M-doc Spark run integrates 25-50 s
        # of whatever the VM's neighbors are doing, while each machine-
        # baseline run lasts <1 s and so dodges the noise windows.
        bse = best[m] / (best[n] * (m / n))
        bme = best_m[m] / (best_m[n] * (m / n))
        brel = bse / bme if bme > 0 else float("nan")
        best_rows.append(
            f"| {n}→{m} | **{bse:.3f}** | {bme:.3f} | {brel:.3f} | "
            f"{[round(x, 3) for x in per_cycle_norm]} |"
        )
        summary[f"{n}to{m}"] = {
            "spark_efficiency": round(se, 4),
            "machine_efficiency": round(me, 4),
            "normalized_efficiency": round(rel, 4),
            "per_cycle": [round(x, 4) for x in spark_effs[(n, m)]],
            "best_spark_efficiency": round(bse, 4),
            "best_machine_efficiency": round(bme, 4),
            "best_normalized_efficiency": round(brel, 4),
            "per_cycle_normalized": [round(x, 4) for x in per_cycle_norm],
        }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — extraction scaling evidence (north rule)

Same job, same deterministic input ({n_docs} interleaved docs, seed=42,
incl. mega-docs), levels = sandbox proxy for clusters of N vs 4N
executors.  This shared VM's available throughput swings ~1.5-2× over
minutes, so levels are measured in INTERLEAVED CYCLES: each cycle runs
every level once (fresh JVM, warmup, one measured run) plus the
machine baseline — the identical parse-only kernel under raw
multiprocessing (fork-shared corpus, warm pools, no Spark), which is
the scaling ceiling the hardware itself offers (this box has no
hyperthreading, but per-core speed drops as cores activate —
turbo/bandwidth — so even a perfect framework lands below 1.0).
Efficiency is computed within each cycle; the reported figure is the
median across {n_cycles} cycles.

| level | Spark docs/sec (best) | raw-mp parse docs/sec (best) | Spark per-cycle tput |
|---|---|---|---|
{level_rows}

| pair (N→4N) | Spark efficiency (median) | machine efficiency (median) | normalized (Spark/machine) | Spark per-cycle |
|---|---|---|---|---|
{chr(10).join(pair_rows)}

Best-of-cycles estimator (min measured time per level — the standard
uncontended-cost estimator on a noisy shared box.  The median rows above
are biased AGAINST the framework at high core counts: one measured
1M-doc Spark run integrates 25-50 s of neighbor noise, while each
machine-baseline run lasts <1 s and dodges the same noise windows;
best-of compares both sides at their least-contended observation):

| pair (N→4N) | Spark efficiency (best-of) | machine efficiency (best-of) | normalized (best-of) | per-cycle normalized |
|---|---|---|---|---|
{chr(10).join(best_rows)}

- Scaling efficiency = tput(4N) / (4 × tput(N)); north-rule target ≥ 0.8
  on a real cluster, where 4N executors bring 4N× the hardware
  (bandwidth, cache, turbo headroom scale with nodes).  A single box
  cannot hold per-core hardware constant while quadrupling active
  cores; the machine column is what the box itself scales at, and the
  normalized column (≥1.0 = Spark adds no scaling bottleneck beyond
  the hardware's) is the framework-attributable number — the honest
  single-box proxy for the cluster criterion.
"""
        )
    return {"cycles": cycles, "pairs": summary, "best": best}


if __name__ == "__main__":
    if "--machine-baseline" in sys.argv:
        print(json.dumps(machine_baseline()))
    elif "--rewrite-md" in sys.argv:
        # regenerate BENCH/BASELINE.md from a saved --scaling JSON
        with open(sys.argv[sys.argv.index("--rewrite-md") + 1]) as fh:
            saved = json.load(fh)
        cycles = [
            {
                "spark": {int(k): v for k, v in c["spark"].items()},
                "machine": {int(k): v for k, v in c["machine"].items()},
            }
            for c in saved["cycles"]
        ]
        print(json.dumps(write_baseline_md(cycles)["pairs"]))
    elif "--focused" in sys.argv:
        i = sys.argv.index("--focused")
        print(json.dumps(bench_focused_pair(int(sys.argv[i + 1]),
                                            int(sys.argv[i + 2]))))
    elif "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    else:
        print(json.dumps(bench_default()))
