"""spark-submit entry point for the extraction pipeline.

Deployment shape required by the north rule: the package ships as a zip
via ``--py-files``; this driver runs the checkpointed pipeline.

    tools/submit.sh --master local[8] -- \
        --input /tmp/docs_parquet --output /tmp/extract_out \
        --n-buckets 32 --input-snapshot v1

(``submit.sh`` rebuilds ``dist/srag_spark.zip`` from the source tree on
every launch — the zip is not version-controlled, so it cannot go stale.)

On a real cluster only ``--master`` changes (plus executor sizing); the
pipeline itself is cluster-agnostic.  Re-running after a failure resumes
from the checkpoint table automatically.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="interleaved-docs parquet dir")
    ap.add_argument("--output", required=True, help="output root (spans/, checkpoints/)")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--wave-size", type=int, default=None)
    ap.add_argument("--input-snapshot", default="")
    ap.add_argument("--synth-docs", type=int, default=0,
                    help="synthesize N docs into --input first (demo/bench)")
    ap.add_argument("--full-ingest", action="store_true",
                    help="run the FULL engine ingest (transcripts + chunks "
                         "+ embeddings + metrics manifest tables at "
                         "--output) instead of extraction-only spans")
    ap.add_argument("--optimize", action="store_true",
                    help="after a --full-ingest load completes, compact "
                         "every engine table to one file per bucket "
                         "(SragEngine.optimize) and vacuum superseded "
                         "snapshots — the post-load maintenance pass")
    args = ap.parse_args()
    if args.optimize and not args.full_ingest:
        ap.error("--optimize requires --full-ingest (it compacts the "
                 "engine tables the full ingest writes)")

    # SparkSession comes from spark-submit's conf; fall back to local
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("srag-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from srag_spark.plans.pipeline import ExtractionPipeline
    from srag_spark.plans.preflight import preflight
    from srag_spark.synth import synth_documents_df

    if args.synth_docs:
        synth_documents_df(spark, args.synth_docs, seed=42).write.mode(
            "overwrite"
        ).parquet(args.input)

    # J8/J9: gate the (multi-hour) launch on input/output health, like the
    # reference's startup health fan-out (Main.scala:36-49)
    preflight(spark, args.input, args.output)

    docs = spark.read.parquet(args.input)
    if args.full_ingest:
        from srag_spark.api import SragEngine
        from srag_spark.plans.pipeline import IngestionPipeline

        engine = SragEngine(spark, args.output, n_buckets=args.n_buckets)
        pipe = IngestionPipeline(engine, wave_size=args.wave_size)
    else:
        pipe = ExtractionPipeline(
            spark, args.output, n_buckets=args.n_buckets,
            wave_size=args.wave_size,
        )
    summary = pipe.run(docs, input_snapshot=args.input_snapshot)
    if args.optimize and not summary.get("failed"):
        summary["optimize"] = engine.optimize()
        summary["vacuumed_dirs"] = engine.vacuum()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
