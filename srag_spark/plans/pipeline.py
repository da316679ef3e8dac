"""Checkpointed, resumable extraction pipeline (north rule; SURVEY.md §2.5).

The reference distributes work as Redis-queued jobs with a Postgres state
machine (Pending → ... → Success | Failed | DeadLetter,
IngestionJob.scala:8-59) and recovers stale jobs on restart
(RedisJobQueueAdapter.scala:91-156).  In Spark, tasks already retry and
the scheduler replaces the queue — what must be engineered is *job-level*
resumability: a restarted run must skip data that was already extracted
and converge to the same output (J7 idempotent replay).

Design:

* the corpus is split into ``n_buckets`` logical partitions by
  ``pmod(xxhash64(doc_id), n_buckets)`` — the checkpoint unit, analogous
  to the reference's per-job granularity;
* buckets are processed in **waves** (a configurable number of buckets
  per Spark job).  Each wave writes its output with dynamic partition
  overwrite (idempotent — the Iceberg ``overwritePartitions`` analogue)
  and then appends per-bucket checkpoint rows with lineage + extraction
  metrics.  A crash between waves loses at most one wave of work;
* resume = read the checkpoint table, keep the latest row per bucket
  (status-history preserved, like the reference's updatedAt-bumping
  ``mark*`` transitions), and anti-join Success buckets out of the
  pending set;
* a failing wave appends ``Failed`` rows and is retried up to
  ``max_attempts`` (J5; reference default 3, application.conf:21-33),
  then ``DeadLetter`` (J6) — the run continues with remaining waves.

At 100 TB: n_buckets scales to O(10k) so each bucket is a few GB; waves
keep every Spark job large enough to fill the cluster while bounding
re-work on driver loss.  No driver-side loop touches row data — only
bucket ids.
"""

from __future__ import annotations

import datetime as _dt
import traceback

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from srag_spark.operators.parse import (
    DEFAULT_SALT_THRESHOLD,
    DEFAULT_SLICE_TARGET,
    explode_extracted,
    extract_documents,
)
from srag_spark.schema import (
    CHECKPOINTS_SCHEMA,
    STATUS_DEAD_LETTER,
    STATUS_FAILED,
    STATUS_SUCCESS,
)
from srag_spark.sources import fsio


def _now() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)


# J5 retry backoff (IngestionWorker.scala:362-368; application.conf
# jobs.initial-retry-delay-ms=2000, max-retry-delay-ms=60000,
# backoff-factor=2.0)
INITIAL_RETRY_DELAY_S = 2.0
MAX_RETRY_DELAY_S = 60.0
BACKOFF_FACTOR = 2.0


def retry_delay_s(attempt: int) -> float:
    """Delay before retrying a bucket that failed its ``attempt``-th try."""
    return min(
        INITIAL_RETRY_DELAY_S * BACKOFF_FACTOR ** (attempt - 1.0),
        MAX_RETRY_DELAY_S,
    )


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


class ExtractionPipeline:
    """Resumable bucket-checkpointed extraction over an interleaved-docs
    table.  Outputs under ``output_dir``:

      spans/        flat extracted spans, parquet partitioned by bucket
      checkpoints/  append-only checkpoint/lineage table
    """

    def __init__(
        self,
        spark: SparkSession,
        output_dir: str,
        n_buckets: int = 32,
        wave_size: int | None = None,
        max_attempts: int = 3,
        salt_threshold: int = DEFAULT_SALT_THRESHOLD,
        slice_target: int = DEFAULT_SLICE_TARGET,
    ) -> None:
        self.spark = spark
        self.output_dir = output_dir.rstrip("/")
        self.spans_dir = f"{self.output_dir}/spans"
        self.checkpoint_dir = f"{self.output_dir}/checkpoints"
        self.n_buckets = n_buckets
        self.wave_size = wave_size or n_buckets
        self.max_attempts = max_attempts
        self.salt_threshold = salt_threshold
        self.slice_target = slice_target

    # -- checkpoint table ---------------------------------------------------
    def checkpoints(self) -> DataFrame:
        """Full checkpoint history (may be empty)."""
        if not fsio.exists(self.spark, self.checkpoint_dir):
            return self.spark.createDataFrame([], CHECKPOINTS_SCHEMA)
        return self.spark.read.schema(CHECKPOINTS_SCHEMA).parquet(self.checkpoint_dir)

    def latest_checkpoints(self) -> DataFrame:
        """Latest row per bucket (updated_at desc, attempt desc)."""
        w = Window.partitionBy("partition_id").orderBy(
            F.desc("updated_at"), F.desc("attempt")
        )
        return (
            self.checkpoints()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _append_checkpoints(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [tuple(r[f.name] for f in CHECKPOINTS_SCHEMA.fields) for r in rows],
            CHECKPOINTS_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.checkpoint_dir)

    def _bucket_states(self) -> dict[int, tuple[str, int, object]]:
        """bucket → (status, attempt, next_attempt_at) from the latest
        checkpoint rows."""
        return {
            r["partition_id"]: (r["status"], r["attempt"], r["next_attempt_at"])
            for r in self.latest_checkpoints()
            .select("partition_id", "status", "attempt", "next_attempt_at")
            .collect()
        }

    def pending_buckets(self, now: _dt.datetime | None = None) -> list[int]:
        """Buckets still needing work: not Success, not DeadLetter,
        attempt < max_attempts, and — for Failed buckets — whose retry
        backoff has elapsed (J5: a Failed bucket is invisible to the
        scheduler until its next_attempt_at, IngestionWorker.scala:
        362-368).  (The resume anti-join — J6/J14.)"""
        now = now or _now()
        states = self._bucket_states()
        out = []
        for b in range(self.n_buckets):
            status, attempt, next_at = states.get(b, ("Pending", 0, None))
            if status == STATUS_SUCCESS or status == STATUS_DEAD_LETTER:
                continue
            if status == STATUS_FAILED and attempt >= self.max_attempts:
                continue
            if status == STATUS_FAILED and next_at is not None and next_at > now:
                continue
            out.append(b)
        return out

    # -- execution ------------------------------------------------------------
    def run(
        self,
        docs: DataFrame,
        input_snapshot: str = "",
        max_waves: int | None = None,
        fail_injector=None,
        now: _dt.datetime | None = None,
    ) -> dict:
        """Process all pending buckets in waves.  ``max_waves`` bounds how
        many waves run (tests use it to simulate a mid-run crash);
        ``fail_injector(bucket_ids)`` may raise to simulate a wave failure;
        ``now`` overrides the clock for the backoff check (tests).
        Returns a summary dict.
        """
        spark = self.spark
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        states = self._bucket_states()
        pending = self.pending_buckets(now=now)
        summary = {
            "skipped": self.n_buckets - len(pending),
            "succeeded": [],
            "failed": [],
            "dead_lettered": [],
        }

        docs = docs.withColumn("bucket", bucket_col(self.n_buckets))
        waves = [
            pending[i : i + self.wave_size]
            for i in range(0, len(pending), self.wave_size)
        ]
        if max_waves is not None:
            waves = waves[:max_waves]

        for wave in waves:
            attempt_of = {b: states.get(b, ("Pending", 0, None))[1] + 1 for b in wave}
            started = _now()
            try:
                if fail_injector is not None:
                    fail_injector(wave)
                metrics = self._process_wave(docs, wave)
                rows = []
                for b in wave:
                    m = metrics.get(b, (0, 0, 0, 0))
                    rows.append(
                        self._ckpt_row(
                            b, STATUS_SUCCESS, attempt_of[b], None,
                            input_snapshot, m, started,
                        )
                    )
                self._append_checkpoints(rows)
                summary["succeeded"].extend(wave)
            except Exception as exc:  # noqa: BLE001 — wave-level retry boundary
                err = f"{type(exc).__name__}: {exc}\n{traceback.format_exc(limit=3)}"
                rows = []
                for b in wave:
                    attempt = attempt_of[b]
                    dead = attempt >= self.max_attempts
                    next_at = (
                        None
                        if dead
                        else _now()
                        + _dt.timedelta(seconds=retry_delay_s(attempt))
                    )
                    rows.append(
                        self._ckpt_row(
                            b,
                            STATUS_DEAD_LETTER if dead else STATUS_FAILED,
                            attempt, err[:2000], input_snapshot,
                            (0, 0, 0, 0), started, next_at,
                        )
                    )
                    (summary["dead_lettered"] if dead else summary["failed"]).append(b)
                self._append_checkpoints(rows)
        return summary

    def _process_wave(self, docs: DataFrame, wave: list[int]) -> dict:
        """One Spark job: extract the wave's buckets, overwrite their
        output partitions, return per-bucket metrics."""
        wave_docs = docs.filter(F.col("bucket").isin(wave)).select("doc_id", "spans")
        extracted = extract_documents(
            wave_docs,
            salt_threshold=self.salt_threshold,
            slice_target=self.slice_target,
        ).withColumn("bucket", bucket_col(self.n_buckets))
        extracted = extracted.persist()
        try:
            flat = explode_extracted(extracted).withColumn(
                "bucket", bucket_col(self.n_buckets)
            )
            flat.write.mode("overwrite").partitionBy("bucket").parquet(self.spans_dir)
            agg = (
                extracted.groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("docs"),
                    F.sum("blocks_kept").alias("kept"),
                    F.sum("blocks_dropped").alias("dropped"),
                    F.sum("parse_failures").alias("failures"),
                )
                .collect()
            )
        finally:
            extracted.unpersist(blocking=False)
        return {
            r["bucket"]: (r["docs"], r["kept"], r["dropped"], r["failures"])
            for r in agg
        }

    def _ckpt_row(
        self, bucket, status, attempt, error, snapshot, metrics, started,
        next_attempt_at=None,
    ) -> dict:
        docs, kept, dropped, failures = metrics
        return {
            "next_attempt_at": next_attempt_at,
            "partition_id": bucket,
            "status": status,
            "attempt": attempt,
            "max_attempts": self.max_attempts,
            "error_message": error,
            "input_snapshot": snapshot,
            "docs_processed": int(docs),
            "blocks_kept": int(kept),
            "blocks_dropped": int(dropped),
            "parse_failures": int(failures),
            "started_at": started,
            "updated_at": _now(),
        }

    # -- outputs ---------------------------------------------------------------
    def spans(self) -> DataFrame:
        return self.spark.read.parquet(self.spans_dir)


class IngestionPipeline(ExtractionPipeline):
    """Resumable, wave-checkpointed FULL ingest into a
    :class:`srag_spark.api.SragEngine` — the 100 TB onboarding path: the
    whole reference worker pipeline (extract → transcripts → chunks →
    embeddings, all four manifest tables) driven bucket-by-bucket with
    the same checkpoint/retry/dead-letter state machine as extraction
    (J1-J7), so a corpus-scale initial load survives driver loss and
    resumes by skipping Success buckets.

    Composition details:

    * ``n_buckets`` is pinned to the ENGINE's bucket count: the pipeline
      wave hash and the manifest tables' key hash are the same
      ``pmod(xxhash64(doc_id), n)``, so a wave's docs land in exactly
      the wave's table buckets — per-wave metric aggregation reads ONLY
      those buckets of the metrics table (manifest-level pruning, never
      a full-table scan per wave);
    * a crash mid-wave may leave the wave's buckets partially ingested
      across the four tables; the wave stays non-Success and its retry
      re-runs ``engine.ingest`` for the same docs, which converges (J7
      replace-entity upserts) — the same replay window as the facade's
      own crash contract;
    * optional per-doc ``metadata``/``language`` columns on the input
      flow through untouched (the wave filter only drops the internal
      bucket column).
    """

    def __init__(
        self,
        engine,
        checkpoint_root: str | None = None,
        wave_size: int | None = None,
        max_attempts: int = 3,
        batch_metadata: dict[str, str] | None = None,
    ) -> None:
        super().__init__(
            engine.spark,
            (checkpoint_root or f"{engine.root}/_ingest_pipeline"),
            n_buckets=engine.n_buckets,
            wave_size=wave_size,
            max_attempts=max_attempts,
        )
        self.engine = engine
        self.batch_metadata = batch_metadata

    def _process_wave(self, docs: DataFrame, wave: list[int]) -> dict:
        from srag_spark.sources.tables import read_manifest, read_table

        wave_docs = docs.filter(F.col("bucket").isin(wave)).drop("bucket")
        self.engine.ingest(wave_docs, metadata=self.batch_metadata)
        # per-bucket lineage metrics: the engine just upserted this
        # wave's rows into root/metrics, whose buckets coincide with the
        # wave ids (same key hash + modulus) — prune the read to them.
        # Bucket contents are CUMULATIVE across batches (prior ingests
        # into the same engine land in the same buckets), so the read is
        # additionally semi-joined on the wave's own doc ids: checkpoint
        # metrics count THIS wave's documents only, also on incremental
        # top-up loads into a populated engine (VERDICT r4 #2).  The id
        # side is a column-pruned re-scan of the wave's input — ids
        # only, co-keyed with the metrics buckets.
        #
        # The bucket pruning is only valid while the metrics table's
        # layout matches the wave modulus — SragEngine.optimize() can
        # re-bucket mid-load.  On mismatch, fall back to an unpruned
        # read (the semi-join alone keeps the counts correct).
        meta = read_manifest(self.spark, self.engine.metrics_path)
        prune = wave if meta and meta["n_buckets"] == self.n_buckets else None
        m = (
            read_table(self.spark, self.engine.metrics_path, buckets=prune)
            .join(wave_docs.select("doc_id"), "doc_id", "left_semi")
            .withColumn("bucket", bucket_col(self.n_buckets))
        )
        agg = (
            m.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("blocks_kept").alias("kept"),
                F.sum("blocks_dropped").alias("dropped"),
                F.sum("parse_failures").alias("failures"),
            )
            .collect()
        )
        return {
            r["bucket"]: (r["docs"], r["kept"], r["dropped"], r["failures"])
            for r in agg
        }
