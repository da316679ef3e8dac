"""Ingest audit gates — the A in write–audit–publish.

An audited ingest is the production gate for a training corpus: land a
batch invisibly (:meth:`SragEngine.stage_ingest`), run a panel of audits
against exactly the rows that would go live, and publish only if every
gate passes — a failed batch unwinds with manifest-only rollbacks,
never a rewrite of live data.

Each audit is a callable ``audit(engine, staging_id) -> CheckResult``;
the canned ones below are factories so thresholds read declaratively::

    from srag_spark.plans.audits import (
        audited_ingest, min_docs, max_contamination, min_quality,
        max_duplicate_rate,
    )
    report = audited_ingest(
        engine, docs,
        audits=[
            min_docs(100),
            min_quality(0.35),
            max_duplicate_rate(0.20),
            max_contamination(eval_docs, 0.01),
        ],
    )
    report["published"]  # True only if every gate passed

Scale shape: every audit reads the staged CHANGELOG (the batch's own
rows via manifest-pruned bucket reads + one co-bucketed diff join), not
the whole table — audit cost is O(batch), not O(corpus).  The only audit
that looks beyond the batch is ``max_duplicate_rate(vs_base=True)``,
which joins batch text hashes against the base chunks (one extra scan of
the base table's hash column, stated in its docstring).

Reference semantics: the reference pipeline validates per document
during indexing (language gate, parse failure handling —
IndexingPipeline.scala); this lifts validation to batch scope with
snapshot-atomic accept/reject, which only a lake engine can offer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.plans.preflight import CheckResult


def _batch_chunks(engine, staging_id: str):
    """The staged batch's live chunk rows (inserts + post-image updates)."""
    return engine.staged_changelog(staging_id, "chunks").filter(
        F.col("change_type") != "delete"
    )


def min_docs(n: int):
    """Gate: the batch must touch at least ``n`` documents (empty or
    truncated upstream extracts are the classic silent failure)."""

    def audit(engine, staging_id: str) -> CheckResult:
        got = (
            engine.staged_changelog(staging_id, "transcripts")
            .filter(F.col("change_type") != "delete")
            .count()
        )
        return CheckResult(
            name=f"min_docs({n})", ok=got >= n, detail=f"batch docs={got}"
        )

    return audit


def max_parse_failure_rate(max_frac: float):
    """Gate: fraction of batch docs with any parse failure ≤ ``max_frac``
    (reads the metrics table's per-doc lineage, batch rows only)."""

    def audit(engine, staging_id: str) -> CheckResult:
        m = engine.staged_changelog(staging_id, "metrics").filter(
            F.col("change_type") != "delete"
        )
        row = m.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("parse_failures") > 0).cast("long")).alias("bad"),
        ).first()
        n, bad = row["n"] or 0, row["bad"] or 0
        frac = bad / n if n else 0.0
        return CheckResult(
            name=f"max_parse_failure_rate({max_frac})",
            ok=frac <= max_frac,
            detail=f"{bad}/{n} docs with parse failures ({frac:.4f})",
        )

    return audit


def min_quality(min_mean: float):
    """Gate: mean heuristic quality score of the batch's chunk text
    (``textstats.quality_metric_cols`` composite, 0–1) ≥ ``min_mean``."""
    from srag_spark.operators.textstats import quality_metric_cols

    def audit(engine, staging_id: str) -> CheckResult:
        cols = quality_metric_cols(F.col("text"))
        got = (
            _batch_chunks(engine, staging_id)
            .select(cols["quality_r"].alias("q"))
            .agg(F.avg("q"))
            .first()[0]
        )
        got = float(got) if got is not None else 0.0
        return CheckResult(
            name=f"min_quality({min_mean})",
            ok=got >= min_mean,
            detail=f"mean quality={got:.4f}",
        )

    return audit


def max_duplicate_rate(max_frac: float, vs_base: bool = False):
    """Gate: fraction of batch chunks whose exact text duplicates another
    chunk ≤ ``max_frac``.  Within-batch by default (one hash groupBy over
    the batch).  ``vs_base=True`` ALSO counts batch chunks whose text
    already exists in the base table — that join scans the base chunks'
    hash column once (the one audit whose cost is O(corpus), stated
    here; the hash projection keeps the scan narrow)."""

    def audit(engine, staging_id: str) -> CheckResult:
        batch = _batch_chunks(engine, staging_id).select(
            "doc_id", "segment_index", F.md5("text").alias("_h")
        )
        n = batch.count()
        if n == 0:
            return CheckResult(
                name=f"max_duplicate_rate({max_frac})", ok=True, detail="empty batch"
            )
        per_hash = batch.groupBy("_h").agg(F.count(F.lit(1)).alias("c"))
        dups = (
            per_hash.filter(F.col("c") > 1)
            .agg(F.sum(F.col("c") - 1))
            .first()[0]
            or 0
        )
        if vs_base:
            rec = engine._wap_record(staging_id)
            base_v = rec["base"].get("chunks")
            if base_v is not None:
                from srag_spark.sources.tables import read_table

                base_h = (
                    read_table(engine.spark, engine.chunks_path, version=base_v)
                    .select(F.md5("text").alias("_h"))
                    .distinct()
                )
                # batch rows whose hash predates the batch — each is a dup
                # (count batch-side occurrences, not base-side)
                dups += (
                    per_hash.join(base_h, "_h", "left_semi")
                    .agg(F.sum("c"))
                    .first()[0]
                    or 0
                )
        frac = dups / n
        return CheckResult(
            name=f"max_duplicate_rate({max_frac})",
            ok=frac <= max_frac,
            detail=f"{dups}/{n} duplicate chunks ({frac:.4f})",
        )

    return audit


def max_contamination(eval_docs, max_frac: float, n: int = 13):
    """Gate: fraction of batch documents contaminated by the eval set
    (any order-``n`` token window of a doc's chunks appearing in
    ``eval_docs.text``) ≤ ``max_frac``.  The eval windows broadcast;
    cost is linear in batch tokens (``corpus.find_contamination``)."""
    from srag_spark.operators.corpus import find_contamination

    def audit(engine, staging_id: str) -> CheckResult:
        # reassemble each doc in segment order (collect_list is unordered)
        docs = (
            _batch_chunks(engine, staging_id)
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("segment_index", "text"))
                        ),
                        lambda s: s["text"],
                    ),
                    " ",
                ).alias("text")
            )
        )
        verdicts = find_contamination(docs, eval_docs, n=n)
        row = verdicts.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("contaminated").cast("long")).alias("bad"),
        ).first()
        total, bad = row["n"] or 0, row["bad"] or 0
        frac = bad / total if total else 0.0
        return CheckResult(
            name=f"max_contamination({max_frac})",
            ok=frac <= max_frac,
            detail=f"{bad}/{total} contaminated docs ({frac:.4f})",
        )

    return audit


def audited_ingest(
    engine,
    docs,
    audits,
    metadata: dict[str, str] | None = None,
    keep_failed_stage: bool = False,
) -> dict:
    """Stage → audit → publish-or-abandon, as one call.

    Runs EVERY audit (a failing batch gets its full diagnosis, not just
    the first gate), publishes only if all pass, abandons otherwise
    (``keep_failed_stage=True`` leaves the failed stage pending for
    manual inspection via :meth:`SragEngine.staged_tables` — drop it
    later with :meth:`SragEngine.abandon_ingest`).

    Returns ``{"published": bool, "staging_id": str | None,
    "audits": [CheckResult...], **ingest counts}`` — ``staging_id`` is
    None once the stage is resolved (published or abandoned), and the
    pending id when a failed stage is kept.
    """
    res = engine.stage_ingest(docs, metadata=metadata)
    sid = res.pop("staging_id")
    results = [a(engine, sid) for a in audits]
    ok = all(r.ok for r in results)
    if ok:
        engine.publish_ingest(sid)
        sid = None
    elif not keep_failed_stage:
        engine.abandon_ingest(sid)
        sid = None
    return {"published": ok, "staging_id": sid, "audits": results, **res}
