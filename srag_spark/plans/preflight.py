"""J8/J9 — preflight checks and startup sequence helpers.

The reference fans out health checks to all 8 ports before serving
(HealthCheckService.scala:62-75) and gates startup on them with retries
(Main.scala:36-49,87-112).  The lake equivalent: verify inputs exist and
are readable with the expected schema, and that output locations are
writable, before launching a multi-hour job.  Checks run concurrently is
pointless here (FS metadata round-trips), so they run sequentially but
report ALL failures at once, like the reference's aggregated health
report.  The writability probe goes through the Hadoop FS API (fsio), so
the gate exercises the SAME filesystem the job will write to — on
S3A/HDFS a local-FS probe would prove nothing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from srag_spark.schema import DOCUMENTS_SCHEMA
from srag_spark.sources import fsio


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str = ""


def check_input_table(spark: SparkSession, path: str) -> CheckResult:
    """Input exists, is readable parquet, and has the input_hint columns."""
    try:
        df = spark.read.parquet(path)
    except Exception as exc:  # noqa: BLE001
        return CheckResult("input_table", False, f"unreadable: {exc}")
    missing = [f.name for f in DOCUMENTS_SCHEMA.fields if f.name not in df.columns]
    if missing:
        return CheckResult("input_table", False, f"missing columns: {missing}")
    return CheckResult("input_table", True)


def check_output_writable(spark: SparkSession, path: str) -> CheckResult:
    try:
        fsio.mkdirs(spark, path)
        probe = f"{path}/.preflight_probe"
        fsio.write_text(spark, probe, "ok")
        fsio.delete(spark, probe, recursive=False)
        return CheckResult("output_writable", True)
    except Exception as exc:  # noqa: BLE001 — py4j raises Java IO errors
        return CheckResult("output_writable", False, str(exc))


def check_manifest_table(spark: SparkSession, path: str) -> CheckResult:
    """A manifest-committed table (sources.tables) is healthy: latest
    manifest parses and every bucket dir it references exists.  An
    absent table is healthy-vacuously (first ingest will create it) —
    the reference likewise reports per-dependency status rather than
    failing on cold stores (HealthCheckService.scala:62-75)."""
    from srag_spark.sources.tables import read_manifest

    name = f"table:{path.rstrip('/').rsplit('/', 1)[-1]}"
    try:
        manifest = read_manifest(spark, path)
    except Exception as exc:  # noqa: BLE001
        return CheckResult(name, False, f"manifest unreadable: {exc}")
    if manifest is None:
        return CheckResult(name, True, "absent (no snapshot yet)")
    missing = [
        d
        for d in manifest["buckets"].values()
        if not fsio.exists(spark, f"{path}/{d}")
    ]
    if missing:
        return CheckResult(
            name, False, f"v{manifest['version']} references missing dirs: "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''}"
        )
    return CheckResult(name, True, f"v{manifest['version']}")


def health_check(spark: SparkSession, table_paths: list[str], root: str) -> list[CheckResult]:
    """J8 aggregated health over an engine root: every table's latest
    snapshot is readable+complete and the root is writable.  Raises
    RuntimeError listing ALL failures (the reference's aggregated
    unhealthy-ports report)."""
    results = [check_manifest_table(spark, p) for p in table_paths]
    results.append(check_output_writable(spark, root))
    failures = [r for r in results if not r.ok]
    if failures:
        raise RuntimeError(
            "health check failed: "
            + "; ".join(f"{r.name}: {r.detail}" for r in failures)
        )
    return results


def preflight(spark: SparkSession, input_path: str, output_path: str) -> list[CheckResult]:
    """All checks; raises RuntimeError listing every failure (the
    reference aggregates unhealthy ports the same way)."""
    results = [
        check_input_table(spark, input_path),
        check_output_writable(spark, output_path),
    ]
    failures = [r for r in results if not r.ok]
    if failures:
        raise RuntimeError(
            "preflight failed: "
            + "; ".join(f"{r.name}: {r.detail}" for r in failures)
        )
    return results
