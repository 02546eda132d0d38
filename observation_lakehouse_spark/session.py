"""SparkSession factory tuned for the observation-lakehouse workload.

The reference engine (DuckDB over PyIceberg, /root/reference/olake/lakehouse.py:338-363)
tunes threads/memory_limit as commented-out pragmas; here the equivalent knobs are
Spark SQL confs. Defaults target the driver harness (local[32], 128 GiB box) but every
setting is overridable, and nothing here assumes local mode — on a real cluster the
same builder applies (shuffle partitions are sized by AQE at runtime).

Design decisions for 100 TB:
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic broadcast-join conversion replace hand-tuned shuffle sizing.
- Arrow on: pandas interchange and pandas UDFs move columnar batches, not rows.
- Session timezone pinned to UTC so timestamp semantics are reproducible across
  the DuckDB oracle, the driver harness, and any production cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Adaptive execution: re-plan post-shuffle (coalesce, skew split, bcast convert).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-backed pandas interchange (toPandas / pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics across engines.
    "spark.sql.session.timeZone": "UTC",
    # Pivot width guard: reference SRMs are ~26-37 impl columns (BASELINE.md), but a
    # CI-scale pivot could explode; 10k matches Spark default, stated explicitly.
    "spark.sql.pivotMaxValues": "10000",
    # Local-mode UI is pure startup overhead.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "observation-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) when no
    cluster master is configured; on a real deployment pass ``master=None`` with
    ``--master`` supplied externally.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = dict(_DEFAULTS)
    # One shuffle partition per core locally; on a cluster AQE coalesces from a
    # higher initial count, so only pin when explicitly asked or in local mode.
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
