"""SparkSession factory with the configs this engine relies on.

Tuned for correctness-at-scale defaults: AQE (with skew-join handling),
Arrow-vectorized Python execution, and bounded Arrow batch sizes so a
pathological multi-MB turn can't blow up an executor (the analog of the
reference's per-stage memory teardown, eynollah.py:257-260).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "eynollah-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow everywhere a Python boundary exists
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # AQE: post-shuffle coalescing + skew-join splitting at scale
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep the UI off in tests/bench (fixture runs spawn many sessions)
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
