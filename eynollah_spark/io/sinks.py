"""Resumable bucketed span sink (checkpoint/restart, north_rule O14).

The production design is an Iceberg table partitioned by
``bucket(N, conv_id)`` where each bucket commit is one atomic Iceberg
append and the manifest is the snapshot log. This container has no
Iceberg runtime jars, so the same semantics are implemented on plain
parquet with an explicit manifest directory:

    out/
      manifest/<run-tag>/bucket=<k>._done   (commit markers)
      data/_bucket=<k>/part-*.parquet       (hive-partitioned data)

- a bucket is the checkpoint unit: `conv_id`-hash determines the
  bucket, so every conversation lands wholly inside one bucket and a
  restart can never split or duplicate a conversation;
- `resume()` anti-joins the buckets already marked done (the
  "anti-join processed partitions on restart" from SURVEY §2.9/O14)
  and processes only the remainder;
- all pending buckets are written in ONE Spark job
  (`partitionBy("_bucket")` + dynamic partition overwrite) — not one
  job per bucket, which at 4096 buckets would be 4096 sequential
  jobs; per-bucket commit granularity is preserved by writing the
  marker files only AFTER the job commits, so a crash mid-job leaves
  every pending bucket unmarked and therefore re-processable
  (dynamic overwrite makes the retry idempotent per bucket
  directory).

At 100 TB scale the same code shape holds: swap the marker directory
for Iceberg snapshot commits; bucket count scales with cluster size
(e.g. 4096 buckets for 1000 executors).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _bucket_col(n_buckets: int):
    # pmod(xxhash64(conv_id)) — deterministic, executor-side, no UDF
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


class BucketedSpanSink:
    def __init__(self, root: str, n_buckets: int = 16, run_tag: str = "run"):
        self.root = root
        self.n_buckets = n_buckets
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifest", run_tag)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # --- manifest ---------------------------------------------------------
    def done_buckets(self) -> set[int]:
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("bucket=") and name.endswith("._done"):
                out.add(int(name[len("bucket=") : -len("._done")]))
        return out

    def _mark_done(self, bucket: int):
        open(os.path.join(self.manifest_dir, f"bucket={bucket}._done"), "w").close()

    # --- write ------------------------------------------------------------
    def write(self, spans: DataFrame, buckets: list[int] | None = None) -> list[int]:
        """Write all pending buckets in ONE Spark job, then commit the
        markers. Returns the buckets committed. `buckets=None` writes
        all pending ones.

        The single `partitionBy("_bucket")` write with dynamic
        partition overwrite replaces exactly the pending buckets'
        directories; markers land only after the job commits, so a
        crash anywhere in the job leaves every pending bucket
        unmarked and the retry rewrites them idempotently. An empty
        pending bucket (no rows hashed into it) is still committed —
        the successful job vacuously covered its predicate."""
        done = self.done_buckets()
        todo = [
            b
            for b in (buckets if buckets is not None else range(self.n_buckets))
            if b not in done
        ]
        if not todo:
            return []
        bucketed = spans.withColumn("_bucket", _bucket_col(self.n_buckets)).filter(
            F.col("_bucket").isin([int(b) for b in todo])
        )
        (
            bucketed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(self.data_dir)
        )
        for b in todo:
            self._mark_done(b)
        return todo

    def resume(self, spans: DataFrame) -> list[int]:
        """Finish an interrupted run: writes only not-yet-committed
        buckets. The input filter is pushed to the kernel's upstream via
        the bucket predicate, so already-done conversations are not even
        re-extracted when called on the raw turns pipeline."""
        return self.write(spans)

    # --- read -------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        done = sorted(self.done_buckets())
        if not done:
            # nothing was ever committed — a read here is a caller bug
            raise FileNotFoundError(f"no committed buckets under {self.root}")
        paths = [
            p
            for b in done
            if os.path.isdir(p := os.path.join(self.data_dir, f"_bucket={b}"))
        ]  # committed-but-empty buckets have no directory
        if not paths:
            # buckets WERE committed but every one was empty (no rows
            # hashed into them): a committed-empty result is an empty
            # frame with the span schema, not an error
            from eynollah_spark.operators.extract import SPAN_SCHEMA

            return spark.createDataFrame([], SPAN_SCHEMA)
        return spark.read.parquet(*paths)


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of the first configured Iceberg catalog, or None.

    The probe is configuration-only (no classloading side effects): a
    ``spark.sql.catalog.<name>`` entry whose implementation class
    mentions Iceberg. This container ships no Iceberg jars, so the
    probe returns None here and the parquet+manifest stand-in is used;
    on a real cluster with a catalog configured the same pipeline
    upgrades to Iceberg snapshot commits via ``IcebergSpanSink`` with
    no caller changes (see ``span_sink``)."""
    prefix = "spark.sql.catalog."
    for key, val in spark.sparkContext.getConf().getAll():
        if key.startswith(prefix) and key.count(".") == 3 and "iceberg" in val.lower():
            return key[len(prefix):]
    return None


class IcebergSpanSink:
    """The production twin of ``BucketedSpanSink`` on a real Iceberg
    catalog: same API (write/resume/read/done_buckets), same commit
    unit (a conv_id-hash bucket), but the data commit is an Iceberg
    ``overwritePartitions`` (atomic snapshot, replaces exactly the
    pending buckets' partitions) and the manifest is a companion
    Iceberg table of committed bucket ids appended AFTER the data
    snapshot commits — the same marker-after-data ordering as the
    parquet sink, so a crash between the two leaves buckets unmarked
    and idempotently re-writable.

    Exercised only where an Iceberg catalog exists
    (tests/test_resume_metrics.py skips it in this container)."""

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 16,
                 run_tag: str = "run"):
        self.spark = spark
        self.table = table
        self.manifest_table = f"{table}_manifest"
        self.n_buckets = n_buckets
        self.run_tag = run_tag
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.manifest_table} "
            "(run_tag STRING, bucket INT) USING iceberg"
        )

    def done_buckets(self) -> set[int]:
        rows = self.spark.sql(
            f"SELECT bucket FROM {self.manifest_table} "
            f"WHERE run_tag = '{self.run_tag}'"
        ).collect()
        return {r.bucket for r in rows}

    def write(self, spans: DataFrame, buckets: list[int] | None = None) -> list[int]:
        done = self.done_buckets()
        todo = [
            b
            for b in (buckets if buckets is not None else range(self.n_buckets))
            if b not in done
        ]
        if not todo:
            return []
        bucketed = spans.withColumn("_bucket", _bucket_col(self.n_buckets)).filter(
            F.col("_bucket").isin([int(b) for b in todo])
        )
        if self.spark.catalog.tableExists(self.table):
            bucketed.writeTo(self.table).overwritePartitions()
        else:
            bucketed.writeTo(self.table).partitionedBy(
                F.col("_bucket")
            ).createOrReplace()
        self.spark.createDataFrame(
            [(self.run_tag, int(b)) for b in todo], "run_tag string, bucket int"
        ).writeTo(self.manifest_table).append()
        return todo

    def resume(self, spans: DataFrame) -> list[int]:
        return self.write(spans)

    def read(self) -> DataFrame:
        done = sorted(self.done_buckets())
        return self.spark.table(self.table).filter(
            F.col("_bucket").isin([int(b) for b in done])
        )


def span_sink(spark: SparkSession, root_or_table: str, n_buckets: int = 16,
              run_tag: str = "run"):
    """Environment-dispatching sink factory: an Iceberg catalog in the
    session config selects ``IcebergSpanSink`` (snapshot commits); no
    catalog selects the parquet+manifest ``BucketedSpanSink`` with
    identical resume semantics. Callers hold only the shared API."""
    if iceberg_catalog(spark) is not None:
        return IcebergSpanSink(spark, root_or_table, n_buckets, run_tag)
    return BucketedSpanSink(root_or_table, n_buckets, run_tag)


def filter_pending_turns(turns: DataFrame, sink: BucketedSpanSink) -> DataFrame:
    """Prune already-committed conversations BEFORE the kernel runs —
    the restart path reads/extracts only pending buckets (partition
    pruning analog; at scale this predicate prunes Iceberg manifests).
    """
    done = sink.done_buckets()
    if not done:
        return turns
    return turns.filter(~_bucket_col(sink.n_buckets).isin([int(b) for b in done]))
