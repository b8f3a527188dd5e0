"""Extraction-domain operators over the generic `documents` table,
expressed purely in Catalyst so each has an exact ANSI-SQL oracle.

The driver's `documents` table is a single-line bag of words per doc,
so the "page" structure is synthesized deterministically: tokens are
re-wrapped into fixed-width lines (8 tokens/line), which gives every
engine the identical multi-line page to analyze. On that page we run
the text-domain analogs of the reference's layout operators:

- line explode + per-line features  = the label raster projected to
  1-D (SURVEY §1.2; eynollah's pixel rows become text lines)
- md5-derived line classification  = the patch classifier stand-in
  (deterministic, engine-portable; the real kernel lives in
  eynollah_spark.kernel and is fixture-verified instead)
- run-grouping of equal labels     = cv2.findContours in 1-D (F6,
  utils/contour.py:202-212): label != lag(label) → cumsum = region id
- region assembly + reading order  = stateful id counter as
  dense-rank-over-order (W5, utils/counter.py:39-48) and the
  order permutation (W1/W2)

Everything is split/transform/slice/explode/window — no Python UDFs,
fully inside whole-stage codegen; the only shuffle is the per-doc
window (analog of the per-conversation window in the real pipeline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TOKENS_PER_LINE = 8
FRAGMENT_MAX_TOKENS = 3  # lines with <= this many tokens are fragments
HEADER_MOD = 7  # md5(line) % HEADER_MOD == 0 -> header line


def _h64(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def doc_lines(docs: DataFrame) -> DataFrame:
    """Explode each document into fixed-width lines with positions.

    Output: doc_id, line_idx, line, n_tokens.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    n_lines = F.ceil(n / F.lit(float(TOKENS_PER_LINE))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * TOKENS_PER_LINE + 1, TOKENS_PER_LINE)
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(lines).alias("line_idx", "line"))
        .withColumn("n_tokens", F.size(F.split(F.col("line"), r"\s+")))
    )


def classify_lines(lines: DataFrame) -> DataFrame:
    """Deterministic per-line region label (classifier stand-in)."""
    label = (
        F.when(F.col("n_tokens") <= FRAGMENT_MAX_TOKENS, F.lit("fragment"))
        .when(_h64(F.col("line")) % HEADER_MOD == 0, F.lit("header"))
        .otherwise(F.lit("paragraph"))
    )
    return lines.withColumn("label", label)


def doc_line_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return classify_lines(doc_lines(docs))


def doc_region_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D contour extraction + region assembly + reading order.

    Runs of consecutive same-label lines become regions; region ids
    are the reference's counter format (region_%04d) derived from the
    run index; reading_order is the 0-based region permutation within
    the doc.
    """
    cl = doc_line_classify(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("line_idx")
    runs = cl.withColumn(
        "new_run",
        F.when(
            F.col("label") == F.lag("label").over(w), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "region_seq",
        F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        runs.groupBy("doc_id", "region_seq")
        .agg(
            F.min("label").alias("label"),
            F.min("line_idx").alias("start_line"),
            F.max("line_idx").alias("end_line"),
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("region_text"),
        )
        .withColumn("region_id", F.format_string("region_%04d", F.col("region_seq")))
        .withColumn("reading_order", (F.col("region_seq") - 1).cast("int"))
        .select(
            "doc_id",
            "region_id",
            "reading_order",
            "label",
            "start_line",
            "end_line",
            "n_lines",
            "region_text",
        )
    )


def doc_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 analog: whitespace-collapse + frame-strip normalization with
    before/after sizes (border detection's 1-D shadow)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.length(clean).alias("n_chars_clean"),
        F.substring(clean, 1, 40).alias("clean_prefix"),
    )
