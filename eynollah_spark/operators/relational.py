"""Relational operator surface over the TPC-H-ish testdata tables.

Each query here demonstrates one operator family from SURVEY.md §2 on
the driver-provided tables (region nation customer supplier part
orders lineitem events) and has an exact ANSI-SQL oracle in
``__spark_entry__.oracle_sql()``:

- scans + predicate pushdown + partial aggregation (A1-A8 analogs)
- broadcast / shuffle equi-joins and join reordering (J* family)
- anti/semi joins (U2, P8 analogs)
- range/interval joins against a broadcast dim (J1 analog)
- windows: ranking, top-1 per group, permutation inversion (W1/W2/W5,
  T2), sessionization by gap = the 1-D contour / run-grouping operator
  (F6: cv2.findContours == label-run sessionization)
- time-bucket rollups (A1/A2 projection-profile analogs)

Determinism rules (so the DuckDB oracle hashes identically):
- every float aggregate is rounded (2dp money, 6dp ratios)
- every ranking orders by (rounded measure, key) — a total order
- timestamps leave as formatted strings
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A: aggregation — TPC-H Q1 shape (partial agg under the shuffle is
# automatic; the scan reads only the 7 referenced columns)
# ---------------------------------------------------------------------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J: multi-join + group + top-k — TPC-H Q3 shape. customer is small →
# broadcast; revenue rounded before ranking so the top-10 set is a
# total order shared with the oracle.
# ---------------------------------------------------------------------------
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        joined.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue")
    )


# ---------------------------------------------------------------------------
# J: star join through two broadcast dims — TPC-H Q5 shape (nation and
# region are tiny: both broadcast; only orders⋈lineitem shuffles).
# ---------------------------------------------------------------------------
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# W/T: top-1 per group (argmax, T2) — window row_number + rank
# inversion check (W2): order_rank is the rank by price, inv_rank is
# the rank of the rank — identical permutation inversion to
# eynollah.py:1450-1452.
# ---------------------------------------------------------------------------
def customer_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.round(F.col("o_totalprice"), 2)), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.round("o_totalprice", 2).alias("top_price"),
        )
    )


# ---------------------------------------------------------------------------
# U2: anti-join (set difference of key sets)
# ---------------------------------------------------------------------------
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# J1 analog: range/interval join against a small broadcast dim —
# point-in-interval containment, exactly the region→box assignment
# (eynollah.py:1386-1399) shape. The bucket dim is inline (VALUES) so
# both engines construct it identically.
# ---------------------------------------------------------------------------
PRICE_BUCKETS = [
    (0.0, 50_000.0, "small"),
    (50_000.0, 150_000.0, "medium"),
    (150_000.0, 300_000.0, "large"),
    (300_000.0, 10_000_000.0, "jumbo"),
]


def order_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(PRICE_BUCKETS, ["lo", "hi", "bucket"])
    return (
        orders.join(
            F.broadcast(buckets),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# semi-join (EXISTS) — TPC-H Q4 shape
# ---------------------------------------------------------------------------
def priority_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# F6 analog on real data: sessionization by time gap — the 1-D
# connected-components / run-grouping operator (lag → gap flag →
# cumulative sum = session id), identical to how label runs become
# text regions in the kernel.
# ---------------------------------------------------------------------------
SESSION_GAP_S = 1800


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = prev.isNull() | (
        F.col("ts") > prev + F.expr(f"INTERVAL {SESSION_GAP_S} SECONDS")
    )
    sess = (
        ev.withColumn("new_sess", F.when(new_sess, 1).otherwise(0))
        .withColumn("session_seq", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# J5 analog: interval fusion — intervals whose ranges interleave are
# unioned into one band (add_tables_heuristic_to_layout,
# eynollah.py:1783-1817: tables + horizontal lines fused by y-range).
# Here: per-user sessions fused across users into global activity
# bands via the sweep pattern (running max of interval ends).
# ---------------------------------------------------------------------------
def activity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union sweep as a TWO-LEVEL scan: the running max and
    the band counter run inside day buckets (partitioned windows), and
    only the one-row-per-day bucket summary crosses buckets through a
    global window — bounded by #days, not #sessions, so the sweep
    never serializes the corpus into one partition. Results are
    byte-identical to the single-window formulation (bucket = day of
    session start is monotone in the global (s, e) order)."""
    sessions = events_sessionize(spark, sf_dir).select(
        F.to_timestamp("session_start").alias("s"),
        F.to_timestamp("session_end").alias("e"),
    )
    sess = sessions.withColumn(
        "bucket", F.datediff(F.col("s"), F.lit("1970-01-01"))
    )
    w_prev = Window.partitionBy("bucket").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    loc = sess.withColumn("local_prev_max_e", F.max("e").over(w_prev))
    # bucket summary: one row per day; the global window is O(#days)
    bmax = sess.groupBy("bucket").agg(F.max("e").alias("bmax_e"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = bmax.withColumn("prev_bmax_e", F.max("bmax_e").over(w_b)).select(
        "bucket", "prev_bmax_e"
    )
    j = loc.join(F.broadcast(boff), "bucket")
    prev_max = F.greatest("local_prev_max_e", "prev_bmax_e")
    j = j.withColumn(
        "new_band",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    ).withColumn(
        "local_band",
        F.sum("new_band").over(
            Window.partitionBy("bucket")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    bsum = j.groupBy("bucket").agg(F.sum("new_band").alias("nb"))
    boff2 = bsum.withColumn(
        "band_off",
        F.coalesce(
            F.sum("nb").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "band_off")
    grouped = j.join(F.broadcast(boff2), "bucket").withColumn(
        "band_id", (F.col("local_band") + F.col("band_off")).cast("bigint")
    )
    return grouped.groupBy("band_id").agg(
        F.date_format(F.min("s"), "yyyy-MM-dd HH:mm:ss").alias("band_start"),
        F.date_format(F.max("e"), "yyyy-MM-dd HH:mm:ss").alias("band_end"),
        F.count(F.lit(1)).alias("n_sessions"),
    )


# ---------------------------------------------------------------------------
# J7 analog: mother/child set-inclusion self-join
# (return_x_start_end_mothers_childs_and_type_of_reading_order,
# utils/__init__.py:213-297: separator column-ranges contained in other
# ranges get has_mother/has_child flags that drive reading-order type).
# Here: session time-intervals across users; a session strictly inside
# another user's session has a mother, the outer one has a child.
# ---------------------------------------------------------------------------
def session_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = events_sessionize(spark, sf_dir).select(
        "user_id",
        "session_seq",
        F.to_timestamp("session_start").alias("s"),
        F.to_timestamp("session_end").alias("e"),
    )
    # time-bucket prejoin: a container must cover the contained
    # session's START (b.s <= a.s <= b.e), so hash-joining a's start
    # day against b exploded over its day range replaces the O(S^2)
    # cross product with a bucketed equi-join; each (a, b) pair meets
    # on exactly one bucket (a's start day), so no duplicates arise
    day = lambda c: F.datediff(F.col(c), F.lit("1970-01-01"))  # noqa: E731
    a = sess.withColumn("bucket", day("s")).alias("a")
    b = (
        sess.withColumn(
            "bucket", F.explode(F.sequence(day("s"), day("e")))
        )
    ).alias("b")
    contained = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.s") <= F.col("a.s"))
            & (F.col("a.e") <= F.col("b.e"))
            & (
                (F.col("a.user_id") != F.col("b.user_id"))
                | (F.col("a.session_seq") != F.col("b.session_seq"))
            ),
            "inner",
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.session_seq").alias("session_seq"),
            F.col("b.user_id").alias("m_user"),
            F.col("b.session_seq").alias("m_seq"),
        )
        .distinct()
    )
    mothers = contained.select("user_id", "session_seq").distinct().withColumn(
        "has_mother", F.lit(1)
    )
    children = (
        contained.select(
            F.col("m_user").alias("user_id"), F.col("m_seq").alias("session_seq")
        )
        .distinct()
        .withColumn("has_child", F.lit(1))
    )
    return (
        sess.join(mothers, ["user_id", "session_seq"], "left")
        .join(children, ["user_id", "session_seq"], "left")
        .select(
            "user_id",
            "session_seq",
            F.coalesce("has_mother", F.lit(0)).alias("has_mother"),
            F.coalesce("has_child", F.lit(0)).alias("has_child"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A2 analog: time-bucket projection profile (per-minute rollup)
# ---------------------------------------------------------------------------
def events_minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
