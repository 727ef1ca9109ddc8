"""Relational query inventory: the reference's SQL semantics re-expressed
Spark-first over the driver's TPC-H-ish tables.

Reference parity map (SURVEY.md section 2):
- `revenue_analytics` mirrors flink-cdc/sql/revenue-analytics.sql:46-65 --
  fact-dim equi join + multi-column GROUP BY + SUM/COUNT/AVG/MAX + 3x
  conditional-count + 3x conditional-sum status pivot (operators J1, A1-A7,
  P1-P5), with orders as the ticket fact (o_orderstatus in {O,P,F} standing
  in for scheduled/live/finished) and customer as the dimension.
- The remaining queries exercise every other relational operator class the
  engine exposes: scans+pushdown, sort/limit, outer/semi/anti joins, set ops,
  rollup, distinct agg, windowed event-time aggregation, OVER windows.

Float determinism contract (must hold vs the DuckDB oracle): never aggregate
raw DOUBLEs. Cast money columns to exact DECIMAL before SUM/AVG; convert the
exact result to DOUBLE at the end; do divisions in DOUBLE afterwards. Both
engines then run identical float ops on identical inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table

DEC = "decimal(12,2)"  # exact money type (reference uses DECIMAL(10,2) costs)
DEC4 = "decimal(4,2)"  # discounts / taxes in [0,1)


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


# ---------------------------------------------------------------------------
# Flagship: continuous revenue analytics, batch form
# ---------------------------------------------------------------------------

REVENUE_STATUSES = (("O", "open"), ("P", "pending"), ("F", "finished"))


@register(
    "revenue_analytics",
    oracle="""
    SELECT
      o.o_custkey                       AS customer_id,
      c.c_name                          AS customer_name,
      c.c_mktsegment                    AS mktsegment,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue,
      COUNT(*)                          AS order_count,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_order_value,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_orders,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN CAST(o.o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS open_revenue,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN CAST(o.o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS pending_revenue,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN CAST(o.o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS finished_revenue,
      MAX(o.o_orderdate)                AS last_order_at
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate IS NOT NULL
    GROUP BY o.o_custkey, c.c_name, c.c_mktsegment
    """,
    description="Reference revenue-analytics.sql:46-65 semantics: fact-dim join"
    " + grouped SUM/COUNT/AVG/MAX + per-status conditional pivot (J1, A1-A7).",
)
def revenue_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note: orders-customer is a key-key join; at 100 TB both sides are
    # large so this plans as a shuffle hash join on o_custkey with AQE skew
    # handling. At test SF the 64m broadcast threshold turns it into a
    # broadcast join automatically -- no manual hint needed either way.
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    customer = load_table(spark, sf_dir, "customer")

    cost = _dec("o_totalprice")
    zero = F.lit(0).cast(DEC)
    aggs = [
        F.sum(cost).cast("double").alias("total_revenue"),
        F.count(F.lit(1)).alias("order_count"),
    ]
    status_aggs = []
    for code, label in REVENUE_STATUSES:
        is_code = F.col("o_orderstatus") == code
        status_aggs.append(F.sum(F.when(is_code, 1).otherwise(0)).alias(f"{label}_orders"))
        status_aggs.append(
            F.sum(F.when(is_code, cost).otherwise(zero)).cast("double").alias(f"{label}_revenue")
        )
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    out = joined.groupBy(
        F.col("o_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        *aggs,
        *status_aggs[0::2],
        *status_aggs[1::2],
        F.max("o_orderdate").alias("last_order_at"),
    )
    return out.withColumn(
        "avg_order_value", F.col("total_revenue") / F.col("order_count")
    ).select(
        "customer_id", "customer_name", "mktsegment", "total_revenue",
        "order_count", "avg_order_value", "open_orders", "pending_orders",
        "finished_orders", "open_revenue", "pending_revenue",
        "finished_revenue", "last_order_at",
    )


# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): wide aggregate over the big fact table
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="Wide partial+final aggregation over the fact table with filter"
    " pushdown (A2-A8, P2/P5); two-phase agg is Catalyst-native.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # filter is pushed to the parquet scan (PushedFilters in .explain)
    li = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
    one = F.lit(1).cast(DEC4)
    qty, price = _dec("l_quantity"), _dec("l_extendedprice")
    disc, tax = F.col("l_discount").cast(DEC4), F.col("l_tax").cast(DEC4)
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        F.sum(disc).cast("double").alias("sum_disc_exact"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return grouped.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("sum_disc_exact") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# Top-k with multi-join (TPC-H Q3 shape): sort + limit + 3-way join
# ---------------------------------------------------------------------------

@register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT
      l.l_orderkey AS orderkey,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      o.o_orderdate AS orderdate,
      o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
    description="3-way join + agg + global top-k (sort/limit with unique"
    " tie-break; TakeOrderedAndProject, no full sort at scale).",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(DEC4)
    rev = _dec("l_extendedprice") * (one - F.col("l_discount").cast(DEC4))
    out = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        # global top-k compiles to TakeOrderedAndProject: per-partition heap +
        # driver merge, no full shuffle sort even at 100 TB
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )
    return out.select("orderkey", "revenue", "orderdate", "orderpriority")


# ---------------------------------------------------------------------------
# Deep join tree (TPC-H Q5 shape): 6-way join through the star schema
# ---------------------------------------------------------------------------

@register(
    "q5_region_revenue",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    description="6-way star join with broadcast of fixed-size dims"
    " (region/nation) and Catalyst join reordering (J1 generalization).",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    # region and nation are fixed-cardinality (5/25 rows at every SF) --
    # always broadcast them regardless of cluster-side thresholds
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    one = F.lit(1).cast(DEC4)
    rev = _dec("l_extendedprice") * (one - F.col("l_discount").cast(DEC4))
    out = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    return out


# ---------------------------------------------------------------------------
# OVER windows: top-n per group (ranking)
# ---------------------------------------------------------------------------

@register(
    "window_topn_per_group",
    oracle="""
    SELECT p_brand AS brand, p_partkey AS partkey, p_retailprice AS retailprice, rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part
    )
    WHERE rn <= 3
    """,
    description="Ranking OVER window: top-3 parts by price per brand."
    " Same primitive that materializes PK snapshots from changelogs (K1).",
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_retailprice").alias("retailprice"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# Outer / semi / anti joins
# ---------------------------------------------------------------------------

@register(
    "left_join_order_coverage",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           COUNT(o.o_orderkey) AS order_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    description="Left outer join + count-of-nullable (customers with zero"
    " orders kept at count 0).",
)
def left_join_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(F.count("o_orderkey").alias("order_count"))
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    description="Left anti join (NOT EXISTS decorrelation).",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment")
    )


# Planted order-less customers for the non-vacuous anti-join stamp: keys in
# the 900001+ range the generator's dense key space never reaches (the
# planted-sweep convention, tools/planted_sweep.py). The generated corpus
# gives every customer at least one order at the driver's scale factors, so
# the base query's stamped rows were 0-vs-0 (r9 verdict blemish 1); the
# planted variant unions these in-plan -- the multimodal_phash_dedup_planted
# precedent -- so the stamped row exercises the null-extension path with
# cardinality >= 3.
_ANTI_PLANTED = (
    (900001, "BUILDING"),
    (900002, "MACHINERY"),
    (900005, "AUTOMOBILE"),
)


@register(
    "anti_join_customers_without_orders_planted",
    oracle=f"""
    WITH u AS (
      SELECT c_custkey, c_mktsegment FROM customer
      UNION ALL
      SELECT * FROM (VALUES {", ".join(f"({k}, '{s}')" for k, s in _ANTI_PLANTED)})
        t(c_custkey, c_mktsegment)
    )
    SELECT c_custkey AS custkey, c_mktsegment AS mktsegment
    FROM u
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = u.c_custkey)
    """,
    description="Left anti join (NOT EXISTS decorrelation) with planted"
    " order-less customers unioned in-plan, so the stamped result is"
    " non-vacuous at every scale factor (the generated corpus gives every"
    " customer orders; the base form's stamped rows were 0-vs-0). Strict"
    " superset of anti_join_customers_without_orders: identical anti-join"
    " over base UNION ALL planted keys.",
)
def anti_join_customers_without_orders_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    planted = spark.createDataFrame(
        list(_ANTI_PLANTED), "c_custkey long, c_mktsegment string"
    )
    u = c.unionByName(planted)
    o = load_table(spark, sf_dir, "orders")
    return u.join(o, u.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment")
    )


@register(
    "semi_join_active_suppliers",
    oracle="""
    SELECT s_suppkey AS suppkey, s_name AS name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    """,
    description="Left semi join (EXISTS) with pushed-down predicate.",
)
def semi_join_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "setop_multi_status_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    description="INTERSECT (distinct) of two filtered scans.",
)
def setop_multi_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    fin_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_c.intersect(fin_c)


@register(
    "setop_except_large_orders",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    """,
    description="EXCEPT: customers who never placed a >200k order.",
)
def setop_except_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey")).distinct()
    big_c = (
        o.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return all_c.exceptAll(big_c).distinct()


# ---------------------------------------------------------------------------
# ROLLUP / distinct aggregates
# ---------------------------------------------------------------------------

@register(
    "rollup_nation_segment_revenue",
    oracle="""
    SELECT
      COALESCE(n.n_name, 'ALL')       AS nation,
      COALESCE(c.c_mktsegment, 'ALL') AS mktsegment,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS order_count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    description="ROLLUP hierarchy totals (grouping-sets family; free Spark"
    " extension beyond the reference per SURVEY 2.5).",
)
def rollup_nation_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = o.join(c, o.o_custkey == c.c_custkey).join(n, c.c_nationkey == n.n_nationkey)
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("mktsegment"),
            "revenue",
            "order_count",
        )
    )


@register(
    "distinct_agg_parts_per_priority",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority,
           COUNT(DISTINCT l.l_partkey) AS distinct_parts,
           COUNT(DISTINCT l.l_suppkey) AS distinct_suppliers,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    description="Multiple COUNT(DISTINCT) in one aggregate (expand+two-phase"
    " plan in Spark).",
)
def distinct_agg_parts_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time tumbling window aggregation (streaming semantics, batch form)
# ---------------------------------------------------------------------------

@register(
    "event_time_tumbling_hourly",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS window_start,
      event_type,
      COUNT(*) AS event_count,
      COUNT(DISTINCT user_id) AS unique_users,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    description="Tumbling 1h event-time window aggregation (T1/A9/A10 batch"
    " form; the streaming twin uses F.window + withWatermark).",
)
def event_time_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "unique_users",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

@register(
    "q17_below_avg_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / COUNT(*)) AS half_avg_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT l.l_partkey AS partkey,
           COUNT(*) AS small_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_revenue
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.half_avg_qty
    GROUP BY l.l_partkey
    """,
    description="Correlated scalar subquery (TPC-H Q17 shape) decorrelated"
    " Spark-first: one per-part aggregate + equi self-join beats a per-row"
    " subquery re-scan; both aggregations are partial/final two-phase on the"
    " same l_partkey key, so AQE reuses the shuffle partitioning.",
)
def q17_below_avg_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    pa = li.groupBy("l_partkey").agg(
        (
            F.lit(0.5) * (F.sum(qty).cast("double") / F.count(F.lit(1)))
        ).alias("half_avg_qty")
    )
    small = li.join(pa, "l_partkey").filter(F.col("l_quantity") < F.col("half_avg_qty"))
    return small.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.count(F.lit(1)).alias("small_lines"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("small_revenue"),
    )


# ---------------------------------------------------------------------------
# OVER-window analytics (lag / moving frame / cumulative) and CUBE
# ---------------------------------------------------------------------------

@register(
    "events_running_stats",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           CAST(SUM(CAST(floor(value * 1e6) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6
             AS mov3_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="OVER-window analytics per user ordered by event time with a"
    " unique tie-break: lag, 3-row moving sum (floor-scaled for cross-engine"
    " determinism), cumulative count -- one shuffle on the user key.",
)
def events_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scaled = F.floor(F.col("value") * F.lit(1e6)).cast("long")
    return ev.select(
        "event_id", "user_id", "ts", "value",
        F.lag("value").over(w).alias("prev_value"),
        (
            F.sum(scaled).over(w.rowsBetween(-2, 0)).cast("double") / F.lit(1e6)
        ).alias("mov3_value"),
        F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_events"),
    )


@register(
    "cube_status_priority_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           2 * grouping(o_orderstatus) + grouping(o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE over (status, priority) with an explicit grouping-bit"
    " id (disambiguates real NULL groups from subtotal rows) -- Spark plans"
    " this as a single Expand + two-phase aggregate.",
)
def cube_status_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.expr("2 * grouping(o_orderstatus) + grouping(o_orderpriority)").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register(
    "event_time_sliding_hourly",
    oracle="""
    SELECT to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) - k.k * 1800) // 3600 * 3600
                        + k.k * 1800)
             AT TIME ZONE 'UTC' AS window_start,
           event_type,
           COUNT(*) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
    GROUP BY 1, 2
    """,
    description="Sliding (hopping) 1h/30min event-time window aggregation:"
    " each event lands in size/slide windows; Spark's window() expands"
    " row-locally before one keyed shuffle. Oracle replicates the window"
    " membership arithmetic with an explicit 2-way expansion.",
)
def event_time_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


@register(
    "approx_distinct_users_daily",
    # Raw HLL estimates are engine-specific, so the hash-compared columns are
    # the exact cardinality plus a tolerance verdict on the sketch: DuckDB
    # asserts TRUE where Spark asserts |approx-exact|/exact <= 10% (rsd=0.02
    # -> a ~5-sigma band; the tighter bound is asserted per-day in
    # tests/test_functions_approx.py).
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS event_count,
           TRUE AS approx_within_10pct
    FROM events
    GROUP BY 1
    """,
    description="HyperLogLog approximate distinct users per day (the sketch"
    " path for 100 TB cardinality work: mergeable partial sketches, no"
    " distinct-expand shuffle), hash-verified against the exact cardinality"
    " via an in-query tolerance band.",
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count_distinct(F.col("user_id"))
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            exact.alias("exact_users"),
            F.count(F.lit(1)).alias("event_count"),
            (F.abs(approx - exact) <= 0.10 * exact).alias("approx_within_10pct"),
        )
    )


@register(
    "events_json_props_stats",
    # The guarded extraction is what makes the oracle honor the declared
    # malformed-payload semantics: bare json_extract HARD-ERRORS in DuckDB on
    # a non-JSON props value where Spark's from_json returns NULL, and Spark's
    # PERMISSIVE parser only yields a k for an integer JSON token -- so the
    # oracle nulls (-> bad_payloads) unless props is valid JSON AND $.k is an
    # integer-typed member, matching from_json('k BIGINT') exactly.
    oracle="""
    WITH parsed AS (
      -- TRY_CAST, not CAST: json_type is 'UBIGINT' for EVERY positive
      -- integer, so a k in [2^63, 2^64) passes the type gate but overflows
      -- BIGINT -- Spark's from_json nulls it (bad_payload) where a bare
      -- CAST would hard-error
      SELECT event_type,
             CASE WHEN json_valid(props)
                       AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MAX(k) AS max_k,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_payloads
    FROM parsed
    GROUP BY event_type
    """,
    description="JSON payload decode against a declared schema (reference S5:"
    " the kinesis_events 'format'='json' source, flink-gen.sh:94-110) --"
    " from_json into a typed struct, then grouped aggregation; malformed"
    " payloads surface as NULLs, not failures.",
)
def events_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_json_stats_frame(load_table(spark, sf_dir, "events"))


def events_json_stats_frame(ev: DataFrame) -> DataFrame:
    """The frame form, planted-tested on every malformed-payload class
    (non-JSON, string-typed k, float k, missing key, NULL props) in
    tests/test_functions.py -- each nulls identically in both engines."""
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("bad_payloads"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
           l.l_extendedprice AS min_price
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'LARGE'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l.l_extendedprice = (
      SELECT MIN(l2.l_extendedprice) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """,
    description="TPC-H q2 shape (correlated scalar MIN subquery): per part,"
    " the supplier(s) offering the minimum price. Spark-first translation:"
    " the correlated subquery becomes a window MIN over the part key -- one"
    " shuffle on l_partkey instead of a self-join re-scan; the part filter"
    " applies BEFORE the window so only filtered parts' lineitems shuffle.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # inner join to the filtered parts first: every lineitem of a surviving
    # part remains, so the window MIN equals the correlated MIN over all of
    # that part's lineitems
    li_p = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("l_partkey")
    cheapest = (
        li_p.withColumn("__min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__min_price"))
    )
    return (
        cheapest.join(F.broadcast(supplier), cheapest.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            F.col("l_extendedprice").alias("min_price"),
        )
    )


@register(
    "q20_part_heavy_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > CAST(2500 AS DECIMAL(12,2))
    )
    """,
    description="TPC-H q20 shape (nested semi-joins): suppliers that shipped"
    " more than a threshold quantity of a filtered part class. Spark-first:"
    " both IN-subqueries become LEFT SEMI joins (no dedup-materialize), the"
    " inner aggregation is a partial/final hash agg on l_suppkey, and the"
    " DECIMAL cast keeps the HAVING sum exact across engines.",
)
def q20_part_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    heavy = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "leftsemi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__qty"))
        .filter(F.col("__qty") > F.lit(2500).cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "leftsemi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H breadth: q4 / q7 / q14 / q19 / q22 shapes
# ---------------------------------------------------------------------------

@register(
    "q4_priority_order_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    description="TPC-H q4 shape (correlated EXISTS with a non-equi"
    " condition): orders in a date range having at least one late-shipping"
    " lineitem, counted per priority. Spark-first: the EXISTS is a LEFT SEMI"
    " join on the order key carrying the extra range predicate -- the date"
    " filter on orders is applied before the join so pushdown prunes the"
    " probe side, and the semi join never duplicates orders no matter how"
    " many lineitems match.",
)
def q4_priority_order_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamp_ntz, not timestamp: o_orderdate reads as TIMESTAMP_NTZ, and an
    # LTZ literal would coerce the comparison through the session time zone --
    # correct only while the session is pinned UTC (q1 spells it the same way)
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_nation_trade_flows",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
    description="TPC-H q7 shape (bilateral trade flows): revenue between"
    " every (customer nation, supplier nation) pair per ship year, cross-"
    " nation only. Spark-first: nation joins broadcast twice under distinct"
    " aliases; the fact-side joins shuffle on their keys once each and"
    " Catalyst reorders them; the <> predicate lands after the broadcasts"
    " where it is a cheap row filter, not a join condition.",
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nations = load_table(spark, sf_dir, "nation")
    cn = F.broadcast(nations.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(nations.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    one = F.lit(1).cast(DEC4)
    rev = _dec("l_extendedprice") * (one - F.col("l_discount").cast(DEC4))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS total_revenue,
           100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP)
    """,
    description="TPC-H q14 shape (conditional share-of-total): monthly promo"
    " revenue share. Spark-first: broadcast hash join against part, one"
    " hash aggregation keyed on the truncated month; both numerator and"
    " denominator are exact DECIMAL sums converted to DOUBLE before the"
    " division so the float ops are identical cross-engine.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast(DEC4)
    rev = _dec("l_extendedprice") * (one - F.col("l_discount").cast(DEC4))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    promo_rev = F.sum(promo).cast("double")
    total_rev = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            promo_rev.alias("promo_revenue"),
            total_rev.alias("total_revenue"),
            (F.lit(100.0) * promo_rev / total_rev).alias("promo_share_pct"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size <= 10 AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#22' AND p.p_size <= 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#33' AND p.p_size <= 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
    description="TPC-H q19 shape (OR-of-AND predicate pushdown): revenue"
    " over three disjunctive brand/size/quantity bands. Spark-first: the"
    " part-only conjuncts (brand OR-chain) are factored by Catalyst into a"
    " pushed filter on the broadcast build side, so only candidate parts"
    " enter the join; the mixed part+lineitem conjuncts evaluate post-join"
    " in whole-stage codegen.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast(DEC4)
    rev = _dec("l_extendedprice") * (one - F.col("l_discount").cast(DEC4))
    band = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 10)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 50)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY n.n_name
    """,
    description="TPC-H q22 shape (scalar subquery + NOT EXISTS): per nation,"
    " customers holding an above-average balance who never placed an urgent"
    " order. Spark-first: the global average is a 1-row aggregate broadcast"
    " via crossJoin (no driver collect); the NOT EXISTS is a LEFT ANTI join"
    " against the pre-filtered urgent orders; the average is an exact"
    " DECIMAL sum divided in DOUBLE so the threshold is bit-identical to"
    " the oracle's.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double")
              / F.count(F.lit(1))).alias("__avg_bal"))
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
