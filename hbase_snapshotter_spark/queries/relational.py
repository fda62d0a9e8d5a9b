"""Relational query surface over warehouse tables (SURVEY §2.3 N6-N11).

Each query exists as a (Spark DataFrame fn, DuckDB oracle SQL) pair.
Conventions that keep the cross-engine value hash stable:

- every computed column is explicitly aliased, identically on both sides;
- double aggregates are rounded (2 dp) on both sides, so accumulation-
  order float fuzz can't flip the hash;
- BIGINT-able aggregates are cast to BIGINT in DuckDB (its SUM(int)
  returns HUGEINT);
- every ORDER BY ... LIMIT has a total tie-break.

Scale notes are on each query: what shuffles, what broadcasts, what
pushes down.

Why these entries deliberately do NOT use ``operators.dedup.spread``
(round-5 A/B, local[32], sf0.1, min-of-3 interleaved, quiet-adjacent):
q1 0.29s plain vs 0.72s spread; asof_latest_order 1.17s vs 2.1s;
schema_history_snapshot 0.91s vs 1.5-1.8s.  The relational/snapshot
queries do trivial per-row work (decode + a few arithmetic ops), so the
round-robin repartition's full-row shuffle costs more than the extra
scan-side parallelism buys — the opposite of the text/similarity
entries, whose per-row regex/shingle CPU dominates and where spread was
measured a 2x win (queries/llm.py).  The r4 bench regressions on these
six queries did not reproduce under controlled A/B; they were co-tenant
noise (bench.py records single-pass AND cross-pass minima so this is
visible in the artifact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.asof import asof_join
from hbase_snapshotter_spark.sources.changelog import read_table


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------- q1: agg
# Scan → partial agg → final agg on 6 groups; filter + 7-column projection
# push to Parquet. Whole-stage codegen end-to-end; shuffle carries ≤ #groups
# × #map-partitions rows.
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------- q3: join + top-k
# customer (filtered, small) broadcasts into orders, the result shuffles
# only for the groupBy on orderkey; LIMIT plans as TakeOrderedAndProject —
# no global sort materialization.
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    # no broadcast hints: the filtered cust⋈orders side grows with data
    # volume, so forcing a broadcast is a scale hazard — the planner
    # broadcasts it while its size estimate fits and shuffle-joins beyond
    return (
        li.join(cust.join(orders, cust.c_custkey == orders.o_custkey)
                .select("o_orderkey", "o_orderdate", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 10
"""


# ------------------------------------------- q5: multi-join star schema
# Dim chain region→nation broadcasts (tiny); supplier broadcasts; the two
# fact joins (orders⋈customer, lineitem⋈orders) are the only shuffles and
# AQE picks broadcast for the filtered small sides at low SF.
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    # hints only on the FIXED-cardinality dims (nation 25 / region 5):
    # customer/supplier scale with data volume, so their join strategy
    # is left to size estimates (broadcast while small, shuffle beyond)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sup, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


ORACLE_Q5 = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# ------------------------------------------------------ semi / anti joins
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join in one tagged union: customers with at least one
    URGENT order (left_semi — probe side streams, no duplication, build
    side is the filtered orders keys) unioned with customers having no
    orders at all (left_anti)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.lit("has_urgent").alias("tag"))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.lit("no_orders").alias("tag"))
    )
    return semi.unionAll(anti)


ORACLE_SEMI_ANTI = """
SELECT c_custkey, c_name, 'has_urgent' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT c_custkey, c_name, 'no_orders' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + agg: order count per customer including zeros."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"),
             F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"))
    )


ORACLE_OUTER = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_count,
       ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_customer_orders_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti + left-outer-aggregate in ONE customer-keyed plan
    (r8 merge of the former standalone ``join_semi_anti`` and
    ``join_outer_order_counts`` recorded slots): every customer row
    carries the outer-join order count/spend AND two flag columns
    produced by genuine LeftSemi / LeftAnti physical joins —
    ``has_urgent`` (≥1 URGENT order, via left_semi against the filtered
    orders keys) and ``no_orders`` (via left_anti).  All three join
    operators survive in this one plan; the flag joins are key-only
    projections, so the extra cost over the outer lane is two
    keys-only hash joins."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    base = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"),
             F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
             .alias("total_spent"))
    )
    semi = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", F.lit(True).alias("has_urgent"))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", F.lit(True).alias("no_orders"))
    )
    return (
        base.join(semi, "c_custkey", "left").join(anti, "c_custkey", "left")
        .select("c_custkey", "c_name", "order_count", "total_spent",
                F.coalesce("has_urgent", F.lit(False)).alias("has_urgent"),
                F.coalesce("no_orders", F.lit(False)).alias("no_orders"))
    )


ORACLE_CUSTOMER_ORDERS = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_count,
       ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent,
       COALESCE(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN TRUE END),
                FALSE) AS has_urgent,
       COUNT(o_orderkey) = 0 AS no_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# ------------------------------------------------- window functions (N8)
# (Top-k-per-group via row_number + filter is covered by
# window_rank_suite, which additionally pins rank/dense_rank/ntile/lead.)
# ----------------------------------------------------------- pivot (N7)
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def pivot_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per market segment × priority, priorities as columns.
    Explicit pivot values → single-pass aggregation, no discovery scan.
    Registered inside ``agg_rollup_cube`` since r8 (unpivoted back to
    long form so the union's schema lines up)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PRIORITIES)
    )


# ------------------------------------------- grouping sets / rollup / cube
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over lineitem, CUBE over orders, explicit GROUPING SETS
    through the SQL front end (r7 merge of the former standalone
    ``agg_grouping_sets`` slot), AND the segment × priority PIVOT
    round-tripped back to long form through ``unpivot`` (r8 merge of
    the former standalone ``pivot_segment_priority`` slot — the pivot
    aggregate including its zero-filled cells survives in this plan,
    every cell value-checked) in one tagged union — each branch plans
    as a single Expand/Pivot + hash aggregate (map-side partials
    before the one shuffle each)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("l_quantity"), 2).alias("sum_val"))
        .select(F.lit("rollup_lineitem").alias("src"),
                F.col("l_returnflag").alias("grp_a"),
                F.col("l_linestatus").alias("grp_b"), "n_rows", "sum_val")
    )
    cube = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_val"))
        .select(F.lit("cube_orders").alias("src"),
                F.col("o_orderstatus").alias("grp_a"),
                F.col("o_orderpriority").alias("grp_b"), "n_rows", "sum_val")
    )
    orders.createOrReplaceTempView("__orders_gs")
    gsets = spark.sql("""
        SELECT 'gsets_orders' AS src, o_orderstatus AS grp_a,
               o_orderpriority AS grp_b,
               COUNT(*) AS n_rows,
               ROUND(SUM(o_totalprice), 2) AS sum_val
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """)
    pivot_long = (
        pivot_segment_priority(spark, sf_dir)
        .unpivot("c_mktsegment", PRIORITIES, "grp_b", "__n")
        .select(F.lit("pivot_segment").alias("src"),
                F.col("c_mktsegment").alias("grp_a"), "grp_b",
                F.col("__n").alias("n_rows"),
                F.lit(None).cast("double").alias("sum_val"))
    )
    return rollup.unionAll(cube).unionAll(gsets).unionAll(pivot_long)


_PRIORITY_VALUES = ", ".join(f"('{p}')" for p in PRIORITIES)

ORACLE_ROLLUP_CUBE = f"""
SELECT 'rollup_lineitem' AS src, l_returnflag AS grp_a, l_linestatus AS grp_b,
       COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_val
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube_orders' AS src, o_orderstatus AS grp_a, o_orderpriority AS grp_b,
       COUNT(*) AS n_rows, ROUND(SUM(o_totalprice), 2) AS sum_val
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets_orders' AS src, o_orderstatus AS grp_a, o_orderpriority AS grp_b,
       COUNT(*) AS n_rows, ROUND(SUM(o_totalprice), 2) AS sum_val
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                    (o_orderstatus, o_orderpriority))
UNION ALL
SELECT 'pivot_segment' AS src, s.c_mktsegment AS grp_a, p.pr AS grp_b,
       COALESCE(g.cnt, 0) AS n_rows, CAST(NULL AS DOUBLE) AS sum_val
FROM (SELECT DISTINCT c_mktsegment FROM orders JOIN customer
      ON o_custkey = c_custkey) s
CROSS JOIN (VALUES {_PRIORITY_VALUES}) p(pr)
LEFT JOIN (SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2) g
  ON g.c_mktsegment = s.c_mktsegment AND g.o_orderpriority = p.pr
"""


# ------------------------------------------------------------ set ops (N10)
# -------------------------------------------- scalar function suite (N11)
def scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math / JSON scalar coverage on events — all
    JVM-side expressions inside one codegen stage.  JSON both ways Spark
    offers it: path extraction (get_json_object) and typed parsing
    (from_json with a schema) — r7 merge of the former standalone
    ``scalar_json_suite`` slot; same table, same single projection."""
    ev = _t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed["k"].alias("k_typed"),
        F.col("props").contains('"k"').alias("has_k"),
        F.length("props").alias("props_len"),
        F.upper("event_type").alias("etype_upper"),
        F.length("event_type").alias("etype_len"),
        F.substring("event_type", 1, 2).alias("etype_pre"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("tag"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hr"),
        F.round(F.abs(F.col("value") - 50.0), 2).alias("dist50"),
        F.round(F.sqrt(F.abs("value")), 4).alias("sqrt_v"),
        F.when(F.col("value") > 50, "hi").otherwise("lo").alias("band"),
    )


ORACLE_SCALAR = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
       contains(props, '"k"') AS has_k,
       CAST(length(props) AS INTEGER) AS props_len,
       UPPER(event_type) AS etype_upper,
       CAST(LENGTH(event_type) AS INTEGER) AS etype_len,
       SUBSTRING(event_type, 1, 2) AS etype_pre,
       event_type || '-' || CAST(user_id AS VARCHAR) AS tag,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(year(ts) AS INTEGER) AS yr,
       CAST(month(ts) AS INTEGER) AS mo,
       CAST(day(ts) AS INTEGER) AS dom,
       CAST(hour(ts) AS INTEGER) AS hr,
       ROUND(ABS(value - 50.0), 2) AS dist50,
       ROUND(SQRT(ABS(value)), 4) AS sqrt_v,
       CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END AS band
FROM events
"""


# ---------------------------------------------------- as-of join (N6)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the user's most recent order at event time —
    the composed as-of join (union-tag + window, see operators.asof)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .withColumnRenamed("o_custkey", "user_id")
    )
    # dedup right to one order per (user, date) for a deterministic match
    # — aggregate form (max-struct): hash agg with map-side partials
    # instead of a window sort, so the only Window left in the plan is
    # the as-of carry-forward itself
    orders1 = (
        orders.groupBy("user_id", "o_orderdate")
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("__x"))
        .select("user_id", "o_orderdate",
                F.col("__x.o_orderkey").alias("o_orderkey"),
                F.col("__x.o_totalprice").alias("o_totalprice"))
    )
    return asof_join(
        ev, orders1, "user_id", left_ts="ts", right_ts="o_orderdate"
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice")


ORACLE_ASOF = """
WITH orders1 AS (
  SELECT * FROM (
    SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
FROM events e
ASOF LEFT JOIN orders1 o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


# ----------------------------------------- equi join + range predicate
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join on partkey with a range predicate on price — the range
    residual evaluates during the join, no second pass."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(part, (F.col("l_partkey") == F.col("p_partkey"))
                & (F.col("l_extendedprice") >= F.col("p_retailprice") * 10)
                & (F.col("l_extendedprice") <= F.col("p_retailprice") * 30))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


ORACLE_RANGE = """
SELECT p_brand,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_extendedprice >= p_retailprice * 10
  AND l_extendedprice <= p_retailprice * 30
GROUP BY p_brand
"""


PAIRS = {
    "q1_pricing_summary": (q1_pricing_summary, ORACLE_Q1),
    "q3_shipping_priority": (q3_shipping_priority, ORACLE_Q3),
    "q5_local_supplier": (q5_local_supplier, ORACLE_Q5),
    "join_customer_orders_suite": (join_customer_orders_suite,
                                   ORACLE_CUSTOMER_ORDERS),
    "agg_rollup_cube": (agg_rollup_cube, ORACLE_ROLLUP_CUBE),
    "scalar_suite": (scalar_suite, ORACLE_SCALAR),
}


# ------------------------------------- skew-salted join + aggregation
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both skew tools on the archetypal hot-key shape: lineitem joined
    to a 3-row dimension on ``l_returnflag`` (3 distinct values — every
    key is hot) via the SALTED JOIN (big side salted, small side
    replicated per salt), then the two-stage SALTED AGGREGATION over the
    6-value group key.  Results are row-identical to the plain
    join+groupBy; the salt is the deterministic content hash of
    lineitem's unique key (``l_orderkey, l_linenumber``) so a shuffle-
    retry re-emits identical salts (see operators.skew._salt_expr)."""
    from hbase_snapshotter_spark.operators.skew import salted_agg, salted_join

    li = _t(spark, sf_dir, "lineitem")
    flag_dim = spark.createDataFrame(
        [("A", "returned"), ("N", "in-flight"), ("R", "refunded")],
        "l_returnflag string, flag_label string")
    unique_key = ["l_orderkey", "l_linenumber"]
    joined = salted_join(li, flag_dim, ["l_returnflag"],
                         salt_buckets=8, salt_cols=unique_key)
    out = salted_agg(
        joined, ["l_returnflag", "flag_label", "l_linestatus"],
        [(None, "count", "n_rows"), ("l_quantity", "sum", "sum_qty0"),
         ("l_discount", "avg", "avg_disc0"), ("l_extendedprice", "max", "max_price")],
        salt_buckets=16, salt_cols=unique_key,
    )
    return out.select(
        "l_returnflag", "flag_label", "l_linestatus", "n_rows",
        F.round("sum_qty0", 2).alias("sum_qty"),
        F.round("avg_disc0", 6).alias("avg_disc"),
        "max_price",
    )


ORACLE_SALTED = """
SELECT l_returnflag, flag_label, l_linestatus,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       MAX(l_extendedprice) AS max_price
FROM lineitem
JOIN (VALUES ('A', 'returned'), ('N', 'in-flight'), ('R', 'refunded'))
     AS d(l_returnflag, flag_label) USING (l_returnflag)
GROUP BY l_returnflag, flag_label, l_linestatus
"""


# ------------------------------------------------------ full outer join
def join_full_outer_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of per-customer spend in two eras — customers
    active in only one era keep NULLs on the other side — unioned with
    the INTERSECT set-op branch (customers ordering both before 1996
    and after 2000; r7 merge of the former ``setop_active_both_eras``
    slot).  One plan carries both the full-outer SMJ and the intersect
    (which plans as a left-semi aggregate) — both shuffle on o_custkey,
    so AQE can reuse the exchange."""
    orders = _t(spark, sf_dir, "orders")
    early = (orders.filter(F.col("o_orderdate") < F.lit("1997-01-01"))
             .groupBy("o_custkey")
             .agg(F.round(F.sum("o_totalprice"), 2).alias("early_spend")))
    late = (orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
            .groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("late_spend")))
    spend = (
        early.withColumnRenamed("o_custkey", "custkey_e")
        .join(late.withColumnRenamed("o_custkey", "custkey_l"),
              F.col("custkey_e") == F.col("custkey_l"), "full_outer")
        .select(
            F.coalesce("custkey_e", "custkey_l").alias("custkey"),
            "early_spend", "late_spend",
            F.lit("era_spend").alias("tag"),
        )
    )
    e96 = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01")).select("o_custkey")
    l00 = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    both = e96.intersect(l00).select(
        F.col("o_custkey").alias("custkey"),
        F.lit(None).cast("double").alias("early_spend"),
        F.lit(None).cast("double").alias("late_spend"),
        F.lit("both_eras").alias("tag"),
    )
    return spend.unionAll(both)


ORACLE_FULL_OUTER = """
WITH early AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS early_spend
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey),
late AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS late_spend
  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY o_custkey)
SELECT COALESCE(early.o_custkey, late.o_custkey) AS custkey,
       early_spend, late_spend, 'era_spend' AS tag
FROM early FULL OUTER JOIN late ON early.o_custkey = late.o_custkey
UNION ALL
SELECT o_custkey AS custkey, CAST(NULL AS DOUBLE) AS early_spend,
       CAST(NULL AS DOUBLE) AS late_spend, 'both_eras' AS tag
FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
)
"""


# ------------------------------------------------------------ cross join
# -------------------------------------------- array function suite (N11)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over array<float> embeddings — size, indexing,
    slicing with a fold, min/max — all JVM-side."""
    emb = _t(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 8)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("x0"),
        F.round(F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double")), 6)
        .alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("amax"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("amin"),
    )


ORACLE_ARRAY = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS x0,
       ROUND(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 6) AS head_sum,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS amax,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS amin
FROM embeddings
"""


# --------------------------------------------- JSON function suite (N11)
PAIRS.update({
    "skew_salted_agg": (skew_salted_agg, ORACLE_SALTED),
    "scalar_array_suite": (scalar_array_suite, ORACLE_ARRAY),
})


#: Lane specs for the r10 temporal_join_suite fold (VERDICT r9
#: task 2): as-of join, band range join, full-outer era comparison.
_ASOF_COLS = [
    ("event_id", "BIGINT"), ("user_id", "BIGINT"),
    ("o_orderkey", "BIGINT"), ("o_totalprice", "DOUBLE"),
]
_RANGE_JOIN_COLS = [
    ("p_brand", "VARCHAR"), ("n_lines", "BIGINT"),
    ("sum_price", "DOUBLE"),
]
_FULL_OUTER_COLS = [
    ("custkey", "BIGINT"), ("early_spend", "DOUBLE"),
    ("late_spend", "DOUBLE"), ("tag", "VARCHAR"),
]


def temporal_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/range join suite — the as-of join, the price-band
    range join, and the full-outer era comparison as lanes of ONE
    recorded key (r10 merge of the former standalone
    ``asof_latest_order``, ``range_join_price_band`` and
    ``join_full_outer_eras`` rows) — the non-equi join family.
    Row-disjoint lanes with typed NULL padding; each keeps its
    standalone oracle inside the UNION ALL."""
    from hbase_snapshotter_spark.queries.suites import union_lanes

    return union_lanes([
        ("asof", asof_latest_order(spark, sf_dir), _ASOF_COLS),
        ("range_band", range_join_price_band(spark, sf_dir),
         _RANGE_JOIN_COLS),
        ("full_outer_eras", join_full_outer_eras(spark, sf_dir),
         _FULL_OUTER_COLS),
    ])


def _oracle_temporal_join_suite() -> str:
    from hbase_snapshotter_spark.queries.suites import union_lanes_sql

    return union_lanes_sql([
        ("asof", ORACLE_ASOF, _ASOF_COLS),
        ("range_band", ORACLE_RANGE, _RANGE_JOIN_COLS),
        ("full_outer_eras", ORACLE_FULL_OUTER, _FULL_OUTER_COLS),
    ])


PAIRS.update({
    "temporal_join_suite": (temporal_join_suite,
                            _oracle_temporal_join_suite()),
})


# --------------------------------------------- grouping sets (SQL surface)
# ----------------------------- approximate sketches (oracle-checkable)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + percentile aggregates, exact next to their sketch
    twins, over two grouping keys in one tagged union (r7 merge of the
    former ``agg_distinct`` and ``agg_percentiles`` slots — every
    operator survives in this one plan): COUNT(DISTINCT) (two-stage,
    partial distinct map-side), exact interpolated percentiles, min/max,
    and the mergeable bounded-memory sketches (HyperLogLog++
    approx_count_distinct, KLL-style approx_percentile — the 100 TB
    shape for cardinality/quantiles).

    The raw sketch estimates are engine-specific (DuckDB's HLL differs
    by construction), so the query emits the EXACT values plus
    ``*_within_tolerance`` booleans computed in-query from the sketch
    (|approx − exact| ≤ 10% / 5%, the same bounds the pytest asserts);
    the oracle replays the exact values and expects ``true`` — making
    the sketch's error contract itself hash-checkable."""
    orders = _t(spark, sf_dir, "orders")

    def branch(key: str, kind: str) -> DataFrame:
        approx_cnt = F.approx_count_distinct("o_custkey", 0.02)
        exact_cnt = F.countDistinct("o_custkey")
        approx_med = F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000))
        exact_med = F.percentile("o_totalprice", F.lit(0.5))
        return orders.groupBy(key).agg(
            exact_cnt.alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(exact_med, 2).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            (F.abs(approx_cnt - exact_cnt) <= 0.10 * exact_cnt)
            .alias("count_within_tolerance"),
            (F.abs(approx_med - exact_med) <= 0.05 * exact_med)
            .alias("median_within_tolerance"),
        ).select(
            F.lit(kind).alias("grp_kind"), F.col(key).alias("grp_key"),
            "n_customers", "n_orders", "median_price", "p90_price",
            "min_price", "max_price",
            "count_within_tolerance", "median_within_tolerance",
        )

    return branch("o_orderstatus", "by_status").unionAll(
        branch("o_orderpriority", "by_priority"))


_APPROX_BRANCH_SQL = """
SELECT '{kind}' AS grp_kind, {key} AS grp_key,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       TRUE AS count_within_tolerance,
       TRUE AS median_within_tolerance
FROM orders GROUP BY {key}
"""

ORACLE_APPROX_DISTINCT = (
    _APPROX_BRANCH_SQL.format(kind="by_status", key="o_orderstatus")
    + "UNION ALL"
    + _APPROX_BRANCH_SQL.format(kind="by_priority", key="o_orderpriority")
)


#: Lane specs for the r10 sketch_cardinality_suite fold (VERDICT r9
#: task 2): approx-distinct/quantile envelopes, HLL maintenance, and
#: sketch-algebra set cardinalities.
_APPROX_DISTINCT_COLS = [
    ("grp_kind", "VARCHAR"), ("grp_key", "VARCHAR"),
    ("n_customers", "BIGINT"), ("n_orders", "BIGINT"),
    ("median_price", "DOUBLE"), ("p90_price", "DOUBLE"),
    ("min_price", "DOUBLE"), ("max_price", "DOUBLE"),
    ("count_within_tolerance", "BOOLEAN"),
    ("median_within_tolerance", "BOOLEAN"),
]
_SKETCH_MAINT_COLS = [
    ("event_type", "VARCHAR"), ("distinct_users", "BIGINT"),
    ("est_within_tolerance", "BOOLEAN"),
    ("merged_within_tolerance", "BOOLEAN"),
    ("advance_within_tolerance", "BOOLEAN"),
]
_SKETCH_SETS_COLS = [
    ("event_type", "VARCHAR"), ("n_a", "BIGINT"), ("n_b", "BIGINT"),
    ("n_union", "BIGINT"), ("n_intersection", "BIGINT"),
    ("n_a_only", "BIGINT"), ("n_b_only", "BIGINT"),
]


def sketch_cardinality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-cardinality suite — the approx distinct/quantile
    envelope audit, incremental HLL state maintenance, and
    inclusion-exclusion set algebra as lanes of ONE recorded key (r10
    merge of the former standalone ``agg_approx_distinct``,
    ``sketch_distinct_maintenance`` and ``sketch_set_cardinalities``
    rows).  Row-disjoint lanes with typed NULL padding; each keeps its
    standalone oracle inside the UNION ALL."""
    from hbase_snapshotter_spark.queries.snapshot_q import (
        q_sketch_distinct_maintenance,
        q_sketch_set_cardinalities,
    )
    from hbase_snapshotter_spark.queries.suites import union_lanes

    return union_lanes([
        ("approx_distinct", agg_approx_distinct(spark, sf_dir),
         _APPROX_DISTINCT_COLS),
        ("hll_maintenance",
         q_sketch_distinct_maintenance(spark, sf_dir),
         _SKETCH_MAINT_COLS),
        ("set_cardinalities", q_sketch_set_cardinalities(spark, sf_dir),
         _SKETCH_SETS_COLS),
    ])


def _oracle_sketch_cardinality_suite() -> str:
    from hbase_snapshotter_spark.queries.snapshot_q import (
        oracle_sketch_distinct_maintenance,
        oracle_sketch_set_cardinalities,
    )
    from hbase_snapshotter_spark.queries.suites import union_lanes_sql

    return union_lanes_sql([
        ("approx_distinct", ORACLE_APPROX_DISTINCT,
         _APPROX_DISTINCT_COLS),
        ("hll_maintenance", oracle_sketch_distinct_maintenance(),
         _SKETCH_MAINT_COLS),
        ("set_cardinalities", oracle_sketch_set_cardinalities(),
         _SKETCH_SETS_COLS),
    ])


PAIRS.update({
    "sketch_cardinality_suite": (sketch_cardinality_suite,
                                 _oracle_sketch_cardinality_suite()),
})


# ------------------------------------- ranking-function suite (N8 breadth)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ranking/analytic/frame window shapes in one pass: row_number,
    rank, dense_rank, ntile, lead over the price ordering PLUS the
    running-total frame (UNBOUNDED PRECEDING..CURRENT ROW sum) and lag
    over the date ordering (r7 merge of the former standalone
    ``window_running_total`` slot).  Both specs share the o_custkey
    partitioning, so the plan pays ONE exchange and two in-partition
    sorts — the shuffle is the scale cost and it is not duplicated."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.round(F.sum("o_totalprice").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2
        ).alias("running_spend"),
        F.lag("o_totalprice", 1).over(wd).alias("prev_price"),
    ).filter(F.col("rn") <= 5)


ORACLE_RANK_SUITE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rn AS INTEGER) AS rn, CAST(rk AS INTEGER) AS rk,
       CAST(drk AS INTEGER) AS drk, CAST(quartile AS INTEGER) AS quartile,
       next_price, running_spend, prev_price
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER w AS rk,
         DENSE_RANK() OVER w AS drk,
         NTILE(4) OVER w AS quartile,
         LEAD(o_totalprice, 1) OVER w AS next_price,
         ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend,
         LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_price
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE rn <= 5
"""


PAIRS.update({
    "window_rank_suite": (window_rank_suite, ORACLE_RANK_SUITE),
})


# -------------------------------------------- percentile aggregates (N7)
# ------------------------------------------- string function suite (N11)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_type", "a").alias("a_pos"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.concat(F.upper(F.substring("p_type", 1, 1)),
                 F.lower(F.substring("p_type", 2, 1000))).alias("type_title"),
    )


ORACLE_STRING = """
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       reverse(p_brand) AS brand_rev,
       CAST(strpos(p_type, 'a') AS INTEGER) AS a_pos,
       repeat('*', p_size % 5) AS stars,
       replace(p_brand, '#', '-') AS brand_dash,
       upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS type_title
FROM part
"""


# ---------------------------------------------- map function suite (N11)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: create_map, map_concat, element_at, size,
    map_keys/map_values, map_filter (higher-order), map_from_entries —
    canonicalized through ``to_json`` so the DuckDB oracle can replay the
    values exactly (raw MapType cells don't hash cleanly cross-engine).

    The base relation is the explicit nation × region CROSS JOIN (r7
    merge of the former standalone ``join_cross_nation_region`` slot) —
    the deliberate Cartesian survives in this one plan (tiny × tiny;
    whitelisted in tools/plan_audit.py), with ``same_region`` marking
    the rows the old equi-join would have kept."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    j = nat.crossJoin(reg)
    m1 = F.create_map(F.lit("nation"), F.col("n_name"),
                      F.lit("nkey"), F.col("n_nationkey").cast("string"))
    m2 = F.create_map(F.lit("region"), F.col("r_name"))
    merged = F.map_concat(m1, m2)
    entries = F.map_from_entries(F.array(
        F.struct(F.lit("r").alias("key"), F.col("r_name").alias("value"))))
    return j.select(
        "n_nationkey",
        "r_regionkey",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("same_region"),
        F.to_json(m1).alias("m1_json"),
        F.to_json(merged).alias("merged_json"),
        F.element_at(merged, F.lit("region")).alias("region_name"),
        F.size(merged).alias("n_entries"),
        F.array_join(F.map_keys(merged), ",").alias("keys_csv"),
        F.array_join(F.map_values(m1), ",").alias("vals_csv"),
        F.to_json(F.map_filter(merged, lambda k, _: k != F.lit("nkey")))
        .alias("filtered_json"),
        F.to_json(entries).alias("entries_json"),
    )


ORACLE_MAP = """
SELECT n_nationkey,
  r_regionkey,
  n_regionkey = r_regionkey AS same_region,
  CAST(json_object('nation', n_name, 'nkey', CAST(n_nationkey AS VARCHAR))
       AS VARCHAR) AS m1_json,
  CAST(json_object('nation', n_name, 'nkey', CAST(n_nationkey AS VARCHAR),
                   'region', r_name) AS VARCHAR) AS merged_json,
  r_name AS region_name,
  CAST(3 AS INTEGER) AS n_entries,
  'nation,nkey,region' AS keys_csv,
  n_name || ',' || CAST(n_nationkey AS VARCHAR) AS vals_csv,
  CAST(json_object('nation', n_name, 'region', r_name) AS VARCHAR) AS filtered_json,
  CAST(json_object('r', r_name) AS VARCHAR) AS entries_json
FROM nation CROSS JOIN region
"""


PAIRS.update({
    "scalar_string_suite": (scalar_string_suite, ORACLE_STRING),
    "scalar_map_suite": (scalar_map_suite, ORACLE_MAP),
})


# ------------------------- N33: one-scan column profiler (data audit)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality audit of six lineitem columns in ONE
    scan: completeness, cardinality (exact + HLL with the error
    contract folded into the hash), range, and central tendency.  All
    metrics are expressions of a single ``agg`` (map-side partials, a
    one-row reduce) pivoted to the long audit table by ``F.inline``.

    The exact multi-column distinct is this query's correctness PROBE
    (the HLL estimate is checked against it in-hash), and like the ANN
    recall probes it is the dominant cost: six exact distincts plan an
    Expand that duplicates the scan six-fold.  Probe off (bench mode)
    runs the 100 TB deployment shape — ``exact_distinct=False`` keeps
    only the mergeable sketch, same one-scan plan minus the Expand —
    so BENCH times what production runs while CORRECTNESS always
    hash-checks the exact path (oracle_check forces the probe on)."""
    from hbase_snapshotter_spark.operators.profile import profile_columns
    from hbase_snapshotter_spark.queries.gating import audit_enabled

    from hbase_snapshotter_spark.operators.dedup import spread

    # r13: the one-scan agg's map side (6 HLL sketch builders per row)
    # is narrow CPU work — on the single-split fixture parquet it ran
    # on one core; spread() is a no-op on any well-split input
    li = spread(_t(spark, sf_dir, "lineitem")).withColumn(
        "l_shipdate_s", F.col("l_shipdate").cast("string"))
    return profile_columns(
        li,
        numeric_cols=["l_quantity", "l_extendedprice", "l_discount"],
        string_cols=["l_returnflag", "l_linestatus", "l_shipdate_s"],
        exact_distinct=audit_enabled(sf_dir),
    )


def _oracle_profile() -> str:
    num = {"l_quantity", "l_extendedprice", "l_discount"}
    parts = []
    for c in ["l_quantity", "l_extendedprice", "l_discount",
              "l_returnflag", "l_linestatus", "l_shipdate_s"]:
        src = ("CAST(l_shipdate AS VARCHAR)" if c == "l_shipdate_s" else c)
        if c in num:
            stats = f"""CAST({src} AS DOUBLE) AS v"""
            sel = """MIN(v) AS min_num, MAX(v) AS max_num,
                     ROUND(AVG(v), 4) AS mean_num,
                     CAST(NULL AS VARCHAR) AS min_str,
                     CAST(NULL AS VARCHAR) AS max_str,
                     CAST(NULL AS DOUBLE) AS avg_len"""
        else:
            stats = f"""{src} AS v"""
            sel = """CAST(NULL AS DOUBLE) AS min_num,
                     CAST(NULL AS DOUBLE) AS max_num,
                     CAST(NULL AS DOUBLE) AS mean_num,
                     MIN(v) AS min_str, MAX(v) AS max_str,
                     ROUND(AVG(length(v)), 4) AS avg_len"""
        parts.append(f"""
SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       TRUE AS approx_distinct_ok, {sel}
FROM (SELECT {stats} FROM lineitem)""")
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


PAIRS.update({
    "profile_lineitem": (profile_lineitem, _oracle_profile()),
})


# -------- N53: Z-order (Morton-curve) layout audit -----------------------
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit over lineitem on (l_orderkey,
    l_partkey) — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` pattern: one
    Morton clustering key whose file-level min/max stats prune scans on
    EITHER dimension.  Grid bounds come from ONE one-row aggregate
    (broadcast scalar attach); the grid/interleave/bucket chain is pure
    BIGINT column arithmetic in whole-stage codegen, and the audit is a
    single hash aggregation over the 64 buckets.

    Each bucket row reports its row count and per-dimension min/max
    span — square-ish Morton tiles, so BOTH spans are ~1/8 of the
    domain — plus two pruning flags: would a scan for one fixed
    orderkey band / partkey band (each 1/16 of its domain, placed at
    2/5 of the range) have to read this bucket?  Under a single-column
    layout the off-column predicate hits every bucket; under Z-order
    each hits ~sqrt(64) = 8 of 64 — the n^(1-1/d) guarantee, made
    visible (and driver-hashed) per bucket."""
    from hbase_snapshotter_spark.operators.layout import (
        grid_coord,
        zorder_bucket,
        zorder_value,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bounds = li.agg(
        F.min("l_orderkey").alias("omin"), F.max("l_orderkey").alias("omax"),
        F.min("l_partkey").alias("pmin"), F.max("l_partkey").alias("pmax"))
    g = li.crossJoin(F.broadcast(bounds))
    z = zorder_value(
        grid_coord(F.col("l_orderkey"), F.col("omin"), F.col("omax")),
        grid_coord(F.col("l_partkey"), F.col("pmin"), F.col("pmax")))
    per = (g.select("l_orderkey", "l_partkey", "omin", "omax", "pmin", "pmax",
                    zorder_bucket(z, n_buckets=64).alias("zbucket"))
           .groupBy("zbucket")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.min("l_orderkey").alias("o_lo"),
                F.max("l_orderkey").alias("o_hi"),
                F.min("l_partkey").alias("p_lo"),
                F.max("l_partkey").alias("p_hi"),
                F.first("omin").alias("omin"), F.first("omax").alias("omax"),
                F.first("pmin").alias("pmin"), F.first("pmax").alias("pmax")))
    # fixed test bands: 1/16 of each domain starting at 2/5 of the range
    o_band_lo = (F.col("omin")
                 + F.floor((F.col("omax") - F.col("omin")) * 2 / 5))
    o_band_hi = o_band_lo + F.floor((F.col("omax") - F.col("omin")) / 16)
    p_band_lo = (F.col("pmin")
                 + F.floor((F.col("pmax") - F.col("pmin")) * 2 / 5))
    p_band_hi = p_band_lo + F.floor((F.col("pmax") - F.col("pmin")) / 16)
    return (per.select(
        "zbucket", "n_rows", "o_lo", "o_hi", "p_lo", "p_hi",
        ((F.col("o_lo") <= o_band_hi) & (F.col("o_hi") >= o_band_lo))
        .alias("hits_order_band"),
        ((F.col("p_lo") <= p_band_hi) & (F.col("p_hi") >= p_band_lo))
        .alias("hits_part_band"))
        )


def _oracle_zorder() -> str:
    # replay grid quantization, bit interleave, and bucket fold in SQL:
    # the Morton sum unrolls to the same 16 shift/mask terms
    terms = " + ".join(
        f"(((b1 >> {i}) & 1) * {1 << (2 * i + 1)}) + "
        f"(((b2 >> {i}) & 1) * {1 << (2 * i)})"
        for i in range(8))
    return f"""
WITH b AS (SELECT MIN(l_orderkey) AS omin, MAX(l_orderkey) AS omax,
                  MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax
           FROM lineitem),
g AS (SELECT l_orderkey, l_partkey, omin, omax, pmin, pmax,
             CAST(FLOOR(((l_orderkey - omin) * 256.0) / (omax - omin + 1))
                  AS BIGINT) AS b1,
             CAST(FLOOR(((l_partkey - pmin) * 256.0) / (pmax - pmin + 1))
                  AS BIGINT) AS b2
      FROM lineitem, b),
z AS (SELECT *, ({terms}) >> 10 AS zbucket FROM g),
per AS (SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_orderkey) AS o_lo, MAX(l_orderkey) AS o_hi,
               MIN(l_partkey) AS p_lo, MAX(l_partkey) AS p_hi,
               ANY_VALUE(omin) AS omin, ANY_VALUE(omax) AS omax,
               ANY_VALUE(pmin) AS pmin, ANY_VALUE(pmax) AS pmax
        FROM z GROUP BY zbucket)
SELECT zbucket, n_rows, o_lo, o_hi, p_lo, p_hi,
       (o_lo <= omin + ((omax - omin) * 2 // 5)
                     + ((omax - omin) // 16)
        AND o_hi >= omin + ((omax - omin) * 2 // 5))
         AS hits_order_band,
       (p_lo <= pmin + ((pmax - pmin) * 2 // 5)
                     + ((pmax - pmin) // 16)
        AND p_hi >= pmin + ((pmax - pmin) * 2 // 5))
         AS hits_part_band
FROM per ORDER BY zbucket
"""


# ---------------------------------------------- N69: constraint audit
def constraint_audit_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit (N69) over the warehouse core:
    completeness / uniqueness / positivity / accepted-values checks
    (each a conditional sum in ONE aggregate per table) plus both
    referential edges (orders→customer, lineitem→orders; one key-only
    left join each).  The Deequ-style CHECK step next to the N33
    profiler — violations are counted, not sampled, so `passed` is a
    hard gate the driver hashes."""
    from hbase_snapshotter_spark.operators.profile import (
        constraint_audit,
        referential_orphans,
    )

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        constraint_audit(
            cust, "customer",
            complete=["c_custkey", "c_name"],
            unique=["c_custkey"],
            positive=["c_acctbal"]),
        constraint_audit(
            orders, "orders",
            complete=["o_custkey"],
            unique=["o_orderkey"],
            positive=["o_totalprice"],
            accepted={"o_orderstatus": ["O", "F", "P"]}),
        referential_orphans(orders, "orders", "o_custkey",
                            cust, "c_custkey"),
        referential_orphans(li, "lineitem", "l_orderkey",
                            orders, "o_orderkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _oracle_constraint_audit() -> str:
    return """
WITH checks AS (
  SELECT 'customer' AS table_name, 'complete' AS check_type,
         'c_custkey' AS col_name, COUNT(*) AS n_rows,
         SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS n_violations
  FROM customer
  UNION ALL
  SELECT 'customer', 'complete', 'c_name', COUNT(*),
         SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
  FROM customer
  UNION ALL
  SELECT 'customer', 'positive', 'c_acctbal', COUNT(*),
         SUM(CASE WHEN NOT (c_acctbal > 0) THEN 1 ELSE 0 END)
  FROM customer
  UNION ALL
  SELECT 'customer', 'unique', 'c_custkey', COUNT(*),
         COUNT(*) - COUNT(DISTINCT c_custkey)
  FROM customer
  UNION ALL
  SELECT 'orders', 'complete', 'o_custkey', COUNT(*),
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'orders', 'positive', 'o_totalprice', COUNT(*),
         SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'orders', 'accepted_values', 'o_orderstatus', COUNT(*),
         SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    OR o_orderstatus IS NULL THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'orders', 'unique', 'o_orderkey', COUNT(*),
         COUNT(*) - COUNT(DISTINCT o_orderkey)
  FROM orders
  UNION ALL
  SELECT 'orders', 'referential', 'o_custkey', COUNT(*),
         SUM(CASE WHEN o_custkey IS NOT NULL AND c.c_custkey IS NULL
                  THEN 1 ELSE 0 END)
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'lineitem', 'referential', 'l_orderkey', COUNT(*),
         SUM(CASE WHEN l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
                  THEN 1 ELSE 0 END)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey)
SELECT table_name, check_type, col_name,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks
ORDER BY table_name, check_type, col_name
"""


PAIRS.update({
    "constraint_audit_suite": (constraint_audit_suite,
                               _oracle_constraint_audit()),
})

# --------------------------------------- N101: subquery decorrelation suite
# The three classic TPC-H subquery shapes (q17 / q18 / q22) in one tagged
# union.  The reference engine (HBaseSnapshotter.scala) exposes none of
# these; SURVEY §2's relational surface gains the correlated-scalar-
# subquery, IN-over-HAVING, and global-scalar-subquery + NOT EXISTS forms.
#
# Spark side: each lane is written as the DECORRELATED plan — join against
# a pre-aggregated side — which is exactly what Catalyst rewrites a
# correlated subquery into; the DuckDB oracle keeps the subquery syntax,
# so the gate checks Spark's decorrelation algebra against a real
# subquery-unnesting engine.
#
# Boundary discipline: all three predicates compare EXACT INTEGERS
# (quantities are integral, balances are integral cents in the fixture),
# so `qty < 0.2 * avg(qty)` becomes `5 * qty * cnt < sum_qty` and
# `bal > avg(positive bal)` becomes `cents * n > total_cents` — no float
# rounding boundary for the two engines to disagree on.
#
# Scale: q17 pre-filters BOTH sides with a broadcast semi-join on the
# brand's part keys before the per-part aggregate, so the partkey shuffle
# carries only the brand's lineitems (a bounded fraction of the corpus);
# the agg side of each back-join is HAVING-filtered and small, left to
# AQE to broadcast.  q22's global aggregate is the sanctioned one-row
# broadcast attach.
def subquery_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    # q17 shape: lineitems with quantity below 20% of the per-part mean,
    # parts restricted to one brand; correlated scalar subquery.
    bkeys = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    bli = li.join(F.broadcast(bkeys),
                  li.l_partkey == bkeys.p_partkey, "left_semi")
    per_part = bli.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"))
    small = (
        bli.join(per_part, "l_partkey")
        .filter(5 * F.col("l_quantity").cast("bigint") * F.col("cnt")
                < F.col("sum_qty"))
    )
    q17 = small.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(F.sum("l_extendedprice"), 2).alias("amount"),
    ).select(F.lit("q17_small_qty").alias("tag"),
             F.col("l_partkey").alias("entity_key"),
             F.col("n_small").cast("bigint").alias("qty_metric"),
             "amount")

    # q18 shape: orders whose total lineitem quantity exceeds 200 —
    # IN over a HAVING-filtered group; the filtered agg joins back.
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
           .filter(F.col("total_qty") > 200))
    q18 = (orders.join(big, orders.o_orderkey == big.l_orderkey)
           .select(F.lit("q18_big_orders").alias("tag"),
                   F.col("o_orderkey").alias("entity_key"),
                   F.col("total_qty").alias("qty_metric"),
                   F.round(F.col("o_totalprice"), 2).alias("amount")))

    # q22 shape: customers strictly above the mean POSITIVE balance with
    # no urgent order — global scalar subquery + NOT EXISTS.
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    glob = (cust.filter(F.col("c_acctbal") > 0)
            .agg(F.sum(cents).alias("total_cents"),
                 F.count(F.lit(1)).alias("n_pos")))
    urgent_keys = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                   .select("o_custkey"))
    q22 = (
        cust.withColumn("bal_cents", cents)
        .join(F.broadcast(glob))  # one-row attach
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("total_cents"))
        .join(urgent_keys, cust.c_custkey == urgent_keys.o_custkey,
              "left_anti")
        .select(F.lit("q22_idle_rich").alias("tag"),
                F.col("c_custkey").alias("entity_key"),
                F.col("bal_cents").alias("qty_metric"),
                F.round(F.col("c_acctbal"), 2).alias("amount"))
    )
    return q17.unionAll(q18).unionAll(q22)


ORACLE_SUBQUERY_SUITE = """
SELECT 'q17_small_qty' AS tag, l_partkey AS entity_key,
       CAST(COUNT(*) AS BIGINT) AS qty_metric,
       ROUND(SUM(l_extendedprice), 2) AS amount
FROM lineitem l
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
  AND 5 * CAST(l_quantity AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
      < (SELECT CAST(SUM(l_quantity) AS BIGINT) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
GROUP BY l_partkey
UNION ALL
SELECT 'q18_big_orders', o_orderkey,
       (SELECT CAST(SUM(l_quantity) AS BIGINT) FROM lineitem
        WHERE l_orderkey = o_orderkey),
       ROUND(o_totalprice, 2)
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(l_quantity) > 200)
UNION ALL
SELECT 'q22_idle_rich', c_custkey,
       CAST(ROUND(c_acctbal * 100) AS BIGINT),
       ROUND(c_acctbal, 2)
FROM customer c
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
        * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
         FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


PAIRS.update({
    "subquery_suite": (subquery_suite, ORACLE_SUBQUERY_SUITE),
})

#: Advisor thresholds (N103 strategy verdict).  Row-count stand-in for
#: the byte-based autoBroadcastJoinThreshold; permille of a side's rows
#: its hottest key may own before the salted plan wins.
ADVISOR_BROADCAST_ROWS = 10000
ADVISOR_SKEW_PERMILLE = 50


def advisor_strategy_col():
    """The N103 advisor rule over the per-pair statistics columns
    (n_left/n_right/max_rows_left/max_rows_right): broadcast the
    smaller side when it fits, salt when either side's hottest key
    owns more than ADVISOR_SKEW_PERMILLE of its rows, else
    sort-merge.  Kept as a named expression so the rule is pinned by
    a pytest independent of the fixture's (skew-free) data."""
    skew = (
        (F.col("max_rows_left") * 1000
         > ADVISOR_SKEW_PERMILLE * F.col("n_left"))
        | (F.col("max_rows_right") * 1000
           > ADVISOR_SKEW_PERMILLE * F.col("n_right")))
    return (
        F.when(F.least("n_left", "n_right") <= ADVISOR_BROADCAST_ROWS,
               F.when(F.col("n_right") <= F.col("n_left"),
                      F.lit("broadcast_right"))
               .otherwise(F.lit("broadcast_left")))
        .when(skew, F.lit("salted_shuffle"))
        .otherwise(F.lit("sort_merge")))



def _join_size_estimate_sketch_only(orders, cust, li, ev) -> DataFrame:
    """The PRODUCTION shape of :func:`join_size_estimate` (VERDICT r9
    task 4): per pair — plain non-null counts (one map-side-combined
    scan each, no per-key shuffle), the CMS inner-product size
    estimate, a CMS-derived max-multiplicity UPPER BOUND
    (``min over depths of that depth's max cell`` — for every key k,
    count(k) ≤ cms[d][h_d(k)] ≤ max_w cms[d][w] at every depth), and
    the advisor strategy applied to those statistics.  The exact join
    aggregation and the per-key group-bys exist ONLY at fixture sfs
    (the oracle-audited shape); here the whole plan is two scans plus
    D×W-row sketch algebra."""
    from hbase_snapshotter_spark.operators.sketches import (
        CMS_JOIN_WIDTH,
        cms_inner_product,
        cms_state,
    )

    # r13, second attempt (the first — ONE PERSISTED cms_state per side
    # — benched 1.7x slower: the persist serialized subtrees the
    # unfused plan ran concurrently).  This shape shares one UNPERSISTED
    # sketch subtree per side across all three consumers (inner
    # product, max-multiplicity bound, n = per-depth bucket sum, which
    # equals the non-null row count EXACTLY since every row lands in
    # exactly one bucket per depth): the identical subtree appears
    # three times in ONE plan, so AQE exchange reuse materializes the
    # sketch aggregation once per side at runtime with no persist
    # barrier — raw-table scans per lane drop 6 -> 2.  Same-window A/B
    # (2 rounds, min-of-reps): wall 4.17->3.96 and 4.08->3.25 s, CPU
    # 28.4->24.7 and 24.1->16.2 s; n/est values pinned equal to the
    # audited lane by test_join_size_estimate_exact_lane_gated.
    def side_sketch(df: DataFrame, key: str) -> DataFrame:
        nn = df.filter(F.col(key).isNotNull())
        return cms_state(nn.select(F.col(key).cast("string").alias("__k")),
                         "__k", group_cols=[], width=CMS_JOIN_WIDTH)

    def side_stats(sk: DataFrame, prefix: str) -> DataFrame:
        per_depth = sk.groupBy("depth").agg(
            F.max("cnt").alias("__m"), F.sum("cnt").alias("__s"))
        return per_depth.agg(
            # coalesce: an EMPTY side must report n=0 (the old count()
            # semantics), not NULL; est_max stays NULL on empty (as the
            # old min-over-empty did)
            F.coalesce(F.min("__s"), F.lit(0)).cast("long")
            .alias(f"n_{prefix}"),
            F.min("__m").cast("long").alias(f"est_max_rows_{prefix}"))

    def lane(tag: str, a: DataFrame, ka: str, b: DataFrame,
             kb: str) -> DataFrame:
        sa, sb = side_sketch(a, ka), side_sketch(b, kb)
        est = cms_inner_product(sa, sb)
        stats = side_stats(sa, "left").crossJoin(side_stats(sb, "right"))
        skew = (
            (F.col("est_max_rows_left") * 1000
             > ADVISOR_SKEW_PERMILLE * F.col("n_left"))
            | (F.col("est_max_rows_right") * 1000
               > ADVISOR_SKEW_PERMILLE * F.col("n_right")))
        strategy = (
            F.when(F.least("n_left", "n_right") <= ADVISOR_BROADCAST_ROWS,
                   F.when(F.col("n_right") <= F.col("n_left"),
                          F.lit("broadcast_right"))
                   .otherwise(F.lit("broadcast_left")))
            .when(skew, F.lit("salted_shuffle"))
            .otherwise(F.lit("sort_merge")))
        nul_l = F.lit(None).cast("long")
        return stats.crossJoin(est).select(
            F.lit(tag).alias("pair"), "n_left", "n_right",
            nul_l.alias("max_rows_left"), nul_l.alias("max_rows_right"),
            "est_max_rows_left", "est_max_rows_right",
            nul_l.alias("exact_rows"), "est_rows",
            F.lit(None).cast("boolean").alias("never_underestimates"),
            F.lit(None).cast("boolean").alias("within_bound"),
            strategy.alias("strategy"))

    mid = F.lit("1997-07-01")
    return (
        lane("orders_customer_custkey", orders, "o_custkey",
             cust, "c_custkey")
        .unionAll(lane("lineitem_halves_partkey",
                       li.filter(F.col("l_shipdate") < mid), "l_partkey",
                       li.filter(F.col("l_shipdate") >= mid), "l_partkey"))
        .unionAll(lane("events_touch_purchase_user",
                       ev.filter(F.col("event_type").isin("view", "click")),
                       "user_id",
                       ev.filter(F.col("event_type") == "purchase"),
                       "user_id")))


# ------------------------------- N103: sketch-based join-size estimation
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from CMS sketches (N103) — the
    cost-based-optimizer lane: three join pairs (dim⋈fact, a fact-fact
    self join on partkey across two date halves, and a behavioral
    touch⋈conversion join on user) estimated from KB-sized sketches
    via the CMS inner product, audited against the exact join size.
    ``never_underestimates`` is the theorem; ``within_bound`` is the
    (3/W)·|A|·|B| Markov bound — both driver-hashed.  At 100 TB only
    the two sketch passes run (one scan each, D×W rows out); the exact
    join here is the audit lane, same posture as zorder_layout_audit.
    Reference scope: the snapshotter plans joins blindly; this is the
    statistics layer Spark's CBO would consume.

    r9b: each pair also carries the per-side max key multiplicity and
    a deterministic STRATEGY verdict (the advisor rule a planner would
    apply to these statistics): broadcast the smaller side when it
    fits, salt when either side's hottest key exceeds
    ``ADVISOR_SKEW_PERMILLE`` of its rows, else sort-merge.  The rule
    composes N103's estimate with the N82 salt machinery's trigger —
    statistics → strategy, oracle-replayed."""
    from hbase_snapshotter_spark.operators.sketches import (
        CMS_BOUND_NUM,
        CMS_JOIN_WIDTH,
        cms_join_size,
    )

    from hbase_snapshotter_spark.queries.gating import audit_enabled

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")

    if not audit_enabled(sf_dir):
        return _join_size_estimate_sketch_only(orders, cust, li, ev)

    def lane(tag: str, a: DataFrame, ka: str, b: DataFrame,
             kb: str) -> DataFrame:
        an = a.filter(F.col(ka).isNotNull())
        bn = b.filter(F.col(kb).isNotNull())
        est = cms_join_size(a, ka, b, kb)
        ga = an.groupBy(F.col(ka).alias("k")).agg(
            F.count(F.lit(1)).alias("ca"))
        gb = bn.groupBy(F.col(kb).alias("k")).agg(
            F.count(F.lit(1)).alias("cb"))
        exact = ga.join(gb, "k").agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            .cast("long").alias("exact_rows"))
        counts = (
            ga.agg(F.sum("ca").alias("n_left"),
                   F.max("ca").alias("max_rows_left"))
            .crossJoin(gb.agg(F.sum("cb").alias("n_right"),
                              F.max("cb").alias("max_rows_right"))))
        return (
            counts.crossJoin(exact).crossJoin(est)
            .select(
                F.lit(tag).alias("pair"),
                F.col("n_left").cast("long").alias("n_left"),
                F.col("n_right").cast("long").alias("n_right"),
                F.col("max_rows_left").cast("long").alias("max_rows_left"),
                F.col("max_rows_right").cast("long")
                .alias("max_rows_right"),
                F.lit(None).cast("long").alias("est_max_rows_left"),
                F.lit(None).cast("long").alias("est_max_rows_right"),
                "exact_rows", "est_rows",
                (F.col("est_rows") >= F.col("exact_rows"))
                .alias("never_underestimates"),
                ((F.col("est_rows") - F.col("exact_rows")) * CMS_JOIN_WIDTH
                 <= CMS_BOUND_NUM * F.col("n_left") * F.col("n_right"))
                .alias("within_bound"),
                advisor_strategy_col().alias("strategy")))

    mid = F.lit("1997-07-01")
    return (
        lane("orders_customer_custkey", orders, "o_custkey",
             cust, "c_custkey")
        .unionAll(lane("lineitem_halves_partkey",
                       li.filter(F.col("l_shipdate") < mid), "l_partkey",
                       li.filter(F.col("l_shipdate") >= mid), "l_partkey"))
        .unionAll(lane("events_touch_purchase_user",
                       ev.filter(F.col("event_type").isin("view", "click")),
                       "user_id",
                       ev.filter(F.col("event_type") == "purchase"),
                       "user_id")))


def _oracle_join_size() -> str:
    from hbase_snapshotter_spark.operators.sketches import (
        CMS_BOUND_NUM,
        CMS_DEPTH,
        CMS_JOIN_WIDTH,
    )

    depth_vals = ", ".join(f"({d})" for d in range(CMS_DEPTH))
    bucket = ("CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR) || '|' "
              "|| CAST({it} AS VARCHAR)), 1, 8) AS BIGINT) % {w}")

    def lane(tag: str, a_src: str, ka: str, b_src: str, kb: str) -> str:
        return f"""
SELECT '{tag}' AS pair, n_left, n_right, max_rows_left, max_rows_right,
       CAST(NULL AS BIGINT) AS est_max_rows_left,
       CAST(NULL AS BIGINT) AS est_max_rows_right,
       exact_rows, est_rows,
       est_rows >= exact_rows AS never_underestimates,
       (est_rows - exact_rows) * {CMS_JOIN_WIDTH}
         <= {CMS_BOUND_NUM} * n_left * n_right AS within_bound,
       CASE WHEN LEAST(n_left, n_right) <= {ADVISOR_BROADCAST_ROWS}
              THEN CASE WHEN n_right <= n_left THEN 'broadcast_right'
                        ELSE 'broadcast_left' END
            WHEN max_rows_left * 1000 > {ADVISOR_SKEW_PERMILLE} * n_left
              OR max_rows_right * 1000 > {ADVISOR_SKEW_PERMILLE} * n_right
              THEN 'salted_shuffle'
            ELSE 'sort_merge' END AS strategy
FROM (
  WITH av AS (SELECT {ka} AS k FROM {a_src} WHERE {ka} IS NOT NULL),
       bv AS (SELECT {kb} AS k FROM {b_src} WHERE {kb} IS NOT NULL),
       sa AS (SELECT dd.d AS depth,
                     {bucket.format(it='k', w=CMS_JOIN_WIDTH)} AS bucket,
                     COUNT(*) AS cnt
              FROM av, (VALUES {depth_vals}) dd(d) GROUP BY 1, 2),
       sb AS (SELECT dd.d AS depth,
                     {bucket.format(it='k', w=CMS_JOIN_WIDTH)} AS bucket,
                     COUNT(*) AS cnt
              FROM bv, (VALUES {depth_vals}) dd(d) GROUP BY 1, 2),
       ip AS (SELECT sa.depth, SUM(sa.cnt * sb.cnt) AS ip
              FROM sa JOIN sb USING (depth, bucket) GROUP BY 1),
       ga AS (SELECT k, COUNT(*) c FROM av GROUP BY 1),
       gb AS (SELECT k, COUNT(*) c FROM bv GROUP BY 1),
       ex AS (SELECT COALESCE(SUM(ga.c * gb.c), 0) AS exact_rows
              FROM ga JOIN gb USING (k))
  SELECT CAST((SELECT SUM(c) FROM ga) AS BIGINT) AS n_left,
         CAST((SELECT SUM(c) FROM gb) AS BIGINT) AS n_right,
         CAST((SELECT MAX(c) FROM ga) AS BIGINT) AS max_rows_left,
         CAST((SELECT MAX(c) FROM gb) AS BIGINT) AS max_rows_right,
         CAST((SELECT exact_rows FROM ex) AS BIGINT) AS exact_rows,
         CAST((SELECT MIN(ip) FROM ip) AS BIGINT) AS est_rows
)"""

    return (
        lane("orders_customer_custkey", "orders", "o_custkey",
             "customer", "c_custkey")
        + "\nUNION ALL\n"
        + lane("lineitem_halves_partkey",
               "(SELECT * FROM lineitem WHERE l_shipdate"
               " < TIMESTAMP '1997-07-01')", "l_partkey",
               "(SELECT * FROM lineitem WHERE l_shipdate"
               " >= TIMESTAMP '1997-07-01')", "l_partkey")
        + "\nUNION ALL\n"
        + lane("events_touch_purchase_user",
               "(SELECT * FROM events WHERE event_type IN"
               " ('view', 'click'))", "user_id",
               "(SELECT * FROM events WHERE event_type = 'purchase')",
               "user_id"))


PAIRS.update({
    "join_size_estimate": (join_size_estimate, _oracle_join_size()),
})
