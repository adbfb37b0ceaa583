"""Relational/analytics queries over the TPC-H-ish star schema.

These exercise the engine's aggregation, broadcast-join, window-top-k,
unpivot and anti-join operators at the analytics layer (the layer the
reference feeds via its sinks). Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.reshape import melt
from ..operators.topk import top_k_per_key
from .registry import query, sql_exact_sum, t

# ---------------------------------------------------------------------------
# pricing_summary — flagship (TPC-H Q1 shape). One scan + one partial/final
# hash agg on a 6-value grouping key; at 100 TB this is scan-bound with
# map-side combine, no skew risk.
# ---------------------------------------------------------------------------

#: Money columns are 2-decimal doubles. For cross-engine exactness we
#: reconstruct integer cents per row (round-to-int is unambiguous: the
#: doubles sit within 1e-9 of an integer), do the revenue products in
#: int64 (exact, order-independent), and divide once at the end.
#: Raw double sums drift with partitioning; double ROUND(x,4) disagrees
#: between engines; DuckDB decimal×decimal overflows on triple products
#: — integer cents avoid all three.
_SQL_DISC_PRICE = (
    "CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0"
)
_SQL_CHARGE = (
    "CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
    " * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT))) AS DOUBLE) / 1000000.0"
)

_PRICING_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_exact_sum('l_quantity', 2)} AS sum_qty,
  {sql_exact_sum('l_extendedprice', 2)} AS sum_base_price,
  {_SQL_DISC_PRICE} AS sum_disc_price,
  {_SQL_CHARGE} AS sum_charge,
  {sql_exact_sum('l_quantity', 2)} / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  {sql_exact_sum('l_extendedprice', 2)} / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  {sql_exact_sum('l_discount', 2)} / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _cents(col: str) -> "F.Column":
    return F.round(F.col(col) * 100, 0).cast("long")


def _disc_price_sum():
    term = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return F.sum(term).cast("double") / F.lit(10000.0)


def _charge_sum():
    term = (
        _cents("l_extendedprice")
        * (F.lit(100) - _cents("l_discount"))
        * (F.lit(100) + _cents("l_tax"))
    )
    return F.sum(term).cast("double") / F.lit(1000000.0)


@query("pricing_summary", _PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the wide decimal partial-agg is scan-rooted CPU (r14:
    # 1.24 -> 1.01 s best); the shipdate predicate still reaches the
    # scan below the repartition (PushedFilters pin in
    # test_plan_properties)
    l = t(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") <= "2000-09-02"
    )
    qty = F.col("l_quantity").cast("decimal(27,2)")
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).cast("double").alias("sum_base_price"),
        _disc_price_sum().alias("sum_disc_price"),
        _charge_sum().alias("sum_charge"),
        (F.sum(qty).cast("double") / cnt.cast("double")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).cast("double") / cnt.cast("double")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(27,2)")).cast("double") / cnt.cast("double")).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# top_revenue_orders — TPC-H Q3 shape: two joins + agg + global top-k.
# customer is small → broadcast; orders⋈lineitem shuffles on o_orderkey
# (natural co-partitioning key). Global top-k → TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_TOP_REVENUE_ORACLE = f"""
SELECT
  l_orderkey,
  {_SQL_DISC_PRICE} AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@query("top_revenue_orders", _TOP_REVENUE_ORACLE)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    # customer (dim) broadcasts; the filtered-orders side still scales
    # with the fact, so its join shuffles on o_orderkey (AQE broadcasts
    # it at small SF where it fits under the threshold)
    joined = l.join(
        o.join(c, F.col("o_custkey") == F.col("c_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_disc_price_sum().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# region_revenue — TPC-H Q5 shape: a chain of dimension joins.
# nation/region are bounded → hint-broadcast; customer/orders scale with
# SF → the optimizer picks broadcast vs shuffle per actual size, and the
# fact's join key (l_orderkey) stays the natural co-partitioning key.
# ---------------------------------------------------------------------------

_REGION_REVENUE_ORACLE = f"""
SELECT
  n_name,
  {_SQL_DISC_PRICE} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("region_revenue", _REGION_REVENUE_ORACLE)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    o_dim = o.join(dims, F.col("o_custkey") == F.col("c_custkey"))
    return (
        l.join(o_dim, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            _disc_price_sum().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# brand_top_parts — A5 top-k-per-key via window (partial top-k per
# partition before the shuffle; key cardinality = 25 brands → fine).
# ---------------------------------------------------------------------------

_BRAND_TOP_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
) WHERE rn <= 3
"""


@query("brand_top_parts", _BRAND_TOP_ORACLE)
def brand_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return top_k_per_key(
        p.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
        3,
    )


# ---------------------------------------------------------------------------
# priority_monthly — calendar math (C8) + grouped exact sums.
# ---------------------------------------------------------------------------

_PRIORITY_MONTHLY_ORACLE = f"""
SELECT
  date_trunc('month', o_orderdate) AS order_month,
  o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_exact_sum('o_totalprice', 2)} AS sum_total
FROM orders
GROUP BY 1, 2
"""


@query("priority_monthly", _PRIORITY_MONTHLY_ORACLE)
def priority_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias("sum_total"),
    )


# ---------------------------------------------------------------------------
# lineitem_melt_stats — R1 unpivot (wide reading → long measures, the
# reference's core reshape, purpleair.js:58-76) then per-parameter agg.
# Unpivot is narrow (no shuffle); only the 4-group agg shuffles.
# ---------------------------------------------------------------------------

_MELT_ORACLE = f"""
WITH long AS (
  SELECT 'l_quantity' AS parameter, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT parameter, COUNT(*) AS n, {sql_exact_sum('value', 2)} AS sum_value
FROM long WHERE value IS NOT NULL
GROUP BY parameter
"""


@query("lineitem_melt_stats", _MELT_ORACLE)
def lineitem_melt_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the 4-way melt explode is scan-rooted (r14: 1.20 -> 0.88)
    l = t(spark, sf_dir, "lineitem", spread=True)
    long = melt(
        l,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="parameter",
        value_name="value",
    )
    return long.groupBy("parameter").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,2)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# customers_without_orders — J5 anti-join (the reference's skip-if-exists
# write elision, providers.js:101-116, as a relational op).
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


@query("customers_without_orders", _ANTI_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(o, on="c_custkey", how="left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# supplier_nation_stats — broadcast dim join + grouped stats (J1 shape on
# the relational layer).
# ---------------------------------------------------------------------------

_SUPPLIER_ORACLE = f"""
SELECT n_name,
       COUNT(*) AS n_suppliers,
       {sql_exact_sum('s_acctbal', 2)} AS sum_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@query("supplier_nation_stats", _SUPPLIER_ORACLE)
def supplier_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(27,2)")).cast("double").alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# cheapest_parts_per_brand — TPC-H Q2 shape: correlated scalar subquery
# (min price within the row's brand). Expressed through the engine's
# *SQL surface* (spark.sql over registered views) so Catalyst's
# subquery decorrelation does the rewrite — the same text runs on DuckDB.
# ---------------------------------------------------------------------------

_CHEAPEST_SQL = """
SELECT p_brand, p_partkey, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""


@query("cheapest_parts_per_brand", _CHEAPEST_SQL)
def cheapest_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import tables

    tables.register_views(spark, sf_dir)
    return spark.sql(_CHEAPEST_SQL)


# ---------------------------------------------------------------------------
# nation_pair_volume — TPC-H Q7 shape: trade volume between customer and
# supplier nations (nation joined twice under different roles); both
# nation dims broadcast, the fact side shuffles once for the group-by.
# ---------------------------------------------------------------------------

_VOLUME_ORACLE = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_3', 'NATION_4')
GROUP BY cn.n_name, sn.n_name
"""


@query("nation_pair_volume", _VOLUME_ORACLE)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    cn = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.filter(F.col("n_name").isin("NATION_3", "NATION_4")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
    supp = s.join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    joined = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return joined.groupBy("cust_nation", "supp_nation").agg(
        F.count(F.lit(1)).alias("n_items"),
        _disc_price_sum().alias("volume"),
    )
