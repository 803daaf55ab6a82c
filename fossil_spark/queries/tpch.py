"""TPC-H-style analytical queries, Spark-first.

Shapes follow the classic TPC-H workload adapted to the driver's
schema (some columns are absent). Scale notes:

- Dimension tables (region/nation/customer/supplier/part) are tiny
  relative to the facts: joins are explicitly broadcast so the
  lineitem/orders scans never shuffle for them. Fact-fact joins
  (orders↔lineitem on orderkey) are the only shuffles.
- Money aggregates use the deterministic-sum pattern: the per-row
  expression is IEEE double (bit-identical on any engine), the
  accumulation is decimal(30,8) (exact, partition-order independent),
  the output is double. Results are reproducible at any parallelism
  and match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fossil_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def dsum(expr: Column) -> Column:
    """Deterministic distributed sum of a double expression."""
    return F.round(F.sum(expr.cast("decimal(30,8)")), 4).cast("double")


def _rev():
    """Per-row revenue expression (built lazily: Columns need an active session)."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: pricing summary report. Pure scan + groupBy on two
    low-cardinality keys — map-side partial agg does nearly all work."""
    l = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("timestamp")
    charge = _rev() * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(_rev()).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped-order revenue, top 10. customer is broadcast; the
    only shuffle is orders↔lineitem on orderkey (both huge at scale)."""
    cutoff = F.lit("1995-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue by nation. All dims broadcast; fact-fact shuffle on
    orderkey only. supplier-nation == customer-nation applied as a
    cheap column compare after the broadcasts."""
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: scan-heavy filter + single agg. Every predicate pushes into
    the parquet scan; the job is bandwidth-bound as it should be."""
    l = _t(spark, sf_dir, "lineitem")
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    return (
        l.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional aggregation after a fact-fact join —
    high- vs low-priority line counts per month of 1995. The CASE
    expressions fold into the same single aggregation pass."""
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share. part is broadcast; the ratio of
    two deterministic sums is a single double division."""
    lo = F.lit("1995-09-01").cast("timestamp")
    hi = F.lit("1995-10-01").cast("timestamp")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    p = _t(spark, sf_dir, "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo_rev) / dsum(_rev())).alias("promo_revenue_pct")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold —
    aggregate lineitem first (map-side partial), THEN join the small
    qualifying set back to orders/customer. Never join-then-aggregate:
    the pre-aggregation collapses the fact table before any join."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority checking via a SEMI join — orders in a
    quarter having at least one late-shipped line (l_shipdate >
    o_orderdate stands in for the reference's commit/receipt columns,
    absent from the driver schema). leftsemi keeps the probe side from
    duplicating orders and never materializes lineitem columns."""
    lo = F.lit("1995-07-01").cast("timestamp")
    hi = F.lit("1995-10-01").cast("timestamp")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = _t(spark, sf_dir, "lineitem")
    late = l.select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == late.l_orderkey) & (late.l_shipdate > o.o_orderdate)
    return (
        o.join(late, cond, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year.
    supplier/customer/nation broadcast twice under different roles;
    the orders↔lineitem shuffle is the only exchange."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customers-per-order-count histogram via a LEFT OUTER
    join (customers with zero orders must appear) then two
    aggregations. Orders are pre-filtered (urgent excluded, standing
    in for the reference's comment filter)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges. part broadcast; the OR-of-ANDs evaluates post-join in one
    codegen stage (no union of three joins)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    b = F.col("p_brand")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((b == "Brand#1") & (q >= 1) & (q <= 30) & (sz <= 15))
        | ((b == "Brand#2") & (q >= 10) & (q <= 40) & (sz <= 30))
        | ((b == "Brand#3") & (q >= 20) & (q <= 50) & (sz <= 50))
    )
    return joined.filter(cond).agg(dsum(_rev()).alias("revenue"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue.
    The revenue view aggregates lineitem once; the scalar max comes
    back as a one-row broadcast (no driver collect), and the
    deterministic 4-decimal sums make the equality engine-stable."""
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1995-04-01").cast("timestamp")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    revenue = l.groupBy("l_suppkey").agg(dsum(_rev()).alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(broadcast(top), F.col("total_revenue") == F.col("__max_rev"))
        .join(broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from orders below 20% of their part's average
    quantity (correlated aggregate). The per-part averages collapse
    lineitem to one row per part and broadcast back — the correlated
    subquery becomes a broadcast join, never a per-row re-scan."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(per_part), l.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average positive balances and no
    EARLY orders (none in the first two months of the data; the
    driver's dense order history gives every customer some order over
    the full span) — a global scalar (one-row broadcast) plus a LEFT
    ANTI join, grouped by nation (standing in for the reference's
    phone country code, absent from the driver schema)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp")
    ).select("o_custkey")
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count("*")).alias("__avg_bal"))
    )
    return (
        c.join(broadcast(avg_pos), F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item revenue by customer, top 20. Dims broadcast;
    orders↔lineitem shuffle on orderkey."""
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1995-04-01").cast("timestamp")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part (correlated subquery).
    The driver schema has no partsupp, so lineitem's (partkey,
    suppkey) pairs are the part↔supplier relation and max(s_acctbal)
    stands in for min(ps_supplycost) — the same per-part correlated
    extreme, resolved as one window over the candidate set instead of
    a per-row re-scan. Dims broadcast; the only shuffle is lineitem's
    distinct pair projection."""
    from pyspark.sql import Window

    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(broadcast(p), ps.l_partkey == p.p_partkey)
        .join(broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    best = F.max("s_acctbal").over(Window.partitionBy("p_partkey"))
    return (
        cand.withColumn("__best", best)
        .filter(F.col("s_acctbal") == F.col("__best"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: national market share — NATION_5's fraction of PROMO-part
    revenue delivered into ASIA customers by year. The share is a
    conditional sum over ONE aggregation (no second pass); every dim
    broadcasts, orders↔lineitem is the only shuffle."""
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = _t(spark, sf_dir, "lineitem")
    vol = _rev()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(broadcast(r), F.col("cn_rkey") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_5", vol)
                     .otherwise(F.lit(0.0)))
                / dsum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit on 'red' parts by supplier nation and year. No
    partsupp/ps_supplycost in the driver schema: unit cost is proxied
    as 10% of p_retailprice (documented, mirrored in the oracle), so
    profit = rev - l_quantity * 0.1 * p_retailprice keeps the classic
    join tree and aggregation shape."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    profit = _rev() - F.col("l_quantity") * F.lit(0.1) * F.col("p_retailprice")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value with a HAVING over a global scalar
    (fraction of total). partsupp is absent, so value is NATION_7
    suppliers' shipped revenue per part from lineitem. The scalar total
    is a one-row aggregate cross-broadcast into the filter — computed
    once, not per group."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    l = _t(spark, sf_dir, "lineitem")
    base = (
        l.join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    per_part = base.groupBy("l_partkey").agg(dsum(_rev()).alias("value"))
    # the global total is the sum of the per-part values — derived from
    # the aggregate, so lineitem is scanned ONCE, not once per branch
    total = per_part.agg((dsum(F.col("value")) * F.lit(0.001)).alias("__cut"))
    return (
        per_part.join(broadcast(total), F.col("value") > F.col("__cut"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute triple
    with a NOT-IN supplier exclusion. lineitem's distinct pairs are
    the relation; suppliers with negative balances stand in for the
    reference's complaint-comment filter, excluded with LEFT ANTI (the
    NOT IN that never builds a null-trap subquery)."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0)
    return (
        ps.join(broadcast(p), ps.l_partkey == p.p_partkey)
        .join(broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested aggregate subquery chain — NATION_3 suppliers
    who shipped more than 60 units of any 'small' part during 1995.
    The inner per-(supplier, part) quantity aggregate SEMI-joins back
    to suppliers; parts broadcast into the aggregate's build side."""
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    heavy = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 60.0)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        # heavy is bounded by the supplier count — broadcast it so the
        # tiny supplier table never shuffles for the semi join
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "leftsemi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order. commit/receipt dates are absent, so
    'late' is l_shipdate > o_orderdate + 30 days (q4's convention,
    mirrored in the oracle). The EXISTS / NOT EXISTS pair collapses
    into per-order distinct-supplier counts computed as WINDOW
    collect_sets over the orderkey partitioning — one scan of the
    fact join and ONE shuffle, no groupBy-plus-join-back re-scan, no
    self-join of lineitem against itself."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = _t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    lo = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("__late"))
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        lo.withColumn("__ns", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "__nlate",
            F.size(F.collect_set(
                F.when(F.col("__late"), F.col("l_suppkey"))
            ).over(w)),
        )
        .filter(F.col("__late") & (F.col("__ns") >= 2) & (F.col("__nlate") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
