"""Remaining TPC-H query shapes expressible on the driver's star schema.

The reference engine ships no TPC-H harness (its benches are OLTP point ops,
``benchmarks/baselines/``), but its README claims general SELECT support —
these queries exercise the same relational surface (reference
``crates/driftdb-core/src/sql_bridge.rs`` dispatch) at analytics shapes.

Shapes needing a ``partsupp`` table (Q2/Q11/Q16/Q20) run over a DERIVED
association table (see ``_PARTSUPP_CTE`` below) — the driver's schema has no
partsupp, so it is built identically on both engines from lineitem, keeping
the fixed-input contract. Q4/Q12/Q21 normally use
``l_commitdate``/``l_receiptdate``/``l_shipmode``; the driver's lineitem has
none of those, so lateness is re-expressed as ``l_shipdate`` vs
``o_orderdate + INTERVAL`` and the Q12 "shipmode" class as ``l_returnflag``
— the join/aggregate/subquery SHAPE (what the optimizer sees) is unchanged.

Decimal discipline (see operators/relational.py): every float SUM routes
through DECIMAL(12,2) on both engines; ratios divide once in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from driftdb_spark.catalog import load_tables
from driftdb_spark.operators.relational import DEC, _dec
from driftdb_spark.registry import register


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "subquery", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS with a
    non-equi tail → LeftSemi join whose equi part (orderkey) drives the
    shuffle and whose range part filters inside the join. The quarter
    filter prunes orders BEFORE the semi-join, so the shuffled side is one
    quarter of one fact, not the whole table. (Reference has no commitdate/
    receiptdate columns here; lateness = shipped >30 days after order.)"""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    return (
        o.join(t["lineitem"], (F.col("l_orderkey") == F.col("o_orderkey")) & late, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("filter", "agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    scan-dominated query — every predicate is a single-column range that
    pushes to the parquet scan (plan shows PushedFilters on shipdate/
    discount/quantity), then one map-side-combinable global sum. No joins,
    no wide shuffle: at 100 TB this is min/max row-group pruning + a
    1-row-per-partition reduce."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l.l_discount AS DECIMAL(12,2)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p      ON l.l_partkey = p.p_partkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
        JOIN region r    ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
              / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the widest join tree in the
    suite — 8 tables, nation joined twice under different roles. All dims
    (part pre-filtered to one type, supplier+nation, customer+nation+region
    pre-filtered to one region) broadcast; the single shuffled edge is
    lineitem⋈orders, merge-hinted onto the orderkey layout. Numerator and
    denominator are exact decimal sums; one double division per year."""
    t = load_tables(spark, sf_dir)
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    s = t["supplier"].join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    cust_region = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    vol = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    zero = F.lit(0).cast(DEC)
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): substring LIKE over a dim
    drives the fact reduction — part shrinks to one color's parts,
    broadcasts, and prunes lineitem before the orders edge. (The driver
    schema has no partsupp/ps_supplycost, so profit is revenue-only; the
    plan shape — 5-table join grouped by supplier nation × order year —
    is Q9's.) Profit per (nation, year) is an exact decimal sum cast once."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    n = t["nation"].select("n_nationkey", F.col("n_name").alias("nation"))
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation", "o_year")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("profit")
        )
    )


@register(
    "q12_late_lines_by_class",
    oracle="""
    SELECT l.l_returnflag AS line_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY line_class
    """,
    tags=("join", "agg"),
)
def q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): fact-fact join where the
    post-join predicate compares columns from BOTH sides (shipped >30 days
    after order) — unpushable, evaluated inside the join — followed by
    conditional counts pivoting on the orders-side priority. (No
    l_shipmode/commitdate in the driver schema: class = l_returnflag,
    lateness = shipdate vs orderdate.) The year filter prunes lineitem
    before the merge-hinted orderkey join."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): LEFT join whose
    predicate lives in the ON clause (filtering orders without dropping
    order-less customers — moving it to WHERE would change the result),
    then two stacked aggregations: per-customer order count, then the
    histogram of those counts. The second groupBy keys on the first's
    output, so it's a cheap re-shuffle of an already-reduced set; COUNT of
    the nullable o_orderkey counts only matches, giving 0 for no-order
    customers."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("join", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier via revenue view): an aggregate is
    reused twice — once as the row source, once reduced to a scalar MAX —
    without recomputation: the quarter's per-supplier revenue materializes
    as one shuffle, its 1-row MAX broadcasts back onto itself. Revenue is
    an exact decimal sum cast to double on both engines, so the equality
    join on a float value is bit-deterministic (same reasoning as the
    sampling ops' md5 thresholds)."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        # explicit, so BOTH consumers of rev (row source and scalar MAX) see
        # identical scan predicates — otherwise the supplier join infers
        # IsNotNull(l_suppkey) into only one branch and the canonicalized
        # exchanges stop matching, defeating ReuseExchange (two full scans).
        .filter(F.col("l_suppkey").isNotNull())
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("join", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    subquery per part → decorrelated into a per-part aggregate joined back
    to the fact (Catalyst does the same rewrite to correlated scalar
    subqueries in SQL form). The brand filter shrinks part first, and the
    per-part averages are computed only over that brand's lineitems — the
    correlation key makes the restriction sound. l_quantity is whole-valued
    (1..50) so its double SUM is exact at any scale and AVG = one division:
    cross-engine deterministic without decimal routing."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = t["lineitem"].join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("join", "subquery", "agg", "limit"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS + NOT-EXISTS pair over the same fact. The naive decorrelation
    joins lineitem two more times on orderkey; instead BOTH quantifiers
    derive from one per-(order, supplier) late-line count:
    EXISTS(other supplier) ⇔ n_supp > 1, NOT EXISTS(other late supplier)
    given l1 late ⇔ exactly one supplier has n_late_lines > 0, and l1's
    line count IS n_late_lines — so numwait = SUM(n_late_lines).
    Every derived aggregate/join keys on orderkey, so the shuffle join's
    partitioning is reused with ZERO further fact shuffles (the
    (order,supplier) groupBy clusters by a superset of the partition key,
    and the per_supp exchange feeding both the per-order rollup and the
    late-supplier row source is a ReusedExchange); no distinct-expand
    either. Three exchanges total: two join inputs + the final s_name
    rollup. The join is a hinted SHUFFLED HASH join, deliberately:
    unhinted, the planner broadcasts the filtered orders at bench scale,
    which never establishes the orderkey partitioning everything
    downstream reuses (and filtered orders exceeds any broadcast
    threshold at production scale anyway); vs the previous merge hint,
    SHJ skips both sides' sorts — isolated-run A/B at sf0.1 (cold suite,
    single query per session; NOT comparable to in-suite bench medians,
    which run ~2x higher under suite-wide cache pressure): SHJ 0.53 s,
    SMJ 0.72 s,
    and the build side is the compact (orderkey, orderdate) projection
    whose per-partition size AQE bounds. Lateness = shipped >60 days
    after order (no receipt/commit dates in the driver schema); ORDER BY
    (numwait DESC, s_name) makes the LIMIT cut deterministic."""
    t = load_tables(spark, sf_dir)
    o = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .filter(F.col("o_orderkey").isNotNull())
        .select("o_orderkey", "o_orderdate")
    )
    # explicit not-nulls keep both consumers' scan predicates identical so
    # ReuseExchange canonicalization holds (same trick as q15_top_supplier)
    li = (
        t["lineitem"]
        .filter(
            F.col("l_orderkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
            & F.col("l_shipdate").isNotNull()
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    per_supp = (
        li.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late, 1)).alias("n_late_lines"))
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("n_late_lines") > 0, 1)).alias("n_late_supp"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("g_orderkey")
    return (
        per_supp.filter(F.col("n_late_lines") > 0)
        # shuffle_hash, not the default sort-merge: both sides arrive
        # already hash-partitioned on orderkey (children of the reused
        # per_supp exchange), so neither join needs an exchange — but SMJ
        # was paying a SORT on each side (plan _before: Sort(13)+Sort(29)
        # under SortMergeJoin(30)). SHJ consumes the same partitioning
        # sort-free; build side is the filtered per-order aggregate,
        # whose per-partition size AQE bounds.
        .join(qualifying.hint("shuffle_hash"), F.col("l_orderkey") == F.col("g_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# The four shapes that need TPC-H's partsupp association table (Q2/Q11/Q16/
# Q20). The driver schema ships no partsupp, so it is DERIVED — identically
# on both engines — from lineitem: one row per observed (part, supplier)
# pair, supply cost = min observed unit price, availability = total quantity
# ever shipped. The derivation is itself the canonical "build an association
# table" aggregation; everything downstream is the authentic TPC-H shape.

_PARTSUPP_CTE = """partsupp AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice) AS ps_supplycost,
               CAST(SUM(l_quantity) AS BIGINT) AS ps_availqty
        FROM lineitem GROUP BY 1, 2
    )"""


def _derived_partsupp(t, li: DataFrame | None = None) -> DataFrame:
    """See _PARTSUPP_CTE. Supply cost = min observed line price: a 2-decimal
    source value, so it round-trips EXACTLY through DECIMAL(12,2) on both
    engines (a min of unit-price quotients would be an arbitrary-precision
    double whose decimal rounding diverges at the last ulp between engines
    — that bit Q11). MIN is order-independent; quantities are whole-valued
    so the bigint availability is exact.

    ``li`` lets callers pass a pre-filtered lineitem (q11's nation
    suppliers, q20's red parts): filters on the group keys commute below
    this aggregation, and the ONE shared derivation here keeps all four
    partsupp shapes agreeing with the oracle CTE."""
    if li is None:
        li = t["lineitem"]
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min("l_extendedprice").alias("ps_supplycost"),
        F.sum("l_quantity").cast("bigint").alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    costs AS (
        SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    best AS (
        SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
        FROM costs GROUP BY ps_partkey
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey,
           c.ps_supplycost AS supplycost
    FROM costs c
    JOIN best b ON c.ps_partkey = b.ps_partkey AND c.ps_supplycost = b.min_cost
    JOIN part p ON p.p_partkey = c.ps_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "agg", "limit"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated MIN subquery over
    the association table. Two plan decisions beyond the naive
    decorrelation (per-part MIN aggregate + rejoin on (part, cost)):

    - The part filter COMMUTES through the per-part MIN (the subquery
      correlates on partkey alone, so dropping a part drops its whole
      group) — broadcast the filtered part list into the association
      build first, shrinking everything downstream to the selected parts.
    - The MIN + tie-preserving rejoin is a window (`min over partkey` +
      filter equal): one exchange on partkey instead of an aggregate
      exchange plus a two-key self-join; ties all survive, exactly Q2's
      semantics. A/B at sf0.1: 0.38 s vs 0.78 s, identical frames.

    The float-equality filter is safe because both sides carry the SAME
    double (min of identical values). The four-key ORDER BY is a total
    order, so LIMIT is deterministic."""
    t = load_tables(spark, sf_dir)
    n = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    p = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    # The part filter commutes below the association aggregation (partkey
    # is a group key — dropping a part drops its whole group), so the
    # broadcast semi-join prunes lineitem BEFORE the (part, supplier)
    # exchange: the big shuffle carries only the selected parts' lines
    # (~1/250 of the fact; q11/q16/q20 already use this shape — q2 was
    # the one partsupp query still aggregating the full fact first).
    # Catalyst cannot do this rewrite itself: it never pushes a join
    # through an aggregate. The post-aggregate broadcast join with p is
    # unchanged (it attaches p_partkey and re-applies the now-vacuous
    # filter), so the output frame is bit-identical.
    li_p = t["lineitem"].join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "semi",
    )
    costs = (
        _derived_partsupp(t, li_p)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = W.partitionBy("ps_partkey")
    return (
        costs.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    ps_n AS (
        SELECT ps_partkey,
               CAST(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty
                    AS DECIMAL(28,2)) AS v
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
    )
    SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
    FROM ps_n
    GROUP BY ps_partkey
    HAVING CAST(SUM(v) AS DOUBLE)
           > (SELECT CAST(SUM(v) AS DOUBLE) * 0.0001 FROM ps_n)
    """,
    tags=("join", "subquery", "agg"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value filtered
    against a fraction of the GLOBAL value — the same relation aggregated
    at two granularities, with the scalar side broadcast back (same
    exchange-reuse discipline as q15). Value routes through exact decimals
    (supplycost is a 2-decimal source value, exact in DECIMAL(12,2);
    quantity is exact bigint) so the group sums and the global threshold
    are reproducible; the single ×0.0001 happens once in double. The
    nation's supplier filter is pushed BELOW the association-table
    aggregation (suppkey is a group key, so it commutes): the big
    (part, supplier) shuffle sees one nation's lines, ~1/|nations| of the
    fact — A/B at sf0.1: 0.54 s vs 0.67 s, and the ratio improves with
    nation count at scale."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].filter(F.col("n_name") == "NATION_1")
    s = t["supplier"].join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
    li_n = t["lineitem"].join(
        F.broadcast(s.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey")
    )
    ps_n = _derived_partsupp(t, li_n).select(
        "ps_partkey",
        (F.col("ps_supplycost").cast("decimal(12,2)") * F.col("ps_availqty"))
        .cast("decimal(28,2)")
        .alias("v"),
    )
    per_part = ps_n.groupBy("ps_partkey").agg(F.sum("v").cast("double").alias("value"))
    thr = ps_n.agg((F.sum("v").cast("double") * 0.0001).alias("thr"))
    return (
        per_part.join(F.broadcast(thr), F.col("value") > F.col("thr"))
        .select("ps_partkey", "value")
    )


@register(
    "q16_parts_supplier_counts",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "subquery", "agg"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): negated dim predicates
    + IN-list + NOT IN (subquery) feeding a COUNT(DISTINCT) grouped three
    ways. The exclusion list (Q16's 'complaint' suppliers — proxied here as
    low-balance since the schema has no comment column) is a broadcast
    anti-join; suppkey is non-null so NOT IN ≡ anti-join without the
    null-aware plan. Distinct-count shuffles once on the group keys with
    partial distinct aggregation map-side.

    The association-table aggregation is skipped entirely: its outputs
    (cost, availability) are unused here, so COUNT(DISTINCT suppkey) over
    the part-filtered, supplier-anti-joined fact IS the partsupp
    relationship count — both filters key on the association group keys
    and commute. One shuffle on the group keys instead of a (part, supp)
    aggregate exchange first (A/B at sf0.1: 0.33 s vs 0.55 s)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
    )
    excluded = t["supplier"].filter(F.col("s_acctbal") < 500.0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
          SELECT ps.ps_suppkey FROM partsupp ps
          WHERE ps.ps_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND ps.ps_availqty > (
                SELECT 0.5 * SUM(l.l_quantity) FROM lineitem l
                WHERE l.l_partkey = ps.ps_partkey
                  AND l.l_suppkey = ps.ps_suppkey
                  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            )
      )
    """,
    tags=("join", "subquery", "agg"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): three nested quantifiers
    — IN(parts by name), a correlated scalar aggregate threshold, IN
    (suppliers) — decorrelated into: the year's shipped quantity aggregated
    per (part, supplier) and inner-joined onto the association table (an
    empty correlated sum is NULL → comparison false → inner join drops it,
    same as SQL); surviving supplier keys semi-joined onto the
    nation-filtered suppliers. The red-part broadcast filter is pushed
    BELOW both (part, supplier) aggregations — partkey is a group key, so
    the filter commutes, and both big shuffles see only red-part lines
    (the selectivity win that dominates at 100 TB; A/B at sf0.1: 0.72 s vs
    0.80 s). Both aggregates hash on (partkey, suppkey), so the
    correlation join reuses the partitioning with no extra exchange.
    availqty (bigint) > 0.5×sum promotes to double exactly."""
    t = load_tables(spark, sf_dir)
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    li_red = t["lineitem"].join(
        F.broadcast(red), F.col("l_partkey") == F.col("p_partkey")
    )
    ps_red = _derived_partsupp(t, li_red)
    year_qty = (
        li_red.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("y_partkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("year_qty"))
    )
    qualifying = (
        ps_red.join(
            year_qty,
            (F.col("ps_partkey") == F.col("y_partkey"))
            & (F.col("ps_suppkey") == F.col("y_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("year_qty"))
        .select("ps_suppkey")
    )
    n5 = t["nation"].filter(F.col("n_name") == "NATION_5")
    return (
        t["supplier"]
        .join(F.broadcast(n5), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) — completing the 22-shape set.
    What distinguishes it from the plain 6-table chain (join_multi_chain)
    is the LOCAL-supplier condition ``c_nationkey = s_nationkey``: an
    equality between two dimensions that only meet through the fact, so it
    rides the supplier broadcast join as an extra condition rather than
    creating any new edge. Join tree follows the single-fact-shuffle rule
    (SCALE.md §7): the year's orders join customer first, lineitem joins
    that once on orderkey (shuffle_hash — partitioning without the sorts);
    region-filtered nation and supplier broadcast. Revenue routes through
    exact decimals."""
    t = load_tables(spark, sf_dir)
    n_asia = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = t["supplier"].join(
        F.broadcast(n_asia), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    oc = o.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return (
        t["lineitem"]
        .join(oc.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
