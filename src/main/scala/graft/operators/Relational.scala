package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational / OLAP core (SURVEY.md §2.B).
  *
  * Oracle-parity rules (SURVEY.md §4): double aggregates go through
  * DECIMAL(18,4) so Spark and DuckDB agree bit-for-bit; every computed
  * column is aliased identically on both sides; results carry a full
  * deterministic ORDER BY.
  */
object Relational {

  /** Cast a double column to exact decimal for order-independent,
    * engine-independent aggregation. */
  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Exact decimal sum surfaced as double (deterministic: one final
    * correctly-rounded conversion, identical in DuckDB). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Sum of a scale-8 decimal product, rescaled to 4 decimals BEFORE
    * the double cast. DuckDB's int128-decimal→double conversion is not
    * correctly rounded once the significand exceeds 2^53 (observed
    * 1-ulp drift at sf0.1); at scale 4 the significand fits in 53 bits
    * and both engines convert exactly. */
  private def productSum(c: Column): Column =
    sum(c).cast("decimal(38,4)").cast("double")

  // ---------------------------------------------------------------- B1
  /** TPC-H Q1-style pricing summary: single scan, map-side partial agg,
    * one shuffle on the (tiny-cardinality) group key. Filter + 7-column
    * projection push to the parquet scan. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        productSum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
          .as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- B2
  /** TPC-H Q3-style shipping priority: two shuffled joins on the order
    * key + one agg + deterministic top-10. At scale: customer filter
    * prunes before the join; AQE picks broadcast if the filtered side
    * shrinks enough. */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("1998-06-01").cast("timestamp")
    val c = Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(spark, sfDir).filter($"o_orderdate" < cut)
    val l = Tables.lineitem(spark, sfDir).filter($"l_shipdate" > cut)
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(productSum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
        .as("revenue"))
      .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_odate"), $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND o_orderkey = l_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- B3
  /** TPC-H Q5-style local-supplier volume: 6-way star join. The dim
    * chain (region→nation) broadcasts; fact joins shuffle on their
    * keys; c_nationkey = s_nationkey enforces locality. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.region(spark, sfDir).filter($"r_name" === "ASIA")
    val n = Tables.nation(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .join(s, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(productSum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- B4
  /** Small-dim join with an explicit broadcast hint: no shuffle of the
    * fact side at all — the only exchange is the final aggregation. */
  def qBroadcastDim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
      .orderBy($"r_name", $"n_name")
  }

  val qBroadcastDimSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
      |FROM customer, nation, region
      |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- B5
  /** Left-semi join (EXISTS): orders with at least one heavy line item.
    * Semi-join never materializes the right side's columns — at scale
    * the build side carries only the join key. */
  def qSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val heavy = Tables.lineitem(spark, sfDir).filter($"l_quantity" > 45)
      .select($"l_orderkey")
    o.join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val qSemiJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B6
  /** Left-anti join (NOT EXISTS): customers with no recent orders. The
    * date filter prunes the build side before the join. */
  def qAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
      .orderBy($"c_mktsegment")
  }

  val qAntiJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- B7
  /** Ranking window: top-2 orders per customer by price. One shuffle on
    * the partition key; fully tie-broken so the result set is unique. */
  def qWindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- B8
  /** ROLLUP grouping sets; group keys coalesced to 'ALL' so both engines
    * emit identical, deterministically sortable rows. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"sum_price")
      .orderBy($"status", $"priority")
  }

  val qRollupSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- B9
  /** Exact interpolated percentiles per group (both engines use the
    * (n-1)*q positional definition); quantized to 4 decimals to absorb
    * last-ulp formula differences. */
  def qPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_price"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  val qPercentilesSql: String =
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_price,
      |  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95_price,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- B10
  /** Multi-column COUNT(DISTINCT): Catalyst expands to a single
    * partial-agg + expand plan — no per-distinct extra shuffle. */
  def qDistinctAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"))
      .orderBy($"l_returnflag")
  }

  val qDistinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- B11
  /** Conditional (pivot-style) aggregation: status counts as columns.
    * Pure map-side CASE arithmetic, one shuffle. */
  def qConditionalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def cnt(status: String): Column =
      sum(when($"o_orderstatus" === status, 1L).otherwise(0L))
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .agg(
        cnt("F").as("n_f"), cnt("O").as("n_o"), cnt("P").as("n_p"),
        dsum(when($"o_orderstatus" === "F", $"o_totalprice").otherwise(lit(0.0)))
          .as("f_price"))
      .orderBy($"o_orderpriority")
  }

  val qConditionalAggSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS f_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B12
  /** Set operations: high-balance customers UNION low-balance suppliers'
    * nations, EXCEPT nations in AMERICA. Spark EXCEPT == EXCEPT
    * DISTINCT == DuckDB EXCEPT. */
  def qUnionExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cn = Tables.customer(spark, sfDir).filter($"c_acctbal" > 5000)
      .select($"c_nationkey".cast("int").as("nationkey"))
    val sn = Tables.supplier(spark, sfDir).filter($"s_acctbal" > 5000)
      .select($"s_nationkey".cast("int").as("nationkey"))
    val america = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter($"r_name" === "AMERICA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".cast("int").as("nationkey"))
    cn.union(sn).except(america).orderBy($"nationkey")
  }

  val qUnionExceptSql: String =
    """(SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer WHERE c_acctbal > 5000
      | UNION ALL
      | SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier WHERE s_acctbal > 5000)
      |EXCEPT
      |SELECT CAST(n_nationkey AS INT) AS nationkey FROM nation, region
      |WHERE n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- B20
  /** Approximate percentiles via the KLL-style quantile sketch
    * (approx_percentile) — the 100-TB path of B9: fixed-size sketch
    * state, single pass, mergeable partials. Rows-only (sketch
    * internals are engine-specific); the spec bounds error vs B9's
    * exact answer. */
  def qApproxPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)").as("approx"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("exact_p95"))
      .select($"o_orderstatus",
        element_at($"approx", 1).as("approx_p50"),
        element_at($"approx", 2).as("approx_p95"),
        $"exact_p50", $"exact_p95")
      .orderBy($"o_orderstatus")
  }

  /** B20's ORACLE-CHECKED driver projection (the B13 move): the
    * sketch's guarantee is RANK error ≤ 1/accuracy, so the check lives
    * in rank space — counts of values strictly-below / at-or-below the
    * returned element, bounded by (q ± δ)·n with δ = 0.001 (10× the
    * accuracy-10000 guarantee). An interpolated value-space envelope
    * would FALSE-FAIL small groups: percentile() interpolates between
    * elements while the sketch returns an actual element. Cost: a
    * second pass over the fact conditioned on the sketch output —
    * certification-query cost, not serving cost (B20 itself stays one
    * pass). Oracle hashes the exact percentiles + literal TRUE. */
  def qApproxPercentilesChecked(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ap = Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)")
          .as("ap"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("exact_p95"))
    val d = 0.001
    Tables.orders(spark, sfDir)
      .select($"o_orderstatus", $"o_totalprice")
      .join(broadcast(ap), Seq("o_orderstatus"))
      .groupBy($"o_orderstatus")
      .agg(first($"n").as("n"),
        first($"exact_p50").as("exact_p50"),
        first($"exact_p95").as("exact_p95"),
        sum(when($"o_totalprice" < element_at($"ap", 1), 1L)
          .otherwise(0L)).as("lt50"),
        sum(when($"o_totalprice" <= element_at($"ap", 1), 1L)
          .otherwise(0L)).as("le50"),
        sum(when($"o_totalprice" < element_at($"ap", 2), 1L)
          .otherwise(0L)).as("lt95"),
        sum(when($"o_totalprice" <= element_at($"ap", 2), 1L)
          .otherwise(0L)).as("le95"))
      .select($"o_orderstatus", $"exact_p50", $"exact_p95",
        ($"lt50" <= (lit(0.5) + d) * $"n" &&
          $"le50" >= (lit(0.5) - d) * $"n" &&
          $"lt95" <= (lit(0.95) + d) * $"n" &&
          $"le95" >= (lit(0.95) - d) * $"n").as("within_bound"))
      .orderBy($"o_orderstatus")
  }

  val qApproxPercentilesCheckedSql: String =
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
      |  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS exact_p95,
      |  TRUE AS within_bound
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- B18
  /** Explicit GROUPING SETS (finer than rollup/cube): status-only,
    * priority-only, and grand-total aggregates in one pass (Catalyst
    * Expand → single shuffle). */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- B19
  /** Correlated scalar subquery: each customer's max order price.
    * Catalyst decorrelates into an aggregate + left outer join. */
  def qScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_ss")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_ss")
    spark.sql(
      """SELECT c_custkey,
        |  COALESCE((SELECT MAX(o.o_totalprice) FROM orders_ss o
        |            WHERE o.o_custkey = c.c_custkey), -1.0) AS max_price
        |FROM customer_ss c
        |ORDER BY c_custkey""".stripMargin)
  }

  val qScalarSubquerySql: String =
    """SELECT c_custkey,
      |  COALESCE((SELECT MAX(o.o_totalprice) FROM orders o
      |            WHERE o.o_custkey = c.c_custkey), -1.0) AS max_price
      |FROM customer c
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- B17
  /** Native pivot: order counts per priority with one column per
    * status. Explicit pivot values keep the plan single-pass (no
    * distinct-values pre-query) — the form that scales. */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy($"o_orderpriority")
  }

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B16
  /** Datetime function coverage: calendar breakdown of the event feed.
    * Engine parity notes: Spark dayofweek is 1=Sunday while DuckDB's is
    * 0=Sunday (oracle adds 1); both hour/day/month/year agree. */
  def qDatetime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .groupBy(
        year($"ts").as("y"), month($"ts").as("m"),
        dayofmonth($"ts").as("d"), dayofweek($"ts").as("dow"),
        hour($"ts").as("h"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"y", $"m", $"d", $"h")
  }

  val qDatetimeSql: String =
    """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS d, CAST(dayofweek(ts) + 1 AS INT) AS dow,
      |  CAST(hour(ts) AS INT) AS h,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY year(ts), month(ts), day(ts), dayofweek(ts), hour(ts)
      |ORDER BY y, m, d, h""".stripMargin

  // ---------------------------------------------------------------- B15
  /** INTERSECT (distinct): BUILDING-segment customers who also have an
    * open order. Planned as a left-semi join under distinct — no
    * materialized intermediate. */
  def qIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val building = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val open = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "O").select($"o_custkey".as("c_custkey"))
    building.intersect(open).orderBy($"c_custkey")
  }

  val qIntersectSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- B14
  /** B7's semantics through the custom TopKPerKey operator
    * (graft.plans): top-2 orders per customer without a window sort —
    * map-side bounded heaps prune to ≤k rows per key BEFORE the
    * shuffle. Same oracle as the window formulation, minus the rank
    * column. */
  def qTopKCustom(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.plans.TopK.perKey(
      Tables.orders(spark, sfDir).select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc),
      k = 2)
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
  }

  val qTopKCustomSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- B21
  /** Ordered string aggregation (LISTAGG): per return flag, the sorted
    * distinct order priorities of the orders it appears in. collect_set gathers the
    * (tiny per-group) distinct set map-side, array_sort fixes the
    * nondeterministic collection order, array_join emits one flat
    * string — deterministic and hash-stable despite parallel
    * accumulation. The DISTINCT keeps per-group state bounded by
    * cardinality, not row count, so the agg is 100 TB-safe where a raw
    * collect_list would not be. */
  def qStringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        array_join(array_sort(collect_set($"o_orderpriority")), ",").as("priorities"),
        countDistinct($"o_orderpriority").as("n_prios"),
        count(lit(1)).as("n_items"))
      .orderBy($"l_returnflag")
  }

  val qStringAggSql: String =
    """WITH d AS (
      |  SELECT DISTINCT l_returnflag, o_orderpriority
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |c AS (
      |  SELECT l_returnflag, COUNT(*) AS n_items
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_returnflag)
      |SELECT d.l_returnflag,
      |  string_agg(d.o_orderpriority, ',' ORDER BY d.o_orderpriority) AS priorities,
      |  COUNT(*) AS n_prios,
      |  MAX(c.n_items) AS n_items
      |FROM d JOIN c ON d.l_returnflag = c.l_returnflag
      |GROUP BY d.l_returnflag
      |ORDER BY d.l_returnflag""".stripMargin

  // ---------------------------------------------------------------- B22
  /** The skew-salted join as an oracle-verified query: lineitem ⋈
    * orders through [[Scale.saltedJoin]] (8 salts), aggregated per
    * order priority. The salt assignment is invisible to the result —
    * every (left row, matching right row) pair meets exactly once — so
    * the query hash-matches the plain-join SQL while the physical join
    * key space is 8× wider (the planned-case skew defense AQE can't
    * provide for streaming/planned joins). */
  def qSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority")
    Scale.saltedJoin(l, o, Seq("o_orderkey"), salts = 8)
      .groupBy($"o_orderpriority")
      .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  val qSaltedJoinSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B23
  /** The Bloom-prefiltered join as an oracle-verified query: expensive
    * orders (the selective side) build the filter, lineitem rows whose
    * key is definitely absent are dropped BEFORE the join shuffle
    * ([[Scale.bloomPrefilterJoin]]); no false negatives ⇒ the result
    * hash-matches the plain-join SQL. */
  def qBloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    val small = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey", $"o_orderpriority")
    Scale.bloomPrefilterJoin(big, small, "o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  val qBloomJoinSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 400000.0
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B26
  /** Grouped Pearson correlation from DECIMAL-EXACT moment sums.
    * Built-in `corr()` accumulates doubles in partition order —
    * nondeterministic across partitionings and engines — so the five
    * moments (Σx, Σy, Σxy, Σx², Σy²) are summed as exact decimals
    * (order-independent) and the textbook formula runs once per group
    * in double, as the IDENTICAL expression tree DuckDB evaluates:
    * every IEEE op is correctly rounded, so same tree + same inputs =
    * same bits. Columns chosen small (quantity ≤ 50, discount ≤ 0.1)
    * so every moment's significand stays below 2⁵³ and the
    * decimal→double conversions are exact in both engines (§4). One
    * shuffle on the group key, map-side partial sums. */
  def qCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = dec($"l_quantity")
    val y = dec($"l_discount")
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select($"l_returnflag", $"n",
        // greatest(., 0) before each sqrt: double rounding can push a
        // near-constant group's variance a few ulp negative (n*sxx and
        // sx*sx exceed 2^53 at larger SF) — Spark would NaN the row
        // silently while DuckDB's sqrt errors the whole oracle query
        // (the zscoreOutliers clamp, applied to both engines).
        (($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt(greatest($"n" * $"sxx" - $"sx" * $"sx", lit(0.0))) *
            sqrt(greatest($"n" * $"syy" - $"sy" * $"sy", lit(0.0)))))
          .as("corr_qty_disc"))
      .orderBy($"l_returnflag")
  }

  val qCorrSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (n * sxy - sx * sy) /
      |    (sqrt(greatest(n * sxx - sx * sx, 0.0))
      |      * sqrt(greatest(n * syy - sy * sy, 0.0))) AS corr_qty_disc
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- B27
  /** UNPIVOT (wide → long): the B17 pivot's inverse — per-flag decimal
    * sums of three measures melted to (flag, measure, value) rows via
    * the native `unpivot` operator (pure projection+generate over the
    * 3-row agg result, no extra shuffle). The oracle mirrors it as a
    * portable ordered UNION ALL. */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        dsum($"l_discount").as("sum_disc"))
      .unpivot(Array($"l_returnflag"),
        Array($"sum_qty", $"sum_price", $"sum_disc"), "measure", "value")
      .orderBy($"l_returnflag", $"measure")
  }

  val qUnpivotSql: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, measure, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_price', sum_price FROM a
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_disc', sum_disc FROM a)
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---------------------------------------------------------------- B28
  /** CUBE: all four grouping combinations of (status, priority) in one
    * pass — Catalyst's Expand emits each input row once per grouping
    * set BEFORE the exchange, so partial aggregation still combines
    * map-side and the single shuffle moves only group subtotals (the
    * rollup/grouping-sets family completed: B8 ROLLUP, B18 explicit
    * sets, B28 the full lattice). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Subtotal rows are labeled via grouping(), NOT by coalescing the
    // key to 'ALL': a genuine NULL key value would be indistinguishable
    // from its own subtotal row under COALESCE (two rows, identical
    // displayed keys). grouping() = 1 exactly on the aggregated-away
    // dimension, so a NULL data value stays NULL and the lattice rows
    // stay unambiguous. Harmless on TPC-H (no NULLs) but the operator
    // is generic.
    Tables.orders(spark, sfDir)
      .cube($"o_orderstatus", $"o_orderpriority")
      // grouping() must be evaluated inside the aggregate (it reads the
      // grouping-set id, which only exists at the Aggregate node)
      .agg(grouping($"o_orderstatus").as("g_s"),
        grouping($"o_orderpriority").as("g_p"),
        count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .select(
        when($"g_s" === 1, lit("ALL")).otherwise($"o_orderstatus").as("status"),
        when($"g_p" === 1, lit("ALL")).otherwise($"o_orderpriority").as("priority"),
        $"n_orders", $"sum_price")
      .orderBy($"status", $"priority")
  }

  val qCubeSql: String =
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
      |    ELSE o_orderstatus END AS status,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
      |    ELSE o_orderpriority END AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- B29
  /** Correlated EXISTS with a NON-EQUI predicate: lines that have a
    * LATER-shipping sibling line on the same order. The equi part
    * (same order, different line) keys the join; the inequality rides
    * as a residual filter on the matched pair — so Catalyst plans a
    * plain left-semi hash join on l_orderkey, never a cartesian. The
    * per-flag counts keep the output tiny while the semi join itself
    * runs at full scale (self-join shuffles both sides on the order
    * key — the standard shape; each side is the pruned 4-column
    * projection, not the whole table). */
  def qExistsCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_returnflag")
    l.as("a").join(l.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_linenumber" =!= $"b.l_linenumber" &&
          $"b.l_shipdate" > $"a.l_shipdate",
        "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_with_later_sibling"))
      .orderBy($"l_returnflag")
  }

  // SEMI JOIN spelling, not WHERE EXISTS: DuckDB 1.0 miscompiles the
  // correlated EXISTS with this equality + <> + > predicate mix
  // (returns 57 rows where its own SEMI JOIN — and Spark, and a
  // hand-check of any multi-line order — return 43k; probed round 7).
  // The two are the same relational operator; Spark's side IS the
  // EXISTS shape, planned as the identical left-semi hash join.
  val qExistsCorrSql: String =
    """SELECT a.l_returnflag, COUNT(*) AS n_with_later_sibling
      |FROM lineitem a
      |SEMI JOIN lineitem b
      |  ON b.l_orderkey = a.l_orderkey
      |  AND b.l_linenumber <> a.l_linenumber
      |  AND b.l_shipdate > a.l_shipdate
      |GROUP BY a.l_returnflag
      |ORDER BY a.l_returnflag""".stripMargin

  // ---------------------------------------------------------------- B30
  /** RANGE-frame window: per-supplier trailing-7-day shipped quantity.
    * Daily decimal sums FIRST (one shuffle, bounded by supplier×days),
    * then a RANGE BETWEEN 6 PRECEDING frame over the day number — the
    * frame is value-based, so gap days (no shipment) still bound the
    * trailing week correctly where a ROWS frame (A21's shape) would
    * reach back past them. Suppliers capped to keep the dump small;
    * the window itself runs per-partition after one exchange. */
  def qWindowRange(spark: SparkSession, sfDir: String,
      maxSupp: Long = 20): DataFrame = {
    import spark.implicits._
    val daily = Tables.lineitem(spark, sfDir)
      .filter($"l_suppkey" <= maxSupp)
      .groupBy($"l_suppkey",
        // the regenerated files carry TIMESTAMP_NTZ; under the UTC
        // session zone the cast is the identity on the instant
        expr("CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 AS BIGINT)")
          .as("day"))
      .agg(sum(dec($"l_quantity")).as("qty"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"day")
      .rangeBetween(-6, 0)
    daily
      .withColumn("qty7", sum($"qty").over(w).cast("double"))
      .select($"l_suppkey", $"day", $"qty".cast("double").as("qty"), $"qty7")
      .orderBy($"l_suppkey", $"day")
  }

  val qWindowRangeSql: String =
    """WITH d AS (
      |  SELECT l_suppkey, epoch_us(l_shipdate) // 86400000000 AS day,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      |  FROM lineitem WHERE l_suppkey <= 20
      |  GROUP BY 1, 2)
      |SELECT l_suppkey, day, CAST(qty AS DOUBLE) AS qty,
      |  CAST(SUM(qty) OVER (
      |    PARTITION BY l_suppkey ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty7
      |FROM d ORDER BY l_suppkey, day""".stripMargin

  // ---------------------------------------------------------------- B31
  /** Conversion FUNNEL over the event stream: signup → first click
    * within 12 h → first purchase within 48 h of that click, per user —
    * the ordered-sequence product-analytics staple. Each stage is a
    * filtered aggregate on the 3-column pruned events projection joined
    * to the previous stage's tiny per-user frame (the event scan runs
    * once per stage; every join and aggregate keys on user_id, so
    * AQE/exchange reuse co-locates them and the per-user frames shrink
    * monotonically down the funnel). LEFT joins re-attach the partial
    * converters so the output carries every signup with its furthest
    * stage — the drop-off IS the result. */
  def qFunnel(spark: SparkSession, sfDir: String,
      step1Us: Long = 43200000000L, step2Us: Long = 172800000000L): DataFrame =
    qFunnelOf(Tables.events(spark, sfDir), step1Us, step2Us)

  /** B31 over an arbitrary events frame (spec entry — plant conversion
    * paths): needs (user_id, ts, event_type). */
  def qFunnelOf(events: DataFrame, step1Us: Long, step2Us: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(step1Us > 0 && step2Us > 0, "funnel step horizons must be positive")
    val e = events
      .select($"user_id", expr("unix_micros(ts)").as("us"), $"event_type")
    val s = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"us").as("signup_us"))
    val c = e.filter($"event_type" === "click").join(s, "user_id")
      .filter($"us" > $"signup_us" && $"us" <= $"signup_us" + step1Us)
      .groupBy($"user_id").agg(min($"us").as("click_us"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"us" > $"click_us" && $"us" <= $"click_us" + step2Us)
      .groupBy($"user_id").agg(min($"us").as("purchase_us"))
    s.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id", $"signup_us", $"click_us", $"purchase_us",
        when($"purchase_us".isNotNull, lit(3))
          .when($"click_us".isNotNull, lit(2))
          .otherwise(lit(1)).as("stage"))
      .orderBy($"user_id")
  }

  def qFunnelSql(step1Us: Long = 43200000000L,
      step2Us: Long = 172800000000L): String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
       |s AS (
       |  SELECT user_id, min(us) AS signup_us FROM e
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |c AS (
       |  SELECT e.user_id, min(e.us) AS click_us
       |  FROM e JOIN s ON e.user_id = s.user_id
       |  WHERE e.event_type = 'click' AND e.us > s.signup_us
       |    AND e.us <= s.signup_us + $step1Us
       |  GROUP BY e.user_id),
       |p AS (
       |  SELECT e.user_id, min(e.us) AS purchase_us
       |  FROM e JOIN c ON e.user_id = c.user_id
       |  WHERE e.event_type = 'purchase' AND e.us > c.click_us
       |    AND e.us <= c.click_us + $step2Us
       |  GROUP BY e.user_id)
       |SELECT s.user_id, s.signup_us, c.click_us, p.purchase_us,
       |  CAST(CASE WHEN p.purchase_us IS NOT NULL THEN 3
       |    WHEN c.click_us IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
       |FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
       |ORDER BY s.user_id""".stripMargin

  // ---------------------------------------------------------------- B32
  /** RETENTION COHORT triangle: users cohorted by their first-purchase
    * week, activity = distinct purchase weeks — (cohort, week offset,
    * active users, cohort size, retention ratio). Weeks are integer
    * epoch-microsecond division (no calendar functions — engine-
    * neutral by construction, no ISO-week/locale trap). Shapes: one
    * pruned scan → per-user first week (map-side partial agg) +
    * distinct (user, week), joined on user_id, then the triangle
    * aggregate over the tiny (cohort, offset) key space; cohort sizes
    * come from the triangle's own offset-0 rows (broadcast back — no
    * second pass). */
  def qRetentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val weeks = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts) div 604800000000").as("w"))
    val firstW = weeks.groupBy($"user_id").agg(min($"w").as("cohort_w"))
    val tri = weeks.distinct()
      .join(firstW, "user_id")
      .groupBy($"cohort_w", ($"w" - $"cohort_w").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // cohort size = the cohort's own offset-0 row, read via a window
    // over the tiny triangle (every cohort HAS offset 0 — a user's
    // first week is offset 0 by definition) — one exchange on
    // cohort_w instead of recomputing the triangle subtree for a
    // second sizes branch
    val wS = Window.partitionBy($"cohort_w")
    tri
      .withColumn("cohort_size",
        sum(when($"week_offset" === 0, $"n_active")).over(wS))
      .select(($"cohort_w" * 604800000000L).as("cohort_week_us"),
        $"week_offset", $"n_active", $"cohort_size",
        ($"n_active".cast("double") / $"cohort_size").as("retention"))
      .orderBy($"cohort_week_us", $"week_offset")
  }

  val qRetentionCohortsSql: String =
    """WITH weeks AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS w
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (SELECT user_id, min(w) AS cohort_w FROM weeks GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, w FROM weeks),
      |tri AS (
      |  SELECT cohort_w, w - cohort_w AS week_offset, COUNT(*) AS n_active
      |  FROM a JOIN f USING (user_id)
      |  GROUP BY cohort_w, w - cohort_w),
      |sized AS (
      |  SELECT *, CAST(SUM(CASE WHEN week_offset = 0 THEN n_active END)
      |    OVER (PARTITION BY cohort_w) AS BIGINT) AS cohort_size
      |  FROM tri)
      |SELECT cohort_w * 604800000000 AS cohort_week_us,
      |  week_offset, n_active, cohort_size,
      |  CAST(n_active AS DOUBLE) / cohort_size AS retention
      |FROM sized
      |ORDER BY cohort_week_us, week_offset""".stripMargin

  // ---------------------------------------------------------------- B13
  /** HLL approximate distinct count — the 100-TB-scale path of B10
    * (fixed-size sketch, no exact distinct shuffle). No SQL oracle
    * (sketch internals are engine-specific); spec asserts <5% error
    * vs the exact count. */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .orderBy($"l_returnflag")
  }

  /** B13's ORACLE-CHECKED driver projection (the r15 approx-upgrade
    * move): the sketch estimate is engine-internal and cannot hash
    * against DuckDB, but the BOUND CHECK can — the driver row carries
    * the exact side plus `within_bound` (relative error ≤ 0.05, 2.5×
    * the sketch's 2% rsd) and the oracle emits literal TRUE, so a
    * sketch regression past its bound is a HASH MISMATCH, not a
    * silent drift. Deterministic: HLL register merge is
    * order-insensitive, so the boolean is a function of the corpus
    * alone. */
  def qApproxDistinctChecked(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx" - $"exact_parts").cast("double") / $"exact_parts"
          <= 0.05).as("within_bound"))
      .orderBy($"l_returnflag")
  }

  val qApproxDistinctCheckedSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- B33
  /** Rolling 7-day distinct active users per day (DAU + trailing WAU) —
    * the engagement dashboard staple. COUNT(DISTINCT) over a RANGE
    * window frame exists in no engine, and the naive per-day
    * re-aggregation scans the trailing week once PER DAY; the scalable
    * shape is CONTRIBUTION EXPLODE: dedupe to per-user active DAYS
    * first (the only full-data shuffle — and the explode runs on this
    * already-tiny frame, not on raw events), then a user active on day
    * d is live in windows d..d+6, so each (user, day) row fans out to
    * its ≤7 window days and the rolling distinct becomes a plain
    * distinct count per window day. Window days past the corpus
    * horizon are cut by a 1-row broadcast of max(day) (no partial
    * trailing windows fabricated from the right edge). At 100 TB the
    * fan-out is 7× the DEDUPED user-day frame — several orders below
    * the event count — and every stage keys on (user, day): no
    * driver-side loop over days, no quadratic re-scan. */
  def qRollingDau(spark: SparkSession, sfDir: String): DataFrame =
    qRollingDauOf(Tables.events(spark, sfDir))

  /** B33 over an arbitrary events frame: needs (user_id, ts). */
  def qRollingDauOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ud = events
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val maxDay = ud.agg(max($"day").as("max_day"))
    // projected sequence + explode of the attribute (the Generate
    // codegen rule); the +i window-day arithmetic stays per-row
    val contrib = ud
      .withColumn("offs", sequence(lit(0L), lit(6L)))
      .select($"user_id", $"day", explode($"offs").as("i"))
      .select($"user_id", ($"day" + $"i").as("day7"))
      .join(broadcast(maxDay), $"day7" <= $"max_day")
      .select($"user_id", $"day7").distinct()
    val wau = contrib.groupBy($"day7".as("day")).agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("day"), "left")
      .select($"day", coalesce($"dau", lit(0L)).as("dau"), $"wau")
      .orderBy($"day")
  }

  val qRollingDauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |c AS (
      |  SELECT DISTINCT user_id, day + i AS day
      |  FROM ud CROSS JOIN range(7) t(i)
      |  WHERE day + i <= (SELECT max(day) FROM ud)),
      |wau AS (SELECT day, COUNT(*) AS wau FROM c GROUP BY day),
      |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
      |SELECT w.day, COALESCE(d.dau, 0) AS dau, w.wau
      |FROM wau w LEFT JOIN dau d USING (day)
      |ORDER BY w.day""".stripMargin

  // ---------------------------------------------------------------- B34
  /** Top session PATHS: sessionize the event stream (A6's 30-min-gap
    * kernel), take each session's first 8 event types in time order,
    * and count sessions per path string — the product-analytics "how
    * do users actually move" query. One exchange on user_id carries
    * the lag window, the running session-id sum, the per-session
    * row_number (hash on user_id satisfies the (user, session)
    * clustering — a subset partitioning co-locates the finer key, so
    * no second exchange), AND the per-session collect; the rn ≤ cap
    * filter runs BEFORE the collect, so no state ever exceeds maxLen
    * structs per session regardless of session length. The path
    * aggregation shuffles the tiny (path, 1) frame; deterministic
    * top-20 by (count desc, path). */
  def qEventPaths(spark: SparkSession, sfDir: String,
      maxLen: Int = 8, topK: Int = 20): DataFrame =
    qEventPathsOf(Tables.events(spark, sfDir), maxLen, topK)

  /** B34 over an arbitrary events frame: needs
    * (user_id, event_id, ts, event_type). */
  def qEventPathsOf(events: DataFrame, maxLen: Int = 8,
      topK: Int = 20): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(maxLen > 0 && topK > 0, "path length and top-k must be positive")
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val paths = events
      .select($"user_id", $"event_id", expr("unix_micros(ts)").as("us"),
        $"event_type")
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_s",
        when($"prev_us".isNull || $"us" - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"session_id").orderBy($"us", $"event_id")))
      .filter($"rn" <= maxLen)
      .groupBy($"user_id", $"session_id")
      // struct sort order = (us, event_id, event_type) lexicographic —
      // event_id breaks timestamp ties deterministically on both engines
      .agg(array_sort(collect_list(struct($"us", $"event_id", $"event_type")))
        .as("evs"))
      .select(array_join(
        transform(slice($"evs", 1, maxLen), e => e("event_type")), ">")
        .as("path"))
    paths.groupBy($"path").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(topK)
  }

  // ---------------------------------------------------------------- B39
  /** Activity HEATMAP — hour-of-day × event-type grid (counts + exact
    * value sums): the operational dashboard's background texture and
    * the visual twin of A34's seasonal baseline. One scan, one
    * exchange on the ≤ 24 × |types| key space, map-side partials do
    * nearly all the work — the canonical "tiny-key rollup over a huge
    * stream" shape that stays this cheap at any corpus size. */
  def qHeatmap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        $"event_type")
      .agg(count(lit(1)).as("n_events"),
        dsum(coalesce($"value", lit(0.0))).as("sum_value"))
      .orderBy($"hod", $"event_type")
  }

  val qHeatmapSql: String =
    """SELECT (epoch_us(ts) // 3600000000) % 24 AS hod, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(18,4))) AS DOUBLE)
      |    AS sum_value
      |FROM events
      |GROUP BY (epoch_us(ts) // 3600000000) % 24, event_type
      |ORDER BY hod, event_type""".stripMargin

  // ---------------------------------------------------------------- B38
  /** TOP MOVERS — period-over-period revenue shift per part (the
    * "what changed since last year" dashboard): one scan, both
    * periods' revenues as conditional DECIMAL sums in a single
    * aggregate (no self-join, no pivot), percent change in double off
    * the exact sums — the identical IEEE division in both engines.
    * Parts below a base-revenue floor are cut (a tiny base makes any
    * change an "infinite mover"); deterministic top-20 by (|pct|
    * desc, part). One exchange on the part key, map-side partials. */
  def qTopMovers(spark: SparkSession, sfDir: String,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    require(topK > 0, "topK must be positive")
    val y1996 = ($"l_shipdate" >= lit("1996-01-01").cast("timestamp")) &&
      ($"l_shipdate" < lit("1997-01-01").cast("timestamp"))
    val y1997 = ($"l_shipdate" >= lit("1997-01-01").cast("timestamp")) &&
      ($"l_shipdate" < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(spark, sfDir)
      .filter(y1996 || y1997)
      .groupBy($"l_partkey")
      .agg(
        sum(when(y1996, dec($"l_extendedprice"))).cast("decimal(38,4)")
          .cast("double").as("rev_prev"),
        sum(when(y1997, dec($"l_extendedprice"))).cast("decimal(38,4)")
          .cast("double").as("rev_curr"))
      .filter($"rev_prev" >= 10000.0 && $"rev_curr".isNotNull)
      .withColumn("pct_change",
        ($"rev_curr" - $"rev_prev") / $"rev_prev" * 100.0)
      .select($"l_partkey", $"rev_prev", $"rev_curr", $"pct_change")
      .orderBy(abs($"pct_change").desc, $"l_partkey")
      .limit(topK)
  }

  val qTopMoversSql: String =
    """WITH m AS (
      |  SELECT l_partkey,
      |    CAST(CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DECIMAL(38,4))
      |      AS DOUBLE) AS rev_prev,
      |    CAST(CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DECIMAL(38,4))
      |      AS DOUBLE) AS rev_curr
      |  FROM lineitem
      |  WHERE (l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
      |     OR (l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      |  GROUP BY l_partkey)
      |SELECT l_partkey, rev_prev, rev_curr,
      |  (rev_curr - rev_prev) / rev_prev * 100.0 AS pct_change
      |FROM m
      |WHERE rev_prev >= 10000.0 AND rev_curr IS NOT NULL
      |ORDER BY abs(pct_change) DESC, l_partkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- B36
  /** B33's SCALE PATH: rolling 7-day distinct users from MERGEABLE HLL
    * sketches (Spark's DataSketches aggregates) — one sketch per day
    * (the only full-data pass), then each window day UNIONS its ≤7
    * trailing daily sketches. The contribution explode moves from
    * per-user rows (B33: 7 × the deduped user-day frame) to per-DAY
    * sketches (7 × #days × a few KB) — at 100 TB the rolling distinct
    * costs one aggregation pass plus sketch-merge noise, and the same
    * shape extends to 30/90-day windows where exact explode bloats
    * linearly. The exact B33 count rides alongside (the B13
    * convention) so approximation error is a driver-visible number;
    * rows-only — sketch internals are engine-specific. */
  def qRollingDauApprox(spark: SparkSession, sfDir: String): DataFrame =
    qRollingDauApproxOf(Tables.events(spark, sfDir))

  /** B36 over an arbitrary events frame: needs (user_id, ts). */
  def qRollingDauApproxOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ud = events
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
    val daily = ud.groupBy($"day")
      .agg(hll_sketch_agg($"user_id", 12).as("sk"))
    val maxDay = daily.agg(max($"day").as("max_day"))
    val contrib = daily
      .withColumn("offs", sequence(lit(0L), lit(6L)))
      .select($"day", $"sk", explode($"offs").as("i"))
      .select(($"day" + $"i").as("day"), $"sk")
      .join(broadcast(maxDay), $"day" <= $"max_day")
    val approx = contrib.groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", true))
        .as("wau_approx"))
    val exact = qRollingDauOf(events).select($"day", $"wau".as("wau_exact"))
    approx.join(exact, Seq("day"))
      .select($"day", $"wau_exact", $"wau_approx")
      .orderBy($"day")
  }

  /** B36's ORACLE-CHECKED driver projection (the B13 move): exact WAU
    * + `within_bound` (relative error ≤ 0.05 — lgConfigK=12 gives rsd
    * ≈ 1.6%, so 3× slack), oracle emits the B33 exact rollup + literal
    * TRUE. Deterministic: HLL unions are order-insensitive. */
  def qRollingDauApproxChecked(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    qRollingDauApprox(spark, sfDir)
      .select($"day", $"wau_exact",
        (abs($"wau_approx" - $"wau_exact").cast("double") / $"wau_exact"
          <= 0.05).as("within_bound"))
      .orderBy($"day")
  }

  val qRollingDauApproxCheckedSql: String =
    """SELECT day, wau AS wau_exact, TRUE AS within_bound
      |FROM (%B33%) t ORDER BY day""".stripMargin
      .replace("%B33%", qRollingDauSql)

  // ---------------------------------------------------------------- B37
  /** CO-PURCHASE affinity (market-basket lift): part pairs appearing
    * in the same order, with support and lift — the "frequently bought
    * together" query. Pairs come from a self-join keyed on the ORDER
    * (both sides the deduped 2-column projection), so the blow-up per
    * order is C(lines, 2) — bounded by basket size, not corpus size;
    * per-part order counts join back as two broadcast-size dims. Lift
    * = N·supp / (df_a·df_b) is pure integer-derived arithmetic (every
    * product < 2⁵³ → the double division is exact and identical in
    * both engines). Deterministic top-20 by (support desc, pair). */
  def qCopurchase(spark: SparkSession, sfDir: String,
      topK: Int = 20): DataFrame =
    qCopurchaseOf(Tables.lineitem(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey")), topK)

  /** Hot-basket ceiling for [[qCopurchaseOf]]: a basket larger than
    * this is deterministically SUBSAMPLED to this many parts before
    * pair generation. Rationale: pair fan-out is row-local C(k, 2) —
    * on order-shaped baskets (TPC-H ~7 lines) that is the right plan,
    * but the operator is generic over any (order, part) frame, and one
    * pathological 100k-item "basket" (a bot, a default key) would
    * materialize ~5×10⁹ structs inside a single row's flatten — a
    * task-killer NO AQE skew handling can split because it never
    * reaches a shuffle. 4096 caps the worst row at ~8.4M pairs.
    * BIAS STATEMENT: pairs involving a subsampled-away part of a
    * mega-basket lose that basket's support contribution (df keeps
    * only the surviving parts too, so support ≤ df stays invariant);
    * baskets at or under the cap are untouched, so ordinary corpora —
    * including the driver query's TPC-H orders — are bit-identical
    * with the cap in place. */
  val MaxBasketParts: Int = 4096

  /** B37 over an arbitrary (l_orderkey, l_partkey) frame (spec entry —
    * plant baskets with known support/lift). */
  def qCopurchaseOf(lines: DataFrame, topK: Int = 20,
      maxBasket: Int = MaxBasketParts): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    require(topK > 0, "topK must be positive")
    require(maxBasket >= 2, s"maxBasket $maxBasket must be >= 2")
    // One exchange on the order key builds each order's BASKET
    // (collect_set dedupes in-aggregate — no separate distinct pass),
    // and pair generation is ROW-LOCAL over the sorted basket: the
    // first cut of this query self-joined the deduped (order, part)
    // frame on the order key, which shuffled ~1.5× the corpus and
    // aggregated ~6 pair rows per order through a second exchange —
    // measured 1.85 s isolated at sf0.1; the basket shape re-uses the
    // one grouped subtree for all three consumers (pairs, per-part df,
    // order count) and was measured at a third of that. Basket size
    // bounds the C(k, 2) fan-out, same as the join formulation.
    // not pinned: a localCheckpoint of the baskets was measured at no
    // gain — ReuseExchange already shares the one shuffle, and the
    // runtime is dominated by the pair aggregation (~6 near-unique
    // pair rows per order through the second exchange), which every
    // exact formulation pays
    val baskets = lines.select($"l_orderkey", $"l_partkey")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"l_partkey")).as("ps"))
      // hot-basket cap (see [[MaxBasketParts]]): oversize baskets keep
      // a deterministic pseudorandom subset — rank parts by
      // xxhash64(orderkey, part) and cut, the trainSample/C25 pattern
      // made row-local (the hash seeds on the basket key, so the
      // surviving subset is stable across partition layouts and
      // decorrelated from part-id order); the collect_set buffer
      // itself is only O(basket) longs, never O(basket²)
      .withColumn("ps",
        when(size($"ps") <= maxBasket, $"ps").otherwise(expr(
          s"""array_sort(transform(slice(array_sort(transform(ps,
             |  p -> named_struct('h', xxhash64(l_orderkey, p), 'p', p))),
             |  1, $maxBasket), s -> s.p))""".stripMargin)))
    val n = baskets.agg(count(lit(1)).as("n_orders"))
    val df = baskets
      .select(explode($"ps").as("part"))
      .groupBy($"part").agg(count(lit(1)).as("df"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> named_struct('a', x, 'b', y))))""".stripMargin)).as("p"))
      .groupBy($"p.a".as("part_a"), $"p.b".as("part_b"))
      .agg(count(lit(1)).as("support"))
    pairs
      .join(df.select($"part".as("part_a"), $"df".as("df_a")), "part_a")
      .join(df.select($"part".as("part_b"), $"df".as("df_b")), "part_b")
      .crossJoin(broadcast(n))
      .select($"part_a", $"part_b", $"support", $"df_a", $"df_b",
        (($"n_orders" * $"support").cast("double") /
          ($"df_a" * $"df_b")).as("lift"))
      .orderBy($"support".desc, $"part_a", $"part_b")
      .limit(topK)
  }

  val qCopurchaseSql: String =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
      |df AS (SELECT l_partkey, COUNT(*) AS df FROM op GROUP BY l_partkey),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |    COUNT(*) AS support
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY a.l_partkey, b.l_partkey)
      |SELECT part_a, part_b, support, da.df AS df_a, db.df AS df_b,
      |  CAST(n.n_orders * support AS DOUBLE) / (da.df * db.df) AS lift
      |FROM pairs
      |JOIN df da ON da.l_partkey = part_a
      |JOIN df db ON db.l_partkey = part_b
      |CROSS JOIN n
      |ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- B35
  /** Table PROFILE (DuckDB's SUMMARIZE, Deequ's column profiler): one
    * row per column of `orders` with count / null count / exact
    * distinct / typed min-max — the data-quality snapshot every
    * pipeline runs before trusting an input. ONE AGGREGATE PER COLUMN,
    * unioned: packing all six exact distincts into a single Aggregate
    * plans as an Expand that replicates every row once per distinct
    * set (measured 4.2 s — the round-8 worst slot); the union shape
    * gives each column its own partial-distinct aggregation over a
    * scan pruned to THAT column (parquet is columnar — six one-column
    * scans read the same bytes one fat scan reads), the branches run
    * as independent parallel jobs, and no row is ever replicated.
    * Numeric and string min/max ride separate typed columns (a
    * string-typed union of heterogeneous min/max would hash on
    * engine-specific formatting); timestamps profile as epoch micros.
    * Exact distinct per column is the one scale-expensive stat — at
    * 100 TB swap in approx_count_distinct per B13; here the gate
    * wants the exact number. */
  def qProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      // regenerated parquet carries TIMESTAMP_NTZ; under the UTC session
      // zone the cast is the identity on the instant (the B30 note)
      .withColumn("o_odate_us",
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))
    profileOf(o, Seq("o_orderkey", "o_custkey", "o_totalprice", "o_odate_us"),
      Seq("o_orderstatus", "o_orderpriority"))
      .orderBy($"col_name")
  }

  /** The profile kernel behind [[qProfile]] and [[profileStream]] —
    * one row per column over an arbitrary frame. */
  private[operators] def profileOf(df: DataFrame, numeric: Seq[String],
      strings: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def branch(c: String, isNum: Boolean): DataFrame = {
      val mm =
        if (isNum)
          Seq(min(col(c)).cast("double").as("min_num"),
            max(col(c)).cast("double").as("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"))
        else
          Seq(lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            min(col(c)).as("min_str"), max(col(c)).as("max_str"))
      df.select(col(c)).agg(
        count(col(c)).as("n"),
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct")) ++ mm: _*)
        .select(lit(c).as("col_name"), $"n", $"n_nulls", $"n_distinct",
          $"min_num", $"max_num", $"min_str", $"max_str")
    }
    (numeric.map(branch(_, isNum = true)) ++
      strings.map(branch(_, isNum = false)))
      .reduce(_ unionByName _)
  }

  /** STREAMING data-quality profile — B35's ingest twin and the
    * B family's first streaming member (the Deequ-monitor shape):
    * every micro-batch is profiled per column (the B35 kernel), and
    * when a REFERENCE profile is supplied (a previous trusted batch
    * run — the A35 stream-static pattern), each column carries drift
    * flags: a null-fraction jump beyond `nullTol`, or numeric values
    * outside the reference [min, max] envelope. Schema drift at
    * ingest is how silent upstream changes (a renamed field, a unit
    * change, a suddenly-null column) get caught BEFORE they poison a
    * snapshot — B35 can only report after the fact. Per-batch
    * whole-trigger analytics via foreachBatch (the D9/E18 reasoning);
    * the reference joins as a broadcast of one row per column. */
  def profileStream(stream: DataFrame, numeric: Seq[String],
      strings: Seq[String], reference: Option[DataFrame] = None,
      nullTol: Double = 0.05)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(nullTol >= 0, s"nullTol $nullTol must be >= 0")
    val ref = reference.map(_.select(col("col_name"),
      (col("n_nulls").cast("double") /
        nullif(col("n") + col("n_nulls"), lit(0L))).as("ref_null_frac"),
      col("min_num").as("ref_min"), col("max_num").as("ref_max"))
      .localCheckpoint(true))
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val p = profileOf(batch, numeric, strings)
        .withColumn("null_frac", col("n_nulls").cast("double") /
          nullif(col("n") + col("n_nulls"), lit(0L)))
      val out = ref match {
        case None => p.withColumn("null_drift", lit(false))
          .withColumn("range_drift", lit(false))
        case Some(r) => p.join(broadcast(r), Seq("col_name"), "left")
          .withColumn("null_drift",
            coalesce(col("null_frac"), lit(0.0)) >
              coalesce(col("ref_null_frac"), lit(0.0)) + nullTol)
          .withColumn("range_drift",
            coalesce(col("ref_min").isNotNull &&
              (col("min_num") < col("ref_min") ||
                col("max_num") > col("ref_max")), lit(false)))
          .drop("ref_null_frac", "ref_min", "ref_max")
      }
      sink(out.withColumn("batch_id", lit(batchId)), batchId)
    }
  }

  val qProfileSql: String = {
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strings = Seq("o_orderstatus", "o_orderpriority")
    def one(c: String, valueExpr: String, isNum: Boolean): String = {
      val (minn, maxn, mins, maxs) =
        if (isNum) (s"CAST(MIN($valueExpr) AS DOUBLE)",
          s"CAST(MAX($valueExpr) AS DOUBLE)", "NULL::VARCHAR", "NULL::VARCHAR")
        else ("NULL::DOUBLE", "NULL::DOUBLE", s"MIN($valueExpr)", s"MAX($valueExpr)")
      s"""SELECT '$c' AS col_name, COUNT($valueExpr) AS n,
         |  CAST(SUM(CASE WHEN $valueExpr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  COUNT(DISTINCT $valueExpr) AS n_distinct,
         |  $minn AS min_num, $maxn AS max_num,
         |  $mins AS min_str, $maxs AS max_str
         |FROM orders""".stripMargin
    }
    (numeric.map(c => one(c, c, isNum = true)) ++
      Seq(one("o_odate_us", "epoch_us(o_orderdate)", isNum = true)) ++
      strings.map(c => one(c, c, isNum = false)))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val qEventPathsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN LAG(us) OVER w IS NULL
      |                   OR us - LAG(us) OVER w > 1800000000
      |            THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM f),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |                               ORDER BY us, event_id) AS rn
      |  FROM s),
      |p AS (
      |  SELECT user_id, session_id,
      |    STRING_AGG(event_type, '>' ORDER BY us, event_id) AS path
      |  FROM r WHERE rn <= 8 GROUP BY user_id, session_id)
      |SELECT path, COUNT(*) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- B41
  /** JOIN-SKEW report — the evidence table behind every "should I salt
    * this key" decision (B22 ships the salted join; THIS is how an
    * operator finds out it is needed before a 100 TB shuffle hangs on
    * one straggler task): top keys of a join column by row share, each
    * flagged hot when its rows exceed `hotFactor` fair task shares
    * (share · partitions > factor — the key that makes one task do
    * `factor`× the average work). One map-side-partial exchange on the
    * key + a bounded top-k; the total rides the same aggregate via a
    * window-free broadcast of the 1-row sum. Share is an integer
    * ratio rounded at 6 — hash-stable. */
  def qSkewReport(spark: SparkSession, sfDir: String, topK: Int = 20,
      partitions: Int = 32, hotFactor: Double = 4.0): DataFrame = {
    import spark.implicits._
    require(topK >= 1 && partitions >= 1 && hotFactor > 0)
    val counts = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum($"n").as("total"))
    counts.crossJoin(broadcast(total))
      .orderBy($"n".desc, $"user_id").limit(topK)
      .select($"user_id", $"n", $"total",
        round($"n".cast("double") / $"total".cast("double"), 6).as("share"),
        (($"n".cast("double") / $"total".cast("double")) * partitions >
          hotFactor).as("hot"))
      .orderBy($"n".desc, $"user_id")
  }

  def qSkewReportSql(topK: Int = 20, partitions: Int = 32,
      hotFactor: Double = 4.0): String =
    s"""WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
       |SELECT user_id, n, total,
       |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       |  (CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) * $partitions
       |    > $hotFactor AS hot
       |FROM c, t
       |ORDER BY n DESC, user_id LIMIT $topK""".stripMargin

  // ---------------------------------------------------------------- B42
  /** TPC-H Q10-style RETURNED-ITEM revenue per customer: who cost us
    * the most in returns — lineitem filtered to `l_returnflag = 'R'`
    * BEFORE any join (the predicate prunes the fact scan, .explain
    * shows it in PushedFilters), then orders → customer shuffled on
    * their keys, nation broadcast, one aggregate, deterministic
    * top-20. Revenue through the B1/B2 decimal product-sum
    * discipline. */
  def qReturnedCustomers(spark: SparkSession, sfDir: String,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir).filter($"l_returnflag" === "R")
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(productSum(dec($"l_extendedprice") *
          (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(topK)
  }

  val qReturnedCustomersSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem, orders, customer, nation
      |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- B43
  /** TPC-H Q7-style NATION TRADE flows: cross-border revenue (supplier
    * nation ≠ customer nation) by ship year — the bilateral-volume
    * rollup. Join shape: lineitem shuffles once on the order key and
    * once on the supplier key; BOTH nation sides broadcast (self-join
    * of a tiny dim under two aliases); the cross-border filter runs on
    * broadcast-local columns, never an exchange. Output is
    * nations² × years — dashboard-sized however large the fact. */
  def qNationTrade(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n1 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
    l.join(s, $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"sn_key")
      .join(broadcast(n2), $"c_nationkey" === $"cn_key")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(productSum(dec($"l_extendedprice") *
          (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
        .as("volume"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  // ---------------------------------------------------------------- B44
  /** VALUE TIERS — NTILE / PERCENT_RANK / CUME_DIST per market
    * segment, the customer-worth decile report. The SCALE point: all
    * three are rank-derived, and a naive `NTILE(10) OVER (PARTITION BY
    * segment ORDER BY …)` sorts each segment in ONE task — a 100 TB
    * segment is a straggler by construction. Here the rank comes from
    * the C18 stratifiedPrefixSum machinery (parallel bucketed rank per
    * segment) and NTILE's exact remainder semantics are re-derived in
    * closed form from (rank, n, tiles): q = n div t, r = n mod t, the
    * first r tiles take q+1 rows — integer arithmetic identical in
    * both engines, and the ORACLE runs DuckDB's NATIVE NTILE /
    * PERCENT_RANK / CUME_DIST to prove the closed form matches the
    * standard semantics exactly. Balances quantize to integer cents
    * for the rank key (2-decimal data → no ties beyond the unique-id
    * tiebreak, both engines rank identically). */
  def qValueTiers(spark: SparkSession, sfDir: String, tiles: Int = 10,
      buckets: Int = 1024): DataFrame = {
    import spark.implicits._
    require(tiles >= 1)
    val c = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        round($"c_acctbal" * 100, 0).cast("long").as("q2"))
    val r = c.agg(max($"q2"), min($"q2"),
      min($"c_custkey"), max($"c_custkey")).head()
    if (r.isNullAt(0))
      return c.select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        lit(0L).as("rank"), lit(0L).as("tier"),
        lit(0.0).as("pct_rank"), lit(0.0).as("cume")).limit(0)
    require(r.getLong(0) - r.getLong(1) < (1L << 22) &&
      r.getLong(2) >= 0 && r.getLong(3) < (1L << 40),
      "qValueTiers key packing needs cent span < 2^22, keys in [0, 2^40)")
    val maxQ = r.getLong(0)
    val keyed = c
      .withColumn("__ord", (lit(maxQ) - $"q2") * lit(1L << 40) + $"c_custkey")
      .withColumn("__one", lit(1L))
    val totals = c.groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    Scale.stratifiedPrefixSum(keyed, "c_mktsegment", "__ord", "__one",
        "rank", buckets)
      .join(broadcast(totals), "c_mktsegment")
      .withColumn("__q", expr(s"n div $tiles"))
      .withColumn("__r", $"n" % tiles)
      .withColumn("__b", $"__r" * ($"__q" + 1L))
      .withColumn("tier",
        when($"rank" <= $"__b", expr("(rank - 1) div (__q + 1) + 1"))
          .otherwise(expr("__r + (rank - __b - 1) div __q + 1")))
      .withColumn("pct_rank",
        when($"n" > 1L,
          round(($"rank" - 1L).cast("double") / ($"n" - 1L), 6))
          .otherwise(lit(0.0)))
      .withColumn("cume", round($"rank".cast("double") / $"n", 6))
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        $"rank", $"tier", $"pct_rank", $"cume")
      .orderBy($"c_mktsegment", $"rank")
  }

  def qValueTiersSql(tiles: Int = 10): String =
    s"""SELECT c_custkey, c_mktsegment, c_acctbal,
       |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
       |  CAST(NTILE($tiles) OVER w AS BIGINT) AS tier,
       |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       |  ROUND(CUME_DIST() OVER w, 6) AS cume
       |FROM customer
       |WINDOW w AS (PARTITION BY c_mktsegment
       |  ORDER BY CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) DESC, c_custkey)
       |ORDER BY c_mktsegment, rank""".stripMargin

  // ---------------------------------------------------------------- B46
  /** TPC-H Q8-style MARKET SHARE: each supplier nation's share of a
    * customer region's yearly revenue — the share-of-group pattern at
    * its classic instance. The share denominator is a SECOND-LEVEL
    * aggregate of the first (region-year totals over nation rows), so
    * the shape is: one fact aggregation to the (region, year, nation)
    * frame, then the totals rollup over THAT (regions × years rows —
    * broadcast back), never a window over fact rows and never a second
    * fact scan. Numerator and denominator both stay DECIMAL(38,4)
    * until the final division (double sums of the per-nation revenues
    * would be order-dependent and break the oracle; decimal sums are
    * exact in any order — the §4 discipline one level up). */
  def qMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n1 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("cn_key"), $"n_regionkey".as("c_region"))
    val r = Tables.region(spark, sfDir)
      .select($"r_regionkey", $"r_name")
    val per = l.join(s, $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"sn_key")
      .join(broadcast(n2), $"c_nationkey" === $"cn_key")
      .join(broadcast(r), $"c_region" === $"r_regionkey")
      .groupBy($"r_name", year($"l_shipdate").as("l_year"), $"supp_nation")
      .agg(sum(dec($"l_extendedprice") *
          (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
        .cast("decimal(38,4)").as("revd"))
    val totals = per.groupBy($"r_name", $"l_year")
      .agg(sum($"revd").cast("decimal(38,4)").as("totd"))
    per.join(broadcast(totals), Seq("r_name", "l_year"))
      .select($"r_name", $"l_year", $"supp_nation",
        $"revd".cast("double").as("revenue"),
        round($"revd".cast("double") / $"totd".cast("double"), 6)
          .as("mkt_share"))
      .orderBy($"r_name", $"l_year", $"supp_nation")
  }

  val qMarketShareSql: String =
    """WITH per AS (
      |  SELECT r_name, CAST(year(l_shipdate) AS INT) AS l_year,
      |    n1.n_name AS supp_nation,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS revd
      |  FROM lineitem, supplier, orders, customer, nation n1, nation n2,
      |    region
      |  WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
      |    AND c_nationkey = n2.n_nationkey
      |    AND n2.n_regionkey = r_regionkey
      |  GROUP BY r_name, year(l_shipdate), n1.n_name),
      |t AS (
      |  SELECT r_name, l_year,
      |    CAST(SUM(revd) AS DECIMAL(38,4)) AS totd
      |  FROM per GROUP BY r_name, l_year)
      |SELECT per.r_name, per.l_year, supp_nation,
      |  CAST(revd AS DOUBLE) AS revenue,
      |  ROUND(CAST(revd AS DOUBLE) / CAST(totd AS DOUBLE), 6) AS mkt_share
      |FROM per JOIN t ON per.r_name = t.r_name AND per.l_year = t.l_year
      |ORDER BY per.r_name, per.l_year, supp_nation""".stripMargin

  val qNationTradeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS volume
      |FROM lineitem, supplier, orders, customer, nation n1, nation n2
      |WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey AND n1.n_name <> n2.n_name
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- B47
  /** TPC-H Q4-style ORDER PRIORITY check: orders placed in one year
    * with slipped fulfilment (any lineitem shipped > 90 days after the
    * order date), counted per priority class. Plan: the year predicate
    * prunes the orders scan BEFORE the join (PushedFilters — at 100 TB
    * with date-partitioned orders this is partition pruning, not a
    * full scan); LEFT SEMI on the order key carries the lateness
    * predicate as an extra join condition so lineitem is projected to
    * two columns and never widened; EXISTS semantics means duplicate
    * late lines per order cost nothing; one 5-row aggregate. */
  def qLateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_shipdate")
    o.join(l, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val qLateOrdersSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B48
  /** TPC-H Q14-style PROMO revenue share per ship month: what fraction
    * of each month's revenue came from promotional part types. Both
    * the promo and total revenue come out of ONE conditional DECIMAL
    * aggregate (no second scan, no self-join); the share is a single
    * IEEE division off the exact sums, rounded to 6 places (identical
    * in both engines — the B46 discipline). Join shape: lineitem
    * shuffles once on the part key; part carries only (key, type).
    * Output is months — dashboard-sized however large the fact. */
  def qPromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
    val p = Tables.part(spark, sfDir).select($"p_partkey", $"p_type")
    val revd = dec($"l_extendedprice") *
      (lit(1).cast("decimal(18,4)") - dec($"l_discount"))
    l.join(p, $"l_partkey" === $"p_partkey")
      .groupBy(year($"l_shipdate").cast("int").as("ship_year"),
        month($"l_shipdate").cast("int").as("ship_month"))
      .agg(
        sum(when($"p_type".startsWith("PROMO"), revd)).cast("decimal(38,4)")
          .cast("double").as("promo_revenue"),
        sum(revd).cast("decimal(38,4)").cast("double").as("total_revenue"))
      .withColumn("promo_share",
        round(lit(100.0) * $"promo_revenue" / $"total_revenue", 6))
      .orderBy($"ship_year", $"ship_month")
  }

  val qPromoShareSql: String =
    """SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
      |  CAST(month(l_shipdate) AS INT) AS ship_month,
      |  CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) END) AS DECIMAL(38,4)) AS DOUBLE) AS promo_revenue,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue,
      |  ROUND(100.0 * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) END) AS DECIMAL(38,4)) AS DOUBLE) / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE), 6) AS promo_share
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |GROUP BY year(l_shipdate), month(l_shipdate)
      |ORDER BY ship_year, ship_month""".stripMargin

  // ---------------------------------------------------------------- B49
  /** TPC-H Q13-style CUSTOMER ORDER-COUNT distribution: how many
    * customers placed exactly N orders, including the zero-order tail
    * that an inner join would silently drop. Plan: LEFT OUTER join on
    * the customer key (one exchange), per-customer count, then a
    * second tiny aggregate over the count domain (≤ max orders per
    * customer — dozens of rows at any scale). The classic two-level
    * aggregation; no window, no distinct. */
  def qOrderCountDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).select($"c_custkey")
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val qOrderCountDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- B50
  /** TPC-H Q18-style LARGE-VOLUME orders: orders whose summed quantity
    * clears a floor, with their customer. Plan: the HAVING aggregate
    * runs FIRST and collapses lineitem to qualifying order keys (a
    * few per ten thousand at the shipped floor) — the join back to
    * orders/customer moves only survivors, so the expensive side of
    * the join shrinks before it shuffles; AQE is free to broadcast
    * the survivor frame at runtime. Quantity through the DECIMAL
    * discipline; no timestamps in the output (SURVEY §4). */
  def qLargeOrders(spark: SparkSession, sfDir: String,
      minQty: Double = 250.0): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > minQty)
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_name")
    big.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice",
        $"total_qty")
      .orderBy($"total_qty".desc, $"o_orderkey")
  }

  val qLargeOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
      |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 250.0
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- B51
  /** TPC-H Q22-style IDLE high-balance customers: customers whose
    * balance beats the positive-balance average but who placed no
    * order in the current era, rolled up per nation. Plan: the scalar
    * average is ONE tiny aggregate broadcast into the filter (exact
    * DECIMAL sum / count — the identical IEEE division both engines
    * perform); the no-recent-orders test is a LEFT ANTI join against
    * orders pre-filtered to the era (predicate pushed to the scan);
    * nation broadcasts. Output is nations — constant-sized. */
  def qIdleCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val avgBal = c.filter($"c_acctbal" > 0.0)
      .agg((sum(dec($"c_acctbal")).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val recent = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    val n = Tables.nation(spark, sfDir)
    c.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"n_name")
  }

  val qIdleCustomersSql: String =
    """SELECT n_name, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer, nation
      |WHERE c_nationkey = n_nationkey
      |  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- B59
  /** RFM customer profile — recency / frequency / monetary plus the
    * purchase CADENCE, the segmentation row every lifecycle-marketing
    * and churn model starts from. The mean inter-order gap uses the
    * TELESCOPING identity — mean of consecutive gaps ≡ (last − first)
    * / (n − 1) — so cadence needs NO lag window and no per-customer
    * ordering: the whole profile is ONE customer-key aggregate
    * (min/max/count/decimal-sum), with "now" = the corpus's max order
    * date as a broadcast 1-row scalar (recency measured against the
    * data, not the wall clock — reproducible). Single-order customers
    * carry NULL cadence (no gap evidence ≠ a zero-day gap). */
  def qRfm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderdate", $"o_totalprice")
    val ref = o.agg(max($"o_orderdate").as("ref"))
    val prof = o.groupBy($"o_custkey")
      .agg(count(lit(1)).as("frequency"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderdate").as("last_order"),
        dsum($"o_totalprice").as("monetary"))
    prof.crossJoin(broadcast(ref))
      .select($"o_custkey", $"frequency",
        datediff($"ref", $"last_order").cast("long").as("recency_days"),
        $"monetary",
        when($"frequency" >= 2,
          round(datediff($"last_order", $"first_order").cast("double") /
            ($"frequency" - 1), 6)).as("avg_gap_days"))
      .orderBy($"o_custkey")
  }

  val qRfmSql: String =
    """WITH ref AS (SELECT MAX(o_orderdate) AS ref FROM orders),
      |p AS (
      |  SELECT o_custkey, COUNT(*) AS frequency,
      |    MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, frequency,
      |  CAST(datediff('day', last_order, ref) AS BIGINT) AS recency_days,
      |  monetary,
      |  CASE WHEN frequency >= 2 THEN
      |    ROUND(CAST(datediff('day', first_order, last_order) AS DOUBLE)
      |      / (frequency - 1), 6)
      |  END AS avg_gap_days
      |FROM p, ref
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- B52
  /** TPC-H Q2-style MIN-COST SUPPLIER (adapted: this schema has no
    * partsupp, so "cost" is the realized unit price — exact DECIMAL
    * revenue / exact DECIMAL quantity per (part, supplier) from the
    * fact table, one IEEE division both engines perform identically).
    * For parts in a size/type band, pick each part's cheapest observed
    * supplier (ties broken by supplier key), with supplier + nation
    * detail. Plan: ONE exchange on (partkey, suppkey) builds unit
    * prices; the per-part min is a min-STRUCT aggregate (no window, no
    * second scan of the fact); part prunes BEFORE the join (pushed
    * size/type predicates); supplier and nation broadcast. Output is
    * qualifying-parts-sized — the fact table never moves twice. */
  def qMinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .filter($"p_size".between(10, 20) && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name")
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
    val up = l.join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name", $"l_suppkey")
      .agg((dsum($"l_extendedprice") / dsum($"l_quantity")).as("unit_price"))
    val best = up.groupBy($"p_partkey", $"p_name")
      .agg(min(struct($"unit_price", $"l_suppkey")).as("b"))
      .select($"p_partkey", $"p_name",
        $"b.l_suppkey".as("s_suppkey"),
        round($"b.unit_price", 6).as("unit_price"))
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name",
      $"s_nationkey")
    val n = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name")
    best.join(broadcast(s), Seq("s_suppkey"))
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .select($"p_partkey", $"p_name", $"s_name", $"n_name", $"unit_price")
      .orderBy($"p_partkey")
  }

  val qMinCostSupplierSql: String =
    """WITH up AS (
      |  SELECT p_partkey, p_name, l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS unit_price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      |  GROUP BY p_partkey, p_name, l_suppkey),
      |best AS (
      |  SELECT p_partkey, p_name, l_suppkey, unit_price,
      |    ROW_NUMBER() OVER (PARTITION BY p_partkey
      |      ORDER BY unit_price, l_suppkey) AS rn
      |  FROM up)
      |SELECT p_partkey, p_name, s_name, n_name,
      |  ROUND(unit_price, 6) AS unit_price
      |FROM best
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE rn = 1
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- B53
  /** TPC-H Q9-style PRODUCT-TYPE PROFIT by supplier nation and year
    * (adapted: no partsupp supplycost — the cost proxy is half the
    * part's retail price per unit, stated up front; what the shape
    * exercises is unchanged: a 4-table join with a LIKE-filtered part
    * dimension and a two-key rollup). Plan: part prunes on the name
    * predicate BEFORE the join and broadcasts; supplier/nation
    * broadcast; lineitem shuffles ONCE to the (nation, year) rollup;
    * revenue and cost come out of the same aggregate as two exact
    * DECIMAL sums — the profit arithmetic is one IEEE tree off exact
    * sums, identical in both engines. */
  def qProductProfit(spark: SparkSession, sfDir: String,
      namePattern: String = "%gear%"): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .filter($"p_name".like(namePattern))
      .select($"p_partkey", $"p_retailprice")
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")
    val n = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name")
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount", $"l_quantity")
    val revd = dec($"l_extendedprice") *
      (lit(1).cast("decimal(18,4)") - dec($"l_discount"))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"),
        year($"l_shipdate").cast("int").as("o_year"))
      .agg(
        sum(revd).cast("decimal(38,4)").cast("double").as("rev"),
        sum(dec($"p_retailprice") * dec($"l_quantity"))
          .cast("decimal(38,4)").cast("double").as("cost2"))
      .select($"nation", $"o_year",
        round($"rev" - lit(0.5) * $"cost2", 6).as("profit"))
      .orderBy($"nation", $"o_year")
  }

  val qProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |  ROUND(
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE)
      |    - 0.5 * CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE), 6) AS profit
      |FROM lineitem, part, supplier, nation
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
      |GROUP BY n_name, year(l_shipdate)
      |ORDER BY nation, o_year""".stripMargin

  // ---------------------------------------------------------------- B54
  /** TPC-H Q15-style TOP SUPPLIER: the supplier(s) with maximum
    * revenue over a quarter — ties ALL surface (the spec's view
    * semantics), which is why the max comes back as a value join, not
    * a LIMIT 1. Plan: one supplier-key aggregate over the pruned
    * quarter (predicate pushed to the scan); the scalar max is a
    * one-row aggregate CROSS-broadcast into the filter; supplier
    * detail broadcasts. Two passes over the supplier-revenue frame,
    * zero extra passes over the fact. */
  def qTopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
    val revd = dec($"l_extendedprice") *
      (lit(1).cast("decimal(18,4)") - dec($"l_discount"))
    val rev = l.groupBy($"l_suppkey")
      .agg(sum(revd).cast("decimal(38,4)").cast("double").as("total_revenue"))
      .localCheckpoint(true) // supplier-sized; feeds the max AND the filter
    val mx = rev.agg(max($"total_revenue").as("mx"))
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name")
    rev.crossJoin(broadcast(mx))
      .filter($"total_revenue" === $"mx")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val qTopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- B55
  /** TPC-H Q16-style SUPPLIER COUNT per part attribute group (adapted:
    * supplier-part relationships come from the fact table; the
    * "complaint" exclusion is suppliers with negative balance). Plan:
    * the excluded-supplier set is a LEFT ANTI broadcast (tiny); part
    * prunes on brand/type BEFORE the join; ONE exchange on the part
    * key joins fact to dimension, then the distinct-supplier count
    * groups by the three attributes. distinct inside the aggregate —
    * Spark's two-phase partial-distinct handles it without a separate
    * dedup pass. */
  def qSupplierCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .filter($"p_brand" =!= "Brand#1" && !$"p_type".startsWith("PROMO"))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val bad = Tables.supplier(spark, sfDir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
    val l = Tables.lineitem(spark, sfDir).select($"l_partkey", $"l_suppkey")
    l.join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val qSupplierCountsSql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- B56
  /** TPC-H Q17-style SMALL-QUANTITY revenue: average yearly revenue
    * lost if small orders (below 20% of the part's average quantity)
    * for one brand stopped shipping. Plan: the per-part average rides
    * an unbounded WINDOW over the part key on the broadcast-joined
    * brand slice — ONE fact scan, ONE exchange, no aggregate-join-back
    * (the join-back formulation scans the full fact twice, because a
    * brand predicate reaches lineitem only through the join — it can
    * never push into the fact scan); the threshold comparison is one
    * IEEE tree off exact DECIMAL sums (sum/count division — the
    * identical double in both engines). */
  def qSmallQtyRevenue(spark: SparkSession, sfDir: String,
      brand: String = "Brand#13"): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .filter($"p_brand" === brand).select($"p_partkey")
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
    val w = Window.partitionBy($"l_partkey")
    l.withColumn("avg_qty",
        sum(dec($"l_quantity")).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"))
      .select(round($"avg_yearly", 6).as("avg_yearly"))
  }

  val qSmallQtyRevenueSql: String =
    """WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
      |l AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN p ON l_partkey = p_partkey),
      |a AS (
      |  SELECT l_partkey AS a_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM l GROUP BY l_partkey)
      |SELECT ROUND(
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 6)
      |  AS avg_yearly
      |FROM l JOIN a ON l_partkey = a_partkey
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  // ---------------------------------------------------------------- B57
  /** TPC-H Q19-style DISJUNCTIVE predicate revenue: three brand/size/
    * quantity bands OR'd together — the shape that tests whether the
    * planner pushes a disjunction of conjunctions into the scan and
    * keeps the join selective. Plan: the part-side conjuncts
    * (brand+size) prune part BEFORE the broadcast join; the common
    * quantity bounds (the OR's hull, 1..30) push into the lineitem
    * scan as a PushedFilter; the residual OR evaluates post-join in
    * one codegen'd predicate. One exact DECIMAL revenue sum. */
  def qDisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .filter(($"p_brand" === "Brand#5" && $"p_size".between(1, 5)) ||
        ($"p_brand" === "Brand#13" && $"p_size".between(1, 10)) ||
        ($"p_brand" === "Brand#20" && $"p_size".between(1, 15)))
      .select($"p_partkey", $"p_brand")
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_quantity".between(1, 30)) // the OR's quantity hull
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val revd = dec($"l_extendedprice") *
      (lit(1).cast("decimal(18,4)") - dec($"l_discount"))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .filter(($"p_brand" === "Brand#5" && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#13" && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#20" && $"l_quantity".between(20, 30)))
      .agg(sum(revd).cast("decimal(38,4)").cast("double").as("revenue"))
  }

  val qDisjunctiveRevenueSql: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------- B58
  /** TPC-H Q21-style BLOCKING SUPPLIER (adapted: no commit/receipt
    * dates — the "supplier who kept the order waiting" is the SOLE
    * supplier whose latest line shipped strictly last in a
    * multi-supplier finalized order). Plan: the fact shuffles ONCE —
    * into the (order, supplier) partial aggregate; every later
    * exchange moves the REDUCED os frame (≤ suppliers-per-order rows
    * per order), and the per-order context (supplier count, order
    * max, how many tie the max) comes from windows over one
    * order-key partitioning of that reduced frame — no second fact
    * scan, no self-join; the finalized-orders filter is a semi join
    * applied before the aggregate so open orders never shuffle.
    * Output is per-supplier counts: fleet-sized. */
  def qBlockingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fOrders = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val os = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(fOrders, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"l_shipdate").as("sship"))
    val w = Window.partitionBy($"l_orderkey")
    val ctx = os
      .withColumn("nsupp", count(lit(1)).over(w))
      .withColumn("omax", max($"sship").over(w))
      .withColumn("nmax",
        sum(when($"sship" === $"omax", 1).otherwise(0)).over(w))
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name")
    ctx.filter($"nsupp" >= 2 && $"nmax" === 1 && $"sship" === $"omax")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_suppkey")
  }

  val qBlockingSupplierSql: String =
    """WITH os AS (
      |  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS sship
      |  FROM lineitem
      |  WHERE EXISTS (SELECT 1 FROM orders
      |    WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
      |  GROUP BY l_orderkey, l_suppkey),
      |ctx0 AS (
      |  SELECT l_orderkey, l_suppkey, sship,
      |    COUNT(*) OVER (PARTITION BY l_orderkey) AS nsupp,
      |    MAX(sship) OVER (PARTITION BY l_orderkey) AS omax
      |  FROM os),
      |ctx AS (
      |  SELECT *,
      |    SUM(CASE WHEN sship = omax THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY l_orderkey) AS nmax
      |  FROM ctx0)
      |SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM ctx JOIN supplier ON s_suppkey = l_suppkey
      |WHERE nsupp >= 2 AND nmax = 1 AND sship = omax
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey""".stripMargin

  // ---------------------------------------------------------------- B60
  /** TPC-H Q6-style FORECAST-REVENUE delta: the revenue that would have
    * been gained by eliminating a band of small discounts on
    * small-quantity lines in one ship year — the last classic TPC-H
    * query missing from the closure, and the purest pushed-predicate
    * exemplar in the suite: all three filters land in the parquet scan
    * (year range, discount band, quantity cap — `.explain` shows them
    * under PushedFilters), the scan reads four columns, and the plan is
    * scan → whole-stage-codegen'd partial sum → one 1-row exchange.
    * No join, no window, no distinct: at 100 TB this query is I/O-bound
    * on exactly the rows and bytes it needs. Revenue sums in exact
    * DECIMAL (§4) so the one output value hash-checks. */
  def qForecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
        .cast("decimal(38,4)").cast("double").as("revenue"))
  }

  val qForecastRevenueSql: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |    * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
      |  AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- B61
  /** SMALL-GROUP-SUPPRESSED ROLLUP — the release-hygiene primitive
    * every published aggregate table needs (census/k-anonymity
    * discipline, the operational subset): per-group stats are released
    * ONLY for groups with at least `k` members; smaller groups
    * collapse into one explicit OTHER row — never silently dropped,
    * because the reconciliation property IS the operator's contract:
    * released rows + the OTHER row partition the population exactly
    * (member counts and the DECIMAL balance mass both sum to the
    * corpus totals, spec-pinned), so a reader can verify nothing
    * leaked and nothing vanished, while no released row identifies a
    * group smaller than k. The OTHER row carries `suppressed_groups`
    * so the suppression volume is itself released data. Scale: one
    * map-side-combined aggregate to the tiny (nation, segment) grid,
    * then two branch-filters over ≤ |grid| rows — ReusedExchange
    * shares the one shuffle; the union is grid-bounded. */
  def qSafeRelease(spark: SparkSession, sfDir: String,
      k: Int = 10): DataFrame =
    qSafeReleaseOf(Tables.customer(spark, sfDir), k)

  /** B61 over an arbitrary customer-shaped frame (spec entry). */
  def qSafeReleaseOf(customer: DataFrame, k: Int): DataFrame = {
    val spark = customer.sparkSession
    import spark.implicits._
    require(k >= 1, s"suppression floor k=$k must be >= 1")
    val g = customer
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum($"c_acctbal".cast("decimal(18,2)")).as("bal"))
    val kept = g.filter($"n_customers" >= k)
      .select($"c_nationkey".as("nation_key"),
        $"c_mktsegment".as("segment"), $"n_customers",
        $"bal".cast("double").as("total_acctbal"),
        lit(0L).as("suppressed_groups"))
    val other = g.filter($"n_customers" < k)
      .agg(sum($"n_customers").as("n_customers"),
        sum($"bal").cast("double").as("total_acctbal"),
        count(lit(1)).as("suppressed_groups"))
      .filter($"suppressed_groups" > 0)
      .select(lit(-1).as("nation_key"), lit("OTHER").as("segment"),
        $"n_customers", $"total_acctbal", $"suppressed_groups")
    kept.unionByName(other).orderBy($"nation_key", $"segment")
  }

  def qSafeReleaseSql(k: Int = 10): String =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
       |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
       |  FROM customer GROUP BY 1, 2),
       |kept AS (
       |  SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
       |    n AS n_customers, CAST(bal AS DOUBLE) AS total_acctbal,
       |    CAST(0 AS BIGINT) AS suppressed_groups
       |  FROM g WHERE n >= $k),
       |oth AS (
       |  SELECT CAST(-1 AS INTEGER) AS nation_key, 'OTHER' AS segment,
       |    CAST(SUM(n) AS BIGINT) AS n_customers,
       |    CAST(SUM(bal) AS DOUBLE) AS total_acctbal,
       |    COUNT(*) AS suppressed_groups
       |  FROM g WHERE n < $k HAVING COUNT(*) > 0)
       |SELECT * FROM kept UNION ALL SELECT * FROM oth
       |ORDER BY nation_key, segment""".stripMargin
}
