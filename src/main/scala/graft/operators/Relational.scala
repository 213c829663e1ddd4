package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational engine baseline: scan → filter → join → aggregate plans
  * exercising predicate pushdown, broadcast joins of the dimension
  * tables, and partial (map-side) aggregation.
  *
  * Float aggregates are rounded in both the Spark plan and the DuckDB
  * oracle SQL so summation-order ulp differences cannot flip the
  * driver's hash compare.
  */
object Relational {

  /** Pricing summary: single-pass scan+agg on the fact table.
    * Shuffles once on the (low-cardinality) grouping keys after a
    * map-side partial aggregate — the plan that survives 100 TB.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // rounding scales match the exact decimal width of each sum
        // (quantities are ints, prices 2-dec, products 4/6-dec) so the
        // rounded value can never sit ON a rounding boundary; averages
        // are a division of those bit-identical sums, which both
        // engines evaluate to the same double — no avg() whose
        // summation order could differ at a boundary
        round(sum("l_quantity"), 6).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        // charge is 6-decimal-exact but sums to ~1e9, where double
        // summation-order noise (~1e-6) exceeds any safe rounding
        // scale — sum exactly as DECIMAL (order-independent) instead
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).cast("decimal(30,6)")), 4)
          .cast("double").as("sum_charge"),
        (round(sum("l_quantity"), 6) / count(lit(1))).as("avg_qty"),
        (round(sum("l_extendedprice"), 4) / count(lit(1))).as("avg_price"),
        (round(sum("l_discount"), 4) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  def q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 6) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
      |    AS DECIMAL(30,6))), 4) AS DOUBLE) AS sum_charge,
      |  round(sum(l_quantity), 6) / count(*) AS avg_qty,
      |  round(sum(l_extendedprice), 4) / count(*) AS avg_price,
      |  round(sum(l_discount), 4) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Top unshipped-revenue orders for one market segment.
    * `customer` is a dimension → broadcast; only `orders`⋈`lineitem`
    * shuffles, on the join key that is also the grouping key, so the
    * aggregate reuses the join partitioning (one shuffle total).
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3JoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Regional revenue: 5-way join where every dimension side
    * (supplier/nation/region and the date-filtered orders) is
    * broadcast-able; the fact table never shuffles for the joins, only
    * for the final tiny aggregate.
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def q5MultiJoinSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin
}
