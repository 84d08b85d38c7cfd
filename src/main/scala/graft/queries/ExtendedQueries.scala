package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Second wave of relational coverage: cube, running window frames,
  * subqueries, date/string function libraries, approximate sketches,
  * multi-topic fan-in (the reference's clone_with_topic union analog,
  * pspf/stream.py:133-150).
  */
object ExtendedQueries {
  private val d = DecimalType(18, 2)
  private def dec(c: String) = col(c).cast(d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CUBE grouping sets.
    "x1_cube" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Running-total window frame per customer (exact decimal internally —
    // frame-order independent of partial-agg parallelism).
    "x2_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .withColumn("running", sum(dec("o_totalprice")).over(w).cast(DoubleType))
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"), col("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // IN + correlated EXISTS subqueries (via SQL over registered views).
    "x3_subqueries" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n
          |FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          |  AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o_custkey AND c.c_acctbal > 1000.0)
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // Date/time function library.
    "x4_date_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"),
          last_day(col("o_orderdate")).cast("string").as("month_end"),
          datediff(to_date(lit("1998-12-31")), col("o_orderdate").cast("date")).as("days_to_eoy"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"))
        .orderBy(col("o_orderkey"))
    }),

    // String function library, part 2.
    "x5_string_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 53 === 0)
        .select(col("p_partkey"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          translate(col("p_brand"), "#", "-").as("brand_t"),
          reverse(col("p_name")).as("name_rev"),
          trim(col("p_name")).as("name_trim"),
          locate("a", col("p_name")).as("first_a"))
        .orderBy(col("p_partkey"))
    }),

    // Approximate sketches (HLL count-distinct + KLL-style quantile).
    // Sketch VALUES are engine-private, so the cross-engine check is the
    // sketch's error bound: Spark computes approx AND exact in one plan
    // and emits the assertion columns; the oracle emits literal TRUE —
    // the driver's hash compare then verifies the bound holds.
    "x6_approx_sketches" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // exact distinct via two-phase (distinct on the pair key → tiny
      // count): shuffles (flag, partkey) across ALL partitions, where
      // countDistinct's expand would funnel every row into one reducer
      // per group (3 here) — measured 2.4× on this query, and the
      // difference between a plan that scales and one that doesn't at
      // low group cardinality. The exact legs exist only to verify the
      // sketches; the sketches are the scale path.
      // the assertions verify each sketch's OWN contract: HLL advertises
      // ~5% relative-standard-deviation on the count (3σ bound below —
      // a 1σ bound would legitimately fail ~1/3 of the time), and the
      // quantile sketch guarantees RANK accuracy (1/1000 here), not
      // value closeness — so the approx median must land inside a
      // generous exact rank window, whatever the value distribution
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("ac"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
          // both rank bounds from ONE exact-percentile buffer pass
          expr("percentile(l_extendedprice, array(0.45D, 0.55D))").as("pr"))
      val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ec"))
      sketches.join(exact, "l_returnflag")
        .select(col("l_returnflag"),
          (abs(col("ac") - col("ec")) / col("ec") < 0.15).as("cnt_ok"),
          (col("am") >= col("pr")(0) && col("am") <= col("pr")(1)).as("med_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Arbitrary GROUPING SETS (beyond rollup/cube lattices).
    "x8_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          |  COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY returnflag, linestatus""".stripMargin)
    }),

    // Multi-topic fan-in: union of two event streams then aggregate
    // (reference clone_with_topic fan-in, pspf/stream.py:133-150).
    "x7_union_topics" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"))
      clicks.union(purchases)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(dec("value")).cast(DoubleType).as("sum_value"))
        .orderBy(col("user_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x1_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "x2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
        |FROM orders
        |QUALIFY o_custkey <= 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "x3_subqueries" ->
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o_custkey AND c.c_acctbal > 1000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "x4_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        |  CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,
    "x5_string_funcs" ->
      """SELECT p_partkey,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  translate(p_brand, '#', '-') AS brand_t,
        |  reverse(p_name) AS name_rev,
        |  trim(p_name) AS name_trim,
        |  CAST(strpos(p_name, 'a') AS INT) AS first_a
        |FROM part WHERE p_partkey % 53 = 0 ORDER BY p_partkey""".stripMargin,
    // x6: sketch values are engine-private; the oracle is the error-bound
    // assertion itself (Spark emits booleans, DuckDB emits TRUE rows).
    "x6_approx_sketches" ->
      """SELECT l_returnflag, TRUE AS cnt_ok, TRUE AS med_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x8_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "x7_union_topics" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT user_id, value FROM events WHERE event_type = 'click'
        |      UNION ALL
        |      SELECT user_id, value FROM events WHERE event_type = 'purchase') u
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
