package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Full relational surface — capability-parity rows marked `—absent—` in
  * SURVEY.md §2 (joins incl. semi/anti/range/as-of, group-by/rollup/cube,
  * windows, sorts/top-k, set ops), all Spark built-ins chosen for their
  * 100 TB behavior: dimension sides broadcast, fact-fact joins shuffle on
  * uniform keys, aggregations rely on partial (map-side) combine.
  */
object RelationalQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped aggregation: partial agg per partition, 6-group final.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // broadcast dimension join: part is small → no shuffle of lineitem.
    "q_join_broadcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // multi-join (TPC-H Q3 shape): two broadcastable dims + fact-fact shuffle join.
    "q_join_multi" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),

    "q_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // customers who never placed a high-value order, per segment (the
    // filter keeps the anti side selective so the gate has survivors —
    // at any SF virtually every customer has SOME order)
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 250000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    "q_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    "q_intersect" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).orderBy(col("nationkey"))
    }),

    // EXCEPT with guaranteed survivors: customers who placed orders but
    // never a large one (nationkey-vs-nationkey returned 0 rows at every
    // SF — both sides cover all 25 nations — a gate that cannot fail)
    "q_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val all = o.select(col("o_custkey").as("custkey"))
      val big = o.where(col("o_totalprice") > 100000).select(col("o_custkey").as("custkey"))
      all.except(big).orderBy(col("custkey"))
    }),

    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // analytic windows: rank within group
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // frame spec: running sum
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .where(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, dir, "orders")
        .where(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // distribution/analytic windows: ntile, percent_rank, cume_dist,
    // nth_value over an explicit frame
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .where(col("o_custkey") < 50)
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // unpivot (wide → long reshape): melt three numeric measures into
    // (measure, value) rows — UDTF-free, codegen'd `stack`
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          expr("stack(3, 'quantity', l_quantity, 'price', l_extendedprice, 'discount', l_discount)")
            .as(Seq("measure", "value")))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }),

    // top-k: TakeOrdered physical op (no full sort at scale)
    "q_sort_topk" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(50)
    }),

    // range (non-equi) join against a broadcast band table
    "q_range_join" -> ((s, dir) => {
      val bands = s.createDataFrame(Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0), (3, 30.0, 40.0), (4, 40.0, 51.0)))
        .toDF("band_id", "lo", "hi")
      val li = t(s, dir, "lineitem")
      li.join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("band_id"))
    }),

    // as-of join: latest 'purchase' at or before each 'click' per user —
    // the generic union+window operator (graft.operators.AsOfJoin): one
    // sort-shuffle on the key, no per-row range scan.
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.where(col("event_type") === "click").select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("purchase_time"))
      graft.operators.AsOfJoin
        .backward(clicks, purchases, on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          valueCols = Seq("purchase_time"))
        .select(
          col("event_id"),
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("asof_purchase_time"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
        .orderBy(col("event_id"))
    }),

    // grouping sets via SQL (same engine path as rollup/cube)
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(1) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_multi" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_outer_join" ->
      """SELECT c_custkey, c_name,
        |  CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |  round(sum(coalesce(o_totalprice, 0.0)), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY custkey""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem)
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q_range_join" ->
      """SELECT band_id, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |JOIN (VALUES (0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0),
        |             (3, 30.0, 40.0), (4, 40.0, 51.0)) AS b(band_id, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime((SELECT max(p.ts) FROM events p
        |            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
        |              AND p.ts <= e.ts), '%Y-%m-%d %H:%M:%S') AS purchase_ts
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
