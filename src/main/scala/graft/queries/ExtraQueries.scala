package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Tables._

/** Second relational wave: deep join chains, subquery shapes, HAVING,
  * nested struct/array construction, decimal arithmetic — rounding out the
  * capability-parity surface (SURVEY.md §2 "—absent—" rows + FIXTURES.md
  * A2/A3 type coverage) with DuckDB oracles.
  */
/** SQL that is literally identical on Spark and DuckDB (the demonstrable
  * dialect-shared subset — one string, two engines).
  */
object SharedSql {
  val segmentRevenue: String =
    """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}

object ExtraQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q5 shape: five-table chain, two broadcast dims, grouped revenue
    "q_join_chain5" -> ((s, dir) => {
      val region = t(s, dir, "region").where(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // HAVING (post-aggregation filter)
    "q_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spent"))
        .where(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    }),

    // scalar subquery: broadcast the 1-row aggregate, stay lazy (no
    // driver-side collect)
    "q_scalar_subquery" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      // 1.5×avg keeps survivors at every SF (2×avg sat above the price
      // ceiling of the synthetic data → a 0-row gate that cannot fail)
      val threshold = o.agg((lit(1.5) * avg(col("o_totalprice"))).as("__thr"))
      o.crossJoin(broadcast(threshold))
        .where(col("o_totalprice") > col("__thr"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // IN-subquery (semi-join through SQL surface)
    "q_in_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_in")
      t(s, dir, "customer").createOrReplaceTempView("customer_in")
      s.sql(
        """SELECT o_orderkey, o_custkey FROM orders_in
          |WHERE o_custkey IN (SELECT c_custkey FROM customer_in WHERE c_mktsegment = 'AUTOMOBILE')
          |  AND o_totalprice > 150000
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // correlated EXISTS via SQL
    "q_correlated_exists" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_ce")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_ce")
      s.sql(
        """SELECT s_suppkey, s_name FROM supplier_ce
          |WHERE EXISTS (SELECT 1 FROM lineitem_ce
          |              WHERE l_suppkey = s_suppkey AND l_quantity > 45)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    // nested struct build + field extraction (FIXTURES A2; outputs scalars)
    "q_struct_ops" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("info"))
        .select(
          col("c_custkey"),
          col("info.name").as("name"),
          (col("info.bal") * 2).as("double_bal"))
        .orderBy(col("c_custkey"))
    }),

    // array build / aggregation / re-expansion (list roundtrip as scalars)
    "q_array_agg" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    }),

    // map type (absent in reference physical types; Spark-native — §1.2)
    "q_map_type" -> ((s, dir) => {
      t(s, dir, "region")
        .select(
          col("r_regionkey"),
          map(lit("name"), col("r_name"), lit("key"), col("r_regionkey").cast("string")).as("m"))
        .select(
          col("r_regionkey"),
          element_at(col("m"), "name").as("name_from_map"),
          size(col("m")).cast("long").as("map_size"))
        .orderBy(col("r_regionkey"))
    }),

    // decimal arithmetic (FIXTURES A3: DecimalType(18,4))
    // decimal outputs are string-cast in BOTH engines: values must still
    // match digit-for-digit (the arithmetic is fully exercised), but the
    // hash compare no longer depends on how decimal128 columns canonicalize
    // (r1: rows+schema matched, hash didn't)
    "q_decimal" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_extendedprice").cast(DecimalType(18, 4)).cast("string").as("price_dec"),
          (col("l_extendedprice").cast(DecimalType(18, 4)) * col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).cast("string").as("total_dec"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_dec"))
    }),

    // bucketed range join: equi-join on derived bucket ids + residual
    // predicate — the fact×fact-scalable rewrite of the broadcast
    // nested-loop range join (oracle: the plain range-join SQL; bucketing
    // must be invisible in the result)
    "q_range_join_bucketed" -> ((s, dir) => {
      val bands = s.createDataFrame(Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0), (3, 30.0, 40.0), (4, 40.0, 51.0)))
        .toDF("band_id", "lo", "hi")
      val li = t(s, dir, "lineitem").select(col("l_quantity"))
      graft.operators.RangeJoin.bucketed(li, bands, "l_quantity", "lo", "hi", bucketWidth = 10.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("band_id"))
    }),

    // gap-based sessionization in batch (30-min inactivity gap): lag →
    // new-session flag → running sum = session index → per-session agg.
    // One sort-shuffle on user_id; the streaming twin is
    // EventStreams.sessionWindows.
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("epoch_s"))
        .withColumn("new_sess",
          when(col("epoch_s") - lag(col("epoch_s"), 1).over(w) <= 1800, 0L).otherwise(1L))
        .withColumn("sess_idx", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("sess_idx"))
        .agg(
          min(col("epoch_s")).as("session_start"),
          max(col("epoch_s")).as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("sess_idx"))
    }),

    // event-time sliding aggregate via a RANGE window frame (last hour
    // per user, inclusive of peers) — frame semantics parity check
    "q_window_time_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s")).rangeBetween(-3600, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("epoch_s"), col("value"))
        .withColumn("hour_sum", round(sum(col("value")).over(w), 4))
        .withColumn("hour_n", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("epoch_s"), col("hour_sum"), col("hour_n"))
        .orderBy(col("event_id"))
    }),

    // snapshot diff: simulate a new dataset release (some rows deleted,
    // some prices bumped, some appended) and classify every key
    "q_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      val newSnap = o.where(pmod(col("o_orderkey"), lit(50)) =!= 3)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(10)) === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(
          o.where(pmod(col("o_orderkey"), lit(100)) === 7)
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      graft.operators.Diff.snapshotDiff(o, newSnap, Seq("o_orderkey"))
        .groupBy(col("diff_status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("diff_status"))
    }),

    // upsert (MERGE INTO shape): a source batch of modified orders
    // replaces its target keys, everything else survives
    "q_merge_upsert" -> ((s, dir) => {
      val target = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val source = target
        .where(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderstatus", lit("R"))
      graft.operators.Merge.upsert(target, source, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // CDC changelog apply: latest change per key wins (seq desc),
    // 'D' deletes, 'U' upserts — keys in both streams take the delete
    "q_changelog_apply" -> ((s, dir) => {
      val snap = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val updates = snap.where(pmod(col("c_custkey"), lit(7)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      val deletes = snap.where(pmod(col("c_custkey"), lit(11)) === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(2L))
      graft.operators.Merge
        .applyChangelog(snap, updates.unionByName(deletes), Seq("c_custkey"), "seq", "op")
        .orderBy(col("c_custkey"))
    }),

    // forward-fill imputation (LOCF): nulls planted deterministically,
    // then carried forward within each customer's order history
    "q_forward_fill" -> ((s, dir) => {
      val withGaps = t(s, dir, "orders")
        .where(col("o_custkey") < 200)
        .select(
          col("o_custkey"), col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(3)) === 0, lit(null)).otherwise(col("o_totalprice")).as("price"))
      graft.operators.Impute.forwardFill(withGaps, Seq("o_custkey"), "o_orderkey", Seq("price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // decimal aggregation: exact sums at DECIMAL precision, string-cast on
    // both engines (digit-for-digit compare, canonicalization-free)
    "q_decimal_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("string").as("sum_price"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast("string").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // spark.sql text path: the SAME dialect-shared SQL string runs on
    // both engines (temp views over the parquet tables) — the SQL-first
    // user surface, exercised end-to-end
    "q_sql_text" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(SharedSql.segmentRevenue)
    }),

    // indexed point-in-interval join: binary-search expression + tiny
    // broadcast hash join — NO nested-loop operator; oracle is the plain
    // range-join SQL (the index must be invisible in results)
    "q_range_join_indexed" -> ((s, dir) => {
      val bands = s.createDataFrame(Seq(
        (0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0), (3, 30.0, 40.0), (4, 40.0, 51.0)))
        .toDF("band_id", "lo", "hi")
      val li = t(s, dir, "lineitem").select(col("l_quantity"))
      graft.operators.RangeJoin.broadcastIndexed(li, bands, "l_quantity", "lo", "hi")
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("band_id"))
    }),

    // fuzzy self-join (edit distance ≤ 2) via lossless length blocking —
    // result must equal the oracle's naive cross-join formulation
    "q_fuzzy_join" -> ((s, dir) => {
      graft.operators.FuzzyJoin
        .selfJoin(t(s, dir, "customer").where(col("c_custkey") < 300), "c_name", "c_custkey", maxDistance = 2)
        .select(col("id_a"), col("id_b"), col("distance").cast("long").as("distance"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // null-safe equi-join (<=>): null keys match each other, unlike '='
    "q_nullsafe_join" -> ((s, dir) => {
      val n = t(s, dir, "nation").select(
        col("n_nationkey"),
        when(pmod(col("n_nationkey"), lit(5)) === 0, lit(null)).otherwise(col("n_regionkey")).as("rk"))
      n.as("a").join(n.as("b"), col("a.rk") <=> col("b.rk"))
        .groupBy(col("a.n_nationkey").as("n_nationkey"))
        .agg(count(lit(1)).as("n_matches"))
        .orderBy(col("n_nationkey"))
    }),

    // union of three tables with distinct (n-ary set op)
    "q_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey").as("nationkey"))
      c.union(su).union(n).distinct().orderBy(col("nationkey"))
    }),

    // conditional aggregation (pivot-style counts without pivot)
    "q_conditional_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    }),

    // pivot (dedicated operator on top of the same aggregation machinery)
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    }),

    // bounded-heap top-k per key (map-side combine; no per-key total sort)
    "q_topk_per_key" -> ((s, dir) => {
      graft.operators.TopKPerKey
        .topK(t(s, dir, "orders"), "o_orderpriority", "o_totalprice", "o_orderkey", k = 3)
        .orderBy(col("o_orderpriority"), col("rank"))
    }),

    // skew-salted equi-join: result must equal the plain join (salting is
    // an execution detail), so the oracle is the unsalted SQL join
    "q_salted_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(orders, cust, Seq("o_custkey"), salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    // first/last ordered aggregates via min_by/max_by
    "q_minby_maxby" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
          max_by(col("o_orderkey"), struct(col("o_totalprice"), (-col("o_orderkey")).cast("long"))).as("priciest_order"))
        .orderBy(col("o_orderpriority"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_range_join_bucketed" ->
      """SELECT band_id, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |JOIN (VALUES (0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0),
        |             (3, 30.0, 40.0), (4, 40.0, 51.0)) AS b(band_id, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_snapshot_diff" ->
      """WITH oldt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |), newt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 50 <> 3
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 7
        |)
        |SELECT CASE
        |    WHEN o.o_orderkey IS NULL THEN 'added'
        |    WHEN n.o_orderkey IS NULL THEN 'removed'
        |    WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
        |     AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |     AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice THEN 'unchanged'
        |    ELSE 'changed' END AS diff_status,
        |  count(*) AS n
        |FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
        |GROUP BY 1 ORDER BY diff_status""".stripMargin,
    "q_sql_text" -> SharedSql.segmentRevenue,
    "q_forward_fill" ->
      """SELECT o_custkey, o_orderkey,
        |  last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END IGNORE NULLS)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_decimal_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_range_join_indexed" ->
      """SELECT band_id, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |JOIN (VALUES (0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0),
        |             (3, 30.0, 40.0), (4, 40.0, 51.0)) AS b(band_id, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE a.c_custkey < 300 AND b.c_custkey < 300
        |  AND levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "q_nullsafe_join" ->
      """WITH n AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS rk
        |  FROM nation)
        |SELECT a.n_nationkey, CAST(count(*) AS BIGINT) AS n_matches
        |FROM n a JOIN n b ON a.rk IS NOT DISTINCT FROM b.rk
        |GROUP BY a.n_nationkey ORDER BY a.n_nationkey""".stripMargin,
    "q_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |), source AS (
        |  SELECT o_orderkey, 'R' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0
        |)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM source
        |UNION ALL
        |SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
        |FROM target t WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_changelog_apply" ->
      """WITH snap AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |), changes AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, 'U' AS op, 1 AS seq
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal, 'D' AS op, 2 AS seq
        |  FROM customer WHERE c_custkey % 11 = 0
        |), latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC, op) AS rn
        |    FROM changes) WHERE rn = 1
        |)
        |SELECT c_custkey, c_name, c_acctbal FROM snap t
        |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = t.c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'
        |ORDER BY c_custkey""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s FROM events
        |), f AS (
        |  SELECT *, CASE WHEN epoch_s - lag(epoch_s) OVER
        |      (PARTITION BY user_id ORDER BY epoch_s, event_id) <= 1800
        |    THEN 0 ELSE 1 END AS new_sess FROM e
        |), g AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx FROM f
        |)
        |SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
        |  min(epoch_s) AS session_start, max(epoch_s) AS session_end, count(*) AS n_events
        |FROM g GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin,
    "q_window_time_range" ->
      """SELECT event_id, user_id, epoch_s,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS hour_sum,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hour_n
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s, value
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_join_chain5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spent
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |  AND o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,
    "q_correlated_exists" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        |ORDER BY s_suppkey""".stripMargin,
    "q_struct_ops" ->
      """SELECT c_custkey, c_name AS name, c_acctbal * 2 AS double_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_array_agg" ->
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_map_type" ->
      """SELECT r_regionkey, r_name AS name_from_map, CAST(2 AS BIGINT) AS map_size
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "q_decimal" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR) AS price_dec,
        |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS VARCHAR) AS total_dec
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_dec""".stripMargin,
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_union_distinct" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION SELECT s_nationkey FROM supplier
        |  UNION SELECT n_nationkey FROM nation)
        |ORDER BY nationkey""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_topk_per_key" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rank
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q_minby_maxby" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn_min,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn_max
        |  FROM orders)
        |SELECT o_orderpriority,
        |  min(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
        |  min(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
