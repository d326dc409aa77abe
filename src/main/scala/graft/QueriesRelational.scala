package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.{dsum, DSum}

/** Relational / analytical capability surface (SURVEY §2.5): scans,
  * joins of every type, aggregation, grouping sets, windows, sort/limit,
  * set ops, scalar function families, and windowed time aggregation.
  *
  * Scale notes are per query in comments: joins broadcast the dimension
  * side; aggregations rely on partial (map-side) aggregation; every filter
  * and projection is expressed declaratively so Catalyst pushes it into
  * the parquet scan.
  */
object QueriesRelational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The events table as a STREAMING source (file source over a
    * symlinked drop-zone directory), schema taken from the file's own
    * footer and `ts` normalized to micros — shared by the
    * stream_*_window duality twins. See stream_tumbling_window's
    * comments for the why of each step. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet").schema
    val dropZone = java.nio.file.Files.createTempDirectory("graft-stream-src-")
    java.nio.file.Files.createSymbolicLink(
      dropZone.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    Tables.normalizeTs(
      graft.streaming.Streams.fileSource(s, dropZone.toString, raw), "ts")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- aggregation ----------------------------------------------------
    QueryDef("q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") < to_timestamp(lit("1999-01-01")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("double").as("sum_disc_price"),
            (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
              .as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    QueryDef("q02_minmax_by_brand",
      (s, dir) => t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          min(col("p_size")).as("min_size"),
          max(col("p_size")).as("max_size"),
          count(lit(1)).as("n_parts")),
      Some("""SELECT p_brand, min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
        min(p_size) AS min_size, max(p_size) AS max_size, COUNT(*) AS n_parts
        FROM part GROUP BY p_brand""")),

    // ---- joins ----------------------------------------------------------
    // Dims (customer) broadcast; fact-fact join (orders-lineitem) shuffles
    // on the shared key once.
    QueryDef("q03_shipping_priority",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
        val li = t(s, dir, "lineitem").filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
          // timestamp_ntz: parquet writes naive timestamps, matching the
          // oracle's (tz-less) timestamps byte-for-byte for the comparator
          .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
      },
      Some("""SELECT o_orderkey, o_orderdate,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    QueryDef("q04_semi_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val bigLi = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        o.join(bigLi, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority""")),

    // Five-way star join: region/nation/supplier broadcast, orders-lineitem
    // co-shuffle on orderkey; classic TPC-H Q5 shape.
    QueryDef("q05_local_supplier_volume",
      (s, dir) => {
        val r = t(s, dir, "region")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        val li = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name""")),

    QueryDef("q06_revenue_forecast",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""")),

    QueryDef("q07_left_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey""")),

    QueryDef("q08_right_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 30)
        val su = t(s, dir, "supplier")
        li.join(su, col("l_suppkey") === col("s_suppkey"), "right")
          .groupBy(col("s_suppkey"))
          .agg(count(col("l_orderkey")).as("n_items"),
            coalesce(dsum(col("l_quantity")), lit(0.0)).as("sum_qty"))
      },
      Some("""SELECT s_suppkey, COUNT(l_orderkey) AS n_items,
        COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_qty
        FROM (SELECT * FROM lineitem WHERE l_quantity >= 30) li
        RIGHT JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_suppkey""")),

    QueryDef("q09_full_outer_join",
      (s, dir) => {
        val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey2"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, col("nationkey") === col("nationkey2"), "full")
          .select(coalesce(col("nationkey"), col("nationkey2")).as("nationkey"),
            col("n_cust"), col("n_supp"))
      },
      Some("""SELECT COALESCE(c.nationkey, s.nationkey2) AS nationkey, n_cust, n_supp
        FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        FULL OUTER JOIN (SELECT s_nationkey AS nationkey2, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        ON c.nationkey = s.nationkey2""")),

    QueryDef("q10_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 400000)""")),

    // Equi + range predicate: sort-merge join on user_id with the time
    // band applied as a join residual — no cross product at any scale.
    QueryDef("q11_range_join",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
        val e1 = e.filter(col("event_id") % 7 === 0)
          .select(col("event_id").as("anchor_id"), col("user_id").as("u1"), col("ts").as("ts1"))
        e1.join(e,
            col("u1") === col("user_id") && col("ts") > col("ts1") &&
              col("ts") <= col("ts1") + expr("INTERVAL 6 HOURS"))
          .groupBy(col("anchor_id"))
          .agg(count(lit(1)).as("n_following"))
      },
      Some("""SELECT e1.event_id AS anchor_id, COUNT(*) AS n_following
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 6 HOUR
        WHERE e1.event_id % 7 = 0
        GROUP BY e1.event_id""")),

    QueryDef("q12_count_distinct",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum_distinct(col("value").cast("decimal(18,2)")).cast("double").as("sum_distinct_value")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
        CAST(SUM(DISTINCT CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_distinct_value
        FROM events GROUP BY event_type""")),

    // ---- grouping sets / rollup / cube ----------------------------------
    QueryDef("q13_rollup",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)""")),

    QueryDef("q14_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    QueryDef("q15_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    // GROUPING()/GROUPING_ID(): distinguish rollup subtotal rows from
    // genuine NULL group values — the flags that make rollup output
    // machine-consumable.
    QueryDef("q50_grouping_id",
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          grouping_id().cast("long").as("gid")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    // ---- window functions ----------------------------------------------
    QueryDef("q16_window_rank",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val bucket = floor(col("c_acctbal") / 1000)
        val wDet = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wTies = Window.partitionBy(col("c_nationkey")).orderBy(bucket.desc)
        c.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            row_number().over(wDet).as("rn"),
            rank().over(wTies).as("rnk"),
            dense_rank().over(wTies).as("drnk"))
          .filter(col("rn") <= 10)
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal, rn, rnk, drnk FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
          rank() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000) DESC) AS rnk,
          dense_rank() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000) DESC) AS drnk
        FROM customer) x WHERE rn <= 10""")),

    QueryDef("q17_window_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            (col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0))).as("delta"))
      },
      Some("""SELECT event_id, user_id, value,
        lag(value, 1) OVER w AS prev_value,
        lead(value, 1) OVER w AS next_value,
        value - COALESCE(lag(value, 1) OVER w, 0.0) AS delta
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    QueryDef("q18_window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_value"),
            count(lit(1)).over(w).as("running_n"))
      },
      Some("""SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
        COUNT(*) OVER w AS running_n
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    QueryDef("q19_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, rn FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
          row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) x WHERE rn <= 3""")),

    QueryDef("q45_like_predicates",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_name").like("%a%").as("has_a"),
          col("p_name").ilike("%A%").as("has_a_ci"),
          col("p_brand").startsWith("Brand#1").as("brand1x"),
          col("p_type").endsWith("M").as("ends_m"),
          col("p_name").rlike("^[a-m]").as("first_half_alpha")),
      Some("""SELECT p_partkey,
        p_name LIKE '%a%' AS has_a,
        p_name ILIKE '%A%' AS has_a_ci,
        starts_with(p_brand, 'Brand#1') AS brand1x,
        ends_with(p_type, 'M') AS ends_m,
        regexp_matches(p_name, '^[a-m]') AS first_half_alpha
        FROM part""")),

    QueryDef("q46_json_keys",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          concat_ws(",", sort_array(map_keys(
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType))))).as("keys_csv"),
          size(map_values(from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))).as("n_vals")),
      Some("""SELECT event_id,
        array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        len(json_keys(props)) AS n_vals
        FROM events""")),

    // correlated scalar subquery (decimal-exact per-nation average)
    QueryDef("q42_correlated_subquery",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT c_custkey, c_nationkey, c_acctbal
          FROM customer c
          WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""")
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""")),

    QueryDef("q43_set_ops_all",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
          .filter(col("k") < 20)
        val o = t(s, dir, "supplier").select(col("s_suppkey").as("k"))
        val ia = li.intersectAll(o).withColumn("op", lit("intersect_all"))
        val ea = li.exceptAll(o).withColumn("op", lit("except_all"))
        ia.unionByName(ea).groupBy(col("op"), col("k")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT op, k, COUNT(*) AS n FROM (
          SELECT 'intersect_all' AS op, k FROM (
            SELECT l_suppkey AS k FROM lineitem WHERE l_suppkey < 20
            INTERSECT ALL SELECT s_suppkey FROM supplier) a
          UNION ALL
          SELECT 'except_all' AS op, k FROM (
            SELECT l_suppkey AS k FROM lineitem WHERE l_suppkey < 20
            EXCEPT ALL SELECT s_suppkey FROM supplier) b) u
        GROUP BY op, k""")),

    // value-range window frame: trailing 5-minute sum per user (RANGE
    // frame over event-time, not row counts)
    QueryDef("q44_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-300, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
              .as("trailing_5min_sum"),
            count(lit(1)).over(w).as("trailing_5min_n"))
      },
      Some("""SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_5min_sum,
        COUNT(*) OVER w AS trailing_5min_n
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
          RANGE BETWEEN 300 PRECEDING AND CURRENT ROW)""")),

    QueryDef("q40_first_last_value",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            first(col("value")).over(w).as("first_value"),
            last(col("value")).over(w).as("last_value"),
            nth_value(col("value"), 2).over(w).as("second_value"))
      },
      Some("""SELECT event_id, user_id,
        first_value(value) OVER w AS first_value,
        last_value(value) OVER w AS last_value,
        nth_value(value, 2) OVER w AS second_value
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    QueryDef("q41_string_agg",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        val n = t(s, dir, "nation")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("rich_customers"),
            count(lit(1)).as("n_rich"))
      },
      Some("""SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS rich_customers,
        COUNT(*) AS n_rich
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 9000 GROUP BY n_name""")),

    // as-of join: every event matched to the user's most recent error at
    // or before it — oracle is DuckDB's native ASOF LEFT JOIN; ours is the
    // union + carry-forward composition (one shuffle on the key).
    QueryDef("q38_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
        graft.operators.AsofJoin.asofJoin(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          errors.select(col("user_id"), col("ts"), col("event_id"), col("value")),
          key = "user_id", leftTs = "ts", rightTs = "ts",
          payload = Map("event_id" -> "last_error_id", "value" -> "last_error_value"),
          rightOrder = "event_id")
          .select(col("event_id"), col("user_id"),
            col("last_error_id"), col("last_error_value"))
      },
      Some("""SELECT l.event_id, l.user_id, r.event_id AS last_error_id,
        r.value AS last_error_value
        FROM events l ASOF LEFT JOIN
          (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error') r
          ON l.user_id = r.user_id AND l.ts >= r.ts""")),

    QueryDef("q39_pivot",
      (s, dir) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val pivoted = t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        pivoted.select(col("user_id") +:
          types.map(ty => coalesce(col(ty), lit(0L)).as(s"n_$ty")): _*)
      },
      Some("""SELECT user_id,
        COUNT(*) FILTER (event_type = 'click') AS n_click,
        COUNT(*) FILTER (event_type = 'view') AS n_view,
        COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        COUNT(*) FILTER (event_type = 'signup') AS n_signup,
        COUNT(*) FILTER (event_type = 'error') AS n_error
        FROM events GROUP BY user_id""")),

    // same result as q19 but through the custom TopKPerKey operator
    // (LogicalPlan + Strategy + two-phase exec with map-side capping) —
    // proving the custom-operator stack against the same oracle as the
    // declarative window form.
    QueryDef("q37_topk_operator",
      (s, dir) => graft.plans.TopKPerKey(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        keys = Seq(col("o_orderstatus")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3, rankName = "rn"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, rn FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
          row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) x WHERE rn <= 3""")),

    // ---- sort / limit ---------------------------------------------------
    QueryDef("q20_sort_limit",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""")),

    // ---- set operations -------------------------------------------------
    QueryDef("q21_set_ops",
      (s, dir) => {
        val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val both = cn.intersect(sn).withColumn("op", lit("intersect"))
        val onlyC = cn.distinct().except(sn).withColumn("op", lit("except"))
        val uni = cn.union(sn).distinct().withColumn("op", lit("union"))
        both.unionByName(onlyC).unionByName(uni).select(col("op"), col("nationkey"))
      },
      Some("""SELECT 'intersect' AS op, nationkey FROM
          (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
        UNION ALL
        SELECT 'except' AS op, nationkey FROM
          (SELECT DISTINCT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
        UNION ALL
        SELECT 'union' AS op, nationkey FROM
          (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier) c""")),

    // ---- scalar function families --------------------------------------
    QueryDef("q22_scalar_string",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          split_part(col("p_brand"), lit("#"), lit(2)).as("brand_num"),
          reverse(col("p_type")).as("rev_type"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          instr(col("p_name"), "a").as("first_a")),
      Some("""SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        substring(p_name, 1, 5) AS prefix5, length(p_name) AS name_len,
        concat_ws('-', p_brand, p_type) AS brand_type,
        split_part(p_brand, '#', 2) AS brand_num,
        reverse(p_type) AS rev_type,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        instr(p_name, 'a') AS first_a
        FROM part""")),

    QueryDef("q23_scalar_date",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("timestamp_ntz").as("due_date"),
          last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end")),
      Some("""SELECT o_orderkey,
        CAST(extract(year FROM o_orderdate) AS INT) AS yr,
        CAST(extract(month FROM o_orderdate) AS INT) AS mo,
        CAST(extract(day FROM o_orderdate) AS INT) AS dom,
        CAST(extract(doy FROM o_orderdate) AS INT) AS doy,
        date_trunc('month', o_orderdate) AS month_start,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        o_orderdate + INTERVAL 90 DAY AS due_date,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
        FROM orders""")),

    QueryDef("q24_scalar_math",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") / 7, 2).as("div_round"),
          abs(col("l_discount") - 0.05).as("abs_diff"),
          ceil(col("l_quantity") / 3).as("ceil_q"),
          floor(col("l_quantity") / 3).as("floor_q"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          (col("l_quantity") * col("l_quantity")).as("q_sq"),
          pmod(col("l_orderkey"), lit(7)).as("mod7"),
          signum(col("l_discount") - 0.05).as("sign_d"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate")),
      Some("""SELECT l_orderkey, l_linenumber,
        round(l_extendedprice / 7, 2) AS div_round,
        abs(l_discount - 0.05) AS abs_diff,
        CAST(ceil(l_quantity / 3) AS BIGINT) AS ceil_q,
        CAST(floor(l_quantity / 3) AS BIGINT) AS floor_q,
        sqrt(l_quantity) AS sqrt_q,
        l_quantity * l_quantity AS q_sq,
        l_orderkey % 7 AS mod7,
        CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
        greatest(l_discount, l_tax) AS max_rate,
        least(l_discount, l_tax) AS min_rate
        FROM lineitem WHERE l_orderkey % 100 = 0""")),

    QueryDef("q25_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy(col("k_val")).agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, COUNT(*) AS n
        FROM events GROUP BY 1""")),

    QueryDef("q26_array_ops",
      (s, dir) => {
        val toks = split(col("text"), " ")
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_distinct"),
            array_contains(toks, "data").as("has_data"),
            element_at(sort_array(toks), 1).as("first_sorted"),
            concat_ws(" ", slice(toks, 1, 3)).as("first3"))
      },
      Some("""SELECT doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        list_contains(string_split(text, ' '), 'data') AS has_data,
        list_sort(string_split(text, ' '))[1] AS first_sorted,
        array_to_string(string_split(text, ' ')[1:3], ' ') AS first3
        FROM documents""")),

    QueryDef("q27_case_coalesce",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("bal_class"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"))
        .groupBy(col("bal_class"), col("seg")).agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
          WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_class,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg, COUNT(*) AS n
        FROM customer GROUP BY 1, 2""")),

    // approximate: the HLL++ sketch VALUE is engine-internal (DuckDB
    // cannot replay it), but its documented accuracy contract IS
    // cross-engine checkable — the estimate must land within 3x the
    // default rsd (0.05) of the exact distinct count (HLL error is
    // ~N(0, rsd); 3 sigma). Spark's sketch is deterministic for fixed
    // data, so the boolean is stable run-to-run; the oracle computes the
    // exact side and asserts the bound. The bit-exact estimator rendering
    // is q28_kmv_distinct below.
    QueryDef("q28_approx_count_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("n_exact"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n_exact"), col("n"),
          (abs(col("approx_parts").cast("double") - col("n_exact").cast("double"))
            <= col("n_exact").cast("double") * 0.15).as("hll_within_3rsd")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact,
        COUNT(*) AS n, TRUE AS hll_within_3rsd
        FROM lineitem GROUP BY 1""")),

    // Count-Min heavy hitters (Cormode & Muthukrishnan 2005): a MERGEABLE
    // frequency sketch built distributively (map-side partial sketches,
    // one treeAggregate merge — never a key shuffle), then the top
    // true-heavy keys are probed against it. The CMS guarantee is
    // one-sided: estimate >= exact always, and <= exact + eps*N with the
    // chosen confidence — like the HLL row, the sketch is engine-internal
    // so the ORACLE checks the accuracy contract (the boolean), which is
    // deterministic for a fixed seed. At 100 TB this is how per-key
    // frequencies surface without shuffling the key universe: KB-sized
    // partials merge on the driver/collector regardless of corpus size.
    QueryDef("q51_count_min_heavy_hitters",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val eps = 0.001
        val sketch = ev.stat.countMinSketch(col("user_id"), eps = eps,
          confidence = 0.99, seed = 42)
        val n = sketch.totalCount()
        val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
          .sort(col("n_exact").desc, col("user_id")).limit(20)
          .collect()
          .map { r =>
            val (uid, exact) = (r.getLong(0), r.getLong(1))
            val est = sketch.estimateCount(Long.box(uid))
            (uid, exact, est >= exact && est <= exact + (eps * n).ceil.toLong)
          }.toSeq
        import s.implicits._
        top.toDF("user_id", "n_exact", "cms_within_eps")
      },
      Some("""SELECT user_id, n_exact, TRUE AS cms_within_eps FROM (
        SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1
        ORDER BY n_exact DESC, user_id LIMIT 20) t""")),

    // approx_percentile accuracy contract (Greenwald–Khanna style
    // quantile summary — mergeable, map-side partials): with accuracy
    // 1000 the rank error is <= n/1000, far inside the exact 45th–55th
    // percentile band used as the bound. Engine-internal summary, so the
    // oracle checks the contract boolean (deterministic for fixed data)
    // — same pattern as the HLL and Count-Min rows.
    QueryDef("q52_approx_percentile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_med"),
          expr("percentile(l_extendedprice, 0.45)").as("lo"),
          expr("percentile(l_extendedprice, 0.55)").as("hi"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          (col("approx_med") >= col("lo") && col("approx_med") <= col("hi"))
            .as("approx_median_in_band")),
      Some("""SELECT l_returnflag, COUNT(*) AS n, TRUE AS approx_median_in_band
        FROM lineitem GROUP BY 1""")),

    // large×large interval overlap join through the banded equi-join
    // operator (operators.IntervalJoin): two event-derived interval sets
    // (10-minute and 7-minute activity windows), joined shuffle-safe on
    // 5-minute buckets with canonical-bucket dedup. The oracle is the
    // plain quadratic theta join — the banding must be lossless and
    // emit each pair exactly once.
    QueryDef("q53_interval_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.filter(pmod(col("event_id"), lit(40)) === 0)
          .select(col("event_id").as("id_a"), unix_micros(col("ts")).as("a_s"),
            (unix_micros(col("ts")) + 600000000L).as("a_e"))
        val b = ev.filter(pmod(col("event_id"), lit(40)) === 1)
          .select(col("event_id").as("id_b"), unix_micros(col("ts")).as("b_s"),
            (unix_micros(col("ts")) + 420000000L).as("b_e"))
        graft.operators.IntervalJoin
          .overlaps(a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = 300000000L)
          .select(col("id_a"), col("id_b"),
            (least(col("a_e"), col("b_e")) -
              greatest(col("a_s"), col("b_s"))).as("overlap_us"))
      },
      Some("""WITH a AS (SELECT event_id AS id_a, epoch_us(ts) AS a_s,
          epoch_us(ts) + 600000000 AS a_e FROM events WHERE event_id % 40 = 0),
        b AS (SELECT event_id AS id_b, epoch_us(ts) AS b_s,
          epoch_us(ts) + 420000000 AS b_e FROM events WHERE event_id % 40 = 1)
        SELECT id_a, id_b,
          CAST(least(a_e, b_e) - greatest(a_s, b_s) AS BIGINT) AS overlap_us
        FROM a JOIN b ON a_s <= b_e AND b_s <= a_e""")),

    // the hybrid long-interval form (IntervalJoin.overlapsHybrid):
    // every 10th left interval spans 10 HOURS — under pure banding each
    // would explode into span/width bucket rows; the hybrid split
    // routes them through a broadcast theta join while the short mass
    // keeps the banded equi-join, with the bucket width auto-picked
    // from the median interval length. The oracle stays the plain
    // quadratic theta join — the split must be lossless and emit each
    // pair exactly once whatever leg it lands in.
    QueryDef("q54_interval_join_hybrid",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.filter(pmod(col("event_id"), lit(40)) === 0)
          .select(col("event_id").as("id_a"), unix_micros(col("ts")).as("a_s"),
            (unix_micros(col("ts")) +
              when(pmod(col("event_id"), lit(400)) === 0, lit(36000000000L))
                .otherwise(lit(600000000L))).as("a_e"))
        val b = ev.filter(pmod(col("event_id"), lit(40)) === 1)
          .select(col("event_id").as("id_b"), unix_micros(col("ts")).as("b_s"),
            (unix_micros(col("ts")) + 420000000L).as("b_e"))
        graft.operators.IntervalJoin
          .overlapsHybrid(a, b, "a_s", "a_e", "b_s", "b_e") // auto width
          .select(col("id_a"), col("id_b"),
            (least(col("a_e"), col("b_e")) -
              greatest(col("a_s"), col("b_s"))).as("overlap_us"))
      },
      Some("""WITH a AS (SELECT event_id AS id_a, epoch_us(ts) AS a_s,
          epoch_us(ts) + CASE WHEN event_id % 400 = 0
            THEN 36000000000 ELSE 600000000 END AS a_e
          FROM events WHERE event_id % 40 = 0),
        b AS (SELECT event_id AS id_b, epoch_us(ts) AS b_s,
          epoch_us(ts) + 420000000 AS b_e FROM events WHERE event_id % 40 = 1)
        SELECT id_a, id_b,
          CAST(least(a_e, b_e) - greatest(a_s, b_s) AS BIGINT) AS overlap_us
        FROM a JOIN b ON a_s <= b_e AND b_s <= a_e""")),

    // KMV (bottom-k / k-minimum-values) distinct estimator — the
    // oracle-checkable approximate-distinct rendering: the k smallest
    // splitmix64 hashes of the key bound the hash-space density, so
    // estimate = (k-1) / fraction-of-space-below-the-kth. Every step is
    // deterministic and cross-engine reproducible: mix64 re-derived in
    // HUGEINT wrapping arithmetic, the bottom-k selected in the SAME
    // signed-biased order, and the final estimate computed with an
    // IDENTICAL double op sequence (one add, one divide, one floor), so
    // the estimate hash-matches bit-for-bit. At scale the bottom-k runs
    // through the bounded TopKPerKey operator (per-partition partial
    // selection + merge), never a full per-group sort. KMV per
    // Bar-Yossef et al. 2002, "Counting distinct elements in a data
    // stream".
    QueryDef("q28_kmv_distinct",
      (s, dir) => {
        val k = 256
        // mix64 is injective on longs, so distinct hashes == distinct keys
        val hashed = t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            graft.functions.HashFunctions.mix64Col(col("l_partkey")).as("h"))
          .distinct()
          // biased view: flipping the sign bit makes SIGNED order equal
          // UNSIGNED hash order on both engines
          .select(col("l_returnflag"),
            col("h").bitwiseXOR(lit(Long.MinValue)).as("us"))
        val bottomK = graft.plans.TopKPerKey(hashed,
          keys = Seq(col("l_returnflag")),
          order = Seq(col("us").asc),
          k = k, rankName = "rn")
        bottomK.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"), max(col("us")).as("uk"))
          .select(col("l_returnflag"),
            when(col("cnt") < k, col("cnt"))
              // (k-1) * 2^64 / unsigned(uk), all in double: constants are
              // exact powers-of-two multiples, the op sequence matches the
              // oracle literally
              .otherwise(floor(lit(4.70391973879593566208e21) /
                (col("uk").cast("double") + lit(9.223372036854775808e18))))
              .cast("long").as("kmv_distinct"))
      },
      Some("""WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
        k0 AS (SELECT l_returnflag, l_partkey::HUGEINT AS ku FROM d),
        m1 AS (SELECT l_returnflag, (ku + 11400714819323198485) % 18446744073709551616 AS saa FROM k0),
        m2 AS (SELECT l_returnflag, (((xor(saa, saa >> 30)) % 4294967296) * ((13787848793156543929) % 4294967296) + ((((xor(saa, saa >> 30)) // 4294967296) * ((13787848793156543929) % 4294967296) + ((xor(saa, saa >> 30)) % 4294967296) * ((13787848793156543929) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS sab FROM m1),
        m3 AS (SELECT l_returnflag, (((xor(sab, sab >> 27)) % 4294967296) * ((10723151780598845931) % 4294967296) + ((((xor(sab, sab >> 27)) // 4294967296) * ((10723151780598845931) % 4294967296) + ((xor(sab, sab >> 27)) % 4294967296) * ((10723151780598845931) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS sac FROM m2),
        m4 AS (SELECT l_returnflag, xor(sac, sac >> 31) AS m FROM m3),
        b AS (SELECT l_returnflag,
          xor((CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616 ELSE m END)::BIGINT,
              -9223372036854775808) AS us FROM m4),
        r AS (SELECT l_returnflag, us,
          row_number() OVER (PARTITION BY l_returnflag ORDER BY us) AS rn FROM b),
        t AS (SELECT l_returnflag, COUNT(*) AS cnt, MAX(us) AS uk
          FROM r WHERE rn <= 256 GROUP BY 1)
        SELECT l_returnflag,
          CAST(CASE WHEN cnt < 256 THEN cnt
            ELSE floor(4.70391973879593566208e21 / (CAST(uk AS DOUBLE) + 9.223372036854775808e18))
            END AS BIGINT) AS kmv_distinct
        FROM t""")),

    // ---- time-windowed aggregation (batch form of the streaming ops) ----
    QueryDef("q29_tumbling_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n"), col("sum_value")),
      Some("""SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""")),

    QueryDef("q30_sliding_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start"), col("n"), col("sum_value")),
      Some("""WITH starts AS (
          SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start, value FROM events
          UNION ALL
          SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - 300 AS window_start, value FROM events)
        SELECT window_start, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM starts GROUP BY 1""")),

    QueryDef("q34_from_json",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_val"),
          get_json_object(col("props"), "$.k").isNotNull.as("has_k")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        json_extract_string(props, '$.k') IS NOT NULL AS has_k FROM events""")),

    // str_to_map round trip: format a k/v string from columns, parse it
    // back — parse(format(x)) = x is the oracle property.
    QueryDef("q35_str_to_map",
      (s, dir) => {
        val m = str_to_map(
          concat(lit("brand="), col("p_brand"), lit("&size="), col("p_size")),
          lit("&"), lit("="))
        t(s, dir, "part")
          .select(col("p_partkey"),
            m.getItem("brand").as("brand"), m.getItem("size").as("size"))
      },
      Some("""SELECT p_partkey, p_brand AS brand, CAST(p_size AS VARCHAR) AS size
        FROM part""")),

    QueryDef("q32_percentiles",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("median_value"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value")),
      Some("""SELECT event_type,
        round(quantile_cont(value, 0.5), 6) AS median_value,
        round(quantile_cont(value, 0.9), 6) AS p90_value,
        min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY event_type""")),

    // variance/stddev computed from decimal-exact power sums: engine
    // built-ins use order-dependent streaming formulas (Welford) that
    // aren't cross-engine reproducible on doubles; the closed form over
    // exact sums is.
    QueryDef("q33_variance",
      (s, dir) => {
        val v = col("value").cast("decimal(18,2)")
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(v).cast("double").as("s1"),
            sum(v * v).cast("double").as("s2"))
          .select(col("user_id"), col("n"),
            round((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 6)
              .as("var_value"))
      },
      Some("""WITH sums AS (SELECT user_id, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
        FROM events GROUP BY user_id)
        SELECT user_id, n, round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_value
        FROM sums""")),

    QueryDef("q36_array_hof",
      (s, dir) => {
        val toks = split(col("text"), " ")
        t(s, dir, "documents").select(col("doc_id"),
          size(filter(toks, t => length(t) > 5)).as("n_long"),
          exists(toks, t => length(t) < 3).as("has_short"),
          concat_ws(" ", transform(slice(toks, 1, 3), t => upper(t))).as("first3_upper"),
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("total_chars"))
      },
      Some("""SELECT doc_id,
        len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS n_long,
        len(list_filter(string_split(text, ' '), t -> length(t) < 3)) > 0 AS has_short,
        array_to_string(list_transform(string_split(text, ' ')[1:3], t -> upper(t)), ' ')
          AS first3_upper,
        list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
          t -> CAST(length(t) AS INT))), (a, b) -> a + b) AS total_chars
        FROM documents""")),

    // the same tumbling aggregation as q29, but executed through
    // Structured Streaming (file source -> watermark -> windowed agg ->
    // memory sink, Trigger.AvailableNow) — the batch/stream duality
    // SURVEY §1.2 commits to, inside the correctness gate itself.
    QueryDef("stream_tumbling_window",
      (s, dir) => {
        // streaming sources need an explicit schema: take it from the
        // file's own footer (via a batch read) rather than hardcoding one,
        // so fixture regeneration with a different ts encoding can't
        // silently corrupt the stream. normalizeTs then adapts either
        // encoding (nanos-as-long or standard TIMESTAMP) to micros. The
        // file streaming source monitors a DIRECTORY; the single table
        // file is exposed through a temp-dir symlink. (All shared with
        // the sliding/session twins via eventsStream.)
        val agg = eventsStream(s, dir).withWatermark("ts", "1 minute")
          .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(unix_timestamp(col("w.start")).as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
        graft.streaming.Streams.runToMemory(s, agg,
          s"stream_tumbling_${System.nanoTime()}", outputMode = "complete")
      },
      Some("""SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""")),

    // q30's sliding window executed through Structured Streaming — the
    // second oracle-pinned point of the batch/stream duality contract
    // (SURVEY §1.2): identical rows to the batch q30 plan, same DuckDB
    // twin. Complete output mode, as in the tumbling twin: AvailableNow
    // processes the bounded drop-zone in one pass and windows near the
    // max event time would never cross an append-mode watermark.
    QueryDef("stream_sliding_window",
      (s, dir) => {
        val agg = eventsStream(s, dir).withWatermark("ts", "1 minute")
          .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(unix_timestamp(col("w.start")).as("window_start"),
            col("n"), col("sum_value"))
        graft.streaming.Streams.runToMemory(s, agg,
          s"stream_sliding_${System.nanoTime()}", outputMode = "complete")
      },
      Some("""WITH starts AS (
          SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start, value FROM events
          UNION ALL
          SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - 300 AS window_start, value FROM events)
        SELECT window_start, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM starts GROUP BY 1""")),

    // ...and q31's session windows through the streaming session-window
    // state operator — the HARD duality case (sessions must merge when
    // later events bridge two provisional sessions; Spark's
    // MergingSortWithSessionWindowStateIterator path). Same rows and
    // DuckDB twin as the batch q31. Session windows require a non-window
    // grouping key (user_id here) and support append/complete; complete
    // is used for the same bounded-drop-zone reason as above.
    QueryDef("stream_session_window",
      (s, dir) => {
        val agg = eventsStream(s, dir).withWatermark("ts", "1 minute")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
            col("n_events"), col("sum_value"))
        graft.streaming.Streams.runToMemory(s, agg,
          s"stream_session_${System.nanoTime()}", outputMode = "complete")
      },
      Some("""WITH x AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x)
        SELECT user_id, epoch_us(min(ts)) AS session_start, COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM y GROUP BY user_id, sid""")),

    QueryDef("q31_session_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
          col("n_events"), col("sum_value")),
      Some("""WITH x AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x)
        SELECT user_id, epoch_us(min(ts)) AS session_start, COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM y GROUP BY user_id, sid""")),

    // distribution window functions (ntile / percent_rank / cume_dist)
    // over a fully deterministic order. Compared as floor(x * 1e6)
    // integers: k/n can land EXACTLY on a half at the 6th decimal when
    // the partition size is 2^a*5^b, and there round() diverges across
    // engines (decimal-string HALF_UP vs scaled-double rounding); floor
    // over the identical IEEE doubles is bit-deterministic.
    QueryDef("q45_window_distribution",
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            ntile(4).over(w).as("quartile"),
            floor(percent_rank().over(w) * 1000000).cast("long").as("pct_rank_ppm"),
            floor(cume_dist().over(w) * 1000000).cast("long").as("cume_ppm"))
      },
      Some("""SELECT c_custkey, c_nationkey,
          ntile(4) OVER w AS quartile,
          CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_ppm,
          CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_ppm
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""")),

    // ---- subqueries -----------------------------------------------------
    // The SQL subquery surface (EXISTS / NOT EXISTS / IN / correlated and
    // uncorrelated scalar). Catalyst decorrelates each into a join —
    // EXISTS/IN → left-semi, NOT EXISTS → left-anti, correlated scalar →
    // aggregate + left-outer — so at scale these run as ordinary shuffled
    // or broadcast joins, never per-row re-execution.

    // TPC-H Q4 pattern: orders with at least one late-shipping lineitem.
    QueryDef("q40_exists_subquery",
      (s, dir) => {
        Seq("orders", "lineitem").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
          WHERE EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 80 DAYS)
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
        GROUP BY o_orderpriority""")),

    // orders none of whose lineitems reach quantity 45 (anti-join form).
    QueryDef("q41_not_exists_subquery",
      (s, dir) => {
        Seq("orders", "lineitem").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
          GROUP BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        GROUP BY o_orderstatus""")),

    // IN over a filtered dimension (semi-join; the customer side is the
    // small one and broadcasts).
    QueryDef("q42_in_subquery",
      (s, dir) => {
        Seq("orders", "customer").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
          WHERE o_custkey IN
            (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE o_custkey IN
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority""")),

    // correlated scalar subquery (TPC-H Q17 shape): customers richer than
    // every supplier in their nation. MAX is comparison-only — no float
    // arithmetic — so the result is exact in both engines.
    QueryDef("q43_scalar_subquery_corr",
      (s, dir) => {
        Seq("customer", "supplier").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""SELECT c_custkey, c_acctbal FROM customer c
          WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM supplier s
            WHERE s.s_nationkey = c.c_nationkey)""")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer c
        WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM supplier s
          WHERE s.s_nationkey = c.c_nationkey)""")),

    // uncorrelated scalar subqueries: parts above the mean retail price,
    // phrased as the EXACT cross-multiplied decimal comparison
    // (price * n > sum) so no engine-specific AVG rounding is involved.
    QueryDef("q44_scalar_subquery",
      (s, dir) => {
        t(s, dir, "part").createOrReplaceTempView("part")
        s.sql("""SELECT p_brand, COUNT(*) AS n FROM part
          WHERE CAST(p_retailprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM part)
            > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) FROM part)
          GROUP BY p_brand""")
      },
      Some("""SELECT p_brand, COUNT(*) AS n FROM part
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM part)
          > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) FROM part)
        GROUP BY p_brand""")),

    // recursive CTE (Spark 4 WITH RECURSIVE): generate the order-date
    // month calendar by recursion (1995-01 .. 2001-12, integer-step so
    // both engines recurse identically), left-join monthly order
    // aggregates onto it — months with no orders stay visible as zeros.
    // Recursion depth 84 « the engine's recursion limit; the join side
    // aggregates BEFORE joining, so the recursion never re-scans orders.
    QueryDef("q47_recursive_cte",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""WITH RECURSIVE r(n) AS (
            SELECT 0 UNION ALL SELECT n + 1 FROM r WHERE n < 83
          ),
          m AS (SELECT CAST(make_date(1995 + n div 12, 1 + n % 12, 1) AS TIMESTAMP_NTZ) AS month_start FROM r),
          o AS (SELECT CAST(date_trunc('MONTH', o_orderdate) AS TIMESTAMP_NTZ) AS mo,
                  COUNT(*) AS n_orders,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
                FROM orders GROUP BY 1)
          SELECT month_start, COALESCE(n_orders, 0) AS n_orders,
            COALESCE(total_price, CAST(0.0 AS DOUBLE)) AS total_price
          FROM m LEFT JOIN o ON o.mo = m.month_start""")
      },
      Some("""WITH RECURSIVE r(n) AS (
          SELECT 0 UNION ALL SELECT n + 1 FROM r WHERE n < 83
        ),
        m AS (SELECT CAST(make_date(1995 + n // 12, 1 + n % 12, 1) AS TIMESTAMP) AS month_start FROM r),
        o AS (SELECT date_trunc('month', o_orderdate) AS mo,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
              FROM orders GROUP BY 1)
        SELECT month_start, COALESCE(n_orders, 0) AS n_orders,
          COALESCE(total_price, 0.0) AS total_price
        FROM m LEFT JOIN o ON o.mo = m.month_start""")),

    // LATERAL correlated subquery: top-2 customers by balance per
    // nation. Catalyst plans the lateral as a decorrelated join +
    // per-group top-k (same shape RewriteWindowTopK targets); ties are
    // broken by c_custkey so both engines pick identical rows.
    QueryDef("q48_lateral_topk",
      (s, dir) => {
        Seq("nation", "customer").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""SELECT n_name, c.c_custkey, c.c_acctbal
          FROM nation n JOIN LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""")
      },
      Some("""SELECT n_name, c.c_custkey, c.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""")),

    // UNPIVOT (Spark 4 Dataset.unpivot / SQL melt): widen per-flag
    // aggregates then fold the measure columns into (measure, value)
    // rows — the long-form reshape feeding metric stores. All measures
    // cast to DOUBLE through exact decimal sums so values hash-match.
    QueryDef("q49_unpivot",
      (s, dir) => {
        val wide = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).cast("double").as("n_rows"))
        wide.unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          variableColumnName = "measure",
          valueColumnName = "value")
      },
      Some("""WITH wide AS (SELECT l_returnflag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          CAST(COUNT(*) AS DOUBLE) AS n_rows
        FROM lineitem GROUP BY l_returnflag)
        UNPIVOT wide ON sum_qty, sum_price, n_rows
        INTO NAME measure VALUE value"""))
  )
}
