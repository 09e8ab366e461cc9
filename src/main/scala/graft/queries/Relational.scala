package graft.queries

import graft.Graft.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory over the driver's TPC-H-ish tables.
  *
  * Each query exercises one operator family from SURVEY.md §2 (the reference's
  * capability surface — reference cites in each Scaladoc), re-expressed
  * Spark-first over the shared fixture tables so the driver's DuckDB oracle can
  * hash-check results.
  *
  * Scale posture: all aggregations are partial-aggregable (map-side combine),
  * all dimension joins are explicitly `broadcast()`, and no query collects data
  * to the driver. Filters/projections stay at the head of the plan so Catalyst
  * pushes them into the parquet scan.
  */
object Relational {

  private val money = DecimalType(12, 2)

  /** TPC-H Q1-shaped pricing summary: scan → filter → hash-agg (map-side
    * partial) → sort. Mirrors reference aggregation surface (SURVEY §2.4) at
    * fixture scale. Money math goes through exact DECIMAL so the result is
    * bit-identical regardless of partitioning / summation order — this is also
    * the right 100 TB posture (float sums are non-deterministic across runs).
    */
  val q01PricingSummary = GraftQuery(
    "q01_pricing_summary",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(money)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(money)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast(money) * (lit(1).cast(money) - col("l_discount").cast(money))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(money)).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(col("l_discount").cast(money)).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** Projection + typed casts + range/compound predicates (SURVEY §2.2 P1-P5).
    * Filters are sargable and reach the parquet scan as PushedFilters; the
    * 4-column ReadSchema out of a 10-column table shows column pruning.
    */
  val q02FilterProject = GraftQuery(
    "q02_filter_project",
    (s, dir) =>
      table(s, dir, "lineitem")
        .filter(
          col("l_shipdate").between(lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
            && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          (col("l_extendedprice") * col("l_discount")).as("disc_amount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100),
    Some("""
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty_int,
             l_extendedprice * l_discount AS disc_amount
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber
      LIMIT 100"""))

  /** Left equi-join for FK resolution with null-default on miss (SURVEY §2.3 J1
    * + §2.2 P8 — reference `bronze_to_silver_pipeline.sql:361-363`, gold
    * coalesce). The filtered customer side is small → broadcast, no shuffle of
    * the fact side.
    */
  val q03LeftJoin = GraftQuery(
    "q03_left_join_enrich",
    (s, dir) => {
      val rich = table(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      table(s, dir, "orders")
        .join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left")
        .select(
          col("o_orderkey"),
          col("o_totalprice"),
          coalesce(col("c_name"), lit("(none)")).as("customer_name"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
        .orderBy(col("o_orderkey"))
        .limit(200)
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
             COALESCE(c_name, '(none)') AS customer_name,
             COALESCE(c_mktsegment, 'UNKNOWN') AS segment
      FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        ON o_custkey = c_custkey
      ORDER BY o_orderkey
      LIMIT 200"""))

  /** Star join: fact × 3 broadcast dims, then grouped rollup of revenue
    * (SURVEY §2.3 J4 — gold star joins). At 100 TB the dims stay broadcast
    * (region/nation/supplier are tiny); only the fact-side aggregation
    * shuffles, on the group keys.
    */
  val q04StarJoin = GraftQuery(
    "q04_star_join_revenue",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = table(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val reg = table(s, dir, "region").select("r_regionkey", "r_name")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(
          sum((col("l_extendedprice").cast(money) * (lit(1).cast(money) - col("l_discount").cast(money))))
            .cast("double").as("revenue"),
          count(lit(1)).as("line_count"))
        .orderBy(col("region_name"), col("nation_name"))
    },
    Some("""
      SELECT r_name AS region_name, n_name AS nation_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS line_count
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY region_name, nation_name"""),
    bench = true)

  /** Top-1 subquery cross-joined onto every row — the reference's scalar
    * broadcast idiom (SURVEY §2.3 J3 + §2.6 O1 — `bronze_to_silver_pipeline
    * .sql:368-372,398-399`). The 1-row side is broadcast: a
    * BroadcastNestedLoopJoin, no shuffle.
    */
  val q05CrossJoinScalar = GraftQuery(
    "q05_cross_join_scalar",
    (s, dir) => {
      val orders = table(s, dir, "orders")
      val top1 = orders
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1)
        .select(col("o_orderdate").cast("date").as("global_latest"))
      orders
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("order_count"), max(col("o_orderdate")).cast("date").as("status_latest"))
        .crossJoin(broadcast(top1))
        .select(
          col("o_orderstatus"),
          col("order_count"),
          col("status_latest"),
          datediff(col("global_latest"), col("status_latest")).as("days_behind"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      WITH top1 AS (
        SELECT CAST(o_orderdate AS DATE) AS global_latest
        FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1)
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS order_count,
             CAST(MAX(o_orderdate) AS DATE) AS status_latest,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE), global_latest) AS INT) AS days_behind
      FROM orders CROSS JOIN top1
      GROUP BY o_orderstatus, global_latest
      ORDER BY o_orderstatus"""))

  /** Left anti-join as set difference (SURVEY §2.3 J5 — the dbt
    * `warn_new_traffic_source_ids` pattern). */
  val q06AntiJoin = GraftQuery(
    "q06_anti_join",
    (s, dir) => {
      val cust = table(s, dir, "customer")
      val ord = table(s, dir, "orders").select(col("o_custkey"))
      cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** Left semi-join (existence filter) — complement of q06. */
  val q07SemiJoin = GraftQuery(
    "q07_semi_join",
    (s, dir) => {
      val cust = table(s, dir, "customer")
      val big = table(s, dir, "orders").filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      cust
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("customers_with_big_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS customers_with_big_orders
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Latest-wins window dedup — THE dominant reference idiom (SURVEY §2.5 W1,
    * 11 instances — `bronze_to_silver_pipeline.sql:48-51` et al): row_number
    * over (key ORDER BY recency DESC, tiebreak DESC), keep rn=1. One shuffle on
    * the partition key; sort is within-partition.
    */
  val q08WindowDedup = GraftQuery(
    "q08_window_dedup_latest",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      table(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_event_type"), col("value").as("last_value"),
          col("event_id").as("last_event_id"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, event_type AS last_event_type, value AS last_value,
             event_id AS last_event_id
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id"""),
    bench = true)

  /** SCD2 versioning: lag() change detection + lead() validity windows +
    * surrogate key hash + open-ended sentinel (SURVEY §2.5 W2/W3, §2.8 F8/F16 —
    * `bronze_to_silver_pipeline.sql:213-297`). Tracks event_type changes per
    * user as versioned state. The surrogate key hashes epoch-micros (not the
    * rendered timestamp) so it is engine-render-independent.
    */
  val q09Scd2 = GraftQuery(
    "q09_scd2_versions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val changes = table(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      changes
        .withColumn("next_ts", lead(col("ts"), 1).over(w2))
        .select(
          sha2(concat_ws("||", col("user_id"), unix_micros(col("ts"))), 256).as("state_sk"),
          col("user_id"),
          col("event_type").as("state"),
          col("ts").as("valid_from"),
          coalesce(expr("next_ts - INTERVAL 1 MICROSECOND"),
            lit("9999-12-31 23:59:59.999999").cast("timestamp")).as("valid_to"),
          col("next_ts").isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    },
    Some("""
      WITH changes AS (
        SELECT * FROM (
          SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
          FROM events)
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT sha256(concat(user_id, '||', epoch_us(ts))) AS state_sk,
             user_id, event_type AS state, ts AS valid_from,
             COALESCE(lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - INTERVAL 1 MICROSECOND,
                      TIMESTAMP '9999-12-31 23:59:59.999999') AS valid_to,
             (lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL) AS is_current
      FROM changes
      ORDER BY user_id, valid_from"""),
    bench = true)

  /** Top-k by aggregate with deterministic tie-break (SURVEY §2.6 O1-O3).
    * TakeOrderedAndProject physical op — no full sort at scale.
    */
  val q10TopK = GraftQuery(
    "q10_topk_customers",
    (s, dir) => {
      val rev = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(money)).cast("double").as("revenue"), count(lit(1)).as("order_count"))
      rev
        .join(broadcast(table(s, dir, "customer").select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("order_count"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(10)
    },
    Some("""
      SELECT c_custkey, c_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey ASC
      LIMIT 10"""))

  /** UNION + DISTINCT across sources — the reference dim_date idiom (SURVEY
    * §2.7 U1 — `bronze_to_silver_pipeline.sql:962-972`). */
  val q11UnionDistinct = GraftQuery(
    "q11_union_distinct_dates",
    (s, dir) => {
      val d1 = table(s, dir, "orders").select(col("o_orderdate").cast("date").as("d"))
      val d2 = table(s, dir, "lineitem").select(col("l_shipdate").cast("date").as("d"))
      d1.union(d2)
        .distinct()
        .select(col("d"), year(col("d")).as("year"), month(col("d")).as("month"),
          dayofmonth(col("d")).as("day_of_month"), dayofweek(col("d")).as("day_of_week"),
          dayofweek(col("d")).isin(1, 7).as("is_weekend"))
        .orderBy(col("d"))
    },
    Some("""
      SELECT d, CAST(year(d) AS INT) AS year, CAST(month(d) AS INT) AS month,
             CAST(day(d) AS INT) AS day_of_month,
             CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
             (dayofweek(d) + 1) IN (1, 7) AS is_weekend
      FROM (SELECT CAST(o_orderdate AS DATE) AS d FROM orders
            UNION SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem)
      ORDER BY d"""))

  /** UNION ALL with null-padded column alignment (SURVEY §2.7 U2 — the dbt
    * freshness/non-negative test stacking with `cast(null as bigint)`). */
  val q12UnionAllPad = GraftQuery(
    "q12_union_all_padded",
    (s, dir) => {
      val o = table(s, dir, "orders").select(
        lit("orders").as("source"),
        col("o_orderkey").as("key"),
        col("o_totalprice").cast(money).as("amount"),
        lit(null).cast("bigint").as("qty"))
      val l = table(s, dir, "lineitem").select(
        lit("lineitem").as("source"),
        col("l_orderkey").as("key"),
        col("l_extendedprice").cast(money).as("amount"),
        col("l_quantity").cast("bigint").as("qty"))
      o.unionByName(l)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("row_count"),
          sum(col("amount")).cast("double").as("total_amount"),
          sum(col("qty")).as("total_qty"))
        .orderBy(col("source"))
    },
    Some("""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS row_count,
             CAST(SUM(amount) AS DOUBLE) AS total_amount,
             CAST(SUM(qty) AS BIGINT) AS total_qty
      FROM (
        SELECT 'orders' AS source, o_orderkey AS key,
               CAST(o_totalprice AS DECIMAL(12,2)) AS amount, CAST(NULL AS BIGINT) AS qty
        FROM orders
        UNION ALL
        SELECT 'lineitem' AS source, l_orderkey AS key,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS amount, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem)
      GROUP BY source
      ORDER BY source"""))

  /** DISTINCT projection (SURVEY §2.4 A4). */
  val q13Distinct = GraftQuery(
    "q13_distinct_flags",
    (s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** GROUP BY + HAVING — the dbt uniqueness-by-grain test shape (SURVEY §2.4
    * A1 — `test_gold_*_unique.sql`). */
  val q14Having = GraftQuery(
    "q14_having_heavy_orders",
    (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("line_count"))
        .filter(col("line_count") > 4)
        .orderBy(col("l_orderkey")),
    Some("""
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS line_count
      FROM lineitem
      GROUP BY l_orderkey
      HAVING COUNT(*) > 4
      ORDER BY l_orderkey"""))

  /** Global aggregates: COUNT(*), MIN/MAX, COUNT(DISTINCT) (SURVEY §2.4
    * A2/A3). Single-row result; count-distinct is the only full-shuffle agg.
    */
  val q15GlobalAgg = GraftQuery(
    "q15_global_aggs",
    (s, dir) =>
      table(s, dir, "lineitem").agg(
        count(lit(1)).as("total_rows"),
        min(col("l_shipdate")).cast("date").as("min_shipdate"),
        max(col("l_shipdate")).cast("date").as("max_shipdate"),
        max(col("l_quantity")).as("max_qty"),
        countDistinct(col("l_orderkey")).as("distinct_orders")),
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
             CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
             CAST(MAX(l_shipdate) AS DATE) AS max_shipdate,
             MAX(l_quantity) AS max_qty,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders
      FROM lineitem"""))

  /** CASE WHEN conditional buckets (SURVEY §2.2 P7). */
  val q16CaseWhen = GraftQuery(
    "q16_case_when_tiers",
    (s, dir) =>
      table(s, dir, "orders")
        .withColumn("tier",
          when(col("o_totalprice") > 200000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low"))
        .groupBy(col("o_orderstatus"), col("tier"))
        .agg(count(lit(1)).as("order_count"),
          sum(col("o_totalprice").cast(money)).cast("double").as("tier_value"))
        .orderBy(col("o_orderstatus"), col("tier")),
    Some("""
      SELECT o_orderstatus,
             CASE WHEN o_totalprice > 200000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END AS tier,
             CAST(COUNT(*) AS BIGINT) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tier_value
      FROM orders
      GROUP BY 1, 2
      ORDER BY o_orderstatus, tier"""))

  /** String function surface: upper/lower/trim/concat_ws/substring/length
    * (SURVEY §2.8 F7/F10). */
  val q17StringFuncs = GraftQuery(
    "q17_string_funcs",
    (s, dir) =>
      table(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(trim(col("c_name"))).as("name_upper"),
          lower(col("c_mktsegment")).as("segment_lower"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("name_seg"),
          substring(col("c_name"), 1, 10).as("name_prefix"),
          length(col("c_name")).as("name_len"))
        .orderBy(col("c_custkey"))
        .limit(100),
    Some("""
      SELECT c_custkey,
             upper(trim(c_name)) AS name_upper,
             lower(c_mktsegment) AS segment_lower,
             concat_ws('|', c_name, c_mktsegment) AS name_seg,
             substring(c_name, 1, 10) AS name_prefix,
             CAST(length(c_name) AS INT) AS name_len
      FROM customer
      ORDER BY c_custkey
      LIMIT 100"""))

  /** Date/time function surface: year/month/day/dayofweek/weekend flag
    * (SURVEY §2.8 F12/F13 — dim_date at `bronze_to_silver_pipeline.sql:973-983`).
    * DuckDB dayofweek is 0-based (Sun=0), Spark 1-based (Sun=1) — oracle adds 1.
    */
  val q18DateFuncs = GraftQuery(
    "q18_date_funcs",
    (s, dir) =>
      table(s, dir, "orders")
        .withColumn("d", col("o_orderdate").cast("date"))
        .groupBy(year(col("d")).as("order_year"), month(col("d")).as("order_month"))
        .agg(
          count(lit(1)).as("order_count"),
          sum(when(dayofweek(col("d")).isin(1, 7), 1L).otherwise(0L)).as("weekend_orders"))
        .orderBy(col("order_year"), col("order_month")),
    Some("""
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
             CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS order_month,
             CAST(COUNT(*) AS BIGINT) AS order_count,
             CAST(SUM(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) + 1 IN (1, 7) THEN 1 ELSE 0 END) AS BIGINT) AS weekend_orders
      FROM orders
      GROUP BY 1, 2
      ORDER BY order_year, order_month"""))

  /** Null-safe change-detection hash: sha2(concat_ws('||', coalesce(...)))
    * (SURVEY §2.8 F8 — the SCD2 metadata hash at
    * `bronze_to_silver_pipeline.sql:183-207`), plus md5 fingerprint. */
  val q19HashFingerprint = GraftQuery(
    "q19_hash_fingerprint",
    (s, dir) =>
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          sha2(concat_ws("||",
            coalesce(col("p_name"), lit("")),
            coalesce(col("p_brand"), lit("")),
            coalesce(col("p_type"), lit("")),
            coalesce(col("p_size").cast("string"), lit(""))), 256).as("meta_hash"),
          md5(col("p_name")).as("name_md5"))
        .orderBy(col("p_partkey"))
        .limit(200),
    Some("""
      SELECT p_partkey,
             sha256(concat_ws('||', COALESCE(p_name, ''), COALESCE(p_brand, ''),
                              COALESCE(p_type, ''), COALESCE(CAST(p_size AS VARCHAR), ''))) AS meta_hash,
             md5(p_name) AS name_md5
      FROM part
      ORDER BY p_partkey
      LIMIT 200"""))

  /** JSON-in-a-string schema-on-read (SURVEY §1.2, §2.8 F1 — the bronze
    * payload pattern). get_json_object extracts without full parse; at scale
    * prefer from_json with an explicit schema (exercised in the silver
    * pipeline module). */
  val q20JsonExtract = GraftQuery(
    "q20_json_extract",
    (s, dir) =>
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("event_count"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS event_count,
             CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Generator / explode over split tokens (SURVEY §2.8 F2 — explode_outer),
    * aggregated to a deterministic top-20 token list. */
  val q21ExplodeTokens = GraftQuery(
    "q21_explode_tokens",
    (s, dir) =>
      table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("token_count"))
        .orderBy(col("token_count").desc, col("token"))
        .limit(20),
    Some("""
      SELECT token, CAST(COUNT(*) AS BIGINT) AS token_count
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''
      GROUP BY token
      ORDER BY token_count DESC, token
      LIMIT 20"""),
    bench = true)

  /** Array function surface: size / element_at / higher-order aggregate
    * (SURVEY §2.8 F3-F5 — transform/array_position/element_at header binding).
    * Elements are cast to DOUBLE before the fold so both engines do identical
    * double math; result rounded to 6 digits to absorb any fold-order delta. */
  val q22ArrayOps = GraftQuery(
    "q22_array_ops",
    (s, dir) =>
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_component"),
          round(aggregate(transform(col("embedding"), x => x.cast("double")), lit(0.0),
            (acc, x) => acc + x * x), 6).as("sq_norm"))
        .orderBy(col("vec_id"))
        .limit(200),
    Some("""
      SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
             round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm
      FROM embeddings
      ORDER BY vec_id
      LIMIT 200"""))

  /** Inline VALUES relation joined as a dim (SURVEY §2.1 S4, §2.8 F15 — the
    * 249-row country reference / stack() constant lists). */
  val q23ValuesDim = GraftQuery(
    "q23_values_dim_join",
    (s, dir) => {
      import s.implicits._
      val zones = Seq(
        ("AFRICA", "emea"), ("EUROPE", "emea"), ("ASIA", "apac"), ("MIDDLE EAST", "emea"))
        .toDF("zone_region", "zone")
      table(s, dir, "region")
        .join(broadcast(zones), col("r_name") === col("zone_region"), "left")
        .select(col("r_regionkey"), col("r_name"), coalesce(col("zone"), lit("other")).as("zone"))
        .orderBy(col("r_regionkey"))
    },
    Some("""
      SELECT r_regionkey, r_name, COALESCE(zone, 'other') AS zone
      FROM region
      LEFT JOIN (VALUES ('AFRICA', 'emea'), ('EUROPE', 'emea'), ('ASIA', 'apac'),
                        ('MIDDLE EAST', 'emea')) AS z(zone_region, zone)
        ON r_name = zone_region
      ORDER BY r_regionkey"""))

  /** ROLLUP hierarchical aggregation (beyond-reference extension; Spark
    * rollup() ≡ DuckDB GROUP BY ROLLUP). Null grouping keys sort NULLS FIRST
    * on both sides. */
  val q24Rollup = GraftQuery(
    "q24_rollup",
    (s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("line_count"),
          sum(col("l_quantity").cast(money)).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""
      SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS line_count,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** INTERSECT / EXCEPT set ops (beyond-reference; SURVEY §2.7 notes the
    * reference lacks them — a complete engine needs them). */
  val q25SetOps = GraftQuery(
    "q25_intersect_except",
    (s, dir) => {
      val custWithOrders = table(s, dir, "orders").select(col("o_custkey").as("key"))
      val allCust = table(s, dir, "customer").select(col("c_custkey").as("key"))
      val both = allCust.intersect(custWithOrders).withColumn("membership", lit("has_orders"))
      val only = allCust.except(custWithOrders).withColumn("membership", lit("no_orders"))
      both.unionByName(only)
        .groupBy(col("membership"))
        .agg(count(lit(1)).as("customer_count"))
        .orderBy(col("membership"))
    },
    Some("""
      SELECT membership, CAST(COUNT(*) AS BIGINT) AS customer_count
      FROM (
        SELECT key, 'has_orders' AS membership FROM
          (SELECT c_custkey AS key FROM customer INTERSECT SELECT o_custkey AS key FROM orders)
        UNION ALL
        SELECT key, 'no_orders' AS membership FROM
          (SELECT c_custkey AS key FROM customer EXCEPT SELECT o_custkey AS key FROM orders))
      GROUP BY membership
      ORDER BY membership"""))

  val all: Seq[GraftQuery] = Seq(
    q01PricingSummary, q02FilterProject, q03LeftJoin, q04StarJoin, q05CrossJoinScalar,
    q06AntiJoin, q07SemiJoin, q08WindowDedup, q09Scd2, q10TopK,
    q11UnionDistinct, q12UnionAllPad, q13Distinct, q14Having, q15GlobalAgg,
    q16CaseWhen, q17StringFuncs, q18DateFuncs, q19HashFingerprint, q20JsonExtract,
    q21ExplodeTokens, q22ArrayOps, q23ValuesDim, q24Rollup, q25SetOps)
}
