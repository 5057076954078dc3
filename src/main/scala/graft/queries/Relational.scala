package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.tables.Tables
import graft.operators.{AsOfJoin, ChainOps}
import graft.functions.GraftFunctions

/** The relational operator inventory of SURVEY.md §2 (filters F*, joins J*,
  * aggregations A*, windows W*, sorts O*, set-ops, scalar functions C*),
  * expressed over the TESTDATA tables with DuckDB oracles.
  *
  * Numeric convention (see [[graft.Q]]): double aggregates go through
  * DECIMAL(18,4) (exact — source doubles carry <=2 decimals) and come back as
  * DOUBLE, so both engines agree bit-exactly regardless of summation order.
  * Event timestamps are nanosecond longs on the Spark side
  * (spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(us) in DuckDB; both
  * sides therefore compute on microseconds: `ts div 1000` ≡ `epoch_us(ts)`.
  */
object Relational {

  private val D = DecimalType(18, 4)
  private def dec(c: Column): Column = c.cast(D)
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  private val one = lit(1).cast(DecimalType(8, 4))
  private def usCol: Column = expr("ts div 1000")

  val queries: Seq[Q] = Seq(

    // ---------------------------------------------------------- filters (F1–F6)
    Q("f1_point_filter",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name"),
      Some("SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'")),

    Q("f2_exists_semi",
      (s, d) => {
        val c = Tables.customer(s, d); val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)")),

    Q("f3_not_exists_anti",
      (s, d) => {
        val c = Tables.customer(s, d); val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)")),

    Q("f4_conjunctive_filter",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" &&
          col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity < 10")),

    Q("f6_coalesce_null",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("none")).as("et")),
      Some("SELECT event_id, coalesce(nullif(event_type, 'error'), 'none') AS et FROM events")),

    // ------------------------------------------------------------ joins (J1–J13)
    Q("j1_fk_join",
      (s, d) => {
        val o = Tables.orders(s, d); val c = Tables.customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey")).select("o_orderkey", "c_name")
      },
      Some("SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey")),

    Q("j2_outer_join_count",
      (s, d) => {
        val c = Tables.customer(s, d); val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
      },
      Some("SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
        "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey")),

    Q("j3_self_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.select(col("o_orderkey").as("k"))
        val b = o.select(col("o_orderkey").as("k2"), col("o_totalprice").as("next_price"))
        a.join(b, a("k") + 1 === b("k2")).select("k", "next_price")
      },
      Some("SELECT a.o_orderkey AS k, b.o_totalprice AS next_price " +
        "FROM orders a JOIN orders b ON a.o_orderkey + 1 = b.o_orderkey")),

    Q("j5_big_join_agg",
      (s, d) => {
        val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(8, 4))))
              .cast("double").as("revenue"))
      },
      Some("SELECT o_orderpriority, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority")),

    Q("j6_multihop_agg",
      (s, d) => {
        val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
        val c = Tables.customer(s, d); val n = Tables.nation(s, d); val r = Tables.region(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(dsum(col("l_extendedprice")).as("revenue"))
      },
      Some("SELECT r_name, n_name, CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) " +
        "AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name")),

    Q("j7_semi_with_pred",
      (s, d) => {
        val o = Tables.orders(s, d); val l = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d).filter(col("s_nationkey") === 1)
          .select(col("s_suppkey"))
        val lks = l.join(sup, l("l_suppkey") === sup("s_suppkey"), "left_semi")
          .select(col("l_orderkey"))
        o.join(lks, o("o_orderkey") === lks("l_orderkey"), "left_semi")
          .select("o_orderkey")
      },
      Some("SELECT o_orderkey FROM orders WHERE EXISTS (SELECT 1 FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey WHERE l_orderkey = o_orderkey AND s_nationkey = 1)")),

    Q("j8_range_join",
      (s, d) => {
        val p = Tables.part(s, d); val l = Tables.lineitem(s, d)
        p.join(l, p("p_partkey") === l("l_partkey") &&
            l("l_quantity") >= p("p_size") - 5 && l("l_quantity") <= p("p_size") + 5)
          .groupBy("p_brand").agg(count(lit(1)).as("n"))
      },
      Some("SELECT p_brand, count(*) AS n FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5 GROUP BY p_brand")),

    Q("j9_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), usCol.as("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), usCol.as("us"))
        AsOfJoin.lastRightAtOrBefore(purchases, clicks, "user_id", "us", "last_click_us")
          .select("event_id", "last_click_us")
      },
      Some("SELECT e.event_id, (SELECT max(epoch_us(c.ts)) FROM events c " +
        "WHERE c.user_id = e.user_id AND c.event_type = 'click' AND epoch_us(c.ts) <= epoch_us(e.ts)) " +
        "AS last_click_us FROM events e WHERE e.event_type = 'purchase'")),

    Q("j11_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), usCol.as("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), usCol.as("us"))
        AsOfJoin.firstRightAtOrAfter(purchases, clicks, "user_id", "us", "next_click_us")
          .select("event_id", "next_click_us")
      },
      Some("SELECT e.event_id, (SELECT min(epoch_us(c.ts)) FROM events c " +
        "WHERE c.user_id = e.user_id AND c.event_type = 'click' AND epoch_us(c.ts) >= epoch_us(e.ts)) " +
        "AS next_click_us FROM events e WHERE e.event_type = 'purchase'")),

    Q("j10_cross_join",
      (s, d) => {
        val r = Tables.region(s, d)
        val a = r.select(col("r_name").as("name1"))
        val b = r.select(col("r_name").as("name2"))
        a.crossJoin(b).where(col("name1") < col("name2"))
      },
      Some("SELECT a.r_name AS name1, b.r_name AS name2 FROM region a, region b " +
        "WHERE a.r_name < b.r_name")),

    // ----------------------------------------------------- aggregations (A1–A10)
    Q("a1_count_group",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY 1, 2")),

    Q("a3_sum_group",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(8, 4))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order")),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty, " +
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price, " +
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(8,4)) - " +
        "CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price, " +
        "count(*) AS count_order, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus")),

    Q("a5_minmax_group",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        // l_shipdate is TIMESTAMP_NTZ; cast to LTZ under the UTC session so
        // unix_micros matches DuckDB's epoch_us on the naive timestamp.
        .agg(unix_micros(min(col("l_shipdate")).cast("timestamp")).as("first_ship_us"),
          unix_micros(max(col("l_shipdate")).cast("timestamp")).as("last_ship_us")),
      Some("SELECT l_suppkey, epoch_us(min(l_shipdate)) AS first_ship_us, " +
        "epoch_us(max(l_shipdate)) AS last_ship_us FROM lineitem GROUP BY l_suppkey")),

    Q("a6_conditional_count",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(sum(when(col("o_totalprice") > 150000, 1L).otherwise(0L)).as("n_high"),
          count(lit(1)).as("n")),
      Some("SELECT o_orderpriority, CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_high, count(*) AS n FROM orders GROUP BY o_orderpriority")),

    Q("a7_count_distinct",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust")),
      Some("SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust FROM orders " +
        "GROUP BY o_orderpriority")),

    // HLL sketches differ across engines — rows-only gate, no oracle.
    Q("a7b_approx_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts")),
      None),

    Q("a8_first_seen_month",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey").agg(min(col("o_orderdate")).as("first_dt"))
        .groupBy(unix_micros(date_trunc("month", col("first_dt"))).as("month_us"))
        .agg(count(lit(1)).as("new_customers")),
      Some("WITH f AS (SELECT o_custkey, min(o_orderdate) AS first_dt FROM orders GROUP BY 1) " +
        "SELECT epoch_us(date_trunc('month', first_dt)) AS month_us, count(*) AS new_customers " +
        "FROM f GROUP BY 1")),

    Q("a9_block_subsidy",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          GraftFunctions.block_subsidy(((col("o_orderkey") % 10) * 210000).cast("int"))
            .as("subsidy")),
      Some("SELECT o_orderkey, 5000000000 >> CAST(o_orderkey % 10 AS INT) AS subsidy FROM orders")),

    Q("a10_global_agg",
      (s, d) => Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"), dsum(col("l_extendedprice")).as("sum_price")),
      Some("SELECT count(*) AS n, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, " +
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price FROM lineitem")),

    Q("a11_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)")),

    Q("a12_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY CUBE(l_returnflag, l_linestatus)")),

    Q("a14_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .na.fill(0.0, Seq("F", "O", "P")),
      Some("SELECT o_orderpriority, " +
        "CAST(CAST(coalesce(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 0) AS VARCHAR) AS DOUBLE) AS F, " +
        "CAST(CAST(coalesce(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 0) AS VARCHAR) AS DOUBLE) AS O, " +
        "CAST(CAST(coalesce(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 0) AS VARCHAR) AS DOUBLE) AS P " +
        "FROM orders GROUP BY o_orderpriority")),

    Q("a15_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_tax"), col("l_discount")),
          "metric", "value"),
      Some("SELECT l_orderkey, l_linenumber, 'l_tax' AS metric, l_tax AS value FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem")),

    // Two-phase salted aggregation over a genuinely hot grouping (6 keys
    // across all of lineitem): identical semantics to the plain GROUP BY the
    // oracle runs, but the first shuffle spreads each hot key over 16
    // reducers — the skewed-aggregation shape AQE cannot split.
    Q("a16_salted_hot_agg",
      (s, d) => graft.operators.Salting.twoPhaseAgg(
        Tables.lineitem(s, d), Seq("l_returnflag"), salts = 16)(
        Seq(sum(col("l_quantity").cast(DecimalType(18, 4))).as("_q"),
          count(lit(1)).as("_n")),
        Seq(sum("_q").cast("double").as("sum_qty"), sum("_n").as("n_rows"))),
      Some("SELECT l_returnflag, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) " +
        "AS sum_qty, count(*) AS n_rows FROM lineitem GROUP BY l_returnflag")),

    Q("c11_from_json",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k")),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events")),

    // Array function family over tokenized text (slice/sort/distinct/size).
    Q("c12_array_ops",
      (s, d) => {
        val toks = split(lower(trim(col("text"))), "\\s+")
        Tables.documents(s, d).where(col("doc_id") < 50)
          .select(col("doc_id"),
            size(toks).as("n"),
            size(array_distinct(toks)).as("n_distinct"),
            concat_ws(" ", slice(toks, 1, 5)).as("first5"),
            concat_ws(" ", sort_array(array_distinct(toks))).as("sorted_vocab"))
      },
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE doc_id < 50
        |)
        |SELECT doc_id, CAST(len(toks) AS INT) AS n,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |  array_to_string(toks[1:5], ' ') AS first5,
        |  array_to_string(list_sort(list_distinct(toks)), ' ') AS sorted_vocab
        |FROM t""".stripMargin)),

    // Map functions: JSON → map, keys/values/lookup.
    Q("c13_map_ops",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), lit("map<string,int>")).as("m"))
        .select(col("event_id"),
          size(map_keys(col("m"))).as("n_keys"),
          element_at(col("m"), "k").as("k")),
      Some("SELECT event_id, CAST(len(json_keys(props)) AS INT) AS n_keys, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events")),

    // ---------------------------------------------------------- windows (W1–W3)
    Q("w1_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val wr = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"))
        Tables.orders(s, d).select(col("o_orderkey"),
          row_number().over(w).as("rn"), rank().over(wr).as("rnk"))
      },
      Some("SELECT o_orderkey, CAST(row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS INT) AS rn, CAST(rank() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS rnk FROM orders")),

    Q("w2_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(usCol, col("event_id"))
        Tables.events(s, d).select(col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"))
      },
      Some("SELECT event_id, lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
        "AS prev_value, lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
        "AS next_type FROM events")),

    Q("w3_running_sum",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d).select(col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      },
      Some("SELECT o_orderkey, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_total FROM orders")),

    Q("w4_sessionize",
      (s, d) => {
        val wo = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), usCol.as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(wo))
          .withColumn("session_id",
            sum(when(col("gap").isNull || col("gap") > 1800000000L, 1L).otherwise(0L)).over(wcum))
          .select("event_id", "session_id")
      },
      Some("SELECT event_id, CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS BIGINT) AS session_id FROM (SELECT event_id, user_id, epoch_us(ts) AS us, " +
        "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
        "AS gap FROM events)")),

    // Global ranking WITHOUT the single-partition window a bare
    // percent_rank()/ntile() OVER (ORDER BY ...) compiles to: GlobalRank
    // range-buckets the table, ranks within buckets in parallel, and
    // broadcast-joins constant-size bucket offsets — same values (the order
    // key is unique, so percent_rank has no rank ties and ntile is a pure
    // function of the global position), scalable plan. The oracle keeps the
    // window form: DuckDB can afford it at gate scale, and it pins the
    // dataflow's equivalence to the textbook definition.
    Q("w5_percent_rank_ntile",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val n = orders.count()
        graft.operators.GlobalRank.globalPositions(
            orders.select("o_orderkey", "o_totalprice"),
            Seq("o_totalprice", "o_orderkey"))
          .select(col("o_orderkey"),
            graft.operators.GlobalRank.percentRank(col("_pos"), n).as("pr"),
            graft.operators.GlobalRank.ntileOf(col("_pos"), n, 10).as("decile"))
      },
      Some("SELECT o_orderkey, percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr, " +
        "CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile FROM orders")),

    Q("w6_first_last_value",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d).select(col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"))
      },
      Some("SELECT o_orderkey, first_value(o_totalprice) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price, " +
        "last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price FROM orders")),

    // ------------------------------------------------------ sorts / top-k (O1–O4)
    Q("o1_topk",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey " +
        "LIMIT 10")),

    Q("o2_sort_multi",
      (s, d) => Tables.nation(s, d).orderBy(col("n_regionkey").desc, col("n_name").asc),
      Some("SELECT * FROM nation ORDER BY n_regionkey DESC, n_name")),

    Q("o3_first_match",
      (s, d) => Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .agg(min(col("o_orderkey")).as("k")),
      Some("SELECT min(o_orderkey) AS k FROM orders WHERE o_orderstatus = 'F'")),

    // ------------------------------------------------------------ set operations
    Q("s1_union",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))).distinct(),
      Some("SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier")),

    Q("s2_intersect",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))),
      Some("SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier")),

    Q("s3_except",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))),
      Some("SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier")),

    Q("s4_intersect_all",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))),
      Some("SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier")),

    Q("s5_except_all",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))),
      Some("SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier")),

    // ------------------------------------------------- generators / explode
    Q("c9_posexplode",
      (s, d) => Tables.documents(s, d).where(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "token"))),
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents WHERE doc_id < 50
        |), idx AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
        |)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] AS token FROM idx""".stripMargin)),

    Q("a13_percentiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.95)").as("p95")),
      Some("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50, " +
        "quantile_cont(l_quantity, 0.95) AS p95 FROM lineitem GROUP BY 1")),

    // ------------------------------------------------------- scalar funcs (C1–C8)
    Q("c1_regexp_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": *(-?\\d+)", 1).cast("int").as("k")),
      Some("SELECT event_id, CAST(regexp_extract(props, '\"k\": *(-?\\d+)', 1) AS INT) AS k " +
        "FROM events")),

    Q("c2_concat_key",
      (s, d) => Tables.lineitem(s, d)
        .select(concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("k"),
          col("l_quantity")),
      Some("SELECT concat_ws(':', l_orderkey, l_linenumber) AS k, l_quantity FROM lineitem")),

    Q("c3_format_string",
      (s, d) => Tables.nation(s, d)
        .select(col("n_nationkey"), format_string("blk%05d.dat", col("n_nationkey")).as("f")),
      Some("SELECT n_nationkey, printf('blk%05d.dat', n_nationkey) AS f FROM nation")),

    Q("c4_arith_greatest",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_tax") + col("l_discount")).as("t_plus_d"),
          greatest(col("l_tax"), col("l_discount")).as("g"),
          least(col("l_tax"), col("l_discount")).as("l")),
      Some("SELECT l_orderkey, l_linenumber, l_tax + l_discount AS t_plus_d, " +
        "greatest(l_tax, l_discount) AS g, least(l_tax, l_discount) AS l FROM lineitem")),

    Q("c5_md5",
      (s, d) => Tables.customer(s, d).select(col("c_custkey"), md5(col("c_name")).as("h")),
      Some("SELECT c_custkey, md5(c_name) AS h FROM customer")),

    Q("c6_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_str")),
      Some("SELECT event_id, regexp_extract(props, '\"k\": *(-?\\d+)', 1) AS k_str FROM events")),

    // C6: hash-to-hex recompute family (sha2 + hex round-trip).
    Q("c10_sha_hex",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          sha2(col("c_name").cast("binary"), 256).as("h"),
          lower(hex(col("c_name").cast("binary"))).as("name_hex")),
      Some("SELECT c_custkey, sha256(c_name) AS h, lower(hex(CAST(c_name AS BLOB))) AS name_hex " +
        "FROM customer")),

    Q("c7_case_when",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n")),
      Some("SELECT CASE WHEN o_totalprice < 50000 THEN 'low' WHEN o_totalprice < 150000 " +
        "THEN 'mid' ELSE 'high' END AS bucket, count(*) AS n FROM orders GROUP BY 1")),

    // ------------------------------------------- chain traversal (J3/O2/W1 analog)
    // Per-user event chains (parent = previous event): heights via pointer
    // doubling must equal the row_number oracle.
    Q("b1_chain_depths",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val nodes = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), usCol.as("us"))
          .withColumn("parent", lag(col("event_id"), 1).over(w))
          .select("event_id", "parent")
        ChainOps.depths(nodes, "event_id", "parent")
      },
      Some("SELECT event_id, CAST(row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS height FROM events")),

    // ---------------------------------------------------- event-time (T7 analog)
    Q("e1_tumbling_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 3600000000").as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
      Some("SELECT epoch_us(ts) // 3600000000 AS hr, event_type, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2")),

    // Hopping (sliding) windows: Spark's native window() with a slide —
    // 1h windows every 30min, so each event lands in exactly two windows.
    // The oracle unrolls the two epoch-aligned starts per event.
    Q("e2_hopping_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(
          window(timestamp_micros(expr("ts div 1000")), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("wstart"), col("event_type"),
          col("n"), col("sum_value")),
      Some("""WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        |w AS (SELECT us, event_type, value,
        |  unnest([(us // 1800000000) * 1800000000,
        |          (us // 1800000000) * 1800000000 - 1800000000]) AS wstart FROM e)
        |SELECT wstart, event_type, count(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin)),

    // Session windows (T7): Spark's native session_window vs the
    // gaps-and-islands SQL formulation — identical session boundaries
    // (a new session starts when the gap is >= the 30-minute timeout).
    Q("e3_session_window",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"), timestamp_micros(usCol).as("tts"))
        .groupBy(session_window(col("tts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start_us"),
          col("n")),
      Some("WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), " +
        "g AS (SELECT user_id, us, CASE WHEN us - lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us) >= 1800000000 OR lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us) IS NULL THEN 1 ELSE 0 END AS brk FROM e), " +
        "sess AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id ORDER BY us " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g) " +
        "SELECT user_id, min(us) AS session_start_us, count(*) AS n " +
        "FROM sess GROUP BY user_id, sid")),

    // Funnel analysis: first signup → view → click → purchase per user,
    // each stage strictly after the previous and inside a 48h conversion
    // window — the set-based staged-join funnel formulation (no per-user
    // sorting or arrays: each stage is a type-filtered narrow pass joined
    // on user_id and min-aggregated, all map-side-partial and AQE-planned,
    // which is why it survives a 100TB event log where a MATCH_RECOGNIZE
    // row walk would not).
    Q("e4_funnel",
      (s, d) => {
        val win = 172800000000L // 48h in micros
        val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
          usCol.as("us"))
        def stage(prev: org.apache.spark.sql.DataFrame, typ: String,
            prevT: String, outT: String) =
          ev.where(col("event_type") === typ)
            .join(prev.select("user_id", prevT), "user_id")
            .where(col("us") > col(prevT) && col("us") <= col(prevT) + win)
            .groupBy("user_id").agg(min("us").as(outT))
        val s1 = ev.where(col("event_type") === "signup")
          .groupBy("user_id").agg(min("us").as("t_signup"))
        val s2 = stage(s1, "view", "t_signup", "t_view")
        val s3 = stage(s2, "click", "t_view", "t_click")
        val s4 = stage(s3, "purchase", "t_click", "t_purchase")
        s1.join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .join(s4, Seq("user_id"), "left")
          .withColumn("depth",
            lit(1) + col("t_view").isNotNull.cast("int")
              + col("t_click").isNotNull.cast("int")
              + col("t_purchase").isNotNull.cast("int"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t_signup FROM e WHERE event_type='signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(us) AS t_view FROM e JOIN s1 USING (user_id)
        |       WHERE event_type='view' AND us > t_signup AND us <= t_signup + 172800000000 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(us) AS t_click FROM e JOIN s2 USING (user_id)
        |       WHERE event_type='click' AND us > t_view AND us <= t_view + 172800000000 GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(us) AS t_purchase FROM e JOIN s3 USING (user_id)
        |       WHERE event_type='purchase' AND us > t_click AND us <= t_click + 172800000000 GROUP BY e.user_id)
        |SELECT s1.user_id, t_signup, t_view, t_click, t_purchase,
        |  1 + CAST(t_view IS NOT NULL AS INT) + CAST(t_click IS NOT NULL AS INT)
        |    + CAST(t_purchase IS NOT NULL AS INT) AS depth
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |LEFT JOIN s4 USING (user_id)""".stripMargin)),

    // Exact distinct via the retractable Aggregator (§2.10) — must equal
    // plain COUNT(DISTINCT) when no retractions occur.
    Q("a7c_distinct_retractable",
      (s, d) => {
        val f = udaf(graft.functions.ExactDistinctWithRetraction,
          org.apache.spark.sql.Encoders.product[(String, Int)])
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(f(col("o_custkey").cast("string"), lit(1)).as("n_cust"))
      },
      Some("SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust FROM orders " +
        "GROUP BY o_orderpriority")),

    Q("e5_type_stats",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value")),
      Some("SELECT event_type, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value, " +
        "min(value) AS min_value, max(value) AS max_value FROM events GROUP BY event_type"))
  )
}
