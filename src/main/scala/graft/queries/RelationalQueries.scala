package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.expressions.GraftFunctions
import graft.operators.Skyline

/** North-star relational operator inventory (SURVEY.md §2B) over the
  * TPC-H-ish star schema + events table: scans with pushed-down predicates,
  * broadcast + shuffle joins (incl. semi/anti), partial+final hash
  * aggregates, rollup/cube, window functions, sorts/limits/top-k, set ops,
  * string/date/math/JSON scalar functions.
  *
  * Scale design notes (100 TB):
  *  - Dimension tables (region/nation/customer/supplier/part) are broadcast;
  *    only fact-fact joins (orders⋈lineitem) shuffle, on their join key.
  *  - Aggregations rely on partial (map-side) aggregation — only group
  *    digests shuffle.
  *  - Top-k is TakeOrderedAndProject (bounded heap/partition), never a full
  *    sort.
  *  - Floating aggregates are rounded on BOTH engine and oracle side:
  *    money-scale sums to 2 decimals, unit-scale avgs to 6 — double
  *    summation order across engines/partitionings differs in the last bits.
  */
object RelationalQueries {

  private val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Temp views for the SQL-front-end queries (correlated subqueries are
    * not expressible in the DataFrame API — Catalyst decorrelates them).
    */
  private def sqlViews(s: SparkSession, dir: String): Unit = {
    part(s, dir).createOrReplaceTempView("v_part")
    supplier(s, dir).createOrReplaceTempView("v_supplier")
    lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    orders(s, dir).createOrReplaceTempView("v_orders")
    customer(s, dir).createOrReplaceTempView("v_customer")
    nation(s, dir).createOrReplaceTempView("v_nation")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan-filter → partial/final hash aggregate → sort.
    "q1_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(sum(revenue * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3 shape: broadcast dim filter + two joins + agg + top-k.
    "q3_top10" -> ((s, dir) => {
      val cust = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      orders(s, dir)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(revenue), 2).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-table join (dims broadcast), local-supplier
    // condition, revenue per nation.
    "q5_nation_revenue" -> ((s, dir) => {
      val asia = region(s, dir).filter(col("r_name") === "ASIA")
      nation(s, dir)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .join(customer(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(orders(s, dir), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("rev"))
        .orderBy(col("rev").desc, col("n_name").asc)
    }),

    // TPC-H Q4 shape: EXISTS semi-join with a date-range scan filter.
    "q4_order_priority" -> ((s, dir) => {
      val o = orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      o.join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q18 shape: HAVING via post-aggregation filter + IN-subquery as
    // a semi-join on the aggregated key set.
    "q18_big_orders" -> ((s, dir) => {
      val big = lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250.0) // HAVING
        .select(col("l_orderkey"))
      orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // TPC-H Q19 shape: disjunctive multi-attribute predicate (OR of ANDs)
    // across a join — tests predicate normalization + pushdown.
    "q19_disjunctive" -> ((s, dir) => {
      lineitem(s, dir)
        .join(part(s, dir), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 15)))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
    }),

    // Left-semi join (EXISTS): customers with at least one urgent order.
    "semi_join" -> ((s, dir) => {
      customer(s, dir)
        .join(orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Left-anti join (NOT EXISTS): customers with no partially-filled order.
    "anti_join" -> ((s, dir) => {
      customer(s, dir)
        .join(orders(s, dir).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Window top-n per group: 2 priciest orders per customer.
    "window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // Running aggregates + lag over an ordered per-user event stream.
    "window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("run_sum", round(sum(col("value"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("seq", row_number().over(w))
        .select(col("user_id"), col("event_id"), col("value"),
          col("run_sum"), col("prev_value"), col("seq"))
        .orderBy(col("user_id"), col("seq"))
    }),

    // Funnel analysis: users progressing view → click → purchase with ≤4h
    // between consecutive steps (ANY qualifying chain counts). Each stage
    // is a user_id equi-join with a time-range residual — SMJ on the user
    // key; the pair blowup is bounded by events-per-user-per-horizon, never
    // corpus². (A first-following-event shortcut via as-of join would be
    // cheaper but changes semantics: the first click need not be the one
    // whose 1h window contains the purchase.)
    "funnel_stages" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      def of(t: String, u: String, ts: String) =
        ev.filter(col("event_type") === t)
          .select(col("user_id").as(u), col("ts").as(ts))
      val v = of("view", "user_id", "t1")
      val c = of("click", "u2", "t2")
      val p = of("purchase", "u3", "t3")
      val vc = v.join(c, col("user_id") === col("u2") &&
        col("t2") > col("t1") &&
        col("t2") <= col("t1") + expr("INTERVAL 4 HOUR"))
      val vcp = vc.join(p, col("user_id") === col("u3") &&
        col("t3") > col("t2") &&
        col("t3") <= col("t2") + expr("INTERVAL 4 HOUR"))
      def stage(df: DataFrame, name: String) =
        df.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stage(v, "1_view")
        .unionAll(stage(vc, "2_click"))
        .unionAll(stage(vcp, "3_purchase"))
        .orderBy(col("stage"))
    }),

    // Event-time sessionization (batch form): gap > 30 min starts a new
    // session; lag + running sum per user. This is the exact oracle for
    // graft.streaming.Streaming.sessionizeStream (same gap semantics).
    "sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapped = events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > graft.streaming.Streaming.SessionGapMicros, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      gapped
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"),
          round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // ANSI escape hatches: Spark 4 runs ANSI mode by default (divide by
    // zero / bad cast / overflow THROW), and try_* is the row-level
    // quarantine — failures become NULLs instead of killing a 100 TB
    // job for one bad row. DuckDB's corresponding forms null the same
    // cases (verified: x/0 → NULL, TRY_CAST → NULL, list OOB → NULL);
    // the overflow case replays as an explicit CASE because DuckDB
    // widens to INT128 instead of overflowing.
    "try_funcs" -> ((s, dir) => {
      orders(s, dir).filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          round(try_divide(col("o_totalprice"),
            (col("o_orderkey") % 3).cast("double")), 6).as("safe_div"),
          expr("try_cast(o_orderpriority AS INT)").as("safe_cast"),
          try_element_at(array(col("o_orderkey"), col("o_custkey")), lit(5))
            .as("safe_elem"),
          try_add(lit(Long.MaxValue), col("o_orderkey")).as("safe_add"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
            .as("prio_num"))
        .orderBy(col("o_orderkey"))
    }),

    // Native session_window sessionization — the built-in face of the
    // lag+cumsum technique above (and the one session primitive that
    // also runs under Structured Streaming with merging state). Note the
    // boundary convention difference, replayed exactly in the oracle: a
    // session window is [first_ts, last_ts + gap), and an event exactly
    // AT prev + gap starts a NEW session (the custom sessionize splits
    // only strictly beyond the gap).
    "session_window_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("value_sum"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("session_start_us"),
          unix_micros(col("sw.end")).as("session_end_us"),
          col("n_events"), col("value_sum"))
        .orderBy(col("user_id"), col("session_start_us"))
    }),

    // Cohort retention: users grouped by first-active day, activity as
    // (cohort_day, day_offset) distinct-user counts — the product
    // analytics matrix behind every retention curve. Scale shape: events
    // are scanned ONCE and collapsed to the (user, day) digest in the one
    // full-size shuffle; the first-seen day then comes from a window over
    // that digest (not a second scan + join), so everything downstream is
    // bounded by |users|×|days|, never |events|.
    "cohort_retention" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        .withColumn("cohort_d", min(col("d")).over(w))
        .groupBy(col("cohort_d"),
          datediff(col("d"), col("cohort_d")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_d"), col("day_offset"))
    }),

    // Fixed-width numeric histogram: one hash aggregate, bins are pure
    // row-local arithmetic — the profile-a-column primitive. (Exact, not
    // a sketch: the approx twin is approx_percentiles.)
    "value_histogram" -> ((s, dir) =>
      events(s, dir)
        .groupBy(floor(col("value") / 25.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .withColumn("lo", col("bin") * 25.0)
        .select(col("bin"), col("lo"), col("n"), col("sum_value"))
        .orderBy(col("bin"))),

    // IQR outlier detection (Tukey fences): per-type exact quartiles →
    // tiny digest broadcast back → map-only flagging. Returns only the
    // outlier rows (the review queue), with the fences that caught them.
    "outlier_iqr" -> ((s, dir) => {
      val fences = events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      events(s, dir).join(broadcast(fences), "event_type")
        .filter(col("value") < col("lo") || col("value") > col("hi"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
        .orderBy(col("event_id"))
    }),

    // PATH analysis — "what do users do next": top 3-step event-type
    // sequences across all users, the product-analytics staple funnels
    // are the special case of. Per-user windows (bounded by the user's
    // own events) emit the 3-grams, one hash agg counts them, the top-10
    // is a TakeOrdered — no global window anywhere.
    "session_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(10)
    }),

    // MAD outlier detection — the ROBUST sibling of IQR and z-score: the
    // median absolute deviation survives up to 50% contamination, where
    // the IQR fences move at 25% and the z-score's mean/σ move on one bad
    // row. Modified z-score |x − med| / (1.4826·MAD) > 3.5 is the
    // Iglewicz–Hoaglin convention. Two digest aggregates (per-type
    // median, then median of |x − med|) broadcast back; flagging is
    // map-only — no full-table window at any point.
    "outlier_mad" -> ((s, dir) => {
      val med = events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = events(s, dir).join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      events(s, dir).join(broadcast(mad), "event_type")
        .filter(abs(col("value") - col("med")) > lit(3.5) * lit(1.4826) * col("mad"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"))
        .orderBy(col("event_id"))
    }),

    // Time-series gap detection: per-user silences longer than 12 h —
    // lead over the (user_id)-partitioned order, map-only after one
    // digest-bounded window. The monitoring face of sessionize.
    "ts_gaps" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull &&
          unix_micros(col("next_ts")) - unix_micros(col("ts")) > 12L * 3600 * 1000000)
        .select(col("user_id"), col("ts").as("gap_start"),
          col("next_ts").as("gap_end"),
          expr("(unix_micros(next_ts) - unix_micros(ts)) DIV 1000000")
            .as("gap_seconds"))
        .orderBy(col("user_id"), col("gap_start"))
    }),

    // Incremental aggregate maintenance (IVM): yesterday's per-group
    // state merged with today's delta aggregate — new_state =
    // merge(old_state, agg(delta)) — instead of rescanning history. The
    // oracle IS the full recompute over everything, proving the
    // mergeability contract (count/sum are commutative monoids) that a
    // 100 TB daily-rollup pipeline relies on: each day touches only the
    // day's data plus a groups-sized state table.
    "incremental_agg" -> ((s, dir) => {
      val cut = lit("2024-01-16").cast("timestamp")
      def agg0(df: DataFrame) = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      val state = agg0(events(s, dir).filter(col("ts") < cut))
      val delta = agg0(events(s, dir).filter(col("ts") >= cut))
      state.unionAll(delta)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), round(sum(col("sv")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Per-group z-score feature scaling: one aggregate pass builds the
    // per-event_type (mean, stddev) digest — a handful of rows, broadcast
    // back — and the scaling itself is map-only over the events scan. The
    // two-pass broadcast shape is how feature normalization runs at
    // 100 TB: no window over the full table, no second shuffle.
    "zscore_features" -> ((s, dir) => {
      val stats = events(s, dir).groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
      events(s, dir).join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("mu")) / col("sd"), 6).as("z"))
        .orderBy(col("event_id"))
    }),

    // Per-key EWMA (s_i = 0.3·x_i + 0.7·s_{i-1}) — the time-decayed
    // feature-engineering primitive. Inherently sequential per key, so it
    // folds each user's ORDERED history with the aggregate HOF after one
    // shuffle on user_id; per-key state is bounded by that user's history
    // (the same bound sessionize carries), never by |events|. The oracle
    // replays the identical left fold with DuckDB's list_reduce — same
    // order, same double ops, bit-equal before the shared round(…, 6).
    "ewma_user_value" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("xs"))
        .select(col("user_id"), col("n_events"),
          round(aggregate(
            expr("slice(xs, 2, size(xs) - 1)"),
            col("xs")(0)("value"),
            (acc, x) => lit(0.3) * x("value") + lit(0.7) * acc), 6).as("ewma"))
        .orderBy(col("user_id"))),

    // Holt double-exponential smoothing (level + trend) per key — the
    // step up from EWMA when the series drifts: level_i = α·x_i +
    // (1−α)·(level + trend), trend_i = β·(level_i − level) + (1−β)·trend
    // (Holt 1957). Same execution shape as ewma_user_value (one shuffle
    // on user_id, ordered in-group fold), but the accumulator is a
    // 2-field struct, initialized (x_0, 0) so a single-event key yields
    // (level=x_0, trend=0). The h-step forecast level + h·trend is what a
    // capacity planner actually reads. The oracle replays the identical
    // fold with a struct-typed list_reduce — the new level appears twice
    // in both lambdas (no let-binding in either engine), so the double
    // ops are literally the same expression tree on both sides.
    "holt_forecast" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("xs"))
        .select(col("user_id"), col("n_events"),
          expr("""aggregate(
                 |  slice(xs, 2, size(xs) - 1),
                 |  named_struct('l', xs[0].value, 'b', CAST(0.0 AS DOUBLE)),
                 |  (acc, x) -> named_struct(
                 |    'l', 0.4d * x.value + 0.6d * (acc.l + acc.b),
                 |    'b', 0.2d * ((0.4d * x.value + 0.6d * (acc.l + acc.b)) - acc.l)
                 |         + 0.8d * acc.b))""".stripMargin).as("st"))
        .select(col("user_id"), col("n_events"),
          round(col("st")("l"), 6).as("level"),
          round(col("st")("b"), 6).as("trend"),
          round(col("st")("l") + lit(3.0) * col("st")("b"), 6).as("forecast3"))
        .orderBy(col("user_id"))),

    // Holt-WINTERS triple exponential smoothing (Winters 1960) — the
    // seasonal step up from Holt when a per-key series has a repeating
    // cycle (additive seasonality, period m=4 here). Classic init over
    // the first two seasons (level = first-season mean; trend = season-
    // mean difference / m; seasonals = first-season deviations), then the
    // standard fold from t=m+1 with the NEW level inside both the trend
    // and seasonal updates — inlined identically on both sides because
    // neither engine's lambda has let-binding. The seasonal state is the
    // rotating last-m deviations array; forecast1 = l + b + s[next].
    // Same scale shape as Holt: one shuffle on user_id, then an in-group
    // fold; keys below two seasons are filtered on both sides.
    "holt_winters" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(expr("transform(sort_array(collect_list(struct(ts, event_id, value))), x -> x.value)").as("xs"))
        .filter(size(col("xs")) >= 8)
        .withColumn("l0", expr("(xs[0]+xs[1]+xs[2]+xs[3]) / 4.0d"))
        .withColumn("b0", expr("((xs[4]+xs[5]+xs[6]+xs[7]) / 4.0d - (xs[0]+xs[1]+xs[2]+xs[3]) / 4.0d) / 4.0d"))
        .withColumn("s0", expr("array(xs[0]-l0, xs[1]-l0, xs[2]-l0, xs[3]-l0)"))
        .withColumn("st",
          expr("""aggregate(
                 |  slice(xs, 5, size(xs) - 4),
                 |  named_struct('l', l0, 'b', b0, 's', s0),
                 |  (acc, x) -> named_struct(
                 |    'l', 0.4d * (x - element_at(acc.s, 1)) + 0.6d * (acc.l + acc.b),
                 |    'b', 0.2d * ((0.4d * (x - element_at(acc.s, 1)) + 0.6d * (acc.l + acc.b)) - acc.l)
                 |         + 0.8d * acc.b,
                 |    's', concat(slice(acc.s, 2, 3),
                 |      array(0.3d * (x - (0.4d * (x - element_at(acc.s, 1)) + 0.6d * (acc.l + acc.b)))
                 |            + 0.7d * element_at(acc.s, 1)))))""".stripMargin))
        .select(col("user_id"), size(col("xs")).cast("long").as("n_events"),
          round(col("st")("l"), 6).as("level"),
          round(col("st")("b"), 6).as("trend"),
          round(element_at(col("st")("s"), 1), 6).as("s_next"),
          round(col("st")("l") + col("st")("b") + element_at(col("st")("s"), 1), 6).as("forecast1"))
        .orderBy(col("user_id"))),

    // MERGE INTO (CDC upsert) as a Spark plan: apply a deterministic
    // changeset (deletes / updates / inserts derived arithmetically from
    // the snapshot, delete > update > insert precedence as in an explicit
    // WHEN-MATCHED clause order) to the documents snapshot. The 100 TB
    // shape: a CDC batch is orders of magnitude smaller than the
    // snapshot, so matched rows resolve via a BROADCAST left join — the
    // snapshot never shuffles — and inserts are a pure union append. (A
    // changeset too big to broadcast instead co-partitions with a
    // bucketed target for a zero-exchange SMJ.)
    "merge_upsert" -> ((s, dir) => {
      val base = documents(s, dir).select(col("doc_id"), col("n_chars"))
      val changes = documents(s, dir)
        .withColumn("op",
          when(col("doc_id") % 17 === 3, lit("d"))
            .when(col("doc_id") % 10 === 0, lit("u"))
            .when(col("doc_id") % 23 === 5, lit("i")))
        .filter(col("op").isNotNull)
        .select(
          when(col("op") === "i", col("doc_id") + 10000000L)
            .otherwise(col("doc_id")).as("doc_id"),
          col("op"),
          when(col("op") === "u", col("n_chars") + 1000L)
            .when(col("op") === "i", col("doc_id") % 500)
            .otherwise(col("n_chars")).as("new_n_chars"))
      val matched = base
        .join(broadcast(changes.filter(col("op") =!= "i")), Seq("doc_id"), "left")
        .filter(col("op").isNull || col("op") === "u") // WHEN MATCHED AND d THEN DELETE
        .select(col("doc_id"),
          when(col("op") === "u", col("new_n_chars"))
            .otherwise(col("n_chars")).as("n_chars"),
          coalesce(col("op"), lit("k")).as("src"))
      val inserts = changes.filter(col("op") === "i")
        .select(col("doc_id"), col("new_n_chars").as("n_chars"), col("op").as("src"))
      matched.unionAll(inserts).orderBy(col("doc_id"))
    }),

    // SCD Type-2 dimension-history build from a change log: collapse
    // consecutive same-state events per user (only CHANGES open a new
    // version), then validity intervals [valid_from, valid_to) via lead,
    // open-ended current row last. Both windows partition by user_id —
    // never global — so skew is bounded by one user's history.
    "scd2_history" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .filter(col("user_id") % 20 === 0)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"), col("version"))
        .orderBy(col("user_id"), col("version"))
    }),

    // Rollup: (flag, status), (flag), () grouping sets with grouping_id.
    "rollup_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Cube over two order dimensions.
    "cube_agg" -> ((s, dir) => {
      orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Set operations: (BUILDING ∩ urgent-order customers) ∪ (AUTOMOBILE ∖
    // high-priority customers); distinct semantics throughout.
    "set_ops" -> ((s, dir) => {
      val c = customer(s, dir)
      val o = orders(s, dir)
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      val high = o.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(urgent)
        .union(auto.except(high))
        .distinct()
        .orderBy(col("c_custkey"))
    }),

    // String scalar functions over part.
    "string_funcs" -> ((s, dir) => {
      part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 4).as("name_pre"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          reverse(col("p_name")).as("name_rev"),
          replace(col("p_name"), lit(" "), lit("_")).as("name_us"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time functions: monthly order rollup + extracted parts.
    "date_funcs" -> ((s, dir) => {
      orders(s, dir)
        .groupBy(
          date_trunc("month", col("o_orderdate")).as("month_start"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("month_start"))
    }),

    // Date arithmetic: interval add, day diff, parts. (dayofweek: Spark is
    // 1=Sunday, DuckDB dow is 0=Sunday — oracle shifts by one.)
    "date_arith" -> ((s, dir) => {
      orders(s, dir)
        .filter(col("o_orderkey") < 200)
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate"), 90).as("ship_deadline"),
          add_months(col("o_orderdate"), 3).as("quarter_later"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("days_to_98"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofmonth(col("o_orderdate")).as("dom"),
          weekofyear(col("o_orderdate")).as("woy"))
        .orderBy(col("o_orderkey"))
    }),

    // The SQL front-end surface: the same engine driven entirely through
    // spark.sql over temp views (CTE + window + join + agg in one query).
    "sql_surface" -> ((s, dir) => {
      orders(s, dir).createOrReplaceTempView("v_orders")
      customer(s, dir).createOrReplaceTempView("v_customer")
      s.sql("""
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM v_orders)
        SELECT c.c_mktsegment,
               count(*) AS n_top,
               round(sum(r.o_totalprice), 2) AS top_revenue
        FROM ranked r JOIN v_customer c ON r.o_custkey = c.c_custkey
        WHERE r.rnk = 1
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
      """)
    }),

    // JSON scalar functions over the semi-structured events.props column.
    "json_funcs" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy((col("k_val") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")), 6).as("avg_value"),
          max(col("k_val")).as("max_k"))
        .orderBy(col("k_bucket"))
    }),

    // Custom DataSourceV2 connector scan: the graft_range source consumes
    // the id-range predicates in its ScanBuilder (planInputPartitions
    // generates only the surviving slice — connector-level partition
    // pruning) and materializes only the projected columns. Oracle
    // recomputes the arithmetic over generate_series; hash match proves
    // the pushdown didn't change semantics.
    // File-level data skipping (the table-format planning technique on
    // plain parquet): the documents corpus lives range-clustered with a
    // per-file (min, max, rows) sidecar; a doc_id range query selects its
    // files from the sidecar BEFORE any footer is opened and re-applies
    // the exact predicate on the rows (superset selection — a stale
    // sidecar can only cost reads, never answers). The oracle sees the
    // plain table: layout + sidecar are an access path, not semantics.
    "skip_index_scan" -> ((s, dir) =>
      graft.sources.SkipIndex.prunedRead(s, dir, 100L, 299L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"))),

    // Z-ORDER 2-D skipping — the multi-dimensional clustering face: a
    // query constraining BOTH doc_id and n_chars serves from the
    // z-ordered layout through its two-column sidecar, pruning on both
    // predicates at planning time (a single-key sort can only ever prune
    // one). The oracle sees the plain table: clustering is an access
    // path, not semantics.
    "zorder_scan" -> ((s, dir) =>
      graft.sources.ZOrderSkip.prunedRead(s, dir, 100L, 299L, 200L, 700L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"))),

    // Bloom-filter file skipping — the POINT-LOOKUP pruning lever: the
    // corpus lives clustered by (lang, n_chars) for analytics, so doc_id
    // is scattered and every file's [min, max] id span covers every probe
    // (min/max sidecar selects ALL files — spec-pinned). The per-file
    // bloom sidecar selects only the files that can hold the probed ids;
    // the exact IN predicate re-applies on the rows (no false negatives by
    // construction, a false positive costs one file read, never answers).
    // Oracle sees the plain table: the layout is an access path.
    "bloom_skip_scan" -> ((s, dir) =>
      graft.sources.BloomSkip.lookup(s, dir, Seq(7L, 233L, 411L))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    "dsv2_scan" -> ((s, dir) => {
      s.read.format("graft_range")
        .option("n", "10000").option("slices", "8").load()
        .filter(col("id") >= 100 && col("id") < 200)
        .select(col("id"), col("sq"), col("label"))
        .orderBy(col("id"))
    }),

    // Spark 4 VARIANT type: parse_json into the binary semi-structured
    // type, typed path extraction, missing-path null semantics. The
    // shredded-variant answer to "schema-on-read without string re-parse".
    "variant_funcs" -> ((s, dir) => {
      events(s, dir)
        .filter(col("event_id") < 1000)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_val"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.absent', 'int')").isNull.as("missing_is_null"))
        .orderBy(col("event_id"))
    }),

    // Spark 4 native XML: build an XML doc from columns, parse it back
    // with from_xml (attributes surface with the "_" prefix). Oracled the
    // multimodal way: DuckDB recomputes the fields arithmetically while
    // Spark re-extracts them from the XML it built — hash match proves the
    // encode→parse roundtrip.
    "xml_funcs" -> ((s, dir) => {
      val xml = concat(lit("<doc id=\""), col("doc_id"), lit("\"><lang>"),
        col("lang"), lit("</lang><n>"), col("n_chars"), lit("</n></doc>"))
      documents(s, dir)
        .select(col("doc_id"), xml.as("xml"))
        .withColumn("p", from_xml(col("xml"),
          lit("_id BIGINT, lang STRING, n INT")))
        .select(col("doc_id"), col("xml"),
          col("p._id").as("p_id"), col("p.lang").as("p_lang"),
          col("p.n").as("p_n"))
        .orderBy(col("doc_id"))
    }),

    // Tumbling event-time window aggregation (batch shape of the streaming
    // op; Structured Streaming runs the same plan incrementally).
    "events_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    // Sliding (hopping) event-time windows — the window face between
    // tumbling (events_window) and session (session_window_agg): 1-hour
    // windows every 15 minutes, so each event contributes to 4 windows.
    // Spark plans this as an Expand (row → 4 window copies) feeding an
    // ordinary partial+final hash agg — fan-out is bounded by len/slide,
    // map-side combine still applies. Window starts surface as epoch
    // micros: the oracle replays the epoch-aligned start arithmetic with
    // integer division, and BIGINTs compare exactly across engines where
    // timestamp rendering wouldn't.
    "sliding_window_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("win_start_us"), col("event_type"))
    }),

    // Batch twin of the CHAINED stateful streaming query (hourly window
    // agg re-aggregated into 4-hour rollups via window-on-window): the
    // same two-level plan run over batch events. The double rounding
    // (hourly then 4-hourly) is part of the semantics and the oracle
    // replays it with nested GROUP BYs.
    "chained_window_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("hour_value"))
        .groupBy(window(col("window"), "4 hours"), col("event_type"))
        .agg(sum(col("n")).as("n"), round(sum(col("hour_value")), 2).as("total_value"))
        .select(unix_micros(col("window.start")).as("win4_start_us"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("win4_start_us"), col("event_type"))
    }),

    // Batch twin of the stream-stream interval join (views in the hour
    // before each click, per user) — the oracle for Streaming.clickViewJoin;
    // StreamingSpec asserts the watermarked stream-stream run is identical.
    "interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.streaming.Streaming.clickViewJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "view"))
        .orderBy(col("click_id"), col("view_id"))
    }),

    // LEFT OUTER interval join — the batch oracle of the streaming
    // left-outer twin (clicks with no view in the preceding hour keep one
    // null-padded row). view_id is nullable in the sort: NULLS FIRST
    // pinned on both engines (Spark's asc default vs DuckDB's NULLS LAST).
    "interval_join_louter" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.streaming.Streaming.clickViewJoinLeftOuter(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "view"))
        .orderBy(col("click_id"), col("view_id").asc_nulls_first)
    }),

    // FULL OUTER interval join — batch oracle of the streaming full-outer
    // twin: unmatched clicks AND unmatched views each keep one null-padded
    // row. Both sort keys are nullable now: NULLS FIRST pinned on both
    // engines for both columns.
    "interval_join_fouter" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.streaming.Streaming.clickViewJoinFullOuter(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "view"))
        .orderBy(col("click_id").asc_nulls_first,
          col("view_id").asc_nulls_first)
    }),

    // Declarative data-quality suite (Deequ model): six constraints over
    // orders evaluated in ONE aggregate pass → (check, observed, passed)
    // report. price_under_100k FAILS on this fixture by design — the
    // report carries failures instead of throwing (the pipeline-gate
    // posture: the orchestrator decides publish/quarantine from rows).
    "dq_checks" -> ((s, dir) => {
      import graft.operators.DataQuality._
      report(orders(s, dir), Seq(
        Check("complete_custkey", completeness(col("o_custkey")), _ === 1.0),
        Check("nonneg_totalprice", min(col("o_totalprice")).cast("double"), _ >= 0.0),
        Check("price_under_100k", max(col("o_totalprice")).cast("double"), _ <= 100000.0),
        Check("size_nonzero", count(lit(1)).cast("double"), _ > 0.0),
        Check("status_in_set",
          inSetRatio(col("o_orderstatus"), Seq("O", "F", "P")), _ === 1.0),
        Check("unique_orderkey", uniquenessRatio(col("o_orderkey")), _ === 1.0)))
    }),

    // Misra-Gries heavy hitters: sketch-nominate + exact-recount (see
    // HeavyHitters). The page column is a deterministic skewed derivation
    // (60% home, 20% search, ~100 rare tail pages) so the sketch must
    // actually evict: distinct values (102) >> capacity (16), yet the
    // output is exact and partitioning-independent — the sketch only
    // nominates, the threshold recount decides.
    "heavy_hitters" -> ((s, dir) => {
      val pages = events(s, dir).select(
        when(col("event_id") % 10 < 6, lit("home"))
          .when(col("event_id") % 10 < 8, lit("search"))
          .otherwise(concat(lit("p"), col("event_id") % 500)).as("page"))
      graft.operators.HeavyHitters.heavyHitters(pages, col("page"),
        k = 16, phi = 0.1)
    }),

    // Count-min sketch audit: mergeable typed-Aggregator sketch over the
    // user_id stream, probed at the true-heaviest users; ok asserts the
    // CMS one-sided guarantee est >= true. Integer-only universal hashing
    // → the DuckDB oracle replays estimates exactly (min over depth rows
    // of the matching bucket's count).
    "cms_heavy_probes" -> ((s, dir) =>
      graft.operators.CountMin.probeTopUsers(s, dir, k = 5)),

    // PSI drift monitor between two event populations (deterministic
    // even/odd split stands in for last-week/this-week snapshots): one
    // count-aggregate per side down to 10 bins, then pure arithmetic
    // over the 10-row frame. Near-identical populations here — the spec
    // demonstrates detection on a synthetic shift.
    "psi_drift" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.operators.DataQuality.psiDrift(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1),
        col("value"), nBins = 10, width = 50.0)
    }),

    // Pure top-k: TakeOrderedAndProject, no aggregation.
    "topk_orders" -> ((s, dir) => {
      orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q6 shape: tight scan-filter-sum, no joins — pure pushdown test.
    "q6_forecast" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // TPC-H Q17 shape: scalar aggregate subquery as a join (per-part avg
    // quantity threshold).
    "q17_avg_subquery" -> ((s, dir) => {
      val li = lineitem(s, dir)
      // threshold rounded to 6 dp on BOTH engines: an unrounded double
      // computed independently could flip inclusion of a boundary quantity
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(round(avg(col("l_quantity")) * 0.5, 6).as("half_avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("half_avg_qty"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q7 shape: bidirectional nation-pair volume by ship year. Both
    // nation lookups and supplier are broadcast dims; the only shuffles are
    // the orders⋈lineitem fact join and the final 3-key aggregate.
    "q7_volume" -> ((s, dir) => {
      val n1 = nation(s, dir).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = nation(s, dir).select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q8 shape: one nation's share of a region's promo-part volume per
    // order year — conditional aggregation over a 7-table join, dims all
    // broadcast.
    "q8_market_share" -> ((s, dir) => {
      val custNation = nation(s, dir)
        .join(broadcast(region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val suppNation = nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      lineitem(s, dir)
        .join(broadcast(part(s, dir).filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("cn_key"), "left_semi")
        .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", revenue).otherwise(0.0)) /
            sum(revenue), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q10 shape: revenue lost to returned items per customer in one
    // quarter, nation broadcast, top-20 by revenue. This fixture's sums land
    // on a cents-rounding boundary (…843.595), where double fold-order noise
    // flips the last cent between engines — so revenue is summed in EXACT
    // decimal on both sides (order-insensitive), then rounded.
    "q10_returned" -> ((s, dir) => {
      val decRevenue = col("l_extendedprice").cast("decimal(18,6)") *
        (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
      customer(s, dir)
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(decRevenue), 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q12 shape (adapted: the fixture has no l_shipmode, so the
    // classifier column is l_linestatus): high- vs low-priority line counts
    // per class — join + two conditional sums.
    "q12_priority_class" -> ((s, dir) => {
      val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      orders(s, dir)
        .join(lineitem(s, dir)
            .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(highPri, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!highPri, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // TPC-H Q14 shape: promo revenue percentage for one month — broadcast
    // part join + two conditional sums in one aggregate.
    "q14_promo" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", revenue).otherwise(0.0)) /
            sum(revenue), 6).as("promo_revenue"))
    }),

    // TPC-H Q2 shape (adapted: no partsupp table — lineitem is the
    // part↔supplier relation): cheapest-supplier-per-part via a CORRELATED
    // scalar subquery, run through the SQL front-end so Catalyst's
    // decorrelation (RewriteCorrelatedScalarSubquery → aggregate+join) is
    // the operator under test. min() is order-insensitive, so the double
    // equality is stable across engines.
    "q2_min_cost" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT DISTINCT s.s_acctbal, s.s_name, p.p_partkey, p.p_name
        FROM v_part p
        JOIN v_lineitem l ON p.p_partkey = l.l_partkey
        JOIN v_supplier s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'LARGE'
          AND s.s_acctbal = (
            SELECT min(s2.s_acctbal)
            FROM v_lineitem l2 JOIN v_supplier s2 ON s2.s_suppkey = l2.l_suppkey
            WHERE l2.l_partkey = p.p_partkey)
        ORDER BY s.s_acctbal DESC, p.p_partkey ASC, s.s_name ASC
        LIMIT 20
      """)
    }),

    // TPC-H Q9 shape (adapted: no partsupp in the fixture, so supply cost
    // is surrogated as p_retailprice × 0.6): five-way join → profit per
    // (nation, year). The operator essence — multi-join fan-in, arithmetic
    // aggregate, two-level grouping — is unchanged by the surrogate.
    // The profit sum SUBTRACTS comparable-magnitude terms, so double
    // accumulation-order noise survives 2-dp rounding (observed: one group
    // off by 0.01 vs DuckDB); all inputs are 2-dp-clean, so both engines
    // aggregate in exact DECIMAL and cast after rounding.
    "q9_profit" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
          CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
                       - CAST(p.p_retailprice AS DECIMAL(18,2))
                         * CAST(0.6 AS DECIMAL(2,1))
                         * CAST(l.l_quantity AS DECIMAL(18,0))), 2)
            AS DOUBLE) AS profit
        FROM v_lineitem l
        JOIN v_part p ON p.p_partkey = l.l_partkey
        JOIN v_supplier s ON s.s_suppkey = l.l_suppkey
        JOIN v_nation n ON n.n_nationkey = s.s_nationkey
        JOIN v_orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%e%'
        GROUP BY n.n_name, year(o.o_orderdate)
        ORDER BY nation ASC, o_year DESC
      """)
    }),

    // TPC-H Q11 shape (adapted: lineitem is the stock relation): per-part
    // value with a HAVING over a scalar subquery threshold — Catalyst
    // decorrelates the subquery into a cross-joined single-row aggregate.
    // Both sides of the threshold comparison are rounded (cross-engine
    // boundary rule, cf. q17).
    "q11_important_parts" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT l.l_partkey AS p_key,
          round(sum(l.l_extendedprice * l.l_quantity), 2) AS val
        FROM v_lineitem l
        JOIN v_supplier s ON s.s_suppkey = l.l_suppkey
        JOIN v_nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
        HAVING round(sum(l.l_extendedprice * l.l_quantity), 6) > round((
          SELECT sum(l2.l_extendedprice * l2.l_quantity) * 0.001
          FROM v_lineitem l2
          JOIN v_supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN v_nation n2 ON n2.n_nationkey = s2.s_nationkey
          WHERE n2.n_name = 'NATION_3'), 6)
        ORDER BY val DESC, p_key ASC
      """)
    }),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER join
    // with the filter in the JOIN condition (not WHERE; customers with zero
    // orders must survive), then aggregate-of-aggregate.
    "q13_order_distribution" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM v_customer c
          LEFT JOIN v_orders o ON o.o_custkey = c.c_custkey
            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
      """)
    }),

    // TPC-H Q15 shape: windowed revenue per supplier (the classic's view),
    // top supplier(s) via a scalar max subquery over the derived table.
    // The equality compares 2-dp-rounded sums on both engines.
    "q15_top_supplier" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
          FROM v_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM v_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
      """)
    }),

    // TPC-H Q16 shape (adapted: lineitem is the part↔supplier relation):
    // distinct-supplier counts per (brand, size) with a NOT IN exclusion
    // subquery — Catalyst plans it as a null-aware anti join.
    "q16_supplier_cnt" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM v_part p JOIN v_lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 0.0)
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_size ASC
      """)
    }),

    // TPC-H Q20 shape (adapted): suppliers in one nation who shipped more
    // than 50 units of some SMALL part — IN over a grouped+HAVING subquery
    // (semi join on an aggregate).
    "q20_qty_supplier" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT s.s_name, s.s_acctbal
        FROM v_supplier s JOIN v_nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_5' AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM v_lineitem l JOIN v_part p ON l.l_partkey = p.p_partkey
          WHERE p.p_type = 'SMALL'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING sum(l.l_quantity) > 50.0)
        ORDER BY s.s_name
      """)
    }),

    // TPC-H Q21 shape (adapted: no receipt/commit dates — "kept waiting" is
    // re-expressed as "sole returning supplier"): suppliers with a returned
    // line in a multi-supplier finished order where NO other supplier
    // returned — correlated EXISTS + NOT EXISTS pair, decorrelated by
    // Catalyst into semi + anti joins on l_orderkey.
    "q21_waiting_supplier" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT s.s_name, count(*) AS numwait
        FROM v_supplier s
        JOIN v_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN v_orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM v_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM v_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT 20
      """)
    }),

    // TPC-H Q22 shape (adapted: country code = c_nationkey mod 5): rich
    // customers with no RECENT orders — scalar average subquery threshold +
    // correlated NOT EXISTS anti join. The fixture gives every customer at
    // least one order (unlike TPC-H's 1/3 orderless customers), so the
    // NOT EXISTS is date-bounded ("lapsed since 1998") to keep the
    // anti-join face non-vacuous: the fixture yields rows at sf0.01. The
    // threshold and money sum follow the repo rounding rules (avg→6dp both
    // sides; sum in exact decimal).
    "q22_no_orders" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""
        SELECT CAST(c.c_nationkey % 5 AS INT) AS cntrycode,
               count(*) AS numcust,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
        FROM v_customer c
        WHERE c.c_nationkey % 5 IN (1, 2, 3)
          AND c.c_acctbal > (
            SELECT round(avg(c2.c_acctbal), 6) FROM v_customer c2
            WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 5 IN (1, 2, 3))
          AND NOT EXISTS (
            SELECT 1 FROM v_orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY 1
        ORDER BY 1
      """)
    }),

    // Math scalar functions.
    "math_funcs" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") - 1000.0), 6).as("abs_diff"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          round(log(lit(1.0) + col("l_extendedprice")), 6).as("ln_price"),
          round(log(10.0, col("l_extendedprice") + 1.0), 6).as("log10_price"),
          round(pow(col("l_quantity"), 2), 6).as("qty_sq"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          signum(col("l_tax") - 0.04).as("tax_sign"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Conditional scalar functions.
    "conditional_funcs" -> ((s, dir) => {
      orders(s, dir)
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_x"),
          greatest(col("o_totalprice"), lit(100000.0)).as("price_floor100k"),
          least(col("o_totalprice"), lit(100000.0)).as("price_cap100k"),
          when(col("o_totalprice") >= 150000.0, "big")
            .when(col("o_totalprice") >= 50000.0, "mid")
            .otherwise("small").as("bucket"))
        .orderBy(col("o_orderkey"))
    }),

    // Map functions over semi-structured props (map<string,int> view).
    "map_funcs" -> ((s, dir) => {
      events(s, dir)
        .filter(col("event_id") < 1000)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .select(
          col("event_id"),
          size(col("m")).as("n_keys"),
          concat_ws(",", map_keys(col("m"))).as("keys"),
          element_at(col("m"), "k").as("k_val"))
        .orderBy(col("event_id"))
    }),

    // Backward as-of join (union+window carry — no range-join blowup):
    // each purchase event picks the user's most recent click at-or-before
    // it. Oracle = DuckDB's native ASOF LEFT JOIN.
    "asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.backward(purchases, clicks,
          "user_id", "ts", "event_id",
          Map("value" -> "click_value", "ts" -> "click_ts"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          round(col("click_value"), 2).as("click_value"),
          unix_micros(col("click_ts")).as("click_ts_us"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Last-touch attribution — the marketing rollup the as-of carry
    // exists for: each purchase claims the user's most recent click
    // (AsOfJoin.backward), the click's campaign comes out of its JSON
    // props, a 4-hour lookback gates the claim (stale clicks → organic),
    // and the report is one partial+final aggregate per campaign.
    "attribution_last_touch" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          concat(lit("c"), (get_json_object(col("props"), "$.k").cast("int") % 5)
            .cast("string")).as("campaign"))
      graft.operators.AsOfJoin.backward(purchases, clicks,
          "user_id", "ts", "event_id",
          Map("campaign" -> "campaign", "ts" -> "click_ts"))
        .withColumn("attributed",
          when(col("click_ts").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("click_ts")) <=
              4L * 3600 * 1000000,
            col("campaign")).otherwise(lit("organic")))
        .groupBy(col("attributed"))
        .agg(count(lit(1)).as("conversions"),
          round(sum(col("value")), 2).as("revenue"))
        .select(col("attributed").as("campaign"),
          col("conversions"), col("revenue"))
        .orderBy(col("campaign"))
    }),

    // LINEAR multi-touch attribution — the fairness upgrade from
    // last-touch: every in-window click splits the purchase's credit
    // equally (value/n), no-click purchases stay organic at full value.
    // Clicks meet purchases in a user_id equi-join with a time residual
    // (the interval-join shape — never a theta join), and the per-
    // purchase touch count is a window bounded by that purchase's own
    // clicks.
    "attribution_linear" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("pid"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"),
          concat(lit("c"), (get_json_object(col("props"), "$.k").cast("int") % 5)
            .cast("string")).as("campaign"))
      purchases.join(clicks,
          purchases("user_id") === clicks("user_id") &&
            col("cts") <= col("pts") &&
            unix_micros(col("pts")) - unix_micros(col("cts")) <= 4L * 3600 * 1000000,
          "left")
        .withColumn("n_touch",
          count(col("campaign")).over(Window.partitionBy(col("pid"))))
        .select(coalesce(col("campaign"), lit("organic")).as("campaign"),
          when(col("n_touch") === 0, col("value"))
            .otherwise(col("value") / col("n_touch")).as("credit"))
        .groupBy(col("campaign"))
        // fractional credits summed in exact DECIMAL after a 6-dp round:
        // a double fold's last bits depend on summation order, and with
        // hundreds of value/n fractions the 2-dp boundary (x.xx5) is
        // actually hit — same convention as q9's DECIMAL profit sum
        .agg(count(lit(1)).as("touches"),
          round(sum(round(col("credit"), 6).cast("decimal(18,6)")), 2)
            .cast("double").as("revenue"))
        .orderBy(col("campaign"))
    }),

    // Forward as-of join (same union+window carry, time axis reversed):
    // each purchase picks the user's EARLIEST click at-or-after it.
    "asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.forward(purchases, clicks,
          "user_id", "ts", "event_id",
          Map("value" -> "click_value", "ts" -> "click_ts"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          round(col("click_value"), 2).as("click_value"),
          unix_micros(col("click_ts")).as("click_ts_us"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Gap-filling resample (telemetry downsampling): a per-user 1-minute
    // grid over a fixed 30-minute horizon, forward-filled with each
    // user's most recent click value via the SAME one-shuffle as-of
    // carry — grid generation is sequence+explode (map-side from a
    // broadcast 1-row bound), so the only exchange is the as-of key
    // shuffle. The missing-timestamp half of time-series handling that
    // asof_join (event-to-event) doesn't exercise.
    "resample_fill" -> ((s, dir) => {
      val ev = events(s, dir)
      val bounds = ev.agg(date_trunc("minute", min(col("ts"))).as("t0"))
      val users = ev.filter(col("user_id") < 5).select(col("user_id")).distinct()
      val grid = users.crossJoin(broadcast(bounds))
        .select(col("user_id"), col("t0"),
          explode(sequence(col("t0"), col("t0") + expr("INTERVAL 30 MINUTES"),
            expr("INTERVAL 1 MINUTE"))).as("ts"))
        .withColumn("event_id", // unique synthetic id, disjoint from real ids
          (lit(-1L) - col("user_id") * 1000 -
            ((unix_micros(col("ts")) - unix_micros(col("t0"))) /
              lit(60000000L)).cast("long")))
        .drop("t0")
      val clicks = ev.filter(col("event_type") === "click" && col("user_id") < 5)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.backward(grid, clicks, "user_id", "ts", "event_id",
          Map("value" -> "filled_value", "ts" -> "src_ts"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          round(col("filled_value"), 2).as("filled_value"),
          unix_micros(col("src_ts")).as("src_ts_us"))
        .orderBy(col("user_id"), col("ts_us"))
    }),

    // Extended window surface: ntile / lag / lead / percent_rank /
    // cume_dist plus a RANGE frame (value-bounded running sum). The
    // ordering inside each partition is unique (price, orderkey), so the
    // positional functions are engine-deterministic.
    "window_funcs_ext" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, dir).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice"), 2).as("price"),
          ntile(4).over(w).as("quartile"),
          round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
          round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          round(expr(
            """sum(o_totalprice) OVER (PARTITION BY o_orderpriority
              |ORDER BY o_totalprice
              |RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)""".stripMargin), 2)
            .as("range_sum"))
        .orderBy(col("o_orderkey"))
    }),

    // Approximate percentiles (GK sketch) with a RANK-error-bound oracle:
    // percentile_approx guarantees rank error ≤ 1/accuracy, so with
    // accuracy 10000 the estimate must land between the exact quantiles at
    // q ± 0.01 — the oracled booleans assert exactly that (same pattern as
    // approx_distinct: sketch internals aren't portable, the guarantee is).
    "approx_percentiles" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("exact_p50"),
          round(expr("percentile(value, 0.9)"), 6).as("exact_p90"),
          expr("percentile_approx(value, 0.5, 10000)").as("a50"),
          expr("percentile_approx(value, 0.9, 10000)").as("a90"),
          expr("percentile(value, 0.49)").as("lo50"),
          expr("percentile(value, 0.51)").as("hi50"),
          expr("percentile(value, 0.89)").as("lo90"),
          expr("percentile(value, 0.91)").as("hi90"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_p50"), col("exact_p90"), col("n"),
          (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_in_rank_bound"),
          (col("a90") >= col("lo90") && col("a90") <= col("hi90")).as("p90_in_rank_bound"))
        .orderBy(col("event_type"))
    }),

    // KLL mergeable quantile sketch with DUMPED-STATE replay — unlike
    // approx_percentiles (GK state never leaves the agg), the sketch items
    // land on disk, every estimate is a pure fold over the dump (DuckDB
    // replays it identically), and the in_bound audit uses the sketch's
    // own carried worst-case rank certificate (Kll scaladoc) — sound for
    // ANY merge order, so no task-schedule flake. One counting pass over
    // events against a 4-row broadcast closes the audit.
    "kll_quantiles" -> ((s, dir) => {
      import graft.operators.Kll
      Kll.layout(s, dir)
      import s.implicits._
      val items = s.read.parquet(Kll.itemsPath(dir))
      val meta = s.read.parquet(Kll.metaPath(dir)) // (err, n) — 1 row
      val qs = Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
        .toDF("pct", "q")
      val wCum = Window.partitionBy(col("pct")).orderBy(col("value"))
      val est = items.groupBy(col("value")).agg(sum(col("weight")).as("w"))
        .crossJoin(broadcast(qs)) // sketch-sized frame × 4 percentiles
        .withColumn("cw", sum(col("w")).over(wCum))
        .crossJoin(broadcast(meta))
        .filter(col("cw") >= col("q") * col("n")) // Σweight = n by conservation
        .groupBy(col("pct"), col("q"), col("err"))
        .agg(min(col("value")).as("est")) // first cumulative crossing
      events(s, dir).select(col("value").as("v"))
        .crossJoin(broadcast(est))
        .groupBy(col("pct"), col("q"), col("err"), col("est"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("cnt_le"),
          sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("cnt_lt"))
        // true rank interval [cnt_lt+1, cnt_le] must meet q·N ± err;
        // compare on the UNROUNDED estimate (rounding could cross a tie)
        .select(col("pct"), round(col("est"), 6).as("est"), col("n"),
          col("cnt_le"), col("cnt_lt"), col("err"),
          (col("cnt_le") >= col("q") * col("n") - col("err") &&
            col("cnt_lt") < col("q") * col("n") + col("err")).as("in_bound"))
        .orderBy(col("pct"))
    }),

    // MERGEABLE sketches — the distributed-cardinality workhorse: per-half
    // DataSketches HLL sketches built independently, merged with
    // hll_union_agg, estimate checked against the exact distinct count
    // (±5%; lgK=12 → rsd ≈1.6%, so 5% is ≈3σ). Mergeability is what makes
    // sketch state shippable across 1000 executors / days of partitions —
    // union(sketch(A), sketch(B)) ≈ sketch(A ∪ B) with no re-scan.
    "hll_sketch_ops" -> ((s, dir) => {
      val halves = lineitem(s, dir)
        .groupBy((col("l_orderkey") % 2).as("half"))
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
      val merged = halves.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_union"),
        count(lit(1)).as("n_sketches"))
      val exact = lineitem(s, dir)
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      merged.crossJoin(exact)
        .select(col("exact_parts"), col("n_sketches"),
          (abs(col("est_union") - col("exact_parts")) <=
            col("exact_parts").cast("double") * lit(0.05)).as("within_5pct"))
    }),

    // Statistical aggregates: correlation / covariance / spread per group
    // (all partial-aggregable one-pass moments — the same map-side-combine
    // shape as sum/avg at any scale).
    "stats_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
          round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
          round(var_samp(col("l_quantity")), 6).as("qty_var"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Ordered-set / ranked aggregates new in Spark 4: listagg WITHIN GROUP
    // (ordered, DISTINCT string concat — the SQL:2016 ordered-set
    // aggregate), deterministic mode() (ties → lowest value), exact
    // median(). All partial-aggregable group digests: listagg's state is
    // the distinct value set (bounded by the priority domain), mode's is
    // the per-value count map, median's the value multiset — the same
    // map-side-combine shape as sum/avg for bounded domains.
    "ordered_set_aggs" -> ((s, dir) => {
      orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("listagg(DISTINCT o_orderpriority, ',') WITHIN GROUP (ORDER BY o_orderpriority)")
            .as("priorities"),
          expr("mode(o_orderpriority, true)").as("mode_priority"),
          round(expr("median(o_totalprice)"), 2).as("median_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // SQL-language UDF (Spark 4 CREATE FUNCTION ... RETURN expr): the
    // function body is INLINED into the plan by ResolveSQLFunctions, so it
    // optimizes and codegens exactly like writing the expression by hand —
    // zero serialization wall, unlike a JVM/Python UDF. The portable way
    // to ship scalar business logic across a 1000-executor cluster.
    "sql_udf" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
              |RETURNS DOUBLE RETURN p * (1.0 - d)""".stripMargin)
      s.sql("""SELECT l_returnflag,
              |  round(sum(disc_price(l_extendedprice, l_discount)), 2) AS revenue,
              |  count(*) AS n
              |FROM v_lineitem
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    }),

    // UNPIVOT (wide → long): per-flag measure columns melted into
    // (measure, val) rows — the inverse of pivot_agg. Map-only reshape
    // after the aggregate; no extra shuffle.
    "unpivot_funcs" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
          "measure", "val")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // LATERAL correlated subquery (SQL:1999): per-customer top-2 orders by
    // price — the row-source form of a windowed top-N. Catalyst
    // decorrelates into a ranked join; the DataFrame twin is window_topn.
    "lateral_topn" -> ((s, dir) => {
      sqlViews(s, dir)
      s.sql("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
              |FROM v_customer c,
              |LATERAL (
              |  SELECT o_orderkey, o_totalprice FROM v_orders
              |  WHERE o_custkey = c.c_custkey
              |  ORDER BY o_totalprice DESC, o_orderkey ASC
              |  LIMIT 2
              |) o
              |WHERE c.c_custkey < 50
              |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
    }),

    // Exact percentiles (linear interpolation) per group.
    "percentiles" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Array scalar functions over the vector column.
    "array_funcs" -> ((s, dir) => {
      embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dims"),
          round(array_max(col("embedding")).cast("double"), 6).as("arr_max"),
          round(array_min(col("embedding")).cast("double"), 6).as("arr_min"),
          round(aggregate(col("embedding"), lit(0.0), (a, x) => a + x.cast("double")), 6)
            .as("arr_sum"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("elem0"))
        .orderBy(col("vec_id"))
    }),

    // Pivot: order counts per priority, statuses as columns. Spark pivot
    // yields NULL for an absent (priority, status) cell while the oracle's
    // count FILTER yields 0 — coalesce so empty cells agree at every sf.
    "pivot_agg" -> ((s, dir) => {
      orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy(col("o_orderpriority"))
    }),

    // HLL sketch distinct counts (approx_count_distinct). Raw estimates are
    // algorithm-specific and not portable across engines, so the oracled
    // output is the error BOUND: exact count per group plus a boolean
    // asserting the sketch landed within 3σ of it (rsd=0.05 → 15% bound,
    // deterministic in practice since Spark's HLL++ is seed-free). The
    // oracle emits literal TRUE — a hash-match proves the sketch held the
    // bound. rsd was 0.01 (~16× the register space of the default) until
    // round 6 — the extra precision bought no assertion strength and made
    // this the registry's most expensive query (round-5 verdict #5).
    // Exact twin: distinct_agg.
    "approx_distinct" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * lit(0.15)).as("within_3sigma"))
        .orderBy(col("l_returnflag"))
    }),

    // Distinct aggregation: exact distinct counts per group.
    "distinct_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ROC-AUC of a score against a binary outcome — the distributed model
    // eval everyone computes with a global per-row rank, which plans a
    // single-partition window over the corpus. Instead: quantize scores to
    // 0.1 bins (histogram AUC — what large-scale eval uses anyway), reduce
    // the corpus to one (bin → pos/neg) digest, and run the tie-aware
    // Mann-Whitney rank-sum as a window over the DIGEST, bounded by
    // score-range/bin-width (~1k rows here), never by the corpus:
    // AUC = Σ_bins pos_b · (neg_below + neg_tied/2) / (P·N).
    "auc_score" -> ((s, dir) => {
      val binned = events(s, dir).select(
        round(col("value"), 1).as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val digest = binned.groupBy(col("bin"))
        .agg(sum(col("pos")).as("n_pos"), sum(lit(1L) - col("pos")).as("n_neg"))
      // unpartitioned window: input is the score-bin digest (bounded by the
      // score range / bin width, not the corpus) — allowlisted with that
      // justification in PlanLintSpec's unpartitioned-window lint
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      digest
        .withColumn("neg_below", coalesce(sum(col("n_neg")).over(w), lit(0L)))
        .agg(
          round(
            sum(col("n_pos") * (col("neg_below").cast("double") +
              col("n_neg").cast("double") / lit(2.0))) /
              (sum(col("n_pos")) * sum(col("n_neg"))).cast("double"), 6).as("auc"),
          sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))
    }),

    // ROC curve points at fixed thresholds — the operating-point table
    // behind auc_score's single number: TPR/FPR from the same (bin →
    // pos/neg) digest, one threshold membership explode over digest rows
    // (9 × |digest|, map-side combined back to 9 rows). Monotone by
    // construction; the serving team picks the knee.
    "roc_curve" -> ((s, dir) => {
      val digest = events(s, dir)
        .select(round(col("value"), 1).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .groupBy(col("bin"))
        .agg(sum(col("pos")).as("n_pos"), sum(lit(1L) - col("pos")).as("n_neg"))
      val tot = digest.agg(sum(col("n_pos")).as("p"), sum(col("n_neg")).as("n"))
      digest
        .select(col("bin"), col("n_pos"), col("n_neg"),
          explode(sequence(lit(1), lit(9))).as("t"))
        .groupBy(col("t"))
        .agg(sum(when(col("bin") >= col("t") * 10, col("n_pos")).otherwise(0L)).as("tp"),
          sum(when(col("bin") >= col("t") * 10, col("n_neg")).otherwise(0L)).as("fp"))
        .crossJoin(broadcast(tot))
        .select((col("t") * 10).cast("double").as("threshold"),
          round(col("tp").cast("double") / col("p"), 6).as("tpr"),
          round(col("fp").cast("double") / col("n"), 6).as("fpr"))
        .orderBy(col("threshold"))
    }),

    // Benford first-digit audit — the cheap fraud/synthetic-data smell
    // test: natural multi-scale magnitudes follow P(d) = log10(1+1/d);
    // fabricated or truncated data doesn't. First digit extracted via
    // integer string arithmetic (floor is exact; int→string rendering is
    // engine-identical, double→string is NOT), χ² against the Benford
    // expectation as 9-row digest arithmetic.
    "benford_check" -> ((s, dir) => {
      val obs = orders(s, dir)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
          1, 1).cast("int").as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum(col("n_obs")).as("n"))
      obs.crossJoin(broadcast(tot))
        .withColumn("expected", col("n") * log10(lit(1.0) + lit(1.0) / col("d")))
        .select(col("d"), col("n_obs"),
          round(col("expected"), 2).as("n_exp"),
          round(pow(col("n_obs") - col("expected"), 2) / col("expected"), 4)
            .as("chi2_term"))
        .orderBy(col("d"))
    }),

    // Poisson bootstrap confidence interval (Chamandy 2012 — the
    // resampling scheme that actually runs at scale): instead of B full
    // resamples, each row draws a deterministic pseudo-Poisson(1) weight
    // per replicate from a hash — one pass, B × |digest| partials map-side
    // combined to B replicate means, CI = percentiles over the 32-row
    // replicate digest. No data movement beyond B rows per partition.
    "bootstrap_ci" -> ((s, dir) => {
      val b = 32
      val reps = orders(s, dir)
        .select(col("o_orderkey").as("id"), col("o_totalprice").as("x"))
        .select(col("id"), col("x"), explode(sequence(lit(0), lit(b - 1))).as("r"))
        .withColumn("u",
          ((col("id") * 2654435761L + col("r") * 2246822519L) % 1000000007L)
            .cast("double") / 1000000007.0)
        // Poisson(1) cdf thresholds: e^-1, 2e^-1, 2.5e^-1·2, ...
        .withColumn("w",
          when(col("u") < 0.3678794412, 0)
            .when(col("u") < 0.7357588823, 1)
            .when(col("u") < 0.9196986029, 2)
            .when(col("u") < 0.9810118431, 3).otherwise(4))
        .groupBy(col("r"))
        .agg((sum(col("w") * col("x")) / sum(col("w"))).as("mean_r"))
      val point = orders(s, dir).agg(avg(col("o_totalprice")).as("m"))
      reps.agg(
          expr("percentile(mean_r, 0.025D)").as("lo"),
          expr("percentile(mean_r, 0.975D)").as("hi"),
          count(lit(1)).as("n_reps"))
        .crossJoin(point)
        .select(col("n_reps"), round(col("m"), 2).as("mean"),
          round(col("lo"), 2).as("ci_lo"), round(col("hi"), 2).as("ci_hi"))
    }),

    // CUPED variance reduction (Deng et al. 2013 — the experimentation-
    // platform standard): per-user pre-period covariate x (days 1-15) and
    // experiment metric y (days 16-30); θ = cov(x,y)/var(x) from ONE
    // pooled moment digest; adjusted metric y' = y − θ(x − E[x]) is
    // map-only over the per-user digest. Reports per-arm raw vs adjusted
    // means and the realized variance-reduction ratio — the number that
    // says how much smaller the experiment could have been. Scale shape:
    // corpus → per-user digest (one partial agg), θ + means = a 1-row
    // broadcast, adjust map-only, final agg digest-sized.
    "cuped_adjust" -> ((s, dir) => {
      val cut = lit("2024-01-16").cast("timestamp")
      val per = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < cut, col("value")).otherwise(0.0)).as("x"),
          sum(when(col("ts") >= cut, col("value")).otherwise(0.0)).as("y"))
        .withColumn("variant",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      val digest = per.agg(
        (covar_samp(col("x"), col("y")) / var_samp(col("x"))).as("theta"),
        avg(col("x")).as("mx"), var_samp(col("y")).as("vy"))
      val adj = per.crossJoin(broadcast(digest))
        .withColumn("y_adj",
          col("y") - col("theta") * (col("x") - col("mx")))
      val arms = adj.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), avg(col("y")).as("m_raw"),
          avg(col("y_adj")).as("m_adj"))
      val vr = adj.agg((lit(1.0) - var_samp(col("y_adj")) / first(col("vy")))
        .as("var_reduction"))
      arms.crossJoin(broadcast(vr)).crossJoin(broadcast(digest.select(col("theta"))))
        .select(col("variant"), col("n"),
          round(col("m_raw"), 4).as("mean_raw"),
          round(col("m_adj"), 4).as("mean_adj"),
          round(col("theta"), 6).as("theta"),
          round(col("var_reduction"), 6).as("var_reduction"))
        .orderBy(col("variant"))
    }),

    // Mann–Whitney U — the nonparametric A/B test (no normality
    // assumption, the robust twin of ab_welch). Tie-exact midranks
    // WITHOUT a row-level global window: values collapse to a (value,
    // per-arm count) digest first, the cumulative-weight window runs
    // over DISTINCT values only, midrank = cum − cnt + (cnt+1)/2, and
    // U_A folds from the digest. For a continuous metric the distinct
    // digest is ~N (this corpus), so production quantizes the metric
    // (cents, or KLL buckets) to make the window genuinely digest-sized
    // — the rank_normalize caveat; the dataflow is unchanged. Normal
    // approximation z with tie-corrected variance.
    "mann_whitney" -> ((s, dir) => {
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byVal = orders(s, dir)
        .select(col("o_totalprice").as("v"),
          when(col("o_orderkey") % 2 === 0, 1.0).otherwise(0.0).as("isA"))
        .groupBy(col("v"))
        .agg(count(lit(1)).cast("double").as("cnt"), sum(col("isA")).as("ca"))
      val ranked = byVal
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("midrank", col("cum") - col("cnt") + (col("cnt") + 1) / 2)
      ranked.agg(
          sum(col("ca") * col("midrank")).as("ra"),
          sum(col("ca")).as("na"),
          sum(col("cnt") - col("ca")).as("nb"),
          sum(col("cnt")).as("n"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"))
        .select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(col("ra") - col("na") * (col("na") + 1) / 2, 2).as("u_stat"),
          round(((col("ra") - col("na") * (col("na") + 1) / 2) -
            col("na") * col("nb") / 2) /
            sqrt(col("na") * col("nb") / 12 *
              ((col("n") + 1) - col("tie3") / (col("n") * (col("n") - 1)))),
            6).as("z"))
    }),

    // Two-sample Kolmogorov–Smirnov test — the DISTRIBUTION-level A/B
    // check beside mann_whitney's location shift: D = max |F_A − F_B|
    // over the pooled empirical CDFs detects variance/shape changes a
    // rank test misses. Same scale shape as mann_whitney: the corpus
    // reduces to the distinct-value digest, CDFs are cumulative windows
    // over it, totals broadcast from one aggregate. D is a max of exact
    // integer-ratio doubles (no summation noise); the asymptotic p-value
    // (Smirnov series with Stephens' small-sample λ correction) is a
    // fixed 100-term fold evaluated in the SAME order on both engines.
    "ks_test" -> ((s, dir) => {
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byVal = orders(s, dir)
        .select(col("o_totalprice").as("v"),
          when(col("o_orderkey") % 2 === 0, 1.0).otherwise(0.0).as("isA"))
        .groupBy(col("v"))
        .agg(count(lit(1)).cast("double").as("cnt"), sum(col("isA")).as("ca"))
      val tot = byVal.agg(sum(col("ca")).as("na"),
        sum(col("cnt") - col("ca")).as("nb"))
      val d = byVal
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cnt") - col("ca")).over(w))
        .crossJoin(broadcast(tot))
        .agg(max(abs(col("cuma") / col("na") - col("cumb") / col("nb")))
          .as("d"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      val ne = col("na") * col("nb") / (col("na") + col("nb"))
      val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * col("d")
      d.select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        round(col("d"), 6).as("d_stat"),
        round(least(lit(1.0), lit(2.0) *
          aggregate(sequence(lit(1), lit(100)), lit(0.0), (acc, k) =>
            acc + when(k % 2 === 1, lit(1.0)).otherwise(lit(-1.0)) *
              exp(lit(-2.0) * k.cast("double") * k.cast("double") *
                lam * lam))), 6).as("p_value"))
    }),

    // Theil–Sen robust trend of the daily revenue series: median of all
    // pairwise slopes (breakdown point 29% vs OLS's 0) + the paired
    // median intercept. The series is a 30-row daily digest, so the
    // pairwise self-join is 435 driver-sized rows — the raw corpus never
    // joins itself. The estimator every monitoring system wants when one
    // bad day would bend a least-squares trend.
    "theil_sen" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(dayofmonth(col("ts")).cast("double").as("d"))
        .agg(sum(col("value")).as("r"))
      val a = daily.select(col("d").as("di"), col("r").as("ri"))
      val b = daily.select(col("d").as("dj"), col("r").as("rj"))
      val slope = a.join(broadcast(b), col("dj") > col("di"))
        .select(((col("rj") - col("ri")) / (col("dj") - col("di"))).as("s"))
        .agg(expr("percentile(s, 0.5D)").as("slope"))
      daily.crossJoin(broadcast(slope))
        .select((col("r") - col("slope") * col("d")).as("b0"), col("slope"))
        .agg(round(first(col("slope")), 6).as("slope"),
          round(expr("percentile(b0, 0.5D)"), 6).as("intercept"),
          count(lit(1)).as("n_days"))
    }),

    // Difference-in-differences: the 2×2 (arm × period) panel estimator —
    // did = (B_post − B_pre) − (A_post − A_pre), the causal-effect
    // workhorse when assignment wasn't randomized. One partial+final agg
    // to a 4-cell digest; arithmetic on one row.
    "diff_in_diff" -> ((s, dir) => {
      val cut = lit("2024-01-16").cast("timestamp")
      events(s, dir)
        .select(when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"),
          when(col("ts") < cut, lit("pre")).otherwise(lit("post")).as("period"),
          col("value"))
        .groupBy(col("arm"), col("period"))
        .agg(avg(col("value")).as("m"))
        .agg(
          sum(when(col("arm") === "A" && col("period") === "pre", col("m"))).as("a_pre"),
          sum(when(col("arm") === "A" && col("period") === "post", col("m"))).as("a_post"),
          sum(when(col("arm") === "B" && col("period") === "pre", col("m"))).as("b_pre"),
          sum(when(col("arm") === "B" && col("period") === "post", col("m"))).as("b_post"))
        .select(round(col("a_pre"), 6).as("a_pre"), round(col("a_post"), 6).as("a_post"),
          round(col("b_pre"), 6).as("b_pre"), round(col("b_post"), 6).as("b_post"),
          round((col("b_post") - col("b_pre")) - (col("a_post") - col("a_pre")), 6)
            .as("did"))
    }),

    // Always-valid sequential monitor (mSPRT — Johari et al. 2017, the
    // "peeking-proof" A/B test every experimentation platform ships): per
    // day, the cumulative mean difference θ̂ feeds a normal-mixture
    // likelihood ratio Λ_d = √(σ²_d/(σ²_d+τ²))·exp(θ̂²τ²/(2σ²_d(σ²_d+τ²)))
    // with τ² = σ² (the pooled variance, one broadcast digest), and the
    // always-valid p-value is 1/runmax(Λ) — monotone by construction, so
    // stopping the experiment the first day it crosses α is valid. Scale
    // shape: corpus → per-(day, arm) digest, cumulative windows run over
    // the 30-row daily digest only.
    "msprt_monitor" -> ((s, dir) => {
      val daily = events(s, dir)
        .select(dayofmonth(col("ts")).cast("long").as("day"),
          when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"),
          col("value"))
        .groupBy(col("day"), col("arm"))
        .agg(count(lit(1)).cast("double").as("n"), sum(col("value")).as("sv"))
      val sigma2 = events(s, dir).agg(var_samp(col("value")).as("s2"))
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily.groupBy(col("day"))
        .agg(sum(when(col("arm") === "A", col("n")).otherwise(0.0)).as("na"),
          sum(when(col("arm") === "B", col("n")).otherwise(0.0)).as("nb"),
          sum(when(col("arm") === "A", col("sv")).otherwise(0.0)).as("sa"),
          sum(when(col("arm") === "B", col("sv")).otherwise(0.0)).as("sb"))
        .select(col("day"),
          sum(col("na")).over(wCum).as("cna"), sum(col("nb")).over(wCum).as("cnb"),
          sum(col("sa")).over(wCum).as("csa"), sum(col("sb")).over(wCum).as("csb"))
      val lam = cum.crossJoin(broadcast(sigma2))
        .withColumn("theta", col("csa") / col("cna") - col("csb") / col("cnb"))
        .withColumn("v_d", col("s2") * (lit(1.0) / col("cna") + lit(1.0) / col("cnb")))
        .withColumn("lambda",
          sqrt(col("v_d") / (col("v_d") + col("s2"))) *
            exp(col("theta") * col("theta") * col("s2") /
              (lit(2.0) * col("v_d") * (col("v_d") + col("s2")))))
      lam.withColumn("p_av",
          least(lit(1.0), lit(1.0) / max(col("lambda")).over(wCum)))
        .select(col("day"), col("cna").cast("long").as("n_a"),
          col("cnb").cast("long").as("n_b"),
          round(col("theta"), 6).as("theta"),
          round(col("lambda"), 6).as("lambda"),
          round(col("p_av"), 6).as("p_always_valid"))
        .orderBy(col("day"))
    }),

    // Delta-method CI for a RATIO metric (Deng 2017 shape) — the A/B
    // staple naive per-row stats get wrong: revenue-per-event's unit of
    // analysis is the USER (numerator and denominator are correlated
    // within a user), so r = ΣX/ΣY and var(r) ≈ (s²x − 2r·sxy + r²·s²y)
    // / (n·ȳ²) over the per-user (X, Y) digests. One per-user partial
    // agg, then a per-arm moment digest; CI arithmetic on 2 rows.
    "ratio_metric_ci" -> ((s, dir) => {
      val z = 1.959963984540054
      val per = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(col("value")).as("x"), count(lit(1)).cast("double").as("y"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      per.groupBy(col("arm"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("x")).as("mx"), avg(col("y")).as("my"),
          var_samp(col("x")).as("vx"), var_samp(col("y")).as("vy"),
          covar_samp(col("x"), col("y")).as("cxy"))
        .withColumn("r", col("mx") / col("my"))
        .withColumn("se", sqrt(
          (col("vx") - lit(2.0) * col("r") * col("cxy") +
            col("r") * col("r") * col("vy")) /
            (col("n") * col("my") * col("my"))))
        .select(col("arm"), col("n").cast("long").as("n_users"),
          round(col("r"), 6).as("ratio"),
          round(col("se"), 6).as("se"),
          round(col("r") - lit(z) * col("se"), 6).as("ci_lo"),
          round(col("r") + lit(z) * col("se"), 6).as("ci_hi"))
        .orderBy(col("arm"))
    }),

    // Fuzzy entity resolution (record linkage) over the part catalog:
    // "same product, different vendor string" — pairs of part rows whose
    // full descriptions (name + brand + type) agree at Jaro-Winkler ≥
    // 0.95. The scale shape is the standard ER recipe (Winkler 1990):
    // BLOCK first (equi-join on the name key — candidates are bounded by
    // the largest block, never the N² cartesian), then verify candidates
    // with the native codegen `jaro_winkler` kernel. At 100 TB the block
    // key hashes the pairs-space down to per-key work; a skewed block
    // splits under AQE like any hot join key. The oracle runs the SAME
    // blocked join with DuckDB's jaro_winkler_similarity — the kernel
    // semantics (window, integer half-transpositions, 0.7-gated prefix
    // boost) are pinned to it, and the 0.95 filter compares the ROUNDED
    // score on both sides so a last-bit ULP can't flip a boundary row.
    "er_fuzzy_match" -> ((s, dir) => {
      GraftFunctions.register(s)
      // MULTI-PASS blocking (Hernández & Stolfo 1998): one coarse key
      // floods the verifier when its domain is small (p_name alone blocks
      // 20k parts into 64 buckets → 3.1M kernel calls at sf0.1), so run
      // TWO narrow passes — (name, brand) and (name, type) — and union
      // the candidate id-pairs. Blocking is BY CONSTRUCTION a recall/cost
      // trade: same-name pairs differing in BOTH brand and type match
      // neither pass key and are never verified, even if their overall
      // sim clears 0.95 — the standard multi-pass posture accepts that in
      // exchange for 5× fewer kernel calls. On this catalog the trade
      // costs nothing: measured 0 lost pairs vs single-key blocking at
      // BOTH sf0.01 and sf0.1 (every ≥0.95 pair here differs in at most
      // one of brand/type); rerun that diff before reusing these keys on
      // a catalog with a different field-similarity profile — the
      // single-key (p_name) variant is the exhaustive fallback. descr
      // strings join back AFTER the distinct so the union shuffles ids
      // only; the part dim auto-broadcasts.
      val e = part(s, dir).select(
        col("p_partkey").as("pk"),
        lower(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")))
          .as("descr"),
        col("p_name").as("k1"), col("p_brand").as("k2"),
        col("p_type").as("k3"))
      def pass(k: String) = e
        .select(col("pk").as("pk_a"), col("k1"), col(k))
        .join(e.select(col("pk").as("pk_b"), col("k1"), col(k)),
          Seq("k1", k))
        .filter(col("pk_a") < col("pk_b"))
        .select(col("pk_a"), col("pk_b"))
      pass("k2").union(pass("k3")).distinct()
        // pin the verifier's parallelism: candidate id-pairs are 16
        // bytes/row, so AQE's byte-based coalescing ran the whole
        // Jaro-Winkler verification (the query's dominant CPU) on 1-2
        // tasks (§2.5 — CPU-dense, byte-small)
        .repartition(s.sparkContext.defaultParallelism,
          col("pk_a"), col("pk_b"))
        .join(e.select(col("pk").as("pk_a"), col("descr").as("descr_a")),
          Seq("pk_a"))
        .join(e.select(col("pk").as("pk_b"), col("descr").as("descr_b")),
          Seq("pk_b"))
        .withColumn("sim",
          round(GraftFunctions.jaroWinkler(col("descr_a"), col("descr_b")), 6))
        .filter(col("sim") >= 0.95)
        .select(col("pk_a"), col("pk_b"), col("sim"))
        .orderBy(col("pk_a"), col("pk_b"))
    }),

    // Split-conformal prediction intervals over the OLS price model —
    // see [[graft.operators.Conformal]]: hash-pure 3-way split, moment-
    // digest fit, q̂ as the finite-sample-corrected order statistic of
    // the calibration scores, dumped so scoring is map-only with literal
    // coefficients. The report is the conformal guarantee made visible:
    // per-returnflag coverage of ŷ ± q̂ on the held-out third, ≥ 1−α
    // marginally. Oracle replays the DUMPED (a, b, q̂) — never re-fits —
    // so every |y−ŷ| ≤ q̂ boundary comparison is bit-identical.
    "conformal_interval" -> ((s, dir) =>
      graft.operators.Conformal.coverageReport(s, dir)),

    // Power analysis / minimum detectable effect — the pre-experiment
    // sizing answer "what lift could this traffic even see?": MDE =
    // (z_{α/2} + z_{power})·SE at α=0.05, power 0.80 over the two arms'
    // (n, variance) digests. One 2-row digest, pure arithmetic.
    "power_mde" -> ((s, dir) => {
      val zA = 1.959963984540054  // Φ⁻¹(0.975)
      val zP = 0.8416212335729143 // Φ⁻¹(0.80)
      val g = orders(s, dir)
        .withColumn("variant",
          when(col("o_orderkey") % 2 === 0, "A").otherwise("B"))
        .groupBy(col("variant"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("o_totalprice")).as("m"), var_samp(col("o_totalprice")).as("v"))
      val a = g.filter(col("variant") === "A")
        .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
      val b = g.filter(col("variant") === "B")
        .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
      a.crossJoin(b)
        .withColumn("se", sqrt(col("va") / col("na") + col("vb") / col("nb")))
        .select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(col("se"), 6).as("se"),
          round((lit(zA) + lit(zP)) * col("se"), 6).as("mde_abs"),
          round((lit(zA) + lit(zP)) * col("se") /
            ((col("na") * col("ma") + col("nb") * col("mb")) /
              (col("na") + col("nb"))), 6).as("mde_rel"))
    }),

    // Welch two-sample t-test for an A/B experiment: each arm reduces to
    // (n, mean, var_samp) in ONE map-side-combined aggregate; the t
    // statistic and Welch–Satterthwaite df are arithmetic over the two
    // 1-row digests (broadcast nested loop on 1-row sides — lint-allowed).
    // At 100 TB the corpus contributes exactly one shuffle of 2 rows.
    "ab_welch" -> ((s, dir) => {
      val g = orders(s, dir)
        .withColumn("variant",
          when(col("o_orderkey") % 2 === 0, "A").otherwise("B"))
        .groupBy(col("variant"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("o_totalprice")).as("m"),
          var_samp(col("o_totalprice")).as("v"))
      val a = g.filter(col("variant") === "A")
        .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
      val b = g.filter(col("variant") === "B")
        .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
      a.crossJoin(b)
        .withColumn("se2", col("va") / col("na") + col("vb") / col("nb"))
        .select(
          col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(col("ma"), 2).as("mean_a"), round(col("mb"), 2).as("mean_b"),
          round((col("ma") - col("mb")) / sqrt(col("se2")), 6).as("t_stat"),
          round(pow(col("se2"), 2) /
            (pow(col("va") / col("na"), 2) / (col("na") - 1) +
             pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 2).as("df"))
    }),

    // RFM customer segmentation (recency / frequency / monetary quintiles).
    // The textbook formulation is three global ntile(5) windows over the
    // per-customer digest — a single partition holding every customer.
    // Scale shape instead: quintile BREAKPOINTS via one exact-percentile
    // aggregate over the digest (4 doubles per dimension), broadcast back,
    // scoring map-only. Equal values land in the same band by construction
    // (ntile would split ties across bands by row position).
    "rfm_segments" -> ((s, dir) => {
      val per = orders(s, dir).groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          round(sum(col("o_totalprice")), 2).as("monetary"))
        .withColumn("rec", unix_micros(col("last_order")))
      val bps = per.agg(
        expr("percentile(rec, array(0.2D,0.4D,0.6D,0.8D))").as("rb"),
        expr("percentile(freq, array(0.2D,0.4D,0.6D,0.8D))").as("fb"),
        expr("percentile(monetary, array(0.2D,0.4D,0.6D,0.8D))").as("mb"))
      def band(x: Column, bp: Column): Column =
        lit(1) + (x > bp(0)).cast("int") + (x > bp(1)).cast("int") +
          (x > bp(2)).cast("int") + (x > bp(3)).cast("int")
      per.crossJoin(broadcast(bps))
        .select(col("o_custkey"),
          band(col("rec").cast("double"), col("rb")).as("r_score"),
          band(col("freq").cast("double"), col("fb")).as("f_score"),
          band(col("monetary"), col("mb")).as("m_score"))
        .withColumn("segment",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .orderBy(col("o_custkey"))
    }),

    // Market-basket association rules (support / confidence / lift): the
    // within-basket pair join is keyed on the basket id, so the shuffle is
    // one pass over (basket, item) digests and every join partition is
    // bounded by the largest single basket — never an all-pairs item join.
    // Item frequencies and the basket total are digest-sized side inputs.
    "assoc_rules" -> ((s, dir) => {
      val baskets = lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
        .distinct()
        // FOUR consumers (item marginals, basket total, both self-join
        // sides) — staged once; unstaged, the corpus-wide distinct ran
        // once per consumer (r15 profile). Digest-width rows only.
        .localCheckpoint()
      val itemN = baskets.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      val total = baskets.agg(countDistinct(col("okey")).as("n_baskets"))
      val pairs = baskets.as("a")
        .join(baskets.as("b"),
          col("a.okey") === col("b.okey") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("pair_n"))
        .filter(col("pair_n") >= 2)
      pairs
        .join(broadcast(itemN.withColumnRenamed("item", "item_a")
          .withColumnRenamed("n_item", "n_a")), "item_a")
        .join(broadcast(itemN.withColumnRenamed("item", "item_b")
          .withColumnRenamed("n_item", "n_b")), "item_b")
        .crossJoin(broadcast(total))
        .select(col("item_a"), col("item_b"), col("pair_n"),
          round(col("pair_n").cast("double") / col("n_a"), 6).as("conf"),
          round(col("pair_n").cast("double") * col("n_baskets") /
            (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy(col("pair_n").desc, col("item_a"), col("item_b"))
        .limit(20)
    }),

    // KMV (k-minimum-values / bottom-k) distinct estimator — the
    // DETERMINISTIC sketch beside engine-specific HLL++ (approx_distinct):
    // k smallest distinct 60-bit hashes; estimate = (k−1)/u_k (Bar-Yossef
    // 2002). Deterministic hash ⇒ the oracle replays the ESTIMATE exactly,
    // not just an error bound. Plan: map-side partial dedup of 8-byte hash
    // digests, then the min-k is TakeOrderedAndProject (bounded per-
    // partition heaps); a fused bounded-state Aggregator (k-heap with
    // inline dedup) would drop the dedup shuffle too — the sketch is
    // trivially mergeable by construction (min-k of unions).
    "kmv_distinct" -> ((s, dir) => {
      val k = 64
      val kth = lineitem(s, dir)
        .select(graft.functions.Digests.digest60(col("l_partkey").cast("string"))
          .as("h"))
        .distinct()
        .orderBy(col("h").asc).limit(k)
        .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
      val exact = lineitem(s, dir)
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      // unsaturated sketch (fewer than k distinct values) IS the distinct
      // set — the estimator formula only applies at m = k
      kth.crossJoin(exact)
        .select(lit(k).as("k"), col("n_exact"),
          round(when(col("m") < k, col("m").cast("double"))
            .otherwise((col("m") - 1).cast("double") /
              (col("hk").cast("double") / lit(1152921504606846976.0))), 2)
            .as("est_kmv"))
    }),

    // Kleinberg burst detection (Kleinberg 2002, "Bursty and Hierarchical
    // Structure in Streams" — the 2-state batch automaton): each day emits
    // r relevant events out of d total; state 0 burns at the corpus base
    // rate p0 = ΣR/ΣD, state 1 at the elevated rate min(2·p0, 0.99);
    // entering the burst costs γ·ln T, leaving is free; the minimum-cost
    // state path (Viterbi) labels the bursty days. This is the episodic
    // twin of `cusum_shift` (which finds ONE level shift; bursts are
    // episodes with returns to base). Scale shape: the corpus reduces to
    // the calendar-bounded daily digest in one map-side-combined agg; the
    // DP runs on the DRIVER over ≤T metadata rows (the Mmr-shortlist
    // posture). Cross-engine determinism: per-day state costs AND every
    // accumulated cost are rounded to 6 before each comparison, so both
    // engines branch on identical doubles (ln ULP dies in the rounding);
    // the oracle replays the identical recursion as recursive CTEs
    // (forward costs + backpointers, then the backward state walk).
    "burst_detect" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("d"),
          sum((col("event_type") === "purchase").cast("long")).as("r"))
        .orderBy(col("day"))
        .collect()
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val t = daily.length
      val sumD = daily.map(_.getLong(1)).sum.toDouble
      val sumR = daily.map(_.getLong(2)).sum.toDouble
      val p0 = sumR / sumD
      val p1 = math.min(2.0 * p0, 0.99)
      val trans = r6(math.log(t.toDouble))
      // forward pass: cost per state + backpointer (predecessor state)
      val c0 = Array.ofDim[Double](t); val c1 = Array.ofDim[Double](t)
      val bp0 = Array.ofDim[Int](t); val bp1 = Array.ofDim[Int](t)
      def sc(p: Double, dd: Long, rr: Long): Double =
        r6(-(rr * math.log(p) + (dd - rr) * math.log(1.0 - p)))
      for (i <- 0 until t) {
        val (dd, rr) = (daily(i).getLong(1), daily(i).getLong(2))
        val (s0, s1) = (sc(p0, dd, rr), sc(p1, dd, rr))
        if (i == 0) { c0(i) = s0; c1(i) = r6(s1 + trans) }
        else {
          bp0(i) = if (c0(i - 1) <= c1(i - 1)) 0 else 1
          c0(i) = r6(math.min(c0(i - 1), c1(i - 1)) + s0)
          val enter = r6(c0(i - 1) + trans)
          bp1(i) = if (enter <= c1(i - 1)) 0 else 1
          c1(i) = r6(math.min(enter, c1(i - 1)) + s1)
        }
      }
      // backward walk
      val st = Array.ofDim[Int](t)
      st(t - 1) = if (c0(t - 1) <= c1(t - 1)) 0 else 1
      for (i <- t - 1 until 0 by -1)
        st(i - 1) = if (st(i) == 0) bp0(i) else bp1(i)
      import s.implicits._
      daily.toSeq.zipWithIndex.map { case (row, i) =>
        (row.getTimestamp(0), row.getLong(1), row.getLong(2), st(i)) }
        .toDF("day", "d", "r", "burst")
        .orderBy(col("day"))
    }),

    // Quantile regression audit (operators/QuantileReg — Koenker 1978,
    // IRLS on moment digests): score the full table against the DUMPED
    // (tau, a, b) lines and report each line's mean pinball loss plus the
    // calibration property that DEFINES a conditional quantile — the
    // fraction of points below the τ-line must sit near τ. Map-only
    // against the 2-row broadcast model; the oracle replays scoring from
    // the same dump (training is never re-fit cross-engine). Integer-exact
    // frac_below; the pinball mean's summation-order ULP dies in round-6.
    "quantile_reg" -> ((s, dir) => {
      graft.operators.QuantileReg.model(s, dir)
      val m = s.read.parquet(graft.operators.QuantileReg.modelPath(dir))
      lineitem(s, dir)
        .select(col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").as("y"))
        .crossJoin(broadcast(m))
        .withColumn("r", col("y") - (col("a") + col("b") * col("x")))
        .groupBy(col("tau"), col("a"), col("b"))
        .agg(count(lit(1)).as("n"),
          round(sum(when(col("r") >= 0, col("tau") * col("r"))
            .otherwise((col("tau") - 1) * col("r"))) / count(lit(1)), 6)
            .as("mean_pinball"),
          round(sum((col("r") < 0).cast("long")).cast("double") /
            count(lit(1)), 6).as("frac_below"))
        .select(col("tau"), round(col("a"), 6).as("a"),
          round(col("b"), 6).as("b"), col("n"),
          col("mean_pinball"), col("frac_below"))
        .orderBy(col("tau"))
    }),

    // Self-join size / second frequency moment F2 = Σ_k f(k)² estimated
    // from the SAME bottom-k hash sample kmv_distinct keeps (Alon, Matias
    // & Szegedy 1996 — the moment the query optimizer needs to cost a
    // join, and the skew statistic that predicts shuffle hot keys). The
    // estimator is threshold sampling over the deterministic 60-bit hash:
    // keys below the kth-smallest hash are a u_k-rate uniform sample of
    // the key domain, so F̂2 = Σ_{h<h_k} f(k)² / (h_k/2^60); with fewer
    // than k distinct keys the sketch IS the frequency table and the
    // estimate is exact. Plan: one map-side-combined frequency digest,
    // a TakeOrdered k-heap for the threshold, integer-exact sums — the
    // division to double happens once at the end, so both engines round
    // the identical value. At 100 TB this is why sketches exist: the
    // exact F2 needs the full key digest; the estimate ships k hashes.
    "selfjoin_size_est" -> ((s, dir) => {
      val k = 64
      val freq = lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
      val hashed = freq.select(col("f"),
        graft.functions.Digests.digest60(col("l_partkey").cast("string")).as("h"))
      val kth = hashed.select(col("h")).orderBy(col("h").asc).limit(k)
        .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
      val exact = freq.agg(sum(col("f") * col("f")).as("f2_exact"))
      val est = hashed.crossJoin(broadcast(kth))
        .filter(col("h") <= col("hk"))
        .groupBy(col("hk"), col("m"))
        .agg(sum(col("f") * col("f")).as("s_incl"),
          sum(when(col("h") < col("hk"), col("f") * col("f"))
            .otherwise(lit(0L))).as("s_excl"))
        .select(col("m"),
          round(when(col("m") < k, col("s_incl").cast("double"))
            .otherwise(col("s_excl").cast("double") /
              (col("hk").cast("double") / lit(1152921504606846976.0))), 2)
            .as("est_f2"))
      est.crossJoin(broadcast(exact))
        .select(lit(k).as("k"), col("f2_exact"), col("est_f2"),
          round(abs(col("est_f2") - col("f2_exact")) / col("f2_exact"), 6)
            .as("rel_err"))
    }),

    // Autocorrelation function of the daily event series (lags 1–7) — the
    // diagnostic that says whether ts_decompose's weekly seasonal is real
    // (a spike at lag 7) and how much memory the series has. The corpus
    // reduces to the daily digest; each lag is a digest self-join on the
    // day index, moments broadcast from one aggregate.
    "acf_daily" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
        .withColumn("idx", row_number().over(Window.orderBy(col("day"))))
      val stats = daily.agg(avg(col("x")).as("mu"),
        sum(pow(col("x"), 2)).as("sx2"), count(lit(1)).as("n"))
        .select(col("mu"), col("n"),
          (col("sx2") - col("n") * col("mu") * col("mu")).as("denom"))
      daily.select(col("idx"), col("x"),
          explode(sequence(lit(1), lit(7))).as("lag"))
        .join(daily.select(col("idx").as("idx0"), col("x").as("x0")),
          col("idx") - col("lag") === col("idx0"))
        .crossJoin(broadcast(stats))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum((col("x") - col("mu")) * (col("x0") - col("mu"))) /
            max(col("denom")), 6).as("acf"))
        .orderBy(col("lag"))
    }),

    // Fano factor (variance-to-mean of daily counts per type) — the
    // overdispersion monitor: ≈1 = Poisson arrivals, >1 = bursty/clumped
    // traffic, <1 = throttled/regular. Two digest aggregates.
    "fano_factor" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          round(avg(col("x")), 6).as("mean_daily"),
          round(var_samp(col("x")), 6).as("var_daily"),
          round(var_samp(col("x")) / avg(col("x")), 6).as("fano"))
        .orderBy(col("event_type"))
    }),

    // Chi-square test of independence over the lang × source contingency
    // table — "does the corpus mix depend on where it came from": expected
    // counts from the marginal digests, χ² summed over the k·m cells.
    "chi2_independence" -> ((s, dir) => {
      val cells = documents(s, dir).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val rowM = cells.groupBy(col("lang")).agg(sum(col("n")).as("rn"))
      val colM = cells.groupBy(col("source")).agg(sum(col("n")).as("cn"))
      val tot = cells.agg(sum(col("n")).cast("double").as("t"))
      cells.join(broadcast(rowM), "lang").join(broadcast(colM), "source")
        .crossJoin(broadcast(tot))
        .withColumn("exp", col("rn") * col("cn") / col("t"))
        .agg(count(lit(1)).as("n_cells"),
          round(sum(pow(col("n") - col("exp"), 2) / col("exp")), 6).as("chi2"))
        .select(col("n_cells"), col("chi2"),
          (col("n_cells") - lit(1)).as("df_note"))
    }),

    // Sample-ratio-mismatch check — the guardrail read BEFORE any
    // experiment metric: if the arm sizes themselves deviate from the
    // designed 50/50 beyond chance (χ², 1 df, 3.841 at α=0.05), the
    // randomizer is broken and every downstream readout (ab_welch,
    // two_proportion_z) is invalid. One user-digest aggregate.
    "srm_check" -> ((s, dir) => {
      val arms = events(s, dir).select(col("user_id")).distinct()
        .groupBy((col("user_id") % 2 === 0).as("armA"))
        .agg(count(lit(1)).cast("double").as("n"))
      val a = arms.filter(col("armA")).select(col("n").as("na"))
      val b = arms.filter(!col("armA")).select(col("n").as("nb"))
      a.crossJoin(b)
        .withColumn("e", (col("na") + col("nb")) / 2)
        .select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(pow(col("na") - col("e"), 2) / col("e") +
            pow(col("nb") - col("e"), 2) / col("e"), 6).as("chi2"),
          (pow(col("na") - col("e"), 2) / col("e") +
            pow(col("nb") - col("e"), 2) / col("e") > 3.841).as("srm_flag"))
    }),

    // Two-proportion z-test — ab_welch's twin for BINARY outcomes (did
    // the user convert): pooled-variance z over per-arm (n, conversions)
    // digests; the experiment readout for rates rather than means.
    "two_proportion_z" -> ((s, dir) => {
      // outcome = "more purchases than views" — scale-free (a has-any-
      // purchase flag saturates to p = 1 on this fixture and the pooled
      // variance degenerates to a division by zero)
      val arms = events(s, dir).groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
          sum(when(col("event_type") === "view", 1L).otherwise(0L)))
          .cast("long").as("converted"))
        .withColumn("arm", when(col("user_id") % 2 === 0, "A").otherwise("B"))
        .groupBy(col("arm"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("converted")).cast("double").as("x"))
      val a = arms.filter(col("arm") === "A")
        .select(col("n").as("na"), col("x").as("xa"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n").as("nb"), col("x").as("xb"))
      a.crossJoin(b)
        .withColumn("p", (col("xa") + col("xb")) / (col("na") + col("nb")))
        .select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(col("xa") / col("na"), 6).as("rate_a"),
          round(col("xb") / col("nb"), 6).as("rate_b"),
          round((col("xa") / col("na") - col("xb") / col("nb")) /
            sqrt(col("p") * (lit(1.0) - col("p")) *
              (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 6)
            .as("z_stat"))
    }),

    // Lorenz curve points — the picture behind gini_concentration: at each
    // revenue decile of customers, the cumulative share of total spend
    // they account for. Rank + running sums over the per-customer digest
    // within one segment-free decile window... windows partition by the
    // decile arithmetic's own bounded key (the digest rank), never raw
    // orders.
    "lorenz_curve" -> ((s, dir) => {
      val per = orders(s, dir).groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).cast("decimal(18,2)").as("rev"))
      val w = Window.orderBy(col("rev"), col("o_custkey"))
      val tot = per.agg(sum(col("rev")).as("trev"),
        count(lit(1)).as("n_cust"))
      per
        .withColumn("i", row_number().over(w))
        .withColumn("cum", sum(col("rev")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tot))
        .withColumn("decile", ceil(col("i") * 10 / col("n_cust")).cast("int"))
        .groupBy(col("decile"))
        .agg(max(col("i")).as("n_below"),
          round(max(col("cum")).cast("double") /
            max(col("trev")).cast("double"), 6).as("cum_share"))
        .orderBy(col("decile"))
    }),

    // Kaplan-Meier survival curve (Kaplan & Meier 1958) — "how long do
    // users stay active", with the censoring a naive average of lifetimes
    // gets wrong: users still active at the observation edge (last event
    // within 1 day of corpus end) contribute risk-time but no churn
    // event. Per-user lifetimes reduce to a (duration → churned/censored)
    // digest; at-risk counts are a descending cumulative over the digest,
    // and S(t) = Π(1 − dᵢ/nᵢ) runs as exp of a running log-sum (windows
    // over the duration digest, bounded by the calendar).
    "survival_curve" -> ((s, dir) => {
      val perUser = events(s, dir).groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
      val endUs = events(s, dir).agg(max(unix_micros(col("ts"))).as("end_us"))
      val lives = perUser.crossJoin(broadcast(endUs))
        .select(
          expr("(last_us - first_us) DIV 86400000000").as("t_days"),
          (col("last_us") < col("end_us") - 86400000000L).cast("long").as("churn"))
      val digest = lives.groupBy(col("t_days"))
        .agg(count(lit(1)).as("ending"), sum(col("churn")).as("d"))
      val wRisk = Window.orderBy(col("t_days"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wS = Window.orderBy(col("t_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      digest
        .withColumn("n_risk", sum(col("ending")).over(wRisk))
        .withColumn("s", exp(sum(
          log(lit(1.0) - col("d").cast("double") / col("n_risk"))).over(wS)))
        .filter(col("d") > 0)
        .select(col("t_days"), col("n_risk"), col("d").as("d_churn"),
          round(col("s"), 6).as("survival"))
        .orderBy(col("t_days"))
    }),

    // One-way ANOVA F statistic from group moments — "do the group means
    // differ at all", the k-group generalization of ab_welch's two arms:
    // SSB/SSW from one per-group (n, mean, var) digest + a 1-row grand
    // mean. Closed form, one pass, nothing collected.
    "anova_f" -> ((s, dir) => {
      val g = lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("l_quantity")).as("m"),
          var_samp(col("l_quantity")).as("v"))
      val grand = lineitem(s, dir).agg(avg(col("l_quantity")).as("gm"),
        count(lit(1)).cast("double").as("gn"))
      g.crossJoin(broadcast(grand))
        .agg(count(lit(1)).cast("double").as("k"),
          sum(col("n") * pow(col("m") - col("gm"), 2)).as("ssb"),
          sum((col("n") - 1) * col("v")).as("ssw"),
          max(col("gn")).as("gn"))
        .select(col("k").cast("long").as("k"), col("gn").cast("long").as("n"),
          round(col("ssb"), 4).as("ssb"), round(col("ssw"), 4).as("ssw"),
          round((col("ssb") / (col("k") - 1)) /
            (col("ssw") / (col("gn") - col("k"))), 6).as("f_stat"))
    }),

    // Grid-blocked radius search — the distributed spatial-join shape:
    // points land in 5° grid cells (at scale the cell IS the partition
    // key), a radius query scans only the cell neighborhood that can
    // contain the radius, and exact haversine filters within it. The
    // ORACLE runs UNBLOCKED over every point — the hash match is the
    // proof that the 5×5 neighborhood is a superset of the 800 km ball
    // (blocking may cost reads, never answers). Coordinates synthesized
    // from customer ids (the multimodal trick: both engines re-derive
    // them from identical integer arithmetic).
    "geo_radius" -> ((s, dir) => {
      // md5-derived coordinates (Digests.digest60 with per-axis salts) —
      // multiplicative hashes of sequential ids form a rank-1 lattice in
      // 2-D (the classic LCG-planes defect): the points sat on a few
      // lines and every query ball between them came back empty
      def frac(salt: String): Column =
        graft.functions.Digests.digest60(
          concat(col("c_custkey").cast("string"), lit(salt)))
          .cast("double") / 1152921504606846976.0
      val pts = customer(s, dir).select(col("c_custkey"),
        (lit(-60.0) + frac(":lat") * 120.0).as("lat"),
        (lit(-180.0) + frac(":lon") * 360.0).as("lon"))
      val (qLat, qLon, radiusKm) = (10.0, 20.0, 800.0)
      val blocked = pts.filter(
        floor(col("lat") / 5) >= math.floor(qLat / 5) - 2 &&
        floor(col("lat") / 5) <= math.floor(qLat / 5) + 2 &&
        floor(col("lon") / 5) >= math.floor(qLon / 5) - 2 &&
        floor(col("lon") / 5) <= math.floor(qLon / 5) + 2)
      val dLat = radians(col("lat") - qLat) / 2
      val dLon = radians(col("lon") - qLon) / 2
      val a = pow(sin(dLat), 2) +
        cos(radians(lit(qLat))) * cos(radians(col("lat"))) * pow(sin(dLon), 2)
      blocked
        .withColumn("dist_km", round(lit(2 * 6371.0) * asin(sqrt(a)), 3))
        .filter(col("dist_km") <= radiusKm)
        .select(col("c_custkey"), round(col("lat"), 6).as("lat"),
          round(col("lon"), 6).as("lon"), col("dist_km"))
        .orderBy(col("dist_km"), col("c_custkey"))
        .limit(20)
    }),

    // Trimmed mean — the robust-stats family's aggregate face (IQR/MAD
    // flag outliers; trimming just refuses to let them vote): drop the
    // tails outside [p5, p95] and average the middle. Percentile bounds
    // broadcast back from one digest aggregate, the trim is a map-only
    // filter.
    "trimmed_mean" -> ((s, dir) => {
      val bounds = events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.05D)").as("lo"),
          expr("percentile(value, 0.95D)").as("hi"))
      events(s, dir).join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= col("lo") && col("value") <= col("hi"), 1L)
            .otherwise(0L)).as("n_kept"),
          round(avg(when(col("value") >= col("lo") && col("value") <= col("hi"),
            col("value"))), 6).as("trimmed_mean"),
          round(avg(col("value")), 6).as("plain_mean"))
        .orderBy(col("event_type"))
    }),

    // DAU / rolling-7-day WAU / stickiness — the engagement report: the
    // corpus reduces to the (day, user) distinct digest, daily actives are
    // a count, and the rolling weekly actives come from distinct-flattened
    // per-day user sets over a calendar-bounded window (rows-based: the
    // fixture calendar is contiguous; a production run joins a date spine
    // first, as resample_fill does).
    "active_users" -> ((s, dir) => {
      val du = events(s, dir)
        .select(date_trunc("DAY", col("ts")).as("day"), col("user_id"))
        .distinct()
      val daily = du.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"), collect_set(col("user_id")).as("users"))
      // unpartitioned window over the daily digest — calendar-bounded
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("wau",
          size(array_distinct(flatten(collect_list(col("users")).over(w)))))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy(col("day"))
    }),

    // Week-over-week revenue with percent change — the reporting staple:
    // weekly sums in exact 2-dp DECIMAL, lag over the weeks digest, the
    // delta as double arithmetic at the boundary.
    "period_over_period" -> ((s, dir) => {
      val weekly = orders(s, dir)
        .groupBy(date_trunc("WEEK", col("o_orderdate")).as("week"))
        .agg(round(sum(col("o_totalprice")), 2).cast("decimal(18,2)").as("rev"))
      val w = Window.orderBy(col("week"))
      weekly
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("week"), col("rev").cast("double").as("rev"),
          round((col("rev").cast("double") - col("prev").cast("double")) /
            col("prev").cast("double") * 100, 4).as("pct_change"))
        .orderBy(col("week"))
    }),

    // Transparent materialized-view rewrite (plans/MvRewrite — the
    // aggregate twin of the IVF top-k rewrite): the query below is the
    // plain user aggregate over the SOURCE table; the optimizer swaps the
    // scan+shuffle+agg for the registered groups-sized summary
    // (MvRewriteSpec pins the plan), while the DuckDB oracle computes the
    // same numbers DIRECTLY — a hash match proves the rewrite serves the
    // right rows. Freshness is fingerprint-driven (refreshIfStale), and
    // the maintenance rebuild runs with the rewrite suspended so the MV
    // can never refresh itself from itself.
    "mv_rewrite" -> ((s, dir) => {
      val src = graft.plans.MvDemo.ensure(s, dir)
      s.read.parquet(src).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),

    // Rollup SUBSUMPTION through the same MV: the global corpus totals —
    // no GROUP BY at all — are answered by re-aggregating the G-row
    // summary (Σ cnt_g, Σ sum_g), the query-subsumption face real MV
    // systems advertise. The oracle computes the totals directly.
    "mv_rollup" -> ((s, dir) => {
      val src = graft.plans.MvDemo.ensure(s, dir)
      s.read.parquet(src)
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("total_chars"))
    }),

    // Simple OLS regression per group — slope/intercept/R² straight from
    // the second-moment digest (cov/var/corr are all one-pass
    // map-side-combined aggregates): the price-sensitivity readout
    // (quantity on discount) without collecting anything. The moment
    // formulation is exactly how a 1000-executor regression runs; the
    // closed form needs no iterations at all.
    "ols_slope" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          covar_samp(col("l_discount"), col("l_quantity")).as("cxy"),
          var_samp(col("l_discount")).as("vx"),
          avg(col("l_discount")).as("mx"),
          avg(col("l_quantity")).as("my"),
          corr(col("l_discount"), col("l_quantity")).as("r"))
        .select(col("l_returnflag"), col("n"),
          round(col("cxy") / col("vx"), 6).as("slope"),
          round(col("my") - col("cxy") / col("vx") * col("mx"), 6).as("intercept"),
          round(col("r") * col("r"), 6).as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    // Gini coefficient of revenue concentration per market segment — the
    // marketplace-health metric: 0 = spend spread evenly over customers,
    // →1 = a whale economy. Sort-based formula Σ(2i−n−1)xᵢ / (nΣx) with
    // the rank window PARTITIONED by segment over the per-customer digest
    // — skew bounded by the largest segment, never a global sort.
    "gini_concentration" -> ((s, dir) => {
      val per = orders(s, dir)
        .join(customer(s, dir).select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment")), "o_custkey")
        .groupBy(col("c_mktsegment"), col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("rev"), col("o_custkey"))
      per.withColumn("i", row_number().over(w))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("i") * col("rev")).as("sixr"),
          sum(col("rev")).as("sr"))
        .select(col("c_mktsegment"), col("n_cust"),
          round((lit(2) * col("sixr") - (col("n_cust") + 1) * col("sr")) /
            (col("n_cust") * col("sr")), 6).as("gini"))
        .orderBy(col("c_mktsegment"))
    }),

    // Per-user behavioral entropy — the diversity signal bot detection
    // and engagement scoring both read: H = −Σ p ln p over the user's
    // event-type mix. One (user, type) digest, one per-user fold.
    "session_entropy" -> ((s, dir) => {
      val mix = events(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val tot = mix.groupBy(col("user_id")).agg(sum(col("n")).as("tot"))
      mix.join(tot, "user_id")
        .withColumn("p", col("n").cast("double") / col("tot"))
        .groupBy(col("user_id"))
        .agg(round(-sum(col("p") * log(col("p"))), 6).as("entropy"),
          count(lit(1)).as("n_types"))
        .orderBy(col("user_id"))
    }),

    // Time-decayed aggregates (exponential recency weighting, λ = ln2/7 —
    // a 7-day half-life): the counter shape feature stores serve, where
    // yesterday's signal counts double last week's. Reference instant =
    // the corpus max ts (broadcast digest); weights are map-only
    // arithmetic, the aggregate stays one partial+final pass.
    "decayed_counts" -> ((s, dir) => {
      val ref = events(s, dir).agg(max(unix_micros(col("ts"))).as("ref_us"))
      events(s, dir).crossJoin(broadcast(ref))
        .withColumn("age_days",
          (col("ref_us") - unix_micros(col("ts"))).cast("double") / 86400000000.0)
        .withColumn("w", exp(lit(-0.09902102579427789) * col("age_days")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_raw"),
          round(sum(col("w")), 6).as("decayed_n"),
          round(sum(col("w") * col("value")) / sum(col("w")), 6)
            .as("decayed_mean"),
          round(avg(col("value")), 6).as("plain_mean"))
        .orderBy(col("event_type"))
    }),

    // Time-series decomposition (trend / weekly seasonal / residual — the
    // classical-decomposition core of STL): trend = centered 7-day moving
    // average, seasonal = mean detrended value per day-of-week, residual
    // = the anomaly channel monitors then watch. All windows run over the
    // calendar-bounded daily digest; day-of-week is epoch-day arithmetic
    // (engine date functions disagree on week origin, integers don't).
    "ts_decompose" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
        .withColumn("dow", expr("(unix_micros(day) DIV 86400000000) % 7"))
      val wMa = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val trended = daily
        // unpartitioned window: input is the daily digest (calendar-
        // bounded), the same class as auc_score's bin digest
        .withColumn("trend", avg(col("n")).over(wMa))
        .withColumn("detr", col("n") - col("trend"))
      val seasonal = trended.groupBy(col("dow"))
        .agg(avg(col("detr")).as("seas"))
      trended.join(broadcast(seasonal), "dow")
        .select(col("day"), col("n"), round(col("trend"), 6).as("trend"),
          round(col("seas"), 6).as("seasonal"),
          round(col("n") - col("trend") - col("seas"), 6).as("resid"))
        .orderBy(col("day"))
    }),

    // Median imputation of missing values (nulls simulated
    // deterministically) — the repair step between profiling
    // (column_profile counts the nulls) and modeling: per-group median
    // from the non-null digest broadcast back, fill map-only, and the
    // report carries the imputed count beside a value checksum so a
    // repair that silently changed non-missing rows is visible.
    "impute_missing" -> ((s, dir) => {
      val holed = events(s, dir)
        .withColumn("v",
          when(col("event_id") % 13 === 0, lit(null).cast("double"))
            .otherwise(col("value")))
      val med = holed.filter(col("v").isNotNull)
        .groupBy(col("event_type"))
        .agg(expr("percentile(v, 0.5D)").as("med"))
      holed.join(broadcast(med), "event_type")
        .withColumn("filled", coalesce(col("v"), col("med")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_imputed"),
          round(max(col("med")), 6).as("median_used"),
          round(sum(col("filled")), 2).as("filled_sum"))
        .orderBy(col("event_type"))
    }),

    // First-order Markov transition matrix over user event sequences —
    // the behavior model path analysis samples from: P(next | current)
    // via one per-user lead() window + a 25-cell digest aggregate.
    // Rows normalize within the digest (transition counts / row totals).
    "markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val rowTot = trans.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
      trans.join(broadcast(rowTot), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("p"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    // Calibration bins (reliability diagram) — does a score MEAN what it
    // says: per score-decile, predicted rate (mean score/100) vs observed
    // positive rate. The companion to roc_curve/auc_score: AUC measures
    // ranking, calibration measures the probabilities themselves. One
    // bin-digest aggregate.
    "calibration_bins" -> ((s, dir) => {
      events(s, dir)
        .select((floor(col("value") / 10).cast("int")).as("bin"),
          col("value"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .filter(col("bin").between(0, 9))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value") / 100.0), 6).as("pred_rate"),
          round(avg(col("pos").cast("double")), 6).as("obs_rate"))
        .orderBy(col("bin"))
    }),

    // Cohort LTV curves — cohort_retention's revenue sibling: per signup
    // cohort (first-order month), CUMULATIVE average revenue per customer
    // by month offset — the curve a payback model is fit to. Cohorts and
    // offsets are calendar-bounded digests; the running sum is a window
    // over the (cohort, offset) digest, partitioned by cohort.
    "cohort_ltv" -> ((s, dir) => {
      val first = orders(s, dir).groupBy(col("o_custkey"))
        .agg(min(date_trunc("MONTH", col("o_orderdate"))).as("cohort"))
      val sized = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_n"))
      // per-cell revenue rounds to 2 dp then accumulates in EXACT DECIMAL
      // (the q9/attribution_linear convention): a double running sum
      // drifts with summation order and lands on .xx5 rounding boundaries
      val rev = orders(s, dir).join(first, "o_custkey")
        .withColumn("offset",
          months_between(date_trunc("MONTH", col("o_orderdate")), col("cohort"))
            .cast("int"))
        .groupBy(col("cohort"), col("offset"))
        .agg(round(sum(col("o_totalprice")), 2).cast("decimal(18,2)").as("rev"))
      val w = Window.partitionBy(col("cohort")).orderBy(col("offset"))
        .rowsBetween(Window.unboundedPreceding, 0)
      rev.join(broadcast(sized), "cohort")
        .withColumn("cum_rev", sum(col("rev")).over(w))
        .filter(col("offset") <= 6)
        .select(col("cohort"), col("offset"), col("cohort_n"),
          round(col("cum_rev").cast("double") / col("cohort_n"), 2)
            .as("ltv_per_cust"))
        .orderBy(col("cohort"), col("offset"))
    }),

    // Funnel latency — the "how long does conversion take" face of the
    // funnel stage counts: per user, first view → first SUBSEQUENT
    // purchase, then the latency distribution (p50/p90) a product team
    // actually tracks. One user-keyed join + digest percentiles; the
    // percentile input is one row per converted user, never raw events.
    "funnel_latency" -> ((s, dir) => {
      val firstView = events(s, dir).filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
      val conv = events(s, dir).filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("ts") > col("first_view"))
        .groupBy(col("user_id"), col("first_view"))
        .agg(min(col("ts")).as("first_purchase"))
        .withColumn("delta_s",
          expr("(unix_micros(first_purchase) - unix_micros(first_view)) DIV 1000000"))
      conv.agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(delta_s, 0.5D)"), 2).as("p50_s"),
        round(expr("percentile(delta_s, 0.9D)"), 2).as("p90_s"),
        max(col("delta_s")).as("max_s"))
    }),

    // Time-weighted average (TWAP) — the correct mean for irregularly
    // sampled state: each reading holds until the next one, so its weight
    // is its holding DURATION, not 1. A plain avg over-counts bursts (ten
    // readings in a minute ≠ ten hours at that level). One user-keyed
    // shuffle, lead() duration per reading, weighted agg; the final
    // reading carries no duration and drops out, as in any TWAP window.
    "twap_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dur", (col("next_us") - unix_micros(col("ts")))
          .cast("double") / 1000000.0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          round(sum(col("value") * col("dur")) / sum(col("dur")), 6).as("twap"),
          round(avg(col("value")), 6).as("plain_avg"))
        .filter(col("n_intervals") >= 3)
        .orderBy(col("user_id"))
    }),

    // Column profiling — the data-quality census a pipeline runs before
    // trusting a new source: per column null count, distinct count, range,
    // and modal value (ties → smallest value, deterministic). Long-form
    // (one row per column) so adding columns never changes the schema.
    // Each column costs one map-side-combined agg + a mode argmax over its
    // value digest; values stringify at the boundary so heterogeneous
    // columns share the report schema.
    "column_profile" -> ((s, dir) => {
      val d = documents(s, dir)
      def profile(cn: String): DataFrame = {
        // stats run on the NATIVE type (numeric min ≠ lexicographic min),
        // stringify only at the report boundary
        val c = col(cn)
        val base = d.agg(
          count(lit(1)).as("n_rows"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(c).as("n_distinct"),
          min(c).cast("string").as("min_val"),
          max(c).cast("string").as("max_val"))
        val mode = d.filter(c.isNotNull).groupBy(c.as("v"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("v").asc).limit(1)
          .select(col("v").cast("string").as("top_val"), col("n").as("top_n"))
        base.crossJoin(mode).select(lit(cn).as("column"),
          col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("min_val"), col("max_val"), col("top_val"), col("top_n"))
      }
      profile("lang").union(profile("source")).union(profile("n_chars"))
        .orderBy(col("column"))
    }),

    // Item-item collaborative filtering (Sarwar 2001 / Amazon's
    // neighborhood method): sim(i,j) = |buyers(i) ∩ buyers(j)| /
    // √(|buyers(i)|·|buyers(j)|) — binary-vector cosine over the
    // customer×item matrix, WITHOUT materializing it: co-occurrence pairs
    // meet in a customer-keyed join (partitions bounded by the biggest
    // single buyer — the assoc_rules shape), item degrees are a broadcast
    // digest, and the per-item top-3 is a pair-digest window. The "users
    // who bought this also bought" table, deterministic end to end.
    "item_item_recs" -> ((s, dir) => {
      val bought = lineitem(s, dir)
        .join(orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
          col("o_custkey")), "l_orderkey")
        .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
        .distinct()
        // staged: three consumers (degree, both pair-join sides) — without
        // this the join+distinct subtree runs three times
        .localCheckpoint()
      val degree = bought.groupBy(col("item")).agg(count(lit(1)).as("deg"))
      // Anchor-side restriction — the serving-batch shape: recommendations
      // are computed for a catalog slice (items < 200 here; "the pages
      // being rendered"), while the co-occurrence side stays full so every
      // anchor sees ALL its neighbors. The pair volume through the
      // shuffle+agg scales with |anchors|·basket-size, not |catalog|² —
      // the full-catalog run is this same plan sharded over anchor ranges.
      val pairs = bought.filter(col("item") < 200).as("a")
        .join(bought.as("b"),
          col("a.cust") === col("b.cust") && col("a.item") =!= col("b.item"))
        .groupBy(col("a.item").as("item"), col("b.item").as("rec"))
        .agg(count(lit(1)).as("n_common"))
        .filter(col("n_common") >= 2)
      val w = Window.partitionBy(col("item"))
        .orderBy(col("sim").desc, col("rec").asc)
      pairs
        .join(broadcast(degree.select(col("item"), col("deg").as("deg_i"))), "item")
        .join(broadcast(degree.select(col("item").as("rec"), col("deg").as("deg_j"))), "rec")
        .withColumn("sim", round(col("n_common").cast("double") /
          sqrt(col("deg_i").cast("double") * col("deg_j")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("item"), col("rnk"), col("rec"), col("n_common"), col("sim"))
        .orderBy(col("item"), col("rnk"))
        .limit(60)
    }),

    // KMV sketch ALGEBRA — the reason bottom-k beats HLL for set
    // arithmetic: K(A∪B) = k smallest of K_A ∪ K_B exactly (closed under
    // union from the component sketches alone — no rescan), the Jaccard
    // estimate is the fraction of union-sketch hashes present in both
    // sides, and |A∩B| ≈ J·|A∪B| (Beyer 2007). Sketches are 64 longs each;
    // the whole algebra runs over KB-sized frames beside exact audit twins.
    "kmv_set_ops" -> ((s, dir) => {
      def hashed(flag: String) = lineitem(s, dir)
        .filter(col("l_returnflag") === flag)
        .select(graft.functions.Digests.digest60(col("l_partkey").cast("string"))
          .as("h"))
        .distinct()
      def sketch(df: DataFrame) = df.orderBy(col("h").asc).limit(64)
      val ka = sketch(hashed("R")).localCheckpoint()
      val kb = sketch(hashed("A")).localCheckpoint()
      val ku = sketch(ka.union(kb).distinct()).localCheckpoint()
      // unsaturated union sketch = the exact distinct set (m < k rule, as
      // in kmv_distinct); saturated → (m−1)/u_m
      val uEst = ku.agg(max(col("h")).as("hk"), count(lit(1)).as("mu"))
        .select(col("mu"),
          when(col("mu") < 64, col("mu").cast("double"))
            .otherwise((col("mu") - 1).cast("double") /
              (col("hk").cast("double") / lit(1152921504606846976.0)))
            .as("est_union"))
      val common = ku.join(ka, Seq("h"), "left_semi")
        .join(kb, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("n_common"))
      val exact = lineitem(s, dir).filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_partkey"),
          (col("l_returnflag") === "R").as("inA"),
          (col("l_returnflag") === "A").as("inB"))
        .groupBy(col("l_partkey"))
        .agg(max(col("inA")).as("a"), max(col("inB")).as("b"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("exact_inter"))
      uEst.crossJoin(common).crossJoin(exact)
        .select(round(col("est_union"), 2).as("est_union"), col("exact_union"),
          round(col("n_common").cast("double") / col("mu"), 6).as("jacc_est"),
          round(col("n_common").cast("double") / col("mu") * col("est_union"), 2)
            .as("est_inter"),
          col("exact_inter"))
    }),

    // CUSUM change-point detection (Page 1954) — the drift monitor that
    // catches a persistent small shift a per-point z-score never trips on:
    // S_t = max(0, S_{t−1} + (x_t − μ)) accumulates deviation from the
    // baseline mean, flagged when it crosses 2σ. The corpus reduces to the
    // (event_type, day) count digest; the inherently sequential fold runs
    // INSIDE each type's collected day array (bounded by the calendar,
    // never the corpus — the Holt/EWMA fold discipline); baseline moments
    // broadcast back from one digest aggregate.
    "cusum_shift" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      val stats = daily.groupBy(col("event_type"))
        .agg(avg(col("x")).as("mu"), stddev_samp(col("x")).as("sd"))
      daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("xs"))
        .join(broadcast(stats), "event_type")
        .withColumn("ss", expr(
          """slice(aggregate(xs, array(0.0D),
            |  (acc, e) -> concat(acc,
            |    array(greatest(0.0D, element_at(acc, -1) + e.x - mu)))),
            |2, size(xs))""".stripMargin))
        .select(col("event_type"), col("sd"),
          explode(arrays_zip(col("xs"), col("ss"))).as("z"))
        .select(col("event_type"), col("z.xs.day").as("day"),
          col("z.xs.x").as("x"), round(col("z.ss"), 6).as("s"),
          (round(col("z.ss"), 6) > round(lit(2.0) * col("sd"), 6)).as("shift_flag"))
        .orderBy(col("event_type"), col("day"))
    }),

    // 2-D skyline / Pareto frontier (cheapest part at every size point:
    // minimize price, maximize size) — see operators/Skyline for why this
    // is a two-pass range-partitioned scheme and not the quadratic
    // NOT EXISTS self-join the oracle runs, nor a global-window running
    // max. Frontier candidates reduce to the distinct-price digest first.
    "skyline_parts" -> ((s, dir) => {
      Skyline.skyline(
        part(s, dir).select(col("p_partkey"), col("p_retailprice"), col("p_size")),
        "p_retailprice", "p_size")
        .orderBy(col("p_partkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top10" ->
      """SELECT l.l_orderkey, o.o_orderdate,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS rev
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY rev DESC, l.l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS rev
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name
        |ORDER BY rev DESC, n.n_name ASC""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q18_big_orders" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0)
        |ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
        |       AND p.p_size BETWEEN 1 AND 5)
        |   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
        |       AND p.p_size BETWEEN 1 AND 10)
        |   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
        |       AND p.p_size BETWEEN 1 AND 15)""".stripMargin,

    "semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 2
        |ORDER BY o_custkey, rnk""".stripMargin,

    "window_running" ->
      """SELECT user_id, event_id, value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |FROM events
        |ORDER BY user_id, seq""".stripMargin,

    "funnel_stages" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |vc AS (
        |  SELECT v.user_id, c.ts AS t2 FROM v JOIN c ON c.user_id = v.user_id
        |  AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 4 HOUR),
        |vcp AS (
        |  SELECT vc.user_id FROM vc JOIN p ON p.user_id = vc.user_id
        |  AND p.ts > vc.t2 AND p.ts <= vc.t2 + INTERVAL 4 HOUR)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, count(DISTINCT user_id) AS n_users FROM v
        |  UNION ALL
        |  SELECT '2_click', count(DISTINCT user_id) FROM vc
        |  UNION ALL
        |  SELECT '3_purchase', count(DISTINCT user_id) FROM vcp)
        |ORDER BY stage""".stripMargin,

    "sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT *, sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
        |  FROM e)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  round(sum(value), 2) AS value_sum
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "try_funcs" ->
      """SELECT o_orderkey,
        |  round(o_totalprice / (o_orderkey % 3), 6) AS safe_div,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS safe_cast,
        |  ([o_orderkey, o_custkey])[5] AS safe_elem,
        |  CASE WHEN o_orderkey > 0 THEN NULL
        |       ELSE 9223372036854775807 + o_orderkey END::BIGINT AS safe_add,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin,

    // >= gap (not >) replays session_window's [start, start+gap) merge
    // rule; session_end = last event + gap by the same convention.
    "session_window_agg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT *, sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS seq
        |  FROM e)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |  max(ts_us) + 1800000000 AS session_end_us,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM s GROUP BY user_id, seq
        |ORDER BY user_id, session_start_us""".stripMargin,

    "cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts::DATE) AS cohort_d
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events)
        |SELECT f.cohort_d, datediff('day', f.cohort_d, a.d) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY f.cohort_d, day_offset
        |ORDER BY cohort_d, day_offset""".stripMargin,

    "value_histogram" ->
      """SELECT floor(value / 25.0)::BIGINT AS bin,
        |  floor(value / 25.0)::BIGINT * 25.0 AS lo,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY bin ORDER BY bin""".stripMargin,

    "outlier_iqr" ->
      """WITH f AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type),
        |b AS (SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
        |             q3 + (q3 - q1) * 1.5 AS hi FROM f)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(b.lo, 6) AS lo, round(b.hi, 6) AS hi
        |FROM events e JOIN b USING (event_type)
        |WHERE e.value < b.lo OR e.value > b.hi
        |ORDER BY e.event_id""".stripMargin,

    "session_paths" ->
      """WITH s AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3
        |  FROM events)
        |SELECT step1, step2, step3, count(*) AS n
        |FROM s WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 10""".stripMargin,

    "outlier_mad" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, m.med,
        |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN m USING (event_type)
        |  GROUP BY e.event_type, m.med)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(d.med, 6) AS med, round(d.mad, 6) AS mad
        |FROM events e JOIN d USING (event_type)
        |WHERE abs(e.value - d.med) > 3.5 * 1.4826 * d.mad
        |ORDER BY e.event_id""".stripMargin,

    "ts_gaps" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM events)
        |SELECT user_id, ts AS gap_start, next_ts AS gap_end,
        |  (epoch_us(next_ts) - epoch_us(ts)) // 1000000 AS gap_seconds
        |FROM g
        |WHERE next_ts IS NOT NULL
        |  AND epoch_us(next_ts) - epoch_us(ts) > 12::BIGINT * 3600 * 1000000
        |ORDER BY user_id, gap_start""".stripMargin,

    "incremental_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "zscore_features" ->
      """WITH st AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - st.mu) / st.sd, 6) AS z
        |FROM events e JOIN st USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "ewma_user_value" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(list_reduce(list(value ORDER BY ts, event_id),
        |    (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // NOT list_reduce: DuckDB's list_reduce reuses the accumulator buffer
    // in place from the second application on, so a struct lambda's later
    // fields read already-overwritten earlier fields (verified: step 1
    // clean, steps 2+ aliased — and the Holt update matrix has complex
    // eigenvalues, so no field ordering is alias-safe). The recursive CTE
    // reads the PREVIOUS ROW's columns — unaliasable by construction —
    // and replays the identical double ops per step.
    "holt_forecast" ->
      """WITH RECURSIVE ordered AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS xs,
        |    count(*) AS n FROM events GROUP BY user_id),
        |fold AS (
        |  SELECT user_id, n, 1 AS i, xs[1]::DOUBLE AS l, 0.0::DOUBLE AS b, xs
        |  FROM ordered
        |  UNION ALL
        |  SELECT user_id, n, i + 1,
        |    0.4 * xs[i+1] + 0.6 * (l + b),
        |    0.2 * ((0.4 * xs[i+1] + 0.6 * (l + b)) - l) + 0.8 * b, xs
        |  FROM fold WHERE i < n)
        |SELECT user_id, n AS n_events,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(l + 3.0 * b, 6) AS forecast3
        |FROM fold WHERE i = n ORDER BY user_id""".stripMargin,

    // Replays the HW fold as a recursive CTE (the Holt oracle's lesson:
    // list_reduce aliases its struct buffer in place, and the HW update
    // uses the new level in two later fields — only previous-ROW reads
    // are alias-safe). Init binds in a CTE exactly as Spark binds l0/b0/s0
    // columns; inside the step the new level is inlined identically.
    "holt_winters" ->
      """WITH RECURSIVE ordered AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS xs,
        |    count(*) AS n FROM events GROUP BY user_id HAVING count(*) >= 8),
        |init AS (
        |  SELECT user_id, n, xs,
        |    (xs[1]+xs[2]+xs[3]+xs[4]) / 4.0 AS l0,
        |    ((xs[5]+xs[6]+xs[7]+xs[8]) / 4.0 - (xs[1]+xs[2]+xs[3]+xs[4]) / 4.0) / 4.0 AS b0
        |  FROM ordered),
        |fold AS (
        |  SELECT user_id, n, xs, 4 AS i, l0::DOUBLE AS l, b0::DOUBLE AS b,
        |    [xs[1]-l0, xs[2]-l0, xs[3]-l0, xs[4]-l0]::DOUBLE[] AS s
        |  FROM init
        |  UNION ALL
        |  SELECT user_id, n, xs, i + 1,
        |    0.4 * (xs[i+1] - s[1]) + 0.6 * (l + b),
        |    0.2 * ((0.4 * (xs[i+1] - s[1]) + 0.6 * (l + b)) - l) + 0.8 * b,
        |    [s[2], s[3], s[4],
        |     0.3 * (xs[i+1] - (0.4 * (xs[i+1] - s[1]) + 0.6 * (l + b))) + 0.7 * s[1]]
        |  FROM fold WHERE i < n)
        |SELECT user_id, n AS n_events,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(s[1], 6) AS s_next,
        |  round(l + b + s[1], 6) AS forecast1
        |FROM fold WHERE i = n ORDER BY user_id""".stripMargin,

    "merge_upsert" ->
      """WITH ch0 AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 17 = 3 THEN 'd'
        |         WHEN doc_id % 10 = 0 THEN 'u'
        |         WHEN doc_id % 23 = 5 THEN 'i' END AS op
        |  FROM documents),
        |ch AS (
        |  SELECT CASE WHEN op = 'i' THEN doc_id + 10000000 ELSE doc_id END AS doc_id,
        |    op,
        |    CASE WHEN op = 'u' THEN n_chars + 1000
        |         WHEN op = 'i' THEN doc_id % 500
        |         ELSE n_chars END AS new_n_chars
        |  FROM ch0 WHERE op IS NOT NULL),
        |matched AS (
        |  SELECT b.doc_id,
        |    CASE WHEN c.op = 'u' THEN c.new_n_chars ELSE b.n_chars END AS n_chars,
        |    coalesce(c.op, 'k') AS src
        |  FROM documents b
        |  LEFT JOIN (SELECT * FROM ch WHERE op <> 'i') c ON c.doc_id = b.doc_id
        |  WHERE c.op IS NULL OR c.op = 'u')
        |SELECT doc_id, n_chars, src FROM matched
        |UNION ALL
        |SELECT doc_id, new_n_chars AS n_chars, op AS src FROM ch WHERE op = 'i'
        |ORDER BY doc_id""".stripMargin,

    "scd2_history" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE user_id % 20 = 0),
        |c AS (SELECT * FROM s WHERE prev IS NULL OR prev <> event_type),
        |v AS (
        |  SELECT user_id, event_type AS state, ts AS valid_from,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS version,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, state, valid_from, valid_to,
        |  valid_to IS NULL AS is_current, version
        |FROM v ORDER BY user_id, version""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus, o_orderpriority) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION
        |(SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        | EXCEPT
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        |ORDER BY c_custkey""".stripMargin,

    "string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  lower(p_type) AS type_l,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 4) AS name_pre,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
        |  reverse(p_name) AS name_rev,
        |  replace(p_name, ' ', '_') AS name_us
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "date_funcs" ->
      """SELECT date_trunc('month', o_orderdate) AS month_start,
        |  year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr, month(o_orderdate) AS mo,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY 1, 2, 3, 4
        |ORDER BY month_start""".stripMargin,

    "date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS ship_deadline,
        |  -- operand differs from ship_deadline's on purpose: DuckDB 1.0
        |  -- interval equality treats 3 MONTH = 90 DAY, so identical
        |  -- operands let CSE unify the two adds
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS quarter_later,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')::INTEGER AS days_to_98,
        |  (dayofweek(o_orderdate) + 1)::INTEGER AS dow,
        |  dayofmonth(o_orderdate)::INTEGER AS dom,
        |  weekofyear(o_orderdate)::INTEGER AS woy
        |FROM orders
        |WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin,

    "sql_surface" ->
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |SELECT c.c_mktsegment,
        |       count(*) AS n_top,
        |       round(sum(r.o_totalprice), 2) AS top_revenue
        |FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        |WHERE r.rnk = 1
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin,

    "json_funcs" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        |  count(*) AS n, round(avg(value), 6) AS avg_value,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events
        |GROUP BY 1
        |ORDER BY k_bucket""".stripMargin,

    "events_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin,

    "sliding_window_agg" ->
      """WITH e AS (SELECT epoch_us(ts) AS t_us, event_type, value FROM events),
        |w AS (
        |  SELECT ((t_us // 900000000) - k) * 900000000 AS win_start_us,
        |    event_type, value
        |  FROM e CROSS JOIN generate_series(0, 3) s(k)
        |  WHERE t_us < ((t_us // 900000000) - k) * 900000000 + 3600000000)
        |SELECT win_start_us, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM w GROUP BY 1, 2
        |ORDER BY win_start_us, event_type""".stripMargin,

    "chained_window_agg" ->
      """WITH hourly AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS h_us,
        |    event_type, count(*) AS n, round(sum(value), 2) AS hour_value
        |  FROM events GROUP BY 1, 2)
        |SELECT (h_us // 14400000000) * 14400000000 AS win4_start_us,
        |  event_type, CAST(sum(n) AS BIGINT) AS n,
        |  round(sum(hour_value), 2) AS total_value
        |FROM hourly GROUP BY 1, 2
        |ORDER BY win4_start_us, event_type""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q6_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q17_avg_subquery" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |JOIN (SELECT l_partkey AS ap_partkey, round(avg(l_quantity) * 0.5, 6) AS half_avg_qty
        |      FROM lineitem GROUP BY l_partkey) a
        |  ON l.l_partkey = a.ap_partkey
        |WHERE l.l_quantity < a.half_avg_qty""".stripMargin,

    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_extendedprice - 1000.0), 6) AS abs_diff,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(ln(1.0 + l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice + 1.0), 6) AS log10_price,
        |  round(pow(l_quantity, 2), 6) AS qty_sq,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  ceil(l_extendedprice)::BIGINT AS price_ceil,
        |  floor(l_extendedprice)::BIGINT AS price_floor,
        |  sign(l_tax - 0.04)::DOUBLE AS tax_sign
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "conditional_funcs" ->
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x,
        |  greatest(o_totalprice, 100000.0) AS price_floor100k,
        |  least(o_totalprice, 100000.0) AS price_cap100k,
        |  CASE WHEN o_totalprice >= 150000.0 THEN 'big'
        |       WHEN o_totalprice >= 50000.0 THEN 'mid'
        |       ELSE 'small' END AS bucket
        |FROM orders
        |WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,

    "map_funcs" ->
      """SELECT event_id,
        |  len(json_keys(props)) AS n_keys,
        |  array_to_string(json_keys(props), ',') AS keys,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""".stripMargin,

    "asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, p.value,
        |  round(c.value, 2) AS click_value, epoch_us(c.ts) AS click_ts_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "attribution_last_touch" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id,
        |        'c' || (CAST(json_extract_string(props, '$.k') AS INTEGER) % 5)::VARCHAR AS campaign
        |      FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.ts, p.value, c.campaign, c.ts AS click_ts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
        |a AS (
        |  SELECT CASE WHEN click_ts IS NOT NULL
        |              AND epoch_us(ts) - epoch_us(click_ts) <= 14400000000
        |         THEN campaign ELSE 'organic' END AS campaign, value
        |  FROM j)
        |SELECT campaign, count(*)::BIGINT AS conversions,
        |  round(sum(value), 2) AS revenue
        |FROM a GROUP BY campaign ORDER BY campaign""".stripMargin,

    "attribution_linear" ->
      """WITH p AS (SELECT user_id, ts AS pts, event_id AS pid, value
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS cts,
        |        'c' || (CAST(json_extract_string(props, '$.k') AS INTEGER) % 5)::VARCHAR AS campaign
        |      FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.pid, p.value, c.campaign
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.cts <= p.pts
        |    AND epoch_us(p.pts) - epoch_us(c.cts) <= 14400000000),
        |w AS (SELECT pid, value, campaign,
        |        count(campaign) OVER (PARTITION BY pid) AS n_touch FROM j)
        |SELECT coalesce(campaign, 'organic') AS campaign,
        |  count(*) AS touches,
        |  round(sum(CAST(round(CASE WHEN n_touch = 0 THEN value
        |                 ELSE value / n_touch END, 6) AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "resample_fill" ->
      """WITH b AS (SELECT date_trunc('minute', min(ts)) AS t0 FROM events),
        |u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
        |grid AS (
        |  SELECT u.user_id,
        |    unnest(generate_series(b.t0, b.t0 + INTERVAL 30 MINUTE,
        |      INTERVAL 1 MINUTE)) AS ts
        |  FROM u CROSS JOIN b),
        |c AS (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'click' AND user_id < 5)
        |SELECT g.user_id, epoch_us(g.ts) AS ts_us,
        |  round(c.value, 2) AS filled_value, epoch_us(c.ts) AS src_ts_us
        |FROM grid g ASOF LEFT JOIN c ON g.user_id = c.user_id AND g.ts >= c.ts
        |ORDER BY g.user_id, ts_us""".stripMargin,

    "asof_forward" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, p.value,
        |  round(c.value, 2) AS click_value, epoch_us(c.ts) AS click_ts_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "window_funcs_ext" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(o_totalprice, 2) AS price,
        |  ntile(4) OVER w AS quartile,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS range_sum
        |FROM orders
        |WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // the sketch guarantee IS the oracle: the booleans must be TRUE
    "approx_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS exact_p50,
        |  round(quantile_cont(value, 0.9), 6) AS exact_p90,
        |  count(*) AS n,
        |  TRUE AS p50_in_rank_bound,
        |  TRUE AS p90_in_rank_bound
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "hll_sketch_ops" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  2::BIGINT AS n_sketches, TRUE AS within_5pct
        |FROM lineitem""".stripMargin,

    // dumped-state replay: estimates re-derived from the dumped sketch by
    // the identical cumulative-weight fold; rank counts from raw events
    "kll_quantiles" ->
      """WITH items AS (SELECT value, weight FROM read_parquet('__KLL_ITEMS__/*.parquet')),
        |meta AS (SELECT err, n FROM read_parquet('__KLL_META__/*.parquet')),
        |qs(pct, q) AS (VALUES ('p25', 0.25), ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)),
        |byv AS (SELECT value, sum(weight) AS w FROM items GROUP BY value),
        |cum AS (
        |  SELECT q.pct, q.q, b.value,
        |    sum(b.w) OVER (PARTITION BY q.pct ORDER BY b.value) AS cw
        |  FROM byv b CROSS JOIN qs q),
        |est AS (
        |  SELECT c.pct, c.q, m.err, min(c.value) AS est
        |  FROM cum c CROSS JOIN meta m
        |  WHERE c.cw >= c.q * m.n
        |  GROUP BY c.pct, c.q, m.err),
        |cnt AS (
        |  SELECT e.pct, e.q, e.err, e.est, count(*) AS n,
        |    sum(CASE WHEN ev.value <= e.est THEN 1 ELSE 0 END) AS cnt_le,
        |    sum(CASE WHEN ev.value < e.est THEN 1 ELSE 0 END) AS cnt_lt
        |  FROM events ev CROSS JOIN est e
        |  GROUP BY e.pct, e.q, e.err, e.est)
        |SELECT pct, round(est, 6) AS est, n::BIGINT AS n,
        |  cnt_le::BIGINT AS cnt_le, cnt_lt::BIGINT AS cnt_lt, err::BIGINT AS err,
        |  (cnt_le >= q * n - err AND cnt_lt < q * n + err) AS in_bound
        |FROM cnt ORDER BY pct""".stripMargin,

    "skip_index_scan" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE doc_id BETWEEN 100 AND 299
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "zorder_scan" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE doc_id BETWEEN 100 AND 299 AND n_chars BETWEEN 200 AND 700
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "bloom_skip_scan" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE doc_id IN (7, 233, 411)
        |ORDER BY doc_id""".stripMargin,

    "dsv2_scan" ->
      """SELECT i AS id, i * i AS sq, (i % 10)::INTEGER AS label
        |FROM generate_series(100, 199) t(i)
        |ORDER BY id""".stripMargin,

    "variant_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  json_extract_string(props, '$.k') AS k_str,
        |  TRUE AS missing_is_null
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""".stripMargin,

    "xml_funcs" ->
      """SELECT doc_id,
        |  '<doc id="' || doc_id || '"><lang>' || lang || '</lang><n>' ||
        |    n_chars || '</n></doc>' AS xml,
        |  doc_id AS p_id, lang AS p_lang, n_chars AS p_n
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  round(var_samp(l_quantity), 6) AS qty_var,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "ordered_set_aggs" ->
      """WITH agg AS (
        |  SELECT o_orderstatus,
        |    string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        |    round(median(o_totalprice), 2) AS median_price,
        |    count(*) AS n
        |  FROM orders GROUP BY 1),
        |pc AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |md AS (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY n DESC, o_orderpriority ASC) AS rn
        |  FROM pc)
        |SELECT a.o_orderstatus, a.priorities, m.mode_priority, a.median_price, a.n
        |FROM agg a JOIN md m ON m.o_orderstatus = a.o_orderstatus AND m.rn = 1
        |ORDER BY a.o_orderstatus""".stripMargin,

    "sql_udf" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "unpivot_funcs" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price,
        |    round(avg(l_discount), 6) AS avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, val FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM a
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL
        |  SELECT l_returnflag, 'avg_disc', avg_disc FROM a)
        |ORDER BY l_returnflag, measure""".stripMargin,

    "lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  LIMIT 2
        |) o
        |WHERE c.c_custkey < 50
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,

    "percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS dims,
        |  round(list_max(embedding::DOUBLE[]), 6) AS arr_max,
        |  round(list_min(embedding::DOUBLE[]), 6) AS arr_min,
        |  round(list_sum(embedding::DOUBLE[]), 6) AS arr_sum,
        |  round(embedding[1]::DOUBLE, 6) AS elem0
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "pivot_agg" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l.l_shipdate) AS l_year,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """SELECT year(o.o_orderdate) AS o_year,
        |  round(sum(CASE WHEN n2.n_name = 'NATION_3'
        |                 THEN l.l_extendedprice * (1.0 - l.l_discount)
        |                 ELSE 0.0 END)
        |    / sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |JOIN region r ON n1.n_regionkey = r.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Exact-decimal revenue sum (order-insensitive) — see the query comment.
    "q10_returned" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  round(sum(l.l_extendedprice::DECIMAL(18,6)
        |            * (1.0::DECIMAL(18,6) - l.l_discount::DECIMAL(18,6))), 2)::DOUBLE AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l.l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c.c_custkey ASC
        |LIMIT 20""".stripMargin,

    // ::BIGINT — DuckDB integer sums widen to HUGEINT, which the driver's
    // pandas bridge renders as float.
    "q12_priority_class" ->
      """SELECT l.l_linestatus,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q14_promo" ->
      """SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
        |                  THEN l.l_extendedprice * (1.0 - l.l_discount)
        |                  ELSE 0.0 END)
        |    / sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS promo_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l.l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,

    "q9_profit" ->
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
        |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |                 * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
        |               - CAST(p.p_retailprice AS DECIMAL(18,2))
        |                 * CAST(0.6 AS DECIMAL(2,1))
        |                 * CAST(l.l_quantity AS DECIMAL(18,0))), 2) AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_name LIKE '%e%'
        |GROUP BY n.n_name, year(o.o_orderdate)
        |ORDER BY nation ASC, o_year DESC""".stripMargin,

    "q11_important_parts" ->
      """SELECT l.l_partkey AS p_key,
        |  round(sum(l.l_extendedprice * l.l_quantity), 2) AS val
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_name = 'NATION_3'
        |GROUP BY l.l_partkey
        |HAVING round(sum(l.l_extendedprice * l.l_quantity), 6) > round((
        |  SELECT sum(l2.l_extendedprice * l2.l_quantity) * 0.001
        |  FROM lineitem l2
        |  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |  WHERE n2.n_name = 'NATION_3'), 6)
        |ORDER BY val DESC, p_key ASC""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin,

    "q2_min_cost" ->
      """SELECT DISTINCT s.s_acctbal, s.s_name, p.p_partkey, p.p_name
        |FROM part p
        |JOIN lineitem l ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE p.p_size = 15 AND p.p_type = 'LARGE'
        |  AND s.s_acctbal = (
        |    SELECT min(s2.s_acctbal)
        |    FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY s.s_acctbal DESC, p.p_partkey ASC, s.s_name ASC
        |LIMIT 20""".stripMargin,

    // epoch_us on TIMESTAMP_NS truncates to micros — identical to Spark's
    // nanos→micros load-time truncation (see Tables.events).
    "interval_join" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id,
        |  epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS view_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  AND b.ts >= a.ts - INTERVAL 60 MINUTE AND b.ts <= a.ts
        |ORDER BY click_id, view_id""".stripMargin,

    "interval_join_louter" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id,
        |  epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS view_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id
        |  AND b.ts >= a.ts - INTERVAL 60 MINUTE AND b.ts <= a.ts
        |ORDER BY click_id, view_id NULLS FIRST""".stripMargin,

    "interval_join_fouter" ->
      """SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |  a.event_id AS click_id, b.event_id AS view_id,
        |  epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS view_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id
        |  AND b.ts >= a.ts - INTERVAL 60 MINUTE AND b.ts <= a.ts
        |ORDER BY click_id NULLS FIRST, view_id NULLS FIRST""".stripMargin,

    // pass predicates gate on the RAW metric (a 1-in-10M miss must not
    // round to 1.0 and slip through); only `observed` rounds for display
    "dq_checks" ->
      """WITH m AS (
        |  SELECT
        |    avg(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE AS complete_custkey,
        |    min(o_totalprice)::DOUBLE AS nonneg_totalprice,
        |    max(o_totalprice)::DOUBLE AS price_under_100k,
        |    count(*)::DOUBLE AS size_nonzero,
        |    avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)::DOUBLE AS status_in_set,
        |    count(DISTINCT o_orderkey)::DOUBLE / count(*) AS unique_orderkey
        |  FROM orders)
        |SELECT 'complete_custkey' AS check_name, round(complete_custkey, 6) AS observed,
        |  complete_custkey = 1.0 AS passed FROM m
        |UNION ALL SELECT 'nonneg_totalprice', round(nonneg_totalprice, 6), nonneg_totalprice >= 0.0 FROM m
        |UNION ALL SELECT 'price_under_100k', round(price_under_100k, 6), price_under_100k <= 100000.0 FROM m
        |UNION ALL SELECT 'size_nonzero', round(size_nonzero, 6), size_nonzero > 0.0 FROM m
        |UNION ALL SELECT 'status_in_set', round(status_in_set, 6), status_in_set = 1.0 FROM m
        |UNION ALL SELECT 'unique_orderkey', round(unique_orderkey, 6), unique_orderkey = 1.0 FROM m
        |ORDER BY check_name""".stripMargin,

    "heavy_hitters" ->
      """WITH p AS (
        |  SELECT CASE WHEN event_id % 10 < 6 THEN 'home'
        |              WHEN event_id % 10 < 8 THEN 'search'
        |              ELSE 'p' || (event_id % 500)::VARCHAR END AS value
        |  FROM events),
        |t AS (SELECT count(*) AS n_total FROM p)
        |SELECT p.value, count(*)::BIGINT AS n,
        |  round(count(*)::DOUBLE / t.n_total, 6) AS share
        |FROM p, t
        |GROUP BY p.value, t.n_total
        |HAVING count(*) > 0.1 * t.n_total
        |ORDER BY value""".stripMargin,

    // CMS estimate replay: est(k) = min over hash rows i of the count of
    // inputs landing in k's row-i bucket — same fixed (a,b,p,width)
    // universal-family constants as CountMin.bucket, integer-only.
    "cms_heavy_probes" ->
      """WITH ev AS (SELECT user_id FROM events),
        |tc AS (SELECT user_id, count(*)::BIGINT AS true_cnt FROM ev
        |       GROUP BY user_id ORDER BY true_cnt DESC, user_id ASC LIMIT 5),
        |depths AS (SELECT * FROM (VALUES
        |  (1103515245::BIGINT, 12345::BIGINT), (134775813::BIGINT, 1::BIGINT),
        |  (69069::BIGINT, 7::BIGINT), (1664525::BIGINT, 1013904223::BIGINT))
        |  AS d(a, b)),
        |bc AS (
        |  SELECT d.a, d.b, ((d.a*e.user_id + d.b) % 2147483647) % 256 AS bk,
        |    count(*)::BIGINT AS c
        |  FROM ev e CROSS JOIN depths d GROUP BY 1, 2, 3),
        |est AS (
        |  SELECT t.user_id, t.true_cnt, min(bc.c) AS est
        |  FROM tc t JOIN depths d ON true
        |  JOIN bc ON bc.a = d.a AND bc.b = d.b
        |    AND bc.bk = ((d.a*t.user_id + d.b) % 2147483647) % 256
        |  GROUP BY t.user_id, t.true_cnt)
        |SELECT user_id, true_cnt, est, (est >= true_cnt) AS ok
        |FROM est ORDER BY user_id""".stripMargin,

    "psi_drift" ->
      """WITH b AS (
        |  SELECT greatest(0, least(9, floor(value / 50.0)))::BIGINT AS bin,
        |    count(*) AS c
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |cur AS (
        |  SELECT greatest(0, least(9, floor(value / 50.0)))::BIGINT AS bin,
        |    count(*) AS c
        |  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(0, 9))::BIGINT AS bin),
        |j AS (
        |  SELECT spine.bin, coalesce(b.c, 0) AS n_base, coalesce(cur.c, 0) AS n_cur
        |  FROM spine LEFT JOIN b USING (bin) LEFT JOIN cur USING (bin)),
        |t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM j),
        |p AS (
        |  SELECT j.bin, j.n_base, j.n_cur,
        |    (j.n_base + 0.5) / (t.tb + 5.0) AS pb,
        |    (j.n_cur + 0.5) / (t.tc + 5.0) AS pc
        |  FROM j, t)
        |SELECT bin, n_base, n_cur, round(pb, 6) AS p_base, round(pc, 6) AS p_cur,
        |  round((pb - pc) * ln(pb / pc), 6) AS contrib,
        |  round(sum((pb - pc) * ln(pb / pc)) OVER (), 6) AS psi
        |FROM p ORDER BY bin""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p.p_brand, p.p_size,
        |  count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 5, 10, 15, 20)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p.p_brand, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_size ASC""".stripMargin,

    "q20_qty_supplier" ->
      """SELECT s.s_name, s.s_acctbal
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name = 'NATION_5' AND s.s_suppkey IN (
        |  SELECT l.l_suppkey
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'SMALL'
        |  GROUP BY l.l_suppkey, l.l_partkey
        |  HAVING sum(l.l_quantity) > 50.0)
        |ORDER BY s.s_name""".stripMargin,

    "q21_waiting_supplier" ->
      """SELECT s.s_name, count(*)::BIGINT AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name ASC
        |LIMIT 20""".stripMargin,

    "q22_no_orders" ->
      """SELECT (c.c_nationkey % 5)::INTEGER AS cntrycode,
        |  count(*)::BIGINT AS numcust,
        |  round(sum(c.c_acctbal::DECIMAL(18,6)), 2)::DOUBLE AS totacctbal
        |FROM customer c
        |WHERE c.c_nationkey % 5 IN (1, 2, 3)
        |  AND c.c_acctbal > (
        |    SELECT round(avg(c2.c_acctbal), 6) FROM customer c2
        |    WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 5 IN (1, 2, 3))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // The sketch estimate itself is engine-specific; the oracled claim is
    // the error bound (see the query's comment). Literal TRUE: hash-match
    // ⇔ Spark's HLL++ stayed within 3σ (15% at rsd=0.05) of exact on
    // every group.
    "approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_3sigma
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "auc_score" ->
      """WITH b AS (
        |  SELECT round(value, 1) AS bin,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |d AS (
        |  SELECT bin, sum(pos)::BIGINT AS n_pos, sum(1 - pos)::BIGINT AS n_neg
        |  FROM b GROUP BY bin),
        |c AS (
        |  SELECT bin, n_pos, n_neg,
        |    coalesce(sum(n_neg) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM d)
        |SELECT
        |  round(sum(n_pos * (neg_below::DOUBLE + n_neg::DOUBLE / 2.0)) /
        |    (sum(n_pos) * sum(n_neg))::DOUBLE, 6) AS auc,
        |  sum(n_pos)::BIGINT AS n_pos, sum(n_neg)::BIGINT AS n_neg
        |FROM c""".stripMargin,

    "msprt_monitor" ->
      """WITH daily AS (
        |  SELECT day(ts) AS day,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    count(*)::DOUBLE AS n, sum(value) AS sv
        |  FROM events GROUP BY 1, 2),
        |s2t AS (SELECT var_samp(value) AS s2 FROM events),
        |byday AS (
        |  SELECT day,
        |    sum(CASE WHEN arm = 'A' THEN n ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'B' THEN n ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 'A' THEN sv ELSE 0 END) AS sa,
        |    sum(CASE WHEN arm = 'B' THEN sv ELSE 0 END) AS sb
        |  FROM daily GROUP BY day),
        |cum AS (
        |  SELECT day,
        |    sum(na) OVER w AS cna, sum(nb) OVER w AS cnb,
        |    sum(sa) OVER w AS csa, sum(sb) OVER w AS csb
        |  FROM byday WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |lam AS (
        |  SELECT day, cna, cnb, csa / cna - csb / cnb AS theta,
        |    s2 * (1.0 / cna + 1.0 / cnb) AS v_d, s2
        |  FROM cum CROSS JOIN s2t),
        |l2 AS (
        |  SELECT day, cna, cnb, theta,
        |    sqrt(v_d / (v_d + s2)) *
        |      exp(theta * theta * s2 / (2.0 * v_d * (v_d + s2))) AS lambda
        |  FROM lam)
        |SELECT day, cna::BIGINT AS n_a, cnb::BIGINT AS n_b,
        |  round(theta, 6) AS theta, round(lambda, 6) AS lambda,
        |  round(least(1.0, 1.0 / max(lambda) OVER
        |    (ORDER BY day ROWS UNBOUNDED PRECEDING)), 6) AS p_always_valid
        |FROM l2 ORDER BY day""".stripMargin,

    "ratio_metric_ci" ->
      """WITH per AS (
        |  SELECT user_id, sum(value) AS x, count(*)::DOUBLE AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT arm, count(*)::DOUBLE AS n, avg(x) AS mx, avg(y) AS my,
        |    var_samp(x) AS vx, var_samp(y) AS vy, covar_samp(x, y) AS cxy
        |  FROM per GROUP BY arm),
        |d AS (
        |  SELECT arm, n, mx / my AS r,
        |    sqrt((vx - 2.0 * (mx / my) * cxy +
        |          (mx / my) * (mx / my) * vy) / (n * my * my)) AS se
        |  FROM g)
        |SELECT arm, n::BIGINT AS n_users, round(r, 6) AS ratio,
        |  round(se, 6) AS se,
        |  round(r - 1.959963984540054 * se, 6) AS ci_lo,
        |  round(r + 1.959963984540054 * se, 6) AS ci_hi
        |FROM d ORDER BY arm""".stripMargin,

    "er_fuzzy_match" ->
      """WITH e AS (
        |  SELECT p_partkey AS pk,
        |    lower(p_name || ' ' || p_brand || ' ' || p_type) AS descr,
        |    p_name AS k1, p_brand AS k2, p_type AS k3
        |  FROM part),
        |cand AS (
        |  SELECT a.pk AS pk_a, b.pk AS pk_b FROM e a JOIN e b
        |    ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.pk < b.pk
        |  UNION
        |  SELECT a.pk, b.pk FROM e a JOIN e b
        |    ON a.k1 = b.k1 AND a.k3 = b.k3 AND a.pk < b.pk),
        |c AS (
        |  SELECT pk_a, pk_b,
        |    round(jaro_winkler_similarity(ea.descr, eb.descr), 6) AS sim
        |  FROM cand
        |  JOIN e ea ON ea.pk = pk_a
        |  JOIN e eb ON eb.pk = pk_b)
        |SELECT pk_a, pk_b, sim FROM c WHERE sim >= 0.95
        |ORDER BY pk_a, pk_b""".stripMargin,

    "conformal_interval" ->
      """WITH m AS (
        |  SELECT a, b, qhat FROM read_parquet('__CONFORMAL_M__/*.parquet')),
        |te AS (
        |  SELECT l_returnflag, l_quantity AS x, l_extendedprice AS y
        |  FROM lineitem WHERE l_orderkey % 3 = 2)
        |SELECT l_returnflag, count(*) AS n_test,
        |  round(avg(CASE WHEN abs(y - (m.a + m.b * x)) <= m.qhat
        |                 THEN 1.0 ELSE 0.0 END), 6) AS coverage,
        |  round(max(m.qhat), 6) AS qhat
        |FROM te, m
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "power_mde" ->
      """WITH g AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    count(*)::DOUBLE AS n, avg(o_totalprice) AS m,
        |    var_samp(o_totalprice) AS v
        |  FROM orders GROUP BY 1),
        |ab AS (SELECT
        |    max(CASE WHEN variant = 'A' THEN n END) AS na,
        |    max(CASE WHEN variant = 'A' THEN m END) AS ma,
        |    max(CASE WHEN variant = 'A' THEN v END) AS va,
        |    max(CASE WHEN variant = 'B' THEN n END) AS nb,
        |    max(CASE WHEN variant = 'B' THEN m END) AS mb,
        |    max(CASE WHEN variant = 'B' THEN v END) AS vb
        |  FROM g),
        |s AS (SELECT *, sqrt(va / na + vb / nb) AS se FROM ab)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(se, 6) AS se,
        |  round((1.959963984540054 + 0.8416212335729143) * se, 6) AS mde_abs,
        |  round((1.959963984540054 + 0.8416212335729143) * se /
        |    ((na * ma + nb * mb) / (na + nb)), 6) AS mde_rel
        |FROM s""".stripMargin,

    "cuped_adjust" ->
      """WITH per AS (
        |  SELECT user_id,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value ELSE 0 END) AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value ELSE 0 END) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
        |  FROM events GROUP BY user_id),
        |d AS (SELECT covar_samp(x, y) / var_samp(x) AS theta,
        |        avg(x) AS mx, var_samp(y) AS vy FROM per),
        |adj AS (SELECT variant, y, y - d.theta * (x - d.mx) AS y_adj, d.vy
        |        FROM per CROSS JOIN d),
        |vr AS (SELECT 1.0 - var_samp(y_adj) / any_value(vy) AS var_reduction
        |       FROM adj),
        |arms AS (SELECT variant, count(*) AS n, avg(y) AS m_raw,
        |           avg(y_adj) AS m_adj
        |         FROM adj GROUP BY variant)
        |SELECT variant, n, round(m_raw, 4) AS mean_raw,
        |  round(m_adj, 4) AS mean_adj, round(d.theta, 6) AS theta,
        |  round(vr.var_reduction, 6) AS var_reduction
        |FROM arms CROSS JOIN d CROSS JOIN vr ORDER BY variant""".stripMargin,

    "ks_test" ->
      """WITH byval AS (
        |  SELECT o_totalprice AS v, count(*)::DOUBLE AS cnt,
        |    sum(CASE WHEN o_orderkey % 2 = 0 THEN 1.0 ELSE 0.0 END) AS ca
        |  FROM orders GROUP BY o_totalprice),
        |tot AS (SELECT sum(ca) AS na, sum(cnt - ca) AS nb FROM byval),
        |r AS (SELECT ca, cnt,
        |        sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
        |        sum(cnt - ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
        |      FROM byval),
        |d AS (SELECT max(abs(cuma / t.na - cumb / t.nb)) AS d,
        |        max(t.na) AS na, max(t.nb) AS nb
        |      FROM r CROSS JOIN tot t),
        |l AS (SELECT na, nb, d,
        |        (sqrt(na * nb / (na + nb)) + 0.12
        |          + 0.11 / sqrt(na * nb / (na + nb))) * d AS lam
        |      FROM d)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(d, 6) AS d_stat,
        |  round(least(1.0, 2.0 * list_reduce(
        |    list_prepend(0.0::DOUBLE, list_transform(generate_series(1, 100), k ->
        |      (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
        |        * exp(-2.0 * k * k * lam * lam))),
        |    (acc, x) -> acc + x)), 6) AS p_value
        |FROM l""".stripMargin,

    "mann_whitney" ->
      """WITH byval AS (
        |  SELECT o_totalprice AS v, count(*)::DOUBLE AS cnt,
        |    sum(CASE WHEN o_orderkey % 2 = 0 THEN 1.0 ELSE 0.0 END) AS ca
        |  FROM orders GROUP BY o_totalprice),
        |r AS (SELECT v, cnt, ca,
        |        sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM byval),
        |m AS (SELECT sum(ca * (cum - cnt + (cnt + 1) / 2)) AS ra,
        |        sum(ca) AS na, sum(cnt - ca) AS nb, sum(cnt) AS n,
        |        sum(cnt * cnt * cnt - cnt) AS tie3
        |      FROM r)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  round(ra - na * (na + 1) / 2, 2) AS u_stat,
        |  round(((ra - na * (na + 1) / 2) - na * nb / 2) /
        |    sqrt(na * nb / 12 * ((n + 1) - tie3 / (n * (n - 1)))), 6) AS z
        |FROM m""".stripMargin,

    "theil_sen" ->
      """WITH daily AS (
        |  SELECT day(ts)::DOUBLE AS d, sum(value) AS r
        |  FROM events GROUP BY 1),
        |s AS (SELECT quantile_cont((b.r - a.r) / (b.d - a.d), 0.5) AS slope
        |      FROM daily a JOIN daily b ON b.d > a.d)
        |SELECT round(any_value(s.slope), 6) AS slope,
        |  round(quantile_cont(daily.r - s.slope * daily.d, 0.5), 6) AS intercept,
        |  count(*) AS n_days
        |FROM daily CROSS JOIN s""".stripMargin,

    "diff_in_diff" ->
      """WITH c AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'pre' ELSE 'post' END
        |      AS period,
        |    avg(value) AS m
        |  FROM events GROUP BY 1, 2)
        |SELECT
        |  round(sum(CASE WHEN arm = 'A' AND period = 'pre' THEN m END), 6) AS a_pre,
        |  round(sum(CASE WHEN arm = 'A' AND period = 'post' THEN m END), 6) AS a_post,
        |  round(sum(CASE WHEN arm = 'B' AND period = 'pre' THEN m END), 6) AS b_pre,
        |  round(sum(CASE WHEN arm = 'B' AND period = 'post' THEN m END), 6) AS b_post,
        |  round((sum(CASE WHEN arm = 'B' AND period = 'post' THEN m END) -
        |         sum(CASE WHEN arm = 'B' AND period = 'pre' THEN m END)) -
        |        (sum(CASE WHEN arm = 'A' AND period = 'post' THEN m END) -
        |         sum(CASE WHEN arm = 'A' AND period = 'pre' THEN m END)), 6) AS did
        |FROM c""".stripMargin,

    "ab_welch" ->
      """WITH g AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    count(*)::DOUBLE AS n, avg(o_totalprice) AS m,
        |    var_samp(o_totalprice) AS v
        |  FROM orders GROUP BY 1),
        |ab AS (
        |  SELECT
        |    max(CASE WHEN variant = 'A' THEN n END) AS na,
        |    max(CASE WHEN variant = 'A' THEN m END) AS ma,
        |    max(CASE WHEN variant = 'A' THEN v END) AS va,
        |    max(CASE WHEN variant = 'B' THEN n END) AS nb,
        |    max(CASE WHEN variant = 'B' THEN m END) AS mb,
        |    max(CASE WHEN variant = 'B' THEN v END) AS vb
        |  FROM g),
        |s AS (SELECT *, va / na + vb / nb AS se2 FROM ab)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  round(ma, 2) AS mean_a, round(mb, 2) AS mean_b,
        |  round((ma - mb) / sqrt(se2), 6) AS t_stat,
        |  round(pow(se2, 2) /
        |    (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 2) AS df
        |FROM s""".stripMargin,

    "rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey, epoch_us(max(o_orderdate)) AS rec,
        |    count(*) AS freq, round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |bp AS (
        |  SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
        |  FROM per),
        |sc AS (
        |  SELECT o_custkey,
        |    1 + (rec > rb[1])::INT + (rec > rb[2])::INT +
        |      (rec > rb[3])::INT + (rec > rb[4])::INT AS r_score,
        |    1 + (freq > fb[1])::INT + (freq > fb[2])::INT +
        |      (freq > fb[3])::INT + (freq > fb[4])::INT AS f_score,
        |    1 + (monetary > mb[1])::INT + (monetary > mb[2])::INT +
        |      (monetary > mb[3])::INT + (monetary > mb[4])::INT AS m_score
        |  FROM per, bp)
        |SELECT o_custkey, r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,

    "assoc_rules" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem),
        |item_n AS (SELECT item, count(*) AS n_item FROM baskets GROUP BY item),
        |total AS (SELECT count(DISTINCT okey) AS n_baskets FROM baskets),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_n
        |  FROM baskets a JOIN baskets b
        |    ON a.okey = b.okey AND a.item < b.item
        |  GROUP BY a.item, b.item
        |  HAVING count(*) >= 2)
        |SELECT item_a, item_b, pair_n,
        |  round(pair_n::DOUBLE / na.n_item, 6) AS conf,
        |  round(pair_n::DOUBLE * t.n_baskets / (na.n_item * nb.n_item), 6) AS lift
        |FROM pairs
        |JOIN item_n na ON na.item = pairs.item_a
        |JOIN item_n nb ON nb.item = pairs.item_b
        |CROSS JOIN total t
        |ORDER BY pair_n DESC, item_a, item_b
        |LIMIT 20""".stripMargin,

    "kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT
        |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |kth AS (SELECT max(h) AS hk, count(*) AS m
        |        FROM (SELECT h FROM h ORDER BY h LIMIT 64)),
        |ex AS (SELECT count(DISTINCT l_partkey) AS n_exact FROM lineitem)
        |SELECT 64 AS k, n_exact,
        |  round(CASE WHEN m < 64 THEN m::DOUBLE
        |        ELSE (m - 1)::DOUBLE / (hk::DOUBLE / 1152921504606846976.0)
        |        END, 2) AS est_kmv
        |FROM kth CROSS JOIN ex""".stripMargin,

    "burst_detect" ->
      """WITH RECURSIVE daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS d,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS r
        |  FROM events GROUP BY 1),
        |idx AS (
        |  SELECT row_number() OVER (ORDER BY day)::INT AS i, day, d, r
        |  FROM daily),
        |tot AS (
        |  SELECT sum(r)::DOUBLE / sum(d)::DOUBLE AS p0, count(*)::INT AS t
        |  FROM idx),
        |par AS (
        |  SELECT p0, least(2.0 * p0, 0.99) AS p1,
        |    round(ln(t::DOUBLE), 6) AS trans FROM tot),
        |sc AS (
        |  SELECT i, day, d, r,
        |    round(-(r * ln(p.p0) + (d - r) * ln(1.0 - p.p0)), 6) AS s0,
        |    round(-(r * ln(p.p1) + (d - r) * ln(1.0 - p.p1)), 6) AS s1,
        |    p.trans
        |  FROM idx CROSS JOIN par p),
        |fwd AS (
        |  SELECT i, s0 AS c0, round(s1 + trans, 6) AS c1, 0 AS bp0, 0 AS bp1
        |  FROM sc WHERE i = 1
        |  UNION ALL
        |  SELECT s.i,
        |    round(least(f.c0, f.c1) + s.s0, 6),
        |    round(least(round(f.c0 + s.trans, 6), f.c1) + s.s1, 6),
        |    CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END,
        |    CASE WHEN round(f.c0 + s.trans, 6) <= f.c1 THEN 0 ELSE 1 END
        |  FROM fwd f JOIN sc s ON s.i = f.i + 1),
        |bt AS (
        |  SELECT f.i, CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS burst
        |  FROM fwd f WHERE f.i = (SELECT max(i) FROM fwd)
        |  UNION ALL
        |  SELECT b.i - 1, CASE WHEN b.burst = 0 THEN f.bp0 ELSE f.bp1 END
        |  FROM bt b JOIN fwd f ON f.i = b.i WHERE b.i > 1)
        |SELECT s.day, s.d, s.r, b.burst
        |FROM sc s JOIN bt b ON b.i = s.i
        |ORDER BY s.day""".stripMargin,

    "quantile_reg" ->
      """WITH m AS (SELECT tau, a, b FROM read_parquet('__QREG__/*.parquet')),
        |s AS (
        |  SELECT m.tau, m.a, m.b,
        |    l.l_extendedprice - (m.a + m.b * l.l_quantity) AS r
        |  FROM lineitem l CROSS JOIN m)
        |SELECT tau, round(a, 6) AS a, round(b, 6) AS b,
        |  count(*)::BIGINT AS n,
        |  round(sum(CASE WHEN r >= 0 THEN tau * r ELSE (tau - 1) * r END)
        |    / count(*), 6) AS mean_pinball,
        |  round(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
        |    AS frac_below
        |FROM s GROUP BY tau, a, b ORDER BY tau""".stripMargin,

    "selfjoin_size_est" ->
      """WITH freq AS (
        |  SELECT l_partkey, count(*)::BIGINT AS f FROM lineitem GROUP BY 1),
        |h AS (
        |  SELECT f,
        |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM freq),
        |kth AS (SELECT max(h) AS hk, count(*)::BIGINT AS m
        |        FROM (SELECT h FROM h ORDER BY h LIMIT 64)),
        |ex AS (SELECT sum(f * f)::BIGINT AS f2_exact FROM freq),
        |e AS (
        |  SELECT round(CASE WHEN kth.m < 64 THEN sum(h.f * h.f)::DOUBLE
        |    ELSE sum(CASE WHEN h.h < kth.hk THEN h.f * h.f ELSE 0 END)::DOUBLE
        |      / (kth.hk::DOUBLE / 1152921504606846976.0) END, 2) AS est_f2
        |  FROM h CROSS JOIN kth WHERE h.h <= kth.hk
        |  GROUP BY kth.hk, kth.m)
        |SELECT 64 AS k, f2_exact, est_f2,
        |  round(abs(est_f2 - f2_exact) / f2_exact, 6) AS rel_err
        |FROM e CROSS JOIN ex""".stripMargin,

    "roc_curve" ->
      """WITH b AS (
        |  SELECT round(value, 1) AS bin,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |d AS (SELECT bin, sum(pos)::BIGINT AS n_pos, sum(1 - pos)::BIGINT AS n_neg
        |      FROM b GROUP BY bin),
        |tot AS (SELECT sum(n_pos) AS p, sum(n_neg) AS n FROM d),
        |pts AS (
        |  SELECT t.t,
        |    sum(CASE WHEN d.bin >= t.t * 10 THEN d.n_pos ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN d.bin >= t.t * 10 THEN d.n_neg ELSE 0 END)::BIGINT AS fp
        |  FROM d CROSS JOIN generate_series(1, 9) t(t)
        |  GROUP BY t.t)
        |SELECT (t * 10)::DOUBLE AS threshold,
        |  round(tp::DOUBLE / tot.p, 6) AS tpr,
        |  round(fp::DOUBLE / tot.n, 6) AS fpr
        |FROM pts CROSS JOIN tot ORDER BY threshold""".stripMargin,

    "benford_check" ->
      """WITH o AS (
        |  SELECT substr((floor(o_totalprice)::BIGINT)::VARCHAR, 1, 1)::INT AS d
        |  FROM orders),
        |obs AS (SELECT d, count(*) AS n_obs FROM o GROUP BY d),
        |tot AS (SELECT sum(n_obs) AS n FROM obs)
        |SELECT d, n_obs,
        |  round(tot.n * log10(1.0 + 1.0 / d), 2) AS n_exp,
        |  round(pow(n_obs - tot.n * log10(1.0 + 1.0 / d), 2) /
        |    (tot.n * log10(1.0 + 1.0 / d)), 4) AS chi2_term
        |FROM obs CROSS JOIN tot ORDER BY d""".stripMargin,

    "bootstrap_ci" ->
      """WITH base AS (
        |  SELECT o_totalprice AS x, r.r AS r,
        |    ((o_orderkey * 2654435761 + r.r * 2246822519) % 1000000007)::DOUBLE
        |      / 1000000007.0 AS u
        |  FROM orders CROSS JOIN generate_series(0, 31) r(r)),
        |reps AS (
        |  SELECT r, x,
        |    CASE WHEN u < 0.3678794412 THEN 0
        |         WHEN u < 0.7357588823 THEN 1
        |         WHEN u < 0.9196986029 THEN 2
        |         WHEN u < 0.9810118431 THEN 3 ELSE 4 END AS w
        |  FROM base),
        |m AS (SELECT r, sum(w * x) / sum(w) AS mean_r FROM reps GROUP BY r),
        |ci AS (SELECT quantile_cont(mean_r, 0.025) AS lo,
        |         quantile_cont(mean_r, 0.975) AS hi, count(*) AS n_reps FROM m),
        |pt AS (SELECT avg(o_totalprice) AS m FROM orders)
        |SELECT n_reps, round(pt.m, 2) AS mean,
        |  round(lo, 2) AS ci_lo, round(hi, 2) AS ci_hi
        |FROM ci CROSS JOIN pt""".stripMargin,

    "item_item_recs" ->
      """WITH bought AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |deg AS (SELECT item, count(*) AS deg FROM bought GROUP BY item),
        |p AS (SELECT a.item AS item, b.item AS rec, count(*) AS n_common
        |      FROM bought a JOIN bought b
        |        ON a.cust = b.cust AND a.item <> b.item
        |      WHERE a.item < 200
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |s AS (SELECT p.item, p.rec, p.n_common,
        |        round(p.n_common::DOUBLE / sqrt(da.deg::DOUBLE * db.deg), 6) AS sim
        |      FROM p
        |      JOIN deg da ON da.item = p.item
        |      JOIN deg db ON db.item = p.rec)
        |SELECT item, rnk, rec, n_common, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY item
        |    ORDER BY sim DESC, rec ASC) AS rnk FROM s)
        |WHERE rnk <= 3 ORDER BY item, rnk LIMIT 60""".stripMargin,

    "kmv_set_ops" ->
      """WITH ha AS (SELECT DISTINCT
        |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |hb AS (SELECT DISTINCT
        |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem WHERE l_returnflag = 'A'),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        |ku AS (SELECT h FROM (SELECT DISTINCT h FROM (
        |         SELECT h FROM ka UNION ALL SELECT h FROM kb))
        |       ORDER BY h LIMIT 64),
        |ue AS (SELECT count(*) AS mu,
        |         CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
        |           ELSE (count(*) - 1)::DOUBLE
        |             / (max(h)::DOUBLE / 1152921504606846976.0) END
        |           AS est_union
        |       FROM ku),
        |cm AS (SELECT count(*) AS n_common FROM ku
        |       WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |ex AS (SELECT count(*) AS exact_union,
        |         sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS exact_inter
        |       FROM (SELECT l_partkey,
        |               max(l_returnflag = 'R') AS a, max(l_returnflag = 'A') AS b
        |             FROM lineitem WHERE l_returnflag IN ('R', 'A')
        |             GROUP BY l_partkey))
        |SELECT round(est_union, 2) AS est_union, exact_union,
        |  round(n_common::DOUBLE / mu, 6) AS jacc_est,
        |  round(n_common::DOUBLE / mu * est_union, 2) AS est_inter,
        |  exact_inter
        |FROM ue CROSS JOIN cm CROSS JOIN ex""".stripMargin,

    "cusum_shift" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    count(*)::DOUBLE AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, avg(x) AS mu, stddev_samp(x) AS sd
        |       FROM daily GROUP BY 1),
        |ord AS (SELECT event_type, day, x,
        |          row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |        FROM daily),
        |r AS (
        |  SELECT o.event_type, o.day, o.x, o.rn,
        |    greatest(0.0, o.x - st.mu) AS s
        |  FROM ord o JOIN st USING (event_type) WHERE o.rn = 1
        |  UNION ALL
        |  SELECT o.event_type, o.day, o.x, o.rn,
        |    greatest(0.0, r.s + o.x - st.mu)
        |  FROM r
        |  JOIN ord o ON o.event_type = r.event_type AND o.rn = r.rn + 1
        |  JOIN st ON st.event_type = o.event_type)
        |SELECT r.event_type, r.day, r.x, round(r.s, 6) AS s,
        |  (round(r.s, 6) > round(2.0 * st.sd, 6)) AS shift_flag
        |FROM r JOIN st USING (event_type)
        |ORDER BY event_type, day""".stripMargin,

    "mv_rewrite" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "acf_daily" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*)::DOUBLE AS x
        |  FROM events GROUP BY 1),
        |d AS (SELECT day, x, row_number() OVER (ORDER BY day) AS idx
        |      FROM daily),
        |st AS (SELECT avg(x) AS mu, count(*) AS n,
        |         sum(pow(x, 2)) - count(*) * avg(x) * avg(x) AS denom
        |       FROM d),
        |p AS (
        |  SELECT l.lag, a.x, b.x AS x0
        |  FROM d a
        |  CROSS JOIN generate_series(1, 7) l(lag)
        |  JOIN d b ON a.idx - l.lag = b.idx)
        |SELECT lag, count(*) AS n_pairs,
        |  round(sum((p.x - st.mu) * (p.x0 - st.mu)) / max(st.denom), 6) AS acf
        |FROM p CROSS JOIN st
        |GROUP BY lag ORDER BY lag""".stripMargin,

    "fano_factor" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    count(*)::DOUBLE AS x
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_days,
        |  round(avg(x), 6) AS mean_daily,
        |  round(var_samp(x), 6) AS var_daily,
        |  round(var_samp(x) / avg(x), 6) AS fano
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,

    "chi2_independence" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS n
        |  FROM documents GROUP BY lang, source),
        |rm AS (SELECT lang, sum(n) AS rn FROM cells GROUP BY lang),
        |cm AS (SELECT source, sum(n) AS cn FROM cells GROUP BY source),
        |t AS (SELECT sum(n)::DOUBLE AS t FROM cells)
        |SELECT count(*) AS n_cells,
        |  round(sum(pow(c.n - rm.rn * cm.cn / t.t, 2)
        |    / (rm.rn * cm.cn / t.t)), 6) AS chi2,
        |  count(*) - 1 AS df_note
        |FROM cells c
        |JOIN rm USING (lang) JOIN cm USING (source) CROSS JOIN t""".stripMargin,

    "srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arms AS (
        |  SELECT (user_id % 2 = 0) AS armA, count(*)::DOUBLE AS n
        |  FROM u GROUP BY 1),
        |ab AS (
        |  SELECT max(CASE WHEN armA THEN n END) AS na,
        |    max(CASE WHEN NOT armA THEN n END) AS nb
        |  FROM arms),
        |s AS (SELECT *, (na + nb) / 2 AS e FROM ab)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  round(pow(na - e, 2) / e + pow(nb - e, 2) / e, 6) AS chi2,
        |  (pow(na - e, 2) / e + pow(nb - e, 2) / e > 3.841) AS srm_flag
        |FROM s""".stripMargin,

    "two_proportion_z" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           > sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |         THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY user_id),
        |arms AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    count(*)::DOUBLE AS n, sum(converted)::DOUBLE AS x
        |  FROM u GROUP BY 1),
        |ab AS (
        |  SELECT max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'A' THEN x END) AS xa,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'B' THEN x END) AS xb
        |  FROM arms),
        |s AS (SELECT *, (xa + xb) / (na + nb) AS p FROM ab)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  round(xa / na, 6) AS rate_a, round(xb / nb, 6) AS rate_b,
        |  round((xa / na - xb / nb) /
        |    sqrt(p * (1 - p) * (1 / na + 1 / nb)), 6) AS z_stat
        |FROM s""".stripMargin,

    "lorenz_curve" ->
      """WITH per AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2)::DECIMAL(18,2) AS rev
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT sum(rev) AS trev, count(*) AS n_cust FROM per),
        |r AS (
        |  SELECT o_custkey, rev,
        |    row_number() OVER (ORDER BY rev, o_custkey) AS i,
        |    sum(rev) OVER (ORDER BY rev, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM per)
        |SELECT ceil(r.i * 10 / t.n_cust)::INT AS decile,
        |  max(r.i)::BIGINT AS n_below,
        |  round(max(r.cum)::DOUBLE / max(t.trev)::DOUBLE, 6) AS cum_share
        |FROM r CROSS JOIN t
        |GROUP BY decile ORDER BY decile""".stripMargin,

    "survival_curve" ->
      """WITH pu AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id),
        |e AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
        |lives AS (
        |  SELECT (last_us - first_us) // 86400000000 AS t_days,
        |    CASE WHEN last_us < e.end_us - 86400000000 THEN 1 ELSE 0 END AS churn
        |  FROM pu CROSS JOIN e),
        |d AS (SELECT t_days, count(*) AS ending, sum(churn)::BIGINT AS d
        |      FROM lives GROUP BY t_days),
        |r AS (
        |  SELECT t_days, ending, d,
        |    sum(ending) OVER (ORDER BY t_days
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
        |  FROM d),
        |sv AS (
        |  SELECT t_days, n_risk, d,
        |    exp(sum(ln(1.0 - d::DOUBLE / n_risk)) OVER (ORDER BY t_days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
        |  FROM r)
        |SELECT t_days, n_risk::BIGINT AS n_risk, d AS d_churn,
        |  round(s, 6) AS survival
        |FROM sv WHERE d > 0 ORDER BY t_days""".stripMargin,

    "anova_f" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*)::DOUBLE AS n,
        |    avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY l_returnflag),
        |gr AS (SELECT avg(l_quantity) AS gm, count(*)::DOUBLE AS gn
        |       FROM lineitem),
        |a AS (
        |  SELECT count(*)::DOUBLE AS k,
        |    sum(g.n * pow(g.m - gr.gm, 2)) AS ssb,
        |    sum((g.n - 1) * g.v) AS ssw,
        |    max(gr.gn) AS gn
        |  FROM g CROSS JOIN gr)
        |SELECT k::BIGINT AS k, gn::BIGINT AS n,
        |  round(ssb, 4) AS ssb, round(ssw, 4) AS ssw,
        |  round((ssb / (k - 1)) / (ssw / (gn - k)), 6) AS f_stat
        |FROM a""".stripMargin,

    // UNBLOCKED replay: every customer's distance computed — the match
    // proves the Spark side's grid neighborhood dropped nothing.
    "geo_radius" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    -60.0 + (('0x' || substr(md5(c_custkey::VARCHAR || ':lat'), 1, 15))
        |      ::BIGINT::DOUBLE / 1152921504606846976.0) * 120.0 AS lat,
        |    -180.0 + (('0x' || substr(md5(c_custkey::VARCHAR || ':lon'), 1, 15))
        |      ::BIGINT::DOUBLE / 1152921504606846976.0) * 360.0 AS lon
        |  FROM customer),
        |d AS (
        |  SELECT c_custkey, lat, lon,
        |    round(2 * 6371.0 * asin(sqrt(
        |      pow(sin(radians(lat - 10.0) / 2), 2) +
        |      cos(radians(10.0)) * cos(radians(lat)) *
        |        pow(sin(radians(lon - 20.0) / 2), 2))), 3) AS dist_km
        |  FROM pts)
        |SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon, dist_km
        |FROM d WHERE dist_km <= 800.0
        |ORDER BY dist_km, c_custkey LIMIT 20""".stripMargin,

    "trimmed_mean" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n,
        |  sum(CASE WHEN e.value >= b.lo AND e.value <= b.hi
        |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  round(avg(CASE WHEN e.value >= b.lo AND e.value <= b.hi
        |      THEN e.value END), 6) AS trimmed_mean,
        |  round(avg(e.value), 6) AS plain_mean
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
        |d AS (SELECT day, count(*) AS dau, list(user_id) AS users
        |      FROM du GROUP BY day),
        |w AS (
        |  SELECT day, dau,
        |    len(list_distinct(flatten(list(users) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)))) AS wau
        |  FROM d)
        |SELECT day, dau, wau,
        |  round(dau::DOUBLE / wau, 6) AS stickiness
        |FROM w ORDER BY day""".stripMargin,

    "period_over_period" ->
      """WITH weekly AS (
        |  SELECT date_trunc('week', o_orderdate) AS week,
        |    round(sum(o_totalprice), 2)::DECIMAL(18,2) AS rev
        |  FROM orders GROUP BY 1),
        |l AS (SELECT week, rev, lag(rev) OVER (ORDER BY week) AS prev
        |      FROM weekly)
        |SELECT week, rev::DOUBLE AS rev,
        |  round((rev::DOUBLE - prev::DOUBLE) / prev::DOUBLE * 100, 4)
        |    AS pct_change
        |FROM l WHERE prev IS NOT NULL ORDER BY week""".stripMargin,

    "mv_rollup" ->
      """SELECT count(*) AS n_rows, sum(n_chars)::BIGINT AS total_chars
        |FROM documents""".stripMargin,

    "ols_slope" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(covar_samp(l_discount, l_quantity) / var_samp(l_discount),
        |    6) AS slope,
        |  round(avg(l_quantity) - covar_samp(l_discount, l_quantity)
        |    / var_samp(l_discount) * avg(l_discount), 6) AS intercept,
        |  round(pow(corr(l_discount, l_quantity), 2), 6) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "gini_concentration" ->
      """WITH per AS (
        |  SELECT c.c_mktsegment, o.o_custkey,
        |    round(sum(o.o_totalprice), 2) AS rev
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT c_mktsegment, rev,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY rev, o_custkey) AS i
        |      FROM per)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  round((2 * sum(i * rev) - (count(*) + 1) * sum(rev)) /
        |    (count(*) * sum(rev)), 6) AS gini
        |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "session_entropy" ->
      """WITH mix AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT user_id, sum(n) AS tot FROM mix GROUP BY user_id)
        |SELECT m.user_id,
        |  round(-sum((m.n::DOUBLE / t.tot) * ln(m.n::DOUBLE / t.tot)), 6)
        |    AS entropy,
        |  count(*) AS n_types
        |FROM mix m JOIN tot t USING (user_id)
        |GROUP BY m.user_id ORDER BY m.user_id""".stripMargin,

    "decayed_counts" ->
      """WITH ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
        |w AS (
        |  SELECT event_type, value,
        |    exp(-0.09902102579427789 *
        |      ((ref.ref_us - epoch_us(ts))::DOUBLE / 86400000000.0)) AS w
        |  FROM events CROSS JOIN ref)
        |SELECT event_type, count(*) AS n_raw,
        |  round(sum(w), 6) AS decayed_n,
        |  round(sum(w * value) / sum(w), 6) AS decayed_mean,
        |  round(avg(value), 6) AS plain_mean
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_decompose" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*)::DOUBLE AS n
        |  FROM events GROUP BY 1),
        |d2 AS (SELECT day, n, (epoch_us(day) // 86400000000) % 7 AS dow
        |       FROM daily),
        |t AS (
        |  SELECT day, n, dow,
        |    avg(n) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
        |  FROM d2),
        |s AS (SELECT dow, avg(n - trend) AS seas FROM t GROUP BY dow)
        |SELECT t.day, t.n, round(t.trend, 6) AS trend,
        |  round(s.seas, 6) AS seasonal,
        |  round(t.n - t.trend - s.seas, 6) AS resid
        |FROM t JOIN s USING (dow) ORDER BY t.day""".stripMargin,

    "impute_missing" ->
      """WITH h AS (
        |  SELECT event_type, event_id,
        |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(v, 0.5) AS med
        |      FROM h WHERE v IS NOT NULL GROUP BY event_type)
        |SELECT h.event_type, count(*) AS n,
        |  sum(CASE WHEN h.v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_imputed,
        |  round(max(m.med), 6) AS median_used,
        |  round(sum(coalesce(h.v, m.med)), 2) AS filled_sum
        |FROM h JOIN m USING (event_type)
        |GROUP BY h.event_type ORDER BY h.event_type""".stripMargin,

    "markov_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type, next_type, count(*) AS n
        |      FROM t WHERE next_type IS NOT NULL
        |      GROUP BY event_type, next_type),
        |rt AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY event_type)
        |SELECT c.event_type, c.next_type, c.n,
        |  round(c.n::DOUBLE / rt.tot, 6) AS p
        |FROM c JOIN rt USING (event_type)
        |ORDER BY c.event_type, c.next_type""".stripMargin,

    "calibration_bins" ->
      """SELECT floor(value / 10)::INT AS bin, count(*) AS n,
        |  round(avg(value / 100.0), 6) AS pred_rate,
        |  round(avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END),
        |    6) AS obs_rate
        |FROM events
        |WHERE floor(value / 10)::INT BETWEEN 0 AND 9
        |GROUP BY bin ORDER BY bin""".stripMargin,

    "cohort_ltv" ->
      """WITH first AS (
        |  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
        |  FROM orders GROUP BY o_custkey),
        |sized AS (SELECT cohort, count(*) AS cohort_n FROM first GROUP BY cohort),
        |rev AS (
        |  SELECT f.cohort,
        |    datediff('month', f.cohort, date_trunc('month', o.o_orderdate))
        |      AS "offset",
        |    round(sum(o.o_totalprice), 2)::DECIMAL(18,2) AS rev
        |  FROM orders o JOIN first f USING (o_custkey)
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort, "offset",
        |    sum(rev) OVER (PARTITION BY cohort ORDER BY "offset"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM rev)
        |SELECT c.cohort, c."offset" AS "offset", s.cohort_n,
        |  round(c.cum_rev::DOUBLE / s.cohort_n, 2) AS ltv_per_cust
        |FROM cum c JOIN sized s USING (cohort)
        |WHERE c."offset" <= 6
        |ORDER BY c.cohort, c."offset"""".stripMargin,

    "funnel_latency" ->
      """WITH fv AS (
        |  SELECT user_id, min(ts) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, fv.first_view, min(e.ts) AS first_purchase
        |  FROM events e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > fv.first_view
        |  GROUP BY e.user_id, fv.first_view),
        |d AS (SELECT (epoch_us(first_purchase) - epoch_us(first_view)) // 1000000
        |        AS delta_s FROM c)
        |SELECT count(*) AS n_converted,
        |  round(quantile_cont(delta_s, 0.5), 2) AS p50_s,
        |  round(quantile_cont(delta_s, 0.9), 2) AS p90_s,
        |  max(delta_s) AS max_s
        |FROM d""".stripMargin,

    "twap_user" ->
      """WITH i AS (
        |  SELECT user_id, value,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us,
        |    epoch_us(ts) AS us
        |  FROM events),
        |d AS (SELECT user_id, value,
        |        (next_us - us)::DOUBLE / 1000000.0 AS dur
        |      FROM i WHERE next_us IS NOT NULL)
        |SELECT user_id, count(*) AS n_intervals,
        |  round(sum(value * dur) / sum(dur), 6) AS twap,
        |  round(avg(value), 6) AS plain_avg
        |FROM d GROUP BY user_id HAVING count(*) >= 3
        |ORDER BY user_id""".stripMargin,

    "column_profile" ->
      """WITH lang_m AS (
        |  SELECT lang AS v, count(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY lang ORDER BY n DESC, v ASC LIMIT 1),
        |src_m AS (
        |  SELECT source AS v, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY source ORDER BY n DESC, v ASC LIMIT 1),
        |nc_m AS (
        |  SELECT n_chars AS v, count(*) AS n FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY n_chars ORDER BY n DESC, v ASC LIMIT 1),
        |p AS (
        |  SELECT 'lang' AS "column", count(*) AS n_rows,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        |    count(DISTINCT lang) AS n_distinct,
        |    min(lang)::VARCHAR AS min_val, max(lang)::VARCHAR AS max_val,
        |    (SELECT v FROM lang_m)::VARCHAR AS top_val,
        |    (SELECT n FROM lang_m) AS top_n
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source', count(*),
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT source),
        |    min(source)::VARCHAR, max(source)::VARCHAR,
        |    (SELECT v FROM src_m)::VARCHAR, (SELECT n FROM src_m)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(*),
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT n_chars),
        |    min(n_chars)::VARCHAR, max(n_chars)::VARCHAR,
        |    (SELECT v FROM nc_m)::VARCHAR, (SELECT n FROM nc_m)
        |  FROM documents)
        |SELECT * FROM p ORDER BY "column"""".stripMargin,

    "skyline_parts" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin
  )
}
