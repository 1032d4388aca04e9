package graft.ops

import graft.{Fns, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface (SURVEY.md §2.2) — joins, aggregations,
  * window functions, sorts/top-k, set operations. The reference only ever
  * runs these implicitly (anti-join delete detection, semi-join conflict
  * checks, PK-keyed merge — `pyopenetl/operations.py:556-596, 716-723,
  * 785-789`); here they are first-class operators.
  *
  * Scale notes: dimension joins (`region`, `nation`) are explicitly
  * broadcast; fact-fact joins shuffle on their equi-keys and are
  * AQE-replannable; top-k compiles to TakeOrderedAndProject (no total
  * sort); window functions shuffle once on the partition key.
  */
object RelationalQueries extends QueryModule {
  import Fns.{dsum, dsumSql, dsum18, dsum18Sql}

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Inner equi-join chain over the fact tables + group-agg.
    // Aggregate-below-join: lineitem collapses to one row per order before
    // joining, so (a) the join input shrinks ~4x, and (b) the
    // count-distinct on o_orderkey becomes a plain count of 1:1 join rows —
    // no Expand operator, one less aggregation pass. Partial decimal sums
    // re-aggregate exactly, so the revenue stays order-independent.
    "q10_join_agg" -> { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      val lAgg = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("cnt"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(27, 6))).as("rev_dec"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(lAgg, o("o_orderkey") === lAgg("l_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("cnt")).as("n_items"),
          sum(col("rev_dec")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    },

    // Star join to the region dimension (TPC-H-Q5 shape): small dims are
    // broadcast so the only shuffles are the fact-side aggregations.
    "q11_join_star" -> { (s, dir) =>
      val r = Tables.t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables.t(s, dir, "nation")
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders").filter(
        col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("o_orderdate") <  expr("TIMESTAMP '1999-01-01 00:00:00'"))
      val l = Tables.t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // Left outer join + null-tolerant aggregation. Aggregate-below-join:
    // lineitem collapses to one row per order key BEFORE the join, so the
    // join input shrinks ~4x and the shuffle carries aggregates, not rows —
    // the partial-agg pushdown Catalyst won't do on its own.
    "q12_join_left" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val lAgg = Tables.t(s, dir, "lineitem")
        .filter(col("l_quantity") > 40)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
      o.join(lAgg, o("o_orderkey") === lAgg("l_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("cnt"), lit(0L)).as("n_big_items"),
          coalesce(col("qty"), lit(0.0)).as("big_qty"))
        .orderBy("o_orderkey")
    },

    // Right outer join: the aggregate-below-join of q12 restated from the
    // small side — the pre-aggregated lineitem sits on the left and every
    // order row is preserved from the right. Plans identically to the left
    // variant (Spark canonicalizes build sides); declared separately because
    // SURVEY §2.2 promises all four equi-join types as operators.
    "q59_join_right" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val lAgg = Tables.t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
      lAgg.join(o, lAgg("l_orderkey") === o("o_orderkey"), "right")
        .select(col("o_orderkey"),
          coalesce(col("cnt"), lit(0L)).as("n_big_items"),
          coalesce(col("qty"), lit(0.0)).as("big_qty"))
        .orderBy("o_orderkey")
    },

    // Full outer join as merge: the reference's PK-keyed upsert
    // (operations.py:716-723) IS a full-outer-preferring-new — rows only in
    // the old snapshot are kept, rows only in the delta are inserts, rows in
    // both take the new version. The USING-style join coalesces the key;
    // values coalesce new-over-old. Shuffles once on the pk.
    "q60_join_full" -> { (s, dir) =>
      val ev  = Tables.t(s, dir, "events")
      val old = ev.filter(col("event_id") % 3 =!= 0)
        .select(col("event_id"), col("value").as("old_value"))
      val neu = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), (col("value") * 2).as("new_value"))
      old.join(neu, Seq("event_id"), "full")
        .select(col("event_id"),
          coalesce(col("new_value"), col("old_value")).as("value"),
          when(col("new_value").isNotNull && col("old_value").isNotNull,
            "updated")
            .when(col("new_value").isNotNull, "inserted")
            .otherwise("kept").as("merge_action"))
        .orderBy("event_id")
    },

    // Left-semi join == EXISTS (the reference's conflict check,
    // operations.py:785-789, promoted to a first-class operator).
    "q13_semi_join" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val l = Tables.t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // Left-anti join == NOT EXISTS (the reference's delete detection,
    // operations.py:556-574). Customers with no FILLED ('F') order: the
    // unfiltered "customers without any order" spelling returned 0 rows
    // at every gate SF (this fixture's order generator covers every
    // custkey) — a vacuously-green contract (the r10 q271 lesson); the
    // status predicate has survivors at every scale (5 @ sf0.001,
    // 71 @ sf0.01, 511 @ sf0.1) so the anti-join's semantics are
    // actually exercised, and the pushed filter on the build side is
    // plan-checkable.
    "q14_anti_join" -> { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },

    // As-of join: for each purchase, the most recent strictly-earlier
    // signup of the same user. Implemented shuffle-once with a range-frame
    // window over the unioned event stream — no self-join, no skew
    // amplification at 100 TB (the oracle uses the O(n²)-per-user join
    // formulation, which is the semantics, not the plan).
    "q15_asof_join" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .withColumn("tsu", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
        .rangeBetween(Window.unboundedPreceding, -1)
      ev.withColumn(
          "last_signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_signup_ts"))
        .orderBy("event_id")
    },

    // Range (interval) join: clicks within 10 minutes after each error,
    // per user. A naive non-equi join plans as BroadcastNestedLoop —
    // quadratic per user; instead both sides get a 10-minute time-bucket
    // key and clicks are exploded to their two candidate buckets, turning
    // the range join into an equi shuffle join + residual range filter.
    // This is the pattern that survives 100x data; the oracle states the
    // plain non-equi semantics.
    "q48_range_join" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val bucket = (unix_micros(col("ts")) / lit(600000000L)).cast("long")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts").as("err_ts"),
          bucket.as("bucket"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          explode(array(bucket, bucket - 1)).as("bucket"))
      errors.join(clicks, Seq("user_id", "bucket"), "left")
        .withColumn("hit",
          col("click_ts").isNotNull &&
          col("click_ts") > col("err_ts") &&
          col("click_ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
        .groupBy(col("event_id"))
        .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_clicks_10m"))
        .orderBy("event_id")
    },

    // Distinct aggregation + avg.
    "q16_agg_distinct" -> { (s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          Fns.davg(col("o_totalprice")).as("avg_price"))
        .orderBy("o_orderpriority")
    },

    // ROLLUP grouping sets; subtotal rows surfaced via COALESCE so the
    // ordering is total without relying on engine null-ordering defaults.
    "q17_rollup" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // Ranking window functions: top-3 orders per customer.
    "q18_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"), col("rnk"), col("drnk"))
        .orderBy("o_custkey", "rn")
    },

    // Window distribution functions: quartile bucketing + relative ranks.
    // percent_rank/cume_dist are exact integer ratios — both engines
    // compute the same IEEE division, so the doubles hash-match unrounded.
    "q74_window_dist" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    },

    // Running aggregate over an explicit rows frame.
    "q19_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, dir, "events")
        .withColumn("running_value", round(sum(col("value")).over(w), 4))
        .withColumn("n_so_far", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("running_value"),
          col("n_so_far"))
        .orderBy("event_id")
    },

    // Analytic window functions: lag / lead.
    "q20_window_lag" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("event_id")
    },

    // Top-k: planner compiles orderBy+limit to TakeOrderedAndProject —
    // per-partition heaps, no global sort (SURVEY.md §2.2).
    "q21_topk" -> { (s, dir) =>
      Tables.t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // CUBE grouping sets (all four combinations of the two keys).
    "q43_cube" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // Approximate distinct (HLL++). ORACLE-CHECKED via the exact twin
    // (r9, the q192 pattern): the sketch estimate itself is
    // engine-specific and stays out of the hashed columns; the output
    // carries the exact count next to a |est − exact|/exact ≤ 5%
    // verdict (HLL++ default rsd 0.05), which the oracle asserts TRUE —
    // an estimator drifting out of its own error contract turns the
    // driver row red.
    "q44_approx_distinct" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts").cast("double") -
            col("exact_parts").cast("double")) <=
            col("exact_parts").cast("double") * 0.05)
            .as("within_5pct"))
        .orderBy("l_returnflag")
    },

    // Exact interpolated percentiles per group. Safe to round at 4: the
    // fixture values sit on a 2-decimal grid and interpolation fractions on
    // a .25/.1 grid, so true percentiles have at most 4 decimals — never on
    // a round-half boundary.
    "q56_percentiles" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          round(expr("percentile(l_discount, 0.25)"), 4).as("p25_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Approximate percentiles — the 100 TB path for q56: a mergeable
    // quantile sketch (GK-style) aggregates in one pass with bounded state,
    // where exact `percentile` sorts every group. ORACLE-CHECKED via the
    // exact twin (r9, the q192 pattern): the sketch values are
    // engine-specific and stay out of the hashed columns; each estimate
    // must land inside the exact ±1%-RANK band (accuracy 10000 ⇒ rank
    // error ≤ 1e-4·n, two orders under the band), and the oracle asserts
    // those verdicts TRUE. The contract necessarily carries an exact
    // pass beside the sketch (the contract IS the comparison), but both
    // band edges of each column come from ONE percentile buffer
    // (array percentages share the value-count map), not two — the r9
    // spelling paid a second histogram per column for nothing.
    "q63_approx_percentiles" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(l_quantity, array(0.49, 0.51))").as("qb"),
          expr("percentile(l_extendedprice, array(0.89, 0.91))").as("pb"),
          expr("percentile(l_discount, array(0.24, 0.26))").as("db"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("aq"),
          expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("ap"),
          expr("approx_percentile(l_discount, 0.25, 10000)").as("ad"))
        .select(col("l_returnflag"), col("n"),
          (col("aq") >= col("qb")(0) && col("aq") <= col("qb")(1))
            .as("median_qty_in_band"),
          (col("ap") >= col("pb")(0) && col("ap") <= col("pb")(1))
            .as("p90_price_in_band"),
          (col("ad") >= col("db")(0) && col("ad") <= col("db")(1))
            .as("p25_disc_in_band"))
        .orderBy("l_returnflag")
    },

    // Multiset set operations: UNION ALL → EXCEPT ALL keeps one copy per
    // excess occurrence (bag semantics, unlike q22's set semantics).
    "q45_setops_all" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val open    = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val pending = o.filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("custkey"))
      val settled = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      open.unionAll(pending).exceptAll(settled).orderBy("custkey")
    },

    // Bag-semantics intersection: INTERSECT ALL keeps min(multiplicity) of
    // each value — the one *All set-op q45 doesn't exercise. Customers with
    // an open order per open order, intersected with their big-order
    // occurrences.
    "q62_intersect_all" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val big = o.filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("custkey"))
      open.intersectAll(big).orderBy("custkey")
    },

    // Explicit GROUPING SETS — the two 1-D marginals with no 2-D cells,
    // a set combination neither rollup (q17) nor cube (q43) can express.
    "q76_grouping_sets" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // Statistical aggregates (variance / stddev / covariance / correlation)
    // spelled from exact-decimal moment sums: the built-ins stream Welford
    // M2 partials whose double accumulation is order-dependent, so their
    // low bits differ per partitioning AND per engine — the moment-sum
    // spelling feeds identical exact decimals into an identical final
    // double expression tree on both sides, making the result bit-stable
    // (the dsum/davg argument extended to second moments).
    "q77_stat_aggs" -> { (s, dir) =>
      val a = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(lit(1)).cast("double").as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_quantity") * col("l_quantity")).as("sx2"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum(col("l_extendedprice") * col("l_extendedprice")).as("sy2"),
          dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"))
      val varQty = (col("sx2") - col("sx") * col("sx") / col("n")) /
        (col("n") - 1)
      val covar  = (col("sxy") - col("sx") * col("sy") / col("n")) /
        (col("n") - 1)
      val corr   = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
          sqrt(col("n") * col("sy2") - col("sy") * col("sy")))
      a.select(col("l_returnflag"), col("n_rows"),
          varQty.as("var_qty"), sqrt(varQty).as("stddev_qty"),
          covar.as("covar_qty_price"), corr.as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // Argmax/argmin aggregation (max_by / min_by) + filtered counting —
    // one pass, no window: the struct ordering key makes ties impossible
    // (o_orderkey is unique), so the result is deterministic.
    "q80_argmax_agg" -> { (s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("bottom_order"),
          max(col("o_totalprice")).as("top_price"),
          expr("count_if(o_totalprice > 150000)").as("n_big"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // UNPIVOT (melt): wide aggregate columns stacked into (measure, value)
    // rows — the inverse of q55's pivot; ids stay, measure names become
    // data. Scan-local besides the aggregation that builds the wide input.
    "q81_unpivot" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount")).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // Null-safe equi-join (<=>): NULL keys match each other instead of
    // dropping out — still a hash-joinable equality, not a nested loop
    // (Catalyst rewrites the key as coalesce-compare). The nulled-out
    // 'click' group survives the join; output coalesces the key for
    // engine-neutral NULL ordering.
    "q82_nullsafe_join" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val a = ev.groupBy(expr("nullif(event_type, 'click')").as("k"))
        .agg(count(lit(1)).as("n_a"))
      val b = ev.filter(col("value") > 0.5)
        .groupBy(expr("nullif(event_type, 'click')").as("k"))
        .agg(count(lit(1)).as("n_b"))
      a.join(b, a("k") <=> b("k"), "left")
        .select(coalesce(a("k"), lit("(null)")).as("k"),
          col("n_a"), col("n_b"))
        .orderBy("k")
    },

    // Set operations: UNION (distinct) → INTERSECT → EXCEPT.
    "q22_set_ops" -> { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      val rich    = c.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val bigBuy  = o.filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
      val anyBuy  = o.select(col("o_custkey").as("custkey"))
      val settled = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      rich.union(bigBuy).distinct()
        .intersect(anyBuy)
        .except(settled)
        .orderBy("custkey")
    },

    // Winsorization — the standard numeric-cleaning step before a model
    // sees a heavy-tailed column: clip values outside the per-group
    // [p05, p95] band to the band edges and report the clip census. The
    // thresholds are q56's exact interpolated percentiles rounded to the
    // 4-decimal grid (so the clip COMPARISONS run against identical
    // constants in both engines); the clipped sum uses the exact-decimal
    // dsum. Two aggregations over the same grouping key — the second
    // rides the broadcast-joined thresholds, so the only shuffles are the
    // two group-bys. Both thresholds come out of ONE `percentile(_, array)`
    // aggregate — one value buffer and one sort per group, not two (the
    // full-group sort is the dominant cost of this query; paying it twice
    // was the r5 miss).
    "q104_winsorize" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      val bounds = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))")
          .as("pp"))
        .select(col("l_returnflag"),
          round(element_at(col("pp"), 1), 4).as("lo"),
          round(element_at(col("pp"), 2), 4).as("hi"))
      val clipped = least(greatest(col("l_extendedprice"), col("lo")),
        col("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(
          max(col("lo")).as("p05"), max(col("hi")).as("p95"),
          count(when(col("l_extendedprice") < col("lo"), 1)).as("n_low"),
          count(when(col("l_extendedprice") > col("hi"), 1)).as("n_high"),
          count(lit(1)).as("n"),
          Fns.dsum(clipped).as("sum_winsorized"))
        .orderBy("l_returnflag")
    },

    // Gini coefficient of per-customer spend within each nation — the
    // inequality statistic (skew-awareness made quantitative: a nation
    // with gini near 1 is exactly the partition a salted aggregation
    // exists for). Spend per customer via the exact-decimal sum; the
    // rank-weighted formulation G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n
    // needs one window over (nation, spend, cust) and one aggregation —
    // rank products sum through the scale-18 decimal so the statistic is
    // bit-stable under any partitioning. Magnitude bound: DECIMAL(38,18)
    // leaves 20 integer digits, so sum(i*x) must stay under 1e20 per
    // group — with spend ~1e5, that is ~1e7 customers per nation
    // (i*x ~1e12 summed 1e7 times ~1e19); beyond that, widen to
    // dsum6-style scale or pre-scale x before ranking. Ranking uses the
    // exact spend doubles (identical in both engines), ties broken by
    // customer key.
    // Correlated scalar subquery through the raw SQL surface (R2/W3):
    // each order compared against ITS customer's average order value.
    // The naive reading is a per-row re-aggregation — Catalyst
    // decorrelates it into one aggregate + one equi-join (PlanGuard's
    // no-cartesian sweep holds the rewrite honest), so the plan scales
    // like any grouped join. The inner average divides an exact
    // DECIMAL(38,6) sum by the count (the dsum recipe inlined in SQL),
    // so both engines filter on identical doubles.
    "q118_correlated_sub" -> { (s, dir) =>
      Tables.t(s, dir, "orders").createOrReplaceTempView("orders_q118")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
              |FROM orders_q118 o
              |WHERE o_totalprice > 1.5 * (
              |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(38,6)))
              |           AS DOUBLE) / COUNT(*)
              |  FROM orders_q118 i WHERE i.o_custkey = o.o_custkey)
              |ORDER BY o_orderkey""".stripMargin)
    },

    "q113_spend_gini" -> { (s, dir) =>
      val spend = Tables.t(s, dir, "orders")
        .join(Tables.t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(Fns.dsum(col("o_totalprice")).as("x"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("x").asc, col("c_custkey").asc)
      spend.withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("long").as("n_customers"),
          Fns.dsum(col("x")).as("sx"),
          Fns.dsum18(col("i").cast("double") * col("x")).as("six"))
        .select(col("c_nationkey"),
          col("n_customers"),
          (lit(2.0) * col("six") /
            (col("n_customers").cast("double") * col("sx")) -
            (col("n_customers") + 1).cast("double") /
              col("n_customers").cast("double")).as("gini"))
        .orderBy("c_nationkey")
    },

    // Salted skew join — the manual hot-key mitigation ([[Skew.saltedJoin]]):
    // the fact side's join key is split across 8 salt buckets by a
    // deterministic per-row expression and the dim side replicates 8×, so
    // one hot orderkey's rows land on 8 reducers instead of one straggler.
    // The oracle is the PLAIN join's aggregate — the salt only routes
    // rows, it must never change semantics; that row-identity is exactly
    // what this query's hash check certifies. (AQE's skew split does this
    // at runtime for SMJ; the manual form also covers hash-partitioned
    // shuffles and feeds of pre-partitioned stages.)
    "q146_salted_join" -> { (s, dir) =>
      val joined = Skew.saltedJoin(
        Tables.t(s, dir, "lineitem"),
        Tables.t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority")),
        "l_orderkey",
        xxhash64(col("l_orderkey"), col("l_linenumber")),
        buckets = 8)
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          Fns.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // RFM customer segmentation — the classic lifecycle-marketing rollup
    // (recency / frequency / monetary quintiles, segment code "R_F_M_"):
    // per customer from orders against a literal as-of date, scored 1-5
    // per axis by quintile thresholds computed in ONE exact-percentile
    // aggregation and broadcast back as a 1-row frame — the q127 recipe;
    // an NTILE window over all customers would be a single-partition
    // total sort, the shape this engine never ships. Recency inverts
    // (lower = better). Determinism: recency/frequency are exact ints,
    // monetary is an exact-decimal sum, the thresholds interpolate
    // identically in both engines (q56), and the >= compares run on
    // identical doubles.
    "q159_rfm_segments" -> { (s, dir) =>
      val asof = to_date(lit("2001-09-01"))
      val cust = Tables.t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(datediff(asof, to_date(max(col("o_orderdate"))))
            .cast("long").as("recency_days"),
          count(lit(1)).as("frequency"),
          Fns.dsum(col("o_totalprice")).as("monetary"))
      def qs(c: String) = expr(s"percentile($c, array(0.2, 0.4, 0.6, 0.8))")
      val th = cust.agg(qs("recency_days").as("rt"), qs("frequency").as("ft"),
        qs("monetary").as("mt"))
      def score(x: org.apache.spark.sql.Column, t: String) =
        lit(1) + (0 to 3).map(i =>
          (x >= element_at(col(t), i + 1)).cast("int")).reduce(_ + _)
      cust.crossJoin(broadcast(th))
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
          col("monetary"),
          (lit(6) - score(col("recency_days").cast("double"), "rt"))
            .as("r_score"),
          score(col("frequency").cast("double"), "ft").as("f_score"),
          score(col("monetary"), "mt").as("m_score"))
        .withColumn("segment", concat(lit("R"), col("r_score"),
          lit("F"), col("f_score"), lit("M"), col("m_score")))
        .orderBy("o_custkey")
    },

    // Referential-integrity audit across the star schema: for every FK
    // relationship, how many child rows dangle? The data-quality gate a
    // warehouse runs after every load — all-zero orphans on this
    // FK-consistent fixture IS the passing report (and the operator the
    // quarantine path (q86) hands its survivors to). Each relationship
    // is one anti-join count; parents are dimension-sized broadcasts
    // except orders, where the anti-join shuffles on the key it would
    // at 100 TB.
    "q187_ri_audit" -> { (s, dir) =>
      def rel(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk2: String): DataFrame = {
        val orphans = child.join(parent.select(col(pk2).as(ck)),
          Seq(ck), "left_anti")
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("relationship"), col("n_rows"),
            col("n_orphans"),
            (col("n_orphans").cast("double") / col("n_rows").cast("double"))
              .as("orphan_rate"))
      }
      val li = Tables.t(s, dir, "lineitem")
      Seq(
        rel("lineitem.l_orderkey->orders", li, "l_orderkey",
          Tables.t(s, dir, "orders"), "o_orderkey"),
        rel("lineitem.l_partkey->part", li, "l_partkey",
          Tables.t(s, dir, "part"), "p_partkey"),
        rel("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.t(s, dir, "supplier"), "s_suppkey"),
        rel("orders.o_custkey->customer", Tables.t(s, dir, "orders"),
          "o_custkey", Tables.t(s, dir, "customer"), "c_custkey"),
        rel("customer.c_nationkey->nation", Tables.t(s, dir, "customer"),
          "c_nationkey", Tables.t(s, dir, "nation"), "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy("relationship")
    },

    // Functional-dependency audit: does A determine B? Profiled over a
    // fixed candidate set (the dependencies a modeler would ASSERT about
    // this schema — two that must hold, two that must not), reporting
    // violating-group counts and the worst fan-out. The discovery
    // primitive behind schema inference and normalization checks. Each
    // candidate is one (A -> countDistinct B) aggregation over its
    // table; violating groups collapse to a #groups-sized rollup.
    "q188_fd_audit" -> { (s, dir) =>
      def fd(name: String, df: DataFrame, a: String, b: String)
          : DataFrame =
        df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nb") > 1, 1L).otherwise(0L))
              .as("n_violating"),
            max(col("nb")).as("max_fanout"))
          .select(lit(name).as("dependency"), col("n_groups"),
            col("n_violating"), (col("n_violating") === 0).as("holds"),
            col("max_fanout"))
      Seq(
        fd("o_orderkey->o_custkey", Tables.t(s, dir, "orders"),
          "o_orderkey", "o_custkey"),
        fd("c_custkey->c_nationkey", Tables.t(s, dir, "customer"),
          "c_custkey", "c_nationkey"),
        fd("o_custkey->o_orderstatus", Tables.t(s, dir, "orders"),
          "o_custkey", "o_orderstatus"),
        fd("l_orderkey->l_suppkey", Tables.t(s, dir, "lineitem"),
          "l_orderkey", "l_suppkey"))
        .reduce(_ unionByName _)
        .orderBy("dependency")
    },

    // Column-profiling report over orders: the (column, nulls, distinct,
    // min, max, top value, top frequency) table every ingestion UI
    // renders first — min/max computed in the column's own type and cast
    // to string AFTER (string-min of numerics is wrong), top value by
    // (count desc, value asc) so ties are deterministic. One aggregation
    // pass per column plus a value-count rollup; all dimension-sized
    // after the scans.
    "q189_column_profile" -> { (s, dir) =>
      val t = Tables.t(s, dir, "orders")
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
      // r15 (guide §2.4 — shared exchange/scan): the per-column spelling
      // ran TEN separate branches over orders (5 base-stat aggregates +
      // 5 top-value rollups), each paying its own scan + exchange —
      // profiled at 37 jobs and ~2.4 s under the scan fanout. One shared
      // pass now computes every column's base stats in a single
      // aggregate row (20 aggregates), and ONE unpivoted rollup finds
      // all five top values: 2 passes over orders, identical output.
      val base = t.agg(
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))).head,
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))).tail: _*)
      // deterministic top value per column: the (count desc, value asc)
      // pick spelled as a min over (-count, value) — one struct-min
      // aggregation, no sort; casting BEFORE the null filter is
      // equivalent (string cast never nulls a non-null value)
      val tops = t.select(explode(array(cols.map(c =>
          struct(lit(c).as("column_name"),
            col(c).cast("string").as("v"))): _*)).as("p"))
        .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("column_name"), col("v")).agg(count(lit(1)).as("f"))
        .groupBy(col("column_name"))
        .agg(min(struct((-col("f")).as("nf"), col("v"))).as("m"))
        .select(col("column_name"), col("m.v").as("top_value"),
          (-col("m.nf")).as("top_freq"))
      // left join: an all-null column would keep its row with null top
      // (the old crossJoin against an empty-input aggregate did the same)
      base.select(explode(array(cols.map(c => struct(
          lit(c).as("column_name"), col(s"nn_$c").as("n_nulls"),
          col(s"nd_$c").as("n_distinct"), col(s"mn_$c").as("min_value"),
          col(s"mx_$c").as("max_value"))): _*)).as("b"))
        .select(col("b.*"))
        .join(tops, Seq("column_name"), "left")
        .orderBy("column_name")
    },

    // Two-table AS-OF join via the union-timeline carry: each purchase
    // event picks up the customer's most recent order AS OF the event
    // time — the temporal join feature stores and tick databases live
    // on, which Spark has no built-in for. Instead of a range join
    // (quadratic without bucketing) the two tables UNION into one
    // per-user timeline, orders sort before events at equal timestamps,
    // and one last-ignoring-nulls window carries the latest order
    // forward — the q172 carry generalized across tables. One user-keyed
    // partitioning end to end; never-ordered users keep NULL order
    // columns (an audit readout, not an error).
    "q193_asof_join" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id").as("id"), lit(1).as("kind"))
      val ord = Tables.t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate")).as("us"),
          col("o_orderkey").as("id"), lit(0).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("kind"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = when(col("kind") === 0,
        struct(col("id").as("oid"), col("us").as("ous")))
      ev.unionByName(ord)
        .withColumn("o", last(carry, ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("id").as("event_id"), col("user_id"),
          col("us").as("event_us"), col("o.oid").as("order_id"),
          col("o.ous").as("order_us"),
          expr("(us - o.ous) div 1000000").as("age_s"))
        .orderBy("event_id")
    },

    // SCD Type-2 dimension build (Kimball): the customer-status history
    // table with validity intervals — each interval one run of equal
    // o_orderstatus in the customer's order timeline, closed by the next
    // run's start (NULL = current). Gaps-and-islands as two windows per
    // customer: a change flag via LAG, a running sum numbering the runs,
    // then one per-run aggregation and a LEAD to close intervals. The
    // warehouse-dimension op every P2-style refresh feeds; all exact
    // integer timestamps, deterministic run boundaries.
    "q194_scd2_build" -> { (s, dir) =>
      val wT = Window.partitionBy(col("o_custkey"))
        .orderBy(col("us"), col("o_orderkey"))
      val wG = Window.partitionBy(col("o_custkey"))
        .orderBy(col("us"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wRun = Window.partitionBy(col("o_custkey")).orderBy(col("grp"))
      Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderstatus"), unix_micros(col("o_orderdate")).as("us"))
        .withColumn("chg", when(
          lag(col("o_orderstatus"), 1).over(wT).isNull ||
            lag(col("o_orderstatus"), 1).over(wT) =!= col("o_orderstatus"),
          1L).otherwise(0L))
        .withColumn("grp", sum(col("chg")).over(wG))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(min(col("us")).as("valid_from_us"),
          max(col("o_orderstatus")).as("status"),
          count(lit(1)).as("n_orders"))
        .withColumn("valid_to_us",
          lead(col("valid_from_us"), 1).over(wRun))
        .select(col("o_custkey"), col("grp").as("version"), col("status"),
          col("valid_from_us"), col("valid_to_us"), col("n_orders"))
        .orderBy("o_custkey", "version")
    },

    // Market-basket association rules (Agrawal-style support /
    // confidence / lift) over order baskets: items are part brands,
    // baskets are orders. ONE order-keyed aggregation materializes each
    // basket as a sorted item array; pair candidates then expand
    // SCAN-LOCALLY from that array (bounded by basket-size², a
    // per-order constant) — no basket self-join, so pair generation
    // grows linearly in orders at any scale and shuffles only
    // vocabulary-sized (item, item) keys. Item counts are a
    // vocabulary-sized table, broadcast into the rule assembly. All
    // statistics are exact-integer ratios spelled as single divisions
    // (products of counts stay far below 2^53), so both engines round
    // identically.
    "q195_assoc_rules" -> { (s, dir) =>
      val brands = Tables.t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val basket = Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sort_array(collect_set(col("p_brand"))).as("items"))
      val n = basket.agg(count(lit(1)).as("n_orders"))
      val icnt = basket
        .select(explode(col("items")).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("c"))
      // pair expansion is SCAN-LOCAL over the per-basket sorted item
      // array (bounded by basket-size², a per-order constant) — no
      // basket self-join ever shuffles
      val pairs = basket
        .filter(size(col("items")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(items) - 1), " +
            "i -> transform(sequence(i + 1, size(items)), " +
            "j -> named_struct('item_a', element_at(items, i), " +
            "'item_b', element_at(items, j)))))")).as("p"))
        .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
        .agg(count(lit(1)).as("c_pair"))
        .filter(col("c_pair") >= 50)
      pairs
        .join(broadcast(icnt.select(col("item").as("item_a"),
          col("c").as("c_a"))), "item_a")
        .join(broadcast(icnt.select(col("item").as("item_b"),
          col("c").as("c_b"))), "item_b")
        .crossJoin(broadcast(n))
        .select(col("item_a"), col("item_b"), col("c_pair"),
          (round(col("c_pair").cast("double") /
            col("n_orders").cast("double"), 10) + lit(0.0)).as("support"),
          (round(col("c_pair").cast("double") /
            col("c_a").cast("double"), 10) + lit(0.0)).as("conf_a_b"),
          (round(col("c_pair").cast("double") /
            col("c_b").cast("double"), 10) + lit(0.0)).as("conf_b_a"),
          (round((col("c_pair") * col("n_orders")).cast("double") /
            (col("c_a") * col("c_b")).cast("double"), 10) + lit(0.0))
            .as("lift"))
        .orderBy("item_a", "item_b")
    },

    // Benford first-digit audit over order totals — the fraud /
    // data-quality screen (Nigrini): compare the observed leading-digit
    // distribution against log10(1 + 1/d) and report a chi-square
    // statistic. The digit is extracted through exact integer cents
    // (round(x*100) → BIGINT → first character), not through log10 of
    // the value, so no libm boundary can misclassify a digit. The
    // digit domain is 9 rows; the chi-square total is an
    // order-independent decimal-cast window sum over those 9 rows —
    // nothing here exceeds a single scan + one 9-group aggregate at
    // any scale.
    "q199_benford" -> { (s, dir) =>
      val wAll = Window.partitionBy(lit(0))
      val digits = Tables.t(s, dir, "orders")
        .filter(col("o_totalprice") > 0)
        .select(substring(round(col("o_totalprice") * 100, 0)
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      digits
        .crossJoin(broadcast(digits.agg(sum(col("n")).as("n_total"))))
        .withColumn("share",
          col("n").cast("double") / col("n_total").cast("double"))
        .withColumn("benford_share",
          log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")))
        .withColumn("chi2_term",
          (col("n").cast("double") -
            col("benford_share") * col("n_total").cast("double")) *
          (col("n").cast("double") -
            col("benford_share") * col("n_total").cast("double")) /
          (col("benford_share") * col("n_total").cast("double")))
        .withColumn("chi2", sum(col("chi2_term")
          .cast(org.apache.spark.sql.types.DecimalType(38, 15))).over(wAll)
          .cast("double"))
        .select(col("digit"), col("n"),
          (round(col("share"), 10) + lit(0.0)).as("share"),
          (round(col("benford_share"), 10) + lit(0.0)).as("benford_share"),
          (round(col("chi2"), 6) + lit(0.0)).as("chi2"))
        .orderBy("digit")
    },

    // Record linkage by sorted-neighborhood blocking (Hernandez &
    // Stolfo's merge/purge): candidate entity matches among part names
    // without an all-pairs comparison. The linkage runs over the
    // DISTINCT-name domain (vocabulary-sized, with per-name part
    // counts carried along), blocks on the first character, sorts each
    // block, and compares each name only against its next 4 sorted
    // neighbors — O(names × window) candidates — then keeps pairs
    // within Levenshtein distance 3 (a codegen'd built-in in both
    // engines). At scale the block key bounds every window partition
    // and the name domain grows sublinearly in rows; nothing touches
    // the row-level table after the first distinct aggregation.
    "q200_name_linkage" -> { (s, dir) =>
      val names = Tables.t(s, dir, "part")
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_parts"))
        .withColumn("blk", substring(col("name"), 1, 1))
      val wB = Window.partitionBy(col("blk")).orderBy(col("name"))
      val withLeads = names.select(
        col("name"), col("n_parts"),
        array((1 to 4).map(i => struct(
          lead(col("name"), i).over(wB).as("nb"),
          lead(col("n_parts"), i).over(wB).as("nb_n"))): _*).as("cands"))
      withLeads
        .select(col("name").as("name_a"), col("n_parts").as("n_parts_a"),
          explode(col("cands")).as("c"))
        .filter(col("c.nb").isNotNull)
        .withColumn("dist", levenshtein(col("name_a"), col("c.nb")))
        .filter(col("dist") <= 3)
        .select(col("name_a"), col("c.nb").as("name_b"),
          col("n_parts_a"), col("c.nb_n").as("n_parts_b"), col("dist"))
        .orderBy("name_a", "name_b")
    },

    // Jaro-Winkler record linkage — q200's sorted-neighborhood blocking
    // rescored with the native codegen [[graft.functions.JaroWinkler]]
    // expression (the merge/purge standard scorer Spark lacks: it ships
    // only levenshtein/soundex; JW's match-window model tolerates the
    // transpositions that cost Levenshtein 2 and boosts shared name
    // heads). Same scale shape as q200: per-block windows, 4 sorted
    // neighbors — candidates stay linear in the name domain, never
    // all-pairs. The oracle is DuckDB's own jaro_winkler_similarity:
    // the expression is semantics-identical (validated bit-for-bit over
    // 1600 fixture-name pairs — boost threshold 0.7, prefix cap 4,
    // p=0.1, either-empty → 0), so the 0.85 threshold cuts identical
    // doubles in both engines and scores round at 6 with no band.
    "q278_jaro_winkler_linkage" -> { (s, dir) =>
      import graft.functions.JaroWinkler.jaroWinkler
      val names = Tables.t(s, dir, "part")
        .select(col("p_name").as("name")).distinct()
      val wB = Window.partitionBy(substring(col("name"), 1, 1))
        .orderBy(col("name"))
      names.select(col("name"),
          array((1 to 4).map(i => lead(col("name"), i).over(wB)): _*)
            .as("cands"))
        .select(col("name").as("name_a"), explode(col("cands")).as("name_b"))
        .filter(col("name_b").isNotNull)
        .withColumn("jw", jaroWinkler(col("name_a"), col("name_b")))
        .filter(col("jw") >= 0.85)
        .select(col("name_a"), col("name_b"),
          (round(col("jw"), 6) + lit(0.0)).as("jw"))
        .orderBy("name_a", "name_b")
    },

    // Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter
    // 1969) — the DECISION layer the linkage family was missing: q200
    // finds candidates (sorted-neighborhood blocking), q278 scores one
    // field (Jaro-Winkler); FS combines the per-field agreement pattern
    // into a log-likelihood match weight and classifies. Per field i,
    // agreement contributes ln(m_i/u_i), disagreement ln((1−m_i)/(1−u_i))
    // (m = P(agree | match), u = P(agree | non-match) — stated priors
    // here, as in a deployment before EM refits them; u for the name
    // field reflects the name-sorted blocking's high chance agreement).
    // Weight = the fixed-order sum of the four field terms — scan-local
    // arithmetic on ln's of literal-double ratios, so both engines
    // produce identical doubles and the match/possible thresholds cut
    // identically. Scale shape = q200's: the part domain, one per-block
    // window, 4 sorted neighbors — candidates linear in the domain,
    // never all-pairs; everything after the window is scan-local.
    "q296_fellegi_sunter" -> { (s, dir) =>
      import graft.functions.JaroWinkler.jaroWinkler
      val p = Tables.t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"))
      val wB = Window.partitionBy(substring(col("p_name"), 1, 1))
        .orderBy(col("p_name"), col("p_partkey"))
      val cand = p.select(col("p_partkey"), col("p_name"),
          col("p_brand"), col("p_type"), col("p_size"),
          array((1 to 4).map(i => struct(
            lead(col("p_partkey"), i).over(wB).as("k"),
            lead(col("p_name"), i).over(wB).as("nm"),
            lead(col("p_brand"), i).over(wB).as("br"),
            lead(col("p_type"), i).over(wB).as("ty"),
            lead(col("p_size"), i).over(wB).as("sz"))): _*).as("cands"))
        .select(col("p_partkey").as("key_a"), col("p_name"),
          col("p_brand"), col("p_type"), col("p_size"),
          explode(col("cands")).as("c"))
        .filter(col("c.k").isNotNull)
      // both branches keep the arithmetic IN-ENGINE double ops (never
      // pre-folded Scala constants): the oracle spells the identical
      // CAST-to-double chain, so 1−m, the ratio, and the ln are the
      // same IEEE sequence in both engines
      def w(agree: org.apache.spark.sql.Column, m: Double, u: Double) =
        when(agree, log(lit(m) / lit(u)))
          .otherwise(log((lit(1.0) - lit(m)) / (lit(1.0) - lit(u))))
      val scored = cand.select(col("key_a"), col("c.k").as("key_b"),
          concat(
            when(jaroWinkler(col("p_name"), col("c.nm")) >= 0.9,
              lit("N")).otherwise(lit("-")),
            when(col("p_brand") === col("c.br"), lit("B"))
              .otherwise(lit("-")),
            when(col("p_type") === col("c.ty"), lit("T"))
              .otherwise(lit("-")),
            when(col("p_size") === col("c.sz"), lit("S"))
              .otherwise(lit("-"))).as("pattern"),
          (w(jaroWinkler(col("p_name"), col("c.nm")) >= 0.9, 0.9, 0.5) +
            w(col("p_brand") === col("c.br"), 0.9, 0.04) +
            w(col("p_type") === col("c.ty"), 0.8, 0.16) +
            w(col("p_size") === col("c.sz"), 0.8, 0.02)).as("weight"))
      scored
        .filter(col("weight") >= 0.5)
        .select(col("key_a"), col("key_b"), col("pattern"),
          (round(col("weight"), 6) + lit(0.0)).as("weight"),
          when(col("weight") >= 3.5, lit("match"))
            .otherwise(lit("possible")).as("verdict"))
        .orderBy("key_a", "key_b")
    },

    // Leave-one-out target encoding of a categorical feature — the
    // leakage-safe ML encoding (each row's encoded value excludes its
    // own target, so the feature never memorizes the label it will be
    // trained against). One broadcast dimension join attaches the
    // segment, one segment-keyed aggregation computes exact-decimal
    // group sums, and the LOO mean is algebra on the broadcast-back
    // group row: (S - x) / (n - 1) — no per-row window over the group,
    // no self-join. The group table is |segments| rows at any fact
    // volume.
    "q204_target_encoding" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
        .join(broadcast(Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      val g = o.groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("seg_sum"),
          count(lit(1)).as("seg_n"))
        .filter(col("seg_n") > 1)
      o.join(broadcast(g), "c_mktsegment")
        .select(col("o_orderkey"), col("c_mktsegment").as("segment"),
          col("o_totalprice"),
          (round((col("seg_sum") - col("o_totalprice")) /
            (col("seg_n") - 1).cast("double"), 6) + lit(0.0))
            .as("loo_mean"))
        .orderBy("o_orderkey")
    },

    // Per-group top-k through a BOUNDED-HEAP native aggregate
    // (functions/TopKByAggregate): top-5 orders by value per market
    // segment. The q18/q21 window spelling shuffles every fact row to
    // its group's task and sorts the whole group; the heap aggregate
    // ships ≤5 (value, id) slots per group per MAP task and merges
    // heaps on the reduce side — skewed groups cost 5 slots like any
    // other, where a window plan concentrates the hot group's entire
    // row set on one task. Total (value DESC, id ASC) ordering makes
    // the heap contents and emitted array deterministic, so the
    // window-spelled oracle states the identical rows.
    "q207_topk_agg" -> { (s, dir) =>
      import graft.functions.TopKByAggregate.topKBy
      val o = Tables.t(s, dir, "orders")
        .join(broadcast(Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_totalprice"), col("o_orderkey"))
      o.groupBy(col("segment"))
        .agg(topKBy(col("o_totalprice"), col("o_orderkey"), 5).as("top"))
        .select(col("segment"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("segment"), (col("pos") + 1).as("rank"),
          col("e.id").as("o_orderkey"), col("e.v").as("o_totalprice"))
        .orderBy("segment", "rank")
    },

    // Decile lift / gains table — the campaign-targeting evaluation:
    // rank customers by a model score (account balance as the stand-in
    // propensity), cut into 10 equal-depth bins, and report each bin's
    // response rate against the base rate plus cumulative gains. The
    // global rank comes from the q198 two-phase prefix-sum (score-range
    // buckets + broadcast offsets), NOT a single-partition NTILE — and
    // the decile is the explicit ((rn−1)·10) div N formula stated
    // identically in the oracle, sidestepping engine NTILE remainder
    // conventions. Lift spelled as a ratio of exact integer products —
    // one division, no intermediate rates.
    "q208_decile_lift" -> { (s, dir) =>
      val resp = Tables.t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .join(Tables.t(s, dir, "orders")
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey")).distinct()
          .withColumn("r", lit(1L)),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_acctbal"),
          coalesce(col("r"), lit(0L)).as("responded"))
      // two-phase global rank by (acctbal DESC, custkey ASC): negated
      // score bins are a prefix of the sort key
      val b = resp.withColumn("bkt",
        floor(-col("c_acctbal") / lit(500.0)).cast("long"))
      val wLoc = Window.partitionBy(col("bkt"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wOff = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = b.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
        .select(col("bkt"), col("off"))
      val n = resp.agg(count(lit(1)).as("n_total"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(lit(0))
      b.join(broadcast(offs), "bkt")
        .withColumn("rn", col("off") + row_number().over(wLoc))
        .crossJoin(broadcast(n))
        .withColumn("decile",
          expr("((rn - 1) * 10) div n_total") + 1)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("responded")).as("n_resp"),
          max(col("n_total")).as("n_total"))
        .withColumn("resp_total", sum(col("n_resp")).over(wAll))
        .withColumn("cum_resp", sum(col("n_resp")).over(wCum))
        .select(col("decile"), col("n_cust"), col("n_resp"),
          (round(col("n_resp").cast("double") /
            col("n_cust").cast("double"), 10) + lit(0.0)).as("resp_rate"),
          (round((col("n_resp") * col("n_total")).cast("double") /
            (col("n_cust") * col("resp_total")).cast("double"), 10)
            + lit(0.0)).as("lift"),
          (round(col("cum_resp").cast("double") /
            col("resp_total").cast("double"), 10) + lit(0.0))
            .as("cum_gain"))
        .orderBy("decile")
    },

    // Join-key skew audit — the diagnostic that decides between a plain
    // shuffle join, a broadcast, and q146's salting: per-key row counts
    // for a prospective join key, the top-10 hottest keys with their
    // share of all rows, and each key's skew factor (its count over the
    // uniform per-key expectation). One keyed aggregation; everything
    // after runs on the KEY DOMAIN (dimension-sized), so the ranking
    // window is bounded however large the fact table grows. AQE's
    // skew-join splitting reacts at runtime; this measures the same
    // thing ahead of plan selection.
    "q211_skew_audit" -> { (s, dir) =>
      val wAll = Window.partitionBy(lit(0))
      val wRank = Window.orderBy(col("n").desc, col("key"))
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(wAll))
        .withColumn("n_keys", count(lit(1)).over(wAll))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") <= 10)
        .select(col("rk").as("rank"), col("key"), col("n"),
          (round(col("n").cast("double") / col("total").cast("double"),
            10) + lit(0.0)).as("share"),
          (round((col("n") * col("n_keys")).cast("double") /
            col("total").cast("double"), 6) + lit(0.0)).as("skew_factor"))
        .orderBy("rank")
    },

    // ABC / Pareto classification: parts ranked by revenue, classified
    // A (first 80% of cumulative revenue share), B (to 95%), C (tail) —
    // the inventory-analytics 80/20 readout. Revenue per part is one
    // keyed exact-decimal aggregation; the global revenue rank uses the
    // q198/q208 two-phase prefix-sum (revenue-band buckets + broadcast
    // offsets — no single-partition window over the part domain); the
    // cumulative share walks bucket-local cumsums plus the carried
    // offset the same way. Class cuts compare exact decimal-summed
    // doubles against 0.80/0.95 of an exact total — both engines
    // compute the identical cumulative sequence in the identical order.
    "q220_abc_pareto" -> { (s, dir) =>
      val rev = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("partkey"))
        .agg(dsum(col("l_extendedprice")).as("revenue"))
      val b = rev.withColumn("bkt",
        floor(-col("revenue") / lit(100000.0)).cast("long"))
      val wLoc = Window.partitionBy(col("bkt"))
        .orderBy(col("revenue").desc, col("partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wLocRn = Window.partitionBy(col("bkt"))
        .orderBy(col("revenue").desc, col("partkey"))
      val wOff = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      // offsets and local cumsums stay DECIMAL until one final cast, so
      // the two-phase sum is bit-equal to the oracle's single global
      // decimal running sum (double-ing each phase separately would
      // round twice)
      val offs = b.groupBy(col("bkt"))
        .agg(count(lit(1)).as("bn"),
          sum(col("revenue").cast(dec)).as("brev"))
        .withColumn("off_n", coalesce(sum(col("bn")).over(wOff), lit(0L)))
        .withColumn("off_rev",
          coalesce(sum(col("brev")).over(wOff), lit(0).cast(dec)))
        .select(col("bkt"), col("off_n"), col("off_rev"))
      val tot = rev.agg(dsum(col("revenue")).as("total_rev"))
      b.join(broadcast(offs), "bkt")
        .crossJoin(broadcast(tot))
        .withColumn("rn", col("off_n") + row_number().over(wLocRn))
        .withColumn("cum_rev",
          (col("off_rev") + sum(col("revenue").cast(dec)).over(wLoc))
            .cast("double"))
        .select(col("partkey"), col("revenue"), col("rn").as("rank"),
          (round(col("cum_rev") / col("total_rev"), 10) + lit(0.0))
            .as("cum_share"),
          when(col("cum_rev") <= col("total_rev") * 0.80, "A")
            .when(col("cum_rev") <= col("total_rev") * 0.95, "B")
            .otherwise("C").as("abc_class"))
        .orderBy("rank")
    },

    // Point-in-time dimensional join: each purchase event picks up the
    // SCD2 dimension version (q194's customer-status history) that was
    // valid AT the event instant — the time-correct feature/dimension
    // lookup that prevents label leakage in training pipelines (joining
    // today's dimension onto last month's events is the classic bug).
    // Spelled as q193's union-timeline carry instead of an interval
    // join: version-start rows sort before events at equal timestamps
    // (later versions later still, via the order key), one
    // last-ignoring-nulls window carries the in-effect version forward
    // — linear in events + versions on ONE customer partitioning, no
    // range-join candidate blowup. Events before a customer's first
    // version keep NULLs (an audit readout).
    "q215_pit_join" -> { (s, dir) =>
      val wT = Window.partitionBy(col("cust"))
        .orderBy(col("us"), col("o_orderkey"))
      val wG = Window.partitionBy(col("cust"))
        .orderBy(col("us"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val dim = Tables.t(s, dir, "orders")
        .select(col("o_custkey").as("cust"), col("o_orderkey"),
          col("o_orderstatus").as("status"),
          unix_micros(col("o_orderdate")).as("us"))
        .withColumn("chg", when(
          lag(col("status"), 1).over(wT).isNull ||
            lag(col("status"), 1).over(wT) =!= col("status"), 1L)
          .otherwise(0L))
        .withColumn("version", sum(col("chg")).over(wG))
        .filter(col("chg") === 1L)
        .select(col("cust"), col("us"), col("o_orderkey").as("id"),
          col("status"), col("version"), lit(0).as("kind"))
      val ev = Tables.t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("cust"), unix_micros(col("ts")).as("us"),
          col("event_id").as("id"), lit(null).cast("string").as("status"),
          lit(null).cast("long").as("version"), lit(1).as("kind"))
      val wC = Window.partitionBy(col("cust"))
        .orderBy(col("us"), col("kind"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val carry = when(col("kind") === 0,
        struct(col("version").as("v"), col("status").as("st"),
          col("us").as("since")))
      dim.unionByName(ev)
        .withColumn("d", last(carry, ignoreNulls = true).over(wC))
        .filter(col("kind") === 1)
        .select(col("id").as("event_id"), col("cust").as("user_id"),
          col("us").as("event_us"), col("d.v").as("version"),
          col("d.st").as("status_at_event"),
          col("d.since").as("since_us"))
        .orderBy("event_id")
    },

    // Weighted percentiles per group — the quantity-weighted median/p90
    // of line price (every unit shipped votes, not every line): the
    // correct location statistic whenever rows carry replication weights
    // (sampled corpora with inverse-probability weights, token-weighted
    // doc stats, unit-weighted prices). Definition: smallest value whose
    // cumulative weight reaches p of the group total; crossings are
    // exact integer comparisons (2·cw ≥ tw — no quantile arithmetic in
    // doubles). Scale shape: the naive spelling is ONE cumulative
    // window partitioned by the group key — with a LOW-CARDINALITY
    // group (3 flags) that single-threads the whole table through 3
    // window tasks (measured 8.5× at 10× data). This spelling is the
    // q91 two-phase prefix sum instead: partition the cumulative work
    // by (group, static value bucket) — parallel across ~gx55 cells —
    // then close each bucket's offset from the tiny per-bucket totals
    // (a #cells-row window) and broadcast it back. cw = bucket offset +
    // within-bucket RANGE cumulative ≡ total weight of values ≤ v,
    // because a tied value lands in exactly one bucket. Tie-safe,
    // deterministic, and every corpus-sized stage is hash-parallel.
    "q226_weighted_percentile" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"),
          col("l_quantity").cast("long").as("w"))
        .withColumn("bkt", floor(col("v") / 2000.0).cast("long"))
      val wLoc = Window.partitionBy(col("flag"), col("bkt"))
        .orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val bt = li.groupBy(col("flag"), col("bkt"))
        .agg(sum(col("w")).as("bw"))
      val wOff = Window.partitionBy(col("flag")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy(col("flag"))
      val off = bt.select(col("flag"), col("bkt"),
        coalesce(sum(col("bw")).over(wOff), lit(0L)).as("off"),
        sum(col("bw")).over(wTot).as("tw"))
      li.join(broadcast(off), Seq("flag", "bkt"))
        .select(col("flag"), col("v"), col("tw"),
          (col("off") + sum(col("w")).over(wLoc)).as("cw"))
        .groupBy(col("flag"))
        .agg(max(col("tw")).as("total_w"),
          min(when(col("cw") * 2 >= col("tw"), col("v"))).as("wmedian"),
          min(when(col("cw") * 10 >= col("tw") * 9, col("v"))).as("wp90"))
        .orderBy("flag")
    },

    // Candidate-key discovery — the profiling question schema inference
    // and upsert-pk selection start from (the reference REQUIRES a
    // unique key for its ON CONFLICT merge, operations.py:348-351 adds
    // the UNIQUE constraint; this op finds which column sets qualify):
    // for each candidate column set, is COUNT(DISTINCT set) == COUNT(*)?
    // Plan: one distinct-aggregate per candidate over a pruned scan
    // (only the candidate's columns read), unioned into a #candidates-
    // sized report — embarrassingly parallel across candidates, each a
    // single hash aggregation; no candidate enumeration blowup (the
    // tested set is the declared shortlist, not the powerset).
    "q229_candidate_keys" -> { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val cands: Seq[(String, Seq[String])] = Seq(
        "o_orderkey" -> Seq("o_orderkey"),
        "o_custkey" -> Seq("o_custkey"),
        "o_orderdate" -> Seq("o_orderdate"),
        "o_custkey,o_orderdate" -> Seq("o_custkey", "o_orderdate"),
        "o_orderpriority,o_orderdate" -> Seq("o_orderpriority", "o_orderdate"))
      cands.map { case (name, cols) =>
        val n = o.select(cols.map(col): _*)
        n.agg(count(lit(1)).as("n_rows"),
            count_distinct(struct(cols.map(col): _*)).as("n_distinct"))
          .select(lit(name).as("candidate"), col("n_rows"),
            col("n_distinct"),
            when(col("n_distinct") === col("n_rows"), 1)
              .otherwise(0).as("is_key"))
      }.reduce(_.unionByName(_)).orderBy("candidate")
    },

    // Grouped OLS fit — per-brand least-squares of line price on
    // quantity with R²: the elasticity/sanity regression analysts run
    // per segment (does price scale with volume, and how tightly?).
    // Scale shape: ONE aggregation collapses the fact table to six
    // moments per group (n, Σx, Σy, Σxy, Σx², Σy²) — the classic
    // map-side-combining moment rollup; slope/intercept/R² are then
    // closed-form arithmetic on the #groups-row frame. Determinism: x
    // is integer-valued (exact long sums); every sum involving the
    // double y rides the scale-18 exact-decimal carry, so the six
    // moments are bit-identical under any partitioning and the final
    // doubles are one shared expression, rounded at 6.
    "q232_grouped_ols" -> { (s, dir) =>
      val d = Tables.t(s, dir, "lineitem")
        .join(Tables.t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          col("l_quantity").cast("long").as("x"),
          col("l_extendedprice").as("y"))
      val m = d.groupBy(col("brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          dsum18(col("y")).as("sy"),
          dsum18(col("x").cast("double") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          dsum18(col("y") * col("y")).as("syy"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val syD = col("sy").cast("double")
      val num = nD * col("sxy").cast("double") - sxD * syD
      val vx = nD * col("sxx").cast("double") - sxD * sxD
      val vy = nD * col("syy").cast("double") - syD * syD
      // zero-variance guard (matches q230/q235): a constant-x group
      // yields vx = 0 -> slope/intercept undefined; constant y -> r2
      // undefined. NULL beats Inf/NaN leaking through round.
      m.select(col("brand"), col("n"),
          when(vx > 0, round(num / vx, 6) + lit(0.0)).as("slope"),
          when(vx > 0, round((syD - (num / vx) * sxD) / nD, 6) + lit(0.0))
            .as("intercept"),
          when(vx > 0 && vy > 0,
            round(num * num / (vx * vy), 6) + lit(0.0)).as("r2"))
        .orderBy("brand")
    },

    // Exact trimmed mean per group — the robust location statistic
    // beside q104's winsorize (winsorize CLAMPS the tails; the trim
    // DROPS them): mean of the middle 90% of rows per group, tails cut
    // by exact row count. Scale shape: the global per-group rank uses
    // the q220/q226 two-phase spelling — local row_number within
    // (group, static value bucket) + bucket-count offsets closed on a
    // tiny frame and broadcast back — because ranking by a 3-value
    // group key directly would single-thread the table. The trim
    // bounds are exact integer arithmetic on the group count; the kept
    // rows' mean rides the exact-decimal carry. Ties order by the
    // unique line key, identically in both engines.
    "q233_trimmed_mean" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        .withColumn("bkt", floor(col("v") / 2000.0).cast("long"))
      val wLoc = Window.partitionBy(col("flag"), col("bkt"))
        .orderBy(col("v"), col("ok"), col("ln"))
      val bt = li.groupBy(col("flag"), col("bkt"))
        .agg(count(lit(1)).as("bn"))
      val wOff = Window.partitionBy(col("flag")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy(col("flag"))
      val off = bt.select(col("flag"), col("bkt"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off"),
        sum(col("bn")).over(wTot).as("tn"))
      li.join(broadcast(off), Seq("flag", "bkt"))
        .withColumn("rn", col("off") + row_number().over(wLoc))
        .withColumn("cut", floor(col("tn") * 5 / 100))
        .filter(col("rn") > col("cut") && col("rn") <= col("tn") - col("cut"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_kept"),
          (round(dsum(col("v")) / count(lit(1)).cast("double"), 6)
            + lit(0.0)).as("trimmed_mean"))
        .orderBy("flag")
    },

    // Interval coalescing — merge each supplier's overlapping/adjacent
    // shipping windows into maximal covered spans (the gaps-and-islands
    // generalization from points to INTERVALS): the utilization /
    // busy-time primitive behind q218's concurrency sweep, stated as a
    // reusable merge. Windows derive deterministically from the fixture
    // (ship day + quantity-scaled duration). Plan: one supplier-keyed
    // window pass — running max of interval end over strictly-previous
    // rows marks island starts (an island breaks where a start exceeds
    // every previous end), the island id is a running sum, and per-
    // island bounds collapse in the same keyed aggregation. Supplier
    // cardinality is high, so the window parallelizes; ties order by
    // the unique line key in both engines.
    "q236_interval_coalesce" -> { (s, dir) =>
      val iv = Tables.t(s, dir, "lineitem")
        .select(col("l_suppkey").as("supp"),
          expr("unix_micros(l_shipdate) div 86400000000").as("s0"),
          col("l_quantity").cast("long").as("q"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        .select(col("supp"), col("s0").as("s"),
          (col("s0") + expr("q div 5") + 1).as("e"), col("ok"), col("ln"))
      val wOrd = Window.partitionBy(col("supp"))
        .orderBy(col("s"), col("e"), col("ok"), col("ln"))
      val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("pmax", max(col("e")).over(wPrev))
        .withColumn("is_new",
          when(col("pmax").isNull || col("s") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("isl", sum(col("is_new")).over(wRun))
        .groupBy(col("supp"), col("isl"))
        .agg(count(lit(1)).as("nraw"),
          min(col("s")).as("is_"), max(col("e")).as("ie"))
        .groupBy(col("supp"))
        .agg(sum(col("nraw")).as("n_raw"),
          count(lit(1)).as("n_merged"),
          sum(col("ie") - col("is_") + 1).as("covered_days"),
          max(col("ie") - col("is_") + 1).as("max_span_days"))
        .orderBy("supp")
    },

    // Equi-depth histogram — the optimizer-statistics primitive (every
    // cost-based planner keeps one per column; q111's histogram is
    // equi-WIDTH — fixed value bins, wildly uneven counts on skewed
    // data; equi-depth puts the same ROW COUNT in every bucket so bin
    // boundaries track the distribution): 16 buckets over line price,
    // each reporting its exact row count and [lo, hi] value bounds.
    // Scale shape: the global rank is the q220/q226 two-phase spelling
    // (local row_number per static value bucket + tiny offset closure
    // broadcast back — a PARTITIONLESS global window would single-
    // thread the table); bucket assignment is exact integer arithmetic
    // on (rank, n); the per-bucket rollup is 16 rows.
    "q241_equidepth_histogram" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
        .select(col("l_extendedprice").as("v"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        .withColumn("bkt", floor(col("v") / 2000.0).cast("long"))
      val wLoc = Window.partitionBy(col("bkt"))
        .orderBy(col("v"), col("ok"), col("ln"))
      val bt = li.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
      val wOff = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = bt.select(col("bkt"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off"),
        sum(col("bn")).over(Window.partitionBy(lit(0))).as("tn"))
      li.join(broadcast(off), Seq("bkt"))
        .withColumn("rn", col("off") + row_number().over(wLoc))
        .withColumn("b", expr("((rn - 1) * 16) div tn + 1"))
        .groupBy(col("b").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy("bucket")
    },

    // Wilson-score lower-bound ranking — the "sort by rating that a
    // 3-of-3 never beats a 95-of-100" estimator (Wilson 1927; the
    // standard comments/reviews ranking fix). Per part: keep rate =
    // non-returned share of its lineitems; the 95% Wilson lower bound
    // (z = 1.96) shrinks small samples toward 0.5 so low-volume parts
    // can't top the table on luck. One groupBy(partkey) — scan-local
    // counts, no joins; the bound is per-row closed-form arithmetic on
    // two integer counts (identical doubles in both engines, rank
    // tie-broken by key). min 5 observations, like any review site.
    "q247_wilson_ranking" -> { (s, dir) =>
      val g = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
            .as("n_kept"))
        .filter(col("n_items") >= 5)
      val n = col("n_items").cast("double")
      val p = col("n_kept").cast("double") / n
      val z2 = lit(1.96 * 1.96)
      val lb = (p + z2 / (lit(2.0) * n) -
        lit(1.96) * sqrt(p * (lit(1.0) - p) / n +
          z2 / (lit(4.0) * n * n))) / (lit(1.0) + z2 / n)
      // top-25 via TakeOrderedAndProject (distributed heap merge), THEN
      // rank the 25 survivors — a partitionless window over all parts
      // would single-thread the dimension (the q241 lesson)
      g.select(col("l_partkey"), col("n_items"), col("n_kept"),
          lb.as("w"))
        .orderBy(col("w").desc, col("l_partkey")).limit(25)
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("w").desc, col("l_partkey")))
          .cast("int"))
        .select(col("rnk"), col("l_partkey"), col("n_items"),
          col("n_kept"), (round(col("w"), 6) + lit(0.0)).as("wilson_lb"))
        .orderBy("rnk")
    },

    // Count-min sketch heavy hitters — the MERGEABLE frequency sketch
    // (Cormode & Muthukrishnan 2005): d=4 hash rows × w=1024 buckets,
    // fixed 4096-counter state regardless of N, so at 100 TB each
    // executor folds its partition into a local sketch and the merge is
    // a 4096-row sum (map-side combinable; contrast q197's Misra-Gries,
    // which keeps keys). Estimate = min over rows of the hashed bucket
    // count — NEVER an underestimate (every bucket holds the key's true
    // count plus nonneg collision mass). Spelled from the per-key exact
    // frequency table (identical bucket sums, and the exact counts are
    // needed for the contract anyway): both the sketch (≤4096 rows) and
    // the verdicts are oracle-checked — est ≥ exact structurally, and
    // the top-20 overcounts stay under the 4·N/w Markov envelope.
    // Hashes are md5-hex (q178's idiom) so both engines agree bit-wise.
    "q254_cms_heavy_hitters" -> { (s, dir) =>
      val W = 1024L
      def bucket(key: org.apache.spark.sql.Column, i: Int) =
        conv(substring(md5(concat(key.cast("string"), lit("#" + i))
          .cast("binary")), 1, 5), 16, 10).cast("long") % W
      // one lineitem aggregation feeds sketch, probe AND total: checkpoint
      // so the corpus-sized shuffle runs once, not three times
      val exact = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_n"))
        .transform(graft.Checkpoints.ckpt)
      val hb = exact.select(col("l_partkey"), col("exact_n"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("h"), bucket(col("l_partkey"), i).as("b"))): _*))
          .as("hb"))
        .select(col("l_partkey"), col("exact_n"),
          col("hb.h").as("h"), col("hb.b").as("b"))
      val sketch = hb.groupBy(col("h"), col("b"))
        .agg(sum(col("exact_n")).as("bn"))
      val tot = exact.agg(sum(col("exact_n")).as("n_tot"))
      hb.join(broadcast(sketch), Seq("h", "b"))
        .groupBy(col("l_partkey"), col("exact_n"))
        .agg(min(col("bn")).as("cms_est"))
        .crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overcount"),
          (col("cms_est") >= col("exact_n")).as("never_under"),
          ((col("cms_est") - col("exact_n")) * lit(W) <= lit(4L) *
            col("n_tot")).as("within_markov"))
        .orderBy(col("exact_n").desc, col("l_partkey")).limit(20)
    },

    // Join-SIZE estimation from two count-min sketches (Cormode &
    // Muthukrishnan 2005 §4.2, the AGMS lineage): |A ⋈ B| = Σ_k
    // f_A(k)·f_B(k) estimates as min over rows of the two sketches' row
    // inner products — the optimizer-style cardinality question ("how
    // big would this join be?") answered WITHOUT running the join. At
    // 100 TB this is the decision input for salting/broadcast choices:
    // each side folds to a fixed 4×1024 counter array (map-side, q254's
    // state bound), the two arrays meet on one node, and the estimate
    // costs a 4096-element dot — the row-level join never executes.
    // Contract (the q254 pattern): the estimate is structurally never
    // UNDER the true size (collisions only add cross terms), and the
    // overcount obeys the Markov envelope 4·N_A·N_B/w per row; the
    // oracle recomputes the identical sketch from exact per-key counts
    // and asserts both verdicts TRUE. Exact size for the grade comes
    // from the COUNT TABLES' equi-join (key-domain-sized), not the
    // row-level join.
    "q275_cms_join_size" -> { (s, dir) =>
      val W = 1024L
      def bucket(key: org.apache.spark.sql.Column, i: Int) =
        conv(substring(md5(concat(key.cast("string"), lit("#" + i))
          .cast("binary")), 1, 5), 16, 10).cast("long") % W
      def side(df: DataFrame, key: String): (DataFrame, DataFrame) = {
        val cnt = df.groupBy(col(key).as("k"))
          .agg(count(lit(1)).as("f")).transform(graft.Checkpoints.ckpt)
        val sk = cnt.select(col("k"), col("f"),
            explode(array((0 until 4).map(i => struct(lit(i).as("h"),
              bucket(col("k"), i).as("b"))): _*)).as("hb"))
          .select(col("hb.h").as("h"), col("hb.b").as("b"), col("f"))
          .groupBy(col("h"), col("b")).agg(sum(col("f")).as("fn"))
        (cnt, sk)
      }
      val (ca, sa) = side(Tables.t(s, dir, "events"), "user_id")
      val (cb, sb) = side(Tables.t(s, dir, "orders"), "o_custkey")
      val est = sa.join(sb.withColumnRenamed("fn", "gn"), Seq("h", "b"))
        .groupBy(col("h"))
        .agg(sum(col("fn") * col("gn")).as("ip"))
        .agg(min(col("ip")).as("cms_est"))
      val exact = ca.join(cb.withColumnRenamed("k", "k2")
          .withColumnRenamed("f", "g"), col("k") === col("k2"))
        .agg(sum(col("f") * col("g")).as("exact_join_size"))
      val na = ca.agg(sum(col("f")).as("n_a"))
      val nb = cb.agg(sum(col("f")).as("n_b"))
      exact.crossJoin(broadcast(est))
        .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
        .select(col("exact_join_size"), col("cms_est"),
          (col("cms_est") - col("exact_join_size")).as("overcount"),
          (col("cms_est") >= col("exact_join_size")).as("never_under"),
          ((col("cms_est") - col("exact_join_size")) * lit(W) <=
            lit(4L) * col("n_a") * col("n_b")).as("within_envelope"))
    },

    // AMS tug-of-war second-moment sketch (Alon-Matias-Szegedy 1996) —
    // the SELF-join-size member of the sketch family: F₂ = Σ_k f_k² is
    // what the optimizer needs to price a self-join or a skewed
    // aggregation, and q275's CMS answers the CROSS-join question where
    // this answers the quadratic one. 64 ±1 counters (4 md5s per key ×
    // 16 byte-pair signs each — q180's cross-engine sign idiom), each
    // counter an EXACT long Σ f_k·σ_j(k); the estimator is the mean of
    // the squares, unbiased with Var ≤ 2F₂²/64, so the verdict asserts
    // the 4σ envelope |est − F₂| ≤ 4·√(2/64)·F₂. The oracle recomputes
    // the whole estimator hash-for-hash AND grades it against the exact
    // F₂ from the same count frame. Scale shape: ONE corpus aggregation
    // to key counts (the only corpus-sized shuffle); signs are
    // scan-local on the vocab-sized frame; sketch state is 64 longs at
    // ANY corpus size.
    "q295_ams_f2" -> { (s, dir) =>
      val k = 64
      val cnt = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        .transform(graft.Checkpoints.ckpt)
      val exact = cnt.agg(count(lit(1)).as("n_keys"),
        sum(col("c") * col("c")).as("f2_exact"))
      val ctr = cnt
        .select(explode(expr(
          """flatten(transform(sequence(0, 3), b ->
            |  transform(sequence(0, 15), i -> named_struct(
            |    'j', b * 16 + i,
            |    'x', c * (CAST(conv(substring(
            |        md5(CAST(concat(CAST(l_partkey AS STRING), '#',
            |                        CAST(b AS STRING)) AS BINARY)),
            |        1 + 2 * i, 2), 16, 10) AS LONG) % 2L * 2L - 1L)))))"""
            .stripMargin)).as("s"))
        .groupBy(col("s.j")).agg(sum(col("s.x")).as("ctr"))
      val est = ctr
        .agg(graft.Fns.dsum18(col("ctr").cast("double") *
          col("ctr").cast("double")).as("sumsq"))
        .select((col("sumsq") / k).as("f2_est"))
      val bound = lit(4.0) * sqrt(lit(2.0) / k)
      exact.crossJoin(broadcast(est))
        .select(col("n_keys"), col("f2_exact"),
          (round(col("f2_est"), 6) + lit(0.0)).as("f2_est"),
          (round(abs(col("f2_est") - col("f2_exact").cast("double")) /
            col("f2_exact").cast("double"), 6) + lit(0.0)).as("rel_err"),
          (abs(col("f2_est") - col("f2_exact").cast("double")) <=
            bound * col("f2_exact").cast("double")).as("within_envelope"))
    },

    // DDSketch quantile contract (the q254/q275 sketch-contract recipe,
    // quantile member — the native mergeable [[graft.functions
    // .DdSketchAgg]] whose streaming twin is quantileStream): per
    // return flag, the sketch's rank-walk p50/p99 of the line price
    // must sit within the α = 1% relative-error guarantee of the EXACT
    // order statistic at the same rank ⌈q·n⌉ (Masson et al. 2019 —
    // every value in bucket i is within α of the bucket midpoint
    // 2γ^i/(γ+1), so the walk's answer is within α of the exact
    // rank-mate by construction; a bucketing or walk regression turns
    // the driver row red). The exact side uses the discrete-rank
    // convention in BOTH engines (row_number = ⌈q·n⌉), so the bound is
    // the theorem's, not loosened for interpolation mismatch. Scale
    // shape: the sketch side is ONE corpus aggregation to a ~500-entry
    // bucket map per flag (fixed at any N); the exact side (one flag-
    // keyed rank window) is the contract's measuring stick, exactly
    // like q192's exact twin riding beside the HLL path.
    "q287_ddsketch_quantiles" -> { (s, dir) =>
      val alpha = 0.01
      val gamma = (1 + alpha) / (1 - alpha)
      val logGamma = math.log(gamma)
      val li = Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("x"))
      // ONE corpus aggregation to the 3-row sketch frame, checkpointed:
      // the walk/count/verdict branches below are plan subtrees Spark
      // cannot share — without the checkpoint each of them re-runs the
      // corpus scan + sketch agg (first spelling measured 4 redundant
      // corpus passes and 3.0× at 10×)
      val sk = li.groupBy(col("l_returnflag"))
        .agg(graft.functions.DdSketchAgg.ddSketch(col("x"), alpha)
          .as("pairs"))
        .transform(graft.Checkpoints.ckpt)
      val buckets = sk.select(col("l_returnflag"),
          explode(expr("transform(sequence(0, size(pairs) div 2 - 1), " +
            "j -> struct(pairs[2*j] AS b, pairs[2*j+1] AS c))")).as("bc"))
        .select(col("l_returnflag"), col("bc.b").as("b"), col("bc.c").as("c"))
      val wc = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = buckets.withColumn("cum", sum(col("c")).over(wc))
      val n = buckets.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      // per (flag, quantile): the target rank r = ⌈q·n⌉, the bucket bq
      // where the walk's cumulative count crosses it, and the LOCAL rank
      // of the target inside that bucket — 6 rows
      val wWalk = Window.partitionBy(col("l_returnflag"), col("tag"))
        .orderBy(col("b"))
      val targets = cum.join(n, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("b"), col("c"), col("cum"),
          col("n"), explode(typedlit(Seq(("p50", 0.5), ("p99", 0.99))))
            .as("tq"))
        .select(col("*"), col("tq._1").as("tag"), col("tq._2").as("q"))
        .withColumn("r", greatest(lit(1L), ceil(col("q") * col("n"))))
        .filter(col("cum") >= col("r"))
        .withColumn("rk", row_number().over(wWalk))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("tag"), col("b").as("bq"),
          (col("r") - (col("cum") - col("c"))).as("local_r"))
        .transform(graft.Checkpoints.ckpt)
      val est = targets.groupBy(col("l_returnflag"))
        .agg(
          max(when(col("tag") === "p50", lit(2.0) *
            pow(lit(gamma), col("bq").cast("double")) / lit(gamma + 1)))
            .as("e50"),
          max(when(col("tag") === "p99", lit(2.0) *
            pow(lit(gamma), col("bq").cast("double")) / lit(gamma + 1)))
            .as("e99"))
      // the EXACT side, sketch-guided (the q220/q226 two-phase-rank
      // lesson applied through the sketch): a per-flag rank window
      // single-threads the whole corpus through 3 partitions (measured
      // ~6× at 10×) — instead the walk already names the one log-bucket
      // holding each target rank, the row-side bucket recompute is the
      // aggregate's own ⌈ln x / ln γ⌉ (identical doubles, same
      // Math.log), so the broadcast join keeps ONLY the target buckets'
      // rows (~α of the corpus) and the local rank window sorts those.
      // Valid while no collapse triggered (fixture buckets ≪ maxBuckets;
      // a collapsed sketch would mis-slot GUIDANCE, not the verdict
      // definition — the oracle states the rank selection, not the path)
      val bx = ceil(log(col("x")) / lit(logGamma)).cast("long")
      val wLoc = Window.partitionBy(col("l_returnflag"), col("tag"))
        .orderBy(col("x"))
      val ex = li.withColumn("bq", bx)
        .join(broadcast(targets), Seq("l_returnflag", "bq"))
        .withColumn("rn", row_number().over(wLoc))
        .filter(col("rn") === col("local_r"))
        .groupBy(col("l_returnflag"))
        .agg(max(when(col("tag") === "p50", col("x"))).as("p50_exact"),
          max(when(col("tag") === "p99", col("x"))).as("p99_exact"))
      n.join(ex, Seq("l_returnflag"))
        .join(est, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          col("p50_exact"), col("p99_exact"),
          (abs(col("e50") - col("p50_exact")) <=
            lit(alpha) * col("p50_exact") + lit(1e-9))
            .as("p50_within_alpha"),
          (abs(col("e99") - col("p99_exact")) <=
            lit(alpha) * col("p99_exact") + lit(1e-9))
            .as("p99_within_alpha"))
        .orderBy("l_returnflag")
    },

    // Bloom-filter-pruned semi-join — the 100 TB join-pruning lever
    // (runtime row-level filtering spelled explicitly): the build side's
    // keys hash (k=3, md5 rows) into an m=65536-position set that is
    // FIXED-SIZE regardless of build cardinality, broadcasts to every
    // executor, and prunes the probe side map-side BEFORE any shuffle —
    // three broadcast left-semi probes, zero exchanges until the final
    // 3-row rollup. The exact semi-join runs beside it to grade the
    // filter: a Bloom filter can never drop a true match (all k
    // positions of a build key are in the set by construction — the
    // no_false_neg verdict), and its false-positive rate among true
    // negatives must sit under the fill-factor envelope fill^k × 1.5,
    // SELF-CALIBRATING across scales (at sf1 the filter saturates and
    // the bound rises with it; sizing m ∝ n is the production knob this
    // fixed-m declaration documents). Oracle recomputes filter + truth.
    "q255_bloom_semijoin" -> { (s, dir) =>
      val M = 65536L
      def pos(key: org.apache.spark.sql.Column, i: Int) =
        conv(substring(md5(concat(key.cast("string"), lit("!" + i))
          .cast("binary")), 1, 6), 16, 10).cast("long") % M
      val build = Tables.t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val posSet = build.select(explode(array((0 until 3).map(i =>
        pos(col("o_orderkey"), i)): _*)).as("p")).distinct()
      val nPos = posSet.agg(count(lit(1)).as("n_pos"))
      // ONE probe pass: each position check is a broadcast left join
      // against the (distinct, so multiplicity-1) position set adding a
      // hit marker; the exact truth marker is a broadcast left join on
      // the build keys (unique — orders pk). All four joins are map-side;
      // candidacy, truth and the probe total then close in a single
      // 3-row rollup — the probe side is scanned ONCE. (At cluster scale
      // the truth join outgrows broadcast and AQE shuffles it — the
      // Bloom filter itself never does: its position set is ≤ m rows by
      // construction.)
      val marked = (0 until 3).foldLeft(
        Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"))) { (df, i) =>
        df.join(broadcast(posSet.select(col("p").as(s"p$i"))),
            pos(col("l_orderkey"), i) === col(s"p$i"), "left")
      }.join(broadcast(build.withColumn("hit", lit(1))),
          col("l_orderkey") === col("o_orderkey"), "left")
      val g = marked.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_probe"),
          sum(when(col("p0").isNotNull && col("p1").isNotNull &&
            col("p2").isNotNull, 1L).otherwise(0L)).as("n_cand"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_true"))
        .crossJoin(broadcast(nPos))
      val fill = col("n_pos").cast("double") / lit(M.toDouble)
      // q230/q235 convention: a flag whose probes are ALL true matches
      // has no true negatives to rate — NULL, never 0/0
      val fpRate = when(col("n_probe") > col("n_true"),
        (col("n_cand") - col("n_true")).cast("double") /
          (col("n_probe") - col("n_true")).cast("double"))
      g.select(col("l_returnflag"), col("n_probe"), col("n_cand"),
          col("n_true"), (col("n_cand") - col("n_true")).as("n_false_pos"),
          (round(fpRate, 6) + lit(0.0)).as("fp_rate"),
          (col("n_cand") >= col("n_true")).as("no_false_neg"),
          coalesce(fpRate <= fill * fill * fill * lit(1.5), lit(true))
            .as("fp_within_bound"))
        .orderBy("l_returnflag")
    })

  override def oracles: Map[String, String] = Map(
    "q118_correlated_sub" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(38,6)))
        |           AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q113_spend_gini" ->
      s"""WITH spend AS (
         |  SELECT c_nationkey, c_custkey, ${dsumSql("o_totalprice")} AS x
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
         |    ORDER BY x ASC, c_custkey ASC) AS i
         |  FROM spend)
         |SELECT c_nationkey, COUNT(*) AS n_customers,
         |  2.0 * CAST(SUM(CAST(CAST(i AS DOUBLE) * x AS DECIMAL(38,18)))
         |        AS DOUBLE)
         |    / (CAST(COUNT(*) AS DOUBLE) * ${dsumSql("x")})
         |  - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS gini
         |FROM r GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q104_winsorize" ->
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |    ROUND(QUANTILE_CONT(l_extendedprice, 0.05), 4) AS lo,
         |    ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS hi
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  MAX(lo) AS p05, MAX(hi) AS p95,
         |  COUNT(CASE WHEN l_extendedprice < lo THEN 1 END) AS n_low,
         |  COUNT(CASE WHEN l_extendedprice > hi THEN 1 END) AS n_high,
         |  COUNT(*) AS n,
         |  ${dsumSql("LEAST(GREATEST(l_extendedprice, lo), hi)")}
         |    AS sum_winsorized
         |FROM lineitem JOIN b USING (l_returnflag)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q76_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
         |  COALESCE(l_linestatus, '(all)') AS linestatus,
         |  COUNT(*) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY returnflag, linestatus""".stripMargin,

    // the final double expression trees mirror the Spark side token for
    // token — identical exact-decimal inputs + identical IEEE ops =
    // identical bits
    "q77_stat_aggs" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    COUNT(*) AS n_rows,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${dsumSql("l_quantity")} AS sx,
         |    ${dsumSql("l_quantity * l_quantity")} AS sx2,
         |    ${dsumSql("l_extendedprice")} AS sy,
         |    ${dsumSql("l_extendedprice * l_extendedprice")} AS sy2,
         |    ${dsumSql("l_quantity * l_extendedprice")} AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n_rows,
         |  ((sx2 - sx * sx / n) / (n - 1)) AS var_qty,
         |  SQRT(((sx2 - sx * sx / n) / (n - 1))) AS stddev_qty,
         |  ((sxy - sx * sy / n) / (n - 1)) AS covar_qty_price,
         |  ((n * sxy - sx * sy) /
         |    (SQRT(n * sx2 - sx * sx) * SQRT(n * sy2 - sy * sy)))
         |    AS corr_qty_price
         |FROM a ORDER BY l_returnflag""".stripMargin,

    // argmax restated as a window rank (any SQL shape is fine for the
    // oracle; the Spark side is the one-pass max_by)
    "q80_argmax_agg" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
        |  FROM orders),
        |agg AS (
        |  SELECT o_orderpriority,
        |    MAX(o_totalprice) AS top_price,
        |    COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT agg.o_orderpriority,
        |  mx.o_orderkey AS top_order,
        |  mn.o_orderkey AS bottom_order,
        |  agg.top_price, agg.n_big, agg.n_orders
        |FROM agg
        |JOIN r mx ON mx.o_orderpriority = agg.o_orderpriority
        |  AND mx.rn_max = 1
        |JOIN r mn ON mn.o_orderpriority = agg.o_orderpriority
        |  AND mn.rn_min = 1
        |ORDER BY agg.o_orderpriority""".stripMargin,

    "q81_unpivot" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    ${dsumSql("l_quantity")} AS sum_qty,
         |    ${dsumSql("l_extendedprice")} AS sum_price,
         |    ${dsumSql("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
         |UNION ALL
         |SELECT l_returnflag, 'sum_price', sum_price FROM a
         |UNION ALL
         |SELECT l_returnflag, 'sum_disc', sum_disc FROM a
         |ORDER BY l_returnflag, measure""".stripMargin,

    "q82_nullsafe_join" ->
      """WITH a AS (
        |  SELECT NULLIF(event_type, 'click') AS k, COUNT(*) AS n_a
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT NULLIF(event_type, 'click') AS k, COUNT(*) AS n_b
        |  FROM events WHERE value > 0.5 GROUP BY 1)
        |SELECT COALESCE(a.k, '(null)') AS k, a.n_a, b.n_b
        |FROM a LEFT JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k""".stripMargin,

    "q10_join_agg" ->
      s"""SELECT c_mktsegment,
         |  COUNT(DISTINCT o_orderkey) AS n_orders,
         |  COUNT(*) AS n_items,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q11_join_star" ->
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q12_join_left" ->
      s"""SELECT o_orderkey,
         |  COUNT(l_orderkey) AS n_big_items,
         |  COALESCE(${dsumSql("l_quantity")}, 0.0) AS big_qty
         |FROM orders
         |LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 40) li
         |  ON o_orderkey = li.l_orderkey
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q59_join_right" ->
      s"""SELECT o_orderkey,
         |  COUNT(li.l_orderkey) AS n_big_items,
         |  COALESCE(${dsumSql("li.l_quantity")}, 0.0) AS big_qty
         |FROM (SELECT * FROM lineitem WHERE l_quantity > 30) li
         |RIGHT JOIN orders ON li.l_orderkey = o_orderkey
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q60_join_full" ->
      """WITH old AS (
        |  SELECT event_id, value AS old_value FROM events
        |  WHERE event_id % 3 <> 0),
        |neu AS (
        |  SELECT event_id, value * 2 AS new_value FROM events
        |  WHERE event_id % 2 = 0)
        |SELECT COALESCE(old.event_id, neu.event_id) AS event_id,
        |  COALESCE(new_value, old_value) AS value,
        |  CASE WHEN new_value IS NOT NULL AND old_value IS NOT NULL
        |         THEN 'updated'
        |       WHEN new_value IS NOT NULL THEN 'inserted'
        |       ELSE 'kept' END AS merge_action
        |FROM old FULL OUTER JOIN neu ON old.event_id = neu.event_id
        |ORDER BY event_id""".stripMargin,

    "q62_intersect_all" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY custkey""".stripMargin,

    "q13_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q15_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, MAX(s.ts) AS last_signup_ts
        |FROM events p
        |LEFT JOIN events s
        |  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q48_range_join" ->
      """SELECT e.event_id,
        |  CAST(COUNT(c.user_id) AS BIGINT) AS n_clicks_10m
        |FROM events e
        |LEFT JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        | AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTE
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    "q16_agg_distinct" ->
      s"""SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders,
        |  ${Fns.davgSql("o_totalprice")} AS avg_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q17_rollup" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
         |  COALESCE(l_linestatus, '(all)') AS linestatus,
         |  COUNT(*) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q18_window_rank" ->
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        |    CAST(RANK()       OVER w AS INTEGER) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC))
        |SELECT * FROM ranked WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q74_window_dist" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,

    "q19_window_running" ->
      """SELECT event_id, user_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS running_value,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
        |FROM events ORDER BY event_id""".stripMargin,

    "q20_window_lag" ->
      """SELECT event_id, user_id, value,
        |  LAG(value, 1)  OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q21_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q43_cube" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
         |  COALESCE(l_linestatus, '(all)') AS linestatus,
         |  COUNT(*) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,

    // exact-twin accuracy contracts (the q192 pattern): the oracle
    // computes the exact side and asserts the in-bound verdicts TRUE;
    // the engine-specific estimates never reach the hashed columns
    "q44_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q63_approx_percentiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS median_qty_in_band,
        |  TRUE AS p90_price_in_band,
        |  TRUE AS p25_disc_in_band
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q56_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS median_qty,
        |  ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price,
        |  ROUND(QUANTILE_CONT(l_discount, 0.25), 4) AS p25_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q45_setops_all" ->
      """SELECT custkey FROM (
        |  SELECT custkey FROM (
        |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |    UNION ALL
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY custkey""".stripMargin,

    "q22_set_ops" ->
      """SELECT custkey FROM (
        |  SELECT custkey FROM (
        |    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |    UNION
        |    SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |  INTERSECT
        |  SELECT o_custkey FROM orders)
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    // deliberately the UNSALTED join: the salt must be invisible in the
    // result, and the hash compare proves it
    "q146_salted_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  ${Fns.dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q159_rfm_segments" ->
      s"""WITH c AS (
         |  SELECT o_custkey,
         |    CAST(DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
         |      DATE '2001-09-01') AS BIGINT) AS recency_days,
         |    COUNT(*) AS frequency,
         |    ${Fns.dsumSql("o_totalprice")} AS monetary
         |  FROM orders GROUP BY 1),
         |t AS (
         |  SELECT
         |    QUANTILE_CONT(recency_days, 0.2) AS rt1,
         |    QUANTILE_CONT(recency_days, 0.4) AS rt2,
         |    QUANTILE_CONT(recency_days, 0.6) AS rt3,
         |    QUANTILE_CONT(recency_days, 0.8) AS rt4,
         |    QUANTILE_CONT(frequency, 0.2) AS ft1,
         |    QUANTILE_CONT(frequency, 0.4) AS ft2,
         |    QUANTILE_CONT(frequency, 0.6) AS ft3,
         |    QUANTILE_CONT(frequency, 0.8) AS ft4,
         |    QUANTILE_CONT(monetary, 0.2) AS mt1,
         |    QUANTILE_CONT(monetary, 0.4) AS mt2,
         |    QUANTILE_CONT(monetary, 0.6) AS mt3,
         |    QUANTILE_CONT(monetary, 0.8) AS mt4
         |  FROM c),
         |s AS (
         |  SELECT c.o_custkey, c.recency_days, c.frequency, c.monetary,
         |    6 - (1 + CAST(CAST(recency_days AS DOUBLE) >= rt1 AS INT)
         |           + CAST(CAST(recency_days AS DOUBLE) >= rt2 AS INT)
         |           + CAST(CAST(recency_days AS DOUBLE) >= rt3 AS INT)
         |           + CAST(CAST(recency_days AS DOUBLE) >= rt4 AS INT))
         |      AS r_score,
         |    1 + CAST(CAST(frequency AS DOUBLE) >= ft1 AS INT)
         |      + CAST(CAST(frequency AS DOUBLE) >= ft2 AS INT)
         |      + CAST(CAST(frequency AS DOUBLE) >= ft3 AS INT)
         |      + CAST(CAST(frequency AS DOUBLE) >= ft4 AS INT) AS f_score,
         |    1 + CAST(monetary >= mt1 AS INT) + CAST(monetary >= mt2 AS INT)
         |      + CAST(monetary >= mt3 AS INT) + CAST(monetary >= mt4 AS INT)
         |      AS m_score
         |  FROM c CROSS JOIN t)
         |SELECT o_custkey, recency_days, frequency, monetary,
         |  r_score, f_score, m_score,
         |  'R' || r_score || 'F' || f_score || 'M' || m_score AS segment
         |FROM s ORDER BY o_custkey""".stripMargin,

    "q187_ri_audit" -> {
      def rel(name: String, child: String, ck: String, parent: String,
              pk2: String): String =
        s"""SELECT '$name' AS relationship,
           |  (SELECT COUNT(*) FROM $child) AS n_rows,
           |  (SELECT COUNT(*) FROM $child c WHERE NOT EXISTS
           |    (SELECT 1 FROM $parent p WHERE p.$pk2 = c.$ck))
           |    AS n_orphans,
           |  CAST((SELECT COUNT(*) FROM $child c WHERE NOT EXISTS
           |    (SELECT 1 FROM $parent p WHERE p.$pk2 = c.$ck)) AS DOUBLE)
           |    / CAST((SELECT COUNT(*) FROM $child) AS DOUBLE)
           |    AS orphan_rate""".stripMargin
      Seq(
        rel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        rel("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        rel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        rel("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        rel("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
    },

    "q188_fd_audit" -> {
      def fd(name: String, table: String, a: String, b: String): String =
        s"""SELECT '$name' AS dependency, COUNT(*) AS n_groups,
           |  CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
           |    AS holds,
           |  CAST(MAX(nb) AS BIGINT) AS max_fanout
           |FROM (SELECT $a, COUNT(DISTINCT $b) AS nb
           |      FROM $table GROUP BY 1)""".stripMargin
      Seq(
        fd("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        fd("c_custkey->c_nationkey", "customer", "c_custkey",
          "c_nationkey"),
        fd("o_custkey->o_orderstatus", "orders", "o_custkey",
          "o_orderstatus"),
        fd("l_orderkey->l_suppkey", "lineitem", "l_orderkey",
          "l_suppkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY dependency")
    },

    "q189_column_profile" -> {
      def prof(c: String): String =
        s"""SELECT '$c' AS column_name,
           |  (SELECT CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) FROM orders) AS n_nulls,
           |  (SELECT COUNT(DISTINCT $c) FROM orders) AS n_distinct,
           |  (SELECT CAST(MIN($c) AS VARCHAR) FROM orders) AS min_value,
           |  (SELECT CAST(MAX($c) AS VARCHAR) FROM orders) AS max_value,
           |  t.v AS top_value, t.f AS top_freq
           |FROM (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS f
           |      FROM orders WHERE $c IS NOT NULL GROUP BY 1
           |      ORDER BY f DESC, v ASC LIMIT 1) t""".stripMargin
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
        .map(prof).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "q193_asof_join" ->
      """WITH tl AS (
        |  SELECT user_id, EPOCH_US(ts) AS us, event_id AS id, 1 AS kind
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT o_custkey, EPOCH_US(o_orderdate), o_orderkey, 0
        |  FROM orders),
        |c AS (
        |  SELECT user_id, us, id, kind,
        |    LAST_VALUE(CASE WHEN kind = 0
        |        THEN {'oid': id, 'ous': us} END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY us, kind, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS o
        |  FROM tl)
        |SELECT id AS event_id, user_id, us AS event_us,
        |  o.oid AS order_id, o.ous AS order_us,
        |  (us - o.ous) // 1000000 AS age_s
        |FROM c WHERE kind = 1 ORDER BY event_id""".stripMargin,

    "q194_scd2_build" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus,
        |    EPOCH_US(o_orderdate) AS us
        |  FROM orders),
        |m AS (
        |  SELECT *,
        |    CASE WHEN LAG(o_orderstatus) OVER w IS NULL
        |           OR LAG(o_orderstatus) OVER w <> o_orderstatus
        |         THEN 1 ELSE 0 END AS chg
        |  FROM o
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY us, o_orderkey)),
        |g AS (
        |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
        |    ORDER BY us, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS grp
        |  FROM m),
        |runs AS (
        |  SELECT o_custkey, grp, MIN(us) AS valid_from_us,
        |    MAX(o_orderstatus) AS status, COUNT(*) AS n_orders
        |  FROM g GROUP BY 1, 2)
        |SELECT o_custkey, grp AS version, status, valid_from_us,
        |  LEAD(valid_from_us) OVER (PARTITION BY o_custkey ORDER BY grp)
        |    AS valid_to_us,
        |  n_orders
        |FROM runs ORDER BY o_custkey, version""".stripMargin,

    "q195_assoc_rules" ->
      """WITH basket AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM basket),
        |icnt AS (SELECT item, COUNT(*) AS c FROM basket GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS c_pair
        |  FROM basket a JOIN basket b
        |    ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 50)
        |SELECT item_a, item_b, c_pair,
        |  ROUND(CAST(c_pair AS DOUBLE) / CAST(n_orders AS DOUBLE), 10)
        |    + 0.0 AS support,
        |  ROUND(CAST(c_pair AS DOUBLE) / CAST(ca.c AS DOUBLE), 10)
        |    + 0.0 AS conf_a_b,
        |  ROUND(CAST(c_pair AS DOUBLE) / CAST(cb.c AS DOUBLE), 10)
        |    + 0.0 AS conf_b_a,
        |  ROUND(CAST(c_pair * n_orders AS DOUBLE)
        |    / CAST(ca.c * cb.c AS DOUBLE), 10) + 0.0 AS lift
        |FROM pairs
        |JOIN icnt ca ON ca.item = pairs.item_a
        |JOIN icnt cb ON cb.item = pairs.item_b
        |CROSS JOIN n
        |ORDER BY item_a, item_b""".stripMargin,

    "q199_benford" ->
      """WITH d AS (
        |  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM g),
        |e AS (
        |  SELECT digit, n, n_total,
        |    CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
        |    LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0)
        |      AS benford_share
        |  FROM g CROSS JOIN t),
        |c AS (
        |  SELECT *,
        |    (CAST(n AS DOUBLE) - benford_share * CAST(n_total AS DOUBLE))
        |    * (CAST(n AS DOUBLE) - benford_share * CAST(n_total AS DOUBLE))
        |    / (benford_share * CAST(n_total AS DOUBLE)) AS chi2_term
        |  FROM e)
        |SELECT digit, n, ROUND(share, 10) + 0.0 AS share,
        |  ROUND(benford_share, 10) + 0.0 AS benford_share,
        |  ROUND(CAST(CAST(SUM(CAST(chi2_term AS DECIMAL(38,15)))
        |      OVER () AS DECIMAL(38,15)) AS DOUBLE), 6) + 0.0 AS chi2
        |FROM c ORDER BY digit""".stripMargin,

    "q200_name_linkage" ->
      """WITH nm AS (
        |  SELECT p_name AS name, COUNT(*) AS n_parts,
        |    SUBSTR(p_name, 1, 1) AS blk
        |  FROM part GROUP BY 1),
        |l AS (
        |  SELECT name, n_parts,
        |    LEAD(name, 1) OVER w AS nb1, LEAD(n_parts, 1) OVER w AS nn1,
        |    LEAD(name, 2) OVER w AS nb2, LEAD(n_parts, 2) OVER w AS nn2,
        |    LEAD(name, 3) OVER w AS nb3, LEAD(n_parts, 3) OVER w AS nn3,
        |    LEAD(name, 4) OVER w AS nb4, LEAD(n_parts, 4) OVER w AS nn4
        |  FROM nm WINDOW w AS (PARTITION BY blk ORDER BY name)),
        |u AS (
        |  SELECT name AS name_a, n_parts AS n_parts_a,
        |    nb1 AS name_b, nn1 AS n_parts_b FROM l
        |  UNION ALL SELECT name, n_parts, nb2, nn2 FROM l
        |  UNION ALL SELECT name, n_parts, nb3, nn3 FROM l
        |  UNION ALL SELECT name, n_parts, nb4, nn4 FROM l)
        |SELECT name_a, name_b, n_parts_a, n_parts_b,
        |  CAST(LEVENSHTEIN(name_a, name_b) AS INTEGER) AS dist
        |FROM u
        |WHERE name_b IS NOT NULL AND LEVENSHTEIN(name_a, name_b) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    // q200's blocked-lead structure, DuckDB's own JW as the scorer —
    // the engine expression is semantics-identical, so the threshold
    // cut and the rounded scores match exactly
    "q278_jaro_winkler_linkage" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |l AS (
        |  SELECT name,
        |    LEAD(name, 1) OVER w AS n1, LEAD(name, 2) OVER w AS n2,
        |    LEAD(name, 3) OVER w AS n3, LEAD(name, 4) OVER w AS n4
        |  FROM names
        |  WINDOW w AS (PARTITION BY SUBSTR(name, 1, 1) ORDER BY name)),
        |u AS (
        |  SELECT name AS name_a, n1 AS name_b FROM l
        |  UNION ALL SELECT name, n2 FROM l
        |  UNION ALL SELECT name, n3 FROM l
        |  UNION ALL SELECT name, n4 FROM l),
        |s AS (
        |  SELECT name_a, name_b,
        |    JARO_WINKLER_SIMILARITY(name_a, name_b) AS jw
        |  FROM u WHERE name_b IS NOT NULL)
        |SELECT name_a, name_b, ROUND(jw, 6) + 0.0 AS jw
        |FROM s WHERE jw >= 0.85
        |ORDER BY name_a, name_b""".stripMargin,

    // the same blocking, pattern and fixed-order weight sum; ln's of
    // literal-double ratios are engine-computed in both (the q214 LN
    // bit-compat), so the thresholds cut identical doubles
    "q296_fellegi_sunter" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part),
        |l AS (
        |  SELECT p_partkey, p_name, p_brand, p_type, p_size, i,
        |    LEAD(p_partkey, i) OVER w AS k, LEAD(p_name, i) OVER w AS nm,
        |    LEAD(p_brand, i) OVER w AS br, LEAD(p_type, i) OVER w AS ty,
        |    LEAD(p_size, i) OVER w AS sz
        |  FROM p, UNNEST([1, 2, 3, 4]) AS u(i)
        |  WINDOW w AS (PARTITION BY SUBSTR(p_name, 1, 1), i
        |               ORDER BY p_name, p_partkey)),
        |s AS (
        |  SELECT p_partkey AS key_a, k AS key_b,
        |    (CASE WHEN JARO_WINKLER_SIMILARITY(p_name, nm) >= 0.9
        |          THEN 'N' ELSE '-' END)
        |    || (CASE WHEN p_brand = br THEN 'B' ELSE '-' END)
        |    || (CASE WHEN p_type = ty THEN 'T' ELSE '-' END)
        |    || (CASE WHEN p_size = sz THEN 'S' ELSE '-' END) AS pattern,
        |    (CASE WHEN JARO_WINKLER_SIMILARITY(p_name, nm) >= 0.9
        |          THEN LN(CAST(0.9 AS DOUBLE) / CAST(0.5 AS DOUBLE))
        |          ELSE LN((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
        |                / (CAST(1.0 AS DOUBLE) - CAST(0.5 AS DOUBLE)))
        |     END)
        |    + (CASE WHEN p_brand = br
        |            THEN LN(CAST(0.9 AS DOUBLE) / CAST(0.04 AS DOUBLE))
        |            ELSE LN((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
        |                  / (CAST(1.0 AS DOUBLE) - CAST(0.04 AS DOUBLE)))
        |       END)
        |    + (CASE WHEN p_type = ty
        |            THEN LN(CAST(0.8 AS DOUBLE) / CAST(0.16 AS DOUBLE))
        |            ELSE LN((CAST(1.0 AS DOUBLE) - CAST(0.8 AS DOUBLE))
        |                  / (CAST(1.0 AS DOUBLE) - CAST(0.16 AS DOUBLE)))
        |       END)
        |    + (CASE WHEN p_size = sz
        |            THEN LN(CAST(0.8 AS DOUBLE) / CAST(0.02 AS DOUBLE))
        |            ELSE LN((CAST(1.0 AS DOUBLE) - CAST(0.8 AS DOUBLE))
        |                  / (CAST(1.0 AS DOUBLE) - CAST(0.02 AS DOUBLE)))
        |       END) AS weight
        |  FROM l WHERE k IS NOT NULL)
        |SELECT key_a, key_b, pattern,
        |  ROUND(weight, 6) + 0.0 AS weight,
        |  CASE WHEN weight >= 3.5 THEN 'match' ELSE 'possible' END
        |    AS verdict
        |FROM s WHERE weight >= 0.5
        |ORDER BY key_a, key_b""".stripMargin,

    "q204_target_encoding" -> (
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice, c_mktsegment
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (
        |  SELECT c_mktsegment,
        |    """.stripMargin + dsumSql("o_totalprice") + """ AS seg_sum,
        |    COUNT(*) AS seg_n
        |  FROM o GROUP BY 1 HAVING COUNT(*) > 1)
        |SELECT o.o_orderkey, o.c_mktsegment AS segment, o.o_totalprice,
        |  ROUND((g.seg_sum - o.o_totalprice)
        |    / CAST(g.seg_n - 1 AS DOUBLE), 6) + 0.0 AS loo_mean
        |FROM o JOIN g ON o.c_mktsegment = g.c_mktsegment
        |ORDER BY o_orderkey""".stripMargin),

    "q207_topk_agg" ->
      """WITH o AS (
        |  SELECT c_mktsegment AS segment, o_totalprice, o_orderkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT segment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY segment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM o)
        |SELECT segment, CAST(rank AS INTEGER) AS rank, o_orderkey,
        |  o_totalprice
        |FROM r WHERE rank <= 5 ORDER BY segment, rank""".stripMargin,

    "q208_decile_lift" ->
      """WITH resp AS (
        |  SELECT c.c_custkey, c.c_acctbal,
        |    CASE WHEN r.o_custkey IS NULL THEN 0 ELSE 1 END AS responded
        |  FROM customer c LEFT JOIN (
        |    SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_totalprice > 450000.0) r
        |    ON c.c_custkey = r.o_custkey),
        |n AS (SELECT COUNT(*) AS n_total FROM resp),
        |rk AS (
        |  SELECT c_custkey, responded,
        |    ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
        |      AS rn
        |  FROM resp),
        |dd AS (
        |  SELECT responded,
        |    ((rn - 1) * 10) // n_total + 1 AS decile, n_total
        |  FROM rk CROSS JOIN n),
        |g AS (
        |  SELECT decile, COUNT(*) AS n_cust,
        |    CAST(SUM(responded) AS BIGINT) AS n_resp,
        |    MAX(n_total) AS n_total
        |  FROM dd GROUP BY 1),
        |w AS (
        |  SELECT *,
        |    CAST(SUM(n_resp) OVER () AS BIGINT) AS resp_total,
        |    CAST(SUM(n_resp) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_resp
        |  FROM g)
        |SELECT decile, n_cust, n_resp,
        |  ROUND(CAST(n_resp AS DOUBLE) / CAST(n_cust AS DOUBLE), 10)
        |    + 0.0 AS resp_rate,
        |  ROUND(CAST(n_resp * n_total AS DOUBLE)
        |    / CAST(n_cust * resp_total AS DOUBLE), 10) + 0.0 AS lift,
        |  ROUND(CAST(cum_resp AS DOUBLE) / CAST(resp_total AS DOUBLE),
        |    10) + 0.0 AS cum_gain
        |FROM w ORDER BY decile""".stripMargin,

    "q211_skew_audit" ->
      """WITH c AS (
        |  SELECT l_suppkey AS key, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |w AS (
        |  SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS total,
        |    COUNT(*) OVER () AS n_keys,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rk
        |  FROM c)
        |SELECT CAST(rk AS INTEGER) AS rank, key, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 10) + 0.0
        |    AS share,
        |  ROUND(CAST(n * n_keys AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |    + 0.0 AS skew_factor
        |FROM w WHERE rk <= 10 ORDER BY rank""".stripMargin,

    "q220_abc_pareto" -> (
      """WITH rev AS (
        |  SELECT l_partkey AS partkey,
        |    """.stripMargin + dsumSql("l_extendedprice") + """ AS revenue
        |  FROM lineitem GROUP BY 1),
        |t AS (
        |  SELECT """.stripMargin + dsumSql("revenue") + """ AS total_rev
        |  FROM rev),
        |r AS (
        |  SELECT partkey, revenue,
        |    ROW_NUMBER() OVER (ORDER BY revenue DESC, partkey) AS rank,
        |    CAST(SUM(CAST(revenue AS DECIMAL(38,6)))
        |      OVER (ORDER BY revenue DESC, partkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS cum_rev
        |  FROM rev)
        |SELECT partkey, revenue, CAST(rank AS BIGINT) AS rank,
        |  ROUND(cum_rev / total_rev, 10) + 0.0 AS cum_share,
        |  CASE WHEN cum_rev <= total_rev * 0.80 THEN 'A'
        |       WHEN cum_rev <= total_rev * 0.95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM r CROSS JOIN t ORDER BY rank""".stripMargin),

    "q215_pit_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust, o_orderkey,
        |    o_orderstatus AS status, EPOCH_US(o_orderdate) AS us
        |  FROM orders),
        |m AS (
        |  SELECT *, CASE WHEN LAG(status) OVER w IS NULL
        |      OR LAG(status) OVER w <> status THEN 1 ELSE 0 END AS chg
        |  FROM o WINDOW w AS (PARTITION BY cust ORDER BY us, o_orderkey)),
        |g AS (
        |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY cust
        |    ORDER BY us, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS version
        |  FROM m),
        |v AS (
        |  SELECT cust, us AS valid_from, status, version,
        |    LEAD(us) OVER (PARTITION BY cust ORDER BY version)
        |      AS valid_to
        |  FROM g WHERE chg = 1),
        |e AS (
        |  SELECT event_id, user_id, EPOCH_US(ts) AS eus FROM events
        |  WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.eus AS event_us,
        |  v.version, v.status AS status_at_event,
        |  v.valid_from AS since_us
        |FROM e LEFT JOIN v
        |  ON v.cust = e.user_id AND v.valid_from <= e.eus
        |  AND (v.valid_to IS NULL OR e.eus < v.valid_to)
        |ORDER BY event_id""".stripMargin,

    // RANGE cumulative frame in both engines: tied values share cw, so
    // the crossing value is deterministic; crossings are exact-integer
    "q226_weighted_percentile" ->
      """WITH c AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag ORDER BY l_extendedprice
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag) AS tw
        |  FROM lineitem)
        |SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_w,
        |  MIN(CASE WHEN cw * 2 >= tw THEN v END) AS wmedian,
        |  MIN(CASE WHEN cw * 10 >= tw * 9 THEN v END) AS wp90
        |FROM c GROUP BY flag ORDER BY flag""".stripMargin,

    "q229_candidate_keys" ->
      """SELECT 'o_orderkey' AS candidate, COUNT(*) AS n_rows,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderkey FROM orders))
        |    AS n_distinct,
        |  CASE WHEN (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_orderkey FROM orders)) = COUNT(*)
        |    THEN 1 ELSE 0 END AS is_key
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', COUNT(*),
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders)),
        |  CASE WHEN (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_custkey FROM orders)) = COUNT(*)
        |    THEN 1 ELSE 0 END
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', COUNT(*),
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderdate FROM orders)),
        |  CASE WHEN (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_orderdate FROM orders)) = COUNT(*)
        |    THEN 1 ELSE 0 END
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey,o_orderdate', COUNT(*),
        |  (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_custkey, o_orderdate FROM orders)),
        |  CASE WHEN (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_custkey, o_orderdate FROM orders))
        |    = COUNT(*) THEN 1 ELSE 0 END
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority,o_orderdate', COUNT(*),
        |  (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_orderpriority, o_orderdate FROM orders)),
        |  CASE WHEN (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT o_orderpriority, o_orderdate FROM orders))
        |    = COUNT(*) THEN 1 ELSE 0 END
        |FROM orders
        |ORDER BY candidate""".stripMargin,

    "q232_grouped_ols" -> (
      """WITH d AS (
        |  SELECT p_brand AS brand,
        |    CAST(l_quantity AS BIGINT) AS x, l_extendedprice AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (
        |  SELECT brand, COUNT(*) AS n,
        |    SUM(x) AS sx,
        |    """.stripMargin + dsum18Sql("y") + """ AS sy,
        |    """.stripMargin +
        dsum18Sql("CAST(x AS DOUBLE) * y") + """ AS sxy,
        |    SUM(x * x) AS sxx,
        |    """.stripMargin + dsum18Sql("y * y") + """ AS syy
        |  FROM d GROUP BY 1),
        |v AS (
        |  SELECT brand, n,
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS vy,
        |    CAST(sx AS DOUBLE) AS sxd, sy
        |  FROM m)
        |SELECT brand, n,
        |  CASE WHEN vx > 0 THEN ROUND(num / vx, 6) + 0.0 END AS slope,
        |  CASE WHEN vx > 0 THEN ROUND((sy - (num / vx) * sxd)
        |    / CAST(n AS DOUBLE), 6) + 0.0 END AS intercept,
        |  CASE WHEN vx > 0 AND vy > 0
        |    THEN ROUND(num * num / (vx * vy), 6) + 0.0 END AS r2
        |FROM v ORDER BY brand""".stripMargin),

    "q233_trimmed_mean" -> (
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS tn
        |  FROM lineitem),
        |k AS (
        |  SELECT flag, v FROM r
        |  WHERE rn > tn * 5 // 100 AND rn <= tn - tn * 5 // 100)
        |SELECT flag, COUNT(*) AS n_kept,
        |  ROUND(""".stripMargin + dsumSql("v") +
        """ / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS trimmed_mean
        |FROM k GROUP BY flag ORDER BY flag""".stripMargin),

    "q236_interval_coalesce" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS supp,
        |    EPOCH_US(l_shipdate) // 86400000000 AS s,
        |    EPOCH_US(l_shipdate) // 86400000000
        |      + CAST(l_quantity AS BIGINT) // 5 + 1 AS e,
        |    l_orderkey AS ok, l_linenumber AS ln
        |  FROM lineitem),
        |mk AS (
        |  SELECT supp, s, e, ok, ln,
        |    MAX(e) OVER (PARTITION BY supp ORDER BY s, e, ok, ln
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |fl AS (
        |  SELECT supp, s, e, ok, ln,
        |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw
        |  FROM mk),
        |isl AS (
        |  SELECT supp, s, e,
        |    CAST(SUM(nw) OVER (PARTITION BY supp ORDER BY s, e, ok, ln
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS isl
        |  FROM fl),
        |g AS (
        |  SELECT supp, isl, COUNT(*) AS nraw, MIN(s) AS is_, MAX(e) AS ie
        |  FROM isl GROUP BY 1, 2)
        |SELECT supp, CAST(SUM(nraw) AS BIGINT) AS n_raw,
        |  COUNT(*) AS n_merged,
        |  CAST(SUM(ie - is_ + 1) AS BIGINT) AS covered_days,
        |  MAX(ie - is_ + 1) AS max_span_days
        |FROM g GROUP BY supp ORDER BY supp""".stripMargin,

    "q241_equidepth_histogram" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS v,
        |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS rn,
        |    COUNT(*) OVER () AS tn
        |  FROM lineitem)
        |SELECT CAST((rn - 1) * 16 // tn + 1 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,

    // the Wilson bound spelled with the Spark plan's exact operation
    // order (left-assoc products, same sqrt argument shape) so both
    // engines produce bit-identical doubles before the 6-digit round
    "q247_wilson_ranking" ->
      """WITH g AS (
        |  SELECT l_partkey, COUNT(*) AS n_items,
        |    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_kept
        |  FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 5),
        |w AS (
        |  SELECT l_partkey, n_items, n_kept,
        |    (p + z2 / (2.0 * n) -
        |      1.96 * SQRT(p * (1.0 - p) / n + z2 / (4.0 * n * n)))
        |      / (1.0 + z2 / n) AS w
        |  FROM (
        |    SELECT l_partkey, n_items, n_kept,
        |      CAST(n_items AS DOUBLE) AS n,
        |      CAST(n_kept AS DOUBLE) / CAST(n_items AS DOUBLE) AS p,
        |      1.96 * 1.96 AS z2
        |    FROM g)),
        |r AS (
        |  SELECT l_partkey, n_items, n_kept, w,
        |    ROW_NUMBER() OVER (ORDER BY w DESC, l_partkey) AS rnk
        |  FROM w)
        |SELECT CAST(rnk AS INTEGER) AS rnk, l_partkey, n_items, n_kept,
        |  ROUND(w, 6) + 0.0 AS wilson_lb
        |FROM r WHERE rnk <= 25 ORDER BY rnk""".stripMargin,

    // same md5-derived buckets, same sketch sums, same min-over-rows
    // estimate, same 4N/w envelope — bit-identical integers throughout
    "q254_cms_heavy_hitters" ->
      """WITH exact_t AS (
        |  SELECT l_partkey, COUNT(*) AS exact_n FROM lineitem GROUP BY 1),
        |hb AS (
        |  SELECT l_partkey, exact_n, i,
        |    CAST(('0x' || SUBSTRING(MD5(CAST(l_partkey AS VARCHAR) ||
        |      '#' || CAST(i AS VARCHAR)), 1, 5)) AS BIGINT) % 1024 AS b
        |  FROM exact_t, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS i)),
        |sk AS (
        |  SELECT i, b, CAST(SUM(exact_n) AS BIGINT) AS bn
        |  FROM hb GROUP BY 1, 2),
        |est AS (
        |  SELECT hb.l_partkey, hb.exact_n, MIN(sk.bn) AS cms_est
        |  FROM hb JOIN sk ON sk.i = hb.i AND sk.b = hb.b
        |  GROUP BY 1, 2),
        |tot AS (SELECT COUNT(*) AS n_tot FROM lineitem)
        |SELECT l_partkey, exact_n, cms_est,
        |  cms_est - exact_n AS overcount,
        |  cms_est >= exact_n AS never_under,
        |  (cms_est - exact_n) * 1024 <= 4 * n_tot AS within_markov
        |FROM est, tot
        |ORDER BY exact_n DESC, l_partkey LIMIT 20""".stripMargin,

    // identical sketch recomputed from exact per-key counts; exact join
    // size from the count tables' equi-join — the row join never runs
    "q275_cms_join_size" ->
      """WITH fa AS (
        |  SELECT user_id AS k, COUNT(*) AS f FROM events GROUP BY 1),
        |fb AS (
        |  SELECT o_custkey AS k, COUNT(*) AS f FROM orders GROUP BY 1),
        |sa AS (
        |  SELECT i AS h,
        |    CAST(('0x' || SUBSTRING(MD5(CAST(k AS VARCHAR) ||
        |      '#' || CAST(i AS VARCHAR)), 1, 5)) AS BIGINT) % 1024 AS b,
        |    CAST(SUM(f) AS BIGINT) AS fn
        |  FROM fa, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS i)
        |  GROUP BY 1, 2),
        |sb AS (
        |  SELECT i AS h,
        |    CAST(('0x' || SUBSTRING(MD5(CAST(k AS VARCHAR) ||
        |      '#' || CAST(i AS VARCHAR)), 1, 5)) AS BIGINT) % 1024 AS b,
        |    CAST(SUM(f) AS BIGINT) AS gn
        |  FROM fb, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS i)
        |  GROUP BY 1, 2),
        |ip AS (
        |  SELECT sa.h, CAST(SUM(fn * gn) AS BIGINT) AS ip
        |  FROM sa JOIN sb ON sa.h = sb.h AND sa.b = sb.b GROUP BY 1),
        |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM ip),
        |ex AS (
        |  SELECT CAST(SUM(fa.f * fb.f) AS BIGINT) AS exact_join_size
        |  FROM fa JOIN fb ON fa.k = fb.k),
        |na AS (SELECT CAST(SUM(f) AS BIGINT) AS n_a FROM fa),
        |nb AS (SELECT CAST(SUM(f) AS BIGINT) AS n_b FROM fb)
        |SELECT exact_join_size, cms_est,
        |  cms_est - exact_join_size AS overcount,
        |  cms_est >= exact_join_size AS never_under,
        |  (cms_est - exact_join_size) * 1024 <= 4 * n_a * n_b
        |    AS within_envelope
        |FROM ex, est, na, nb""".stripMargin,

    // the whole AMS estimator recomputed hash-for-hash (q180's md5
    // byte-pair sign idiom), graded against the exact F2 from the same
    // count frame; the 4σ envelope is asserted TRUE
    "q295_ams_f2" ->
      s"""WITH cnt AS (
         |  SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
         |ex AS (
         |  SELECT COUNT(*) AS n_keys,
         |    CAST(SUM(c * c) AS BIGINT) AS f2_exact
         |  FROM cnt),
         |sg AS (
         |  SELECT b.b * 16 + i.i AS j,
         |    c * (CAST(('0x' || SUBSTRING(
         |        MD5(CAST(l_partkey AS VARCHAR) || '#'
         |          || CAST(b.b AS VARCHAR)),
         |        1 + 2 * i.i, 2)) AS BIGINT) % 2 * 2 - 1) AS x
         |  FROM cnt,
         |    (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS b) b,
         |    (SELECT UNNEST(GENERATE_SERIES(0, 15)) AS i) i),
         |ctr AS (SELECT j, CAST(SUM(x) AS BIGINT) AS ctr FROM sg
         |        GROUP BY 1),
         |est AS (
         |  SELECT ${graft.Fns.dsum18Sql(
              "CAST(ctr AS DOUBLE) * CAST(ctr AS DOUBLE)")} / 64
         |    AS f2_est
         |  FROM ctr)
         |SELECT ex.n_keys, ex.f2_exact,
         |  ROUND(est.f2_est, 6) + 0.0 AS f2_est,
         |  ROUND(ABS(est.f2_est - CAST(ex.f2_exact AS DOUBLE))
         |    / CAST(ex.f2_exact AS DOUBLE), 6) + 0.0 AS rel_err,
         |  ABS(est.f2_est - CAST(ex.f2_exact AS DOUBLE))
         |    <= 4.0 * SQRT(2.0 / 64) * CAST(ex.f2_exact AS DOUBLE)
         |    AS within_envelope
         |FROM ex, est""".stripMargin,

    // the exact discrete-rank quantiles restated relationally; the α
    // verdicts asserted TRUE (the theorem is the engine's to keep)
    "q287_ddsketch_quantiles" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem),
        |n AS (SELECT l_returnflag, COUNT(*) AS n FROM li GROUP BY 1),
        |r AS (
        |  SELECT l_returnflag, x,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn
        |  FROM li),
        |e50 AS (
        |  SELECT r.l_returnflag, r.x FROM r JOIN n USING (l_returnflag)
        |  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n.n) AS BIGINT))),
        |e99 AS (
        |  SELECT r.l_returnflag, r.x FROM r JOIN n USING (l_returnflag)
        |  WHERE rn = GREATEST(1, CAST(CEIL(0.99 * n.n) AS BIGINT)))
        |SELECT n.l_returnflag, n.n,
        |  e50.x AS p50_exact, e99.x AS p99_exact,
        |  TRUE AS p50_within_alpha, TRUE AS p99_within_alpha
        |FROM n JOIN e50 USING (l_returnflag) JOIN e99 USING (l_returnflag)
        |ORDER BY n.l_returnflag""".stripMargin,

    // filter membership = all 3 positions present; truth = exact
    // semi-join; identical fill-factor envelope arithmetic
    "q255_bloom_semijoin" ->
      """WITH build AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'),
        |pos AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR) ||
        |      '!' || CAST(i AS VARCHAR)), 1, 6)) AS BIGINT) % 65536 AS p
        |  FROM build, (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS i)),
        |np AS (SELECT COUNT(*) AS n_pos FROM pos),
        |li AS (
        |  SELECT l_orderkey, l_returnflag,
        |    CAST(('0x' || SUBSTRING(MD5(CAST(l_orderkey AS VARCHAR) ||
        |      '!0'), 1, 6)) AS BIGINT) % 65536 AS p0,
        |    CAST(('0x' || SUBSTRING(MD5(CAST(l_orderkey AS VARCHAR) ||
        |      '!1'), 1, 6)) AS BIGINT) % 65536 AS p1,
        |    CAST(('0x' || SUBSTRING(MD5(CAST(l_orderkey AS VARCHAR) ||
        |      '!2'), 1, 6)) AS BIGINT) % 65536 AS p2
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, COUNT(*) AS n_probe,
        |    CAST(SUM(CASE WHEN p0 IN (SELECT p FROM pos)
        |      AND p1 IN (SELECT p FROM pos)
        |      AND p2 IN (SELECT p FROM pos) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cand,
        |    CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM build)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_true
        |  FROM li GROUP BY 1)
        |SELECT l_returnflag, n_probe, n_cand, n_true,
        |  n_cand - n_true AS n_false_pos,
        |  ROUND(CASE WHEN n_probe > n_true THEN
        |    CAST(n_cand - n_true AS DOUBLE) /
        |    CAST(n_probe - n_true AS DOUBLE) END, 6) + 0.0 AS fp_rate,
        |  n_cand >= n_true AS no_false_neg,
        |  COALESCE(CASE WHEN n_probe > n_true THEN
        |    CAST(n_cand - n_true AS DOUBLE) /
        |    CAST(n_probe - n_true AS DOUBLE) END <=
        |    (CAST(n_pos AS DOUBLE) / 65536.0) *
        |    (CAST(n_pos AS DOUBLE) / 65536.0) *
        |    (CAST(n_pos AS DOUBLE) / 65536.0) * 1.5, TRUE)
        |    AS fp_within_bound
        |FROM g, np ORDER BY l_returnflag""".stripMargin)
}
