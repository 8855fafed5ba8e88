package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entries.Fixtures._
import graft.catalog.Tables
import graft.operators.{Anomaly, AsOfJoin, RangeJoin, Rollups, SeriesMath, Sessionize}

/** Delegated-SQL breadth (available to BusinessMetric queries) plus
  * the series-math operator family: rollups, windows, set ops,
  * as-of/session/range joins, sketches, anomaly, rate/TWA, pivot,
  * upsert, SCD2, and the bounded-heap top-k Aggregator. */
private[graft] object SqlSeriesEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Delegated-SQL aggregation (TPC-H Q1 shape) through the DataFrame
    // API with order-independent decimal sums.
    "q_pricing_summary" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Functional-dependency audit: does source determine language?
    // One summary row quantifies the violation mass.
    "q_fd_check" -> { (s, dir) =>
      graft.operators.Profiling.fdCheck(
        Tables.read(s, dir, "documents"), "source", "lang")
    },

    // Out-of-order-arrival profile: per user, timestamp inversions in
    // event_id (ingest) order and the largest backstep — the
    // watermark-sizing audit. The fixture backdates every 13th event
    // by 2 hours (the generated stream is in order); only users with
    // inversions appear.
    "q_order_inversions" -> { (s, dir) =>
      val ev = Tables.read(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 13 === 0,
            col("ts") - expr("INTERVAL 2 HOURS"))
            .otherwise(col("ts")).as("ts"))
      graft.operators.Profiling.orderInversions(ev, "user_id", "ts",
          "event_id")
        .orderBy("user_id")
    },

    // Equi-depth histogram of doc length: 8 quantile buckets, whole
    // value-groups assigned by their last row's rank.
    "q_histogram_eqdepth" -> { (s, dir) =>
      graft.operators.Profiling.histogramEquiDepth(
          Tables.read(s, dir, "documents"), "n_chars", buckets = 8)
        .orderBy("bucket")
    },

    // Benford first-digit profile of order totals: 9 schema-stable
    // digit rows with counts and ppm shares.
    "q_benford" -> { (s, dir) =>
      graft.operators.Profiling.benfordDigits(
          Tables.read(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")
    },

    // Salted skew join end-to-end: one synthetic key carries a third
    // of the fact rows; the salted form must produce bit-identical
    // aggregates to the oracle's plain join (decimal-exact sums).
    "q_skew_join" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      val fact = o.select(
        when(col("o_orderkey") % 3 === 0, lit("hot"))
          .otherwise(concat(lit("k"), pmod(col("o_orderkey"), lit(50))))
          .as("jkey"),
        col("o_totalprice"))
      val dim = fact.select("jkey").distinct()
        .withColumn("weight", when(col("jkey") === "hot", 10L)
          .otherwise(length(col("jkey")).cast("long")))
      graft.operators.SkewJoin.saltedEquiJoin(fact, dim, "jkey", salts = 8)
        .groupBy("jkey", "weight")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"))
        .orderBy("jkey")
    },

    // Broadcast-dim star join: revenue by region (dims broadcast, fact
    // never shuffled for the dim joins).
    "q_region_revenue" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      val n = Tables.read(s, dir, "nation")
      val r = Tables.read(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name")
    },

    // Top-k join+agg with deterministic tie-break.
    "q_top_customers" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(10)
    },

    // Rollup aggregation with deterministic decimal sums — two-phase:
    // the rollup's Expand (one replica per grouping set) runs over the
    // finest-granularity pre-aggregate (|nations|×|priorities| rows),
    // never over the joined fact table, and lineitem is collapsed to
    // one decimal partial per order BEFORE the shuffle join (map-side
    // combine cuts the exchange by the lines-per-order factor; exact
    // decimal sums make the two-phase result bit-identical). Measured
    // 1.9× at sf0.1; the gap widens with fact size since Expand×fact
    // is the term that grows.
    "q_rollup_revenue" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      val n = Tables.read(s, dir, "nation")
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      val fine = liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_orderpriority"))
        .agg(sum(col("rev")).as("rev"))
      fine.rollup(col("n_name"), col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Window analytics: per-customer order sequence + running spend.
    "q_running_spend" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.read(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      // filter BEFORE the window: it commutes with the per-customer
      // partition and pushes to the scan instead of sorting everyone
      o.filter(col("o_custkey") <= 20)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("order_seq"),
          sum(col("o_totalprice").cast("decimal(18,4)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_spend"))
        .orderBy("o_custkey", "order_seq")
    },

    // Set operations: customers with orders but no high-priority ones.
    "q_set_ops" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      o.select(col("o_custkey")).distinct()
        .except(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct())
        .orderBy("o_custkey")
    },

    // Correlated-subquery shape via anti-join: parts with no sales in
    // the final year (the shipdate filter pushes to the parquet scan).
    "q_unsold_parts" -> { (s, dir) =>
      val p = Tables.read(s, dir, "part")
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name").orderBy("p_partkey")
    },

    // Point-in-time (as-of) join: for sampled probe events, the latest
    // per-type value at or before the probe time — union + one sorted
    // window pass per key, no range join, no per-probe subquery.
    "q_asof" -> { (s, dir) =>
      // the query is DEFINED at second granularity (the oracle's
      // epoch-floor) — at sf0.1 same-type events collide within a
      // second, so joining at raw micro precision would resolve those
      // ties differently than the second-floored oracle (found as a
      // scale-dependent divergence in the round-11 sf0.1 sweep)
      val e = ev(s, dir).withColumn("ts_sec", unix_timestamp(col("ts")))
      val probes = e.filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("event_type"), col("ts_sec"))
      val quotes = AsOfJoin.latestQuotePerTs(e, "event_type", "ts_sec", "value")
      AsOfJoin.asOf(probes, quotes, "event_type", "ts_sec", "value")
        .select(col("event_id"), col("event_type"),
          col("ts_sec").as("ts_epoch"), col("asof_value"))
        .orderBy("event_id")
    },

    // Gap-based sessionization over the event stream (30-min gap).
    "q_sessions" -> { (s, dir) =>
      Sessionize.sessions(ev(s, dir), "user_id", "ts", "event_id", 1800L)
        .orderBy("user_id", "session_index")
    },

    // Binned interval join: events falling inside deterministic
    // maintenance windows spawned by every 53rd event — hash equi-join
    // on time bins instead of the quadratic theta join.
    "q_range_join" -> { (s, dir) =>
      val e = ev(s, dir)
      val points = e.select(col("event_id").as("point_id"),
        unix_timestamp(col("ts")).as("pts"))
      val iv = e.filter(col("event_id") % 53 === 0)
        .select(col("event_id").as("interval_id"),
          unix_timestamp(col("ts")).as("s"),
          (unix_timestamp(col("ts")) + (col("event_id") % 7 + 1) * 600).as("e"))
      RangeJoin.binned(points, iv, "pts", "s", "e", binWidth = 3600L)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"))
        .orderBy("interval_id")
    },

    // HLL sketch property check: the oracle pins the exact distinct
    // count AND asserts (as a hash-checked literal-true column) that
    // the HLL++ estimate lands within 5% — if the sketch drifts, the
    // hash compare goes red.
    "q_approx_distinct" -> { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("__approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("hll_within_5pct"))
        .orderBy("event_type")
    },

    // Quantile sketch property check: exact interpolated percentiles
    // (bit-equal to DuckDB quantile_cont) plus hash-checked assertions
    // that approx_percentile stays inside the ±1-percentile band.
    "q_sketch_quantile" -> { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(expr("percentile(value, array(0.49D, 0.50D, 0.51D, 0.94D, 0.95D, 0.96D))").as("q"),
          expr("approx_percentile(value, array(0.50D, 0.95D), 10000)").as("a"))
        .select(col("event_type"),
          col("q")(1).as("p50_exact"), col("q")(4).as("p95_exact"),
          col("a")(0).between(col("q")(0), col("q")(2)).as("p50_in_band"),
          col("a")(1).between(col("q")(3), col("q")(5)).as("p95_in_band"))
        .orderBy("event_type")
    },

    // Trailing-window z-score anomalies per event series (integer
    // arithmetic, division-free — bit-identical across engines).
    "q_anomaly" -> { (s, dir) =>
      // events.value ≤ ~561 (cents ≤ 6e4) — far inside the Long-safe
      // envelope, so the cheap path is exact here
      Anomaly.zScoreFlags(ev(s, dir), "event_type", "ts", "event_id", "value",
          wide = false)
        .filter(col("is_anomaly"))
        .select(col("event_id"), col("event_type"), col("n_hist"))
        .orderBy("event_id")
    },

    // CUSUM level-shift detection over hourly series sums: the fixture
    // raises the second half of every series by 50000 cents/hour — the
    // sustained drift a z-score point test never trips. The oracle
    // replays the fold as a recursive CTE.
    "q_cusum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = ev(s, dir).groupBy(col("event_type").as("series"),
          (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long")
            .as("hour"))
        .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("x0"))
      // per-series hourly rows are time-bounded (720 here), so these
      // windows never see data-sized partitions
      val w = Window.partitionBy("series").orderBy("hour")
      val shifted = hourly
        .withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy("series")))
        .withColumn("x", col("x0") +
          when(col("rn") > expr("nn div 2"), 50000L).otherwise(0L))
      graft.operators.Anomaly.cusumShift(shifted, "series", "hour", "x",
          warmup = 168, slack = 25000L, threshold = 200000L)
        .orderBy("series")
    },

    // Incremental rollup: merge the partial day-state of two disjoint
    // halves of the stream — must equal a full re-aggregation (which
    // is what the oracle computes).
    "q_rollup_incr" -> { (s, dir) =>
      val e = ev(s, dir)
      val older = Rollups.dayState(e.filter(col("event_id") % 3 =!= 0),
        "event_type", "ts", "value")
      val delta = Rollups.dayState(e.filter(col("event_id") % 3 === 0),
        "event_type", "ts", "value")
      Rollups.finalize(Rollups.merge(older, delta))
        .orderBy("series", "day")
    },

    // Per-series first derivative (CloudWatch RATE(m1) analogue).
    "q_rate" -> { (s, dir) =>
      SeriesMath.rate(ev(s, dir).filter(col("event_id") % 11 === 0),
          "event_type", "ts", "event_id", "value")
        .select(col("event_id"), col("event_type"), col("rate_per_sec"))
        .orderBy("event_id")
    },

    // Time-weighted average per series-day (integer-exact).
    "q_twa" -> { (s, dir) =>
      SeriesMath.timeWeightedAvg(ev(s, dir), "event_type", "ts", "event_id",
          "value")
        .orderBy("series", "day")
    },

    // Pivot: per-user event counts, one column per event type.
    "q_pivot" -> { (s, dir) =>
      ev(s, dir).filter(col("user_id") % 17 === 0)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // CDC latest-wins compaction: one surviving row per (user, type) —
    // max over the (epoch, event_id) struct, no window sort.
    "q_upsert" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(unix_timestamp(col("ts")).as("e"),
          col("event_id").as("i"), col("value").as("v"))).as("r"))
        .select(col("user_id"), col("event_type"), col("r.e").as("last_epoch"),
          col("r.i").as("last_event_id"), col("r.v").as("last_value"))
        .orderBy("user_id", "event_type")
    },

    // SCD2 validity intervals: each event's state holds until the
    // user's next event (open interval → null valid_to).
    "q_scd2" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
      ev(s, dir).filter(col("user_id") % 29 === 0)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .orderBy("user_id", "valid_from", "event_id")
    },

    // Custom bounded-heap Aggregator as a query surface: top-3 spenders
    // per event type (map-side combinable, no per-group sort).
    "q_topk_agg" -> { (s, dir) =>
      import s.implicits._
      val cents = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
        .select(col("event_type"), col("user_id"), col("cents"))
        .as[(String, Long, Long)]
      val agg = new graft.plans.TopKAggregator(3).toColumn
      cents.groupByKey(_._1)
        .mapValues(r => graft.plans.ScoredId(r._2, r._3.toDouble))
        .agg(agg.name("top"))
        .flatMap { case (et, top) =>
          top.zipWithIndex.map { case (s2, i) =>
            (et, s2.id, s2.score.toLong, i + 1) }
        }
        .toDF("event_type", "user_id", "cents", "rank")
        .orderBy("event_type", "rank")
    },

    // Ordered funnel: view → click → purchase, stage times chaining
    // strictly forward per user, conversion as ppm of stage 1.
    "q_funnel" -> { (s, dir) =>
      graft.operators.Funnel.funnel(ev(s, dir),
        Seq("view", "click", "purchase")).orderBy("stage")
    },

    // Cohort retention matrix: users cohorted by first active day,
    // per-offset activity as ppm of the cohort.
    "q_cohorts" -> { (s, dir) =>
      graft.operators.Cohorts.retention(ev(s, dir))
        .orderBy("cohort_day", "offset_days")
    },

    // Small-quantity revenue (TPC-H Q17 shape): lineitems below 50%
    // of their part's average quantity. The correlated scalar
    // subquery is hand-decorrelated into a per-part aggregate joined
    // back on the key — the scale-correct plan Catalyst's
    // decorrelation rule would also produce. The threshold compare is
    // DIVISION-FREE (2·qty·count < sum, all decimal-exact): avg =
    // sum/count would round at engine-specific scales and could flip
    // boundary rows between engines.
    "q_small_qty_revenue" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      val avgQty = li.groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("__sum_qty"),
          count(lit(1)).as("__cnt"))
      li.join(avgQty, Seq("l_partkey"))
        .filter(col("l_quantity").cast("decimal(18,4)") * 2 * col("__cnt") <
          col("__sum_qty"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double").as("small_qty_revenue"),
          count(lit(1)).as("n_lineitems"))
    },

    // Data-quality column profile of the documents table: one pass,
    // one row per column, schema-stable string rendering.
    "q_dq_profile" -> { (s, dir) =>
      graft.operators.Profiling.profile(
        Tables.read(s, dir, "documents")).orderBy("col_name")
    },

    // Join-key skew audit over the lineitem part key — the pre-flight
    // check before a big equi-join; struct-min argmax, no sort.
    "q_skew_audit" -> { (s, dir) =>
      graft.operators.Profiling.keySkew(
        Tables.read(s, dir, "lineitem"), "l_partkey")
    },

    // Exact join-cardinality pre-flight: lineitem ⋈ orders on the
    // order key, predicted from per-side key counts alone.
    "q_join_card" -> { (s, dir) =>
      graft.operators.Profiling.joinCardinality(
        Tables.read(s, dir, "lineitem")
          .withColumnRenamed("l_orderkey", "k"),
        Tables.read(s, dir, "orders")
          .withColumnRenamed("o_orderkey", "k"), "k")
    },

    // First-order user-journey transition matrix over events: one
    // user-keyed window, |types|²-bounded counts, integer ppm rows.
    "q_transitions" -> { (s, dir) =>
      graft.operators.Transitions.eventTransitions(
        Tables.read(s, dir, "events")).orderBy("from_type", "to_type")
    },

    // Robust per-source length screen: lower-median + MAD summary of
    // documents' n_chars, outliers at the 2-MAD Hampel fence.
    "q_mad_outliers" -> { (s, dir) =>
      graft.operators.RobustStats.madSummary(
        Tables.read(s, dir, "documents"), "source", "n_chars", k = 2)
        .orderBy("source")
    },

    // Anchor-based event debounce at a 1-hour window: kept events
    // only, integer-microsecond arithmetic, replayable keep-set.
    "q_debounce" -> { (s, dir) =>
      graft.operators.Debounce.debounce(
        Tables.read(s, dir, "events"), windowSec = 3600L)
        .select("event_id", "user_id", "event_type").orderBy("event_id")
    },

    // Referential-integrity audit with injected orphans: every 97th
    // order key removed from the parent strands its lineitems.
    "q_ref_integrity" -> { (s, dir) =>
      graft.operators.Profiling.refIntegrity(
        Tables.read(s, dir, "lineitem"),
        Tables.read(s, dir, "orders").filter(col("o_orderkey") % 97 =!= 0),
        "l_orderkey", "o_orderkey")
    },

    // Last-touch attribution: purchases attributed to the most recent
    // view/click within 2 hours; dark conversions keep a null row.
    "q_attribution" -> { (s, dir) =>
      graft.operators.Attribution.lastTouch(
        Tables.read(s, dir, "events"), "purchase", Seq("view", "click"),
        lookbackSec = 7200L).orderBy("conversion_id")
    },

    // Equi-width document-length histogram: fixed [0, 599] bounds,
    // 10 bins, explicit zero rows — the distribution-shape profile.
    "q_histogram" -> { (s, dir) =>
      graft.operators.Profiling.histogram(
        Tables.read(s, dir, "documents"), "n_chars",
        buckets = 10, lo = 0L, hi = 599L).orderBy("bucket")
    },

    // Record linkage: customers vs a perturbed re-registration (name
    // + ' jr', same nation/segment). The hot 'jr' token is blocked
    // out by the df cap; matches score 500 (jaccard) + 500 + 300.
    "q_record_link" -> { (s, dir) =>
      val cust = Tables.read(s, dir, "customer")
      val right = cust.filter(col("c_custkey") % 3 === 0)
        .select((col("c_custkey") + 100000L).as("c_custkey"),
          concat(col("c_name"), lit(" jr")).as("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      graft.pipeline.RecordLinkage.link(cust, right, "c_name",
        Seq("c_nationkey" -> 500L, "c_mktsegment" -> 300L), "c_custkey",
        maxDf = 50, minScore = 1000L)
        .orderBy("left_id", "right_id")
    },

    // 2-D Pareto skyline over lineitem (minimize price, maximize
    // quantity): two prefix-minimum passes — value-bucketed strict-x
    // prefix + same-x partition min — never the O(n^2) dominance join.
    "q_skyline" -> { (s, dir) =>
      val p = Tables.read(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * 100).cast("long").as("price_c"),
          (-col("l_quantity")).cast("long").as("neg_qty"))
      graft.operators.Skyline.pareto2D(spread(p), "price_c", "neg_qty")
        .orderBy("price_c", "neg_qty", "l_orderkey", "l_linenumber")
    },

    // Functional-dependency discovery: every ordered column pair of a
    // 5-column orders projection, exact violating-group counts.
    "q_fd_discover" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders").select(col("o_orderstatus"),
        col("o_orderpriority"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"),
        floor(col("o_totalprice") / 50000).cast("long").as("o_price_band"))
      graft.operators.Profiling.fdDiscover(o, Seq("o_orderstatus",
          "o_orderpriority", "o_custkey", "o_year", "o_price_band"))
        .orderBy("lhs", "rhs")
    },

    // Level-2 FD discovery on a constructed lattice: {c1,c2}→c12
    // holds while neither singleton does (the composite-key shape),
    // c12→c1 and c12→c2 hold at level 1 so their pair-RHS arms are
    // TANE-pruned, and `noise` (independent of the key split) never
    // holds — pruning, holding, and violating all exercised.
    "q_fd_discover2" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders").select(
        expr("o_orderkey % 7").cast("long").as("c1"),
        expr("(o_orderkey div 7) % 5").cast("long").as("c2"),
        expr("(o_orderkey % 7) * 5 + (o_orderkey div 7) % 5").cast("long")
          .as("c12"),
        expr("o_custkey % 3").cast("long").as("noise"))
      graft.operators.Profiling.fdDiscoverL2(o,
          Seq("c1", "c2", "c12", "noise"))
        .orderBy("lhs1", "lhs2", "rhs")
    },

    // Entity resolution on the linkage pairs: min-label connected
    // components (3 rounds, convergence audited) → entity ids +
    // member counts — the "cluster then canonicalize" half of MDM.
    "q_entity_resolution" -> { (s, dir) =>
      val cust = Tables.read(s, dir, "customer")
      val right = cust.filter(col("c_custkey") % 3 === 0)
        .select((col("c_custkey") + 100000L).as("c_custkey"),
          concat(col("c_name"), lit(" jr")).as("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      val pairs = graft.pipeline.RecordLinkage.link(cust, right, "c_name",
        Seq("c_nationkey" -> 500L, "c_mktsegment" -> 300L), "c_custkey",
        maxDf = 50, minScore = 1000L)
      graft.pipeline.RecordLinkage.resolveEntities(pairs, iters = 3)
        .orderBy("record_id")
    },

    // Interval union (islands): per-user activity intervals
    // [ts, ts + 10min..40h] (length from event_id — deterministic)
    // merged into maximal disjoint islands.
    "q_interval_merge" -> { (s, dir) =>
      val iv = ev(s, dir).filter(col("user_id") % 5 === 0)
        .select(col("user_id").as("key"),
          unix_timestamp(col("ts")).as("start_epoch"),
          (unix_timestamp(col("ts")) + lit(600L) +
            pmod(col("event_id"), lit(240L)) * 600L).as("end_epoch"))
      graft.operators.Intervals.mergeIslands(iv)
        .orderBy("key", "island_index")
    },

    // Coverage rollup over the merged islands: union seconds (no
    // double counting), island count, largest inter-island gap.
    "q_interval_cover" -> { (s, dir) =>
      val iv = ev(s, dir)
        .select(col("user_id").as("key"),
          unix_timestamp(col("ts")).as("start_epoch"),
          (unix_timestamp(col("ts")) + lit(600L) +
            pmod(col("event_id"), lit(240L)) * 600L).as("end_epoch"))
      graft.operators.Intervals.coverage(iv).orderBy("key")
    },

    // Dense hourly grid + integer linear interpolation over the
    // sparse per-user purchase series.
    "q_gapfill" -> { (s, dir) =>
      val obs = ev(s, dir)
        .filter(col("event_type") === "purchase" && col("user_id") % 17 === 0)
        .groupBy(col("user_id").as("key"),
          expr("unix_timestamp(ts) div 3600").as("bucket"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("value"))
      graft.operators.GapFill.linear(obs).orderBy("key", "bucket")
    },

    // Exponentially decayed event counts (1-day half-life, 20
    // half-life horizon) — integer power-of-two decay, per type.
    "q_trending" -> { (s, dir) =>
      graft.operators.Trending.decayedCounts(ev(s, dir), "event_type", "ts",
        halfLifeSec = 86400L).orderBy("event_type")
    },

    // 7-day rolling revenue per type over the daily rollup — a RANGE
    // frame, so absent days shrink the window.
    "q_rolling" -> { (s, dir) =>
      val daily = ev(s, dir).groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_events"))
      graft.operators.SeriesMath.rollingRange(daily, "event_type", "day",
          "cents", windowDays = 7)
        .orderBy("event_type", "day")
    },

    // Weekly seasonality: per type × hour-of-week share + peak flag,
    // epoch-arithmetic phase (no calendar functions).
    "q_seasonal" -> { (s, dir) =>
      graft.operators.SeriesMath.weeklyProfile(ev(s, dir), "event_type", "ts")
        .orderBy("event_type", "hour_of_week")
    },

    // Market-basket association rules over (user, day) baskets of
    // event types: support/confidence/lift in integer ppm.
    "q_assoc_rules" -> { (s, dir) =>
      val baskets = ev(s, dir).select(
        concat(col("user_id").cast("string"), lit(":"),
          expr("unix_timestamp(ts) div 86400").cast("string")).as("basket"),
        col("event_type").as("item"))
      graft.operators.AssocRules.pairs(baskets, "basket", "item",
          minCount = 5L)
        .orderBy("item_a", "item_b")
    },

    // Cross-source score normalization: percentile rank of doc length
    // within each source, integer ppm.
    "q_pct_rank" -> { (s, dir) =>
      graft.operators.Profiling.percentileRank(
          Tables.read(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              col("n_chars").cast("long").as("n_chars")),
          "source", "n_chars")
        .orderBy("doc_id")
    },

    // Inter-arrival regularity (bot signal): per-user gap cv² in ppm,
    // decimal-exact moments.
    "q_interarrival" -> { (s, dir) =>
      graft.operators.Profiling.interArrival(ev(s, dir), "user_id", "ts",
          "event_id")
        .orderBy("user_id")
    },

    // Session path 3-grams: every in-session ordered event-type
    // window, counted corpus-wide. Timestamps truncate to seconds so
    // the (second, event_id) sort key matches the oracle exactly.
    // Gap is 12h, not the q_sessions 30min: the synthetic events
    // table's median per-user inter-arrival is ~7h, so a 30min gap
    // yields max-length-3 sessions and an empty board row.
    "q_session_paths" -> { (s, dir) =>
      val evs = ev(s, dir).select(col("user_id"),
        date_trunc("second", col("ts")).cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      graft.operators.Sessionize.pathNgrams(evs, "user_id", "ts",
          "event_id", "event_type", gapSec = 43200L, n = 3, minCount = 3L)
        .orderBy("path")
    }
  )

  def oracles: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_fd_check" ->
      """WITH p AS (SELECT CAST(source AS VARCHAR) AS det,
        |CAST(lang AS VARCHAR) AS dep FROM documents),
        |c AS (SELECT det, COUNT(*) AS c FROM p GROUP BY 1),
        |nd AS (SELECT det, COUNT(*) AS nd FROM (SELECT DISTINCT det, dep FROM p) GROUP BY 1),
        |j AS (SELECT c.det, c.c, nd.nd FROM c JOIN nd
        |ON c.det IS NOT DISTINCT FROM nd.det)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
        |CAST(SUM(c) AS BIGINT) AS n_rows,
        |CAST(SUM(CASE WHEN nd > 1 THEN c ELSE 0 END) AS BIGINT) AS n_violating_rows,
        |CAST((1000000 * SUM(CASE WHEN nd > 1 THEN c ELSE 0 END)) // greatest(SUM(c), 1) AS BIGINT) AS violation_ppm
        |FROM j""".stripMargin,

    "q_order_inversions" ->
      """WITH ev AS (SELECT user_id, event_id,
        |CASE WHEN event_id % 13 = 0 THEN ts - INTERVAL 2 HOUR ELSE ts END AS ts
        |FROM events),
        |e AS (SELECT user_id, epoch_us(ts) AS t,
        |lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |FROM ev),
        |g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |CAST(SUM(CASE WHEN t < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
        |CAST(MAX(CASE WHEN t < prev THEN prev - t END) AS BIGINT) AS max_backstep_micros
        |FROM e GROUP BY 1)
        |SELECT * FROM g WHERE n_inversions > 0 ORDER BY user_id""".stripMargin,

    "q_histogram_eqdepth" ->
      """WITH c AS (SELECT CAST(n_chars AS BIGINT) AS v, COUNT(*) AS c
        |FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |s AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM c),
        |n AS (SELECT greatest(SUM(c), 1) AS n FROM c),
        |b AS (SELECT v, c, CAST(((cum - 1) * 8) // n.n AS INTEGER) AS bucket
        |FROM s CROSS JOIN n)
        |SELECT bucket, CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi,
        |CAST(SUM(c) AS BIGINT) AS cnt FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_benford" ->
      """WITH v AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
        |d AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
        |t AS (SELECT SUM(cnt) AS tot FROM c)
        |SELECT d.digit, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt,
        |CAST((1000000 * COALESCE(c.cnt, 0)) // greatest(t.tot, 1) AS BIGINT) AS share_ppm
        |FROM d LEFT JOIN c ON d.digit = c.digit CROSS JOIN t
        |ORDER BY d.digit""".stripMargin,

    "q_skew_join" ->
      """WITH f AS (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'hot'
        |ELSE 'k' || CAST(o_orderkey % 50 AS VARCHAR) END AS jkey, o_totalprice
        |FROM orders),
        |d AS (SELECT DISTINCT jkey,
        |CASE WHEN jkey = 'hot' THEN 10 ELSE length(jkey) END AS weight FROM f)
        |SELECT f.jkey, CAST(d.weight AS BIGINT) AS weight,
        |CAST(COUNT(*) AS BIGINT) AS n_rows,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM f JOIN d ON f.jkey = d.jkey GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q_region_revenue" ->
      """SELECT r_name,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_top_customers" ->
      """SELECT c_custkey, c_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
        |COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin,

    "q_rollup_revenue" ->
      """SELECT n_name, o_orderpriority,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)
        |ORDER BY n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(row_number() OVER w AS INTEGER) AS order_seq,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "q_set_ops" ->
      """SELECT DISTINCT o_custkey FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "q_unsold_parts" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |AND l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey""".stripMargin,

    // DuckDB's native ASOF JOIN, not a per-probe correlated subquery:
    // the subquery form re-scanned the quote table once per probe
    // (~9B row-ops at sf1 — the round-16 full-board sf1 sweep sat on
    // it for 45+ minutes at 100 GB RSS before it was killed), while
    // ASOF LEFT JOIN is the same "greatest q.ts <= p.ts per key"
    // semantics (verified row-identical at sf0.01 and sf1) at O(n log n).
    "q_asof" ->
      """WITH q AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |max(value) AS v FROM events GROUP BY 1, 2),
        |p AS (SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts
        |FROM events WHERE event_id % 97 = 0)
        |SELECT p.event_id, p.event_type, p.ts AS ts_epoch, q.v AS asof_value
        |FROM p ASOF LEFT JOIN q
        |ON p.event_type = q.event_type AND p.ts >= q.ts
        |ORDER BY event_id""".stripMargin,

    "q_sessions" ->
      """WITH e AS (SELECT user_id, event_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
        |l AS (SELECT user_id, event_id, ts,
        |lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |f AS (SELECT user_id, event_id, ts,
        |CASE WHEN prev IS NULL OR ts - prev > 1800 THEN 1 ELSE 0 END AS is_new FROM l),
        |s AS (SELECT user_id, ts, CAST(SUM(is_new) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index FROM f)
        |SELECT user_id, session_index, MIN(ts) AS start_epoch, MAX(ts) AS end_epoch,
        |COUNT(*) AS n_events, MAX(ts) - MIN(ts) AS duration_sec
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_index""".stripMargin,

    "q_range_join" ->
      """WITH p AS (SELECT event_id AS point_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS pts FROM events),
        |iv AS (SELECT event_id AS interval_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 7 + 1) * 600 AS e
        |FROM events WHERE event_id % 53 = 0)
        |SELECT iv.interval_id, COUNT(*) AS n_points
        |FROM iv JOIN p ON p.pts BETWEEN iv.s AND iv.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |true AS hll_within_5pct
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_sketch_quantile" ->
      """SELECT event_type,
        |quantile_cont(value, 0.50) AS p50_exact,
        |quantile_cont(value, 0.95) AS p95_exact,
        |true AS p50_in_band, true AS p95_in_band
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // Window order is FULL-microsecond epoch + event_id tiebreak —
    // the operator orders by the raw timestamp column, and a
    // second-truncated oracle order silently diverges as soon as two
    // same-second events' id order disagrees with their microsecond
    // order (latent at sf0.1 where ids are minted in ts order; caught
    // by the round-16 full-board sf1 sweep, whose per-copy 37 s shifts
    // create exactly such collisions).
    "q_anomaly" ->
      """WITH e AS (SELECT event_id, event_type,
        |CAST(floor(value * 100) AS BIGINT) AS x,
        |CAST(epoch_us(ts) AS BIGINT) AS ts FROM events),
        |w AS (SELECT event_id, event_type, x,
        |COUNT(*) OVER win AS n_hist,
        |SUM(x) OVER win AS s, SUM(x*x) OVER win AS sq
        |FROM e WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, n_hist FROM w
        |WHERE n_hist >= 10
        |AND (n_hist*x - s)*(n_hist*x - s) > 9*(n_hist*sq - s*s)
        |ORDER BY event_id""".stripMargin,

    "q_cusum" ->
      """WITH RECURSIVE h AS (SELECT event_type AS series,
        |CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hour,
        |SUM(CAST(floor(value * 100) AS BIGINT)) AS x0
        |FROM events GROUP BY 1, 2),
        |r AS (SELECT series, hour, x0,
        |row_number() OVER (PARTITION BY series ORDER BY hour) AS rn,
        |COUNT(*) OVER (PARTITION BY series) AS nn FROM h),
        |f AS (SELECT series, rn, nn,
        |x0 + CASE WHEN rn > nn // 2 THEN 50000 ELSE 0 END AS x FROM r),
        |mu AS (SELECT series, SUM(x) // 168 AS mu FROM f WHERE rn <= 168 GROUP BY 1),
        |ns AS (SELECT series, MAX(rn) AS n FROM f GROUP BY 1),
        |walk(series, rn, sp, sn, mx, fi) AS (
        |SELECT series, 168, CAST(0 AS HUGEINT), CAST(0 AS HUGEINT),
        |CAST(0 AS HUGEINT), 0 FROM ns WHERE n > 168
        |UNION ALL
        |SELECT w.series, w.rn + 1,
        |greatest(0, w.sp + f.x - m.mu - 25000),
        |greatest(0, w.sn + m.mu - f.x - 25000),
        |greatest(w.mx, greatest(0, w.sp + f.x - m.mu - 25000),
        |greatest(0, w.sn + m.mu - f.x - 25000)),
        |CASE WHEN w.fi > 0 THEN w.fi
        |WHEN greatest(0, w.sp + f.x - m.mu - 25000) > 200000
        |OR greatest(0, w.sn + m.mu - f.x - 25000) > 200000
        |THEN w.rn + 1 ELSE 0 END
        |FROM walk w JOIN f ON f.series = w.series AND f.rn = w.rn + 1
        |JOIN mu m ON m.series = w.series),
        |last AS (SELECT w.series, w.mx, w.fi, ns.n, m.mu
        |FROM walk w JOIN ns ON w.series = ns.series AND w.rn = ns.n
        |JOIN mu m ON m.series = w.series)
        |SELECT series, CAST(n AS BIGINT) AS n_points, CAST(mu AS BIGINT) AS mu,
        |CAST(mx AS BIGINT) AS max_cusum,
        |CAST(CASE WHEN fi > 0 THEN fi END AS BIGINT) AS first_shift_idx
        |FROM last ORDER BY series""".stripMargin,

    "q_rollup_incr" ->
      """SELECT event_type AS series,
        |CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day,
        |CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)/COUNT(value) AS avg_value,
        |CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value,
        |MIN(value) AS min_value, MAX(value) AS max_value,
        |COUNT(value) AS n_points
        |FROM events GROUP BY 1, 2 ORDER BY series, day""".stripMargin,

    // Window ordered by FULL-microsecond epoch (the operator orders by
    // the raw timestamp column); delta arithmetic stays whole-second.
    // Second-truncated ordering diverges on same-second events whose
    // id order disagrees with their microsecond order — latent at
    // sf0.1, caught by the round-16 sf1 sweep (same class as q_anomaly).
    "q_rate" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |CAST(epoch_us(ts) AS BIGINT) AS tus
        |FROM events WHERE event_id % 11 = 0),
        |l AS (SELECT event_id, event_type, value, t,
        |lag(value) OVER w AS pv, lag(t) OVER w AS pt FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id))
        |SELECT event_id, event_type, (value - pv) / (t - pt) AS rate_per_sec
        |FROM l WHERE pt IS NOT NULL AND t - pt > 0
        |ORDER BY event_id""".stripMargin,

    "q_twa" ->
      """WITH e AS (SELECT event_type, event_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |CAST(epoch_us(ts) AS BIGINT) AS tus,
        |CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT event_type, event_id, t, tus, cents,
        |CAST(floor(t/86400)*86400 AS BIGINT) AS day FROM e),
        |l AS (SELECT event_type, day, cents,
        |lead(t) OVER w AS nt, lead(day) OVER w AS nday, t FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id)),
        |g AS (SELECT event_type AS series, day, cents,
        |CASE WHEN nday = day THEN nt - t ELSE 0 END AS wt FROM l)
        |SELECT series, day, CAST(SUM(cents * wt) AS BIGINT) AS twa_num,
        |CAST(SUM(wt) AS BIGINT) AS twa_den,
        |CAST(CAST(SUM(cents * wt) AS BIGINT) // CAST(SUM(wt) AS BIGINT) AS BIGINT) AS twa_cents
        |FROM g GROUP BY 1, 2 HAVING SUM(wt) > 0
        |ORDER BY series, day""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |COUNT(*) FILTER (event_type = 'click') AS click,
        |COUNT(*) FILTER (event_type = 'error') AS error,
        |COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |COUNT(*) FILTER (event_type = 'signup') AS signup,
        |COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events WHERE user_id % 17 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_upsert" ->
      """WITH e AS (SELECT user_id, event_type, event_id, value,
        |CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |ORDER BY t DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_type, t AS last_epoch,
        |event_id AS last_event_id, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS valid_from
        |FROM events WHERE user_id % 29 = 0)
        |SELECT user_id, event_id, valid_from,
        |lead(valid_from) OVER (PARTITION BY user_id
        |ORDER BY valid_from, event_id) AS valid_to
        |FROM e ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_topk_agg" ->
      """WITH c AS (SELECT event_type, user_id,
        |CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |ORDER BY cents DESC, user_id) AS rank FROM c)
        |SELECT event_type, user_id, cents, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
        |WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |JOIN s1 ON e.user_id = s1.user_id
        |WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |JOIN s2 ON e.user_id = s2.user_id
        |WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (SELECT 1 AS stage, 'view' AS event_type,
        |CAST(COUNT(*) AS BIGINT) AS users FROM s1
        |UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3),
        |f AS (SELECT users AS u1 FROM c WHERE stage = 1)
        |SELECT CAST(stage AS INTEGER) AS stage, event_type, users,
        |CAST((1000000 * users) // greatest(u1, 1) AS BIGINT) AS conv_ppm
        |FROM c CROSS JOIN f ORDER BY stage""".stripMargin,

    "q_cohorts" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1),
        |cells AS (SELECT c.cohort_day,
        |date_diff('day', c.cohort_day, d.day) AS offset_days,
        |CAST(COUNT(*) AS BIGINT) AS users
        |FROM d JOIN c ON d.user_id = c.user_id GROUP BY 1, 2),
        |sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1)
        |SELECT cells.cohort_day, CAST(offset_days AS INTEGER) AS offset_days,
        |users, CAST((1000000 * users) // greatest(n, 1) AS BIGINT) AS retained_ppm
        |FROM cells JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, offset_days""".stripMargin,

    // the CORRELATED form — DuckDB decorrelates it itself, proving
    // the hand-decorrelated plan computes the same relation; the
    // division-free compare keeps the threshold decimal-exact
    "q_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |AS small_qty_revenue, COUNT(*) AS n_lineitems
        |FROM lineitem l1
        |WHERE (SELECT CASE WHEN
        |CAST(l1.l_quantity AS DECIMAL(18,4)) * 2 * COUNT(*) <
        |SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) THEN 1 ELSE 0 END
        |FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey) = 1""".stripMargin,

    "q_dq_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |CAST(COUNT(DISTINCT CAST($c AS VARCHAR)) AS BIGINT) AS n_distinct,
           |MIN(CAST($c AS VARCHAR)) AS min_val, MAX(CAST($c AS VARCHAR)) AS max_val
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_skew_audit" ->
      """WITH c AS (SELECT CAST(l_partkey AS VARCHAR) AS k, COUNT(*) AS c
        |FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
        |m AS (SELECT k, c FROM c ORDER BY c DESC, k LIMIT 1)
        |SELECT t.n_rows, t.n_keys, m.k AS top_key, CAST(m.c AS BIGINT) AS top_cnt,
        |CAST((1000 * m.c * t.n_keys) // greatest(t.n_rows, 1) AS BIGINT)
        |AS skew_x1000
        |FROM t CROSS JOIN m""".stripMargin,

    "q_join_card" ->
      """WITH lc AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS c
        |FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |rc AS (SELECT CAST(o_orderkey AS VARCHAR) AS k, COUNT(*) AS c
        |FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |m AS (SELECT lc.k, lc.c::HUGEINT * rc.c::HUGEINT AS rows_k
        |FROM lc JOIN rc USING (k)),
        |top AS (SELECT k, rows_k FROM m ORDER BY rows_k DESC, k LIMIT 1),
        |a AS (SELECT CAST(LEAST(COALESCE(SUM(rows_k), 0),
        |9223372036854775807::HUGEINT) AS BIGINT) AS join_rows,
        |CAST(COUNT(*) AS BIGINT) AS matched_keys FROM m),
        |lt AS (SELECT COUNT(*) AS n FROM lc), rt AS (SELECT COUNT(*) AS n FROM rc)
        |SELECT a.join_rows, a.matched_keys, top.k AS top_key,
        |CAST(LEAST(top.rows_k, 9223372036854775807::HUGEINT) AS BIGINT) AS top_rows,
        |CAST((1000000 * a.matched_keys) // greatest(lt.n, 1) AS BIGINT) AS left_match_ppm,
        |CAST((1000000 * a.matched_keys) // greatest(rt.n, 1) AS BIGINT) AS right_match_ppm
        |FROM a CROSS JOIN top CROSS JOIN lt CROSS JOIN rt""".stripMargin,

    "q_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS from_type,
        |lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |FROM events),
        |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        |FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, SUM(n_trans) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n_trans,
        |CAST((1000000 * c.n_trans) // greatest(t.tot, 1) AS BIGINT) AS prob_ppm
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "q_mad_outliers" ->
      """WITH v AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
        |WHERE n_chars IS NOT NULL),
        |r1 AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
        |COUNT(*) OVER (PARTITION BY source) AS n FROM v),
        |med AS (SELECT source, v AS median FROM r1 WHERE rn = (n + 1) // 2),
        |d AS (SELECT v.source, v.v, med.median, abs(v.v - med.median) AS dev
        |FROM v JOIN med USING (source)),
        |r2 AS (SELECT source, dev, row_number() OVER (PARTITION BY source ORDER BY dev) AS rn,
        |COUNT(*) OVER (PARTITION BY source) AS n FROM d),
        |mad AS (SELECT source, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ANY_VALUE(d.median) AS BIGINT) AS median,
        |CAST(ANY_VALUE(mad.mad) AS BIGINT) AS mad,
        |CAST(COUNT(*) FILTER (d.dev > 2 * mad.mad) AS BIGINT) AS n_outliers
        |FROM d JOIN mad USING (source) GROUP BY d.source
        |ORDER BY source""".stripMargin,

    "q_debounce" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
        |row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |FROM events),
        |walk(user_id, event_type, rn, anchor, keep) AS (
        |SELECT user_id, event_type, rn, t, true FROM e WHERE rn = 1
        |UNION ALL
        |SELECT e.user_id, e.event_type, e.rn,
        |CASE WHEN e.t >= w.anchor + 3600000000 THEN e.t ELSE w.anchor END,
        |e.t >= w.anchor + 3600000000
        |FROM walk w JOIN e ON e.user_id = w.user_id
        |AND e.event_type = w.event_type AND e.rn = w.rn + 1)
        |SELECT w.event_id, w.user_id, w.event_type FROM
        |(SELECT walk.*, e.event_id FROM walk JOIN e USING (user_id, event_type, rn)) w
        |WHERE w.keep ORDER BY event_id""".stripMargin,

    "q_ref_integrity" ->
      """WITH cc AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS c
        |FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |pk AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k FROM orders
        |WHERE o_orderkey IS NOT NULL AND o_orderkey % 97 <> 0),
        |o AS (SELECT cc.k, cc.c FROM cc WHERE NOT EXISTS
        |(SELECT 1 FROM pk WHERE pk.k = cc.k)),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS child_rows,
        |CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_key_rows
        |FROM lineitem),
        |a AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS orphan_rows,
        |CAST(COUNT(*) AS BIGINT) AS orphan_keys FROM o),
        |top AS (SELECT k, c FROM o ORDER BY c DESC, k LIMIT 1)
        |SELECT t.child_rows, t.null_key_rows, a.orphan_rows, a.orphan_keys,
        |top.k AS top_orphan_key,
        |CAST(COALESCE(top.c, 0) AS BIGINT) AS top_orphan_rows,
        |CAST((1000000 * a.orphan_rows) // greatest(t.child_rows, 1) AS BIGINT) AS orphan_ppm
        |FROM t CROSS JOIN a LEFT JOIN top ON true""".stripMargin,

    // TRY_CAST on the split_part reads: DuckDB's split_part maps NULL
    // input to '' (not NULL), and CAST('' AS BIGINT) is an error — a
    // conversion whose user has NO preceding touch at all (first event
    // is the purchase) made the whole oracle throw. Latent until sf1:
    // the small boards happen to give every purchasing user an earlier
    // view/click. TRY_CAST('') is NULL, which the CASE guard absorbs.
    "q_attribution" ->
      """WITH r AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
        |CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |FROM events WHERE event_type IN ('purchase', 'view', 'click')),
        |wk AS (SELECT *, max(CASE WHEN conv = 0 THEN
        |lpad(CAST(t AS VARCHAR), 20, '0') || ':' ||
        |lpad(CAST(event_id AS VARCHAR), 12, '0') || ':' || event_type END)
        |OVER (PARTITION BY user_id ORDER BY t, conv, event_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastk FROM r),
        |c AS (SELECT event_id AS conversion_id, user_id, lastk, t FROM wk WHERE conv = 1),
        |d AS (SELECT conversion_id, user_id,
        |CASE WHEN lastk IS NOT NULL AND t - TRY_CAST(split_part(lastk, ':', 1) AS BIGINT) <= 7200000000
        |THEN TRY_CAST(split_part(lastk, ':', 2) AS BIGINT) END AS touch_id,
        |CASE WHEN lastk IS NOT NULL AND t - TRY_CAST(split_part(lastk, ':', 1) AS BIGINT) <= 7200000000
        |THEN split_part(lastk, ':', 3) END AS touch_type FROM c)
        |SELECT conversion_id, user_id, touch_id, touch_type FROM d
        |ORDER BY conversion_id""".stripMargin,

    "q_histogram" ->
      """WITH c AS (SELECT greatest(least((CAST(n_chars AS BIGINT) - 0) // 60, 9), 0) AS bucket,
        |CAST(COUNT(*) AS BIGINT) AS cnt FROM documents
        |WHERE n_chars IS NOT NULL GROUP BY 1),
        |s AS (SELECT unnest(range(0, 10)) AS bucket)
        |SELECT CAST(s.bucket AS INTEGER) AS bucket,
        |CAST(0 + s.bucket * 60 AS BIGINT) AS lo,
        |CAST(0 + (s.bucket + 1) * 60 - 1 AS BIGINT) AS hi,
        |CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
        |FROM s LEFT JOIN c USING (bucket) ORDER BY bucket""".stripMargin,

    "q_record_link" ->
      """WITH rr AS (SELECT c_custkey + 100000 AS c_custkey, c_name || ' jr' AS c_name,
        |c_nationkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0),
        |lt AS (SELECT c_custkey AS lid, list_distinct(list_filter(
        |regexp_split_to_array(c_name, '\s+'), x -> x <> '')) AS tk FROM customer),
        |rt AS (SELECT c_custkey AS rid, list_distinct(list_filter(
        |regexp_split_to_array(c_name, '\s+'), x -> x <> '')) AS tk FROM rr),
        |lp AS (SELECT lid, unnest(tk) AS t FROM lt WHERE len(tk) > 0),
        |rp AS (SELECT rid, unnest(tk) AS t FROM rt WHERE len(tk) > 0),
        |rare AS (SELECT t FROM (SELECT t FROM lp UNION ALL SELECT t FROM rp)
        |GROUP BY t HAVING COUNT(*) <= 50),
        |cand AS (SELECT DISTINCT lp.lid, rp2.rid FROM lp
        |JOIN rare USING (t)
        |JOIN (SELECT rid, t FROM rp JOIN rare USING (t)) rp2 ON rp2.t = lp.t),
        |sc AS (SELECT cand.lid, cand.rid,
        |CAST(1000 * len(list_intersect(lt.tk, rt.tk)) //
        |len(list_distinct(list_concat(lt.tk, rt.tk))) AS BIGINT) AS jac,
        |CASE WHEN lc.c_nationkey = rc.c_nationkey THEN 500 ELSE 0 END +
        |CASE WHEN lc.c_mktsegment = rc.c_mktsegment THEN 300 ELSE 0 END AS ew
        |FROM cand JOIN lt ON lt.lid = cand.lid JOIN rt ON rt.rid = cand.rid
        |JOIN customer lc ON lc.c_custkey = cand.lid
        |JOIN rr rc ON rc.c_custkey = cand.rid)
        |SELECT lid AS left_id, rid AS right_id, jac AS name_jaccard_permille,
        |CAST(jac + ew AS BIGINT) AS score FROM sc WHERE jac + ew >= 1000
        |ORDER BY left_id, right_id""".stripMargin,

    // sorted-structure skyline: strict-x prefix min via RANGE frame,
    // same-x min via partition — the window form of dominance
    "q_skyline" ->
      """WITH p AS (SELECT l_orderkey, l_linenumber,
        |CAST(l_extendedprice * 100 AS BIGINT) AS price_c,
        |CAST(-l_quantity AS BIGINT) AS neg_qty FROM lineitem),
        |w AS (SELECT *, MIN(neg_qty) OVER (ORDER BY price_c
        |RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
        |MIN(neg_qty) OVER (PARTITION BY price_c) AS m2 FROM p)
        |SELECT l_orderkey, l_linenumber, price_c, neg_qty FROM w
        |WHERE NOT (COALESCE(m1, 9223372036854775807) <= neg_qty
        |OR m2 < neg_qty)
        |ORDER BY price_c, neg_qty, l_orderkey, l_linenumber""".stripMargin,

    "q_fd_discover" -> {
      val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey",
        "o_year", "o_price_band")
      val arms = for { a <- cols; b <- cols if a != b } yield
        s"""SELECT '$a' AS lhs, '$b' AS rhs,
           |CAST(COUNT(*) AS BIGINT) AS n_groups,
           |CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |CAST((1000000 * SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)) // COUNT(*)
           |AS BIGINT) AS viol_ppm,
           |SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $a AS k, count(DISTINCT $b) AS nd FROM o GROUP BY 1)""".stripMargin
      s"""WITH o AS (SELECT o_orderstatus, o_orderpriority, o_custkey,
         |year(o_orderdate) AS o_year,
         |CAST(floor(o_totalprice / 50000) AS BIGINT) AS o_price_band FROM orders)
         |SELECT * FROM (${arms.mkString("\nUNION ALL\n")})
         |ORDER BY lhs, rhs""".stripMargin
    },

    // level-1 holds computed in CTE arms, level-2 arms filtered by
    // the same TANE rule the operator applies (non-implied only)
    "q_fd_discover2" -> {
      val cols = Seq("c1", "c2", "c12", "noise")
      val l1Arms = for { a <- cols; b <- cols if a != b } yield
        s"""SELECT '$a' AS lhs, '$b' AS rhs,
           |CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS holds
           |FROM (SELECT $a AS k, count(DISTINCT $b) AS nd FROM o GROUP BY 1)""".stripMargin
      val l2Arms = for {
        i <- cols.indices; j <- cols.indices if i < j
        b <- cols if b != cols(i) && b != cols(j)
      } yield {
        val (a1, a2) = if (cols(i) < cols(j)) (cols(i), cols(j))
          else (cols(j), cols(i))
        s"""SELECT '$a1' AS lhs1, '$a2' AS lhs2, '$b' AS rhs,
           |CAST(COUNT(*) AS BIGINT) AS n_groups,
           |CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |CAST((1000000 * SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)) // COUNT(*)
           |AS BIGINT) AS viol_ppm,
           |CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS holds
           |FROM (SELECT $a1 AS k1, $a2 AS k2, count(DISTINCT $b) AS nd
           |FROM o GROUP BY 1, 2)""".stripMargin
      }
      s"""WITH o AS (SELECT o_orderkey % 7 AS c1, (o_orderkey // 7) % 5 AS c2,
         |(o_orderkey % 7) * 5 + (o_orderkey // 7) % 5 AS c12,
         |o_custkey % 3 AS noise FROM orders),
         |l1 AS MATERIALIZED (${l1Arms.mkString("\nUNION ALL\n")}),
         |l2 AS (${l2Arms.mkString("\nUNION ALL\n")})
         |SELECT l2.lhs1, l2.lhs2, l2.rhs, l2.n_groups, l2.n_violating,
         |l2.viol_ppm, l2.holds FROM l2
         |JOIN l1 h1 ON h1.lhs = l2.lhs1 AND h1.rhs = l2.rhs
         |JOIN l1 h2 ON h2.lhs = l2.lhs2 AND h2.rhs = l2.rhs
         |WHERE NOT h1.holds AND NOT h2.holds
         |ORDER BY l2.lhs1, l2.lhs2, l2.rhs""".stripMargin
    },

    // linkage CTEs reused verbatim, then 3 unrolled min-label rounds
    // (MATERIALIZED — the q_kcore inlining lesson)
    "q_entity_resolution" -> {
      val rounds = (1 to 3).map { i =>
        s"""m$i AS (SELECT ne.node, MIN(l.label) AS ml FROM ne
           |JOIN l${i - 1} l ON l.node = ne.nbr GROUP BY 1),
           |l$i AS MATERIALIZED (SELECT n.node,
           |least(n.label, COALESCE(m$i.ml, n.label)) AS label
           |FROM l${i - 1} n LEFT JOIN m$i USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH rr AS (SELECT c_custkey + 100000 AS c_custkey, c_name || ' jr' AS c_name,
         |c_nationkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0),
         |lt AS (SELECT c_custkey AS lid, list_distinct(list_filter(
         |regexp_split_to_array(c_name, '\\s+'), x -> x <> '')) AS tk FROM customer),
         |rt AS (SELECT c_custkey AS rid, list_distinct(list_filter(
         |regexp_split_to_array(c_name, '\\s+'), x -> x <> '')) AS tk FROM rr),
         |lp AS (SELECT lid, unnest(tk) AS t FROM lt WHERE len(tk) > 0),
         |rp AS (SELECT rid, unnest(tk) AS t FROM rt WHERE len(tk) > 0),
         |rare AS (SELECT t FROM (SELECT t FROM lp UNION ALL SELECT t FROM rp)
         |GROUP BY t HAVING COUNT(*) <= 50),
         |cand AS (SELECT DISTINCT lp.lid, rp2.rid FROM lp
         |JOIN rare USING (t)
         |JOIN (SELECT rid, t FROM rp JOIN rare USING (t)) rp2 ON rp2.t = lp.t),
         |sc AS (SELECT cand.lid, cand.rid,
         |CAST(1000 * len(list_intersect(lt.tk, rt.tk)) //
         |len(list_distinct(list_concat(lt.tk, rt.tk))) AS BIGINT) AS jac,
         |CASE WHEN lc.c_nationkey = rc.c_nationkey THEN 500 ELSE 0 END +
         |CASE WHEN lc.c_mktsegment = rc.c_mktsegment THEN 300 ELSE 0 END AS ew
         |FROM cand JOIN lt ON lt.lid = cand.lid JOIN rt ON rt.rid = cand.rid
         |JOIN customer lc ON lc.c_custkey = cand.lid
         |JOIN rr rc ON rc.c_custkey = cand.rid),
         |pr AS (SELECT lid, rid FROM sc WHERE jac + ew >= 1000),
         |u AS MATERIALIZED (SELECT DISTINCT least(lid, rid) AS a,
         |greatest(lid, rid) AS b FROM pr WHERE lid <> rid),
         |ne AS MATERIALIZED (SELECT a AS node, b AS nbr FROM u
         |UNION ALL SELECT b, a FROM u),
         |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM ne),
         |$rounds,
         |cv AS (SELECT COALESCE(bool_and(la.label = lb.label), true) AS c
         |FROM u JOIN l3 la ON la.node = u.a JOIN l3 lb ON lb.node = u.b)
         |SELECT node AS record_id, label AS entity_id,
         |CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS n_members,
         |cv.c AS converged
         |FROM l3 CROSS JOIN cv ORDER BY record_id""".stripMargin
    },

    // islands via running-max window; tied (start,end) rows are
    // interchangeable so the ROWS frame is order-tie-safe
    "q_interval_merge" ->
      """WITH iv AS (SELECT user_id AS key, epoch_us(ts) // 1000000 AS s,
        |epoch_us(ts) // 1000000 + 600 + (event_id % 240) * 600 AS e
        |FROM events WHERE user_id % 5 = 0),
        |m AS (SELECT key, s, e, MAX(e) OVER (PARTITION BY key ORDER BY s, e
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv),
        |f AS (SELECT key, s, e,
        |CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM m),
        |g AS (SELECT key, s, e, SUM(nw) OVER (PARTITION BY key ORDER BY s, e
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM f)
        |SELECT key, CAST(island AS BIGINT) AS island_index,
        |CAST(MIN(s) AS BIGINT) AS island_start,
        |CAST(MAX(e) AS BIGINT) AS island_end,
        |CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |CAST(MAX(e) - MIN(s) AS BIGINT) AS covered_sec
        |FROM g GROUP BY key, island ORDER BY key, island""".stripMargin,

    "q_interval_cover" ->
      """WITH iv AS (SELECT user_id AS key, epoch_us(ts) // 1000000 AS s,
        |epoch_us(ts) // 1000000 + 600 + (event_id % 240) * 600 AS e
        |FROM events),
        |m AS (SELECT key, s, e, MAX(e) OVER (PARTITION BY key ORDER BY s, e
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv),
        |f AS (SELECT key, s, e,
        |CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM m),
        |g AS (SELECT key, s, e, SUM(nw) OVER (PARTITION BY key ORDER BY s, e
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM f),
        |isl AS (SELECT key, island, MIN(s) AS st, MAX(e) AS en,
        |COUNT(*) AS ni FROM g GROUP BY key, island),
        |w AS (SELECT key, st, en, ni,
        |st - lag(en) OVER (PARTITION BY key ORDER BY st) AS gap FROM isl)
        |SELECT key, CAST(SUM(en - st) AS BIGINT) AS covered_sec,
        |CAST(COUNT(*) AS BIGINT) AS n_islands,
        |CAST(SUM(ni) AS BIGINT) AS n_intervals,
        |CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_sec,
        |CAST(MIN(st) AS BIGINT) AS first_start,
        |CAST(MAX(en) AS BIGINT) AS last_end
        |FROM w GROUP BY key ORDER BY key""".stripMargin,

    // two-sided interpolation form keeps the numerator non-negative,
    // so DuckDB // (floor) and Spark div (trunc) agree
    "q_gapfill" ->
      """WITH obs AS (SELECT user_id AS key,
        |epoch_us(ts) // 1000000 // 3600 AS bucket,
        |SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS value
        |FROM events WHERE event_type = 'purchase' AND user_id % 17 = 0
        |GROUP BY 1, 2),
        |b AS (SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT key, unnest(range(lo, hi + 1)) AS bucket FROM b),
        |j AS (SELECT g.key, g.bucket, o.value
        |FROM grid g LEFT JOIN obs o ON g.key = o.key AND g.bucket = o.bucket),
        |w AS (SELECT key, bucket, value,
        |last_value(value IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |last_value(CASE WHEN value IS NOT NULL THEN bucket END IGNORE NULLS)
        |OVER (PARTITION BY key ORDER BY bucket
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        |first_value(value IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket
        |ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |first_value(CASE WHEN value IS NOT NULL THEN bucket END IGNORE NULLS)
        |OVER (PARTITION BY key ORDER BY bucket
        |ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |FROM j)
        |SELECT key, CAST(bucket AS BIGINT) AS bucket,
        |CAST(CASE WHEN value IS NOT NULL THEN value
        |ELSE (pv * (nb - bucket) + nv * (bucket - pb)) // (nb - pb) END AS BIGINT) AS value,
        |CASE WHEN value IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
        |FROM w ORDER BY key, bucket""".stripMargin,

    // integer power-of-two decay: 2^(20-age) units, 0 past the
    // horizon; 10^6·decayed // (n·2^20) stays under 2^63
    "q_trending" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 1000000 AS t FROM events),
        |a AS (SELECT MAX(t) AS t0 FROM e),
        |x AS (SELECT event_type, ((SELECT t0 FROM a) - t) // 86400 AS age FROM e),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |CAST(SUM(CASE WHEN age <= 20
        |THEN (CAST(1 AS BIGINT) << CAST(20 - age AS INTEGER)) ELSE 0 END)
        |AS BIGINT) AS decayed_units
        |FROM x GROUP BY event_type)
        |SELECT event_type, n_events, decayed_units,
        |CAST((1000000 * decayed_units) // (n_events * 1048576) AS BIGINT) AS recency_ppm
        |FROM g ORDER BY event_type""".stripMargin,

    "q_rolling" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents,
        |CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |CAST(cents AS BIGINT) AS cents, n_events,
        |CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY day
        |RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cents,
        |CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_days
        |FROM d ORDER BY event_type, day""".stripMargin,

    // hour-of-week phase is pure epoch arithmetic on both engines
    "q_seasonal" ->
      """WITH h AS (SELECT event_type,
        |(epoch_us(ts) // 1000000 // 3600) % 168 AS hour_of_week
        |FROM events),
        |g AS (SELECT event_type, hour_of_week,
        |CAST(COUNT(*) AS BIGINT) AS n_events FROM h GROUP BY 1, 2)
        |SELECT event_type, CAST(hour_of_week AS BIGINT) AS hour_of_week,
        |n_events,
        |CAST((1000000 * n_events) // SUM(n_events) OVER (PARTITION BY event_type)
        |AS BIGINT) AS share_ppm,
        |n_events = MAX(n_events) OVER (PARTITION BY event_type) AS is_peak
        |FROM g ORDER BY event_type, hour_of_week""".stripMargin,

    // lift in HUGEINT — 10^6 · n_ab · n_baskets would wrap BIGINT on
    // the hot pairs the audit exists to rank
    "q_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' ||
        |CAST(epoch_us(ts) // 1000000 // 86400 AS VARCHAR) AS bk,
        |event_type AS i FROM events),
        |n AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
        |ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
        |pc AS (SELECT l.i AS item_a, r.i AS item_b,
        |CAST(COUNT(*) AS BIGINT) AS n_ab
        |FROM b l JOIN b r ON l.bk = r.bk AND l.i < r.i GROUP BY 1, 2)
        |SELECT item_a, item_b, ca.c AS n_a, cb.c AS n_b, n_ab,
        |CAST((1000000 * n_ab) // (SELECT n FROM n) AS BIGINT) AS support_ppm,
        |CAST((1000000 * n_ab) // ca.c AS BIGINT) AS confidence_ppm,
        |CAST((CAST(1000000 AS HUGEINT) * n_ab * (SELECT n FROM n))
        |// (ca.c * cb.c) AS BIGINT) AS lift_ppm
        |FROM pc JOIN ic ca ON pc.item_a = ca.i JOIN ic cb ON pc.item_b = cb.i
        |WHERE n_ab >= 5 ORDER BY item_a, item_b""".stripMargin,

    "q_pct_rank" ->
      """SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        |CAST((1000000 * (rank() OVER (PARTITION BY source ORDER BY n_chars) - 1))
        |// greatest(COUNT(*) OVER (PARTITION BY source) - 1, 1) AS BIGINT)
        |AS pct_rank_ppm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // moments in HUGEINT; variance numerator >= 0 (Cauchy-Schwarz) so
    // // and truncation agree
    "q_interarrival" ->
      """WITH e AS (SELECT user_id, event_id,
        |epoch_us(ts) // 1000000 AS t FROM events),
        |l AS (SELECT user_id,
        |t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS g FROM e),
        |x AS (SELECT user_id, CAST(g AS HUGEINT) AS g FROM l WHERE g IS NOT NULL),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |SUM(g) AS sg, SUM(g * g) AS sg2 FROM x GROUP BY 1)
        |SELECT user_id, n_gaps,
        |CAST(sg // n_gaps AS BIGINT) AS mean_gap_sec,
        |CAST((1000000 * (n_gaps * sg2 - sg * sg)) // (sg * sg) AS BIGINT) AS cv2_ppm
        |FROM a WHERE sg > 0 ORDER BY user_id""".stripMargin,

    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |epoch_us(ts) // 1000000 AS t FROM events),
        |l AS (SELECT user_id, event_id, event_type, t,
        |lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e),
        |s AS (SELECT user_id, event_id, event_type, t,
        |SUM(CASE WHEN prev IS NULL OR t - prev > 43200 THEN 1 ELSE 0 END)
        |OVER (PARTITION BY user_id ORDER BY t, event_id
        |ROWS UNBOUNDED PRECEDING) AS si FROM l),
        |q AS (SELECT list(event_type ORDER BY t, event_id) AS seq
        |FROM s GROUP BY user_id, si),
        |g AS (SELECT unnest(list_transform(range(1, len(seq) - 1),
        |i -> array_to_string(seq[i:i+2], '>'))) AS path
        |FROM q WHERE len(seq) >= 3)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM g
        |GROUP BY 1 HAVING COUNT(*) >= 3 ORDER BY path""".stripMargin
  )
}
