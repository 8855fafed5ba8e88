package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality profiling operators — the observability half of an
 * ingestion-metrics framework: what a pipeline publishes about its
 * OWN tables so drift, skew, and null regressions page before
 * downstream jobs fail.
 */
object Profiling {

  /**
   * Per-column table profile in one aggregation pass: row count,
   * null count, exact distinct count, lexicographic min/max of the
   * string rendering — one output row per column, uniform schema
   * (column, n_rows, n_null, n_distinct, min_val, max_val).
   *
   * Plan: a single Aggregate over the scan computes every column's
   * counts together (count + count(col) + count(distinct col) per
   * column — Spark expands multi-distinct into one Expand + two-phase
   * aggregate, still one pass over the data), then a `stack` unpivot
   * reshapes the 1×(6·k) row to k rows — driver-free, no second scan.
   * String rendering makes the profile schema-stable across column
   * types, so the profile of ANY table lands in one metrics sink.
   */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      val sc = col(c).cast("string")
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(sc).as(s"__dist_$c"),
        min(sc).as(s"__min_$c"),
        max(sc).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__n_$c`, `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    // col_name, not "column": reserved-ish in several SQL dialects the
    // profile sink might live in
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_rows, n_null, n_distinct, min_val, max_val)"))
  }

  /**
   * Join-key skew audit: the pre-flight check before a big equi-join
   * — "is there a key that will pin one task?" Reports row count,
   * distinct-key count, the hottest key (count ties broken to the
   * lexicographically smallest key — deterministic), its row count,
   * and the skew factor (hottest over mean rows-per-key) in integer
   * x1000 units.
   *
   * Plan: per-key count (map-side combinable — the only full-volume
   * shuffle, and it carries one row per DISTINCT key), then a single
   * struct-max aggregate: max((cnt, reversed-key)) picks the hottest
   * key without any sort. Totals ride the same aggregate.
   */
  /**
   * Exact equi-join cardinality pre-flight: the output row count of
   * `left ⋈ right ON key` is Σ_k cnt_left(k)·cnt_right(k) — computed
   * from per-side KEY COUNTS only, never shipping a payload byte.
   * The question this answers before submitting a 100 TB join is
   * "does this explode?": a duplicate-keyed join can output
   * quadratically more rows than either input, and the only cheap
   * moment to find out is before the real join runs. Also reports
   * the hottest OUTPUT key (count-product ties break to the smallest
   * key) and its row contribution — the AQE-skew-split / salting
   * candidate — plus both match rates (distinct keys of each side
   * that find a partner, ppm).
   *
   * Plan: two map-side-combinable per-key counts (one row per
   * distinct key reaches each exchange), an inner count-join on the
   * key, one struct-min aggregate. Cost is O(distinct keys), not
   * O(rows) past the first aggregation — the 100 TB fact table's
   * count fold happens before its exchange.
   */
  def joinCardinality(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    def counts(df: DataFrame) = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull) // null keys never match an equi-join
      .groupBy("__k").agg(count(lit(1)).cast("long").as("__c"))
    val l = counts(left)
    val r = counts(right)
    // The count product and its sum run in DECIMAL(38,0) — the exact
    // overflow this pre-flight exists to catch (two 10^10-row hot
    // keys → 10^20 output rows) wraps int64 negative and would report
    // the OPPOSITE of the explosion warning. decimal(19,0) holds any
    // long count exactly; the product (≤ 38 digits) and its sum stay
    // exact to 10^38. The report saturates at Long.MaxValue instead
    // of casting blind: a pre-flight answering "does this explode?"
    // with 9.2e18 has answered it.
    val maxLong = lit(Long.MaxValue).cast("decimal(38,0)")
    val matched = l.withColumnRenamed("__c", "__cl")
      .join(r.withColumnRenamed("__c", "__cr"), Seq("__k"))
      .withColumn("__rows", col("__cl").cast("decimal(19,0)") *
        col("__cr").cast("decimal(19,0)"))
    val lTot = l.agg(count(lit(1)).cast("long").as("left_keys"))
    val rTot = r.agg(count(lit(1)).cast("long").as("right_keys"))
    matched.agg(
        coalesce(sum("__rows"), lit(0)).cast("decimal(38,0)").as("__sum"),
        count(lit(1)).cast("long").as("matched_keys"),
        min(struct((-col("__rows")).as("nr"), col("__k").as("k"))).as("__top"))
      .crossJoin(broadcast(lTot)).crossJoin(broadcast(rTot))
      .select(least(col("__sum"), maxLong).cast("long").as("join_rows"),
        col("matched_keys"),
        col("__top.k").as("top_key"),
        // least() skips nulls, so the no-match case (null __top) must
        // short-circuit BEFORE it or top_rows would report MaxValue
        coalesce(when(col("__top.nr").isNotNull,
            least(-col("__top.nr"), maxLong).cast("long")), lit(0L))
          .as("top_rows"),
        expr("(1000000 * matched_keys) div greatest(left_keys, 1L)")
          .cast("long").as("left_match_ppm"),
        expr("(1000000 * matched_keys) div greatest(right_keys, 1L)")
          .cast("long").as("right_match_ppm"))
  }

  /**
   * Equi-width histogram of an integral column — the distribution
   * half of the profile: [[profile]] gives min/max/nulls, this gives
   * SHAPE (skew, modes, truncation cliffs) as `buckets` equal-width
   * bins over [lo, hi]. Bounds are explicit parameters, not a
   * pre-scan — a dashboard needs stable bucket edges across daily
   * runs, and an extra min/max pass over 100 TB to re-derive known
   * bounds is waste. Out-of-range values clamp into the edge buckets
   * (they must be VISIBLE — silently dropping them hides exactly the
   * regressions a histogram exists to catch); nulls are excluded
   * (profiled separately). Empty buckets emit explicit zero rows so
   * the artifact is fixed-shape.
   *
   * Plan: one map-side-combinable count by bucket id (≤ `buckets`
   * distinct keys), joined onto a generated bucket spine. Integer
   * floor arithmetic end to end.
   */
  def histogram(df: DataFrame, valueCol: String, buckets: Int,
      lo: Long, hi: Long): DataFrame = {
    require(buckets >= 1 && hi > lo, "need buckets >= 1 and hi > lo")
    val width = (hi - lo + buckets - 1) / buckets // ceil so hi lands inside
    val counts = df.filter(col(valueCol).isNotNull)
      .select((col(valueCol).cast("long") - lo).as("__d"))
      .select(greatest(least(expr(s"__d div ${width}L"), lit(buckets - 1L)),
        lit(0L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("cnt"))
    val spine = df.sparkSession.range(0, buckets).select(col("id").as("bucket"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket").cast("int").as("bucket"),
        (lit(lo) + col("bucket") * width).cast("long").as("lo"),
        (lit(lo) + (col("bucket") + 1) * width - 1).cast("long").as("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /**
   * Referential-integrity audit: how many child rows point at a
   * parent key that does not exist — the first question after any
   * partial ingest, late-arriving dimension, or botched backfill,
   * and the check an ingestion-metrics framework publishes per
   * landing. Null child keys are counted separately (a null FK is
   * "unlinked", not "dangling") so the three populations sum to the
   * child row count.
   *
   * Plan: the child reduces to per-key COUNTS (map-side combinable —
   * one row per distinct key reaches the exchange); the parent
   * reduces to distinct keys; one anti-join between the two count
   * tables finds dangling keys. Child payloads never move, and at
   * 100 TB the join carries O(distinct keys), not O(rows). The
   * hottest orphan key is reported for triage (struct-min argmax, no
   * sort).
   */
  def refIntegrity(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame = {
    val totals = child.agg(
      count(lit(1)).cast("long").as("child_rows"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L)).cast("long")
        .as("null_key_rows"))
    val childCounts = child.filter(col(childKey).isNotNull)
      .select(col(childKey).cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).cast("long").as("__c"))
    val parentKeys = parent.filter(col(parentKey).isNotNull)
      .select(col(parentKey).cast("string").as("__k")).distinct()
    val orphans = childCounts.join(parentKeys, Seq("__k"), "left_anti")
    orphans.agg(
        coalesce(sum("__c"), lit(0L)).cast("long").as("orphan_rows"),
        count(lit(1)).cast("long").as("orphan_keys"),
        min(struct((-col("__c")).as("nc"), col("__k").as("k"))).as("__top"))
      .crossJoin(broadcast(totals))
      .select(col("child_rows"), col("null_key_rows"), col("orphan_rows"),
        col("orphan_keys"), col("__top.k").as("top_orphan_key"),
        coalesce((-col("__top.nc")).cast("long"), lit(0L)).as("top_orphan_rows"),
        expr("(1000000 * orphan_rows) div greatest(child_rows, 1L)")
          .cast("long").as("orphan_ppm"))
  }

  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.select(col(keyCol).cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).cast("long").as("__c"))
    // struct max orders by (count, key-desc) — to break count ties
    // toward the SMALLEST key with a max aggregate, order by the
    // negated comparison via a second struct field that inverts key
    // order: max on (c, neg_key_marker) is not directly expressible,
    // so use min over (neg count, key): min((-c, key)) = (highest c,
    // smallest key among them)
    val top = counts.agg(
      sum("__c").cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_keys"),
      min(struct((-col("__c")).as("nc"), col("__k").as("k"))).as("__top"))
    top.select(col("n_rows"), col("n_keys"),
        col("__top.k").as("top_key"),
        (-col("__top.nc")).cast("long").as("top_cnt"))
      .withColumn("skew_x1000",
        expr("(1000 * top_cnt * n_keys) div greatest(n_rows, 1L)").cast("long"))
  }

  /**
   * Equi-DEPTH histogram (quantile buckets) of an integer-valued
   * column — the distribution profile [[histogram]]'s fixed-width
   * bins can't give when the data is heavy-tailed (a length
   * distribution with a 1e6 outlier puts 99% of docs in bin 0 of an
   * equi-width histogram; equi-depth puts ~n/k rows in every
   * bucket). A value at cumulative rank r lands in bucket
   * ((r−1)·k) div n — whole value-groups stay together (assigned by
   * their last row), so heavy ties can leave some buckets empty
   * rather than split a value; deterministic in both engines.
   *
   * Scale: per-value counts are the only data-sized pass; the
   * cumulative rank runs as the [[graft.pipeline.Corpus.ksShift]]
   * two-phase distributed prefix scan over the value-domain-bounded
   * count table (P partition totals collected — planner statistics,
   * not data), never a single-task global window.
   */
  def histogramEquiDepth(df: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val u = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).cast("long").as("__c"))
      .repartitionByRange(parts, col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist()
    u.count()
    val totals = graft.pipeline.DriverBounds.boundedCollect(
      u.groupBy("__pid").agg(sum("__c").as("t")), parts.toLong,
      "histogramEquiDepth partition totals (one row per range partition)")
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val off = (0 until parts).scanLeft(0L) {
      (a, p) => a + totals.getOrElse(p, 0L)
    }
    val n = math.max(off(parts), 1L)
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until parts).map(p => org.apache.spark.sql.Row(p, off(p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    u.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__cum", col("__off") + sum(col("__c")).over(w))
      .withColumn("bucket",
        expr(s"((__cum - 1) * ${buckets}L) div ${n}L").cast("int"))
      .groupBy("bucket")
      .agg(min("__v").as("lo"), max("__v").as("hi"),
        sum("__c").cast("long").as("cnt"))
  }

  /**
   * Functional-dependency check: does `detCol` determine `depCol`?
   * One summary row — determinant group counts, how many groups map
   * to more than one dependent value, and how many ROWS sit in those
   * violating groups (ppm of the table) — the schema-contract audit
   * ("does source imply language?") run before a pipeline starts
   * keying on the assumption. Null determinants/dependents count as
   * ordinary values (a null-keyed conflict is still a conflict).
   *
   * Plan: distinct (det, dep) pairs → per-det distinct-dep count,
   * joined with per-det row counts — two map-side-combinable
   * aggregations keyed by the determinant, then a scalar agg. A
   * determinant held by most of the table is absorbed by the partial
   * agg exactly as in [[keySkew]].
   */
  def fdCheck(df: DataFrame, detCol: String, depCol: String): DataFrame = {
    val pairs = df.select(col(detCol).cast("string").as("__det"),
      col(depCol).cast("string").as("__dep"))
    val perDet = pairs.groupBy("__det")
      .agg(count(lit(1)).cast("long").as("__c"))
    val distinctDeps = pairs.distinct().groupBy("__det")
      .agg(count(lit(1)).cast("long").as("__nd"))
      .withColumnRenamed("__det", "__det_r")
    // Null-safe join key (<=>): groupBy keeps a null-determinant group
    // on both sides, but a plain equi-join would silently drop it from
    // every count — violating the "null is an ordinary value" contract
    // above on exactly the dirtiest input (round-12 advice).
    perDet.join(distinctDeps, col("__det") <=> col("__det_r"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_violating_groups"),
        sum("__c").cast("long").as("n_rows"),
        sum(when(col("__nd") > 1, col("__c")).otherwise(0L)).cast("long")
          .as("n_violating_rows"))
      .withColumn("violation_ppm",
        expr("(1000000 * n_violating_rows) div greatest(n_rows, 1L)")
          .cast("long"))
  }

  /**
   * Per-key order-inversion audit: within each key, walk rows in
   * `seqCol` order (the ingest/sequence order) and count positions
   * where `tsCol` goes BACKWARDS — the out-of-order-arrival profile
   * that sizes streaming watermarks ("how late is late data,
   * really?"). Returns one row per key with at least one inversion:
   * (key, n_events, n_inversions, max_backstep_micros — the largest
   * single backwards jump, i.e. the watermark delay that would have
   * kept every event of this key).
   *
   * Plan: one window per key ordered by the sequence column — state
   * bounded by each key's own row count, parallel across keys; the
   * aggregation after it is map-side-combinable.
   */
  def orderInversions(df: DataFrame, keyCol: String, tsCol: String,
      seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(seqCol))
    df.select(col(keyCol), col(seqCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__t"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(when(col("__t") < col("__prev"), 1L).otherwise(0L)).cast("long")
          .as("n_inversions"),
        max(when(col("__t") < col("__prev"), col("__prev") - col("__t")))
          .cast("long").as("max_backstep_micros"))
      .filter(col("n_inversions") > 0)
  }

  /**
   * Benford first-digit profile of a positive numeric column: counts
   * and ppm share per leading digit 1–9 (values < 1 excluded — they
   * have no stable leading digit in this integer rendering). Heavily
   * synthetic or truncated data shows up as a flat or spiked digit
   * histogram where organic magnitudes follow log-uniform Benford
   * shape; the ppm shares let a monitor threshold the deviation
   * without floating-point expectations. Explicit zero rows for
   * absent digits keep the output schema-stable at 9 rows.
   *
   * Plan: one narrow projection to the leading digit + a 9-key
   * aggregation — nothing past the scan is data-sized.
   */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = spark.createDataset(1 to 9).toDF("digit")
      .select(col("digit").cast("int").as("digit"))
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("cnt"))
    // total via a whole-frame window over the 9-row digit table — no
    // extra join, and never a cartesian in the plan
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    digits.join(counts, Seq("digit"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("__tot", sum("cnt").over(wAll))
      .select(col("digit"), col("cnt"),
        expr("(1000000 * cnt) div greatest(__tot, 1L)")
          .cast("long").as("share_ppm"))
  }

  /**
   * Per-group percentile-rank normalization in ppm: `rank` semantics
   * (ties share the rank of their first row), scaled to
   * `(rank − 1) · 10⁶ div (n − 1)` so the group minimum is 0 and the
   * maximum is 10⁶ (single-row groups pin to 0). The standard
   * cross-source score normalization — raw quality scores are not
   * comparable across sources with different scales, percentile ranks
   * are — and the integer form keeps it hash-exact where
   * `percent_rank()`'s double division is not.
   *
   * One window per group; the sort is bounded by per-group volume.
   */
  def percentileRank(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(valueCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.withColumn("__rk", rank().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("pct_rank_ppm",
        expr("(1000000L * (__rk - 1)) div greatest(__n - 1, 1L)"))
      .drop("__rk", "__n")
  }

  /**
   * Inter-arrival regularity audit — the bot-traffic signal: per key,
   * gap count, mean gap, and the squared coefficient of variation of
   * gaps in ppm, `cv²_ppm = 10⁶ · (n·Σg² − (Σg)²) div (Σg)²`. Organic
   * humans are bursty (cv² ≳ 10⁶); schedulers and replay bots are
   * metronomic (cv² → 0). The variance numerator `n·Σg² − (Σg)²` is
   * ≥ 0 by Cauchy–Schwarz, so truncating and floor division agree.
   *
   * Gaps are whole SECONDS and all moments accumulate in
   * DECIMAL(38,0): month-long spans make `(Σg)²` overflow a long at
   * ~3·10⁹ s of total gap — on exactly the long-lived keys this audit
   * targets (the [[joinCardinality]] lesson again).
   *
   * One shuffle on the key, one sorted window (lag) + one
   * map-side-combinable aggregate.
   */
  def interArrival(df: DataFrame, keyCol: String, tsCol: String,
      seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("__t"), col(seqCol))
    df.select(col(keyCol), col(seqCol),
        unix_timestamp(col(tsCol).cast("timestamp")).as("__t"))
      .withColumn("__gap", (col("__t") - lag(col("__t"), 1).over(w))
        .cast("decimal(38,0)"))
      .filter(col("__gap").isNotNull)
      .groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("n_gaps"),
        sum(col("__gap")).cast("decimal(38,0)").as("__sg"),
        sum(col("__gap") * col("__gap")).cast("decimal(38,0)").as("__sg2"))
      .filter(col("__sg") > 0)
      .select(col(keyCol), col("n_gaps"),
        expr("CAST((__sg - pmod(__sg, CAST(n_gaps AS DECIMAL(38,0)))) / " +
          "n_gaps AS BIGINT)").as("mean_gap_sec"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
          "(n_gaps * __sg2 - __sg * __sg) - " +
          "pmod(CAST(1000000 AS DECIMAL(38,0)) * (n_gaps * __sg2 - __sg * __sg), " +
          "__sg * __sg)) / (__sg * __sg) AS BIGINT)").as("cv2_ppm"))
  }

  /**
   * Pairwise functional-dependency DISCOVERY — where [[fdCheck]]
   * verifies a dependency someone asserted, this mines which A → B
   * dependencies HOLD among a declared column set: for every ordered
   * pair, the share of A-groups whose B takes more than one value.
   * The data-profiling first step before schema normalization or
   * constraint enforcement (TANE-family, restricted to single-column
   * LHS — the level-1 lattice; larger LHS sets explode
   * combinatorially and start from these results anyway).
   *
   * Per LHS column (not per ordered pair — round-12 advice): ONE
   * groupBy on the LHS computes exact COUNT(DISTINCT rhs) for EVERY
   * other column at once, so the input is scanned |cols| times, not
   * |cols|·(|cols|−1) — on a 100 TB table with 8 profiled columns
   * that is 8 scans instead of 56. (Catalyst plans the multi-distinct
   * aggregate with one Expand, so per-LHS shuffle volume is
   * rows·(p−1) either way; the scan count is what the rewrite buys.)
   * The per-LHS one-row result unpivots to the per-pair rows via an
   * in-row explode — output identical to the per-pair form. All-NULL
   * B inside a group counts zero distinct values and does not violate
   * (a dependency constrains present values).
   *
   * @return (lhs, rhs, n_groups, n_violating, viol_ppm, holds)
   */
  def fdDiscover(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to mine")
    cols.map { a =>
      val rhs = cols.filterNot(_ == a)
      val ndCols = rhs.map(b => countDistinct(col(b)).as(s"__nd_$b"))
      val perGroup = df.groupBy(col(a).as("__k"))
        .agg(ndCols.head, ndCols.tail: _*)
      val nvCols = rhs.map(b =>
        sum(when(col(s"__nd_$b") > 1, 1L).otherwise(0L)).cast("long")
          .as(s"__nv_$b"))
      val agged = perGroup.agg(
        count(lit(1)).cast("long").as("n_groups"),
        nvCols: _*)
      agged.select(col("n_groups"), explode(array(rhs.map(b =>
          struct(lit(b).as("rhs"), col(s"__nv_$b").as("n_violating"))): _*))
          .as("__x"))
        .select(lit(a).as("lhs"), col("__x.rhs").as("rhs"),
          col("n_groups"), col("__x.n_violating").as("n_violating"),
          expr("(1000000L * __x.n_violating) div n_groups").cast("long")
            .as("viol_ppm"),
          (col("__x.n_violating") === 0L).as("holds"))
        // degenerate empty input: the global agg over zero groups
        // yields one row with n_groups=0 and NULL n_violating/holds —
        // garbage that NPEs downstream consumers (the fdDiscoverL2
        // seed unboxed it, per ADVICE). An empty table profiles to an
        // empty dependency report, lazily (no extra scan).
        .filter(col("n_groups") > 0)
    }.reduce(_ unionByName _)
  }

  /**
   * Level-2 FD discovery — the next rung of the TANE lattice that
   * [[fdDiscover]] documents as its scope cut: mine {a1, a2} → b for
   * every unordered LHS pair, SEEDED by the level-1 survivors. TANE
   * pruning applies exactly: if a1 → b (or a2 → b) already holds,
   * {a1, a2} → b is implied and NOT minimal, so the pair-RHS
   * combination is skipped rather than re-counted — the seeding is
   * what keeps the lattice walk from exploding (the reason level 1
   * "starts from these results anyway").
   *
   * Scan discipline: the level-1 pass costs p scans (fdDiscover),
   * the level-2 pass one groupBy per LHS PAIR computing
   * countDistinct for every surviving RHS at once — C(p,2) scans,
   * inherent to the lattice level, with the RHS set pruned per pair.
   * The level-1 `holds` map is p·(p−1) rows, fetched through
   * [[graft.pipeline.DriverBounds.boundedCollect]] like every
   * planner stat. A pair whose every RHS is implied contributes no
   * scan at all.
   *
   * @return (lhs1, lhs2, rhs, n_groups, n_violating, viol_ppm,
   *         holds) — lhs1 < lhs2 lexicographically; only minimal
   *         (non-implied) candidates appear
   */
  def fdDiscoverL2(df: DataFrame, cols: Seq[String]): DataFrame = {
    // DISTINCT arity (round-15 ADVICE): a duplicate-laden list (e.g.
    // the same column three times) passes a bare size check but
    // yields ZERO lhs≠rhs level-1 pairs, so the empty-seed guard
    // below would misdiagnose a column-arity caller bug as an
    // empty-input one — the two failure modes must report distinctly
    require(cols.distinct.size >= 3,
      "need at least three distinct columns for level 2")
    // operate on the DISTINCT list throughout (round-15 review): a
    // duplicate-laden list with >=3 distinct names passed the guard
    // but emitted degenerate {a,a}->b rows and double-scanned pairs
    val dcols = cols.distinct
    val p = dcols.size.toLong
    val level1 = graft.pipeline.DriverBounds.boundedCollect(
        fdDiscover(df, dcols).select("lhs", "rhs", "holds"),
        p * (p - 1), "fdDiscoverL2 level-1 seed")
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    // loud contract failure, not an NPE three lines later: fdDiscover
    // on an empty input yields an empty seed (see its empty-input
    // filter), and a lattice walk over nothing is a caller bug
    require(level1.nonEmpty,
      "fdDiscoverL2 needs a non-empty input DataFrame — the level-1 " +
        "seed is empty")
    val lhsPairs = for {
      i <- dcols.indices; j <- dcols.indices if i < j
    } yield {
      val (a1, a2) = (dcols(i), dcols(j))
      if (a1 < a2) (a1, a2) else (a2, a1)
    }
    val spark = df.sparkSession
    val perPair = lhsPairs.flatMap { case (a1, a2) =>
      val rhs = dcols.filterNot(c => c == a1 || c == a2)
        .filterNot(b => level1((a1, b)) || level1((a2, b)))
      if (rhs.isEmpty) None
      else {
        val ndCols = rhs.map(b => countDistinct(col(b)).as(s"__nd_$b"))
        val perGroup = df.groupBy(col(a1).as("__k1"), col(a2).as("__k2"))
          .agg(ndCols.head, ndCols.tail: _*)
        val nvCols = rhs.map(b =>
          sum(when(col(s"__nd_$b") > 1, 1L).otherwise(0L)).cast("long")
            .as(s"__nv_$b"))
        val agged = perGroup.agg(
          count(lit(1)).cast("long").as("n_groups"),
          nvCols: _*)
        Some(agged.select(col("n_groups"), explode(array(rhs.map(b =>
            struct(lit(b).as("rhs"), col(s"__nv_$b").as("n_violating"))): _*))
            .as("__x"))
          .select(lit(a1).as("lhs1"), lit(a2).as("lhs2"),
            col("__x.rhs").as("rhs"),
            col("n_groups"), col("__x.n_violating").as("n_violating"),
            expr("(1000000L * __x.n_violating) div n_groups").cast("long")
              .as("viol_ppm"),
            (col("__x.n_violating") === 0L).as("holds")))
      }
    }
    if (perPair.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, String, String, Long, Long, Long, Boolean)]
        .toDF("lhs1", "lhs2", "rhs", "n_groups", "n_violating",
          "viol_ppm", "holds")
    } else perPair.reduce(_ unionByName _)
  }

  /**
   * Per-partition ingestion manifest — the copy-integrity primitive
   * of a dataset-ingestion framework: for each partition, the row
   * count and an ORDER-FREE content checksum (exact DECIMAL(38,0)
   * sum of a 48-bit md5 of each row's canonical rendering). Two
   * routes that ingested the same MULTISET of rows — stream vs
   * batch, two engines, pre/post compaction — produce identical
   * manifests; a dropped, duplicated, or mutated row moves
   * (n_rows, content_sum) in its partition. A SUM (not XOR) checksum
   * is deliberate: XOR is blind to even-count duplication, the exact
   * sum is multiset-faithful.
   *
   * Canonical rendering is `cast-to-string` joined on U+0001 with a
   * U+0000 null sentinel — engine-portable for integers, strings,
   * and dates; CALLERS PICK `hashCols` accordingly (float renderings
   * differ across engines — hash a fixed-point derivation instead).
   *
   * Scale: one narrow projection + a map-side-combinable aggregate
   * keyed by the partition columns — no shuffle beyond partition-count
   * rows, the same pass shape as any ingest-side metric.
   */
  def ingestionManifest(df: DataFrame, partitionCols: Seq[String],
      hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "hashCols must be non-empty")
    val repr = concat_ws("\u0001",
      hashCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val h = conv(substring(md5(concat(lit("m:"), repr)), 1, 12), 16, 10)
      .cast("long")
    val hashed = df.withColumn("__h", h.cast("decimal(38,0)"))
    val grouped =
      if (partitionCols.nonEmpty) hashed.groupBy(partitionCols.map(col): _*)
      else hashed.groupBy()
    grouped.agg(count(lit(1)).cast("long").as("n_rows"),
      sum("__h").cast("decimal(38,0)").as("content_sum"))
  }

  /**
   * Manifest comparison — the ingest-verification readout: full outer
   * join of two [[ingestionManifest]] outputs on the partition
   * columns, one row per partition present on EITHER side with both
   * counts, the row delta, and whether the partition verifies
   * (present on both sides with equal count AND checksum). A
   * partition missing on one side reports its counts as 0/NULL and
   * verifies false.
   */
  def manifestDiff(expected: DataFrame, actual: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val e = expected.select(partitionCols.map(col) :+
      col("n_rows").as("n_rows_exp") :+ col("content_sum").as("sum_exp"): _*)
    val a = actual.select(partitionCols.map(col) :+
      col("n_rows").as("n_rows_act") :+ col("content_sum").as("sum_act"): _*)
    e.join(a, partitionCols, "full_outer")
      .select(partitionCols.map(col) ++ Seq(
        coalesce(col("n_rows_exp"), lit(0L)).as("n_rows_exp"),
        coalesce(col("n_rows_act"), lit(0L)).as("n_rows_act"),
        (coalesce(col("n_rows_act"), lit(0L)) -
          coalesce(col("n_rows_exp"), lit(0L))).as("rows_delta"),
        (col("n_rows_exp").isNotNull && col("n_rows_act").isNotNull &&
          col("n_rows_exp") === col("n_rows_act") &&
          col("sum_exp") === col("sum_act")).as("verified")): _*)
  }
}
