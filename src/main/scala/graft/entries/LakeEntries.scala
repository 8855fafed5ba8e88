package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entries.Fixtures._
import graft.catalog.Tables
import graft.operators.{PartitionOps, ZOrder}

/** Lake layout domain: partition parsing/registration/retention,
  * backfill gap planning and z-order layout keys (SURVEY §2 O-26..O-28
  * + layout extensions). */
private[graft] object LakeEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-26: object-key → partition values parser.
    "q_partition_parse" -> { (s, dir) =>
      val key = concat_ws("/", lit("metrics"), col("event_type"),
        concat(lit("r"), pmod(col("user_id"), lit(3))),
        date_format(col("ts"), "yyyy"), date_format(col("ts"), "MM"),
        date_format(col("ts"), "dd"), date_format(col("ts"), "HH"),
        lit("part-000.parquet"))
      ev(s, dir).select(PartitionOps.parseKey(key).as("p"))
        .select(col("p.table").as("table_name"), col("p.region"),
          col("p.year"), col("p.month"), col("p.day"), col("p.hour"))
        .distinct()
        .orderBy("table_name", "region", "year", "month", "day", "hour")
    },

    // O-28: partition-age retention relative to the newest data.
    "q_retention" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      // max over zero rows is one NULL row — getLong would NPE on an
      // empty table where every other query just emits zero rows
      val asOfRow = o.agg(max(unix_timestamp(col("o_orderdate")))).first()
      val asOf = if (asOfRow.isNullAt(0)) 0L else asOfRow.getLong(0)
      val parts = o.select(lit("r0").as("region"),
        year(col("o_orderdate")).as("year"), month(col("o_orderdate")).as("month"),
        dayofmonth(col("o_orderdate")).as("day"), lit(0).as("hour"))
      PartitionOps.retain(parts, 90, asOf)
        .groupBy("year", "month", "day").agg(count(lit(1)).as("n_rows"))
        .orderBy("year", "month", "day")
    },

    // Backfill planner: hourly partition gaps per series (O-26/O-27
    // companion — what a missed landing looks like to the scheduler).
    "q_partition_gaps" -> { (s, dir) =>
      PartitionOps.hourlyGaps(ev(s, dir), "event_type", "ts")
        .orderBy("series", "missing_hour_epoch")
    },

    // Z-order (Morton) values over a (user, event) grid — the
    // data-skipping layout key, pure shift/mask/add arithmetic.
    "q_zorder" -> { (s, dir) =>
      val e = ev(s, dir).filter(col("event_id") % 101 === 0)
      e.select(col("event_id"),
          ZOrder.zValue2(pmod(col("user_id"), lit(1024L)),
            pmod(col("event_id"), lit(1024L)), bits = 10).as("z"))
        .orderBy("event_id")
    },

    // Ingestion manifest + diff: per-o_orderstatus row counts and
    // order-free 48-bit-md5 content checksums of a stable column
    // rendering, verified against a deliberately corrupted copy (the
    // o_orderkey=1 row dropped; the priority of the SMALLEST orderkey
    // in a DIFFERENT status partition mutated) — so the two failure
    // modes always land in two distinct partitions: one fails with
    // rows_delta -1, one via checksum at equal count, the rest must
    // verify. The mutation target is derived (not id-pinned) because
    // the generator assigns statuses differently per sf, and a fixed
    // second id can collapse both corruptions into one partition
    // (round-16 ADVICE: at sf0.01 orders 1 and 4 are both 'F',
    // leaving the equal-count checksum path unexercised). Both
    // lookups are single-row scalar reads (O-19 semantics).
    "q_manifest" -> { (s, dir) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority")
      val orders = Tables.read(s, dir, "orders")
      val dropStatus = orders.filter(col("o_orderkey") === 1L)
        .select("o_orderstatus").first().getString(0)
      val mutKey = orders.filter(col("o_orderstatus") =!= dropStatus)
        .agg(min("o_orderkey")).first().getLong(0)
      val corrupt = orders.filter(col("o_orderkey") =!= 1L)
        .withColumn("o_orderpriority", when(col("o_orderkey") === mutKey,
          lit("9-CORRUPTED")).otherwise(col("o_orderpriority")))
      graft.operators.Profiling.manifestDiff(
          graft.operators.Profiling.ingestionManifest(
            orders, Seq("o_orderstatus"), cols),
          graft.operators.Profiling.ingestionManifest(
            corrupt, Seq("o_orderstatus"), cols),
          Seq("o_orderstatus"))
        .orderBy("o_orderstatus")
    },

    // O-27: idempotent ADD PARTITION + multi-catalog loop, end to end.
    // Parquet files land for THREE partitions but only TWO are
    // registered (the reference's Firehose writes files, not catalog
    // entries — visibility comes from add_partition.py:56-71's
    // registration). The query proves (a) registered partitions are
    // readable through both catalog copies, (b) the unregistered one
    // stays invisible (catalog-gated scan, not file listing), (c) the
    // whole loop is idempotent (second pass: no new errors), and
    // (d) a broken catalog target is reported, never thrown.
    "q_partition_add" -> { (s, dir) =>
      import s.implicits._
      // PER-JVM fixture path, wiped per invocation: a fresh
      // createTempDirectory per call leaks a directory every bench
      // trial / verify run (6+ per bench round) until /tmp fills, and
      // a single FIXED path (round 9) traded the leak for a
      // concurrency hazard — two JVMs (gate + bench) wiping/reading
      // the same directory corrupt each other mid-read. Suffixing
      // with the process id keeps it bounded (one dir per JVM,
      // reused/wiped across that JVM's invocations) and
      // concurrency-safe.
      val baseDir = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft_q27_fixture_${ProcessHandle.current().pid()}")
      def wipe(f: java.io.File): Unit = {
        // listFiles() returns null on a racing delete or IO error —
        // treat as already-gone rather than NPE
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
        f.delete(): Unit
      }
      wipe(baseDir)
      val base = baseDir.toString
      val parts = Seq(("use1", 2024, 1, 2, 3, 11L), ("use1", 2024, 1, 2, 4, 22L),
        ("usw2", 2024, 1, 3, 0, 33L))
      parts.foreach { case (r, y, m, d, h, v) =>
        Seq((v, v * 1.5)).toDF("id", "metricvalue").write
          .parquet(s"$base/region=$r/year=$y/month=$m/day=$d/hour=$h")
      }
      val dbs = Seq("graft_cat_a", "graft_cat_b")
      dbs.foreach { db =>
        s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
        s.sql(s"DROP TABLE IF EXISTS $db.q27_metrics")
        s.sql(
          s"""CREATE TABLE $db.q27_metrics (id BIGINT, metricvalue DOUBLE,
             |region STRING, year INT, month INT, day INT, hour INT)
             |USING parquet PARTITIONED BY (region, year, month, day, hour)
             |LOCATION '$base'""".stripMargin)
      }
      val targets = dbs.map(db => s"$db.q27_metrics") :+ "graft_no_db.q27_metrics"
      val registered = parts.take(2)
      def addAll() = registered.flatMap { case (r, y, m, d, h, _) =>
        PartitionOps.addPartitionAll(s, targets, r, y, m, d, h,
          s"$base/region=$r/year=$y/month=$m/day=$d/hour=$h")
      }
      val firstErrs = addAll()
      val secondErrs = addAll()
      // both passes: exactly one reported (not thrown) failure per
      // partition, all for the bogus catalog; real catalogs clean
      val loopContract = Seq(firstErrs, secondErrs).forall(errs =>
        errs.size == registered.size &&
          errs.forall(_._1 == "graft_no_db.q27_metrics"))
      dbs.map(db => s.table(s"$db.q27_metrics")
          .groupBy("region", "year", "month", "day", "hour")
          .agg(count(lit(1)).as("n_rows"), sum("id").as("sum_id"))
          .withColumn("catalog", lit(db)))
        .reduce(_.unionByName(_))
        .withColumn("readd_noop", lit(loopContract))
        .orderBy("catalog", "region", "year", "month", "day", "hour")
    }
  )

  def oracles: Map[String, String] = Map(
    // replicates the 48-bit md5 rendering exactly: 'm:' prefix,
    // chr(1) separators, chr(0) null sentinels, first 12 hex digits
    // as a BIGINT, HUGEINT-exact sums compared per partition
    "q_manifest" ->
      """WITH base AS (SELECT o_orderstatus, o_orderkey, o_custkey, o_orderpriority FROM orders),
        |rend AS (SELECT o_orderstatus,
        |('0x' || substr(md5('m:' || concat_ws(chr(1),
        |coalesce(CAST(o_orderkey AS VARCHAR), chr(0)),
        |coalesce(CAST(o_custkey AS VARCHAR), chr(0)),
        |coalesce(o_orderpriority, chr(0)))), 1, 12))::BIGINT AS h FROM base),
        |exp AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows_exp,
        |SUM(CAST(h AS HUGEINT)) AS sum_exp FROM rend GROUP BY 1),
        |mut AS (SELECT min(o_orderkey) AS k FROM base
        |WHERE o_orderstatus <> (SELECT o_orderstatus FROM base WHERE o_orderkey = 1)),
        |cor AS (SELECT o_orderstatus, o_orderkey, o_custkey,
        |CASE WHEN o_orderkey = (SELECT k FROM mut) THEN '9-CORRUPTED' ELSE o_orderpriority END AS o_orderpriority
        |FROM base WHERE o_orderkey <> 1),
        |rend2 AS (SELECT o_orderstatus,
        |('0x' || substr(md5('m:' || concat_ws(chr(1),
        |coalesce(CAST(o_orderkey AS VARCHAR), chr(0)),
        |coalesce(CAST(o_custkey AS VARCHAR), chr(0)),
        |coalesce(o_orderpriority, chr(0)))), 1, 12))::BIGINT AS h FROM cor),
        |act AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows_act,
        |SUM(CAST(h AS HUGEINT)) AS sum_act FROM rend2 GROUP BY 1)
        |SELECT o_orderstatus,
        |coalesce(n_rows_exp, 0) AS n_rows_exp,
        |coalesce(n_rows_act, 0) AS n_rows_act,
        |coalesce(n_rows_act, 0) - coalesce(n_rows_exp, 0) AS rows_delta,
        |(n_rows_exp IS NOT NULL AND n_rows_act IS NOT NULL
        |AND n_rows_exp = n_rows_act AND sum_exp = sum_act) AS verified
        |FROM exp FULL OUTER JOIN act USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,
    "q_partition_parse" ->
      """WITH k AS (SELECT 'metrics/' || event_type || '/r' || CAST(user_id % 3 AS VARCHAR)
        || '/' || strftime(ts, '%Y/%m/%d/%H') || '/part-000.parquet' AS key FROM events),
        p AS (SELECT string_split(key, '/') AS t FROM k)
        SELECT DISTINCT t[1] || '_' || t[2] AS table_name, t[3] AS region,
        CAST(t[4] AS SMALLINT) AS year, CAST(t[5] AS SMALLINT) AS month,
        CAST(t[6] AS SMALLINT) AS day, CAST(t[7] AS SMALLINT) AS hour
        FROM p ORDER BY table_name, region, year, month, day, hour""",

    "q_retention" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
        CAST(month(o_orderdate) AS INTEGER) AS month,
        CAST(day(o_orderdate) AS INTEGER) AS day, COUNT(*) AS n_rows
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >=
          (SELECT CAST(max(o_orderdate) AS DATE) FROM orders) - INTERVAL 90 DAY
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_partition_gaps" ->
      """WITH pres AS (SELECT DISTINCT event_type AS series,
        |CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS h FROM events),
        |sp AS (SELECT series, MIN(h) AS h0, MAX(h) AS h1 FROM pres GROUP BY 1),
        |allh AS (SELECT series, unnest(generate_series(h0, h1, 3600)) AS h FROM sp)
        |SELECT series, h AS missing_hour_epoch FROM allh
        |WHERE NOT EXISTS (SELECT 1 FROM pres p
        |WHERE p.series = allh.series AND p.h = allh.h)
        |ORDER BY series, missing_hour_epoch""".stripMargin,

    "q_zorder" -> {
      val terms = (0 until 10).map { i =>
        s"(((user_id % 1024) >> $i) & 1) * ${1L << (2 * i)} + " +
          s"(((event_id % 1024) >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""SELECT event_id, $terms AS z
         |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin
    },

    // The registered-partition board: 2 catalogs × the 2 REGISTERED
    // partitions (the third has files on disk but no catalog entry and
    // must not appear); readd_noop pins idempotency + error-report
    // contract.
    "q_partition_add" -> {
      val rows = for {
        db <- Seq("graft_cat_a", "graft_cat_b")
        (r, y, m, d, h, v) <- Seq(("use1", 2024, 1, 2, 3, 11L),
          ("use1", 2024, 1, 2, 4, 22L))
      } yield s"SELECT '$db' AS catalog, '$r' AS region, " +
        s"CAST($y AS INTEGER) AS year, CAST($m AS INTEGER) AS month, " +
        s"CAST($d AS INTEGER) AS day, CAST($h AS INTEGER) AS hour, " +
        s"CAST(1 AS BIGINT) AS n_rows, CAST($v AS BIGINT) AS sum_id, " +
        s"true AS readd_noop"
      rows.mkString("", " UNION ALL ",
        " ORDER BY catalog, region, year, month, day, hour")
    }
  )
}
