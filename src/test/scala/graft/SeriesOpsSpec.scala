package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{GapFill, Intervals, Sampling, Trending}
import graft.pipeline.Graphs

/** Unit coverage for the interval-union / gap-fill / trending /
  * priority-sampling / triangle-counting operator family. */
class SeriesOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeIslands merges overlapping and touching, splits on gaps") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap → one island
      ("a", 20L, 30L),                  // touching → same island
      ("a", 40L, 50L),                  // gap → new island
      ("b", 100L, 110L))
      .toDF("key", "start_epoch", "end_epoch")
    val out = Intervals.mergeIslands(iv)
      .orderBy("key", "island_index")
      .select("key", "island_index", "island_start", "island_end",
        "n_intervals", "covered_sec")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 1L, 0L, 30L, 3L, 30L),
      ("a", 2L, 40L, 50L, 1L, 10L),
      ("b", 1L, 100L, 110L, 1L, 10L)))
  }

  test("mergeIslands: contained interval does not reopen an island") {
    // [0,100] swallows [10,20]; a later [30,40] is still inside the
    // running max even though it starts after the PREVIOUS row's end
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L))
      .toDF("key", "start_epoch", "end_epoch")
    val out = Intervals.mergeIslands(iv).collect()
    assert(out.length == 1 && out.head.getAs[Long]("covered_sec") == 100L)
  }

  test("coverage: union seconds, island count, max gap") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 50L, 60L), ("a", 90L, 95L))
      .toDF("key", "start_epoch", "end_epoch")
    val row = Intervals.coverage(iv).collect().head
    assert(row.getAs[Long]("covered_sec") == 20L + 10L + 5L)
    assert(row.getAs[Long]("n_islands") == 3L)
    assert(row.getAs[Long]("n_intervals") == 4L)
    assert(row.getAs[Long]("max_gap_sec") == 30L) // 50 − 20
    assert(row.getAs[Long]("first_start") == 0L)
    assert(row.getAs[Long]("last_end") == 95L)
  }

  test("gap-fill interpolates rising and falling segments exactly") {
    val obs = Seq(
      ("r", 0L, 100L), ("r", 4L, 300L),  // rising: +50/bucket
      ("f", 0L, 300L), ("f", 2L, 100L))  // falling: −100/bucket
      .toDF("key", "bucket", "value")
    val out = GapFill.linear(obs).orderBy("key", "bucket")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("f", 0L, 300L, "obs"), ("f", 1L, 200L, "interp"), ("f", 2L, 100L, "obs"),
      ("r", 0L, 100L, "obs"), ("r", 1L, 150L, "interp"),
      ("r", 2L, 200L, "interp"), ("r", 3L, 250L, "interp"),
      ("r", 4L, 300L, "obs")))
  }

  test("gap-fill: single observation yields a single obs row") {
    val obs = Seq(("k", 7L, 42L)).toDF("key", "bucket", "value")
    val out = GapFill.linear(obs).as[(String, Long, Long, String)]
      .collect().toSeq
    assert(out == Seq(("k", 7L, 42L, "obs")))
  }

  test("triangle counts: triangle + pendant, duplicate edges collapse") {
    // triangle {1,2,3} plus pendant 4 off node 3; duplicates and
    // reversed copies must not change counts
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val out = Graphs.triangleCounts(e).orderBy("node")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 1000000L),          // closed pair → ppm 10⁶
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L),           // 2·10⁶·1 div (3·2)
      (4L, 1L, 0L, 0L)))
  }

  test("triangle counts: square has no triangles") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(Graphs.triangleCounts(e).agg(sum("triangles")).as[Long]
      .collect().head == 0L)
  }

  test("priority sample: deterministic, k rows, priority formula exact") {
    val d = (1L to 200L).map(i => (i, 1L + i % 13)).toDF("doc_id", "w")
    val s1 = Sampling.prioritySample(d, "w", "doc_id", k = 20)
      .select("doc_id", "w", "u48", "priority")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val s2 = Sampling.prioritySample(d, "w", "doc_id", k = 20)
      .select("doc_id", "w", "u48", "priority")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s1 == s2 && s1.length == 20)
    s1.foreach { case (_, w, u, p) => assert(p == u * 1000L / w) }
    // priorities ascend (the k smallest)
    assert(s1.map(_._4) == s1.map(_._4).sorted)
  }

  test("priority sample favors heavy rows: a 10^6-weight row is kept") {
    val d = ((1L to 99L).map(i => (i, 1L)) :+ (100L, 1000000L))
      .toDF("doc_id", "w")
    val kept = Sampling.prioritySample(d, "w", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().toSet
    // u48 < 2^48 → heavy row's priority < 2^48·1000/10⁶ < 2^38, while a
    // weight-1 row needs u48 < 2^38/1000 ≈ 2^28.4 of 2^48 — odds 1e-6
    // per row; with 99 rows the heavy row outranks ~all of them
    assert(kept.contains(100L))
  }

  test("rolling range frame: absent days shrink the window") {
    val daily = Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 9L, 30L))
      .toDF("key", "day", "cents")
    val out = graft.operators.SeriesMath
      .rollingRange(daily, "key", "day", "cents", windowDays = 7)
      .orderBy("day")
      .select("day", "rolling_cents", "rolling_days")
      .as[(Long, Long, Long)].collect().toSeq
    // day 9's trailing 7-day range [3, 9] holds only day 9 — a ROWS
    // frame would wrongly reach back to days 0 and 1
    assert(out == Seq((0L, 10L, 1L), (1L, 30L, 2L), (9L, 30L, 1L)))
  }

  test("weekly profile: epoch-arithmetic phase, ppm share, peak flag") {
    def ts(epoch: Long) = new Timestamp(epoch * 1000)
    // hour-of-week 0 twice (one exactly a week later), hour 5 once
    val ev = Seq(("x", ts(0)), ("x", ts(604800)), ("x", ts(5 * 3600)))
      .toDF("k", "ts")
    val out = graft.operators.SeriesMath.weeklyProfile(ev, "k", "ts")
      .orderBy("hour_of_week")
      .select("hour_of_week", "n_events", "share_ppm", "is_peak")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((0L, 2L, 666666L, true), (5L, 1L, 333333L, false)))
  }

  test("k-core peels pendant chains one node per round; converged pins it") {
    // triangle {1,2,3} + chain 3−4−5: k=2 needs two rounds
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val done = Graphs.kCore(e, k = 2, iters = 2).orderBy("node")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(done == Seq((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
    // one round is not enough: node 4 is still there at degree 1
    val short = Graphs.kCore(e, k = 2, iters = 1).orderBy("node")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(short == Seq((1L, 2L, false), (2L, 2L, false), (3L, 3L, false),
      (4L, 1L, false)))
  }

  test("skyline: window dominance matches hand enumeration, ties kept") {
    val p = Seq((1L, 5L), (1L, 5L), (2L, 3L), (2L, 4L), (3L, 3L),
      (4L, 1L), (5L, 1L)).toDF("x", "y")
    // bucketWidth 2 exercises the cross-bucket prefix path
    val out = graft.operators.Skyline.pareto2D(p, "x", "y", bucketWidth = 2L)
      .orderBy("x", "y").as[(Long, Long)].collect().toSeq
    // (2,4) loses to (2,3); (3,3) to (2,3); (5,1) to (4,1); dup (1,5) kept
    assert(out == Seq((1L, 5L), (1L, 5L), (2L, 3L), (4L, 1L)))
  }

  test("skyline property: window form equals brute-force dominance on 300 points") {
    // deterministic pseudo-random points with duplicates and ties
    val pts = (1 to 300).map { i =>
      val h = i * 2654435761L
      (((h >>> 7) % 97).toLong, ((h >>> 17) % 89).toLong)
    }
    val brute = pts.filter { case (x, y) =>
      !pts.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y) }
    }.sorted
    val got = graft.operators.Skyline
      .pareto2D(pts.toDF("x", "y"), "x", "y", bucketWidth = 16L)
      .orderBy("x", "y").as[(Long, Long)].collect().toSeq
    assert(got == brute, s"window skyline diverged from the definition")
  }

  test("FD discovery: violating groups counted, null-only groups benign") {
    val d = Seq((1L, Some("x")), (1L, Some("x")), (2L, Some("y")),
      (2L, Some("z")), (3L, None), (3L, None)).toDF("a", "b")
    val out = graft.operators.Profiling.fdDiscover(d, Seq("a", "b"))
      .orderBy("lhs").as[(String, String, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(out == Seq(("a", "b", 3L, 1L, 333333L, false),
      ("b", "a", 4L, 0L, 0L, true)))
  }

  test("label propagation: min-label tie-break floods a component") {
    // path 1−2−3 plus isolated edge 10−11; synchronous, 3 rounds
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val out = Graphs.labelPropagation(e, iters = 3).orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    // round 1: 1→2's label? neighbors of 1 = {2} → label 2? no:
    // sync round 1: l(1)=2? neighbors' labels {2} → 2; l(2)=min(1,3)=1;
    // l(3)=2; l(10)=11, l(11)=10.
    // round 2: l(1)=l'(2)=1; l(2)=min(l'(1),l'(3))=2; l(3)=1;
    // l(10)=10, l(11)=11.
    // round 3: l(1)=2, l(2)=1, l(3)=2, l(10)=11, l(11)=10.
    assert(out == Seq((1L, 2L, 2L), (2L, 1L, 1L), (3L, 2L, 2L),
      (10L, 11L, 1L), (11L, 10L, 1L)))
  }

  test("session path n-grams: windows within sessions, never across") {
    def ts(epoch: Long) = new Timestamp(epoch * 1000)
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "B"),
      (1L, ts(20), 3L, "C"), (1L, ts(30), 4L, "D"),
      // user 2: session break between B and C — no 3-gram spans it
      (2L, ts(0), 5L, "A"), (2L, ts(10), 6L, "B"), (2L, ts(5000), 7L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Sessionize.pathNgrams(ev, "user_id", "ts",
        "event_id", "event_type", gapSec = 1800L, n = 3)
      .orderBy("path").as[(String, Long)].collect().toSeq
    assert(out == Seq(("A>B>C", 1L), ("B>C>D", 1L)))
  }

  test("association rules: support, confidence, lift on a hand fixture") {
    val rows = Seq(
      ("b1", "A"), ("b1", "B"), ("b1", "B"), // dup item collapses
      ("b2", "A"), ("b2", "B"),
      ("b3", "A"), ("b3", "C"),
      ("b4", "A"))
      .toDF("bk", "it")
    val out = graft.operators.AssocRules.pairs(rows, "bk", "it")
      .orderBy("item_a", "item_b")
      .select("item_a", "item_b", "n_a", "n_b", "n_ab", "support_ppm",
        "confidence_ppm", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      // A,B: n_ab=2 of 4 baskets; conf 2/4; lift 2·4/(4·2) = 1.0
      ("A", "B", 4L, 2L, 2L, 500000L, 500000L, 1000000L),
      // A,C: n_ab=1; conf 1/4; lift 1·4/(4·1) = 1.0
      ("A", "C", 4L, 1L, 1L, 250000L, 250000L, 1000000L)))
  }

  test("percentile rank: ties share rank, bounds are 0 and 10^6") {
    val df = Seq(("s", 10L, 1L), ("s", 20L, 2L), ("s", 20L, 3L),
      ("s", 30L, 4L), ("t", 5L, 5L))
      .toDF("source", "v", "id")
    val out = graft.operators.Profiling.percentileRank(df, "source", "v")
      .orderBy("id").select("id", "pct_rank_ppm")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L), (2L, 333333L), (3L, 333333L),
      (4L, 1000000L), (5L, 0L)))
  }

  test("inter-arrival: metronome scores 0, known variance exact") {
    def ts(epoch: Long) = new Timestamp(epoch * 1000)
    val ev = Seq(
      ("bot", ts(0), 1L), ("bot", ts(60), 2L), ("bot", ts(120), 3L),
      ("hum", ts(0), 4L), ("hum", ts(1), 5L), ("hum", ts(4), 6L))
      .toDF("k", "ts", "event_id")
    val out = graft.operators.Profiling.interArrival(ev, "k", "ts", "event_id")
      .orderBy("k").select("k", "n_gaps", "mean_gap_sec", "cv2_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    // hum gaps [1, 3]: sg=4, sg2=10 → var-num 2·10−16 = 4; cv² = 4e6//16
    assert(out == Seq(("bot", 2L, 60L, 0L), ("hum", 2L, 2L, 250000L)))
  }

  test("decayed counts: exact power-of-two weights and horizon cutoff") {
    def ts(epoch: Long) = new Timestamp(epoch * 1000)
    // half-life 100 s, K=3: ages 0,1,3 → 8+4+1; age 5 → beyond horizon
    val ev = Seq(
      ("a", ts(1000)), ("a", ts(901)), ("a", ts(700)), ("a", ts(400)),
      ("b", ts(1000)))
      .toDF("k", "ts")
    val out = Trending.decayedCounts(ev, "k", "ts",
        halfLifeSec = 100L, horizonHalfLives = 3)
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    // a: ages (1000−1000)/100=0 →8, (1000−901)/100=0 →8, 3 →1, 6 →0
    assert(out == Seq(
      ("a", 4L, 17L, 1000000L * 17 / (4 * 8)),
      ("b", 1L, 8L, 1000000L)))
  }
}
