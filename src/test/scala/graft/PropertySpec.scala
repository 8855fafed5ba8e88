package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model._
import graft.streaming.AlarmStream
import graft.streaming.AlarmStream.{AlarmState, SeriesPoint}

/** Property-based coverage (SURVEY §5.2): alarm monotonicity,
  * unique_id charset/stability invariants, ingest record round-trip. */
class PropertySpec extends AnyFunSuite {

  /** Minimal deterministic property driver (scalatestplus bridge is
    * not on the offline classpath): evaluate `f` over `n` samples. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 200)(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 200)(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc), n) { case (a, b, c) => f(a, b, c) }

  private val nameGen = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(20))
  private val metricGen = for {
    ns <- nameGen; n <- nameGen
    f <- Gen.oneOf(Frequency.all)
    dims <- Gen.listOfN(2, Gen.zip(nameGen, nameGen)).map(_.map {
      case (a, b) => Dimension(a, b) })
  } yield Metric(ns, n, f, "Sum", Widget("d"), dimensions = dims)

  test("unique_id contains only word chars, is lowercase, and is stable") {
    forAll(metricGen) { m =>
      val id = m.uniqueId
      assert(id.matches("[a-z0-9_]*"))
      assert(id == m.uniqueId) // derivation is pure
      assert(id == id.toLowerCase)
    }
  }

  test("*Bucket dimensions never influence keys") {
    forAll2(metricGen, nameGen) { (m, v) =>
      val withBucket = m.copy(dimensions = m.dimensions :+ Dimension(v + "Bucket", "x"))
      assert(withBucket.uniqueId == m.uniqueId)
      assert(withBucket.alarmUniqueId == m.alarmUniqueId)
    }
  }

  test("alarm machine: more breaching datapoints never un-alarms (monotonicity)") {
    val valuesGen = Gen.listOfN(8, Gen.chooseNum(0.0, 10.0))
    forAll3(valuesGen, Gen.chooseNum(1, 4), Gen.chooseNum(1, 4)) { (vs, m0, n0) =>
      val n = math.max(m0, n0); val m = math.min(m0, n0)
      def run(values: List[Double]): String = {
        val pts = values.zipWithIndex.map { case (v, i) =>
          SeriesPoint("s", i * 60L, Some(v), 60L, 5.0,
            "GREATER_THAN_THRESHOLD", m, n, "NOT_BREACHING") }
        AlarmStream.advance(pts.iterator, AlarmState(Nil, Nil, "OK", None, None))._1.state
      }
      val base = run(vs)
      // raise every value above threshold → breach count can only grow
      val raised = run(vs.map(v => math.max(v, 6.0)))
      assert(!(base == "ALARM" && raised == "OK"),
        s"raising values un-alarmed: $vs")
    }
  }

  test("comparison operators are complementary at the boundary") {
    forAll2(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0)) { (v, t) =>
      import ComparisonOperator._
      assert(GreaterThanThreshold.breaches(v, t) != LessThanOrEqualToThreshold.breaches(v, t))
      assert(GreaterThanOrEqualToThreshold.breaches(v, t) != LessThanThreshold.breaches(v, t))
    }
  }

  test("metrics records survive to_json -> from_json round-trip") {
    // the ingest contract: a record serialized by the producer parses
    // back against the fixed schema with no field loss
    val spark = SparkTestBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, from_json, to_json, struct}
    val df = Seq(("2024-01-02T03:00:00", "NS", "N", 3600, "hour", "Sum",
        """{"k": "v"}""", null.asInstanceOf[String], "acct",
        "2024-01-02T03:00:00", 7.5f, "u1", "N"))
      .toDF(graft.catalog.Schemas.metrics.fieldNames: _*)
    val back = df.select(from_json(to_json(struct(df.columns.map(col): _*)),
      graft.catalog.Schemas.metrics).as("r")).select("r.*")
    assert(back.collect().head == df.collect().head)
    assert(back.schema == graft.catalog.Schemas.metrics)
  }

  test("frequency round-trips by name") {
    forAll(Gen.oneOf(Frequency.all)) { f =>
      assert(Frequency.fromName(f.name) == f)
    }
  }
}
