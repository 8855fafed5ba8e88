package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Mechanical oracle-dtype lint — the class-killer for the bug that
 * cost round 11 (`q_bpe_merges`) and round 12 (`q_rolling`) their
 * only red cells: a DuckDB `SUM` over an integral expression returns
 * HUGEINT, which the driver's pandas-level comparator materializes as
 * float64, so an oracle column that is a bare pass-through of an
 * uncast SUM alias hash-mismatches Spark's int64 even when every
 * value is identical.
 *
 * The invariant enforced here is exactly the failure shape: no
 * final-select item of any oracle may be (R1) an uncast top-level
 * `SUM(...)` expression, or (R2) a bare reference to an alias whose
 * definition is an uncast `SUM(...)` anywhere in the statement
 * (taint propagates through bare `alias AS newname` renames, which
 * preserve the dtype). Intermediate HUGEINT arithmetic that is
 * divided/cast before projection is deliberately allowed — several
 * oracles compute in HUGEINT on purpose to avoid int64 overflow.
 *
 * This is the static half; the dynamic half (pandas dtype compare of
 * every oracle against every Spark parquet output) runs in
 * `tools/check.py`, which mirrors the driver's comparator. The two
 * together make the artifact class unshippable.
 */
class OracleLintSpec extends AnyFunSuite {

  private def findClose(s: String, open: Int): Int = {
    var d = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Aliases defined as `SUM(...) [OVER (...)] AS alias` with no
    * directly-enclosing CAST. */
  private def uncastSumAliases(sql: String): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    val sumRe = "(?i)\\bSUM\\s*\\(".r
    for (m <- sumRe.findAllMatchIn(sql)) {
      val before = sql.substring(0, m.start).reverse
      val castWrapped = "(?is)^\\s*\\(\\s*TSAC\\b.*".r.matches(before)
      if (!castWrapped) {
        val close = findClose(sql, m.end - 1)
        if (close >= 0) {
          var restI = close + 1
          "(?is)^\\s*OVER\\s*\\(.*".r.findFirstMatchIn(sql.substring(restI))
            .foreach { _ =>
              val overOpen = sql.indexOf('(',
                restI + sql.substring(restI).toUpperCase.indexOf("OVER"))
              val c2 = findClose(sql, overOpen)
              if (c2 >= 0) restI = c2 + 1
            }
          "(?is)^\\s*AS\\s+([A-Za-z_][A-Za-z0-9_]*).*".r
            .findFirstMatchIn(sql.substring(restI))
            .foreach(am => out += am.group(1).toLowerCase)
        }
      }
    }
    out.toSet
  }

  /** Dtype taint flows through bare `tainted AS newname` renames. */
  private def taintClosure(sql: String, seed: Set[String]): Set[String] = {
    var tainted = seed
    var changed = true
    while (changed) {
      changed = false
      for (t <- tainted) {
        val re = ("(?i)\\b" + java.util.regex.Pattern.quote(t) +
          "\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)").r
        for (m <- re.findAllMatchIn(sql)) {
          val a = m.group(1).toLowerCase
          if (!tainted.contains(a)) { tainted += a; changed = true }
        }
      }
    }
    tainted
  }

  /** Items of the LAST depth-0 SELECT's projection list. */
  private def finalSelectItems(sql: String): Seq[String] = {
    val up = sql.toUpperCase
    var d = 0; var last = -1
    for (i <- sql.indices) {
      sql.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      if (d == 0 && up.startsWith("SELECT", i) &&
        (i == 0 || !(Character.isLetterOrDigit(up.charAt(i - 1)) ||
          up.charAt(i - 1) == '_'))) last = i
    }
    if (last < 0) return Nil
    var end = sql.length
    d = 0
    var i = last + 6
    while (i < sql.length && end == sql.length) {
      sql.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      if (d == 0 && up.startsWith("FROM", i) &&
        !(Character.isLetterOrDigit(up.charAt(i - 1)) ||
          up.charAt(i - 1) == '_')) end = i
      i += 1
    }
    val body = sql.substring(last + 6, end)
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    d = 0
    for (ch <- body) {
      ch match {
        case '(' => d += 1; cur += ch
        case ')' => d -= 1; cur += ch
        case ',' if d == 0 => items += cur.result().trim; cur.clear()
        case _ => cur += ch
      }
    }
    val tailItem = cur.result().trim
    if (tailItem.nonEmpty) items += tailItem
    items.toSeq
  }

  private def violations(sql: String): Seq[String] = {
    val tainted = taintClosure(sql, uncastSumAliases(sql))
    finalSelectItems(sql).flatMap { item =>
      val r1 = "(?is)^SUM\\s*\\(.*".r.matches(item)
      // optional table qualifier: `d.s` passes the dtype through just
      // as `s` does, and the board already projects qualified columns
      // (q_fd_discover2's `l2.n_violating`) — round-13 review hole
      val bare =
        "(?is)^(?:[A-Za-z_][A-Za-z0-9_]*\\.)?([A-Za-z_][A-Za-z0-9_]*)(\\s+AS\\s+\\w+)?$".r
          .findFirstMatchIn(item)
      val r2 = bare.exists(m => tainted.contains(m.group(1).toLowerCase))
      if (r1) Some(s"uncast top-level SUM in final select: ${item.take(60)}")
      else if (r2) Some(s"bare pass-through of uncast SUM alias: $item")
      else None
    }
  }

  test("the lint catches the exact round-12 q_rolling artifact") {
    val buggy =
      """WITH d AS (SELECT k, SUM(CAST(v AS BIGINT)) AS cents FROM t GROUP BY 1)
        |SELECT k, cents FROM d""".stripMargin
    assert(violations(buggy).exists(_.contains("cents")))
    val fixed =
      """WITH d AS (SELECT k, SUM(CAST(v AS BIGINT)) AS cents FROM t GROUP BY 1)
        |SELECT k, CAST(cents AS BIGINT) AS cents FROM d""".stripMargin
    assert(violations(fixed).isEmpty)
  }

  test("the lint catches a table-QUALIFIED pass-through of the tainted alias") {
    val qualified =
      """WITH d AS (SELECT k, SUM(v) AS s FROM t GROUP BY 1)
        |SELECT d.k, d.s FROM d""".stripMargin
    assert(violations(qualified).exists(_.contains("d.s")))
  }

  test("the lint catches a rename laundering the tainted alias") {
    val laundered =
      """WITH d AS (SELECT k, SUM(v) AS s FROM t GROUP BY 1),
        |e AS (SELECT k, s AS s2 FROM d)
        |SELECT k, s2 FROM e""".stripMargin
    assert(violations(laundered).exists(_.contains("s2")))
  }

  test("no oracle on the board projects an uncast SUM dtype") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => violations(sql).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, "HUGEINT-dtype leak (driver comparator reads it " +
      "as float64 vs Spark int64):\n" + bad.mkString("\n"))
  }
}
