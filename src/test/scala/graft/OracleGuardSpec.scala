package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static guard over every oracle statement for the bug class that has
  * now cost two rounds' perfect correctness scores (r9 ADVICE, r13
  * q11_stock): DuckDB widens `sum(BIGINT)` to HUGEINT while Spark keeps
  * BIGINT, and the driver hashes TYPED cells — so an oracle that emits a
  * raw `sum(...)` as a compared output column hash-mismatches even when
  * every value is identical. The fix is always `CAST(sum(...) AS
  * BIGINT/DOUBLE)`; this spec makes forgetting it a test failure instead
  * of a red CORRECTNESS row a round later.
  *
  * Mechanics: for each oracle SQL we extract every paren-depth-0 SELECT
  * output list (CTE bodies sit at depth ≥ 1 and are never compared;
  * depth-0 UNION arms are). Any `sum(` inside such a list must be
  * wrapped in a CAST — including scalar subquery sums, which DuckDB
  * widens identically. `count(*)`/`avg(...)` agree across engines
  * (BIGINT/DOUBLE both sides) and are exempt.
  */
class OracleGuardSpec extends AnyFunSuite {

  /** name → why its depth-0 output-list sum( needs no CAST. Keep this
    * empty unless the summed column is provably DOUBLE on both sides. */
  private val allowlist: Map[String, String] = Map.empty

  /** Depth-0 `SELECT ... FROM` output-list regions of `sql`. */
  private def outputLists(sql: String): Seq[String] = {
    val s = sql
    val up = sql.toUpperCase
    var depth = 0
    var i = 0
    var selStart = -1
    val out = Seq.newBuilder[String]
    def kw(at: Int, word: String): Boolean =
      up.startsWith(word, at) &&
        (at == 0 || !up(at - 1).isLetterOrDigit && up(at - 1) != '_') &&
        (at + word.length >= up.length ||
          !up(at + word.length).isLetterOrDigit && up(at + word.length) != '_')
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' => // skip string literal
          i += 1
          while (i < s.length && s(i) != '\'') i += 1
        case _ =>
          if (depth == 0) {
            if (kw(i, "SELECT") && selStart < 0) selStart = i + 6
            else if (kw(i, "FROM") && selStart >= 0) {
              out += s.substring(selStart, i); selStart = -1
            }
          }
      }
      i += 1
    }
    if (selStart >= 0) out += s.substring(selStart) // SELECT with no FROM
    out.result()
  }

  /** True when some `sum(` in `list` sits outside every CAST(...) span —
    * `CAST(10000 * sum(a) // sum(b) AS BIGINT)` is fine (the compared
    * cell is the CAST's type); a bare `sum(v) AS alias` is the bug. */
  private def uncastSum(list: String): Option[String] = {
    val up = list.toUpperCase
    // balanced-paren spans of every CAST( ... )
    val spans = Seq.newBuilder[(Int, Int)]
    var c = up.indexOf("CAST")
    while (c >= 0) {
      val open = up.indexOf('(', c + 4)
      if (open >= 0 && up.substring(c + 4, open).forall(_.isWhitespace)) {
        var d = 1; var j = open + 1
        while (j < up.length && d > 0) {
          if (up(j) == '(') d += 1 else if (up(j) == ')') d -= 1
          j += 1
        }
        spans += ((c, j))
      }
      c = up.indexOf("CAST", c + 4)
    }
    val casted = spans.result()
    var from = up.indexOf("SUM(")
    while (from >= 0) {
      val isWord = from == 0 ||
        (!up(from - 1).isLetterOrDigit && up(from - 1) != '_')
      if (isWord && !casted.exists(s => from > s._1 && from < s._2))
        return Some(list.substring(from, math.min(list.length, from + 60)))
      from = up.indexOf("SUM(", from + 1)
    }
    None
  }

  test("every compared oracle sum( output column is CAST-wrapped") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !allowlist.contains(name) =>
        outputLists(sql).flatMap(uncastSum).headOption
          .map(frag => s"$name: un-CAST sum in compared output: `$frag`")
      case _ => None
    }
    assert(bad.isEmpty,
      s"${bad.length} oracle(s) emit a raw sum( the driver will hash as " +
        s"DuckDB HUGEINT (the q11_stock r13 red):\n${bad.mkString("\n")}")
  }

  test("guard self-check: catches the exact q11_stock r13 shape") {
    val red = "WITH ps AS (SELECT a, b FROM t)\n" +
      "SELECT k, sum(v) AS s FROM ps GROUP BY k HAVING sum(v) > 0"
    assert(outputLists(red).flatMap(uncastSum).nonEmpty)
    val green = "WITH ps AS (SELECT sum(raw) AS v FROM t GROUP BY k)\n" +
      "SELECT k, CAST(sum(v) AS BIGINT) AS s FROM ps GROUP BY k"
    assert(outputLists(green).flatMap(uncastSum).isEmpty)
  }
}
