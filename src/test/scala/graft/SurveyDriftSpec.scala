package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-13 drift guard: q111 shipped green in the driver but
  * invisible in SURVEY.md §2.3 and README's inventory — exactly the
  * divergence the survey exists to prevent. These checks tie the three
  * surfaces together so a new `SparkEntry.queries` entry cannot merge
  * without its survey row (and vice versa: a survey row cannot name a
  * query that does not exist). Pure file/map comparison — no Spark. */
class SurveyDriftSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  /** §2.3 table ids: lines shaped `| `qNNN_name` | …`. */
  private def surveyIds: Set[String] = {
    val s = read("SURVEY.md")
    val sec = s.substring(s.indexOf("### 2.3"))
    "\\|\\s*`(q\\d+_[a-z0-9_]+)`".r.findAllMatchIn(sec).map(_.group(1)).toSet
  }

  test("every registered query has a SURVEY.md §2.3 row") {
    val missing = SparkEntry.queries.keySet -- surveyIds
    assert(missing.isEmpty,
      s"registered but missing from SURVEY.md §2.3: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every SURVEY.md §2.3 row is a registered query") {
    val phantom = surveyIds -- SparkEntry.queries.keySet
    assert(phantom.isEmpty,
      s"in SURVEY.md §2.3 but not registered: ${phantom.toSeq.sorted.mkString(", ")}")
  }

  test("every registered query id appears in README") {
    val readme = read("README.md")
    // README groups ids in prose ("q15–q18, q21, …"): collect every
    // bare qNNN token plus every number covered by a qA–qB range — the
    // guard is presence, not prose.
    val singles = "(?<![0-9a-zA-Z])q(\\d+)(?![0-9])".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSet
    val ranged = "q(\\d+)\\s*[–-]\\s*q(\\d+)".r.findAllMatchIn(readme)
      .flatMap(m => m.group(1).toInt to m.group(2).toInt).toSet
    val covered = singles ++ ranged
    val missing = SparkEntry.queries.keySet.filterNot { q =>
      covered.contains(q.drop(1).takeWhile(_.isDigit).toInt)
    }
    assert(missing.isEmpty,
      s"registered but missing from README: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every query has an oracle or a documented rows-only waiver") {
    // the correctness gate is oracle SQL; the rows-only queries are
    // a DOCUMENTED design decision (q33 HLL++ estimates, q84/q119/
    // q122/q126 trained k-means fixed points) — anything else missing
    // an oracle is drift
    val waived =
      Set("q33_approx_distinct", "q84_trained_ann",
        "q119_quantizer_drift", "q122_hybrid_trained",
        "q126_hybrid_drift", "q129_recall_trained")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- waived
    assert(missing.isEmpty,
      s"registered without oracle SQL (and not waived): ${missing.toSeq.sorted.mkString(", ")}")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"oracle SQL for unregistered queries: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
