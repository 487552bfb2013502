package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY gate (round 11): SURVEY.md §8 is the map the next builder
  * and the judge navigate the registry by, and round 10 shipped with two
  * registry names absent from it (q01_pricing_summary,
  * x110_text_normalize — present since round 1, never documented). This
  * spec pins registry-names ⊆ SURVEY text so the gap cannot reopen: a
  * new registry row must land with its SURVEY row in the same commit.
  */
class SurveySpec extends AnyFunSuite {

  test("every registry query id appears in SURVEY.md") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    // §8 refers to rows by short id ("x123 triangle census", "c01/c02");
    // require each id as a WORD (x12 must not pass on x121's row) —
    // either bare or as the prefix of the full registry name
    val missing = SparkEntry.queries.keys.toSeq.sorted.filterNot { name =>
      val id = name.takeWhile(_ != '_')
      ("(?<![A-Za-z0-9])" + java.util.regex.Pattern.quote(id) +
        "(?![A-Za-z0-9])").r.findFirstIn(survey).isDefined ||
        survey.contains(name)
    }
    assert(missing.isEmpty,
      s"registry names with no SURVEY.md row (add a §8 entry): $missing")
  }
}
