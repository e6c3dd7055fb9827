package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed docs/OPERATORS.md must BE the current render of
  * CatalogDoc: adding or renaming a declared query without regenerating
  * (`sbt "runMain graft.CatalogDoc"`) fails here — the "generated so it
  * can't rot" claim, enforced rather than promised. No Spark session
  * needed (pure file IO over the source tree). */
class CatalogDocSpec extends AnyFunSuite {

  test("docs/OPERATORS.md is the current CatalogDoc render") {
    val (doc, missing) = CatalogDoc.render()
    assert(missing.isEmpty,
      s"queries with no findable declaration site: ${missing.mkString(", ")}")
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("docs/OPERATORS.md"))
    assert(committed == doc,
      "docs/OPERATORS.md is stale — regenerate with: sbt \"runMain graft.CatalogDoc\"")
  }

  test("SURVEY.md and README.md carry the CURRENT declared-query count (round-8 verdict #7)") {
    // the hand-written docs quote the catalog size; this pins the quoted
    // number to SparkEntry.defs so it cannot rot again (r8 found both at a
    // twice-stale 81 vs the actual 85)
    val phrase = s"${SparkEntry.defs.size} declared queries"
    Seq("SURVEY.md", "README.md").foreach { f =>
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(f))
      assert(text.contains(phrase),
        s"$f does not contain '$phrase' — update its catalog count to ${SparkEntry.defs.size}")
      val stale = """\b(\d+) declared queries""".r
        .findAllMatchIn(text).map(_.group(1).toInt).toSet
      assert(stale == Set(SparkEntry.defs.size),
        s"$f quotes stale catalog counts: $stale (current: ${SparkEntry.defs.size})")
    }
  }
}
