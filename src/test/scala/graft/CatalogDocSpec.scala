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
}
