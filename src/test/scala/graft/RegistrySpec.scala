package graft

/** Registry/SURVEY consistency — the invariants the round review
  * checks by hand, pinned mechanically:
  *  - every registered query name is declared somewhere in SURVEY §2
  *    (no undeclared queries);
  *  - every oracle has a query (the driver contract);
  *  - names stay bench-JSON-safe (word characters only, so the bench
  *    line and the driver's parser cannot be corrupted by a name). */
class RegistrySpec extends SparkSpec {

  private lazy val surveySection2: String = {
    val full = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val start = full.indexOf("## §2")
    val end = full.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 markers missing")
    full.substring(start, end)
  }

  test("every registered query is declared in SURVEY §2") {
    // word-token capture (not backtick-bounded): rows listing several
    // queries inside one backtick pair must still count as declared
    val declared = "\\bq[a-z0-9_]+\\b".r.findAllIn(surveySection2).toSet
    val missing = SparkEntry.queries.keySet.filterNot(declared.contains)
    assert(missing.isEmpty, s"queries not declared in SURVEY §2: $missing")
  }

  test("every oracle key has a query and names are bench-safe") {
    SparkEntry.oracleSql.keys.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k"))
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("^q[a-z0-9_]*$"), s"unsafe query name: $k"))
  }
}
