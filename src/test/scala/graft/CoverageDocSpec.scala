package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md drifted behind the declared surface two rounds in a row;
  * this pins its Status line to the ACTUAL `SparkEntry` maps so `sbt test`
  * fails the moment a new query lands without the doc update. */
class CoverageDocSpec extends AnyFunSuite {

  test("COVERAGE.md Status line matches SparkEntry.queries/oracleSql") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val re = """Status: (\d+) queries, (\d+) .?oracle, (\d+) rows-only""".r
    val m = re.findFirstMatchIn(text).getOrElse(
      fail("COVERAGE.md has no parseable 'Status: N queries, M ✔oracle, K rows-only' line"))
    val nQueries = SparkEntry.queries.size
    val nOracle = SparkEntry.oracleSql.size
    assert(m.group(1).toInt === nQueries,
      s"COVERAGE.md says ${m.group(1)} queries but SparkEntry declares $nQueries")
    assert(m.group(2).toInt === nOracle,
      s"COVERAGE.md says ${m.group(2)} oracle-checked but SparkEntry declares $nOracle")
    assert(m.group(3).toInt === nQueries - nOracle,
      s"COVERAGE.md rows-only count must be queries minus oracles ($nQueries - $nOracle)")
    // every declared oracle key must be a declared query (no orphans)
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }
}
