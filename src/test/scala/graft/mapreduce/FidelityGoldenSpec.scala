package graft.mapreduce

import graft.GraftSpec
import java.nio.file.{Files, Paths}

/** BYTE-parity against the reference's own large-corpus goldens
  * (`tests/test_master_08.py:169-179`): runs the ~3.7 MB
  * `tests/testdata/input_large` word-count job through the per-file map
  * mode + fidelity group partitioning and diffs the two partition files
  * against `test_master_08/correct/job-0/grouper-output/reduce01/02`
  * byte for byte.
  *
  * This closes the last fidelity question: the striping, per-file pipe,
  * merged sort order (the corpus is BMP-only, so Java's UTF-16 code-unit
  * string order equals Python's code-point order), distinct-line
  * round-robin assignment, and within-partition ordering all have to be
  * exactly the reference's for ~700k golden lines to match.
  */
class FidelityGoldenSpec extends GraftSpec {

  private val refTestdata = "/root/reference/tests/testdata"
  private val inputLarge = s"$refTestdata/input_large"
  private val golden = s"$refTestdata/test_master_08/correct/job-0/grouper-output"

  // The reference's wc_map.sh, with one substitution: the goldens were
  // generated under a MULTIBYTE-aware `tr '[:upper:]' '[:lower:]'`
  // (golden has à where the corpus has À), while this container's GNU tr
  // is byte-oriented and would leave non-ASCII uppercase untouched. A
  // python3 `str.lower()` stage reproduces the golden's lowercasing
  // exactly (verified byte-for-byte against both goldens).
  private val wcMapUnicode = Seq("sh", "-c",
    "tr ' \\t' '\\n\\n' | python3 -c 'import sys\n" +
      "for l in sys.stdin: sys.stdout.write(l.lower())' | " +
      """awk '{print $1 "\t1"}'""")

  test("input_large through perFileMap + fidelity partitioning is byte-equal " +
    "to the reference's reduce01/reduce02 goldens") {
    assume(Files.exists(Paths.get(inputLarge)) && Files.exists(Paths.get(golden)))
    val mapDir = Files.createTempDirectory("fidelity-map-").toString
    // 2 mappers, like the reference test's two workers: file01+file03 →
    // task 0, file02+file04 → task 1 (sorted round-robin striping)
    PerFileJob.pipeDirectory(spark, inputLarge, wcMapUnicode, mapDir, 2)
    val mapped = spark.sparkContext.textFile(mapDir, 2)
    val parts = MapReduceJob.groupStageFidelity(mapped, 2).glom().collect()
    assert(parts.length === 2)
    val gotReduce01 = parts(0).mkString("", "\n", "\n")
    val gotReduce02 = parts(1).mkString("", "\n", "\n")
    val wantReduce01 = Files.readString(Paths.get(s"$golden/reduce01"))
    val wantReduce02 = Files.readString(Paths.get(s"$golden/reduce02"))
    // compare sizes first for a readable failure before the full diff
    assert(gotReduce01.length === wantReduce01.length)
    assert(gotReduce02.length === wantReduce02.length)
    assert(gotReduce01 === wantReduce01)
    assert(gotReduce02 === wantReduce02)
  }
}
