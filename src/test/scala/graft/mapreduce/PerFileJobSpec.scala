package graft.mapreduce

import graft.GraftSpec

/** Per-file fidelity contracts from the reference's worker tests:
  * one mapper subprocess per input file, output named `basename(input)`
  * (`mapreduce/worker/__main__.py:109-117`), sorted-file round-robin task
  * striping (`mapreduce/master/__main__.py:291-295`), and the unordered
  * output-set golden of `tests/test_worker_04.py:99-107`.
  */
class PerFileJobSpec extends GraftSpec {

  // The reference's wc_map.sh: space/tab → newline, lowercase, "<tok>\t1"
  // per line (a trailing newline yields the blank-key line "\t1" — the
  // golden in test_worker_04 includes it).
  private val wcMap = Seq("sh", "-c",
    """tr ' \t' '\n\n' | tr '[:upper:]' '[:lower:]' | awk '{print $1 "\t1"}'""")

  private def mkInput(files: (String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("perfile-in-").toString
    files.foreach { case (name, content) =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), content)
    }
    dir
  }

  test("stripe assigns sorted files round-robin (ref master:291-295)") {
    val files = Seq("f1", "f2", "f3", "f4", "f5")
    assert(PerFileJob.stripe(files, 2) ===
      Seq((0, "f1"), (1, "f2"), (0, "f3"), (1, "f4"), (0, "f5")))
    // more tasks than files → one file per task
    assert(PerFileJob.stripe(Seq("a", "b"), 4) === Seq((0, "a"), (1, "b")))
  }

  test("per-file map: output named basename, golden of test_worker_04") {
    // the reference fixtures end "\n\n" (verified: tests/testdata/input/
    // file02 = ...Hadoop\x0a\x0a) — the empty last record produces the
    // blank-key "\t1" line present in the reference's golden
    val in = mkInput(
      "file01" -> "Hello World Bye World\n\n",
      "file02" -> "Hello Hadoop Goodbye Hadoop\n\n")
    val out = java.nio.file.Files.createTempDirectory("perfile-out-").toString
    val written = PerFileJob.pipeDirectory(spark, in, wcMap, out, 2)
    assert(written.sorted === Seq("file01", "file02"))
    assert(new java.io.File(out).listFiles().map(_.getName).sorted ===
      Array("file01", "file02"))
    // the reference's golden: unordered line-set equality per output file
    val got = scala.io.Source.fromFile(s"$out/file02").getLines().toSeq
    assert(got.sorted === Seq("\t1", "goodbye\t1", "hadoop\t1", "hadoop\t1", "hello\t1").sorted)
    val got1 = scala.io.Source.fromFile(s"$out/file01").getLines().toSeq
    assert(got1.sorted === Seq("\t1", "bye\t1", "hello\t1", "world\t1", "world\t1").sorted)
  }

  test("per-file mode failing executable fails the job (exit-code hardening)") {
    val in = mkInput("file01" -> "x\n")
    val out = java.nio.file.Files.createTempDirectory("perfile-out-").toString
    val e = intercept[org.apache.spark.SparkException] {
      PerFileJob.pipeDirectory(spark, in, Seq("sh", "-c", "exit 3"), out, 1)
    }
    assert(e.getMessage.contains("exited 3") || e.getCause != null)
  }

  test("full run() with perFileMap matches row-level mode's result") {
    val wcReducer = Seq("awk", "-F", "\t",
      """$1 != prev { if (n > 0) print prev "\t" c; prev = $1; c = 0 } { c += $2; n += 1 } END { if (n > 0) print prev "\t" c }""")
    val in = mkInput(
      "file01" -> "Hello World Bye World\n",
      "file02" -> "Hello Hadoop Goodbye Hadoop\n")
    def readAll(out: String): Map[String, Long] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("outputfile"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines())
        .filter(_.contains('\t'))
        .map { l => val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1).toLong) }
        .toMap
    val outA = java.nio.file.Files.createTempDirectory("perfile-run-").toString + "/a"
    val outB = java.nio.file.Files.createTempDirectory("perfile-run-").toString + "/b"
    MapReduceJob.run(spark, JobSpec(wcMap, wcReducer, 2, 2, in, outA, perFileMap = true))
    MapReduceJob.run(spark, JobSpec(wcMap, wcReducer, 2, 2, in, outB))
    assert(readAll(outA) === readAll(outB))
    assert(readAll(outA)("hello") === 2L)
  }
}
