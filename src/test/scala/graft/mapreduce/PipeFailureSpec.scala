package graft.mapreduce

import graft.GraftSpec

/** The reference silently ignores executable exit codes
  * (`mapreduce/worker/__main__.py:116` runs subprocesses without
  * check=True — SURVEY.md §7 "what's hard"). This engine deliberately
  * fails the job instead: a mapper that crashes must not yield a
  * silently-truncated result.
  */
class PipeFailureSpec extends GraftSpec {

  test("non-zero mapper exit fails the job instead of truncating output") {
    val rdd = spark.sparkContext.parallelize(Seq("a", "b"), 1)
    val spec = JobSpec(Seq("sh", "-c", "head -1; exit 3"), Seq.empty, 1, 1)
    val e = intercept[org.apache.spark.SparkException] {
      MapReduceJob.runLines(rdd, spec).collect()
    }
    assert(e.getMessage.contains("3") || e.getCause != null)
  }

  test("mapper emitting nothing yields an empty result, not an error") {
    val rdd = spark.sparkContext.parallelize(Seq("x", "y"), 2)
    val spec = JobSpec(Seq("sh", "-c", "grep -F zzz || true"), Seq.empty, 2, 2)
    assert(MapReduceJob.runLines(rdd, spec).collect().isEmpty)
  }
}
