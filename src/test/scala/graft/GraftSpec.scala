package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSpec.session

  /** sf0.001 test tables (driver-generated, read-only). */
  val sfDir = "/root/testdata/sf0.001"

  /** Write a tiny documents-shaped parquet dir for focused dedup/text
    * tests; returns the dir path usable as an sfDir. */
  def writeDocs(docs: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}

object GraftSpec {
  lazy val session: SparkSession = {
    // Fixtures built via java.sql.Timestamp.valueOf (local wall time) and
    // assertions on Timestamp.toString both render in the JVM default tz;
    // the session tz is UTC — pin the JVM default so the two agree on any
    // host (fractional offsets, DST near fixture dates).
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // as in Bench/Verify: manifest-backed catalog stats reach planning
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(s)
    s
  }
}
