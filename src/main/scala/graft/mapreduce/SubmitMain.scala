package graft.mapreduce

import org.apache.spark.sql.SparkSession

/** CLI twin of the reference's `mapreduce-submit` (`mapreduce/submit.py`):
  * builds a job spec and runs it — here the "master" is the SparkSession,
  * so submission and execution collapse into one process. Defaults mirror
  * the reference's (4 mappers, 1 reducer; `mapreduce/submit.py:43-49`).
  *
  * Usage:
  *   runMain graft.mapreduce.SubmitMain \
  *     --input DIR --output DIR \
  *     [--mapper CMD] [--reducer CMD] [--nmappers 4] [--nreducers 1]
  *
  * Multiple --input/--output pairs may be given; jobs run FIFO in
  * submission order like the reference's job queue (C2,
  * `mapreduce/master/__main__.py:480-484`).
  */
object SubmitMain {
  private val wcMapper = Seq("sh", "-c",
    """tr -s ' \t' '\n\n' | sed '/^$/d' | tr 'A-Z' 'a-z' | awk '{print $0 "\t1"}'""")
  private val wcReducer = Seq("awk", "-F", "\t",
    """$1 != prev { if (n > 0) print prev "\t" c; prev = $1; c = 0 } { c += $2; n += 1 } END { if (n > 0) print prev "\t" c }""")

  def parseArgs(args: Array[String]): Seq[JobSpec] = {
    var mapper: Seq[String] = wcMapper
    var reducer: Seq[String] = wcReducer
    var nM = 4
    var nR = 1
    val jobs = scala.collection.mutable.ArrayBuffer[JobSpec]()
    var input = ""
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--mapper"    => mapper = Seq("sh", "-c", args(i + 1)); i += 2
        case "--reducer"   => reducer = Seq("sh", "-c", args(i + 1)); i += 2
        case "--nmappers"  => nM = args(i + 1).toInt; i += 2
        case "--nreducers" => nR = args(i + 1).toInt; i += 2
        case "--input"     => input = args(i + 1); i += 2
        case "--json" =>
          jobs += JobSpec.fromJson(
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(args(i + 1))), "UTF-8"))
          i += 2
        case "--output" =>
          require(input.nonEmpty, "--input must precede --output")
          jobs += JobSpec(mapper, reducer, nM, nR, input, args(i + 1))
          input = ""; i += 2
        case other => throw new IllegalArgumentException(s"unknown arg: $other")
      }
      ()
    }
    jobs.toSeq
  }

  def main(args: Array[String]): Unit = {
    val jobs = parseArgs(args)
    require(jobs.nonEmpty, "at least one --input/--output pair required")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-submit")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try jobs.zipWithIndex.foreach { case (spec, jid) =>
      // FIFO, one at a time — reference job-queue semantics
      MapReduceJob.run(spark, spec)
      println(s"job $jid done: ${spec.inputDir} -> ${spec.outputDir}")
    } finally spark.stop()
  }
}
