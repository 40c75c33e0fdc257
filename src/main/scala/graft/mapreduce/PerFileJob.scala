package graft.mapreduce

import org.apache.spark.Partitioner
import org.apache.spark.sql.SparkSession

/** Per-file fidelity mode for exec-pipe stages (SURVEY.md Q4/O2).
  *
  * The reference runs ONE mapper subprocess per input *file* with
  * `stdin=<file>` and `stdout=<output_dir>/basename(file)`
  * (`mapreduce/worker/__main__.py:109-117`), and stripes the *sorted file
  * list* round-robin over `num_mappers` tasks — task y gets files
  * y, y+n, y+2n, ... (`mapreduce/master/__main__.py:288-295`). The
  * row-level pipeline in [[MapReduceJob]] is the scalable default, but an
  * executable that is file-identity-sensitive (argv per file, per-file
  * output naming — the contract of `tests/test_worker_03/04.py`) needs
  * this mode.
  *
  * Spark shape: the driver lists file NAMES only (exactly what any Spark
  * scan's planning does), parallelizes (taskId, path) pairs with an exact
  * partitioner so partition y holds precisely the reference's task-y file
  * set, and each executor task streams its files through the subprocess
  * via the Hadoop FileSystem API — file bytes never touch the driver, and
  * the process streams (no whole-file buffering), so a 10 GB input file
  * costs O(1) memory exactly as the reference's `subprocess.run` did.
  */
object PerFileJob {

  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Sorted data-file list of a directory (ref `master/__main__.py:288-289`
    * sorts `os.listdir`). */
  def listInputFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted.toSeq
  }

  /** Round-robin striping of the sorted file list over n tasks: file i →
    * task i % n (ref `master/__main__.py:291-295`). */
  def stripe(files: Seq[String], nTasks: Int): Seq[(Int, String)] = {
    val n = math.max(1, math.min(nTasks, files.size))
    files.zipWithIndex.map { case (f, i) => (i % n, f) }
  }

  private final class IdPartitioner(val numPartitions: Int) extends Partitioner {
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** Unwraps the .crc-writing local ChecksumFileSystem (reference outputs
    * are plain files); HDFS/S3A pass through. */
  private def rawFs(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf) match {
      case cfs: org.apache.hadoop.fs.ChecksumFileSystem => cfs.getRawFileSystem
      case other => other
    }

  /** Streams one file through one subprocess: stdin=input file,
    * stdout=`outDir/basename(input)` — the `new_worker_task` contract.
    * Fails on non-zero exit (the reference silently ignored exit codes,
    * `worker/__main__.py:116`; we treat a crashed executable as a task
    * failure so Spark's retry machinery engages). Returns the basename.
    *
    * stderr is INHERITed into the executor's own stderr (task log): an
    * executable chatty beyond the ~64 KB OS pipe buffer would otherwise
    * fill the pipe, stall itself, and hang the stdout copy forever. */
  private def pipeOneFile(cmd: Seq[String], inPath: String, outDir: String,
      conf: Configuration): String = {
    val in = new Path(inPath)
    val base = in.getName
    val out = new Path(outDir, base)
    val ifs = in.getFileSystem(conf)
    val ofs = rawFs(out, conf)
    val proc = new ProcessBuilder(cmd: _*)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
      .start()
    val feeder = new Thread(() => {
      val is = ifs.open(in)
      try org.apache.hadoop.io.IOUtils.copyBytes(is, proc.getOutputStream, 65536, true)
      finally () // copyBytes(close=true) closed both streams
    })
    feeder.setDaemon(true)
    feeder.start()
    val os = ofs.create(out, true)
    try org.apache.hadoop.io.IOUtils.copyBytes(proc.getInputStream, os, 65536, true)
    finally ()
    feeder.join()
    val exit = proc.waitFor()
    if (exit != 0)
      throw new RuntimeException(s"executable ${cmd.mkString(" ")} exited $exit on $inPath")
    base
  }

  /** Runs `cmd` once per file of `inputDir` (sorted, striped over
    * `nTasks` exactly like the reference's map-task planner), writing
    * `outDir/basename(file)` per input. Returns the written basenames. */
  def pipeDirectory(spark: SparkSession, inputDir: String, cmd: Seq[String],
      outDir: String, nTasks: Int): Seq[String] = {
    require(cmd.nonEmpty, "per-file pipe needs an executable")
    val assigned = stripe(listInputFiles(spark, inputDir), nTasks)
    if (assigned.isEmpty) return Seq.empty
    val n = assigned.map(_._1).max + 1
    rawFs(new Path(outDir), spark.sparkContext.hadoopConfiguration)
      .mkdirs(new Path(outDir))
    // Ship the driver's Hadoop configuration to the executors so
    // spark.hadoop.* settings (S3A credentials/endpoints, HDFS
    // nameservices) reach pipeOneFile's FileSystem lookups — a bare
    // `new Configuration()` on the executor would only see default XML.
    // Serialized as entries (Configuration itself is not serializable).
    import scala.jdk.CollectionConverters._
    val confEntries = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toArray
    spark.sparkContext.parallelize(assigned, n)
      .partitionBy(new IdPartitioner(n))
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        it.map { case (_, path) => pipeOneFile(cmd, path, outDir, conf) }
      }
      .collect()  // basenames only — O(#files) strings, not data
      .toSeq
  }
}
