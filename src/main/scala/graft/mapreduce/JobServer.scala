package graft.mapreduce

import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.LinkedBlockingQueue
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession

/** Minimal TCP job server — the runnable counterpart of the reference's
  * master network surface (C1/C2/C6):
  *
  *  - accepts `new_master_job` JSON over TCP, one message per connection,
  *    read to EOF (the reference's framing: `master/__main__.py:150-186`,
  *    client sends-and-closes, `submit.py:70-75`)
  *  - FIFO-queues jobs ACROSS submissions — a job arriving while one runs
  *    waits its turn (`master/__main__.py:480-484,209-218`; proven by the
  *    reference's `tests/test_master_04.py:187-328`)
  *  - `shutdown` message stops accepting and exits after the in-flight
  *    job finishes (`master/__main__.py:193-194,513-521`)
  *
  * Everything else the reference's master does (worker registration,
  * heartbeats, task reassignment) is the cluster manager's job in Spark —
  * this server is deliberately just the protocol adapter in front of
  * [[MapReduceJob.run]]. Malformed JSON is ignored exactly like the
  * reference (`master/__main__.py:181-184` drops undecodable messages).
  */
final class JobServer(spark: SparkSession, port: Int = 0) {

  private val accepting = new AtomicBoolean(false)
  // None = shutdown sentinel; the runner drains queued jobs before it
  private val queue = new LinkedBlockingQueue[Option[JobSpec]]()
  @volatile private var server: ServerSocket = _
  @volatile private var acceptThread: Thread = _
  @volatile private var runThread: Thread = _
  @volatile private var jobsDone: Int = 0

  /** Starts the accept + runner threads; returns the bound port. */
  def start(): Int = {
    server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
    accepting.set(true)
    acceptThread = new Thread(() => acceptLoop(), "graft-jobserver-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    runThread = new Thread(() => runLoop(), "graft-jobserver-run")
    runThread.setDaemon(true)
    runThread.start()
    server.getLocalPort
  }

  private def readAll(sock: Socket): String = {
    val in = sock.getInputStream
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](4096)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    new String(buf.toByteArray, "UTF-8")
  }

  private def acceptLoop(): Unit = {
    while (accepting.get()) {
      val sock =
        try server.accept()
        catch { case _: java.net.SocketException => return } // closed on shutdown
      try {
        // A client that connects and never closes must not wedge the
        // accept loop (and with it every later submission + shutdown):
        // reads past the timeout throw SocketTimeoutException and the
        // connection is dropped like any other malformed message.
        sock.setSoTimeout(10000)
        val msg = readAll(sock)
        handleMessage(msg)
      } catch {
        case e: Exception =>
          System.err.println(s"[jobserver] dropped message: ${e.getMessage}")
      } finally sock.close()
    }
  }

  private def handleMessage(msg: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val mt =
      try JsonMethods.parse(msg) \ "message_type" match {
        case JString(v) => v
        case _ => return // no type — drop, like the reference
      }
      catch { case _: Exception => return } // undecodable — drop
    mt match {
      case "new_master_job" => queue.put(Some(JobSpec.fromJson(msg)))
      case "shutdown" =>
        accepting.set(false)
        queue.put(None)
        server.close()
      case _ => () // register/status have no meaning here — ignore
    }
  }

  private def runLoop(): Unit = {
    var live = true
    while (live) {
      queue.take() match {
        case Some(spec) =>
          try {
            MapReduceJob.run(spark, spec)
            jobsDone += 1
            System.err.println(s"[jobserver] job done: ${spec.inputDir} -> ${spec.outputDir}")
          } catch {
            case e: Exception =>
              System.err.println(s"[jobserver] job failed: ${e.getMessage}")
          }
        case None => live = false
      }
    }
  }

  /** Completed-job count (monotone; test observability). */
  def completedJobs: Int = jobsDone

  /** Blocks until a shutdown message has been processed and every job
    * submitted before it has run. */
  def awaitTermination(): Unit = {
    runThread.join()
    if (!server.isClosed) server.close()
  }

  /** Immediate stop (tests/cleanup); running job finishes, queue drops. */
  def forceStop(): Unit = {
    accepting.set(false)
    queue.clear()
    queue.put(None)
    if (server != null && !server.isClosed) server.close()
  }
}

/** CLI entry point: `runMain graft.mapreduce.ServerMain [port]` — listens
  * for the reference's `new_master_job`/`shutdown` JSON (default port 6000,
  * `bin/mapreduce:16`) and runs jobs FIFO on a local SparkSession. */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(6000)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-jobserver")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new JobServer(spark, port)
    val bound = srv.start()
    println(s"graft job server listening on $bound")
    try srv.awaitTermination() finally spark.stop()
  }
}
