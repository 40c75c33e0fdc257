package graft.mapreduce

import graft.GraftSpec

/** Network-surface parity spec (reference C1/C2/C6): jobs submitted over
  * a real TCP socket mid-run are FIFO-queued and all complete; a
  * `shutdown` message terminates the server after the queue drains —
  * the semantics of the reference's `tests/test_master_04.py:187-328`
  * multi-job test and `tests/test_integration_00.py` shutdown test.
  */
class JobServerSpec extends GraftSpec {

  private def send(port: Int, json: String): Unit = {
    val sock = new java.net.Socket(java.net.InetAddress.getLoopbackAddress, port)
    try {
      sock.getOutputStream.write(json.getBytes("UTF-8"))
      sock.getOutputStream.flush()
    } finally sock.close() // send-and-close framing, ref submit.py:70-75
  }

  private def jobJson(in: String, out: String, mapper: String): String =
    s"""{"message_type": "new_master_job",
       | "input_directory": "$in", "output_directory": "$out",
       | "mapper_executable": "$mapper", "reducer_executable": "cat",
       | "num_mappers": 2, "num_reducers": 1}""".stripMargin

  test("two jobs over a socket mid-run both complete FIFO; shutdown drains") {
    val in = java.nio.file.Files.createTempDirectory("srv-in-").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(in, "file01"), "b line\na line\n")
    val outRoot = java.nio.file.Files.createTempDirectory("srv-out-").toString
    val srv = new JobServer(spark)
    val port = srv.start()
    try {
      // job 1 sleeps so job 2 provably arrives while job 1 runs
      send(port, jobJson(in, s"$outRoot/j1", "sleep 2; sort"))
      Thread.sleep(300) // let job 1 start
      send(port, jobJson(in, s"$outRoot/j2", "sort"))
      send(port, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
      assert(srv.completedJobs === 2)
      val j1 = scala.io.Source.fromFile(s"$outRoot/j1/outputfile01").getLines().toSeq
      val j2 = scala.io.Source.fromFile(s"$outRoot/j2/outputfile01").getLines().toSeq
      assert(j1 === Seq("a line", "b line"))
      assert(j2 === Seq("a line", "b line"))
    } finally srv.forceStop()
  }

  test("a job that throws mid-run is logged; the queue survives and the next job completes") {
    val in = java.nio.file.Files.createTempDirectory("srv-in-").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(in, "file01"), "b line\na line\n")
    val outRoot = java.nio.file.Files.createTempDirectory("srv-out-").toString
    val srv = new JobServer(spark)
    val port = srv.start()
    try {
      // nonexistent mapper executable → the pipe stage throws inside
      // MapReduceJob.run; the runner must log and move on (the reference
      // re-runs queued jobs after a worker dies mid-stage — same contract:
      // one bad job never wedges the queue)
      send(port, jobJson(in, s"$outRoot/bad", "/nonexistent/graft_mapper"))
      send(port, jobJson(in, s"$outRoot/good", "sort"))
      send(port, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
      assert(srv.completedJobs === 1)
      val good = scala.io.Source.fromFile(s"$outRoot/good/outputfile01").getLines().toSeq
      assert(good === Seq("a line", "b line"))
      assert(!new java.io.File(s"$outRoot/bad/outputfile01").exists())
    } finally srv.forceStop()
  }

  test("concurrent clients submitting DURING a running job: all accepted, FIFO vs the running job") {
    val in = java.nio.file.Files.createTempDirectory("srv-in-").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(in, "file01"), "b line\na line\n")
    val outRoot = java.nio.file.Files.createTempDirectory("srv-out-").toString
    val srv = new JobServer(spark)
    val port = srv.start()
    try {
      // job 1 sleeps long enough that every concurrent submission below
      // provably arrives while it is RUNNING (interleaved accepts, the
      // reference's test_master_04 multi-job FIFO shape under concurrency)
      send(port, jobJson(in, s"$outRoot/j1", "sleep 3; sort"))
      Thread.sleep(300) // let job 1 start
      val n = 4
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val clients = (0 until n).map { i =>
        new Thread(() =>
          try send(port, jobJson(in, s"$outRoot/c$i", "sort"))
          catch { case t: Throwable => errs.add(t) })
      }
      clients.foreach(_.start())
      clients.foreach(_.join(10000))
      assert(errs.isEmpty, s"concurrent submits failed: $errs")
      send(port, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
      // every interleaved submission was accepted and ran (none dropped
      // by accept contention), and the pre-existing running job finished
      // FIRST — queue order preserved relative to the in-flight job
      assert(srv.completedJobs === n + 1)
      val j1 = new java.io.File(s"$outRoot/j1/outputfile01")
      assert(j1.exists())
      (0 until n).foreach { i =>
        val c = new java.io.File(s"$outRoot/c$i/outputfile01")
        assert(c.exists(), s"client $i output missing")
        assert(j1.lastModified() <= c.lastModified(),
          s"client $i completed before the job that was already running")
        val lines = scala.io.Source.fromFile(c).getLines().toSeq
        assert(lines === Seq("a line", "b line"))
      }
    } finally srv.forceStop()
  }

  test("malformed and unknown messages are dropped, server stays up") {
    val srv = new JobServer(spark)
    val port = srv.start()
    try {
      send(port, "this is not json{")
      send(port, """{"no_type": true}""")
      send(port, """{"message_type": "register", "worker_pid": 1}""")
      send(port, """{"message_type": "shutdown"}""")
      srv.awaitTermination()
      assert(srv.completedJobs === 0)
    } finally srv.forceStop()
  }
}
