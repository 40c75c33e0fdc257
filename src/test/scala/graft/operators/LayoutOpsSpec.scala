package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Layout-management ground truth: the Morton code must match a scalar
  * bit-interleave, z-clustering must make per-file min/max stats prune
  * MORE files than a 1-D layout for a 2-D box predicate (the whole point
  * of the operator), and compaction must hit its planned file count
  * without touching content. */
class LayoutOpsSpec extends GraftSpec {

  private def scalarZ(x: Long, y: Long): Long = {
    val xq = x % 65536; val yq = y % 65536
    (0 until 16).map { i =>
      (((xq >> i) & 1L) << (2 * i)) | (((yq >> i) & 1L) << (2 * i + 1))
    }.sum
  }

  test("zvalue matches a scalar Morton interleave") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (1999L, 99L), (1234L, 4321L), (65536L, 2L), (70000L, 131071L))
    import spark.implicits._
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) === scalarZ(x, y), s"($x, $y)")
    }
  }

  /** Files whose [min,max] box on BOTH keys intersects the predicate box
    * — the set a zone-map/row-group pruner must scan. */
  private def overlapping(dir: String, p0: Long, p1: Long, s0: Long, s1: Long): Long =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      .filter(col("pmax") >= p0 && col("pmin") <= p1 &&
        col("smax") >= s0 && col("smin") <= s1)
      .count()

  test("z-order layout prunes more files than a 1-D sort for a 2-D box") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_spec_")
    val linear = root.resolve("linear").toString
    val zord = root.resolve("zorder").toString
    val nFiles = 16
    // 1-D baseline: clustered by orderkey — partkey/suppkey land randomly
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(linear)
    LayoutOps.zorderWrite(li, "l_partkey", "l_suppkey", zord, nFiles)
    // content survives the rewrite
    assert(spark.read.parquet(zord).count() === li.count())
    // middle-of-range box on both dims (~1/4 of each key range)
    val mx = li.agg(max("l_partkey"), max("l_suppkey")).head()
    val (pMax, sMax) = (mx.getLong(0), mx.getLong(1))
    val (p0, p1) = (pMax / 4, pMax / 2)
    val (s0, s1) = (sMax / 4, sMax / 2)
    val nLin = overlapping(linear, p0, p1, s0, s1)
    val nZ = overlapping(zord, p0, p1, s0, s1)
    assert(nLin === nFiles.toLong) // 1-D layout: every file overlaps
    assert(nZ < nLin, s"z-order should prune: z=$nZ linear=$nLin")
    // cleanup
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(root.toFile)
  }

  test("z-order keeps pruning the SECOND dimension where a 1-D key sort is blind") {
    // The structural payoff of z-clustering: a layout sorted by l_partkey
    // prunes partkey boxes as well as z does, but every one of its files
    // spans the full suppkey range — a suppkey band prunes NOTHING. The
    // z-layout interleaves suppkey bits into the file order, so the same
    // band excludes files whose suppkey bounding box misses it. Run at
    // sf0.01 / 64 files so both key domains have enough bits to interleave.
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val root = java.nio.file.Files.createTempDirectory("graft_zorder2_spec_")
    val pkSorted = root.resolve("pk").toString
    val zord = root.resolve("z").toString
    val nFiles = 64
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(pkSorted)
    LayoutOps.zorderWrite(li, "l_partkey", "l_suppkey", zord, nFiles)
    // suppkey band, no partkey constraint (wide-open pk bounds)
    val (s0, s1) = (32L, 47L)
    val nPk = overlapping(pkSorted, Long.MinValue / 2, Long.MaxValue / 2, s0, s1)
    val nZ = overlapping(zord, Long.MinValue / 2, Long.MaxValue / 2, s0, s1)
    assert(nPk === nFiles.toLong, "pk-sorted layout cannot prune a suppkey band")
    assert(nZ < nPk, s"z-order should prune the suppkey band: z=$nZ pk=$nPk")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(root.toFile)
  }

  test("compaction re-run is idempotent; pass-through moves or copies as asked") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_compact_idem_")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    li.repartition(8).write.mode("overwrite").parquet(in)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(in),
      spark.sparkContext.hadoopConfiguration)
    def files(d: String) = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val total = files(in).map(_.getLen).sum
    def checksum(d: String) = spark.read.parquet(d)
      .agg(count(lit(1)), sum("l_orderkey")).head()
    // all-small compact, run TWICE into the same outDir: the staged
    // swap must converge (pre-fix, mode("append") doubled the data)
    val r1 = LayoutOps.compact(spark, in, out, total / 2, Long.MaxValue)
    val c1 = checksum(out)
    val n1 = files(out).length
    val r2 = LayoutOps.compact(spark, in, out, total / 2, Long.MaxValue)
    assert(checksum(out) === c1, "re-run must not change content")
    assert(files(out).length === n1, "re-run must not append files")
    assert(r2.nOutputFiles === r1.nOutputFiles)
    // pass-through with movePassthrough=false: distributed copy, input kept
    val out2 = root.resolve("out2").toString
    val thresh = files(in).map(_.getLen).sorted.apply(4)
    val keep = LayoutOps.compact(spark, in, out2, total / 2, thresh,
      movePassthrough = false)
    assert(keep.nPassthroughFiles > 0)
    assert(files(in).length === 8, "copy mode must preserve the input files")
    assert(checksum(out2) === checksum(in))
    // pass-through with movePassthrough=true: O(1) rename migrates them
    val out3 = root.resolve("out3").toString
    val moved = LayoutOps.compact(spark, in, out3, total / 2, thresh)
    assert(moved.nPassthroughFiles === keep.nPassthroughFiles)
    assert(files(in).length === 8 - moved.nPassthroughFiles,
      "move mode migrates large files out of the input dir")
    assert(checksum(out3) === c1)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(root.toFile)
  }

  test("compaction recovers pass-through files stranded by a mid-run crash") {
    // simulate the worst crash window: a move-mode run that migrated
    // large files into staging and died before the swap — the files
    // exist ONLY in staging. The re-run must restore them to the input
    // and converge to a complete output, not delete them.
    val li = graft.Tables.lineitem(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_compact_crash_")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    li.repartition(6).write.mode("overwrite").parquet(in)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(in),
      spark.sparkContext.hadoopConfiguration)
    def files(d: String) = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val orig = spark.read.parquet(in)
      .agg(count(lit(1)), sum("l_orderkey")).head()
    // hand-build the crashed state: staging exists, one input file
    // already migrated under the passthrough naming scheme
    val staging = new org.apache.hadoop.fs.Path(out + ".__staging")
    fs.mkdirs(staging)
    val victim = files(in).head.getPath
    assert(fs.rename(victim,
      new org.apache.hadoop.fs.Path(staging, f"passthrough-00000-${victim.getName}")))
    assert(files(in).length === 5)
    // re-run: recovery must pull the stranded file back before planning
    val total = files(in).map(_.getLen).sum
    LayoutOps.compact(spark, in, out, math.max(total, 1L), Long.MaxValue)
    val got = spark.read.parquet(out)
      .agg(count(lit(1)), sum("l_orderkey")).head()
    assert(got === orig, "recovered output must contain ALL original rows")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(root.toFile)
  }

  test("compaction hits the planned bin count and passes large files through") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_compact_spec_")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    li.repartition(32).write.mode("overwrite").parquet(in)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(in),
      spark.sparkContext.hadoopConfiguration)
    def files(d: String) = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val sizes = files(in).map(_.getLen)
    val total = sizes.sum
    // threshold set so the largest ~handful pass through untouched
    val thresh = sizes.sorted.apply(sizes.length - 3)
    val rep = LayoutOps.compact(spark, in, out,
      targetBytes = total / 4, smallThreshold = thresh)
    assert(rep.nInputFiles === 32)
    assert(rep.nPassthroughFiles === sizes.count(_ >= thresh))
    assert(rep.nSmallFiles === 32 - rep.nPassthroughFiles)
    val expectBins = math.max(1,
      math.ceil(rep.smallBytes.toDouble / (total / 4)).toInt)
    assert(rep.nOutputFiles === expectBins + rep.nPassthroughFiles)
    // content preserved exactly (row multiset via count + key sum)
    val orig = li.agg(count(lit(1)), sum("l_orderkey")).head()
    val comp = spark.read.parquet(out)
      .agg(count(lit(1)), sum("l_orderkey")).head()
    assert(comp === orig)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(root.toFile)
  }
}
