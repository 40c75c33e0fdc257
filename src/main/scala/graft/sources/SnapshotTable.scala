package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal versioned parquet table with atomic commits and time-travel
  * reads — the lakehouse contract (Delta/Iceberg shape) on nothing but a
  * filesystem with atomic rename:
  *
  *  - Every commit writes its data files to a fresh `data/v{N}/`
  *    directory (staged + renamed), then publishes a manifest
  *    `_commits/v{N}.txt` holding the COMPLETE file list of that
  *    snapshot (append commits carry the previous list plus the new
  *    files; overwrite commits carry only the new files). The manifest
  *    rename is the commit point — a reader either sees the whole
  *    version or none of it.
  *  - Readers resolve a version by manifest only: data files never
  *    referenced by a published manifest (crashed writes, stragglers,
  *    uncommitted stages) are invisible. `readAsOf(v)` reads exactly the
  *    files the v-manifest lists, so concurrent appends/overwrites never
  *    disturb a running read — snapshot isolation by construction.
  *  - At 100 TB the manifest stays tiny (one line per data file); commit
  *    cost is one staged write + two metadata renames, independent of
  *    table size for appends.
  */
object SnapshotTable {

  private def fs(s: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), s.sparkContext.hadoopConfiguration)

  private def commitsDir(tableDir: String) = new HPath(tableDir, "_commits")

  /** Published versions, ascending (empty for a fresh table). */
  def versions(s: SparkSession, tableDir: String): Seq[Int] = {
    val f = fs(s, tableDir)
    val cd = commitsDir(tableDir)
    if (!f.exists(cd)) Seq.empty
    else f.listStatus(cd).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{5}\\.txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted
  }

  private def manifestLines(s: SparkSession, tableDir: String,
      version: Int): Seq[String] = {
    val f = fs(s, tableDir)
    val p = new HPath(commitsDir(tableDir), f"v$version%05d.txt")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  // manifest data lines; '#'-prefixed lines are metadata (e.g. #txn:)
  private def manifestFiles(s: SparkSession, tableDir: String,
      version: Int): Seq[String] =
    manifestLines(s, tableDir, version).filterNot(_.startsWith("#"))

  /** Transaction ids already committed to this table (from `#txn:`
    * manifest metadata) — the replay-detection set of
    * [[commitIdempotent]]. */
  def committedTxns(s: SparkSession, tableDir: String): Set[String] =
    versions(s, tableDir).flatMap { v =>
      manifestLines(s, tableDir, v)
        .collect { case l if l.startsWith("#txn:") => l.stripPrefix("#txn:") }
    }.toSet

  /** Commit `df` as the next version. `overwrite = false` appends to the
    * previous snapshot's file list; `overwrite = true` replaces it.
    * Returns the committed version number. */
  def commit(s: SparkSession, tableDir: String, df: DataFrame,
      overwrite: Boolean): Int = commit(s, tableDir, df, overwrite, None)

  /** Idempotent commit for replayable writers (a streaming `foreachBatch`
    * sink): if `txnId` was ever committed, the call is a no-op returning
    * None — a micro-batch replayed after a crash-restart cannot land
    * twice. The txn id travels IN the manifest (`#txn:` metadata line),
    * so it is published by the same atomic rename as the data — there is
    * no window where data is visible but its txn is not. */
  def commitIdempotent(s: SparkSession, tableDir: String, df: DataFrame,
      overwrite: Boolean, txnId: String): Option[Int] =
    if (committedTxns(s, tableDir).contains(txnId)) None
    else Some(commit(s, tableDir, df, overwrite, Some(txnId)))

  private def commit(s: SparkSession, tableDir: String, df: DataFrame,
      overwrite: Boolean, txnId: Option[String]): Int = {
    val f = fs(s, tableDir)
    val prev = versions(s, tableDir)
    val v = prev.lastOption.getOrElse(0) + 1
    val staging = new HPath(tableDir, f".staging-v$v%05d")
    val dataDir = new HPath(tableDir, f"data/v$v%05d")
    df.write.mode("overwrite").parquet(staging.toString)
    f.mkdirs(dataDir.getParent)
    require(f.rename(staging, dataDir),
      s"snapshot commit: data rename failed $staging -> $dataDir")
    val newFiles = f.listStatus(dataDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.toString).sorted
    val base = if (overwrite || prev.isEmpty) Seq.empty
      else manifestFiles(s, tableDir, prev.last)
    val cd = commitsDir(tableDir)
    f.mkdirs(cd)
    val tmp = new HPath(cd, f".tmp-v$v%05d")
    val out = f.create(tmp, true)
    val meta = txnId.map(id => s"#txn:$id").toSeq
    try out.write((meta ++ base ++ newFiles).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // the commit point: an atomic metadata rename publishes the version
    require(f.rename(tmp, new HPath(cd, f"v$v%05d.txt")),
      s"snapshot commit: concurrent commit of v$v detected")
    v
  }

  /** Snapshot read: exactly the files version `asOf`'s manifest lists
    * (the greatest published version ≤ `asOf`). */
  def readAsOf(s: SparkSession, tableDir: String, asOf: Int): DataFrame = {
    val vs = versions(s, tableDir).filter(_ <= asOf)
    require(vs.nonEmpty, s"no published version <= $asOf in $tableDir")
    val files = manifestFiles(s, tableDir, vs.last)
    if (files.isEmpty) s.emptyDataFrame
    else s.read.parquet(files: _*)
  }

  /** MERGE (upsert + delete) as a new snapshot version: rows of the
    * current snapshot whose `key` appears in `upserts` are replaced,
    * rows whose key appears in `deleteKeys` are removed, and all
    * `upserts` rows land — published as one atomic overwrite commit, so
    * readers see the pre-merge or post-merge table, never a mixture.
    *
    * Shape: one keyed anti-join per exclusion set (never a broadcast of
    * the table side) + a union — the standard copy-on-write MERGE; at
    * 100 TB the rewrite cost is the table scan, the commit itself stays
    * two metadata renames. */
  def merge(s: SparkSession, tableDir: String, upserts: DataFrame,
      deleteKeys: DataFrame, key: String): Int = {
    // merging into a fresh (or empty-snapshot) table: the current state
    // is the empty relation in the upserts' schema
    val cur0 =
      if (versions(s, tableDir).isEmpty) upserts.filter(org.apache.spark.sql.functions.lit(false))
      else readAsOf(s, tableDir, Int.MaxValue)
    val cur = if (cur0.columns.isEmpty) upserts.filter(org.apache.spark.sql.functions.lit(false)) else cur0
    val kept = cur
      .join(upserts.select(key).distinct(), Seq(key), "left_anti")
      .join(deleteKeys.select(key).distinct(), Seq(key), "left_anti")
    commit(s, tableDir, kept.unionByName(upserts), overwrite = true)
  }
}
