package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join: for each left row, the latest right row with the
  * same key and `rightTime <= leftTime`. Inner semantics drop unmatched
  * left rows; outer semantics (`isOuter = true`) emit them with nulls on
  * the right side — matching DuckDB's `ASOF JOIN` / `ASOF LEFT JOIN`.
  *
  * This is the whole-operator Catalyst extension path from the design
  * brief — a custom `LogicalPlan` node planned by a `SparkStrategy` into
  * a custom `SparkPlan` — for the one relational operator Spark has no
  * built-in for (the reference-side composition `union + forward-fill
  * window` in [[graft.operators.AdvancedOps.q26AsofJoin]] remains as the
  * compose-existing-ops variant; both are verified against DuckDB's
  * native ASOF JOIN).
  *
  * Physical algorithm: both sides are hash-clustered on the key (one
  * shuffle each, exactly like a sort-merge join) and sorted by TIME ONLY
  * within partitions. One streaming merge pass per partition advances the
  * right iterator to the left row's time while maintaining a key → latest
  * row map. Per-partition state is one buffered row per distinct key —
  * at 100 TB that is #keys/#partitions rows, the same state bound as a
  * streaming `mapGroupsWithState` — and crucially the sort is time-only,
  * so the operator never materializes a per-key group.
  *
  * Null semantics (SQL-conformant): a null key on either side never
  * matches anything (null != null, like equi-joins); a null left time
  * never matches; null right times are consumed and skipped.
  *
  * Key types are restricted to atomic value types (numeric, string,
  * boolean, date/timestamp): the per-partition state map keys on the
  * evaluated value, and binary/array/struct/map values from reused
  * Unsafe buffers have identity- or buffer-dependent equality there.
  * Rejected at construction rather than silently mis-joining.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    isOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    isOuter: Boolean) extends BinaryExecNode {

  require(AsofJoin.supportedKeyType(leftKey.dataType) &&
    AsofJoin.supportedKeyType(rightKey.dataType),
    s"as-of join keys must be atomic non-floating value types, got " +
      s"${leftKey.dataType.simpleString} / ${rightKey.dataType.simpleString}")
  // Mixed-width keys (int vs bigint) would silently never match: boxed
  // Integer(5) != Long(5L) in the state map, and the two sides hash to
  // different shuffle partitions. Exact type equality or an error.
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types must match exactly, got " +
      s"${leftKey.dataType.simpleString} vs ${rightKey.dataType.simpleString}")

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // Same co-clustering contract as SortMergeJoin: EnsureRequirements
  // inserts one hash shuffle per side and co-partitions them.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // Time-only ordering (NOT (key, time)): the merge keeps per-key state,
  // so a global per-partition time sort suffices — cheaper to satisfy
  // when upstream data is already time-ordered (e.g. event logs).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftTime, Ascending)) :: Seq(SortOrder(rightTime, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val timeOrdering =
      PhysicalDataType.ordering(leftTime.dataType).asInstanceOf[Ordering[Any]]
    val schema = output
    val outer = isOuter
    val nRightCols = right.output.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.withNullability(true)), schema)
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      // key → latest right row at or before the current left time
      val latest = new java.util.HashMap[Any, InternalRow]()
      val rBuf = rIter.buffered
      // UTF8String keys may be backed by reused Unsafe buffers — copy them
      // (all other permitted key types are immutable JVM values)
      def ownedKey(k: Any): Any = k match {
        case s: UTF8String => s.copy()
        case other => other
      }
      def emitUnmatched(lRow: InternalRow): Iterator[InternalRow] =
        if (outer) Iterator.single(project(joined(lRow, nullRight)))
        else Iterator.empty
      lIter.flatMap { lRow =>
        val lt = lTime.eval(lRow)
        if (lt == null) emitUnmatched(lRow) // null left time never matches
        else {
          // advance the right side through every row with time <= left
          // time; null right times sort first (NULLS FIRST) and are
          // consumed-and-skipped so they can't block the scan
          while (rBuf.hasNext && {
            val rt = rTime.eval(rBuf.head)
            rt == null || timeOrdering.lteq(rt, lt)
          }) {
            val r = rBuf.next()
            if (rTime.eval(r) != null) {
              val k = rKey.eval(r)
              if (k != null) latest.put(ownedKey(k), r.copy())
            }
          }
          val lk = lKey.eval(lRow)
          val m = if (lk == null) null else latest.get(lk)
          if (m == null) emitUnmatched(lRow)
          else Iterator.single(project(joined(lRow, m)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, outer) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer) :: Nil
    case _ => Nil
  }
}

object AsofJoin {
  /** Atomic non-floating value types only — see the class doc for why.
    * Float/double keys are rejected too: boxed equality and raw-bit
    * hashing treat -0.0 != 0.0 (and NaN != NaN), diverging from SQL
    * equi-join normalization; FP equality keys are a modeling smell
    * anyway (use the time column for continuous values). */
  def supportedKeyType(dt: DataType): Boolean = dt match {
    case BinaryType | _: ArrayType | _: MapType | _: StructType => false
    case org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType => false
    case _ => true
  }

  /** Idempotently registers the planning strategy on the session. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofJoinStrategy

  /** `left ASOF JOIN right ON left.keyCol = right.keyCol AND
    * left.timeCol >= right.timeCol` (inner). Right-side columns whose
    * names clash with a left-side column are automatically renamed with
    * an `_r` suffix (repeated until unique), so callers never get an
    * ambiguous output schema. */
  def asof(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame =
    build(left, right, leftKeyCol, rightKeyCol, leftTimeCol, rightTimeCol,
      isOuter = false)

  /** Left-outer as-of join: like [[asof]] but unmatched left rows are
    * kept with nulls for every right-side column (DuckDB
    * `ASOF LEFT JOIN` semantics). */
  def asofOuter(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame =
    build(left, right, leftKeyCol, rightKeyCol, leftTimeCol, rightTimeCol,
      isOuter = true)

  private def build(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      isOuter: Boolean): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // Disambiguate clashing right-side names up front (suffix `_r`,
    // repeated until unique against BOTH sides' final name sets).
    // Clash detection is CASE-INSENSITIVE: Spark resolves column
    // references case-insensitively by default, so left "Tag" vs right
    // "tag" would still be an ambiguous reference downstream.
    val leftNames = left.columns.map(_.toLowerCase).toSet
    var taken = leftNames ++ right.columns.map(_.toLowerCase)
    val renames = right.columns.filter(c => leftNames.contains(c.toLowerCase)).map { c =>
      var n = c + "_r"
      while (taken.contains(n.toLowerCase)) n += "_r"
      taken += n.toLowerCase
      c -> n
    }.toMap
    val rightDedup = renames.foldLeft(right) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
    // Column-name resolution honors the session's resolver (case-insensitive
    // unless spark.sql.caseSensitive) — matching how Spark itself would
    // resolve the reference, and how the clash-rename logic above compares.
    val resolver = spark.sessionState.analyzer.resolver
    def renamed(name: String): String =
      renames.collectFirst { case (from, to) if resolver(from, name) => to }
        .getOrElse(name)
    val rKeyName = renamed(rightKeyCol)
    val rTimeName = renamed(rightTimeCol)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightDedup.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute = {
      val hits = p.output.filter(a => resolver(a.name, name))
      require(hits.size <= 1,
        s"column $name is ambiguous among [${hits.map(_.name).mkString(", ")}]")
      hits.headOption.getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${p.output.map(_.name).mkString(", ")}]"))
    }
    val lk = attr(lPlan, leftKeyCol)
    val rk = attr(rPlan, rKeyName)
    require(supportedKeyType(lk.dataType) && supportedKeyType(rk.dataType),
      s"as-of join keys must be atomic non-floating value types (integer/" +
        s"string/bool/date/timestamp), got ${lk.dataType.simpleString} / " +
        s"${rk.dataType.simpleString}")
    require(lk.dataType == rk.dataType,
      s"as-of join key types must match exactly (mixed-width keys would " +
        s"silently never match), got ${lk.dataType.simpleString} vs " +
        s"${rk.dataType.simpleString}")
    GraftSqlShim.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      lk, rk, attr(lPlan, leftTimeCol), attr(rPlan, rTimeName), isOuter))
  }
}
