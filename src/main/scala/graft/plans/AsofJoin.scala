package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join: for each left row, the latest right row with the
  * same key and `rightTime <= leftTime` (inner semantics — unmatched left
  * rows are dropped).
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
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
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
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.withNullability(true)), schema)
      // key → latest right row at or before the current left time
      val latest = new java.util.HashMap[Any, InternalRow]()
      val rBuf = rIter.buffered
      // UTF8String/array keys may be backed by reused buffers — copy them
      def ownedKey(k: Any): Any = k match {
        case s: UTF8String => s.copy()
        case other => other
      }
      lIter.flatMap { lRow =>
        val lt = lTime.eval(lRow)
        if (lt == null) Iterator.empty // null left time can never match
        else {
          // advance the right side through every row with time <= left
          // time; null right times sort first (NULLS FIRST) and are
          // consumed-and-skipped so they can't block the scan
          while (rBuf.hasNext && {
            val rt = rTime.eval(rBuf.head)
            rt == null || timeOrdering.lteq(rt, lt)
          }) {
            val r = rBuf.next()
            if (rTime.eval(r) != null)
              latest.put(ownedKey(rKey.eval(r)), r.copy())
          }
          val m = latest.get(lKey.eval(lRow))
          if (m == null) Iterator.empty
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
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsofJoin {
  /** Idempotently registers the planning strategy on the session. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofJoinStrategy

  /** `left ASOF JOIN right ON left.keyCol = right.keyCol AND
    * left.timeCol >= right.timeCol` (inner). Column names must be
    * unambiguous per side; right-side columns keep their names, so rename
    * overlapping ones before joining. */
  def asof(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${p.output.map(_.name).mkString(", ")}]"))
    GraftSqlShim.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol)))
  }
}
