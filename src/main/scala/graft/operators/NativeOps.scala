package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Pure-Scala twins of the reference's executable surface (SURVEY.md §7.3):
  * the wc/grep jobs re-expressed as declarative DataFrame pipelines, and a
  * typed `Aggregator` replacing the reduce executable. Oracle-checked
  * against the same SQL as the pipe versions — proving a user can swap a
  * subprocess pipeline for the idiomatic form without changing results
  * (and gaining codegen + shuffle-partial aggregation when they do).
  */
object NativeOps extends QueryPack {

  /** wc as explode→groupBy().count() — the mapper's tokenize/emit becomes
    * a generator expression, the reducer's adjacency-sum becomes a hash
    * aggregate with map-side partials (strictly better than sort-based). */
  def wordcountNative(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  /** grep as a pushed-down contains() filter. */
  def grepNative(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").contains("spark"))
      .select(col("text").as("line"))
      .orderBy(col("line"))

  /** Typed UDAF surface: per-key count via Aggregator — the compile-time-
    * checked replacement for `wc_reduce.sh`'s awk adjacency sum. */
  object CountAgg extends Aggregator[String, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: String): Long = b + 1L
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def wordcountTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .as[String]
      .groupByKey(identity)
      .agg(CountAgg.toColumn.name("cnt"))
      .toDF("word", "cnt")
      .orderBy(col("word"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "native_wordcount" -> wordcountNative,
    "native_grep" -> grepNative,
    "native_wordcount_typed" -> wordcountTyped,
  )

  // identical oracles to the pipe twins: same relation, different engine path
  override val oracle: Map[String, String] = Map(
    "native_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "native_grep" ->
      """SELECT text AS line FROM documents
        |WHERE position('spark' IN text) > 0 ORDER BY line""".stripMargin,
    "native_wordcount_typed" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
  )
}
