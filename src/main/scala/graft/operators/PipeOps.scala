package graft.operators

import graft.{QueryPack, Tables}
import graft.mapreduce.{JobSpec, MapReduceJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's *entire* user-logic surface is executables piped over
  * line streams (SURVEY.md §2.3 "UDF/UDAF/UDTF"): map = stdin→stdout
  * flatMap (`mapreduce/worker/__main__.py:105-117`), reduce = sorted-group
  * aggregator by key adjacency (`tests/testdata/exec/wc_reduce.sh:5-14`).
  * These queries run real subprocess pipelines via `RDD.pipe` (the
  * Hadoop-Streaming analog) over the `documents` table, and are verified
  * against a pure-SQL oracle — proving the exec-pipe engine computes the
  * same relation as the declarative twin.
  */
object PipeOps extends QueryPack {

  /** wc_map.sh equivalent: tokenize on whitespace → `word\t1` per token
    * (ref: `tests/testdata/exec/wc_map.sh:12`, written fresh here). */
  private val wcMapper = Seq("sh", "-c",
    """tr -s ' ' '\n' | sed '/^$/d' | awk '{print $0 "\t1"}'""")

  /** wc_reduce.sh equivalent: counts by key adjacency over sorted input —
    * relies on the group stage's sorted-partition contract, like the
    * reference reducer (`tests/testdata/exec/wc_reduce.sh:5-14`). */
  private val wcReducer = Seq("awk", "-F", "\t",
    """$1 != prev { if (n > 0) print prev "\t" c; prev = $1; c = 0 } { c += $2; n += 1 } END { if (n > 0) print prev "\t" c }""")

  /** grep_map.py equivalent: emit lines containing the fixed query string
    * (ref: `tests/testdata/exec/grep_map.py:27-28`). `grep -F` exits 1 on
    * zero matches, which would (correctly) fail the task — mask it since
    * empty partitions are expected. */
  private val grepMapper = Seq("sh", "-c", "grep -F 'spark' || true")

  def wordcountPipe(s: SparkSession, d: String): DataFrame = {
    val lines = Tables.documents(s, d).select("text").rdd.map(_.getString(0))
    val spec = JobSpec(wcMapper, wcReducer, numMappers = 8, numReducers = 4)
    val out = MapReduceJob.runLines(lines, spec)
    import s.implicits._
    out.map { l =>
      val i = l.indexOf('\t')
      (l.substring(0, i), l.substring(i + 1).toLong)
    }.toDF("word", "cnt").orderBy(col("word"))
  }

  def grepPipe(s: SparkSession, d: String): DataFrame = {
    val lines = Tables.documents(s, d).select("text").rdd.map(_.getString(0))
    val spec = JobSpec(grepMapper, Seq.empty, numMappers = 8, numReducers = 1)
    val out = MapReduceJob.runLines(lines, spec)
    import s.implicits._
    out.toDF("line").orderBy(col("line"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount_pipe" -> wordcountPipe,
    "mr_grep_pipe" -> grepPipe,
  )

  override val oracle: Map[String, String] = Map(
    "mr_wordcount_pipe" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "mr_grep_pipe" ->
      """SELECT text AS line FROM documents
        |WHERE position('spark' IN text) > 0 ORDER BY line""".stripMargin,
  )
}
