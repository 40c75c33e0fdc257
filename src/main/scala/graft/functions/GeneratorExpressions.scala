package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native UDTF: emit one row per DISTINCT word-`n`-gram of a text column,
  * each row also carrying the doc's distinct-shingle count — i.e. the
  * rows `explode(array_distinct(<zip_with shingle chain>))` produces,
  * plus the `size(...)` the decontamination pipelines re-derive, in ONE
  * compiled pass.
  *
  * Why an expression and not the higher-order-function chain: the
  * `zip_with`-of-`slice` assembly runs on the INTERPRETED expression
  * path (lambda frames allocate a `UTF8String` per element per step),
  * which was slow enough that under-split local scans had to be
  * resharded just to spread the cost (`Tables.sharded`). This generator
  * is a plain JVM loop over the token array — one StringBuilder, one
  * LinkedHashSet — an order of magnitude less per-row overhead, and the
  * n-gram count rides along so consumers that need `(shingle, total)`
  * don't materialize the array at all. Tokenization matches
  * `split(text, ' ')` exactly (trailing empties kept: limit -1).
  *
  * Registered as `graft_ngram_rows(text, n)` by [[GraftExtensions]] for
  * SQL users; `GeneratorExpressions.ngram_rows` is the Column API.
  */
case class NgramRows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("sh", StringType, nullable = false),
    StructField("n_sh", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_rows needs a string input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return Iterator.empty
    val set = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    val total = set.size.toLong
    val it = set.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow =
        InternalRow(UTF8String.fromString(it.next()), total)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native UDTF: one row per OVERLAPPING word-`n`-window (stride 1, all
  * positions, duplicates kept) — `(i, sh)` for i = 0..tokens-n — the row
  * set `explode(transform(sequence(0, size - n), i -> struct(i, <join of
  * slice>)))` produces, without the interpreted per-element lambda.
  * Feeds position-aware consumers (sliding-substring dedup) where
  * [[NgramRows]]'s distinct-set semantics would lose the run structure. */
case class NgramWindowRows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"window size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("sh", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_windows needs a string input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return Iterator.empty
    val sb = new java.lang.StringBuilder
    val last = toks.length - n
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i <= last
      override def next(): InternalRow = {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val row = InternalRow(i.toLong, UTF8String.fromString(sb.toString))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GeneratorExpressions {
  /** Idempotently registers the generators in the session's registry. */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_rows",
      exprs => NgramRows(exprs(0),
        LitArgs.int("graft_ngram_rows", "n", exprs(1))),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_windows",
      exprs => NgramWindowRows(exprs(0),
        LitArgs.int("graft_ngram_windows", "n", exprs(1))),
      "built-in")
  }

  /** Column API (register first): use with a multi-alias, e.g.
    * `df.select(col("doc_id"), ngram_rows(col("text"), 3).as(Seq("sh", "n_sh")))`. */
  def ngram_rows(c: Column, n: Int): Column =
    call_function("graft_ngram_rows", c, org.apache.spark.sql.functions.lit(n))

  /** Column API for the positional window generator (register first). */
  def ngram_windows(c: Column, n: Int): Column =
    call_function("graft_ngram_windows", c, org.apache.spark.sql.functions.lit(n))
}
