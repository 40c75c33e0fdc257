package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` doorway a V1 streaming Source implementation
  * needs: `MicroBatchExecution` asserts that `Source.getBatch` returns a
  * STREAMING DataFrame, and the only constructor for one is
  * `SparkSession.internalCreateDataFrame(isStreaming = true)`. Exposing
  * it from an `org.apache.spark.sql` subpackage is the established
  * connector-library pattern (Delta, spark-redshift, et al. live under
  * this package for exactly this reason); nothing else private is
  * touched. */
object GraftSqlShims {
  def streamingDataFrame(s: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}
