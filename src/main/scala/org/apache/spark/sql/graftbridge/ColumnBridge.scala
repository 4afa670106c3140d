package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]` (`ExpressionUtils` in
  * `org.apache.spark.sql.classic`), so a library shipping its own codegen
  * expressions needs this one-file shim inside the sql package tree — the
  * standard extension pattern for libraries that must run on a STOCK
  * SparkSession (no SparkSessionExtensions registration required, which
  * matters because the driver probes `SparkEntry.queries` with a bare
  * session the library does not construct).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataType.sameType (case/nullability-insensitive equality) is also
    * `private[sql]`.
    */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** Register a function description into an already-running session's
    * FunctionRegistry (the registry lives behind `private[sql]`
    * sessionState). Complements the `spark.sql.extensions` config path,
    * which only applies to sessions built AFTER the config is set.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** RDD.zipWithIndex over the frame's InternalRows, appending the
    * (1-based) index as a LongType column `as` — the canonical Spark
    * global-numbering scheme. A SINGLE RDD instance backs both
    * zipWithIndex's partition-count job and the data pass, so the
    * upstream shuffle (and its sampled range bounds, when the input is
    * range-partitioned) is materialized once and reused; no persist or
    * checkpoint needed, shuffle files are GC-cleaned. InternalRow-level
    * (`toRdd` + `internalCreateDataFrame` are `private[sql]`): no
    * Row encode/decode round trip on the data path. Rows are copied out
    * of the reused Unsafe buffers once — the price of leaving codegen
    * for one boundary.
    */
  def zipWithGlobalIndex(df: org.apache.spark.sql.DataFrame,
      as: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val schema = StructType(
      df.schema.fields :+ StructField(as, LongType, nullable = false))
    val rdd = ds.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { case (row, i) =>
        extra.update(0, i + 1L)
        joined(row, extra).copy()
      }
    }
    spark.internalCreateDataFrame(rdd, schema)
  }

  /** Distributed inclusive prefix sum over a LongType column, in the
    * frame's current (partition, row) order — [[zipWithGlobalIndex]]
    * generalized from counting rows to summing a weight. Appends the
    * running total as LongType column `as` (nulls in the weight column
    * contribute 0 and carry the previous total).
    *
    * Same two-job / one-RDD-instance scheme as `RDD.zipWithIndex`: job 1
    * sums the weight per partition (a numPartitions-sized collect — the
    * sanctioned bounded kind), the driver scans those totals into
    * per-partition offsets, job 2 streams each partition once adding its
    * offset. The SINGLE backing RDD means the upstream shuffle (and its
    * sampled range bounds when the caller range-partitioned) materializes
    * once and both jobs see identical partitions — the determinism
    * argument of [[zipWithGlobalIndex]] verbatim.
    */
  def zipWithRunningSum(df: org.apache.spark.sql.DataFrame,
      weight: String, as: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val ord = df.schema.fieldIndex(weight)
    require(df.schema(ord).dataType == LongType,
      s"zipWithRunningSum: column $weight must be LongType")
    val schema = StructType(
      df.schema.fields :+ StructField(as, LongType, nullable = false))
    val rdd0 = ds.queryExecution.toRdd
    val perPart = rdd0.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(ord)) s += r.getLong(ord))
      Iterator((i, s))
    }.collect().toMap
    val offsets = new Array[Long](rdd0.getNumPartitions)
    var acc = 0L
    offsets.indices.foreach { i =>
      offsets(i) = acc
      acc += perPart.getOrElse(i, 0L)
    }
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      var s = offsets(i)
      it.map { row =>
        if (!row.isNullAt(ord)) s += row.getLong(ord)
        extra.update(0, s)
        joined(row, extra).copy()
      }
    }
    spark.internalCreateDataFrame(rdd, schema)
  }
}
