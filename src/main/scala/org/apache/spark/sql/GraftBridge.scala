package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic`. Extension
  * libraries that build custom Catalyst expressions need exactly these
  * two hops; placing the shim inside the sql package is the standard
  * pattern for SparkSessionExtensions-style code.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a logical plan (classic.Dataset.ofRows is
    * private[sql]); needed to hang a custom FileIndex-backed relation
    * into a session.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def classicSession(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  /** Catalyst's loss-free implicit-cast test (`Cast.canUpCast`,
    * private[sql] surface area): true when `from` values are always
    * representable in `to` without truncation or null-out.
    */
  def canUpCast(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)

  /** Parquet footer MessageType → Spark StructType, the converter the
    * parquet datasource itself uses (`private[sql]`); lets bulk file
    * adoption read schema AND row count from ONE footer open per file
    * on the executors instead of a full `spark.read` resolution per
    * file on the driver. Takes the SESSION-merged Hadoop conf (see
    * [[sessionHadoopConf]]) so binaryAsString / int96AsTimestamp /
    * NTZ inference resolve exactly as the table's reads will.
    */
  def parquetSchemaToSpark(schema: org.apache.parquet.schema.MessageType,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(conf).convert(schema)

  /** The session's Hadoop conf WITH its SQLConf merged in
    * (`sessionState.newHadoopConf()`, `private[sql]`) — what the
    * datasource paths hand their readers; `sparkContext
    * .hadoopConfiguration` alone misses session-level SQL settings.
    * The parquet-schema-resolution booleans are pinned explicitly:
    * the merge only carries keys with SET values, while
    * [[parquetSchemaToSpark]]'s Configuration constructor requires
    * them present (it reads with no default).
    */
  def sessionHadoopConf(spark: SparkSession)
      : org.apache.hadoop.conf.Configuration = {
    import org.apache.spark.sql.internal.SQLConf
    val ss = classicSession(spark).sessionState
    val c = ss.newHadoopConf()
    Seq(SQLConf.PARQUET_BINARY_AS_STRING,
      SQLConf.PARQUET_INT96_AS_TIMESTAMP,
      SQLConf.CASE_SENSITIVE,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG).foreach { e =>
      c.set(e.key, ss.conf.getConf(e).toString)
    }
    c
  }

  /** Serializable wrapper for a Hadoop Configuration (`private[spark]`)
    * so per-file validation jobs can open footers executor-side.
    */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
