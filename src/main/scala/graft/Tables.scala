package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access for the driver-generated parquet at
  * `/root/testdata/sf*` (see TESTDATA.md / FIXTURES.md).
  *
  * The reference registers lake tables over parquet URLs and lets its
  * engine scan them (pg_lake_table/src/ddl/create_table.c); our
  * equivalent at test scope is a plain parquet read registered as a
  * temp view. Production-shaped tables go through [[graft.lake.LakeTable]].
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val dims: Set[String] = Set("region", "nation", "customer", "supplier", "part")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Resolved-relation cache, keyed per session so a stopped session's
    * plans are never reused. `spark.read.parquet` re-resolves the data
    * source and re-reads the footer schema on EVERY call (~95 ms/table
    * measured on the bench host) — ~1 s per registerAll, per query, per
    * repeat. A real engine resolves a table's schema once into its
    * catalog (the reference keeps it in PG's catalog); this cache is
    * that catalog. Plans only — no data is cached (the scan still reads
    * the parquet file on every execution).
    */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relationCache.computeIfAbsent((spark, s"$sfDir/$name"),
      _ => resolve(spark, sfDir, name))

  private def resolve(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) in the driver fixtures,
      // which Spark's vectorized reader rejects. Read the raw int64
      // nanos and floor-convert to microsecond TIMESTAMP_NTZ — the same
      // truncation DuckDB applies. Fixture sets written with micro
      // precision (e.g. the sf1 scale smoke) come back as a timestamp
      // already, so dispatch on the physical type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(sfDir, name))
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)")
        case _ => org.apache.spark.sql.functions.col("ts")
      }
      raw.withColumn("ts", ts.cast("timestamp_ntz"))
    } else spark.read.parquet(path(sfDir, name))

  /** Register every fixture table as a temp view named after the table.
    * Idempotent per (session, sfDir): re-registering identical views per
    * query added ~1 s of driver time to every SQL query's build phase.
    * Switching a session to a different sfDir re-points all ten views.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registered.put(spark, sfDir) != sfDir)
      all.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
