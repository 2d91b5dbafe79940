package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profile of the per-query BUILD phase (driver-side): where do
  * the ~0.7 s per SQL query go — table registration, function
  * registration, the dialect rewrite chain, or parse/analysis?
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e6}%10.1f ms")
      r
    }
    // one throwaway to absorb first-touch classloading
    graft.Tables.registerAll(spark, sfDir)
    graft.functions.PgFunctions.register(spark)

    for (i <- 1 to 3) {
      println(s"--- iteration $i ---")
      time("Tables.registerAll") { graft.Tables.registerAll(spark, sfDir) }
      time("  single spark.read.parquet") {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
      }
      time("PgFunctions.register") { graft.functions.PgFunctions.register(spark) }
      val sql =
        """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
          |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM customer
          |  JOIN orders ON c_custkey = o_custkey
          |  JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE o_orderkey IN (
          |  SELECT l_orderkey FROM lineitem
          |  GROUP BY l_orderkey
          |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
          |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
          |ORDER BY o_totalprice DESC, o_orderkey
          |LIMIT 100""".stripMargin
      val rewritten = time("rewrite chain (10 passes)") {
        graft.plans.PosixRegexRewrite.rewrite(
          graft.plans.SimilarToRewrite.rewrite(
            graft.plans.QuantifiedSubqueries.rewrite(
              graft.plans.ArrayLiteralRewrite.rewrite(
                graft.plans.JsonArrowRewrite.rewrite(
                  graft.plans.CollateRewrite.rewrite(
                    graft.plans.PgCastRewrite.rewrite(
                      graft.plans.RowCompareRewrite.rewrite(
                        graft.plans.MapTypeRewrite.rewrite(
                          graft.plans.DoubleQuoteRewrite.rewrite(sql))))))))))
      }
      val df = time("spark.sql (parse)") { spark.sql(rewritten) }
      time("analyzed") { df.queryExecution.analyzed }
      time("full pgSql") { graft.QueryDef.pgSql(spark, sql) }
    }
    spark.stop()
  }
}
