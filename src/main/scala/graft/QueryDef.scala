package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: a Spark implementation plus (usually) a DuckDB
  * oracle SQL over the same parquet fixture tables.
  *
  * Determinism contract (the driver hash-compares values):
  *   - every query ends in a total ORDER BY, identical on both sides;
  *   - float aggregates are made exact by casting per-row doubles to
  *     fixed-scale DECIMAL before SUM (per-row IEEE ops are bit-identical
  *     across engines; only accumulation order varies), then casting the
  *     final value back to DOUBLE;
  *   - column names are aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  /** Query expressed as SQL text run through `spark.sql` over the fixture
    * views. When the Spark and DuckDB dialects agree the same text is the
    * oracle; pass `oracle` where they diverge.
    */
  def sql(name: String, sparkSql: String, oracle: String = null): QueryDef =
    QueryDef(
      name,
      (s: SparkSession, dir: String) => {
        graft.functions.PgFunctions.register(s)
        Tables.registerAll(s, dir)
        pgSql(s, sparkSql)
      },
      Some(Option(oracle).getOrElse(sparkSql)))

  /** `spark.sql` with reference (PG/DuckDB) semantics restored where
    * stock Spark diverges: quantified comparisons (`op ANY/ALL/SOME
    * (subquery)`, unparseable by Spark) expand via
    * [[graft.plans.QuantifiedSubqueries]] before parsing, and
    * value-position `[NOT] IN (subquery)` gets the standard's
    * three-valued result via [[graft.plans.NullAwareIn]] on the
    * analyzed plan. Plans without either pass through untouched.
    */
  def pgSql(s: SparkSession, text: String): org.apache.spark.sql.DataFrame = {
    graft.functions.PgFunctions.register(s) // idempotent; rewrites emit them
    val df = s.sql(graft.plans.PosixRegexRewrite.rewrite(
      graft.plans.SimilarToRewrite.rewrite(
        graft.plans.QuantifiedSubqueries.rewrite(
          graft.plans.ArrayLiteralRewrite.rewrite(
            graft.plans.JsonArrowRewrite.rewrite(
              graft.plans.CollateRewrite.rewrite(
                graft.plans.PgCastRewrite.rewrite(
                  graft.plans.RowCompareRewrite.rewrite(
                    graft.plans.MapTypeRewrite.rewrite(
                      graft.plans.DoubleQuoteRewrite.rewrite(text)))))))))))
    val analyzed = df.queryExecution.analyzed
    val fixed = graft.plans.NullAwareIn(analyzed)
    if (fixed.fastEquals(analyzed)) df
    else org.apache.spark.sql.GraftBridge.ofRows(s, fixed)
  }
}
