package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The real registry lives in [[QueryCatalog]] (one Spec per implemented
  * operator of SURVEY.md §2, pairing the Spark plan with its DuckDB
  * oracle SQL).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Margin-by-SKU is the reference's EP2 "deep" dashboard query
    * (scripts/dashboard.py:67-73): scan → broadcast join → derived fee →
    * exact-decimal agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.marginBySku(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
