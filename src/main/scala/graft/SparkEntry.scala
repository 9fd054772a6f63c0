package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.AllPacks

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All real logic lives in `graft.queries.*` packs (one [[graft.queries.Q]]
  * per operator from SURVEY.md §2) and the `graft.ops` / `graft.functions` /
  * `graft.sources` libraries they exercise.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Scan→filter→broadcast-join→agg→top-k, the incoming-flow shape (§3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    AllPacks.queries("q3_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = AllPacks.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = AllPacks.oracles
}
