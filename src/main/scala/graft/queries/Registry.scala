package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan plus (when SQL-expressible) the exact
  * ANSI SQL DuckDB oracle the driver hash-compares against. Numeric policy
  * for oracle parity (see SURVEY.md §5.2): all monetary doubles are exact
  * cents, so both sides cast to DECIMAL before aggregating (exact,
  * order-independent) and cast the final aggregate back to DOUBLE;
  * transcendental outputs are rounded to a granularity far above the
  * engines' last-ulp libm differences. Every query ORDER BYs a unique key
  * and aliases every output column identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = ""
)

trait QueryPack {
  def queries: Seq[Q]
}
