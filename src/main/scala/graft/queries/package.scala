package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity helpers shared by every query pack.
  *
  * Policy (SURVEY.md §5.2): the driver hash-compares Spark parquet output
  * against DuckDB running [[SparkEntry.oracleSql]] on the same tables, so
  * every output cell must be bit-identical across engines:
  *
  *   - Monetary doubles are exact cents → cast to DECIMAL(18,2) before any
  *     SUM (exact, order-independent), cast the aggregate back to DOUBLE.
  *   - Averages = CAST(exact decimal sum AS DOUBLE) / COUNT — one IEEE
  *     division, deterministic on both engines.
  *   - Timestamps never leave as native values (Spark parquet stamps them
  *     UTC-adjusted, DuckDB naive) → format to 'yyyy-MM-dd HH:mm:ss' strings.
  *   - Transcendental outputs (ln/tan/cos-sim) are floor-quantized:
  *     floor(x*K)/K, which is deterministic double math on both sides (round()
  *     half-up semantics differ between engines — never use it for parity).
  *   - Every query ORDER BYs a unique key; nullable order keys are avoided
  *     (Spark default NULLS FIRST vs DuckDB NULLS LAST).
  *   - Integral division: Spark `DIV` and DuckDB `//` both truncate toward
  *     zero on INTEGER/BIGINT/HUGEINT operands — but DuckDB's `//` on a
  *     DECIMAL operand silently degrades to DOUBLE division (exactness lost
  *     past 2^53). Oracle-side wide integral division must go through
  *     HUGEINT, never DECIMAL (x30's slope quotient is the cautionary case).
  */
package object queries {
  /** Exact-cents decimal for money math; wide enough to never overflow a sum
    * at 100 TB scale factors (DECIMAL(18,2) operands, 38-digit accumulators).
    */
  val MoneyDec = "decimal(18,2)"

  def dec(c: Column): Column = c.cast(MoneyDec)

  /** Exact decimal sum surfaced as a double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum / count as one double divide. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Timestamp → engine-neutral string. DuckDB twin: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def fts(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Deterministic quantization for transcendental doubles (NOT round()). */
  def quant(c: Column, k: Double): Column = floor(c * k) / k
}
