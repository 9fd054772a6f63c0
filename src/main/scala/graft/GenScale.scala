package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver's synthetic testdata: reads the
  * tables at `srcDir` and writes a `factor`× corpus to `outDir`, modelling
  * the scaled data as `factor` disjoint ingest shards (the shape a real
  * 100 TB corpus has: many sources, each internally structured like the
  * small one). Used to turn the 100 TB plan-shape arguments in PLANS.md
  * into measured sf0.1 → sf1 scaling curves (see SCALING.md).
  *
  * Per-copy transforms are chosen so every workload family scales
  * LINEARLY in rows, not quadratically in accidental cross-copy matches:
  *
  *   - fact/dim keys: offset by `copy * (max_key + 1)` — copies are
  *     disjoint subgraphs (supplier co-order graph, CC, k-hop all get
  *     `factor` independent components, like TPC-H SF scaling).
  *   - `region`/`nation`: kept as-is (fixed dimensions, TPC-H style).
  *   - `documents.text`: per-copy Caesar shift of the letters. Byte
  *     length, token structure, and per-copy Zipf shape are preserved
  *     exactly, but copies share (almost) no shingles, so near-dup joins
  *     (d7/d16 MinHash/Jaccard) see `factor`× the pairs, not `factor²`×.
  *   - `embeddings.embedding`: per-copy array rotation — norm-preserving
  *     and within-copy geometry identical, cross-copy dot products
  *     scrambled, so ANN candidate structure scales linearly. `vec_id=0`
  *     (the pinned query vector of s2/s13/s15) stays unique to copy 0.
  *   - `events.ts` / `user_id`: timestamps kept, users offset — the
  *     streaming/session families see `factor`× concurrent users over the
  *     same wall-clock span, which is exactly how event volume grows.
  */
object GenScale {
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def keyOffset(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // key spans, computed once from the source
    val custOff = keyOffset(tbl("customer"), "c_custkey")
    val suppOff = keyOffset(tbl("supplier"), "s_suppkey")
    val partOff = keyOffset(tbl("part"), "p_partkey")
    val ordOff = keyOffset(tbl("orders"), "o_orderkey")
    val docOff = keyOffset(tbl("documents"), "doc_id")
    val vecOff = keyOffset(tbl("embeddings"), "vec_id")
    val eidOff = keyOffset(tbl("events"), "event_id")
    val uidOff = keyOffset(tbl("events"), "user_id")

    def caesar(c: org.apache.spark.sql.Column, shift: Int): org.apache.spark.sql.Column = {
      val lo = Lower.drop(shift % 26) + Lower.take(shift % 26)
      val up = Upper.drop(shift % 26) + Upper.take(shift % 26)
      translate(c, Lower + Upper, lo + up)
    }

    /** union of `factor` transformed copies, written as one parquet dir */
    def scaled(name: String)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val src = tbl(name)
      val out = (0 until factor).map(i => copy(src, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"wrote $name x$factor")
    }

    scaled("region")((df, i) => if (i == 0) df else df.limit(0))
    scaled("nation")((df, i) => if (i == 0) df else df.limit(0))
    scaled("customer")((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custOff)))
    scaled("supplier")((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppOff)))
    scaled("part")((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partOff)))
    scaled("orders")((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custOff)))
    scaled("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordOff))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppOff)))
    scaled("events")((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * eidOff))
        .withColumn("user_id", col("user_id") + lit(i * uidOff)))
    scaled("documents")((df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text", caesar(col("text"), i)))
    scaled("embeddings") { (df, i) =>
      val rot = if (i == 0) col("embedding")
      else concat(
        slice(col("embedding"), lit(i + 1), size(col("embedding")) - lit(i)),
        slice(col("embedding"), lit(1), lit(i)))
      df.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
        .withColumn("embedding", rot.cast("array<float>"))
    }
    spark.stop()
  }
}
