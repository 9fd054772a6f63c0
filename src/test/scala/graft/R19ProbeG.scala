package graft

import org.apache.spark.sql.functions._

/** r19 dev probe: g-family co-order pair build — does the explicit-count
  * repartition survive planning, and what do the variants cost?
  * Usage: sbt "Test/runMain graft.R19ProbeG [sfDir]"
  */
object R19ProbeG {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    Tables.lineitem(spark, d).count()
    def agged = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey").cast("long"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    def explPairs(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(expr(
        "flatten(transform(ss, (a, i) -> transform(" +
          "slice(ss, i + 2, size(ss) - i - 1), " +
          "b -> named_struct('u', a, 'v', b))))")).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v")).agg(count(lit(1)).as("w"))
    val n = spark.sessionState.conf.numShufflePartitions
    def vKeyed = explPairs(agged.repartition(n, col("l_orderkey")))
    def vPlain = explPairs(agged)
    def vRR = explPairs(agged.repartition(n))
    if (sys.env.contains("PROBE_EXPLAIN")) {
      println("[probe] === keyed repartition plan ===")
      vKeyed.explain("formatted")
    }
    (1 to 4).foreach { r =>
      time(s"rep$r keyed repartition(n, orderkey)") { sweep(vKeyed) }
      time(s"rep$r no repartition") { sweep(vPlain) }
      time(s"rep$r round-robin repartition(n)") { sweep(vRR) }
    }
    spark.stop()
  }
}
