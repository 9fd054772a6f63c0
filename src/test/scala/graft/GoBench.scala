package graft

/** Controlled per-rep timing for the GlobalOrder family (round-10 first-rep
  * investigation). Runs each query 3 times in one JVM after the standard
  * bench warmup, printing every rep — not min — so the warmup cost itself is
  * visible. `sbt "Test/runMain graft.GoBench"`.
  */
object GoBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // same generic warmup Bench does: touch every table + common exprs
    try {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, d).join(Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")).count()
    } catch { case _: Throwable => () }
    val names = Seq("x17_weighted_median", "x20_ks_test", "p17_token_budget_cut")
    for (n <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).collect()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"GOBENCH $n rep$rep $s%.3f")
    }
    spark.stop()
  }
}
