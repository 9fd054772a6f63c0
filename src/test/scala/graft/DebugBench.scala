package graft

/** Ad-hoc single-query timing/plan harness (test scope, not driver contract).
  * Usage: Test/runMain graft.DebugBench [-explain] q1 q2 ...
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    // warm the session (parquet footers, codegen, shuffle machinery)
    Tables.lineitem(spark, d).count()
    names.foreach { n =>
      if (explain) SparkEntry.queries(n)(spark, d).explain("formatted")
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, d).count()
      println(f"TIMING $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f sec  ($c rows)")
    }
    spark.stop()
  }
}
