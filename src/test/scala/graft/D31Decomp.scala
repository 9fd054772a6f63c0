package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps.tokens

/** d31_substring_spans_hashed volume decomposition across scale points —
  * attributes the sf10 row's 2.32× wall marginal (SCALING.md) to measured
  * stage volumes: gram rows (the shuffle input), duplicated-gram
  * fingerprints (df≥2), duplicated positions (the join output), and final
  * span rows. `sbt "Test/runMain graft.D31Decomp sf5=... sf10=..."`.
  */
object D31Decomp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = args.toSeq.map { a => val Array(t, d) = a.split("=", 2); (t, d) }
    for ((tag, d) <- dirs) {
      val k = 10
      val docs = Tables.documents(spark, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .withColumn("n_tokens", size(col("t")))
        .filter(col("n_tokens") >= k)
      val grams = docs
        .select(col("doc_id"),
          posexplode(graft.functions.TextExpressions.gramFingerprintsK(col("t"), k))
            .as(Seq("p0", "fp")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("fp"))
      val nGrams = grams.count()
      val dup = grams.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      val nDupFps = dup.count()
      val nDupPos = grams.join(dup.select(col("fp")), Seq("fp")).count()
      val t0 = System.nanoTime()
      val outRows = SparkEntry.queries("d31_substring_spans_hashed")(spark, d).count()
      val fullS = (System.nanoTime() - t0) / 1e9
      println(s"D31DECOMP $tag grams=$nGrams dup_fps=$nDupFps dup_pos=$nDupPos " +
        f"out_rows=$outRows full=${fullS}%.2f")
    }
    spark.stop()
  }
}
