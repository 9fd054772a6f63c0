package graft

import org.apache.spark.sql.functions._

/** s22_adaptive_ann candidate-volume decomposition across scale points —
  * the d29 instrument (D29Decomp) applied to the serving shape, so the
  * SCALING.md sf10 row's skew attribution is measured, not hypothesized.
  * `sbt "Test/runMain graft.S22Decomp sf5=... sf10=..."`.
  */
object S22Decomp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorExpressions.lshBucketDyn

    val dirs = args.toSeq.map { a => val Array(t, d) = a.split("=", 2); (t, d) }
    for ((tag, d) <- dirs) {
      val L = 4
      val kdf = Tables.embeddings(spark, d)
        .filter(col("vec_id") % 50 =!= 0)
        .agg(count(lit(1)).as("n"))
        .select(expr("GREATEST(4, LEAST(16, length(bin((n + 7) DIV 8)))) AS k"))
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(kdf))
        .select(
          Seq(col("vec_id"), col("k")) ++
            (0 until L).map(t => lshBucketDyn(col("embedding"), col("k"), t * 20).as(s"wb$t")): _*)
      val idxArr = (0 until L)
        .map(t => s"named_struct('tbl', $t, 'bucket', wb$t)")
        .mkString("array(", ", ", ")")
      val probeArr = (0 until L)
        .map(t => s"""transform(sequence(0, k), p -> named_struct('tbl', $t,
           |  'bucket', CASE WHEN p = 0 THEN wb$t
           |            ELSE wb$t ^ shiftleft(CAST(1 AS BIGINT), p - 1) END))""".stripMargin)
        .mkString("concat(", ", ", ")")
      val db = e.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id"), explode(expr(idxArr)).as("tb"))
        .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      val qs = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), explode(expr(probeArr)).as("tb"))
        .select(col("q_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      val n = e.count()
      val k = kdf.head().getInt(0)
      val pairs = db.join(qs, Seq("tbl", "bucket")).count()
      val occ = db.groupBy(col("tbl"), col("bucket")).count()
        .agg(avg("count"), max("count")).head()
      println(s"S22DECOMP $tag n=$n k=$k pairs=$pairs " +
        f"cell_avg=${occ.getDouble(0)}%.2f cell_max=${occ.getLong(1)}")
    }
    spark.stop()
  }
}
