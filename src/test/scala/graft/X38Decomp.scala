package graft

import org.apache.spark.sql.functions._

/** x38_ams_f2 instability decomposition (VERDICT r18 item 6): the cell's
  * sf5/sf10 spreads (1.68–6.61 s, 4.98–16.2 s in SCALING.md) need an
  * attributed side. The query is two independent lineitem passes joined at
  * one broadcast row: (A) the AMS sketch — 16-way sign explode collapsed by
  * map-side combine into an O(16)-row exchange — and (B) the CERTIFY truth
  * side — exact per-l_orderkey counts, i.e. the full key-grouped shuffle.
  * This probe times A, B, and the full query for `reps` interleaved samples
  * per scale dir and prints per-sample walls plus each side's min/max, so a
  * spread in the full cell is attributed to the side that actually wobbles
  * (and GC wall is sampled around each rep to separate collector stalls
  * from plan cost). `sbt "Test/runMain graft.X38Decomp sf5=<dir> [reps]"`.
  */
object X38Decomp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = args.toSeq.filter(_.contains("=")).map { a =>
      val Array(t, d) = a.split("=", 2); (t, d)
    }
    val reps = args.toSeq.filterNot(_.contains("=")).headOption.map(_.toInt).getOrElse(5)

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }

    // Bench's timing basis, NOT count(): under a count() aggregate Catalyst
    // prunes the value arithmetic (the sign kernels here), timing only the
    // grouping skeleton — measured 0.3s for a side that really costs ~3s.
    def sweep(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }

    for ((tag, d) <- dirs) {
      import graft.ops.AmsSketch
      def li = Tables.lineitem(spark, d)
      def sketchSide(): Unit = {
        val keyed = li.select(
          ((lit(2654435761L) * col("l_orderkey") + lit(12345L)) % AmsSketch.P).as("h"))
        sweep(AmsSketch.estimate(AmsSketch.sums(AmsSketch.bucketize(keyed, col("h")))))
      }
      def exactSide(): Unit =
        sweep(li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * col("c")).cast("long").as("exact_f2")))
      def full(): Unit = sweep(SparkEntry.queries("x38_ams_f2")(spark, d))

      val sides = Seq[(String, () => Unit)]("sketch" -> (() => sketchSide()),
        "exact" -> (() => exactSide()), "full" -> (() => full()))
      val walls = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (r <- 1 to reps; (nm, f) <- sides) {
        val g0 = gcMillis(); val t0 = System.nanoTime()
        f()
        val w = (System.nanoTime() - t0) / 1e9; val g = gcMillis() - g0
        walls(nm) = walls(nm) :+ w
        println(f"X38DECOMP $tag rep=$r side=$nm wall=$w%.2f gc_ms=$g")
      }
      for ((nm, ws) <- walls.toSeq.sortBy(_._1))
        println(f"X38DECOMP $tag SUMMARY side=$nm min=${ws.min}%.2f " +
          f"max=${ws.max}%.2f spread=${ws.max / ws.min}%.2f " +
          s"samples=${ws.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
