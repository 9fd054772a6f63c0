package graft

import org.apache.spark.sql.functions._

/** r20 probe (VERDICT r19 item 7): attribute the per-query fixed floor.
  * ~190 of the 260 queries run under 0.65 s at sf0.1; this splits a sample
  * of them into (a) dataframe construction + analysis + optimization +
  * physical planning (everything before the first task), (b) first
  * execution (carries the query's codegen/JIT), (c) steady-state execution
  * (min of 3 further runs), and (d) the scheduling share of (c) — stage
  * wall vs task time — from the listener.
  *
  *   sbt "Test/runMain graft.R20ProbeFloor /root/testdata/sf0.1 q2_filter_project,..."
  */
object R20ProbeFloor {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names = args(1).split(",")
    val b = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup as the bench does: page cache, shuffle machinery,
    // generic codegen paths — what remains per query is the honest floor
    Tables.lineitem(spark, d).count()
    Tables.orders(spark, d).count()
    spark.range(1000).groupBy((col("id") % 7).as("k")).count().collect()

    println(f"[floor] ${"query"}%-28s ${"plan_ms"}%8s ${"first_ms"}%9s ${"steady_ms"}%10s ${"stagewall_ms"}%12s")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, d)
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val tFirst = (System.nanoTime() - t1) / 1e6
      var stageWall = 0.0
      val steady = (1 to 3).map { _ =>
        val walls = scala.collection.mutable.ArrayBuffer.empty[Long]
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            for { s <- i.submissionTime; c <- i.completionTime } walls += (c - s)
          }
        }
        spark.sparkContext.addSparkListener(l)
        val df2 = SparkEntry.queries(n)(spark, d)
        val t2 = System.nanoTime()
        df2.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        val w = (System.nanoTime() - t2) / 1e6
        org.apache.spark.sql.GraftShims.waitListenerBusEmpty(spark)
        spark.sparkContext.removeSparkListener(l)
        stageWall = walls.sum.toDouble
        w
      }.min
      println(f"[floor] $n%-28s $tPlan%8.0f $tFirst%9.0f $steady%10.0f $stageWall%12.0f")
    }
    spark.stop()
  }
}
