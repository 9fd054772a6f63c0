package graft

import org.apache.spark.sql.functions._

/** r19 dev probe: decompose x31's first GlobalOrder pass into timed pieces.
  * Test-scope scratch tool (QueryProfile's sibling), not driver contract.
  * Usage: sbt "Test/runMain graft.R19Probe [sfDir]"
  */
object R19Probe {
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
      println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    // warm
    Tables.lineitem(spark, d).count()
    spark.range(1000).toDF("x").localCheckpoint(true).count()
    val base = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), dec(col("l_extendedprice")).as("v"),
        col("l_orderkey"), col("l_linenumber"))
    (1 to 3).foreach { r =>
      time(s"rep$r scan+project sweep") { sweep(base) }
      time(s"rep$r scan+rbr(32) sweep") {
        sweep(base.repartitionByRange(32, col("l_returnflag"), col("v"),
          col("l_orderkey"), col("l_linenumber")))
      }
      time(s"rep$r scan+rbr+ckpt") {
        base.repartitionByRange(32, col("l_returnflag"), col("v"),
          col("l_orderkey"), col("l_linenumber"))
          .withColumn("__go_pid", spark_partition_id())
          .localCheckpoint().queryExecution.toRdd.count()
      }
      time(s"rep$r full ranked() pass") {
        sweep(graft.ops.GlobalOrder.withGroupedRunningSum(
          base, "cw", "tw", lit(1L), Seq("l_returnflag"),
          Seq(col("v"), col("l_orderkey"), col("l_linenumber"))))
      }
      time(s"rep$r repartition(32) hash sweep") {
        sweep(base.repartition(32, col("l_returnflag"), col("v")))
      }
    }
    spark.stop()
  }
}
