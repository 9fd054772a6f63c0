package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool: stage-level wall/task-time breakdown of one registered query.
  *
  *   sbt "Test/runMain graft.QueryProfile <sfDir> <queryName> [reps]"
  *
  * Prints, per completed stage of the final rep: stage name (first line of
  * its call-site description), task count, total executor run time, and
  * wall between submission and completion — the view `.explain` can't give
  * (where the seconds actually go when the plan already looks right).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("PROFILE_MAX_PARTITION_BYTES")
      .foreach(v => b.config("spark.sql.files.maxPartitionBytes", v))
    // mirror Bench's r20 engine default + the SPARK_GRAFT_CONF hook so
    // profiles run under the same session config the bench measures
    b.config("spark.shuffle.sort.bypassMergeThreshold", "8")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry needs k=v: $kv")
        b.config(kv.substring(0, i), kv.substring(i + 1))
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, tasks: Int, runMs: Long, wallMs: Long,
        gcMs: Long, wtMs: Long, fwMs: Long, desMs: Long,
        inRec: Long, sRead: Long, sWrite: Long)
    // appended from the listener-bus thread, cleared/read from main: every
    // access synchronizes on the buffer, and each rep drains the bus
    // (GraftShims.waitListenerBusEmpty) BEFORE reading — stage-completed
    // events land after the action's driver-side return, so an unfenced
    // read sees a truncated (or concurrently growing) table (ADVICE r16)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(-1L)
        val m = i.taskMetrics
        val st = St(i.name.takeWhile(_ != '\n'), i.numTasks,
          m.executorRunTime, wall, m.jvmGCTime,
          m.shuffleWriteMetrics.writeTime / 1000000,
          m.shuffleReadMetrics.fetchWaitTime, m.executorDeserializeTime,
          m.inputMetrics.recordsRead,
          m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten)
        stages.synchronized { stages += st }
      }
    })

    val q = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      stages.synchronized { stages.clear() }
      val t0 = System.nanoTime()
      q(spark, sfDir).queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShims.waitListenerBusEmpty(spark)
      println(f"[profile] rep $r: $wall%.3f s, ${stages.synchronized(stages.size)} stages")
    }
    println(f"[profile] final-rep stages (executor-run-ms desc):")
    stages.synchronized(stages.sortBy(-_.runMs).toList).foreach { s =>
      println(f"[profile]   run=${s.runMs}%6d ms  wall=${s.wallMs}%6d ms  gc=${s.gcMs}%5d  wt=${s.wtMs}%5d  fw=${s.fwMs}%5d  des=${s.desMs}%5d  tasks=${s.tasks}%3d  in=${s.inRec}%8d  sr=${s.sRead}%8d  sw=${s.sWrite}%8d  ${s.name}")
    }
    if (sys.env.contains("PROFILE_EXPLAIN")) {
      val df = q(spark, sfDir)
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map("[plan] " + _).mkString("\n"))
    }
    spark.stop()
  }
}
