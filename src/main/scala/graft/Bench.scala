package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Prints ONE compact JSON line (the driver keeps only
  * the last ~2000 chars of stdout, so the line must stay well under that:
  * total + per-family subtotals + the slowest individual queries; the full
  * per-query map goes to BENCH_DETAIL.json next to the build).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (JVM JIT, codegen compiler, parquet footers,
    // shuffle machinery, OS page cache for every base table) so the first
    // measured query of each family isn't charged for first-touch I/O;
    // query-specific codegen/JIT is still charged to the query. Each table
    // warms independently so one missing file doesn't skip the rest.
    // NonFatal only, and loudly (same argument as the checkpoint warm-up
    // below): a missing/corrupt table must be VISIBLE in the bench log —
    // every query over it is about to fail — not silently absorbed; fatal
    // errors (OOM, interrupts) propagate.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] lineitem warm-up failed: $e")
    }
    Seq("orders", "customer", "supplier", "part", "nation", "region",
      "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $t warm-up failed: $e")
      }
    }
    // JIT/codegen warm for the shared physical shapes (shuffle hash join,
    // window, decimal aggregate) so the first measured query of the run
    // isn't charged for compiling machinery every later query reuses —
    // row-limited, so warm-up stays O(1) in the scale factor
    try {
      import org.apache.spark.sql.functions._
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(5000)
      val o = spark.read.parquet(s"$sfDir/orders.parquet").limit(5000)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_orderkey")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
          count(lit(1)).as("n"))
        .count()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] join/window/decimal shape warm-up failed: $e")
    }
    // GlobalOrder's per-query first-rep spike (~1.2s of per-schema
    // Encoders.row serializer+deserializer codegen, round-10 diagnosis) is
    // FIXED at the source: the scan now runs at the InternalRow level
    // (queryExecution.toRdd in, internalCreateDataFrame out — see
    // ops/GlobalOrder.scala), so no per-schema encoder pair compiles and no
    // per-row external boxing remains. A/B same-harness (GoBench, sf0.1):
    // p17 rep1 1.77→1.03s, steady 0.71→0.53s; x20 rep1 4.39→3.33s.
    // localCheckpoint machinery (block manager write paths, checkpoint RDD
    // materialization) is first-touched by whichever CC/graph query runs
    // first and shows up as a rep-1-only spike (d10 spread 3.5x in the
    // r10 detail); warm it with a tiny throwaway checkpoint so the spike
    // isn't charged to a measured query
    try {
      import spark.implicits._
      spark.range(1000).toDF("x").localCheckpoint(true).count()
    } catch {
      // NonFatal only, and loudly: a genuinely broken checkpoint path must
      // not be silently absorbed here (the rep-1 spike would quietly return
      // to whichever CC query checkpoints first, and worse, every CC query
      // would be broken); OOM/interrupts propagate.
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] localCheckpoint warm-up failed: $e")
    }
    // iteration aid: SPARK_GRAFT_ONLY=q1,q3 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // sorted-name order (stable across rounds, so per-query diffs compare
    // like with like) and TWO timed runs per query keeping the min — a
    // single sample on a shared host conflates scheduler noise with
    // regressions; the min of two is a far tighter lower-bound estimator
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    // contended-tail re-reps: when the initial samples of a query spread
    // more than 2x (scheduler noise on a shared host), take up to 2 extra
    // reps and judge contention on the best TWO samples — the min (what the
    // total uses) only improves, and a query stays flagged only if even its
    // two best samples disagree 2x. Bounds the extra work to the flagged
    // tail: a quiet host pays zero extra reps.
    val extraReps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt.max(0)
    val queryFns = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1)
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // consume the OUTPUT rows, not count(): under a count() aggregate
      // Catalyst prunes the final projection, so a per-row kernel query
      // (codec round trips, token stats) would time only its scan. The
      // InternalRow sweep forces every output column to materialize on
      // the executors with nothing collected to the driver.
      // A broken query returns -1 (sample invalid) and is logged loudly
      // — recording elapsed-until-failure as a valid sample would let a
      // broken path SHRINK the suite total instead of failing visibly
      // (ADVICE r11; same argument as the warm-up catches). Fatal errors
      // (OOM, interrupts) propagate.
      try {
        fn(spark, sfDir).queryExecution.toRdd.foreachPartition { it =>
          while (it.hasNext) it.next()
        }
        (System.nanoTime() - t0) / 1e9
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] query $name FAILED: $e")
          -1.0
      }
    }
    def best2Spread(samples: Seq[Double]): Double = {
      val s = samples.sorted
      if (s.size < 2 || s.head <= 0) 1.0 else s(1) / s.head
    }
    def isContended(samples: Seq[Double]): Boolean =
      samples.forall(_ >= 0) && samples.min >= 0.05 && best2Spread(samples) > 2.0
    val firstPass = queryFns.map { case (name, fn) =>
      if (sys.env.contains("SPARK_GRAFT_TRACE"))
        System.err.println(s"[bench-trace] ${java.time.Instant.now()} $name")
      // stop sampling a query at its first failure — reps of a broken
      // query are noise, and the failure is already on stderr
      val samples = scala.collection.mutable.ArrayBuffer(once(name, fn))
      while (samples.last >= 0 && samples.size < reps) samples += once(name, fn)
      while (samples.last >= 0 && isContended(samples.toSeq) &&
        samples.size < reps + extraReps)
        samples += once(name, fn)
      name -> samples.toSeq
    }
    // Isolated end-of-run re-rep for cells STILL contended after the inline
    // ladder: those extra reps ran inside the same noisy window that spread
    // the first samples (an antagonist process or GC storm outlasts 4
    // back-to-back reps), which is why one contended cell kept slipping into
    // the canonical artifact round after round (r13 x37, r14 d5). Re-take
    // the flagged tail once the whole sweep is done — minutes later, after a
    // GC + settle — so the verdict reflects the query, not the moment. Work
    // stays bounded: the quiet-host case re-reps nothing.
    val isoReps = sys.env.getOrElse("SPARK_GRAFT_ISO_REPS", "3").toInt.max(0)
    val contendedNames = firstPass.collect { case (n, ss) if isContended(ss) => n }.toSet
    val results0 =
      if (contendedNames.isEmpty || isoReps == 0) firstPass
      else {
        System.err.println(
          s"[bench] isolated re-rep: ${contendedNames.toSeq.sorted.mkString(",")}")
        System.gc(); Thread.sleep(1000)
        val fnByName = queryFns.toMap
        firstPass.map { case (name, ss) =>
          if (!contendedNames(name)) (name, ss)
          else {
            val samples = scala.collection.mutable.ArrayBuffer(ss: _*)
            while (samples.last >= 0 && isContended(samples.toSeq) &&
              samples.size < ss.size + isoReps)
              samples += once(name, fnByName(name))
            (name, samples.toSeq)
          }
        }
      }
    val results = results0
      .map { case (name, samples) =>
        if (samples.exists(_ < 0)) (name, -1.0, -1.0, 1.0, samples.size)
        else {
          val s = samples.sorted
          (name, s.head, s.last, best2Spread(samples), samples.size)
        }
      }
    def r3(v: Double): String = f"$v%.3f"
    val failed = results.filter(_._2 < 0).map(_._1)
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    // full detail to a file (unbounded size is fine there). min/max over all
    // reps go out so the artifact shows the raw noise; `contended` is judged
    // on the BEST-2 spread after the re-rep ladder above — a query is only
    // flagged when even its two best samples disagree 2x, so driver-sample
    // totals stop wobbling with scheduler noise (sub-50ms mins are excluded:
    // at that scale the spread is timer noise). `reps` appears when the
    // ladder took extra samples.
    val flagged = ok.filter { case (_, mn, _, b2, _) => mn >= 0.05 && b2 > 2.0 }
    val eligible = ok.count(_._2 >= 0.05).max(1)
    val contentionScore = flagged.size.toDouble / eligible
    val detail = results.sortBy(-_._2)
      .map { case (k, mn, mx, b2, n) =>
        if (mn < 0) s"\"" + k + "\":{\"failed\":true}"
        else {
          val c = if (mn >= 0.05 && b2 > 2.0) ",\"contended\":true" else ""
          val r = if (n > reps) s""","reps":$n""" else ""
          s"\"" + k + "\":{\"min\":" + r3(mn) + ",\"max\":" + r3(mx) + c + r + "}"
        }
      }.mkString("{", ",", "}")
    // the r8 detail artifact silently carried 205 of 206 rows — make the
    // invariant explicit so a dropped row fails loudly instead
    require(results.map(_._1).distinct.size == results.size,
      "duplicate query names would collapse detail JSON keys")
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      w.println(
        s"""{"total":${r3(total)},"n_queries":${ok.size},"n_failed":${failed.size},""" +
          s""""sf":"$sfDir",""" +
          s""""contention":{"n_contended":${flagged.size},"n_eligible":$eligible,""" +
          s""""score":${r3(contentionScore)},"sum_max":${r3(ok.map(_._3).sum)}},""" +
          s""""queries":$detail}""")
      w.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write BENCH_DETAIL.json: $e")
    }
    // compact stdout line: family subtotals + slowest 30 queries; failures
    // ride the headline line so the artifact itself shows them
    val families = ok.groupBy(_._1.takeWhile(_ != '_').filter(_.isLetter))
      .toSeq.sortBy(_._1)
      .map { case (f, rs) => s"\"" + f + "\":" + r3(rs.map(_._2).sum) }
      .mkString("{", ",", "}")
    val slowest = ok.sortBy(-_._2).take(30)
      .map { case (k, v, _, _, _) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    val metricLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${ok.size},"contended":${flagged.size}$failedJson,"families":$families,"queries":$slowest,"sf":"$sfDir"}"""
    println(metricLine)
    // the driver records only the last ~2000 chars of combined output, and
    // executor-shutdown WARN logs after this point have been flooding the
    // metric line out of that window (BENCH_r13/r14 "parsed": null). Mute
    // the logger before stop() and print the line once more LAST, so the
    // tail always contains one intact copy.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(metricLine)
    // and to stderr: if the driver concatenates the two captured streams,
    // the stdout copies land mid-buffer and only stderr reaches the tail
    System.err.println(metricLine)
  }
}
