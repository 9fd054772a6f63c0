package graft

import org.apache.spark.sql.functions._
import graft.queries.quant

/** Decomposition of d29_semdedup_adaptive's super-linear marginal (3.71× at
  * the 10×→20× doubling, SCALING.md three-point matrix): measures, per scale
  * point, the derived k, each intermediate's ROW VOLUME (index entries,
  * probe entries, equi-join candidate pairs before and after DISTINCT), and
  * the wall time of three nested sub-plans (bucket codes only → candidate
  * join counted → full query) so the 3.71× can be attributed to measured
  * stage growth instead of asserted. `sbt "Test/runMain graft.D29Decomp"`
  * (expects testdata-sf1/-sf2 from GenScale; see .claude/skills/verify).
  */
object D29Decomp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorOps.{dot, norm}
    import graft.functions.VectorExpressions.lshBucketDyn

    // default three-point ladder; override with `tag=dir` args for other
    // decades (r18: `sf5=... sf10=...` attributed the 100× marginal)
    val dirs =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(t, d) = a.split("=", 2); (t, d)
      }
      else Seq(
        "sf0.1" -> "/root/testdata/sf0.1",
        "sf1" -> "/root/repo/testdata-sf1",
        "sf2" -> "/root/repo/testdata-sf2")

    for ((tag, d) <- dirs) {
      // the d29 plan, stage by stage (same expressions as DedupPack d29)
      val kdf = Tables.embeddings(spark, d)
        .agg(count(lit(1)).as("n"))
        .select(expr("GREATEST(4, LEAST(16, length(bin((n + 7) DIV 8)))) AS k"))
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(kdf))
        .select(
          Seq(col("vec_id"), col("embedding"), col("k"), norm(col("embedding")).as("nrm")) ++
            (0 until 4).map(t => lshBucketDyn(col("embedding"), col("k"), t * 20).as(s"wb$t")): _*)
      val idxArr = (0 until 4)
        .map(t => s"named_struct('tbl', $t, 'bucket', wb$t)")
        .mkString("array(", ", ", ")")
      val probeArr = (0 until 4)
        .map(t => s"""transform(sequence(0, k), p -> named_struct('tbl', $t,
           |  'bucket', CASE WHEN p = 0 THEN wb$t
           |            ELSE wb$t ^ shiftleft(CAST(1 AS BIGINT), p - 1) END))""".stripMargin)
        .mkString("concat(", ", ", ")")
      val idx = e
        .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"),
          explode(expr(idxArr)).as("tb"))
        .select(col("b_id"), col("b_emb"), col("b_nrm"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      val probes = e
        .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"),
          explode(expr(probeArr)).as("tb"))
        .select(col("a_id"), col("a_emb"), col("a_nrm"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      val joined = idx.join(probes, Seq("tbl", "bucket")).filter(col("b_id") < col("a_id"))
      val cand = joined
        .select(col("a_id"), col("b_id"),
          quant(dot(col("a_emb"), col("b_emb")) /
            when(col("a_nrm") * col("b_nrm") > 0.0, col("a_nrm") * col("b_nrm")), 1e6)
            .as("cos_sim"))
        .filter(col("cos_sim").isNotNull)
        .distinct()

      val n = Tables.embeddings(spark, d).count()
      val k = kdf.head().getInt(0)
      val nIdx = idx.count()
      val nProbes = probes.count()
      val nPairs = joined.count()
      val nCand = cand.count()
      // per-cell occupancy of the index side (the density the adaptive k targets)
      val occ = idx.groupBy(col("tbl"), col("bucket")).count()
        .agg(avg("count"), max("count")).head()

      def time(label: String)(body: => Unit): Unit = {
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        println(f"D29DECOMP $tag $label min=${reps.min}%.3f reps=${reps.map(r => f"$r%.3f").mkString(",")}")
      }
      println(s"D29DECOMP $tag n=$n k=$k idx=$nIdx probes=$nProbes " +
        s"pairs=$nPairs cand_distinct=$nCand " +
        f"cell_avg=${occ.getDouble(0)}%.2f cell_max=${occ.getLong(1)}")
      time("codes")(e.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next()))
      time("join_count")(joined.select(col("a_id")).queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) it.next()))
      time("full")(SparkEntry.queries("d29_semdedup_adaptive")(spark, d)
        .queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next()))
    }
    spark.stop()
  }
}
