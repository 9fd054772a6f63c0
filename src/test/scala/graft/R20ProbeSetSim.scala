package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r20 probe (VERDICT r19 item 5): candidate-volume accounting for the
  * SetSimJoin prune ladder on d7/d16's corpus at a given SF. Reports, per
  * prune stage, how many rows/pairs survive — the question is whether the
  * prefix+positional candidates are close to the verified-pair volume
  * (prunes already tight ⇒ genuine compute) or far above it (room for a
  * tighter bound).
  *
  *   sbt "Test/runMain graft.R20ProbeSetSim /root/testdata/sf0.1"
  */
object R20ProbeSetSim {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val t = 0.5
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mirror d7's doc prep (trigram shingles over documents)
    val docs = Tables.documents(spark, d)
      .filter(size(graft.functions.TextOps.tokens(col("text"))) >= 3)
      .select(col("doc_id"), col("source"),
        graft.functions.TextExpressions.shingles(col("text"), 3).as("sh"))

    // re-derive the ladder exactly as SetSimJoin.verifiedPairs does
    val base = docs.select(col("doc_id").as("__id"), col("source").as("__blk"),
      col("sh").as("__sh"), size(col("sh")).as("__n")).localCheckpoint()
    val postings = base.select(col("__id"), col("__blk"), col("__n"),
      explode(col("__sh")).as("__t"))
    val dfs = postings.groupBy(col("__blk"), col("__t"))
      .agg(count(lit(1)).as("__df"))
    val pruned = postings.join(dfs.filter(col("__df") >= 2), Seq("__blk", "__t"))
    val w = Window.partitionBy(col("__id"))
    val ranked = pruned
      .withColumn("__rn", row_number().over(w.orderBy(col("__df"), col("__t"))))
      .withColumn("__m", count(lit(1)).over(w))
      .localCheckpoint()
    val prefix = ranked
      .filter(col("__rn") <= col("__m") - ceil(lit(t) * col("__n")).cast("int") + 1)
      .select(col("__blk"), col("__t"), col("__id").as("__pid"),
        col("__rn").as("__pi"), col("__m").as("__pm"), col("__n").as("__pn"))
    val joined = prefix
      .join(ranked.select(col("__blk"), col("__t"), col("__id").as("__fid"),
        col("__rn").as("__fi"), col("__m").as("__fm"), col("__n").as("__fn")),
        Seq("__blk", "__t"))
      .filter(col("__pid") =!= col("__fid"))
    val perPair = joined
      .select(
        least(col("__pid"), col("__fid")).as("a_id"),
        greatest(col("__pid"), col("__fid")).as("b_id"),
        (least(col("__pi"), col("__fi")) +
          least(col("__pm") - col("__pi"), col("__fm") - col("__fi"))).as("__ub"),
        least(col("__pn"), col("__fn")).as("__minn"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(col("__ub")).as("__ub"), first(col("__minn")).as("__minn"))
      .localCheckpoint()
    val posKept = perPair
      .filter(col("__ub") >= ceil(lit(t) * col("__minn")).cast("long"))

    val nDocs = base.count()
    val nPostings = postings.count()
    val nPruned = pruned.count()
    val nPrefix = prefix.count()
    val nPrefixMatches = joined.count()
    val nDistinctPairs = perPair.count()
    val nPosKept = posKept.count()
    val verified = graft.ops.SetSimJoin.verifiedPairs(docs, t)
    val nVerified = verified.count()
    val nJaccardT = verified
      .filter(col("inter").cast("double") /
        (col("a_n") + col("b_n") - col("inter")) >= t).count()
    val nEitherContain = verified
      .filter(col("inter") >= ceil(lit(t) * least(col("a_n"), col("b_n")))).count()

    println(f"[probe] sf=$d t=$t")
    println(f"[probe] docs=$nDocs postings=$nPostings dfPruned=$nPruned (${100.0*nPruned/nPostings}%.1f%%)")
    println(f"[probe] prefixPostings=$nPrefix prefixMatches=$nPrefixMatches")
    println(f"[probe] distinctCandPairs=$nDistinctPairs posFilterKept=$nPosKept (${100.0*nPosKept/math.max(1,nDistinctPairs)}%.1f%%)")
    println(f"[probe] verifiedRows=$nVerified jaccard>=t=$nJaccardT eitherContain>=t=$nEitherContain")
    println(f"[probe] candidate:qualifying ratio=${nPosKept.toDouble/math.max(1,nEitherContain)}%.2f")
    spark.stop()
  }
}
