package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Semantic tests for the training-data curation pack (PipelinePack) on a
  * hand-built corpus where every expected value is derivable by eye. The
  * sf-corpus oracle harness proves engine parity; this spec proves the
  * operators mean what their docs say.
  */
class PipelinePackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-pipeline").toString
    import spark.implicits._
    Seq(
      (0L, "a b c d", "en", "src0", 7L),
      (1L, "a b c x", "en", "src0", 7L),
      (2L, "z z z z z", "en", "src1", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq(
      (0L, "2024-01-01 00:00:00", 1L, "view", 1.0, "{\"k\": 69}"),
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0, "{\"k\": 7}"),
      (2L, "2024-01-01 00:20:00", 1L, "purchase", 1.0, "{\"k\": 12, \"u\": 34}"),
      // user 2: click BEFORE first view, purchase after — must not count
      // past stage 1 (funnel is ordered, not a bag of event types)
      (3L, "2024-01-01 00:05:00", 2L, "click", 1.0, "{\"k\": 1}"),
      (4L, "2024-01-01 00:06:00", 2L, "view", 1.0, "{\"k\": 2}"),
      (5L, "2024-01-01 00:07:00", 2L, "purchase", 1.0, "{\"k\": 3}"),
      (6L, "2024-01-01 00:08:00", 3L, "view", 1.0, "{\"k\": 4}")
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq(
      (0L, Array(0.5f, 1.5f), 0),
      (1L, Array(1.5f, 2.5f), 0),
      (2L, Array(-0.5f, 0.25f), 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) =
    queries.PipelinePack.queries.find(_.name == name).get.run(spark, dir)

  test("p1: numeric runs in props are masked and counted per type") {
    val rows = run("p1_regex_redact").collect()
    val purchase = rows.find(_.getString(0) == "purchase").get
    assert(purchase.getLong(1) == 2L) // two purchase events
    assert(purchase.getLong(2) == 3L) // {"k": 12, "u": 34} has 2 runs + {"k": 3} has 1
    assert(purchase.getString(3) == "{\"k\": <NUM>, \"u\": <NUM>}")
  }

  test("p2: corpus-driven top-5 stopwords are pruned per document") {
    // token freqs: z=5, a=2, b=2, c=2, d=1, x=1 → top5 (n desc, token) = z,a,b,c,d
    val rows = run("p2_stopword_prune").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 0L, 4L), (1L, 1L, 3L), (2L, 0L, 5L)))
  }

  test("p3: novelty = fraction of the doc's shingles seen in no other doc") {
    // doc0 {a b c, b c d}: 'a b c' also in doc1 → 1/2; doc2 {z z z} → 1.0
    val rows = run("p3_shingle_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5), (2L, 1L, 1L, 1.0)))
  }

  test("p4: hash split is a deterministic partition of the corpus") {
    val rows = run("p4_hash_split").collect()
    assert(rows.map(_.getLong(2)).sum == 3L) // every doc lands in exactly one split
    // formula-stable: same assignment on re-run (no rand())
    assert(run("p4_hash_split").collect().toSeq == rows.toSeq)
    val expected = Seq(0L, 1L, 2L).map { id =>
      val b = (id % 1000000007L) * 654435747L % 1000000007L % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val bySplit = expected.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == bySplit)
  }

  test("p5: funnel stages require strictly-ordered view -> click -> purchase") {
    val r = run("p5_event_funnel").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 1L, 1L)))
  }

  test("p6: centroid update is the exact per-label mean") {
    val rows = run("p6_centroid_update").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((0L, 2L, 1.0, 2.0), (1L, 1L, -0.5, 0.25)))
  }

  test("p9: repetition stats expose dominant tokens and type-token ratio") {
    val rows = run("p9_repetition_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    // doc0 "a b c d": 4 tokens all distinct, every bigram unique
    // doc2 "z z z z z": one token repeated 5x, bigram "z z" appears 4x
    assert(rows.toSeq == Seq(
      (0L, 4L, 4L, 1L, 1L, 0.25, false),
      (1L, 4L, 4L, 1L, 1L, 0.25, false),
      (2L, 5L, 1L, 5L, 4L, 1.0, false)))
  }

  test("p10: sequence packing chunks per-source doc runs into token bins") {
    val rows = run("p10_pack_sequences").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // budget 512 >> fixture sizes: one bin per source, token sums 4+4 and 5
    assert(rows.toSeq == Seq(("src0", 0L, 2L, 8L), ("src1", 0L, 1L, 5L)))
  }

  test("d13: decontamination flags train docs sharing a shingle with the eval slice") {
    // eval slice = doc_id % 29 == 0 -> doc0; doc1 shares trigram "a b c";
    // doc2's only shingle "z z z" appears nowhere in the eval set
    val rows = queries.DedupPack.queries.find(_.name == "d13_decontaminate").get
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 1L, 1L)))
  }

  test("p2 plan: the stopword vocabulary probe is a broadcast join") {
    val plan = run("p2_stopword_prune").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast vocabulary join:\n$plan")
  }

  test("p25 signature streams: running per-source checksum equals the batch aggregate") {
    // The signature is a commutative modular sum, so a streaming update-mode
    // aggregation over ANY arrival order must land on the batch value — the
    // property that lets a 100 TB pipeline maintain its reproducibility
    // checksum incrementally instead of rescanning.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.TextOps.{fingerprint, tokens, P}

    val batchRows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val input = MemoryStream[(Long, String, String)]
    val sig = input.toDF().toDF("doc_id", "source", "text")
      .select(col("source"),
        ((fingerprint(tokens(col("text"))) * (col("doc_id") % lit(P) + 1)) % lit(P)).as("term"))
      .groupBy(col("source"))
      .agg((sum(col("term")) % lit(P)).as("signature"))
    val q = sig.writeStream.outputMode("update")
      .format("memory").queryName("sig_stream").start()
    // feed in reversed order across two micro-batches: order must not matter
    val (h, t) = batchRows.reverse.splitAt(2)
    input.addData(h.toIndexedSeq); q.processAllAvailable()
    input.addData(t.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // update mode emits one row per (source, batch) — keep the LAST per source
    val streamed = spark.table("sig_stream").collect()
      .map(r => (r.getString(0), r.getLong(1))).zipWithIndex
      .groupBy(_._1._1).map { case (src, vs) => src -> vs.maxBy(_._2)._1._2 }

    val batch = SparkEntry.queries("p25_corpus_signature")(spark, dir)
      .select(col("source"), col("signature"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }
}
