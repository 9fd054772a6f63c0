package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming LSH dedup flags cross-batch and in-batch collisions, passes novel docs") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val out = StreamingDedup.run(docs)

    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dup_candidates").start()

    // batch 1: two distinct documents — both claim their buckets, no output
    input.addData(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")
    )
    q.processAllAvailable()
    assert(spark.table("dup_candidates").count() == 0)

    // batch 2: doc 3 is an exact copy of doc 1 (cross-batch dup); docs 5/6
    // collide with each other inside the batch; doc 4 is novel
    input.addData(
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "completely novel vocabulary nothing shared"),
      (5L, "same text in one batch here"),
      (6L, "same text in one batch here")
    )
    q.processAllAvailable()
    q.stop()

    val cands = spark.table("dup_candidates")
      .as[graft.streaming.DupCandidate].collect()
    val pairs = cands.map(c => (c.docId, c.dupOf)).distinct.sorted
    assert(pairs.toSeq == Seq((3L, 1L), (6L, 5L)), cands.mkString("\n"))
    // identical docs collide on EVERY band (2 bands with the default seeds)
    assert(cands.count(_.docId == 3L) == 2)
    // novel doc emitted nothing
    assert(!cands.exists(c => c.docId == 4L || c.dupOf == 4L))
  }

  test("band keys match the batch d5 signature scheme") {
    import spark.implicits._
    val df = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val hits = StreamingDedup.bandHits(df).collect()
    // 4 seeds -> 2 bands, each key "band:mh(2b):mh(2b+1)"
    assert(hits.length == 2)
    assert(hits.forall(_.docId == 10L))
    assert(hits.map(_.bandKey.split(":")(0)).sorted.toSeq == Seq("0", "1"))
  }

  test("stream-static incremental dedup flags stream docs against a fixed corpus snapshot") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    // standing corpus at d1's 5-token-prefix grain
    val corpusKeys = Seq(
      "the quick brown fox jumps",
      "lorem ipsum dolor sit amet"
    ).toDF("pkey")

    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.againstCorpus(input.toDS().toDF("doc_id", "text"), corpusKeys)

    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("inc_dedup").start()

    input.addData(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a genuinely new document nobody has seen")
    )
    q.processAllAvailable()
    // batch 2: doc 3 repeats doc 2's text — the static corpus does NOT
    // absorb novel stream keys (cross-snapshot semantics), so it is still
    // novel here; doc 4 hits the corpus
    input.addData(
      (3L, "a genuinely new document nobody has seen"),
      (4L, "lorem ipsum dolor sit amet consectetur")
    )
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("inc_dedup")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(rows == Map(
      1L -> "dup_existing", 2L -> "novel", 3L -> "novel", 4L -> "dup_existing"))
  }
}
