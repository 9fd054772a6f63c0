package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

/** Batch-vs-streaming DIFFERENTIAL gate: replays the real sf0.01 corpus
  * through each stateful streaming twin and asserts the collected output
  * equals the oracled batch formulation on identical input — upgrading the
  * twins from scenario-tested to corpus-differential-tested (the streaming
  * analog of the DuckDB oracle gate, which can't run a stream).
  *
  * Replay convention: input is split into multiple micro-batches in the
  * stream's natural order (doc_id / event time), matching how an ingest
  * pipeline would tail the corpus. Each test states the exact batch↔stream
  * semantic correspondence it asserts.
  */
class StreamingDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("StreamingDedup.run == batch LSH banding (min-owner) on the sf0.01 corpus") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.run(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sd_diff").start()
    // 4 micro-batches in ascending doc_id order (ingest-tail replay)
    docs.grouped((docs.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sd_diff").as[DupCandidate]
      .collect().map(c => (c.docId, c.dupOf, c.bandKey)).toSet

    // batch twin: with doc_id-ordered arrival the bucket owner is the
    // global min doc_id per band key; every other hit emits exactly once
    val hits = StreamingDedup.bandHits(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val owners = hits.groupBy(col("bandKey")).agg(min(col("docId")).as("owner"))
    val expected = hits.join(owners, Seq("bandKey"))
      .filter(col("docId") =!= col("owner"))
      .select(col("docId"), col("owner"), col("bandKey"))
      .as[(Long, Long, String)].collect().toSet

    assert(streamed.nonEmpty, "corpus produced no LSH collisions — differential is vacuous")
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(5)} batch-only=${(expected -- streamed).take(5)}")
  }

  test("StreamingImageDedup.run == batch aHash min-owner over MIXED encodings on sf0.01") {
    // the m15 dedup semantics with m18's cross-codec property: each doc's
    // plane is stored as PNG (even doc_id) or lossy JPEG q0.95 (odd), the
    // hash is imageAHash over each doc's OWN container, and streaming
    // first-claim state must equal the batch min-owner grouping on the
    // identical per-doc hashes — the one dedup index spanning encodings.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.functions.MediaExpressions.{imageAHash, jpegEncodeGray, pngEncodeGray}

    val payload = encode(col("text"), "UTF-8")
    // the sf0.01 planes are all distinct, so REPLAY 100 docs as late
    // re-uploads under new ids with FLIPPED parity — the duplicate arrives
    // under the OTHER codec, which is exactly the cross-codec dedup case
    // the index exists for (collides iff the lossy round trip left the
    // aHash bit-identical — most planes; near-miss pairs are m18's
    // tolerance band, not dedup hits)
    val base = Tables.documents(spark, sf).select(col("doc_id").cast("long"), col("text"))
    val docsAug = base.unionAll(
      base.filter(col("doc_id") < 100).select(col("doc_id") + 100001L, col("text")))
    val encoded = docsAug
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, pngEncodeGray(payload, 16))
          .otherwise(jpegEncodeGray(payload, 16, 0.95f)).as("img"))
    val rows = encoded.as[(Long, Array[Byte])].collect().sortBy(_._1)

    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingImageDedup.run(input.toDS().toDF("doc_id", "img"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sid_diff").start()
    rows.grouped((rows.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sid_diff").as[ImageDup]
      .collect().map(c => (c.docId, c.dupOf, c.hash)).toSet

    val hashes = encoded.select(imageAHash(col("img")).as("hash"),
      col("doc_id").as("docId")).filter(col("hash").isNotNull)
    val owners = hashes.groupBy(col("hash")).agg(min(col("docId")).as("owner"))
    val expected = hashes.join(owners, Seq("hash"))
      .filter(col("docId") =!= col("owner"))
      .select(col("docId"), col("owner"), col("hash"))
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed.nonEmpty, "corpus produced no aHash collisions — differential is vacuous")
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(5)} batch-only=${(expected -- streamed).take(5)}")
    val crossCodec = streamed.count { case (a, b, _) => (a + b) % 2 == 1 }
    info(s"${streamed.size} dup verdicts, $crossCodec cross-codec (PNG vs JPEG) pairs")
  }

  test("StatefulSessionizer == e3_sessionize batch sessions (minus still-open) on sf0.01 events") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val events = Tables.events(spark, sf)
      .select(col("user_id").cast("long"), col("ts").cast("long") * 1000L) // epoch millis
      .as[(Long, Long)].collect().sortBy(e => (e._2, e._1))

    val input = MemoryStream[SessionEvent]
    val q = StatefulSessionizer.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_diff").start()
    // 5 micro-batches in global time order: per-user order is preserved,
    // which is the in-order-arrival contract the stateful twin documents
    events.grouped((events.length + 4) / 5).foreach { chunk =>
      input.addData(chunk.map { case (u, ms) => SessionEvent(u, ms) }.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sess_diff").as[SessionOut]
      .collect().map(s => (s.userId, s.startMillis, s.n, s.durationSec)).toSet

    // batch twin = the ORACLED e3_sessionize query, re-keyed to millis;
    // streaming append mode never emits a user's last (still-open) session,
    // so drop each user's max-start session from the batch side
    val batch = SparkEntry.queries("e3_sessionize")(spark, sf)
      .withColumn("start_ms",
        unix_timestamp(col("session_start"), "yyyy-MM-dd HH:mm:ss") * 1000L)
      .select(col("user_id"), col("start_ms"), col("n_events"), col("duration_sec"))
      .as[(Long, Long, Long, Long)].collect()
    val lastStart = batch.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
    val expected = batch.filterNot { case (u, st, _, _) => lastStart(u) == st }.toSet

    assert(streamed.nonEmpty && expected.nonEmpty)
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(5)} batch-only=${(expected -- streamed).take(5)}")
  }

  test("StreamingHeavyHitters candidates + exact recount == x22_heavy_hitters on sf0.01") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val cap = 512
    val input = MemoryStream[(Long, String)]
    val q = StreamingHeavyHitters.run(
      input.toDS().toDF("doc_id", "text")
        .withColumn("g", lit("all")), "g", "text", k = cap, cap = cap)
      .writeStream.outputMode("update")
      .format("memory").queryName("hh_diff").start()
    docs.grouped((docs.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    // last update carries the stream-lifetime Misra-Gries state
    val fin = spark.table("hh_diff").as[HeavyHitterUpdate]
      .collect().maxBy(_.total)
    val candidates = fin.top.map(_.term)

    // MG guarantee side: lifetime total is exact
    val exactTotal = Tables.documents(spark, sf)
      .select(size(graft.functions.TextOps.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(fin.total == exactTotal)

    // lambda-architecture upgrade: exact recount of ONLY the streaming
    // candidates, filtered at x22's D=256 share bound, must equal the
    // ORACLED batch heavy-hitter set exactly (cap=512 ≥ D=256 ⇒ the
    // candidate set provably contains every true heavy hitter)
    val recount = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("term"))
      .filter(col("term").isInCollection(candidates))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 256L > exactTotal)
      .select(col("term"), col("cnt"))
      .as[(String, Long)].collect().toSet
    val batch = SparkEntry.queries("x22_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toSet
    assert(batch.nonEmpty, "x22 found no heavy hitters — differential is vacuous")
    assert(recount == batch,
      s"stream-only=${(recount -- batch).take(5)} batch-only=${(batch -- recount).take(5)}")
  }

  test("StreamingLmGate foreachBatch scoring == batch scoring == t25 tertiles on sf0.01") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val corpus = Tables.documents(spark, sf)
    val lm = StreamingLmGate.fit(corpus)

    // precondition for exact rank↔threshold agreement: tertile boundaries
    // are strict (no two docs share a boundary score across buckets)
    val batchScored = StreamingLmGate.scoreBatch(corpus, lm)
    val boundaryTies = batchScored
      .groupBy(col("score")).agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") > 1).count()
    assert(boundaryTies === 0, "corpus has cross-bucket score ties; tighten fixture")

    // stream the same docs in 3 micro-batches through foreachBatch scoring
    val docs = corpus.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = StreamingLmGate.scoreBatch(batch, lm)
          .as[(Long, Long, Long, String)].collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    docs.grouped((docs.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // (a) stream == batch per doc (scoring is independent of micro-batch cut)
    val gotSet = got.toSet
    val batchSet = batchScored.as[(Long, Long, Long, String)].collect().toSet
    assert(gotSet == batchSet,
      s"stream-only=${(gotSet -- batchSet).take(3)} batch-only=${(batchSet -- gotSet).take(3)}")

    // (b) frozen thresholds reproduce t25's rank tertiles exactly
    val gateCounts = got.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val t25 = SparkEntry.queries("t25_perplexity_buckets")(spark, sf)
      .select(col("bucket"), col("n_docs")).as[(String, Long)].collect().toMap
    assert(gateCounts == t25, s"gate=$gateCounts t25=$t25")
  }

  test("StreamingDedup.againstCorpus + in-batch rank == d23_incremental_dedup on sf0.01") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    def pkeyOf(df: DataFrame) = df.select(
      col("doc_id"), col("source"),
      array_join(slice(graft.functions.TextOps.tokens(col("text")), 1, 5), " ").as("pkey"))

    val base = pkeyOf(Tables.documents(spark, sf))
    val corpusKeys = base.filter(col("doc_id") % 5 =!= 4).select(col("pkey")).distinct()
    val batchDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.againstCorpus(input.toDS().toDF("doc_id", "text"), corpusKeys)
      .writeStream.outputMode("append")
      .format("memory").queryName("inc_diff").start()
    batchDocs.grouped((batchDocs.length + 1) / 2).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // the streaming twin supplies the per-doc dup_existing bit; layering
    // d23's within-batch keep-first rank on top and aggregating by source
    // must reproduce the ORACLED d23 output exactly
    import org.apache.spark.sql.expressions.Window
    val ranked = spark.table("inc_diff")
      .join(base.filter(col("doc_id") % 5 === 4).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("pkey")).orderBy(col("doc_id"))))
      .select(col("source"),
        when(col("verdict") === "dup_existing", "dup_existing")
          .when(col("rn") > 1, "batch_dup")
          .otherwise("novel").as("verdict"))
      .groupBy(col("source"), col("verdict")).agg(count(lit(1)).as("n_docs"))
      .as[(String, String, Long)].collect().toSet
    val expected = SparkEntry.queries("d23_incremental_dedup")(spark, sf)
      .as[(String, String, Long)].collect().toSet

    assert(ranked.nonEmpty)
    assert(ranked == expected,
      s"stream-only=${(ranked -- expected).take(5)} batch-only=${(expected -- ranked).take(5)}")
  }

  test("StreamingSemDedup == owner-restricted d29 semantics on sf0.01 embeddings; dup set ⊆ d29's") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.functions.VectorOps.{dot, norm}

    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("embedding"))
    // the fit-time frozen width equals what batch d29 derives IN-PLAN over
    // the same standing corpus — same integer-exact formula, same count
    val k = StreamingSemDedup.fitK(embs)
    val d29 = SparkEntry.queries("d29_semdedup_adaptive")(spark, sf)
      .select(col("vec_id"), col("k_planes"), col("best_prior_sim"),
        col("is_sem_dup")).collect()
    assert(d29.map(_.getLong(1)).distinct.toSeq === Seq(k.toLong))

    val vecs = embs.as[(Long, Array[Float])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemDedup.run(input.toDS().toDF("vec_id", "embedding"), k)
      .writeStream.outputMode("append")
      .format("memory").queryName("semdd_diff").start()
    // 4 micro-batches in ascending vec_id order (ingest-tail replay)
    vecs.grouped((vecs.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("semdd_diff").as[SemDupCandidate].collect()
    val streamedSet = streamed.map(c => (c.vecId, c.ownerId, c.cellKey, c.cosSim)).toSet

    // batch twin: with id-ordered arrival the cell owner is the global min
    // vec_id per cell; every later cell-sharer emits one exact-cosine
    // candidate against the owner (zero-norm cosines dropped like batch)
    val hits = StreamingSemDedup.cellHits(embs, k)
    val owners = hits.groupBy(col("cellKey")).agg(min(col("vecId")).as("ownerId"))
    val ownerEmb = hits.select(col("vecId").as("ownerId"), col("emb").as("o_emb"))
      .join(owners.select(col("ownerId")).distinct(), Seq("ownerId"))
      .dropDuplicates("ownerId")
    val expected = hits.join(owners, Seq("cellKey"))
      .filter(col("vecId") =!= col("ownerId"))
      .join(ownerEmb, Seq("ownerId"))
      .select(col("vecId"), col("ownerId"), col("cellKey"),
        queries.quant(dot(col("emb"), col("o_emb")) /
          when(norm(col("emb")) * norm(col("o_emb")) > 0.0,
            norm(col("emb")) * norm(col("o_emb"))), 1e6).as("cos"))
      .filter(col("cos").isNotNull)
      .as[(Long, Long, String, Double)].collect().toSet

    assert(streamedSet.nonEmpty, "corpus produced no cell collisions — differential is vacuous")
    assert(streamedSet == expected,
      s"stream-only=${(streamedSet -- expected).take(5)} batch-only=${(expected -- streamedSet).take(5)}")

    // conservative-direction guarantee vs the ORACLED full-prior d29: the
    // per-vector owner max is a lower bound on best_prior_sim, so the
    // streaming dup set at the 0.85 threshold is a subset of d29's
    val streamMax = streamed.groupBy(_.vecId).view.mapValues(_.map(_.cosSim).max).toMap
    val d29Best = d29.map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    streamMax.foreach { case (v, m) =>
      val best = d29Best(v).getOrElse(fail(s"vec $v: stream found a candidate, d29 none"))
      assert(m <= best, s"vec $v: owner max $m beats d29 best $best")
    }
    val streamDups = streamMax.filter(_._2 >= 0.85).keySet
    val d29Dups = d29.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(streamDups.subsetOf(d29Dups))
  }

  test("StreamingSemDedup out-of-order replay: every emitted pair is still a d29 candidate pair") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.functions.VectorOps.{dot, norm}

    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("embedding"))
    val k = StreamingSemDedup.fitK(embs)

    // DESCENDING-id replay: cells get claimed by HIGH-id owners first, so a
    // later lower-id collision must be SUPPRESSED (emitting it would invert
    // the owner-precedes-vector direction and produce a pair batch d29
    // never scores)
    val vecs = embs.as[(Long, Array[Float])].collect().sortBy(-_._1)
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemDedup.run(input.toDS().toDF("vec_id", "embedding"), k)
      .writeStream.outputMode("append")
      .format("memory").queryName("semdd_ooo").start()
    vecs.grouped((vecs.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("semdd_ooo").as[SemDupCandidate].collect()

    // direction invariant holds in ANY arrival order
    streamed.foreach(c => assert(c.vecId > c.ownerId,
      s"inverted pair emitted: vec ${c.vecId} vs owner ${c.ownerId}"))

    // every emitted pair is one of d29's candidate pairs: same cell, owner
    // strictly prior, identical quantized cosine
    val hits = StreamingSemDedup.cellHits(embs, k)
    val allPrior = hits.join(
        hits.select(col("cellKey"), col("vecId").as("ownerId"), col("emb").as("o_emb")),
        Seq("cellKey"))
      .filter(col("ownerId") < col("vecId"))
      .select(col("vecId"), col("ownerId"), col("cellKey"),
        queries.quant(dot(col("emb"), col("o_emb")) /
          when(norm(col("emb")) * norm(col("o_emb")) > 0.0,
            norm(col("emb")) * norm(col("o_emb"))), 1e6).as("cos"))
      .filter(col("cos").isNotNull)
      .as[(Long, Long, String, Double)].collect().toSet
    val streamedSet = streamed.map(c => (c.vecId, c.ownerId, c.cellKey, c.cosSim)).toSet
    assert(streamedSet.nonEmpty, "descending replay emitted nothing — in-batch ties should emit")
    assert(streamedSet.subsetOf(allPrior),
      s"non-d29 pairs emitted: ${(streamedSet -- allPrior).take(5)}")

    // and the dup set at the gate threshold is still a subset of d29's
    val d29Dups = SparkEntry.queries("d29_semdedup_adaptive")(spark, sf)
      .filter(col("is_sem_dup")).select(col("vec_id")).as[Long].collect().toSet
    val streamDups = streamed.groupBy(_.vecId).view.mapValues(_.map(_.cosSim).max)
      .filter(_._2 >= 0.85).keySet
    assert(streamDups.subsetOf(d29Dups))
  }

  test("StreamingAnnServe over any batching == oracled s22_adaptive_ann row-for-row") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("embedding"))
    val ix = StreamingAnnServe.fit(embs.filter(col("vec_id") % 50 =!= 0))
    // the fit-time width equals what s22 derives in-plan from the same
    // index side
    val s22 = SparkEntry.queries("s22_adaptive_ann")(spark, sf).collect()
    assert(s22.map(_.getLong(5)).distinct.toSeq === Seq(ix.k.toLong))

    val queries = embs.filter(col("vec_id") % 50 === 0)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Float])]
    val served = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Long, Long)]
    val q = input.toDS().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        served.synchronized {
          served ++= StreamingAnnServe.serveBatch(df, ix)
            .as[(Long, Long, Long, Double, Long, Long)].collect()
        }
        ()
      }
      .start()
    // 3 micro-batches — per-query results must not depend on the batching
    queries.grouped((queries.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    val expected = s22.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toSet
    assert(served.nonEmpty)
    assert(served.toSet == expected,
      s"stream-only=${(served.toSet -- expected).take(3)} batch-only=${(expected -- served.toSet).take(3)}")
  }

  test("StreamingHdrQuantiles snapshot quantiles == batch HDR sketch on every prefix, and == x32 at the end") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.HdrSketch

    // the exact input frame x32 sketches: (returnflag group, price cents)
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .as[(String, Long)].collect().sortBy(r => (r._1, r._2))

    def quantRows(df: DataFrame): Set[(String, String, Long, Long, Long)] =
      df.select(col("group"), col("q_label"), col("est_lo"), col("est_hi"), col("n_group"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

    val input = MemoryStream[(String, Long)]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, String, Long, Long, Long)])]
    val q = StreamingHdrQuantiles.sketchCounts(input.toDS().toDF("group", "v"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, id: Long) =>
        perBatch.synchronized {
          perBatch += ((id, quantRows(StreamingHdrQuantiles.quantilesOf(df))))
        }
        ()
      }
      .start()
    // 4 micro-batches; counts commute, so the batching must not matter —
    // EVERY prefix snapshot must equal the batch sketch over that prefix
    val chunks = rows.grouped((rows.length + 3) / 4).toIndexedSeq
    chunks.foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size == chunks.size)

    var prefix = Array.empty[(String, Long)]
    perBatch.toSeq.sortBy(_._1).zip(chunks).foreach { case ((_, streamed), chunk) =>
      prefix = prefix ++ chunk
      val expected = quantRows(HdrSketch.estimates(
        HdrSketch.counts(
          HdrSketch.bucketize(prefix.toSeq.toDF("group", "v"), col("v"), col("group")),
          col("group")),
        col("group")))
      assert(streamed == expected,
        s"prefix ${prefix.length}: stream-only=${(streamed -- expected).take(3)} " +
          s"batch-only=${(expected -- streamed).take(3)}")
    }

    // and the full-corpus snapshot ties back to the ORACLED x32 plan
    val x32 = SparkEntry.queries("x32_hdr_quantiles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(perBatch.maxBy(_._1)._2 == x32)
  }

  test("StreamingPrioritySample snapshot == p22's rank-window sample on every prefix and the oracled p22 aggregate at the end") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.expressions.Window

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("source").cast("string"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)

    val input = MemoryStream[(Long, String, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, Long, Long, Long)])]
    val q = StreamingPrioritySample.run(input.toDS().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val rows = df.select(col("source"), explode(col("sample")).as("s"))
          .select(col("source"), col("s.priority"), col("s.docId"), col("s.w"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        perBatch.synchronized { perBatch += ((id, rows)) }
        ()
      }
      .start()
    val chunks = docs.grouped((docs.length + 3) / 4).toIndexedSeq
    chunks.foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size == chunks.size)

    // every prefix snapshot equals p22's rank-window formulation on it —
    // the k smallest under a total order are SET-determined, so batching
    // and arrival order cannot matter
    var prefix = Array.empty[(Long, String, String)]
    perBatch.toSeq.sortBy(_._1).zip(chunks).foreach { case ((_, streamed), chunk) =>
      prefix = prefix ++ chunk
      val expected = StreamingPrioritySample
        .priorityRows(prefix.toSeq.toDF("doc_id", "source", "text"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("priority"), col("doc_id"))))
        .filter(col("rk") <= StreamingPrioritySample.DefaultK)
        .select(col("source"), col("priority"), col("doc_id"), col("w"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == expected,
        s"prefix ${prefix.length}: stream-only=${(streamed -- expected).take(3)} " +
          s"batch-only=${(expected -- streamed).take(3)}")
    }

    // the full-replay sample reproduces the ORACLED p22 aggregate exactly
    val finalSample = perBatch.maxBy(_._1)._2
    val fromStream = finalSample.groupBy(_._1).map { case (src, rows) =>
      // toSeq before summing: mapping a Set would deduplicate equal weights
      (src, rows.size.toLong, rows.toSeq.map(_._4).sum, rows.toSeq.map(_._2).max)
    }.toSet
    val p22 = SparkEntry.queries("p22_priority_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fromStream == p22,
      s"stream-only=${(fromStream -- p22).take(3)} batch-only=${(p22 -- fromStream).take(3)}")
  }

  test("windowed HDR sketch (watermark append) == oracled e21 on finalized windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.HdrSketch

    // the exact input frame e21 sketches: (ts, event_type, value cents),
    // replayed in event-time order (monotone watermark)
    val events = Tables.events(spark, sf)
      .select(col("ts"),
        col("event_type").cast("string"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .as[(java.sql.Timestamp, String, Long)].collect().sortBy(_._1.getTime)

    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = StreamingHdrQuantiles
      .windowedSketchCounts(input.toDS().toDF("ts", "group", "v"), "1 day", "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("whdr_diff").start()
    events.grouped((events.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    // one empty trigger so the last data batch's watermark update finalizes
    // every window it can
    input.addData(IndexedSeq.empty)
    q.processAllAvailable()
    q.stop()

    // finalized (window, type, bucket) rows, emitted exactly once each —
    // aggregate them with the BATCH estimates plan
    val fin = spark.table("whdr_diff")
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("group"), col("bucket"), col("lo"), col("hi"), col("cnt"))
    assert(fin.count() > 0, "no windows finalized — differential is vacuous")
    val streamed = HdrSketch.estimates(fin, col("ws"), col("group"))
      .select(col("ws"), col("group"), col("q_label"),
        col("est_lo"), col("est_hi"), col("n_group"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet

    // expected: the ORACLED e21 rows for every window the watermark closed
    // (all but those still in flight at stream end — with delay 0 and
    // event-time replay, exactly the windows whose end <= max event time)
    val maxTs = events.last._1.getTime
    val e21 = SparkEntry.queries("e21_windowed_quantiles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val dayMs = 24L * 3600 * 1000
    val expected = e21.filter { case (ws, _, _, _, _, _) =>
      fmt.parse(ws).getTime + dayMs <= maxTs
    }
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    // sanity: something was actually excluded as in-flight (the last day)
    assert(expected.size < e21.size)
  }

  test("windowed HDR under OUT-OF-ORDER replay (2h jitter, 2h watermark) == oracled e21 on finalized windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.HdrSketch
    val lateMs = 2L * 3600 * 1000

    val events = Tables.events(spark, sf)
      .select(col("ts"),
        col("event_type").cast("string"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"),
        col("event_id"))
      .as[(java.sql.Timestamp, String, Long, Long)].collect()
      .sortBy { case (ts, _, _, id) => ts.getTime + (id * 2654435761L % lateMs) }
      .map { case (ts, g, v, _) => (ts, g, v) }

    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = StreamingHdrQuantiles
      .windowedSketchCounts(input.toDS().toDF("ts", "group", "v"), "1 day", "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("whdr_ooo").start()
    events.grouped((events.length + 7) / 8).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    input.addData(IndexedSeq.empty)
    q.processAllAvailable()
    q.stop()

    val fin = spark.table("whdr_ooo")
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("group"), col("bucket"), col("lo"), col("hi"), col("cnt"))
    assert(fin.count() > 0, "no windows finalized — differential is vacuous")
    val streamed = HdrSketch.estimates(fin, col("ws"), col("group"))
      .select(col("ws"), col("group"), col("q_label"),
        col("est_lo"), col("est_hi"), col("n_group"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet

    val maxTs = events.map(_._1.getTime).max
    val e21 = SparkEntry.queries("e21_windowed_quantiles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val dayMs = 24L * 3600 * 1000
    val expected = e21.filter { case (ws, _, _, _, _, _) =>
      fmt.parse(ws).getTime + dayMs <= maxTs - lateMs
    }
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    assert(expected.nonEmpty && expected.size < e21.size)
  }

  test("StreamingDistinctKmv snapshot == batch KMV sketch on every prefix and x3's oracled columns at the end") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.Encoders

    // the exact hashed frame x3's KMV half aggregates
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").cast("string"),
        ((lit(2654435761L) * col("l_partkey") + lit(12345L)) % StreamingDistinctKmv.P).as("h"))
      .as[(String, Long)].collect()

    val input = MemoryStream[(String, Long)]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, Seq[Long]])]
    val q = StreamingDistinctKmv.run(input.toDS().toDF("group", "h"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val m = df.select(col("group"), col("ret")).collect()
          .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
        perBatch.synchronized { perBatch += ((id, m)) }
        ()
      }
      .start()
    val chunks = rows.grouped((rows.length + 3) / 4).toIndexedSeq
    chunks.foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size == chunks.size)

    // every prefix snapshot: the k smallest DISTINCT hashes are
    // set-determined, so the streamed sketch must equal the batch UDAF on
    // that prefix — the SKETCH itself, not just the estimate
    val kmv = udaf(new graft.functions.Aggregates.KmvSketch(
      StreamingDistinctKmv.DefaultK), Encoders.scalaLong)
    var prefix = Array.empty[(String, Long)]
    perBatch.toSeq.sortBy(_._1).zip(chunks).foreach { case ((_, streamed), chunk) =>
      prefix = prefix ++ chunk
      val expected = prefix.toSeq.toDF("group", "h")
        .groupBy(col("group")).agg(kmv(col("h")).as("ret"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(streamed == expected, s"prefix ${prefix.length} sketch mismatch")
    }

    // full replay ties back to the ORACLED x3 columns (kth + estimate)
    val finalSketch = perBatch.maxBy(_._1)._2
    val fromStream = finalSketch.map { case (g, ret) =>
      val kth = ret.last
      val est =
        if (ret.size < StreamingDistinctKmv.DefaultK) ret.size.toLong
        else (StreamingDistinctKmv.DefaultK - 1).toLong * StreamingDistinctKmv.P / kth
      (g, kth, est)
    }.toSet
    val x3 = SparkEntry.queries("x3_approx_sketches")(spark, sf)
      .select(col("l_returnflag"), col("kmv_kth"), col("kmv_est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromStream == x3,
      s"stream-only=${(fromStream -- x3).take(3)} batch-only=${(x3 -- fromStream).take(3)}")
  }

  test("StreamingCmsFrequency snapshot == batch CMS sketch on every prefix and t26's oracled estimates at the end") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.CmsSketch
    import graft.functions.TextOps._

    // the exact hashed frame t26's sketch aggregates, in doc order
    val rows = Tables.documents(spark, sf)
      .orderBy(col("doc_id"))
      .select(explode(tokens(col("text"))).as("token"))
      .select(tokenHash(col("token")).as("h"))
      .as[Long].collect()

    val input = MemoryStream[Long]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(Int, Long), Long])]
    val q = StreamingCmsFrequency.sketchCells(input.toDS().toDF("h"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val m = df.collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        perBatch.synchronized { perBatch += ((id, m)) }
        ()
      }
      .start()
    val chunks = rows.grouped((rows.length + 3) / 4).toIndexedSeq
    chunks.foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size == chunks.size)

    // cell counts are additive, so every prefix snapshot must equal the
    // batch sketch over that prefix CELL-FOR-CELL under any batching
    var prefix = Array.empty[Long]
    perBatch.toSeq.sortBy(_._1).zip(chunks).foreach { case ((_, streamed), chunk) =>
      prefix = prefix ++ chunk
      val expected = CmsSketch.counts(
        CmsSketch.bucketize(prefix.toSeq.toDF("h"), col("h")))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == expected, s"prefix ${prefix.length} sketch mismatch")
    }

    // full replay: probing the final snapshot answers t26's oracled rows
    val finalCells = perBatch.maxBy(_._1)._2.toSeq
      .map { case ((i, b), c) => (i, b, c) }.toDF("row_i", "bucket", "cnt")
    val probe = Tables.documents(spark, sf).filter(col("doc_id") < 10)
      .select(explode(tokens(col("text"))).as("token")).distinct()
    val fromStream = StreamingCmsFrequency
      .probeOf(finalCells, probe, tokenHash(col("token")), col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val t26 = SparkEntry.queries("t26_cms_token_freq")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fromStream == t26,
      s"stream-only=${(fromStream -- t26).take(3)} batch-only=${(t26 -- fromStream).take(3)}")
  }

  test("windowed CMS (watermark append) == oracled e22 on finalized windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val P = graft.ops.CmsSketch.P

    // the exact hashed frame e22's sketch aggregates, in event-time order
    val events = Tables.events(spark, sf)
      .select(col("ts"),
        ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"))
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingCmsFrequency
      .windowedSketchCells(input.toDS().toDF("ts", "h"), "1 day", "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("wcms_diff").start()
    events.grouped((events.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    input.addData(IndexedSeq.empty)
    q.processAllAvailable()
    q.stop()

    // finalized (window, row_i, bucket, cnt) cells probe exactly like a
    // batch sketch: estimate every watched user per finalized window
    val fin = spark.table("wcms_diff")
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("row_i"), col("bucket"), col("cnt"))
    assert(fin.count() > 0, "no windows finalized — differential is vacuous")
    val watch = Tables.events(spark, sf).filter(col("user_id") < 10)
      .select(col("user_id")).distinct()
    val probe = fin.select(col("ws")).distinct()
      .crossJoin(watch)
      .select(col("ws"), col("user_id"),
        ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"))
    val streamed = graft.ops.CmsSketch
      .bucketize(probe, col("h"), col("ws"), col("user_id"))
      .join(fin, Seq("ws", "row_i", "bucket"), "left_outer")
      .groupBy(col("ws"), col("user_id"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // expected: the ORACLED e22 rows for every window the watermark closed
    val maxTs = events.last._1.getTime
    val e22 = SparkEntry.queries("e22_windowed_user_freq")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val dayMs = 24L * 3600 * 1000
    val expected = e22.filter { case (ws, _, _) =>
      fmt.parse(ws).getTime + dayMs <= maxTs
    }
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    assert(expected.size < e22.size)
  }

  test("windowed CMS under OUT-OF-ORDER replay (2h jitter, 2h watermark) == oracled e22 on finalized windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val P = graft.ops.CmsSketch.P
    val lateMs = 2L * 3600 * 1000

    // deterministically jitter the REPLAY ORDER (not the data): each event
    // is delivered up to 2h "late" relative to event-time order, the
    // bounded-disorder shape a real ingest queue produces
    val events = Tables.events(spark, sf)
      .select(col("ts"),
        ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"),
        col("event_id"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .sortBy { case (ts, _, id) => ts.getTime + (id * 2654435761L % lateMs) }
      .map { case (ts, h, _) => (ts, h) }

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingCmsFrequency
      .windowedSketchCells(input.toDS().toDF("ts", "h"), "1 day", "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("wcms_ooo").start()
    events.grouped((events.length + 7) / 8).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    input.addData(IndexedSeq.empty)
    q.processAllAvailable()
    q.stop()

    // the 2h watermark delay covers the 2h disorder bound, so every
    // finalized window saw ALL its events: finalized cells must equal the
    // batch sketch exactly, and estimates the oracled e22 rows for every
    // window whose end precedes (max event time - delay)
    val fin = spark.table("wcms_ooo")
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("row_i"), col("bucket"), col("cnt"))
    assert(fin.count() > 0, "no windows finalized — differential is vacuous")
    val watch = Tables.events(spark, sf).filter(col("user_id") < 10)
      .select(col("user_id")).distinct()
    val probe = fin.select(col("ws")).distinct()
      .crossJoin(watch)
      .select(col("ws"), col("user_id"),
        ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"))
    val streamed = graft.ops.CmsSketch
      .bucketize(probe, col("h"), col("ws"), col("user_id"))
      .join(fin, Seq("ws", "row_i", "bucket"), "left_outer")
      .groupBy(col("ws"), col("user_id"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val maxTs = events.map(_._1.getTime).max
    val e22 = SparkEntry.queries("e22_windowed_user_freq")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val dayMs = 24L * 3600 * 1000
    val expected = e22.filter { case (ws, _, _) =>
      fmt.parse(ws).getTime + dayMs <= maxTs - lateMs
    }
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    assert(expected.nonEmpty && expected.size < e22.size)
  }

  test("StreamingAmsF2 snapshot == batch AMS sketch on every prefix and x38's oracled estimates at the end") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.AmsSketch

    // the exact hashed frame x38's sketch aggregates, in key order
    val rows = Tables.lineitem(spark, sf)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(((lit(2654435761L) * col("l_orderkey") + lit(12345L)) % AmsSketch.P).as("h"))
      .as[Long].collect()

    val input = MemoryStream[Long]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Int, Long])]
    val q = StreamingAmsF2.sketchSums(input.toDS().toDF("h"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val m = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        perBatch.synchronized { perBatch += ((id, m)) }
        ()
      }
      .start()
    val chunks = rows.grouped((rows.length + 3) / 4).toIndexedSeq
    chunks.foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size == chunks.size)

    // sign sums are additive, so every prefix snapshot must equal the
    // batch sketch over that prefix Z-for-Z under any batching
    var prefix = Array.empty[Long]
    perBatch.toSeq.sortBy(_._1).zip(chunks).foreach { case ((_, streamed), chunk) =>
      prefix = prefix ++ chunk
      val expected = AmsSketch.sums(AmsSketch.bucketize(prefix.toSeq.toDF("h"), col("h")))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(streamed == expected, s"prefix ${prefix.length} sketch mismatch")
    }

    // full replay: the snapshot estimate equals the oracled x38 estimates
    val finalSums = perBatch.maxBy(_._1)._2.toSeq.toDF("row_i", "z")
    val fromStream = StreamingAmsF2.estimateOf(finalSums).collect().head
    val x38 = SparkEntry.queries("x38_ams_f2")(spark, sf).collect().head
    assert(fromStream.getAs[Double]("est_mean") == x38.getAs[Double]("est_mean"))
    assert(fromStream.getAs[Double]("est_mom") == x38.getAs[Double]("est_mom"))
  }

  /** Events as (ts, h) with the e23/e24 user-id hash, event-time order. */
  private def userHashedEvents(): Array[(java.sql.Timestamp, Long)] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("ts"),
        ((lit(2654435761L) * col("user_id") + lit(12345L)) % 1000000007L).as("h"))
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)
  }

  /** Same events, replay order jittered ≤2h (the bounded-disorder shape). */
  private def userHashedEventsJittered(lateMs: Long): Array[(java.sql.Timestamp, Long)] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("ts"),
        ((lit(2654435761L) * col("user_id") + lit(12345L)) % 1000000007L).as("h"),
        col("event_id"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .sortBy { case (ts, _, id) => ts.getTime + (id * 2654435761L % lateMs) }
      .map { case (ts, h, _) => (ts, h) }
  }

  /** Closed-window filter against the oracled batch rows: window start +
    * 1 day ≤ watermark frontier.
    */
  private def closedWindows[T](rows: Set[(String, T)], frontierMs: Long): Set[(String, T)] = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val dayMs = 24L * 3600 * 1000
    rows.filter { case (ws, _) => fmt.parse(ws).getTime + dayMs <= frontierMs }
  }

  private def runWindowedAms(events: Array[(java.sql.Timestamp, Long)],
      delay: String, name: String, chunksN: Int): Unit = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingAmsF2
      .windowedSketchSums(input.toDS().toDF("ts", "h"), "1 day", delay)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    events.grouped((events.length + chunksN - 1) / chunksN).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    input.addData(IndexedSeq.empty)
    q.processAllAvailable()
    q.stop()

    // finalized (window, row_i, z) rows estimate exactly like a batch
    // sketch; compare (window, est_mean, est_mom) against oracled e23
    // restricted to the windows the watermark closed
    val fin = spark.table(name)
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("row_i"), col("z"))
    assert(fin.count() > 0, "no windows finalized — differential is vacuous")
    val streamed = graft.ops.AmsSketch.estimate(fin, col("ws"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toSet
    val e23 = SparkEntry.queries("e23_windowed_skew")(spark, sf)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toSet
    val lateMs = if (delay == "0 seconds") 0L else 2L * 3600 * 1000
    val expected = closedWindows(e23, events.map(_._1.getTime).max - lateMs)
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    assert(expected.nonEmpty && expected.size < e23.size)
  }

  test("windowed AMS (watermark append) == oracled e23 on finalized windows") {
    runWindowedAms(userHashedEvents(), "0 seconds", "wams_diff", 4)
  }

  test("windowed AMS under OUT-OF-ORDER replay (2h jitter, 2h watermark) == oracled e23 on finalized windows") {
    runWindowedAms(userHashedEventsJittered(2L * 3600 * 1000), "2 hours", "wams_ooo", 8)
  }

  private def runWindowedKmv(events: Array[(java.sql.Timestamp, Long)],
      delay: String, name: String, chunksN: Int): Unit = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingDistinctKmv
      .windowed(input.toDS().toDF("ts", "h"), "1 day", delay)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    events.grouped((events.length + chunksN - 1) / chunksN).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    input.addData(IndexedSeq.empty)
    q.processAllAvailable()
    q.stop()

    // a finalized window's KMV row is set-determined, so it must equal the
    // oracled e24 row exactly ((kth, estimate) per closed window)
    val streamed = spark.table(name)
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("kmv_kth"), col("kmv_est"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toSet
    assert(streamed.nonEmpty, "no windows finalized — differential is vacuous")
    val e24 = SparkEntry.queries("e24_windowed_uniques")(spark, sf)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toSet
    val lateMs = if (delay == "0 seconds") 0L else 2L * 3600 * 1000
    val expected = closedWindows(e24, events.map(_._1.getTime).max - lateMs)
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    assert(expected.nonEmpty && expected.size < e24.size)
  }

  test("windowed KMV uniques (watermark append) == oracled e24 on finalized windows") {
    runWindowedKmv(userHashedEvents(), "0 seconds", "wkmv_diff", 4)
  }

  test("windowed KMV uniques under OUT-OF-ORDER replay (2h jitter, 2h watermark) == oracled e24 on finalized windows") {
    runWindowedKmv(userHashedEventsJittered(2L * 3600 * 1000), "2 hours", "wkmv_ooo", 8)
  }

  test("StreamingSubstringDedup + spans == oracled d31 spans EXACTLY on sf0.01") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = StreamingSubstringDedup.run(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssd_diff").start()
    // 4 micro-batches in ascending doc_id order (ingest-tail replay)
    docs.grouped((docs.length + 3) / 4).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val dupPos = spark.table("ssd_diff")

    // each (doc, pos) emits AT MOST once across the whole replay
    val emitted = dupPos.as[DupGramPos].collect().map(h => (h.docId, h.pos))
    assert(emitted.nonEmpty, "corpus produced no duplicated grams — differential is vacuous")
    assert(emitted.length == emitted.distinct.length,
      "a duplicated position must emit exactly once")

    // unlike the owner-restricted SemDedup twin, this one is EXACT: after
    // full replay the emitted position set equals batch d31's df>=2 posting
    // frame, so the merged spans must match the oracled d31 span columns
    // cell for cell on every doc that has any duplicated span
    val streamedSpans = StreamingSubstringDedup.spans(dupPos)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = SparkEntry.queries("d31_substring_spans_hashed")(spark, sf)
      .filter(col("n_dup_spans") > 0)
      .select(col("doc_id").cast("long"), col("n_dup_spans"), col("dup_tokens"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(streamedSpans.keySet == batch.keySet,
      s"stream-only=${(streamedSpans.keySet -- batch.keySet).take(5)} " +
        s"batch-only=${(batch.keySet -- streamedSpans.keySet).take(5)}")
    streamedSpans.foreach { case (id, v) =>
      assert(v == batch(id), s"doc $id: streamed $v vs batch ${batch(id)}")
    }
  }

  test("StreamingSubstringDedup out-of-order replay converges to the same position set") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    // adversarial order: interleave from both ends so gram owners differ
    // wildly from the doc_id-ordered replay
    val shuffled = docs.sortBy(d => (d._1 % 7, -d._1))

    val input = MemoryStream[(Long, String)]
    val q = StreamingSubstringDedup.run(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssd_ooo").start()
    shuffled.grouped((shuffled.length + 5) / 6).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // the emitted POSITION SET is arrival-order-invariant (df>=2 is a set
    // property): any order converges to the batch posting frame
    val streamed = spark.table("ssd_ooo").as[DupGramPos]
      .collect().map(h => (h.docId, h.pos)).toSet
    val hits = StreamingSubstringDedup.gramHits(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val dupFps = hits.groupBy(col("fp")).count().filter(col("count") >= 2).select(col("fp"))
    val expected = hits.join(dupFps, Seq("fp"))
      .select(col("docId"), col("pos"))
      .as[(Long, Int)].collect().toSet
    assert(streamed == expected,
      s"stream-only=${(streamed -- expected).take(5)} batch-only=${(expected -- streamed).take(5)}")
  }
}
