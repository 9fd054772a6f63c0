package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Salting
import graft.sources.arcgis.AuthCache

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join, spreads the hot key") {
    // 90% of probe rows share one hot key
    val probe = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("key", "seq")
    val build = Seq(("hot", 1.0), ("k901", 2.0), ("k950", 3.0)).toDF("key", "w")

    val plain = probe.join(build, Seq("key")).agg(sum($"w"), count(lit(1))).head()
    val salted = Salting.saltedJoin(probe, build, Seq("key"), "seq", nSalts = 8)
      .agg(sum($"w"), count(lit(1))).head()
    assert(plain == salted)

    // the hot key occupies several salt buckets, not one
    val buckets = Salting.withSalt(probe.filter($"key" === "hot"), "seq", 8)
      .select("__salt").distinct().count()
    assert(buckets > 4)
  }

  test("adaptive salted join: hot key spread, cold keys unreplicated, equals plain join") {
    // 90% of probe rows share one hot key; 100 cold keys
    val probe = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 100}", i)).toDF("key", "seq")
    val build = ((0 until 100).map(i => (s"k$i", i.toDouble)) :+ ("hot", 999.0)).toDF("key", "w")

    val plain = probe.join(build, Seq("key")).agg(sum($"w"), count(lit(1))).head()
    val salted = Salting
      .saltedJoinHot(probe, build, Seq("key"), nSalts = 8)
      .agg(sum($"w"), count(lit(1))).head()
    assert(plain == salted)

    // detection is exact: 90% "hot" is hot, ~10-row cold keys (1% = 10 rows,
    // strict >) are not — so cold build rows are NOT replicated
    val hot = Salting.hotKeys(probe, Seq("key"), 0.01)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(hot == Seq("hot"))
  }

  test("hot detection fires when no column is high-cardinality (exact heavy hitters)") {
    // the x39 shape: one hot join key, the only other attribute 7-valued
    // (l_linenumber). The former hash-SAMPLE detector selected distinct
    // (key, ln) combos, not rows — the hot key has just 7 combos, so at
    // sampleRate=64 detection fired with probability ~10% (and never on
    // this corpus). Exact frequency counting cannot miss.
    val probe = (1 to 2000)
      .map(i => (if (i <= 1800) "hot" else s"k$i", i % 7 + 1, i))
      .toDF("key", "ln", "seq")
    val build = (Seq("hot") ++ (1801 to 2000).map(i => s"k$i")).map((_, 1.0)).toDF("key", "w")

    // detection is exact: the hot set is precisely {hot}
    val hot = Salting.hotKeys(probe, Seq("key"), 0.01)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(hot == Seq("hot"))

    // the hot key's rows spread across many salt buckets even though ln is
    // 7-valued: the row salt hashes ALL columns, not one low-cardinality
    // attribute (which would cap the spread at ≤ 7 uneven buckets)
    val spread = probe.filter($"key" === "hot")
      .select(pmod(xxhash64($"key", $"ln", $"seq"), lit(8L)).as("s"))
      .distinct().count()
    assert(spread > 4L)

    // and the join itself stays exact
    val plain = probe.join(build, Seq("key")).agg(sum($"w"), count(lit(1))).head()
    val salted = Salting
      .saltedJoinHot(probe, build, Seq("key"), nSalts = 8)
      .agg(sum($"w"), count(lit(1))).head()
    assert(plain == salted)
  }

  test("saltFrom override spreads a hot key whose rows are exact duplicates") {
    // duplicate-row skew pathology: every row of the hot key is IDENTICAL,
    // so the default content hash collapses them into one salt bucket and
    // the mitigation silently no-ops; a row-unique saltFrom column restores
    // the spread while the join stays exact
    val probe = (1 to 1000)
      .map(i => (if (i <= 900) "hot" else s"k$i", "same-payload", i))
      .toDF("key", "payload", "seq")
    val dupProbe = probe.drop("seq") // content-identical hot rows
    val build = Seq(("hot", 1.0), ("k901", 2.0)).toDF("key", "w")

    val plain = probe.join(build, Seq("key")).agg(sum($"w"), count(lit(1))).head()
    val salted = Salting
      .saltedJoinHot(probe, build, Seq("key"), nSalts = 8, saltFrom = Some("seq"))
      .agg(sum($"w"), count(lit(1))).head()
    assert(plain == salted)

    // without the override, content-duplicate hot rows share one bucket...
    val collapsed = dupProbe.filter($"key" === "hot")
      .select(pmod(xxhash64($"key", $"payload"), lit(8L)).as("s"))
      .distinct().count()
    assert(collapsed == 1L)
    // ...with it, the unique column drives the spread
    val spread = probe.filter($"key" === "hot")
      .select(pmod(xxhash64($"seq"), lit(8L)).as("s"))
      .distinct().count()
    assert(spread > 4L)
  }

  test("salt is deterministic (stable across retries)") {
    val df = (1 to 100).map(i => ("k", i)).toDF("key", "seq")
    val a = Salting.withSalt(df, "seq", 16).select("seq", "__salt").collect().toSet
    val b = Salting.withSalt(df, "seq", 16).select("seq", "__salt").collect().toSet
    assert(a == b)
  }
}

class AuthCacheSpec extends AnyFunSuite {
  test("P6: token cached until within refresh margin of expiry") {
    var clock = 1000L
    var fetches = 0
    val cache = new AuthCache(
      fetchToken = () => { fetches += 1; (s"tok$fetches", clock + 60000) },
      refreshMarginMs = 5000,
      now = () => clock
    )
    assert(cache.token() == "tok1" && fetches == 1)
    clock += 30000
    assert(cache.token() == "tok1" && fetches == 1) // still fresh
    clock += 26000 // 56s elapsed: 4s to expiry < 5s margin → refresh
    assert(cache.token() == "tok2" && fetches == 2)
    cache.invalidate()
    assert(cache.token() == "tok3" && fetches == 3)
  }

  test("update() hook: forced refresh re-authenticates even when the token is fresh") {
    var clock = 1000L
    var fetches = 0
    val cache = new AuthCache(
      fetchToken = () => { fetches += 1; (s"tok$fetches", clock + 60000) },
      refreshMarginMs = 5000,
      now = () => clock
    )
    assert(cache.token() == "tok1" && fetches == 1)
    // fresh token (59s to expiry), but the maintenance hook must re-auth NOW
    assert(cache.refresh() == "tok2" && fetches == 2)
    // and the refreshed token is what subsequent requests use
    assert(cache.token() == "tok2" && fetches == 2)
  }
}

class StreamingWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("§2.8: watermarked tumbling-window aggregate over a stream") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (t("2024-01-01 10:05:00"), "click", 1.0),
      (t("2024-01-01 10:55:00"), "click", 2.0),
      (t("2024-01-01 11:05:00"), "click", 4.0)
    )
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out")
      .select(col("window.start").cast("string"), $"n", $"v")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("2024-01-01 10:00:00", 2L, 3.0),
      ("2024-01-01 11:00:00", 1L, 4.0)
    ))
  }
}
