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
      .saltedJoinHot(probe, build, Seq("key"), "seq", nSalts = 8, sampleRate = 4)
      .agg(sum($"w"), count(lit(1))).head()
    assert(plain == salted)

    // the hot key really is detected and spread, and cold build rows are NOT
    // replicated: salted-build row count stays ~|build| + (nSalts-1) hot rows,
    // nowhere near |build| * nSalts
    val sampled = probe.filter(pmod(xxhash64($"key", $"seq"), lit(4)) === 0)
    val hotDetected = sampled.filter($"key" === "hot").count() >
      (sampled.count() * 0.01).toLong
    assert(hotDetected)
  }

  test("hot detection fires when saltFrom is low-cardinality (sample spans keys)") {
    // the x39 shape: high-cardinality join key, 7-valued saltFrom
    // (l_linenumber). A sample hashed on saltFrom ALONE is all-or-nothing
    // per saltFrom class — typically empty, so hot detection silently never
    // fired. The keys+saltFrom hash makes it a genuine 1/sampleRate subset.
    val probe = (1 to 2000)
      .map(i => (if (i <= 1800) "hot" else s"k$i", i % 7 + 1))
      .toDF("key", "ln")
    val build = (Seq("hot") ++ (1801 to 2000).map(i => s"k$i")).map((_, 1.0)).toDF("key", "w")

    // the old failure mode, pinned: no linenumber class hashes to 0 mod 64
    val oldSample = probe.filter(pmod(xxhash64($"ln"), lit(64)) === 0)
    assert(oldSample.count() == 0L, "corpus chosen so the old sample is empty")

    // new sample is a genuine subset and the hot key dominates it
    val sampled = probe.filter(pmod(xxhash64($"key", $"ln"), lit(64)) === 0)
    val n = sampled.count()
    assert(n > 0L && n < 2000L)
    assert(sampled.filter($"key" === "hot").count() > (n * 0.01).toLong)

    // and the join itself stays exact
    val plain = probe.join(build, Seq("key")).agg(sum($"w"), count(lit(1))).head()
    val salted = Salting
      .saltedJoinHot(probe, build, Seq("key"), "ln", nSalts = 8, sampleRate = 64)
      .agg(sum($"w"), count(lit(1))).head()
    assert(plain == salted)
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
