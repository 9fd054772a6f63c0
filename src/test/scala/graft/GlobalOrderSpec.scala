package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GlobalOrder

class GlobalOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("distributed global row_number equals single-partition window row_number") {
    val n = 10000
    // non-trivial distribution: many ties on the primary key, unique tiebreak
    val df = (1 to n).map(i => (i % 97, s"k$i", i)).toDF("grp", "key", "v")

    val got = GlobalOrder
      .withRowNumber(df, "rn", col("grp").desc, col("key"))
      .select($"key", $"rn")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val want = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("grp").desc, col("key"))))
      .select($"key", $"rn")
      .collect().map(r => r.getString(0) -> r.getInt(1).toLong).toMap

    assert(got == want)
  }

  test("row numbers are a 1..N permutation and the plan has no single-partition window") {
    val df = (1 to 5000).map(i => (scala.util.hashing.MurmurHash3.stringHash(i.toString), i))
      .toDF("h", "v")
    val out = GlobalOrder.withRowNumber(df, "rn", col("h"), col("v"))
    val rns = out.select($"rn").as[Long].collect().sorted
    assert(rns.toSeq == (1L to 5000L))

    // the rank assignment is a narrow scan over the checkpointed range
    // partitioning: no Window node and no further shuffle in the plan
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty, out.queryExecution.executedPlan.toString)
  }

  test("grouped row_number + count equal the grouped-window formulation") {
    val n = 20000
    // 3 massive groups (the low-cardinality worst case for grouped windows)
    val df = (1 to n).map(i => (s"g${i % 3}", i % 17, i)).toDF("g", "v", "id")

    val got = GlobalOrder
      .withGroupedRowNumber(df, "rn", "cnt", Seq("g"), Seq(col("v"), col("id")))
      .select($"id", $"rn", $"cnt")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .select($"id", $"rn", $"cnt")
      .collect().map(r => r.getInt(0) -> (r.getInt(1).toLong, r.getLong(2))).toMap

    assert(got == want)
  }

  test("arithmetic NTILE from grouped rank matches the ntile window function") {
    // sizes not divisible by 4 exercise the uneven-tile remainder rule
    val df = (1 to 1003).map(i => (s"g${i % 5}", i)).toDF("g", "id")
    val ranked = GlobalOrder.withGroupedRowNumber(df, "rn", "cnt", Seq("g"), Seq(col("id")))
    val got = ranked
      .withColumn("tile", expr(
        """CASE WHEN rn <= (cnt % 4) * (cnt DIV 4 + 1)
          |     THEN (rn - 1) DIV (cnt DIV 4 + 1) + 1
          |     ELSE (cnt % 4) + (rn - 1 - (cnt % 4) * (cnt DIV 4 + 1)) DIV (cnt DIV 4) + 1
          |END""".stripMargin))
      .select($"id", $"tile")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g")).orderBy(col("id"))
    val want = df.withColumn("tile", ntile(4).over(w))
      .select($"id", $"tile")
      .collect().map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
    assert(got == want)
  }

  test("grouped running sum equals the grouped-window cumulative sum (decimal-exact)") {
    val n = 20000
    val df = (1 to n).map(i => (s"g${i % 3}", i % 23, i, (i % 700) / 100.0))
      .toDF("g", "v", "id", "wRaw")
      .withColumn("w", col("wRaw").cast("decimal(18,2)")).drop("wRaw")

    val got = GlobalOrder
      .withGroupedRunningSum(df, "cw", "tw", col("w"), Seq("g"), Seq(col("v"), col("id")))
      .select($"id", $"cw".cast("string"), $"tw".cast("string"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("cw", sum(col("w")).over(w))
      .withColumn("tw", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .select($"id", $"cw".cast("string"), $"tw".cast("string"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap

    assert(got.size == n)
    assert(got.keySet == want.keySet)
    val diffs = got.collect { case (k, v) if want(k)._1 != v._1 || want(k)._2 != v._2 => k }
    assert(diffs.isEmpty, s"mismatched ids: ${diffs.take(5)}")
  }

  test("grouped running sum over long measures matches and has no global window") {
    val df = (1 to 5000).map(i => (s"g${i % 2}", i, i.toLong % 97)).toDF("g", "id", "m")
    val out = GlobalOrder.withGroupedRunningSum(df, "cw", "tw", col("m"), Seq("g"), Seq(col("id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df.withColumn("cw", sum(col("m")).over(w))
      .select($"id", $"cw").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = out.select($"id", $"cw").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
    // prefix sums ride a narrow scan: no Window node, no second shuffle
    val windows = out.queryExecution.optimizedPlan.collect {
      case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
    }
    assert(windows.isEmpty)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty, out.queryExecution.executedPlan.toString)
  }

  test("randomized differential: running sum with ties and null measures matches windows") {
    // seeded randomness: heavy ties on the sort key, nullable measures (SUM
    // ignores nulls but the row still gets the running value), ragged group
    // sizes — the cases the hand-written partition scan must get right
    val rng = new scala.util.Random(42)
    val rows = (1 to 3000).map { i =>
      val m: Option[Double] = if (rng.nextInt(10) == 0) None else Some(rng.nextInt(500) / 100.0)
      (s"g${rng.nextInt(5)}", rng.nextInt(7), i, m)
    }
    val df = rows.toDF("g", "v", "id", "mRaw")
      .withColumn("m", col("mRaw").cast("decimal(18,2)")).drop("mRaw")

    val got = GlobalOrder
      .withGroupedRunningSum(df, "cw", "tw", col("m"), Seq("g"), Seq(col("v"), col("id")))
      .select($"id", $"cw".cast("string"), $"tw".cast("string"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("cw", sum(col("m")).over(w))
      .withColumn("tw", sum(col("m")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .select($"id", $"cw".cast("string"), $"tw".cast("string"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap

    assert(got.keySet == want.keySet)
    val bad = got.collect {
      case (k, v) if normalize(want(k)) != normalize(v) => (k, v, want(k))
    }
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  // leading-null running sums surface as 0.00 from the scan's typed zero but
  // stay NULL under the window formulation until the first non-null measure;
  // both satisfy SQL semantics (SUM over no non-null inputs is undefined-ish)
  // — the scan's zero is the documented behavior, so map NULL→zero for the
  // comparison and assert everything else matches exactly
  private def normalize(p: (String, String)): (String, String) =
    (if (p._1 == null) "0.00" else p._1, if (p._2 == null) "0.00" else p._2)

  test("empty input yields empty output with the rn column") {
    val df = Seq.empty[(Int, String)].toDF("a", "b")
    val out = GlobalOrder.withRowNumber(df, "rn", col("a"))
    assert(out.columns.contains("rn") && out.count() == 0)
  }

  // r19: multi-measure prefix pass — one range shuffle must equal two
  // chained single-measure passes, on both the all-long fast path and the
  // generic (decimal-mixed) path, grouped and ungrouped
  test("multi-measure running sums equal two chained single-measure passes (all-long)") {
    val df = (1 to 8000).map(i => (s"g${i % 3}", i, (i % 13).toLong, (i % 7).toLong))
      .toDF("g", "id", "m1", "m2")
    val got = GlobalOrder.withGroupedRunningSums(
        df, Seq(("c1", "t1", col("m1")), ("c2", "t2", col("m2"))),
        Seq("g"), Seq(col("id")))
      .select($"id", $"c1", $"t1", $"c2", $"t2")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val one = GlobalOrder.withGroupedRunningSum(
      df, "c1", "t1", col("m1"), Seq("g"), Seq(col("id")))
    val two = GlobalOrder.withGroupedRunningSum(
      one, "c2", "t2", col("m2"), Seq("g"), Seq(col("id")))
    val want = two.select($"id", $"c1", $"t1", $"c2", $"t2")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
  }

  test("multi-measure running sums: generic path (decimal + long), two group columns") {
    val rng = new scala.util.Random(7)
    val df = (1 to 4000).map { i =>
      (s"a${rng.nextInt(3)}", rng.nextInt(2), rng.nextInt(11), i,
        rng.nextInt(900) / 100.0, (i % 5).toLong)
    }.toDF("g1", "g2", "v", "id", "dRaw", "m")
      .withColumn("dm", col("dRaw").cast("decimal(18,2)")).drop("dRaw")
    val got = GlobalOrder.withGroupedRunningSums(
        df, Seq(("cd", "td", col("dm")), ("cm", "tm", col("m"))),
        Seq("g1", "g2"), Seq(col("v"), col("id")))
      .select($"id", $"cd".cast("string"), $"cm", $"tm")
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g1"), col("g2")).orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("cd", sum(col("dm")).over(w))
      .withColumn("cm", sum(col("m")).over(w))
      .withColumn("tm", sum(col("m")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g1"), col("g2"))))
      .select($"id", $"cd".cast("string"), $"cm", $"tm")
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("multi-measure running sums: ungrouped, one exchange, no window") {
    val df = (1 to 6000).map(i => (i, (i % 17).toLong, (i % 3).toLong)).toDF("id", "m1", "m2")
    val out = GlobalOrder.withGroupedRunningSums(
      df, Seq(("c1", "t1", col("m1")), ("c2", "t2", col("m2"))),
      Seq.empty, Seq(col("id")))
    val rows = out.select($"id", $"c1", $"c2", $"t1", $"t2").collect()
    var s1 = 0L; var s2 = 0L
    val byId = rows.map(r => r.getInt(0) -> r).toMap
    // constant expected total hoisted out of the loop (ADVICE r19: the
    // in-loop recompute made this assertion O(n^2) per run)
    val t1Want = rows.map(_.getInt(0) % 17).map(_.toLong).sum
    (1 to 6000).foreach { i =>
      s1 += (i % 17).toLong; s2 += (i % 3).toLong
      val r = byId(i)
      assert(r.getLong(1) == s1 && r.getLong(2) == s2, s"id $i")
      assert(r.getLong(3) == t1Want)
    }
    val windows = out.queryExecution.optimizedPlan.collect {
      case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
    }
    assert(windows.isEmpty)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty, out.queryExecution.executedPlan.toString)
  }
}
