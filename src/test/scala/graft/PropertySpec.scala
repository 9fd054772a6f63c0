package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.{TextOps, WebMercator}

/** Property-based invariants (SURVEY.md §5.2): projection round-trips,
  * fingerprint/hash determinism and sensitivity, salting stability.
  * Driver-side math only — the Spark-plan twins are covered by the oracle
  * harness and unit specs.
  */
object WebMercatorProps extends Properties("WebMercator") {
  private val lons = Gen.chooseNum(-179.99, 179.99)
  private val lats = Gen.chooseNum(-85.0, 85.0)

  property("x round-trips within 1e-9 deg") = forAll(lons) { lon =>
    math.abs(WebMercator.invX(WebMercator.x(lon)) - lon) < 1e-9
  }
  property("y round-trips within 1e-9 deg") = forAll(lats) { lat =>
    math.abs(WebMercator.invY(WebMercator.y(lat)) - lat) < 1e-9
  }
  property("x is strictly monotonic") = forAll(lons, lons) { (a, b) =>
    a == b || ((a < b) == (WebMercator.x(a) < WebMercator.x(b)))
  }
  property("y is strictly monotonic") = forAll(lats, lats) { (a, b) =>
    a == b || ((a < b) == (WebMercator.y(a) < WebMercator.y(b)))
  }
}

object FrameSumsProps extends Properties("FrameSums") {
  import graft.functions.MediaExpressions.frameSumsOf
  private val bytes = Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))
  private val frameLens = Gen.chooseNum(1, 64)

  property("frame sums conserve the unsigned byte total") =
    forAll(bytes, frameLens) { (b, f) =>
      frameSumsOf(b, f).sum == b.map(_ & 0xff).map(_.toLong).sum
    }

  property("frame count is ceil(n / frameLen), each full frame bounded by 255*frameLen") =
    forAll(bytes, frameLens) { (b, f) =>
      val fs = frameSumsOf(b, f)
      fs.length == (b.length + f - 1) / f &&
        fs.forall(s => s >= 0L && s <= 255L * f)
    }

  property("concatenating two frame-aligned payloads concatenates their sums") =
    forAll(bytes, bytes, frameLens) { (a0, b0, f) =>
      // truncate a to a frame boundary so concatenation preserves windows
      val a = a0.take((a0.length / f) * f)
      frameSumsOf(a ++ b0, f).toSeq ==
        (frameSumsOf(a, f) ++ frameSumsOf(b0, f)).toSeq
    }
}

object TextHashProps extends Properties("TextOps") {
  private val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  // mirror of the Column-side token hash for property checking
  private def th(t: String): Long =
    (t.length.toLong * 2654435761L + t.head.toInt * 131L + t.last.toInt) % TextOps.P

  property("token hash is within [0, P)") = forAll(token) { t =>
    val h = th(t); h >= 0 && h < TextOps.P
  }
  property("minhash of a superset never exceeds (a*h+b)%P of the subset min") =
    forAll(Gen.nonEmptyListOf(token), token) { (toks, extra) =>
      def mh(ts: Seq[String]) = ts.map(t => (7L * th(t) + 3L) % TextOps.P).min
      mh(toks :+ extra) <= mh(toks)
    }
}
