package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernel for the LLM-data-pipeline surface (SURVEY.md §2.9):
  * tokenization, token hashing, MinHash signatures, SimHash, positional
  * document fingerprints, quality scoring, marker-based language ID.
  *
  * Everything here is pure Column expressions (codegen'd, no UDFs) and uses
  * only integer arithmetic (mod 1e9+7) or single IEEE divisions, so results
  * are bit-identical across engines — the DuckDB oracles in
  * [[graft.queries.TextPack]] / [[graft.queries.DedupPack]] re-express the
  * same formulas in SQL.
  *
  * Scale: all ops are per-row (embarrassingly parallel, no shuffle);
  * MinHash/SimHash reduce each document to a fixed-width signature so
  * near-dup joins become equi-joins on band keys instead of O(n²) pairs.
  */
object TextOps {
  /** Modulus for all token hashes (fits comfortably in a long product). */
  val P = 1000000007L

  def tokens(c: Column): Column = split(c, " ")

  /** Deterministic token hash on (length, first char, last char).
    * SQL twin: ((length(x)*2654435761 + ascii(x)*131 + ascii(x[-1:])) % 1000000007)
    */
  def tokenHash(t: Column): Column =
    (length(t).cast("long") * lit(2654435761L) +
      ascii(t).cast("long") * lit(131L) +
      ascii(substring(t, -1, 1)).cast("long")) % lit(P)

  /** One MinHash signature: min over tokens of (a*h(t)+b) mod P.
    * Min is commutative → order-independent → oracle-safe.
    */
  def minhash(toks: Column, a: Long, b: Long): Column =
    array_min(transform(toks, t => (lit(a) * tokenHash(t) + lit(b)) % lit(P)))

  /** Token hashes materialized once; feed [[minhashFromHashes]] when
    * computing several permutations so h(t) isn't re-evaluated per seed.
    */
  def tokenHashes(toks: Column): Column = transform(toks, t => tokenHash(t))

  def minhashFromHashes(hashes: Column, a: Long, b: Long): Column =
    array_min(transform(hashes, h => (lit(a) * h + lit(b)) % lit(P)))

  /** Base and modulus of the k-gram rolling fingerprint. FpM = 2^49 - 81 is
    * prime and sized so one fold step never leaves the exact-long range in
    * EITHER engine: acc < FpM (2^49), so acc*FpB + h < 2^49·131 + 2^30 ≈
    * 2^56 ≪ 2^63 — Spark longs don't wrap and DuckDB BIGINTs don't raise.
    * 49 bits keeps the birthday collision odds for a 10^8-gram corpus below
    * 1% while the key stays a single 8-byte long.
    */
  val FpB = 131L
  val FpM = 562949953421231L

  /** Rolling k-gram fingerprints over a token-hash array: element i (1-based
    * gram start) is the polynomial fold acc → (acc·FpB + h) mod FpM over
    * h[i..i+k-1]. This is the PRODUCTION substring-dedup key (Lee et al.
    * §4.1-style): an 8-byte long per gram, so the d31 gram shuffle carries
    * ~8 bytes/posting where the literal-string spelling (d19) carries the
    * whole k-token text (~10× token bytes). Fold is O(k) per gram — 10
    * integer mul-adds, map-side, no shuffle; an O(1)/gram sliding-window
    * form (subtract h[i]·FpB^{k-1} via 128-bit mulmod) is possible as a
    * custom Expression but the fold is nowhere near the bottleneck vs the
    * postings shuffle it feeds. Empty array when the doc has < k tokens
    * (Spark's sequence(1, n) DESCENDS for n < 1 — must not reach it).
    * SQL twin: [[graft.queries.DedupPack.fpSql]].
    */
  def gramFingerprints(hashes: Column, k: Int): Column =
    when(size(hashes) < lit(k), array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(hashes) - lit(k - 1)),
        i => aggregate(slice(hashes, i, lit(k)), lit(0L), (acc, h) => (acc * lit(FpB) + h) % lit(FpM))
      ))

  /** 8-bit SimHash over token hashes: bit b is set iff more tokens have bit b
    * of their hash set than clear.
    */
  def simhash8(toks: Column): Column =
    (0 until 8).map { b =>
      val vote = aggregate(
        toks,
        lit(0L),
        (s, t) =>
          s + when(shiftright(tokenHash(t), b) % 2 === 1, lit(1L)).otherwise(lit(-1L))
      )
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Position-weighted document fingerprint (rolling-hash style):
    * sum_i h(t_i) * ((i*1315423911) mod P) mod P, i 1-based.
    */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(
        toks,
        (t, i) => tokenHash(t) * (((i + 1).cast("long") * lit(1315423911L)) % lit(P)) % lit(P)
      ),
      lit(0L),
      (s, x) => s + x
    ) % lit(P)

  /** Total characters across tokens (for avg token length). */
  def sumTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (s, t) => s + length(t).cast("long"))

  /** Count of tokens appearing in a marker/stopword set. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  // Marker vocabularies for the n-gram-free language-ID heuristic. Real-world
  // stopword lists; argmax with deterministic tie order en>de>fr>es.
  val EnMarkers = Seq("the", "a", "and", "of", "to", "in", "is")
  val DeMarkers = Seq("der", "die", "und", "das", "ist", "ein", "nicht")
  val FrMarkers = Seq("le", "la", "et", "les", "des", "un", "est")
  val EsMarkers = Seq("el", "los", "y", "las", "un", "es", "que")
}
