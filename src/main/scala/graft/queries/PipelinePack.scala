package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps.{fingerprint, tokens, P}

/** Training-data curation operators (SURVEY.md §2.9, driver north-star):
  * the steps between "raw corpus" and "training shard" that the reference's
  * ETL surface (filter → transform → route → sink,
  * `/root/reference/task.ts:155-361`) would need at LLM-corpus scale —
  * PII-style masking, corpus-driven stopword pruning, contamination/novelty
  * scoring, deterministic train/val/test splitting, funnel analysis, and
  * the k-means M-step that keeps an IVF index's centroids fresh.
  *
  * Scale notes (100 TB):
  *   - p1/p4 are per-row (no shuffle); the split key is a pure hash of the
  *     stable id, so shards are reproducible across re-runs and machines —
  *     never rand()-based, which re-deals rows on retry.
  *   - p2 broadcasts a tiny global vocabulary (top-k) into a map-side hash
  *     join; the corpus-side explode never shuffles.
  *   - p3 is two shuffles on the shingle key (doc-frequency + join back),
  *     both partial-aggregated; posting lists, not O(n²) pairs.
  *   - p6 reduces each partition to (label, sum, count) — pure partial
  *     aggregation, output rows = k centroids.
  */
object PipelinePack extends QueryPack {

  override def queries: Seq[Q] = Seq(
    // ------------------------------------------------------------ p1 masking
    Q(
      "p1_regex_redact",
      (s, d) => {
        val masked = regexp_replace(col("props"), "[0-9]+", "<NUM>")
        Tables.events(s, d)
          .select(
            col("event_type"),
            size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long").as("runs"),
            masked.as("masked")
          )
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("runs")).as("n_masked_runs"),
            min(col("masked")).as("sample_masked")
          )
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_masked_runs,
             |  MIN(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS sample_masked
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin),
      doc = "PII-style masking of numeric runs in semi-structured payloads " +
        "(regexp_replace, per-row, no shuffle) + audit counts per type"
    ),
    // ------------------------------------------------------------ p2 stopwords
    Q(
      "p2_stopword_prune",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        // corpus-driven vocabulary: top-5 tokens by global frequency,
        // deterministic tie-break on the token itself
        val top5 = tok.groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(5)
          .select(col("token"), lit(1).as("is_stop"))
        tok.join(broadcast(top5), Seq("token"), "left_outer")
          .groupBy(col("doc_id"))
          .agg(
            sum(when(col("is_stop").isNull, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("is_stop").isNotNull, 1L).otherwise(0L)).as("n_pruned")
          )
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |top5 AS (
             |  SELECT token FROM (
             |    SELECT token, COUNT(*) AS n FROM tok GROUP BY token
             |    ORDER BY n DESC, token LIMIT 5))
             |SELECT doc_id,
             |  CAST(SUM(CASE WHEN token IN (SELECT token FROM top5) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
             |  CAST(SUM(CASE WHEN token IN (SELECT token FROM top5) THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
             |FROM tok
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "corpus-frequency stopword pruning: global top-k vocabulary (two-level " +
        "partial agg) broadcast into a map-side anti-probe over the exploded corpus"
    ),
    // ------------------------------------------------------------ p3 novelty
    Q(
      "p3_shingle_novelty",
      (s, d) => {
        val toks = tokens(col("text"))
        val sh = Tables.documents(s, d)
          .filter(size(toks) >= 3)
          .select(
            col("doc_id"),
            explode(graft.functions.TextExpressions.shingles(col("text"), 3)).as("shingle")
          )
        // doc-frequency of each distinct-within-doc shingle; df = 1 ⇒ the
        // shingle occurs in exactly one document ⇒ novel
        val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        sh.join(df, Seq("shingle"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_shingles"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel")
          )
          .withColumn("novelty", col("n_novel").cast("double") / col("n_shingles"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
             |  WHERE len(toks) >= 3),
             |sh AS (SELECT doc_id, unnest(sh) AS shingle FROM t),
             |df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
             |agg AS (
             |  SELECT sh.doc_id, COUNT(*) AS n_shingles,
             |    CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
             |  FROM sh JOIN df USING (shingle)
             |  GROUP BY sh.doc_id)
             |SELECT doc_id, n_shingles, n_novel,
             |  CAST(n_novel AS DOUBLE) / n_shingles AS novelty
             |FROM agg
             |ORDER BY doc_id""".stripMargin),
      doc = "contamination / novelty scoring: fraction of a doc's trigram shingles " +
        "seen nowhere else — posting-list doc-frequency join, never O(n²) pairs"
    ),
    // ------------------------------------------------------------ p4 split
    Q(
      "p4_hash_split",
      (s, d) => {
        // overflow-safe: reduce BOTH factors mod P first — (id*2654435761)%P
        // ≡ ((id%P)*(2654435761%P))%P, but the reduced product is ≤ ~6.5e17
        // (fits a Long for ANY 64-bit doc_id), whereas the unreduced multiply
        // wraps negative past id ~3.47e9 and overflows BIGINT in the oracle
        val bucket = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P) % 100
        Tables.documents(s, d)
          .select(
            col("source"),
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
            col("n_chars")
          )
          .groupBy(col("source"), col("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars")
          )
          .orderBy(col("source"), col("split"))
      },
      Some("""SELECT source, split, COUNT(*) AS n_docs,
             |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_chars
             |FROM (
             |  SELECT source, n_chars,
             |    CASE WHEN ((doc_id % 1000000007) * 654435747) % 1000000007 % 100 < 80 THEN 'train'
             |         WHEN ((doc_id % 1000000007) * 654435747) % 1000000007 % 100 < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents) t
             |GROUP BY source, split
             |ORDER BY source, split""".stripMargin),
      doc = "deterministic train/val/test sharding: pure hash of the stable id " +
        "(reproducible across re-runs/retries, unlike rand()), per-row, no shuffle " +
        "before the stats agg"
    ),
    // ------------------------------------------------------------ p5 funnel
    Q(
      "p5_event_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        // stage k's clock starts at stage k-1's first qualifying event:
        // min-aggregate per user, then an equi-join feeds the next stage —
        // each stage is one shuffle on user_id, reused by AQE
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_v"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts") > col("t_v"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_c"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts") > col("t_c"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_p"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
      },
      Some("""WITH v AS (
             |  SELECT user_id, MIN(ts) AS t_v FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_c FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > v.t_v GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_p FROM events e JOIN c USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > c.t_c GROUP BY e.user_id)
             |SELECT (SELECT COUNT(*) FROM v) AS n_view,
             |       (SELECT COUNT(*) FROM c) AS n_view_click,
             |       (SELECT COUNT(*) FROM p) AS n_full_funnel""".stripMargin),
      doc = "ordered view→click→purchase funnel: per-stage min-after-previous-stage " +
        "aggregation chain, one user_id shuffle per stage"
    ),
    // ------------------------------------------------------------ p6 M-step
    Q(
      "p6_centroid_update",
      (s, d) => {
        // exact mean over a fixed 1e-6 grid: floor-quantize each float to a
        // long BEFORE summing so the aggregation is integer (order-free),
        // then one double division chain — bit-identical across engines
        def qdim(i: Int) =
          sum(floor(element_at(col("embedding"), i).cast("double") * 1e6).cast("long"))
        Tables.embeddings(s, d)
          .groupBy(col("label").cast("long").as("label"))
          .agg(
            count(lit(1)).as("n_vectors"),
            qdim(1).as("s0"),
            qdim(2).as("s1")
          )
          .select(
            col("label"),
            col("n_vectors"),
            (col("s0").cast("double") / 1e6 / col("n_vectors")).as("mean_d0"),
            (col("s1").cast("double") / 1e6 / col("n_vectors")).as("mean_d1")
          )
          .orderBy(col("label"))
      },
      Some("""SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vectors,
             |  CAST(CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000 / COUNT(*) AS mean_d0,
             |  CAST(CAST(SUM(CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000 / COUNT(*) AS mean_d1
             |FROM embeddings
             |GROUP BY label
             |ORDER BY label""".stripMargin),
      doc = "k-means M-step (centroid recompute for the IVF index): per-label vector " +
        "mean as integer partial aggregation on a fixed grid — map-side combine, " +
        "output rows = k"
    ),
    // ------------------------------------------------------------ p7 length band
    Q(
      "p7_quantile_band_filter",
      (s, d) => {
        // outlier-length pruning driven by corpus statistics: keep documents
        // inside the global [p05, p95] length band. The bounds are one
        // single-row aggregate broadcast into a scan-side filter —
        // two passes total, no sort of the full corpus
        val docs = Tables.documents(s, d)
        val bounds = docs.agg(
          expr("percentile(n_chars, 0.05)").as("p05"),
          expr("percentile(n_chars, 0.95)").as("p95")
        )
        docs
          .crossJoin(broadcast(bounds))
          .filter(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_kept"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars")
          )
          .orderBy(col("source"))
      },
      Some("""WITH b AS (
             |  SELECT quantile_cont(n_chars, 0.05) AS p05,
             |         quantile_cont(n_chars, 0.95) AS p95
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_kept,
             |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
             |FROM documents CROSS JOIN b
             |WHERE n_chars >= p05 AND n_chars <= p95
             |GROUP BY source
             |ORDER BY source""".stripMargin),
      doc = "corpus-statistics curation filter: global [p05,p95] length band from one " +
        "broadcast single-row aggregate — the outlier-pruning step before training"
    ),
    // ------------------------------------------------------------ p8 mixture
    Q(
      "p8_weighted_mixture",
      (s, d) => {
        // training-mixture construction: per-source sampling rates applied
        // via the deterministic id hash (same bucket formula as p4), so the
        // mixture is reproducible across re-runs and task retries. Rates
        // ride a broadcast map join — at scale this is a tiny dim table.
        val rates = s.createDataFrame(Seq(
          ("src0", 100), ("src1", 75), ("src2", 50), ("src3", 25), ("src4", 10)
        )).toDF("source", "rate_pct")
        // same overflow-safe reduced-multiplier bucket as p4
        val bucket = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P) % 100
        Tables.documents(s, d)
          .withColumn("bucket", bucket)
          .join(broadcast(rates), Seq("source"), "left_outer")
          .filter(col("bucket") < coalesce(col("rate_pct"), lit(0)))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_sampled"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars")
          )
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_sampled,
             |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_chars
             |FROM (
             |  SELECT d.source, d.n_chars,
             |    ((d.doc_id % 1000000007) * 654435747) % 1000000007 % 100 AS bucket,
             |    CASE d.source WHEN 'src0' THEN 100 WHEN 'src1' THEN 75
             |      WHEN 'src2' THEN 50 WHEN 'src3' THEN 25
             |      WHEN 'src4' THEN 10 ELSE 0 END AS rate_pct
             |  FROM documents d) t
             |WHERE bucket < rate_pct
             |GROUP BY source
             |ORDER BY source""".stripMargin),
      doc = "weighted training-mixture sampling: per-source rates from a broadcast dim, " +
        "acceptance by deterministic id-hash bucket — reproducible on retry, " +
        "unsampled sources drop out entirely"
    ),
    // ------------------------------------------------------------ p9 repetition
    Q(
      "p9_repetition_stats",
      (s, d) => {
        // Gopher-style repetition quality signals: a document dominated by
        // one token or one bigram is boilerplate/spam, and low type-token
        // ratio means low information density. Shape: two posting-list
        // aggregations (unigram and bigram term frequencies, both
        // partial-aggregated map-side before the doc_id shuffle) joined
        // per doc — never a per-doc sort or a driver loop.
        val toks = tokens(col("text"))
        val base = Tables.documents(s, d).select(col("doc_id"), toks.as("tk"))
        val uni = base.select(col("doc_id"), explode(col("tk")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("c")).as("top_tok_n")
          )
        val big = base.filter(size(col("tk")) >= 2)
          .select(col("doc_id"),
            explode(expr("transform(sequence(1, size(tk) - 1), " +
              "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("bg"))
          .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))
        uni.join(big, Seq("doc_id"), "left_outer")
          .select(
            col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_tok_n"),
            coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
            (col("top_tok_n").cast("double") / col("n_tokens")).as("top_tok_frac"),
            (col("top_tok_n").cast("double") / col("n_tokens") <= 0.12 &&
              col("n_distinct").cast("double") / col("n_tokens") >= 0.4).as("keep")
          )
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |uni AS (
             |  SELECT doc_id, tok, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) GROUP BY doc_id, tok),
             |u AS (
             |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
             |    CAST(MAX(c) AS BIGINT) AS top_tok_n
             |  FROM uni GROUP BY doc_id),
             |big AS (
             |  SELECT doc_id, bg, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-1),
             |          i -> tk[i] || ' ' || tk[i+1])) AS bg
             |        FROM toks WHERE len(tk) >= 2) GROUP BY doc_id, bg),
             |b AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM big GROUP BY doc_id)
             |SELECT u.doc_id, n_tokens, n_distinct, top_tok_n,
             |  COALESCE(top_bigram_n, 0) AS top_bigram_n,
             |  CAST(top_tok_n AS DOUBLE) / n_tokens AS top_tok_frac,
             |  (CAST(top_tok_n AS DOUBLE) / n_tokens <= 0.12 AND
             |   CAST(n_distinct AS DOUBLE) / n_tokens >= 0.4) AS keep
             |FROM u LEFT JOIN b ON u.doc_id = b.doc_id
             |ORDER BY u.doc_id""".stripMargin),
      doc = "Gopher-style repetition filters: top-unigram fraction, top-bigram count, " +
        "type-token ratio per document — posting-list aggregation, map-side combined"
    ),
    // ------------------------------------------------------------ p10 packing
    Q(
      "p10_pack_sequences",
      (s, d) => {
        // sequence packing: contiguous documents (per source, stable doc_id
        // order) are chunked into fixed token-budget bins — the step that
        // turns a curated corpus into training sequences. Deterministic:
        // bin = floor(tokens-before-this-doc / budget), a running-sum window
        // (one shuffle on source, in-partition sort). At 100 TB a single
        // source would sub-partition by a (source, shard) composite key;
        // the shape is unchanged.
        val budget = 512.0
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("bin",
            floor((col("cum") - col("n_tok")).cast("double") / lit(budget)).cast("long"))
          .groupBy(col("source"), col("bin"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens")
          )
          .orderBy(col("source"), col("bin"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents),
             |c AS (
             |  SELECT doc_id, source, n_tok,
             |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |                     ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM d)
             |SELECT source,
             |  CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 512.0) AS BIGINT) AS bin,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
             |FROM c GROUP BY source, bin
             |ORDER BY source, bin""".stripMargin),
      doc = "training-sequence packing: per-source running token count chunked into " +
        "fixed 512-token bins — deterministic window + aggregate, reproducible shards"
    ),
    // ------------------------------------------------------------ p11 sample
    Q(
      "p11_group_sample",
      (s, d) => {
        // deterministic per-stratum sampling: k docs per source, chosen by
        // ranking on the id hash — the reservoir-sample shape but
        // reproducible across re-runs, task retries, and engines (never
        // rand()). One shuffle on source; the window's per-group sort is
        // bounded by stratum size, and a top-k aggregate would replace it
        // if strata outgrew memory.
        import org.apache.spark.sql.expressions.Window
        val h = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P)
        val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"), h.as("h"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("source"), col("rk").cast("long").as("rk"), col("doc_id"), col("n_chars"))
          .orderBy(col("source"), col("rk"))
      },
      Some("""SELECT source, rk, doc_id, n_chars FROM (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY ((doc_id % 1000000007) * 654435747) % 1000000007, doc_id) AS rk
             |  FROM documents) t
             |WHERE rk <= 3
             |ORDER BY source, rk""".stripMargin),
      doc = "deterministic per-stratum sampling: k docs per source ranked by the id " +
        "hash — reservoir-sample semantics, reproducible on retry and across engines"
    ),
    // ---------------------------------------------------------------- dsir
    Q(
      "p12_importance_weights",
      (s, d) => {
        // DSIR-style importance resampling weights: log w(doc) =
        // Σ_tok [log P_target(tok) − log P_source(tok)], with the target
        // distribution estimated from a trusted slice (source = 'src0') and
        // the source distribution from the whole corpus, both add-one
        // smoothed over the corpus vocabulary. Per-token log-ratios are
        // integer-grid-quantized before the per-doc sum (order-free, exact).
        // Scale shape: two token-frequency aggregates + one broadcast of the
        // (tiny) per-token ratio table into the exploded corpus scan.
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("token"))
        val freqS = tok.groupBy(col("token")).agg(count(lit(1)).as("n_s"))
        val freqT = tok.filter(col("source") === "src0")
          .groupBy(col("token")).agg(count(lit(1)).as("n_t"))
        val stats = freqS.join(freqT, Seq("token"), "left")
          .select(col("token"), col("n_s"), coalesce(col("n_t"), lit(0L)).as("n_t"))
        val totals = freqS.agg(sum(col("n_s")).as("tot_s"), count(lit(1)).as("vocab"))
          .crossJoin(freqT.agg(sum(col("n_t")).as("tot_t")))
        val ratio = stats.crossJoin(broadcast(totals))
          .select(
            col("token"),
            floor(
              (log((col("n_t") + 1).cast("double") / (col("tot_t") + col("vocab")).cast("double")) -
                log((col("n_s") + 1).cast("double") / (col("tot_s") + col("vocab")).cast("double"))) * 1e6
            ).cast("long").as("q")
          )
        tok
          .join(broadcast(ratio), Seq("token"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("q")).as("sum_q"))
          .select(
            col("doc_id"),
            col("n_tokens"),
            (col("sum_q").cast("double") / 1e6).as("log_weight")
          )
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token FROM documents),
             |fs AS (SELECT token, COUNT(*) AS n_s FROM tok GROUP BY token),
             |ft AS (SELECT token, COUNT(*) AS n_t FROM tok WHERE source = 'src0' GROUP BY token),
             |st AS (SELECT fs.token, n_s, COALESCE(n_t, 0) AS n_t FROM fs LEFT JOIN ft USING (token)),
             |tot AS (SELECT (SELECT CAST(SUM(n_s) AS BIGINT) FROM fs) AS tot_s,
             |               (SELECT COUNT(*) FROM fs) AS vocab,
             |               (SELECT CAST(SUM(n_t) AS BIGINT) FROM ft) AS tot_t),
             |ratio AS (
             |  SELECT token,
             |    CAST(floor((ln(CAST(n_t + 1 AS DOUBLE) / CAST(tot_t + vocab AS DOUBLE)) -
             |                ln(CAST(n_s + 1 AS DOUBLE) / CAST(tot_s + vocab AS DOUBLE))) * 1000000) AS BIGINT) AS q
             |  FROM st CROSS JOIN tot)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |  CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / 1000000 AS log_weight
             |FROM tok JOIN ratio USING (token)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "DSIR-style importance weights: per-token log ratio of a trusted-slice " +
        "target distribution vs the corpus distribution (add-one smoothed), " +
        "integer-grid summed per document — the data-selection resampling signal"
    ),
    // ---------------------------------------------------------------- classifier
    Q(
      "p13_quality_classifier",
      (s, d) => {
        // in-plan model scoring: a fixed-weight logistic quality classifier
        // (fastText-style linear model) over per-row engineered features —
        // type-token ratio, chars-per-token, stopword ratio, log-length.
        // Pure map stage: no shuffle, whole-stage codegen, the shape of any
        // learned-filter deployment at 100 TB (weights broadcast or inlined).
        // The logit is floor-quantized BEFORE the sigmoid so cross-libm ln()
        // ulp noise can't flip a cell.
        val toks = tokens(col("text"))
        val n = size(toks).cast("double")
        val ttr = size(array_distinct(toks)).cast("double") / n
        val cpt = length(col("text")).cast("double") / n
        val stopRatio = size(filter(toks, t => t.isin("the", "a", "of", "to", "and"))).cast("double") / n
        val z = lit(-1.5) + lit(2.0) * ttr + lit(0.25) * cpt - lit(2.0) * stopRatio +
          lit(0.1) * log(n)
        val zq = floor(z * 1e6) / 1e6
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            quant(lit(1.0) / (lit(1.0) + exp(-zq)), 1e6).as("quality_score"),
            (zq >= 0.0).as("keep")
          )
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  floor(1.0 / (1.0 + exp(-zq)) * 1000000) / 1000000 AS quality_score,
             |  zq >= 0.0 AS keep
             |FROM (
             |  SELECT doc_id,
             |    floor((-1.5 + 2.0 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
             |           + 0.25 * (CAST(len(text) AS DOUBLE) / len(toks))
             |           - 2.0 * (CAST(len(list_filter(toks, t -> t IN ('the','a','of','to','and'))) AS DOUBLE) / len(toks))
             |           + 0.1 * ln(CAST(len(toks) AS DOUBLE))) * 1000000) / 1000000 AS zq
             |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents) t) s
             |ORDER BY doc_id""".stripMargin),
      doc = "fixed-weight logistic quality classifier scored inside the plan (no " +
        "shuffle, codegen map stage) — the learned-filter deployment shape; logit " +
        "quantized before the sigmoid for cross-engine determinism"
    ),
    // ---------------------------------------------------------------- shards
    Q(
      "p14_balanced_shards",
      (s, d) => {
        // deterministic corpus shuffle + EXACTLY balanced sharding: docs are
        // globally ordered by a multiplicative id hash (reproducible on
        // retry, never rand()) and dealt round-robin into 16 shards — shard
        // sizes differ by at most 1 BY CONSTRUCTION, unlike p4's modulo
        // split which is only statistically balanced. The global rank is
        // GlobalOrder.withRowNumber (range shuffle + prefix offsets), never
        // a single-partition window over the corpus.
        val hash = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P)
        val ranked = graft.ops.GlobalOrder.withRowNumber(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars"), hash.as("h")),
          "rank", col("h"), col("doc_id"))
        ranked
          .withColumn("shard", (col("rank") - 1) % 16)
          .groupBy(col("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            min(col("rank")).as("first_rank"))
          .orderBy(col("shard"))
      },
      Some("""WITH ranked AS (
             |  SELECT doc_id, n_chars,
             |    row_number() OVER (
             |      ORDER BY ((doc_id % 1000000007) * 654435747) % 1000000007, doc_id) AS rank
             |  FROM documents)
             |SELECT (rank - 1) % 16 AS shard, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             |  MIN(rank) AS first_rank
             |FROM ranked
             |GROUP BY shard
             |ORDER BY shard""".stripMargin),
      doc = "deterministic corpus shuffle + exactly balanced round-robin sharding " +
        "(sizes differ by ≤1 by construction) — distributed global rank, no " +
        "single-partition window, reproducible on retry"
    ),
    // ---------------------------------------------------------------- span corruption
    Q(
      "p15_span_corruption",
      (s, d) => {
        // T5/UL2-style span-corruption PLANNING: for each document, place
        // n_spans = max(1, ceil-ish of 15% noise density / mean span 3)
        // length-3 mask spans at hash-derived positions (reproducible on
        // retry, never rand()), then measure the realized mask ratio after
        // overlap collapse. All arithmetic is integer; the doubly-exploded
        // position set collapses with one distinct + count per doc.
        val base = Tables.documents(s, d)
          .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
          .filter(col("n_tok") >= 10)
        val planned = base
          .withColumn("n_spans", greatest(lit(1L), expr("n_tok * 15 DIV 300")))
        val positions = planned
          .withColumn("i", explode(expr("sequence(1, n_spans)")))
          .withColumn("start",
            expr("1 + ((doc_id * 7919 + i * 104729) % 1000000007) % (n_tok - 2)"))
          .withColumn("pos", explode(expr("sequence(start, least(start + 2, n_tok))")))
          .select(col("doc_id"), col("pos")).distinct()
        val masked = positions.groupBy(col("doc_id")).agg(count(lit(1)).as("n_masked"))
        planned.join(masked, Seq("doc_id"))
          .select(
            col("doc_id"), col("n_tok"), col("n_spans"), col("n_masked"),
            quant(col("n_masked").cast("double") / col("n_tok"), 1e6).as("mask_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents WHERE len(string_split(text, ' ')) >= 10),
             |planned AS (
             |  SELECT doc_id, n_tok, GREATEST(1, n_tok * 15 // 300) AS n_spans FROM base),
             |st AS (
             |  SELECT doc_id, n_tok, n_spans,
             |    1 + ((doc_id * 7919 + i * 104729) % 1000000007) % (n_tok - 2) AS start
             |  FROM planned, unnest(generate_series(1, n_spans)) AS t(i)),
             |pos AS (
             |  SELECT DISTINCT doc_id, p FROM st,
             |    unnest(generate_series(start, LEAST(start + 2, n_tok))) AS u(p)),
             |m AS (SELECT doc_id, COUNT(*) AS n_masked FROM pos GROUP BY doc_id)
             |SELECT doc_id, n_tok, n_spans, n_masked,
             |  floor(CAST(n_masked AS DOUBLE) / n_tok * 1000000) / 1000000 AS mask_ratio
             |FROM planned JOIN m USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      doc = "T5-style span-corruption planning: hash-placed length-3 mask spans at " +
        "15% density, realized ratio after overlap collapse — integer arithmetic, " +
        "reproducible on retry, one distinct + one aggregate"
    ),
    // ---------------------------------------------------------------- p16
    Q(
      "p16_temperature_mixture",
      (s, d) => {
        // Temperature-scaled mixture rebalancing (the multilingual-training
        // sampling law): source weights w_i ∝ n_i^tau with tau=0.5 flatten
        // the size distribution, then each source is sampled toward a
        // half-corpus target at rate (w_i/W)·(N/2)/n_i. Parity discipline:
        // sqrt is IEEE-correctly-rounded on both engines, it's quantized to
        // an integer grid before the normalizer sum (exact long addition,
        // order-free), and the ppm rate is a fixed sequence of IEEE
        // divisions/multiplies both engines replay identically. Acceptance
        // reuses p4/p8's deterministic id-hash bucket — reproducible on
        // retry. Per-source dims broadcast; the corpus sees one map + one
        // aggregate.
        val counts = Tables.documents(s, d)
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
          .withColumn("q", floor(sqrt(col("n").cast("double")) * 1e6).cast("long"))
        val norm = counts.agg(sum(col("q")).as("qsum"), sum(col("n")).as("ntot"))
        val rates = counts.crossJoin(broadcast(norm))
          .withColumn(
            "rate_ppm",
            least(
              lit(1000000L),
              floor(
                (col("q").cast("double") / col("qsum")) *
                  (col("ntot").cast("double") / col("n")) * 500000.0).cast("long")))
          .select(col("source"), col("n"), col("rate_ppm"))
        val bucket = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P) % 1000000L
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .join(broadcast(rates), Seq("source"))
          .withColumn("keep", (bucket < col("rate_ppm")).cast("long"))
          .groupBy(col("source"))
          .agg(
            max(col("n")).as("n_docs"),
            max(col("rate_ppm")).as("rate_ppm"),
            sum(col("keep")).as("n_sampled"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (
             |  SELECT source, COUNT(*) AS n,
             |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT) AS q
             |  FROM documents GROUP BY source),
             |t AS (SELECT CAST(SUM(q) AS BIGINT) AS qsum, CAST(SUM(n) AS BIGINT) AS ntot FROM c),
             |r AS (
             |  SELECT source, n,
             |    LEAST(1000000, CAST(floor(
             |      (CAST(q AS DOUBLE) / qsum) * (CAST(ntot AS DOUBLE) / n) * 500000)
             |      AS BIGINT)) AS rate_ppm
             |  FROM c, t)
             |SELECT d.source, CAST(MAX(r.n) AS BIGINT) AS n_docs,
             |  MAX(r.rate_ppm) AS rate_ppm,
             |  CAST(SUM(CASE WHEN ((d.doc_id % 1000000007) * 654435747) % 1000000007
             |    % 1000000 < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
             |FROM documents d JOIN r USING (source)
             |GROUP BY d.source
             |ORDER BY d.source""".stripMargin),
      doc = "temperature-scaled mixture sampling (w_i ∝ n_i^0.5): grid-quantized " +
        "sqrt weights with an exact integer normalizer, ppm acceptance rates from " +
        "a fixed IEEE-division sequence, deterministic id-hash acceptance — the " +
        "multilingual rebalancing law as one broadcast dim + one corpus aggregate"
    ),
    // ---------------------------------------------------------------- p17
    Q(
      "p17_token_budget_cut",
      (s, d) => {
        // Budget-constrained corpus selection (the "take the best docs until
        // the token budget runs out" pipeline step): rank documents by a
        // quality key, take the global running token sum in rank order, cut
        // at half the corpus' total tokens. The running sum is
        // GlobalOrder.withGroupedRunningSum with NO group — one range
        // shuffle spreads the ordered corpus over all partitions; a
        // whole-corpus `SUM OVER (ORDER BY ...)` window would sort
        // everything in ONE task. Quality key = mean token length in
        // millichars (integer division, order parity exact); doc_id breaks
        // ties so the order is total.
        val docs = Tables.documents(s, d)
          .select(
            col("doc_id"), col("source"),
            size(split(col("text"), lit(" "))).cast("long").as("n_tok"),
            col("n_chars"))
          .withColumn("score", expr("(n_chars * 1000L) div n_tok"))
        val run = graft.ops.GlobalOrder.withGroupedRunningSum(
          docs, "cum_tok", "tot_tok", col("n_tok"),
          Seq.empty, Seq(col("score").desc, col("doc_id")))
        run
          .filter(col("cum_tok") <= expr("tot_tok div 2"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_selected"),
            sum(col("n_tok")).as("tok_selected"),
            min(col("score")).as("min_score"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    (n_chars * 1000) // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
             |  FROM documents),
             |r AS (
             |  SELECT source, n_tok, score,
             |    SUM(n_tok) OVER (ORDER BY score DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum_tok,
             |    SUM(n_tok) OVER () AS tot_tok
             |  FROM t)
             |SELECT source, COUNT(*) AS n_selected,
             |  CAST(SUM(n_tok) AS BIGINT) AS tok_selected,
             |  MIN(score) AS min_score
             |FROM r WHERE cum_tok <= tot_tok // 2
             |GROUP BY source
             |ORDER BY source""".stripMargin),
      doc = "token-budget curriculum cut: quality-ranked docs kept until half the " +
        "corpus' tokens are spent — exact global prefix sum via GlobalOrder " +
        "(range shuffle + driver offsets), never a single-task global window"
    ),
    // ------------------------------------------------------------ p18 neyman
    Q(
      "p18_neyman_allocation",
      (s, d) => {
        // Variance-optimal (Neyman) stratified sampling: the per-stratum
        // budget n_h ∝ N_h·S_h minimizes estimator variance for a fixed
        // total budget — the statistically-right way to subsample a mixed
        // corpus (uniform rates oversample homogeneous strata). Exactness
        // discipline: N_h·S_h = sqrt(N_h·Σx² − (Σx)²) with the radicand in
        // exact DECIMAL(38,0); IEEE sqrt is correctly rounded (unlike
        // ln/exp), so the weight is deterministic — then floor-quantized to
        // integer micro-units so the ACROSS-STRATA total and the allocation
        // (budget·w_h DIV total) are pure integer math, order-free on both
        // engines. Selection inside each stratum is p11's deterministic
        // hash rank. One corpus aggregate + one broadcast + one ranked
        // filter — two data-sized exchanges total.
        import org.apache.spark.sql.expressions.Window
        val d38 = "decimal(38,0)"
        val strata = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast(d38)).as("sx"),
            sum(col("n_chars").cast(d38) * col("n_chars")).as("sxx"))
          .select(
            col("source"), col("n_docs"),
            floor(sqrt((col("n_docs").cast(d38) * col("sxx") - col("sx") * col("sx"))
              .cast("double")) * 1e6).cast("long").as("w_u"))
        val total = strata.agg(sum(col("w_u")).as("tw"))
        val alloc = strata.crossJoin(broadcast(total))
          .select(col("source"), col("n_docs"),
            expr("(100 * w_u) div tw").as("n_alloc"))
        val h = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P)
        val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        val sampled = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"), h.as("h"))
          .withColumn("rk", row_number().over(w))
          .join(broadcast(alloc.select(col("source"), col("n_alloc"))), Seq("source"))
          .filter(col("rk") <= col("n_alloc"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars_sampled"))
        alloc.join(sampled, Seq("source"), "left")
          .select(
            col("source"), col("n_docs"), col("n_alloc"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
            coalesce(col("mean_chars_sampled"), lit(0.0)).as("mean_chars_sampled"))
          .orderBy(col("source"))
      },
      Some("""WITH st AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    SUM(CAST(n_chars AS DECIMAL(38,0))) AS sx,
             |    SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS sxx
             |  FROM documents GROUP BY source),
             |wu AS (
             |  SELECT source, n_docs,
             |    CAST(floor(sqrt(CAST(CAST(n_docs AS DECIMAL(38,0)) * sxx - sx * sx
             |      AS DOUBLE)) * 1000000) AS BIGINT) AS w_u
             |  FROM st),
             |tot AS (SELECT CAST(SUM(w_u) AS BIGINT) AS tw FROM wu),
             |al AS (
             |  SELECT source, n_docs, (100 * w_u) // tw AS n_alloc
             |  FROM wu CROSS JOIN tot),
             |rk AS (
             |  SELECT doc_id, source, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY ((doc_id % 1000000007) * 654435747) % 1000000007, doc_id) AS r
             |  FROM documents),
             |sm AS (
             |  SELECT rk.source, COUNT(*) AS n_sampled,
             |    CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_chars_sampled
             |  FROM rk JOIN al ON rk.source = al.source AND rk.r <= al.n_alloc
             |  GROUP BY rk.source)
             |SELECT al.source, n_docs, CAST(n_alloc AS BIGINT) AS n_alloc,
             |  COALESCE(n_sampled, 0) AS n_sampled,
             |  COALESCE(mean_chars_sampled, 0.0) AS mean_chars_sampled
             |FROM al LEFT JOIN sm ON al.source = sm.source
             |ORDER BY al.source""".stripMargin),
      doc = "Neyman variance-optimal stratified sampling: per-stratum weight " +
        "sqrt(N*Sxx - Sx^2) in exact DECIMAL + correctly-rounded sqrt, integer " +
        "micro-unit allocation (budget*w DIV total), deterministic hash selection"
    ),
    // ---------------------------------------------------------------- p19
    Q(
      "p19_contamination_fraction",
      (s, d) => {
        // Graded contamination report — d13/d17 flag ANY eval overlap; the
        // decision a pipeline actually makes is thresholded on the FRACTION
        // of a doc's distinct n-grams that appear in the eval set (drop at
        // ≥10%, keep-and-log below). Scale shape: the eval shingle set is
        // tiny → broadcast into the train postings; the corpus-side work is
        // one distinct + one per-doc aggregate on doc_id (a single shuffle);
        // the fraction is integer ppm (exact on both engines).
        import org.apache.spark.sql.functions.broadcast
        val sh = graft.functions.TextExpressions.shingles(col("text"), 3)
        val postings = Tables.documents(s, d)
          .filter(size(tokens(col("text"))) >= 3)
          .select(col("doc_id"), explode(sh).as("shingle"))
          .distinct()
        val evalSh = postings.filter(col("doc_id") % 29 === 0)
          .select(col("shingle")).distinct()
        val tr = postings.filter(col("doc_id") % 29 =!= 0)
        val totals = tr.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        val shared = tr.join(broadcast(evalSh), Seq("shingle"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        totals
          .join(shared, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_shingles"),
            coalesce(col("n_shared"), lit(0L)).as("n_shared"))
          .select(
            col("doc_id"), col("n_shingles"), col("n_shared"),
            expr("n_shared * 1000000 DIV n_shingles").as("contam_ppm"))
          .withColumn("drop_doc", col("contam_ppm") >= 100000L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
             |  WHERE len(toks) >= 3),
             |s AS (SELECT doc_id, unnest(sh) AS shingle FROM t),
             |ev AS (SELECT DISTINCT shingle FROM s WHERE doc_id % 29 = 0),
             |tr AS (SELECT doc_id, shingle FROM s WHERE doc_id % 29 <> 0),
             |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id),
             |shr AS (
             |  SELECT tr.doc_id, COUNT(*) AS n_shared
             |  FROM tr JOIN ev ON tr.shingle = ev.shingle
             |  GROUP BY tr.doc_id)
             |SELECT tot.doc_id, n_shingles,
             |  COALESCE(n_shared, 0) AS n_shared,
             |  COALESCE(n_shared, 0) * 1000000 // n_shingles AS contam_ppm,
             |  (COALESCE(n_shared, 0) * 1000000 // n_shingles >= 100000) AS drop_doc
             |FROM tot LEFT JOIN shr ON tot.doc_id = shr.doc_id
             |ORDER BY tot.doc_id""".stripMargin),
      doc = "graded decontamination: per-doc fraction of distinct trigrams " +
        "shared with the eval set (integer ppm), 10% drop threshold — " +
        "broadcast eval postings, one corpus shuffle"
    ),
    // ---------------------------------------------------------------- p20
    Q(
      "p20_dedup_aware_mixture",
      (s, d) => {
        // Dedup-aware mixture accounting: exact-duplicate groups (here the
        // 5-token prefix key, d1's grain) downweight every member by
        // 1/group_size, so a source whose tokens are mostly copies
        // contributes its UNIQUE mass to the mixture, not its raw mass —
        // the deduped-token budget that mixture tuning actually needs.
        // Weights are integer ppm (1000000 DIV group_size): deterministic,
        // order-free, and summable without float drift on both engines.
        // Scale shape: one groupBy on the dedup key (shuffle #1), one
        // per-source rollup (shuffle #2, bounded by #sources).
        val docs = Tables.documents(s, d)
          .select(
            col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_tokens"),
            array_join(slice(tokens(col("text")), 1, 5), " ").as("gkey"))
        val grp = docs.groupBy(col("gkey"))
          .agg(count(lit(1)).as("gsize"))
        docs
          .join(grp, Seq("gkey"))
          .select(
            col("source"), col("n_tokens"),
            expr("1000000 DIV gsize").as("w_ppm"),
            expr("n_tokens * (1000000 DIV gsize)").as("wt_ppm"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("raw_tokens"),
            sum(col("w_ppm")).cast("long").as("eff_docs_ppm"),
            sum(col("wt_ppm")).cast("long").as("eff_tokens_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    array_to_string(string_split(text, ' ')[1:5], ' ') AS gkey
             |  FROM documents),
             |grp AS (SELECT gkey, COUNT(*) AS gsize FROM docs GROUP BY gkey)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
             |  CAST(SUM(1000000 // gsize) AS BIGINT) AS eff_docs_ppm,
             |  CAST(SUM(n_tokens * (1000000 // gsize)) AS BIGINT) AS eff_tokens_ppm
             |FROM docs JOIN grp USING (gkey)
             |GROUP BY source
             |ORDER BY source""".stripMargin),
      doc = "dedup-aware mixture accounting: 1/dup-group-size downweighting " +
        "in integer ppm -> effective docs/tokens per source (the deduped " +
        "token budget for mixture tuning); two bounded shuffles"
    ),
    // ---------------------------------------------------------------- p21
    Q(
      "p21_epoch_repetition",
      (s, d) => {
        // Data-constrained epoch accounting: when the token budget for a
        // source exceeds its unique supply, the pipeline repeats data —
        // published scaling analyses find value decays past ~4 epochs, so
        // repetition is capped and the shortfall reported. All integer:
        // requested = budget·share DIV total (micro-unit allocation, p18's
        // discipline), epochs = ceil-div capped at 4, served = min. Scale
        // shape: ONE aggregate collapses the corpus to per-source supply;
        // everything after runs on #sources rows against broadcast scalars.
        val budget = 3000000L // total token budget for the mix
        val supply = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(size(tokens(col("text"))).cast("long")).as("unique_tokens"))
        val tot = supply.agg(sum(col("unique_tokens")).as("tot"))
        supply.crossJoin(broadcast(tot))
          .select(
            col("source"), col("unique_tokens"),
            expr(s"$budget * unique_tokens DIV tot").as("requested"))
          .select(
            col("source"), col("unique_tokens"), col("requested"),
            least(
              expr("(requested + unique_tokens - 1) DIV unique_tokens"),
              lit(4L)).as("epochs"))
          .select(
            col("source"), col("unique_tokens"), col("requested"), col("epochs"),
            least(col("requested"), col("epochs") * col("unique_tokens")).as("served"))
          .withColumn("shortfall", col("requested") - col("served"))
          .orderBy(col("source"))
      },
      Some("""WITH supply AS (
             |  SELECT source,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS unique_tokens
             |  FROM documents GROUP BY source),
             |t AS (SELECT CAST(SUM(unique_tokens) AS BIGINT) AS tot FROM supply),
             |alloc AS (
             |  SELECT source, unique_tokens,
             |    3000000 * unique_tokens // tot AS requested
             |  FROM supply CROSS JOIN t),
             |ep AS (
             |  SELECT source, unique_tokens, requested,
             |    LEAST((requested + unique_tokens - 1) // unique_tokens, 4) AS epochs
             |  FROM alloc)
             |SELECT source, unique_tokens, requested, epochs,
             |  LEAST(requested, epochs * unique_tokens) AS served,
             |  requested - LEAST(requested, epochs * unique_tokens) AS shortfall
             |FROM ep
             |ORDER BY source""".stripMargin),
      doc = "data-constrained epoch accounting: budget share per source in " +
        "integer micro-allocation, repetition capped at 4 epochs, served/" +
        "shortfall report — one corpus aggregate, then #sources-row math"
    ),
    // ---------------------------------------------------------------- p22
    Q(
      "p22_priority_sample",
      (s, d) => {
        // Weighted priority sampling (Duffield-Lund-Thorup shape): each doc
        // draws a deterministic pseudo-uniform u from a hash of its stable
        // id and gets priority u DIV w (w = its token count), and the k
        // smallest priorities per source are the sample — heavier docs get
        // proportionally smaller priorities, so selection probability tracks
        // weight, yet the draw is pure integer arithmetic (no rand(), no
        // libm): bit-reproducible across retries, engines, and partitionings.
        // Scale shape: one scan computes priorities; per-source top-k is a
        // rank window inside the source partition — no global order.
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
          .select(
            col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("w"))
          .filter(col("w") > 0)
          .select(col("doc_id"), col("source"), col("w"),
            expr("((doc_id % 1000000007) * 654435747) % 1000000007 * 1000 DIV w")
              .as("priority"))
        val ranked = docs.withColumn(
          "rk",
          row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("priority"), col("doc_id"))))
        ranked.filter(col("rk") <= 25)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_sampled"),
            sum(col("w")).as("sampled_tokens"),
            max(col("priority")).as("threshold_priority"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             |    ((doc_id % 1000000007) * 654435747) % 1000000007 * 1000
             |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS priority
             |  FROM documents WHERE len(string_split(text, ' ')) > 0),
             |r AS (
             |  SELECT doc_id, source, w, priority,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rk
             |  FROM docs)
             |SELECT source, COUNT(*) AS n_sampled,
             |  CAST(SUM(w) AS BIGINT) AS sampled_tokens,
             |  CAST(MAX(priority) AS BIGINT) AS threshold_priority
             |FROM r WHERE rk <= 25
             |GROUP BY source
             |ORDER BY source""".stripMargin),
      doc = "weighted priority sampling: integer hash-uniform DIV weight " +
        "priorities, k smallest per source via an in-partition rank window " +
        "— rand()-free weighted selection, reproducible on retry at any scale"
    ),
    // ---------------------------------------------------------------- p23
    Q(
      "p23_pipeline_manifest",
      (s, d) => {
        // The END-TO-END curation run as ONE composed plan — the query a
        // pipeline owner actually submits: quality gate → exact dedup →
        // eval decontamination → deterministic split → per-(source, split)
        // training manifest. Each stage reuses the certified grain of its
        // standalone query (d1's 5-token prefix key, p19's doc_id%29 eval
        // set, p4's id-hash split buckets), so this certifies the stages
        // COMPOSE, not just that each works alone. Scale shape: one corpus
        // scan feeds a single dedup shuffle on the prefix key; the eval key
        // set is tiny → broadcast anti-join; the split is per-row hash
        // math; the manifest aggregate is #sources×3 rows and the global
        // token total broadcasts back as a single-row scalar join.
        import org.apache.spark.sql.functions.broadcast
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            size(tokens(col("text"))).cast("long").as("ntok"),
            array_join(slice(tokens(col("text")), 1, 5), " ").as("pkey"))
          .filter(col("ntok") >= 8 && col("n_chars") >= 50)
        val keepers = base.groupBy(col("pkey")).agg(min(col("doc_id")).as("doc_id"))
        val kept = base.join(keepers, Seq("pkey", "doc_id"))
        val evalKeys = base.filter(col("doc_id") % 29 === 0)
          .select(col("pkey")).distinct()
        val clean = kept.filter(col("doc_id") % 29 =!= 0)
          .join(broadcast(evalKeys), Seq("pkey"), "left_anti")
        val bucket = ((col("doc_id") % lit(P)) * lit(2654435761L % P)) % lit(P) % 100
        val split = clean.select(
          col("source"), col("ntok"),
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
        val tot = split.agg(sum(col("ntok")).as("tot"))
        split
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("split"), col("n_docs"), col("n_tokens"),
            expr("n_tokens * 1000000 DIV tot").as("tok_share_ppm"))
          .orderBy(col("source"), col("split"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
             |    array_to_string(string_split(text, ' ')[1:5], ' ') AS pkey
             |  FROM documents),
             |f AS (SELECT * FROM b WHERE ntok >= 8 AND n_chars >= 50),
             |k AS (SELECT pkey, MIN(doc_id) AS doc_id FROM f GROUP BY pkey),
             |kept AS (SELECT f.* FROM f JOIN k USING (pkey, doc_id)),
             |ev AS (SELECT DISTINCT pkey FROM f WHERE doc_id % 29 = 0),
             |clean AS (
             |  SELECT * FROM kept
             |  WHERE doc_id % 29 <> 0
             |    AND pkey NOT IN (SELECT pkey FROM ev)),
             |sp AS (
             |  SELECT source, ntok,
             |    CASE WHEN ((doc_id % 1000000007) * 654435747) % 1000000007 % 100 < 80 THEN 'train'
             |         WHEN ((doc_id % 1000000007) * 654435747) % 1000000007 % 100 < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM clean),
             |tot AS (SELECT CAST(SUM(ntok) AS BIGINT) AS tot FROM sp)
             |SELECT source, split, COUNT(*) AS n_docs,
             |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
             |  CAST(CAST(SUM(ntok) AS BIGINT) * 1000000 // tot AS BIGINT) AS tok_share_ppm
             |FROM sp, tot
             |GROUP BY source, split, tot
             |ORDER BY source, split""".stripMargin),
      doc = "end-to-end curation manifest: quality gate -> exact dedup (d1 grain) " +
        "-> eval decontamination (p19 eval set, broadcast anti-join) -> " +
        "deterministic hash split (p4 buckets) -> per-(source, split) doc/token " +
        "manifest with ppm shares — the composed pipeline as one plan"
    ),
    // ---------------------------------------------------------------- p24
    Q(
      "p24_quality_curriculum",
      (s, d) => {
        // Curriculum scheduling by GLOBAL quality quantile — order the
        // corpus easiest→hardest (t3's quality score, floor-quantized to
        // integer micro-units so the sort key is exact) and cut it into 4
        // equal-depth phases. The global order comes from GlobalOrder
        // .withRowNumber (range shuffle + broadcast prefix offsets, P-way
        // parallel sort — x15's discipline: NEVER a single-partition
        // window over the corpus); the phase is then pure (rank, n)
        // arithmetic identical to window NTILE. Output: per-(phase,
        // source) doc/token counts + the phase's quality band edges.
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
          .select(
            col("doc_id"), col("source"),
            size(col("toks")).cast("long").as("ntok"),
            (floor(
              (size(array_distinct(col("toks"))).cast("double") / size(col("toks")) * 0.5 +
                (lit(1.0) -
                  size(filter(col("toks"), t => t === "the" || t === "a")).cast("double") /
                    size(col("toks"))) * 0.5) * 1e6)).cast("long").as("q_u"))
        // r19: materialize the scored frame first — repartitionByRange
        // executes its input twice (sampling + shuffle write), and the
        // per-doc tokenize + quality kernel is the query's main compute
        val ranked = graft.ops.GlobalOrder.withRowNumber(
          scored.localCheckpoint(), "rn", col("q_u"), col("doc_id"))
        val n = ranked.agg(count(lit(1)).as("n_total"))
        ranked.crossJoin(broadcast(n))
          .withColumn("phase", expr(
            """CASE WHEN rn <= (n_total % 4) * (n_total DIV 4 + 1)
              |     THEN (rn - 1) DIV (n_total DIV 4 + 1) + 1
              |     ELSE (n_total % 4) + (rn - 1 - (n_total % 4) * (n_total DIV 4 + 1)) DIV (n_total DIV 4) + 1
              |END""".stripMargin))
          .groupBy(col("phase"), col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("n_tokens"),
            min(col("q_u")).as("q_lo"),
            max(col("q_u")).as("q_hi"))
          .orderBy(col("phase"), col("source"))
      },
      Some("""WITH sc AS (
             |  SELECT doc_id, source,
             |    CAST(len(toks) AS BIGINT) AS ntok,
             |    CAST(floor((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5 +
             |      (1.0 - CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)
             |        / len(toks)) * 0.5) * 1000000) AS BIGINT) AS q_u
             |  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)),
             |r AS (
             |  SELECT *, NTILE(4) OVER (ORDER BY q_u, doc_id) AS phase
             |  FROM sc)
             |SELECT phase, source, COUNT(*) AS n_docs,
             |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
             |  MIN(q_u) AS q_lo, MAX(q_u) AS q_hi
             |FROM r
             |GROUP BY phase, source
             |ORDER BY phase, source""".stripMargin),
      doc = "curriculum scheduling by global quality quantile: integer-quantized " +
        "t3 quality key, global order via range shuffle + prefix offsets (never " +
        "a single-partition window), NTILE-identical phase arithmetic, " +
        "per-(phase, source) doc/token schedule with quality band edges"
    ),
    // ---------------------------------------------------------------- p25
    Q(
      "p25_corpus_signature",
      (s, d) => {
        // Run-to-run reproducibility checksum — the cheap invariant two
        // pipeline executions compare to prove they produced the SAME
        // corpus without diffing 100 TB: per source, an ORDER-FREE content
        // signature Σ (fp_doc · (doc_id mod P + 1)) mod P over t5's
        // position-weighted rolling-hash fingerprints. Commutative sum →
        // partition- and retry-order independent; binding each fingerprint
        // to its doc_id catches content swapped BETWEEN ids, which a bare
        // fingerprint sum would miss. One scan + one per-source aggregate;
        // each summand is < P (~1e9), so a long sum is exact up to ~9e9
        // docs per source — shard the key beyond that.
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
          .select(
            col("source"),
            size(col("toks")).cast("long").as("ntok"),
            ((fingerprint(col("toks")) * (col("doc_id") % lit(P) + 1)) % lit(P)).as("term"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("n_tokens"),
            (sum(col("term")) % lit(P)).as("signature"))
          .orderBy(col("source"))
      },
      Some {
        val th = "((length(x)*2654435761 + ascii(x)*131 + ascii(x[-1:])) % 1000000007)"
        s"""WITH t AS (
           |  SELECT source, doc_id,
           |    CAST(len(toks) AS BIGINT) AS ntok,
           |    CAST(list_aggregate(list_transform(toks,
           |      (x, i) -> $th * ((i*1315423911) % 1000000007) % 1000000007),
           |      'sum') % 1000000007 AS BIGINT) AS fp
           |  FROM (SELECT source, doc_id, string_split(text, ' ') AS toks FROM documents))
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           |  CAST(SUM(fp * (doc_id % 1000000007 + 1) % 1000000007)
           |    % 1000000007 AS BIGINT) AS signature
           |FROM t
           |GROUP BY source
           |ORDER BY source""".stripMargin
      },
      doc = "order-free corpus content signature per source (Σ fp·(id+1) mod P " +
        "over rolling-hash fingerprints): the run-to-run reproducibility " +
        "checksum — partition/retry-order independent, id-bound so swapped " +
        "content is caught; one scan + one bounded aggregate"
    ),
    // ---------------------------------------------------------------- p26
    Q(
      "p26_chunk_windows",
      (s, d) => {
        // Retrieval-index chunking — the step between curation and an
        // embedding index: each document splits into 64-token windows with
        // stride 48 (16-token overlap), short tail kept iff >= 8 tokens.
        // The chunk LIST is built in-row (sequence + transform HOFs — no
        // explode of token rows, the corpus-sized fan-out a naive explode
        // would pay); only the per-doc chunk COUNT and boundary stats
        // leave the scan, so the shuffle carries #docs rows, not #chunks.
        // n_chunks = number of window starts 1, 49, 97, ... whose window
        // retains >= 8 tokens: exact integer arithmetic on both engines.
        val ntok = size(tokens(col("text"))).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), ntok.as("ntok"))
          .select(col("source"), col("ntok"),
            // starts k = 0, 48, 96, ... < ntok; keep window iff
            // min(64, ntok - k) >= 8
            when(col("ntok") < 8, lit(0L)).otherwise(
              lit(1L) + floor((col("ntok") - lit(8L)).cast("double") / 48.0).cast("long"))
              .as("n_chunks"),
            least(col("ntok"), lit(64L)).as("first_chunk_tokens"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chunks")).as("n_chunks"),
            sum(col("ntok")).as("n_tokens"),
            (sum(col("n_chunks") * lit(64L)) - sum(col("ntok"))).as("overlap_overhead"),
            max(col("first_chunk_tokens")).as("max_first_chunk"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
             |  FROM documents),
             |c AS (
             |  SELECT source, ntok,
             |    CASE WHEN ntok < 8 THEN 0
             |         ELSE 1 + CAST(floor(CAST(ntok - 8 AS DOUBLE) / 48.0) AS BIGINT)
             |    END AS n_chunks,
             |    LEAST(ntok, 64) AS first_chunk_tokens
             |  FROM t)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
             |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
             |  CAST(SUM(n_chunks * 64) - SUM(ntok) AS BIGINT) AS overlap_overhead,
             |  MAX(first_chunk_tokens) AS max_first_chunk
             |FROM c
             |GROUP BY source
             |ORDER BY source""".stripMargin),
      doc = "retrieval-index chunking accounting: 64-token windows, stride 48, " +
        ">=8-token tail rule — chunk counts from closed-form integer math " +
        "in-row (no per-chunk explode), per-source budget/overlap report"
    ),
    // ---------------------------------------------------------------- p27
    Q(
      "p27_bpe_pair_stats",
      (s, d) => {
        // BPE tokenizer training, first merge iteration: adjacent-symbol
        // pair frequencies over the corpus. The scale trick is the one real
        // BPE trainers use — collapse the corpus to its DISTINCT-WORD
        // frequency table first (|types| << |tokens|, map-side combine does
        // the heavy lifting), then enumerate character pairs once per TYPE
        // and weight by the type's corpus frequency. Pair space is bounded
        // by alphabet², so the final aggregate is tiny no matter the corpus
        // size; repeated pairs inside a word ("aaa" -> "aa" twice) count
        // per position, exactly as the merge rule scores them.
        val words = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("word"))
          .filter(length(col("word")) >= 2)
        val wf = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
        val pairs = wf.select(col("word"), col("freq"),
          explode(transform(
            sequence(lit(1), length(col("word")) - 1),
            i => col("word").substr(i, lit(2)))).as("pair"))
        pairs
          .groupBy(col("pair"))
          .agg(
            countDistinct(col("word")).as("n_word_types"),
            sum(col("freq")).as("total_count"))
          .orderBy(col("total_count").desc, col("pair"))
          .limit(30)
      },
      Some("""WITH w AS (
             |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
             |wf AS (
             |  SELECT word, COUNT(*) AS freq FROM w WHERE len(word) >= 2 GROUP BY word),
             |p AS (
             |  SELECT word, freq,
             |    unnest(list_transform(generate_series(1, len(word) - 1),
             |      i -> substring(word, i, 2))) AS pair
             |  FROM wf)
             |SELECT pair,
             |  CAST(COUNT(DISTINCT word) AS BIGINT) AS n_word_types,
             |  CAST(SUM(freq) AS BIGINT) AS total_count
             |FROM p
             |GROUP BY pair
             |ORDER BY total_count DESC, pair
             |LIMIT 30""".stripMargin),
      doc = "BPE first-merge pair statistics: corpus collapses to the distinct-" +
        "word frequency table (map-side combine), char pairs enumerate once per " +
        "TYPE weighted by corpus freq — the aggregate every real tokenizer " +
        "trainer runs; pair space bounded by alphabet2"
    )
  )
}
