package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-8 second continuation wave: ingestion-lateness watermark audit
  * (q249), split-conformal coverage calibration (q250), and held-out
  * cross-entropy language-model evaluation (q251). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries27 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q249: ingestion-lateness audit — the measurement that SIZES every
    // watermark in the streaming surface (the 2-hour delay in
    // EventStreams is an assumption; this query is how you'd check it).
    // Arrival is modeled as K=4 ingestion shards (user_id mod 4), each
    // delivering its own events in event-time order but lagging the
    // fastest shard by shard*30 s — the Kafka-partition-skew shape that
    // actually produces late data. An event's lateness is then
    // running_max(event time) over ARRIVAL order minus its own event
    // time: exactly the quantity a watermark must exceed to admit it.
    // The running max over a global order is NOT a single-partition
    // window: the q35 two-pass prefix discipline — per-hour-block
    // running max (blocks partition and distribute) plus a prefix max
    // over the bounded block frame, combined per row. Output per shard:
    // max/p99 lateness (p99 EXACT via the cumulative-count walk over
    // the bounded lateness-seconds grid, the q228 discipline) and the
    // admit/drop split a 60 s watermark would produce.
    Q(
      "q249_lateness_audit",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            (col("user_id") % 4).as("shard"))
          .withColumn("arr_us", col("ts_us") + col("shard") * lit(30000000L))
          .withColumn("blk", expr("arr_us div 3600000000"))
        val wIn = Window.partitionBy("blk").orderBy("arr_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // prefix max over STRICTLY earlier blocks — the block frame is
        // hours-of-history-sized, never data-sized
        val wPrev = Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prev = e.groupBy("blk").agg(max("ts_us").as("bmax"))
          .withColumn("pmax", max("bmax").over(wPrev))
          .select(col("blk"), col("pmax"))
        val late = e
          .withColumn("rin", max("ts_us").over(wIn))
          .join(broadcast(prev), Seq("blk"))
          .withColumn("runmax",
            greatest(col("rin"), coalesce(col("pmax"), lit(Long.MinValue))))
          .withColumn("late_us", col("runmax") - col("ts_us"))
          .withColumn("late_s", expr("late_us div 1000000"))
        val grid = late.groupBy("shard", "late_s").agg(count(lit(1)).as("c"))
        val wg = Window.partitionBy("shard").orderBy("late_s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy("shard")
        val p99 = grid.withColumn("cum", sum("c").over(wg))
          .withColumn("n", sum("c").over(wt))
          .where(col("cum") * 100 >= col("n") * 99)
          .groupBy("shard").agg(min("late_s").as("p99_late_s"))
        late.groupBy("shard")
          .agg(count(lit(1)).as("n_events"),
            max("late_s").as("max_late_s"),
            sum(when(col("late_us") > 60000000L, 1L).otherwise(0L))
              .as("n_drop_60s"))
          .join(p99, "shard")
          .select(col("shard").cast("long").as("shard"),
            col("n_events").cast("long").as("n_events"),
            col("max_late_s").cast("long").as("max_late_s"),
            col("p99_late_s").cast("long").as("p99_late_s"),
            col("n_drop_60s").cast("long").as("n_drop_60s"),
            Rounding.stableRound6(col("n_drop_60s").cast("double") /
              col("n_events").cast("double")).as("drop_rate_60s"))
          .orderBy("shard")
      },
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id % 4 AS shard, epoch_us(ts) AS ts_us,
             |    epoch_us(ts) + (user_id % 4) * 30000000 AS arr_us
             |  FROM events),
             |l AS (
             |  SELECT shard,
             |    max(ts_us) OVER (ORDER BY arr_us, event_id) - ts_us
             |      AS late_us
             |  FROM e),
             |d AS (SELECT shard, late_us, late_us // 1000000 AS late_s FROM l),
             |grid AS (SELECT shard, late_s, count(*) AS c FROM d GROUP BY 1, 2),
             |cum AS (
             |  SELECT shard, late_s,
             |    sum(c) OVER (PARTITION BY shard ORDER BY late_s) AS cum,
             |    sum(c) OVER (PARTITION BY shard) AS n
             |  FROM grid),
             |p99 AS (
             |  SELECT shard, min(late_s) AS p99_late_s FROM cum
             |  WHERE cum * 100 >= n * 99 GROUP BY 1),
             |agg AS (
             |  SELECT shard, count(*) AS n_events, max(late_s) AS max_late_s,
             |    sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
             |      AS n_drop_60s
             |  FROM d GROUP BY 1)
             |SELECT agg.shard, CAST(n_events AS BIGINT) AS n_events,
             |  CAST(max_late_s AS BIGINT) AS max_late_s,
             |  CAST(p99_late_s AS BIGINT) AS p99_late_s,
             |  CAST(n_drop_60s AS BIGINT) AS n_drop_60s,
             |  ${Rounding.duckSql("n_drop_60s::DOUBLE / n_events::DOUBLE")}
             |    AS drop_rate_60s
             |FROM agg JOIN p99 ON agg.shard = p99.shard
             |ORDER BY agg.shard""".stripMargin)),

    // ------------------------------------------------------------------
    // q250: split-conformal coverage — the distribution-free prediction-
    // interval recipe (Vovk; Angelopoulos & Bates' gentle-introduction
    // form): hash-split a calibration slice, take the k-th smallest
    // calibration nonconformity score with k = ceil((n+1)(1−α)) as the
    // threshold, and audit the guaranteed ≥1−α coverage on the disjoint
    // test slice. Score here is the doc's n_chars (a one-sided upper
    // interval on document size — the same machinery carries any model
    // score). The order statistic is EXACT and distributed: cumulative
    // counts over the DISTINCT score grid (domain-bounded, the q228
    // discipline), never a global sort of the data; membership is the
    // q55 salted-hash split, a pure function of doc_id. All outputs
    // integer except the one audited ratio.
    Q(
      "q250_conformal_coverage",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("calib", Sampling.bucket(col("doc_id"), "conf27") < 2000)
        val cal = d.where(col("calib"))
        val nCal = cal.agg(count(lit(1)).as("n_calib"))
        val wg = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // cum ≥ ceil(0.9·(n+1)) ⟺ 10·cum ≥ 9·(n+1) for integer cum
        val thr = cal.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(wg))
          .crossJoin(broadcast(nCal))
          .where(col("cum") * 10 >= (col("n_calib") + 1) * 9)
          .agg(min("n_chars").as("threshold"))
        d.where(!col("calib"))
          .crossJoin(broadcast(thr))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("n_chars") <= col("threshold"), 1L).otherwise(0L))
              .as("n_covered"),
            first("threshold").as("threshold"))
          .crossJoin(broadcast(nCal))
          .select(col("n_calib").cast("long").as("n_calib"),
            expr("(9 * (n_calib + 1) + 9) div 10").as("k"),
            col("threshold").cast("long").as("threshold"),
            col("n_test").cast("long").as("n_test"),
            col("n_covered").cast("long").as("n_covered"),
            Rounding.stableRound6(col("n_covered").cast("double") /
              col("n_test").cast("double")).as("coverage"))
          .orderBy("n_calib")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, n_chars,
             |    ${Sampling.bucketDuckSql("conf27", "doc_id")} < 2000 AS calib
             |  FROM documents),
             |nc AS (SELECT count(*) AS n_calib FROM d WHERE calib),
             |grid AS (
             |  SELECT n_chars, count(*) AS c FROM d WHERE calib GROUP BY 1),
             |cum AS (
             |  SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cum
             |  FROM grid),
             |thr AS (
             |  SELECT min(n_chars) AS threshold
             |  FROM cum CROSS JOIN nc WHERE cum * 10 >= (n_calib + 1) * 9),
             |tst AS (
             |  SELECT count(*) AS n_test,
             |    sum(CASE WHEN n_chars <= threshold THEN 1 ELSE 0 END)
             |      AS n_covered,
             |    any_value(threshold) AS threshold
             |  FROM d CROSS JOIN thr WHERE NOT calib)
             |SELECT CAST(n_calib AS BIGINT) AS n_calib,
             |  (9 * (n_calib + 1) + 9) // 10 AS k,
             |  CAST(threshold AS BIGINT) AS threshold,
             |  CAST(n_test AS BIGINT) AS n_test,
             |  CAST(n_covered AS BIGINT) AS n_covered,
             |  ${Rounding.duckSql("n_covered::DOUBLE / n_test::DOUBLE")}
             |    AS coverage
             |FROM tst CROSS JOIN nc
             |ORDER BY n_calib""".stripMargin)),

    // ------------------------------------------------------------------
    // q251: held-out cross-entropy — the EVALUATION twin of the q94/q110
    // scoring queries (those score docs under a model fit on the whole
    // corpus; an eval needs the model fit on a disjoint split): per
    // language, an add-one-smoothed unigram LM is trained on the 80%
    // hash-split and evaluated on the held-out 20% — mean NLL per token
    // with unseen words folded into a single UNK class, p(w) =
    // (c_w + 1) / (N_l + V_l + 1), plus the OOV rate (the tokenizer/
    // coverage health signal). Per-token NLL snaps to the 1e-6 LONG grid
    // BEFORE summation (the q235 discipline — exact integer sums, one
    // final division), so distributed sum order cannot drift the mean.
    // Scale shape: the count table is vocabulary-sized; the held-out
    // join builds its hash side from that vocab table (shuffle-hash,
    // never a data-sized sort), and the per-lang totals broadcast.
    Q(
      "q251_heldout_xent",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .withColumn("train", Sampling.bucket(col("doc_id"), "xent27") < 8000)
          .select(col("lang"), col("train"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
          .localCheckpoint()
        val cnt = toks.where(col("train")).groupBy("lang", "w")
          .agg(count(lit(1)).as("c"))
        val tr = cnt.groupBy("lang")
          .agg(sum("c").as("n_train"), count(lit(1)).as("vocab"))
        toks.where(!col("train"))
          .join(cnt.hint("shuffle_hash"), Seq("lang", "w"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .join(broadcast(tr), "lang")
          .withColumn("nll6", floor(-log((col("c") + lit(1L)).cast("double") /
            (col("n_train") + col("vocab") + lit(1L)).cast("double")) *
            lit(1000000.0) + lit(0.5)).cast("long"))
          .groupBy("lang")
          .agg(first("n_train").as("n_train_tokens"),
            first("vocab").as("vocab"),
            count(lit(1)).as("n_heldout_tokens"),
            sum(when(col("c") === 0L, 1L).otherwise(0L)).as("n_oov"),
            sum("nll6").as("snll"))
          .select(col("lang"),
            col("n_train_tokens").cast("long").as("n_train_tokens"),
            col("vocab").cast("long").as("vocab"),
            col("n_heldout_tokens").cast("long").as("n_heldout_tokens"),
            col("n_oov").cast("long").as("n_oov"),
            Rounding.stableRound6(col("n_oov").cast("double") /
              col("n_heldout_tokens").cast("double")).as("oov_rate"),
            Rounding.stableRound6(col("snll").cast("double") /
              (col("n_heldout_tokens").cast("double") * lit(1000000.0)))
              .as("mean_nll"))
          .orderBy("lang")
      },
      Some(s"""WITH toks AS (
             |  SELECT lang,
             |    ${Sampling.bucketDuckSql("xent27", "doc_id")} < 8000 AS train,
             |    unnest(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> '')) AS w
             |  FROM documents),
             |cnt AS (
             |  SELECT lang, w, count(*) AS c FROM toks WHERE train
             |  GROUP BY 1, 2),
             |tr AS (
             |  SELECT lang, sum(c) AS n_train, count(*) AS vocab
             |  FROM cnt GROUP BY 1),
             |held AS (
             |  SELECT t.lang, coalesce(cnt.c, 0) AS c, tr.n_train, tr.vocab
             |  FROM toks t
             |  LEFT JOIN cnt ON cnt.lang = t.lang AND cnt.w = t.w
             |  JOIN tr ON tr.lang = t.lang
             |  WHERE NOT t.train),
             |scored AS (
             |  SELECT lang, c,  n_train, vocab,
             |    CAST(floor(-ln((c + 1)::DOUBLE /
             |      (n_train + vocab + 1)::DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |      AS nll6
             |  FROM held)
             |SELECT lang,
             |  CAST(any_value(n_train) AS BIGINT) AS n_train_tokens,
             |  CAST(any_value(vocab) AS BIGINT) AS vocab,
             |  CAST(count(*) AS BIGINT) AS n_heldout_tokens,
             |  CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_oov,
             |  ${Rounding.duckSql(
                  "sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::DOUBLE / " +
                  "count(*)::DOUBLE")} AS oov_rate,
             |  ${Rounding.duckSql(
                  "sum(nll6)::DOUBLE / (count(*)::DOUBLE * 1000000)")}
             |    AS mean_nll
             |FROM scored GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q252: tokenizer fertility by language — the multilingual tokenizer
    // audit (chars per token, BYTES per token, tokens per doc) that
    // decides whether a tokenizer under-serves a language: CJK text
    // yields few whitespace tokens of many bytes each, so its
    // bytes-per-token fertility blows up exactly where BPE vocabularies
    // underallocate. Tokens here are WHITESPACE splits of the raw text
    // (not Text.words' ASCII-only cleaner, which would zero out zh and
    // poison the ratio); bytes are UTF-8 octets. One shuffle-free scan
    // folding to a languages-sized frame; every ratio is a division of
    // exact integer sums on the stableRound6 grid.
    Q(
      "q252_tokenizer_fertility",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("lang"), col("n_chars"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            size(filter(split(col("text"), "\\s+"),
              t => t =!= lit(""))).cast("long").as("n_tokens"))
          .where(col("n_tokens") > 0)
        d.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("tokens"),
            sum("n_chars").as("chars"),
            sum("n_bytes").as("bytes"))
          .select(col("lang"), col("n_docs").cast("long").as("n_docs"),
            col("tokens").cast("long").as("tokens"),
            col("chars").cast("long").as("chars"),
            col("bytes").cast("long").as("bytes"),
            Rounding.stableRound6(col("chars").cast("double") /
              col("tokens").cast("double")).as("chars_per_token"),
            Rounding.stableRound6(col("bytes").cast("double") /
              col("tokens").cast("double")).as("bytes_per_token"),
            Rounding.stableRound6(col("tokens").cast("double") /
              col("n_docs").cast("double")).as("tokens_per_doc"))
          .orderBy("lang")
      },
      Some(s"""WITH d AS (
             |  SELECT lang, n_chars,
             |    octet_length(encode(text))::BIGINT AS n_bytes,
             |    len(list_filter(string_split_regex(text, '\\s+'),
             |      t -> t <> ''))::BIGINT AS n_tokens
             |  FROM documents)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS chars,
             |  CAST(sum(n_bytes) AS BIGINT) AS bytes,
             |  ${Rounding.duckSql("sum(n_chars)::DOUBLE / sum(n_tokens)::DOUBLE")}
             |    AS chars_per_token,
             |  ${Rounding.duckSql("sum(n_bytes)::DOUBLE / sum(n_tokens)::DOUBLE")}
             |    AS bytes_per_token,
             |  ${Rounding.duckSql("sum(n_tokens)::DOUBLE / count(*)::DOUBLE")}
             |    AS tokens_per_doc
             |FROM d WHERE n_tokens > 0
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q253: Benford first-digit audit — the fraud/synthetic-data check
    // on the money column: naturally-occurring multiplicative amounts
    // follow P(d) = log10(1 + 1/d); a generator that draws uniforms (or
    // a pipeline bug that truncates) shows up as a flat or spiked digit
    // histogram. First digit extracted in EXACT integer arithmetic
    // (leading char of the integer-cents decimal string — never float
    // log10 on data), counts densified over all 9 digits; the only
    // doubles are the observed share, the closed-form expectation, and
    // their gap, all on the stableRound6 grid. One scan to a 9-row
    // frame.
    Q(
      "q253_benford_audit",
      (s, dir) => {
        val digits = Tables.load(s, dir, "orders")
          .select(substring(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("c"))
        val tot = Window.partitionBy()
        val s9 = s.range(1, 10).select(col("id").as("digit"))
        s9.join(digits, Seq("digit"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("share_raw",
            col("c").cast("double") / sum("c").over(tot).cast("double"))
          .withColumn("expected_raw",
            log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
              log(lit(10.0)))
          .select(col("digit"), col("c").cast("long").as("n"),
            Rounding.stableRound6(col("share_raw")).as("share"),
            Rounding.stableRound6(col("expected_raw")).as("expected"),
            Rounding.stableRound6(abs(col("share_raw") -
              col("expected_raw"))).as("abs_gap"))
          .orderBy("digit")
      },
      Some(s"""WITH digits AS (
             |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |    count(*) AS c
             |  FROM orders GROUP BY 1),
             |dense AS (
             |  SELECT g.digit, coalesce(digits.c, 0) AS c
             |  FROM (SELECT unnest(range(1, 10)) AS digit) g
             |  LEFT JOIN digits ON digits.digit = g.digit),
             |sh AS (
             |  SELECT digit, c,
             |    c::DOUBLE / (sum(c) OVER ())::DOUBLE AS share_raw,
             |    ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0) AS expected_raw
             |  FROM dense)
             |SELECT digit, CAST(c AS BIGINT) AS n,
             |  ${Rounding.duckSql("share_raw")} AS share,
             |  ${Rounding.duckSql("expected_raw")} AS expected,
             |  ${Rounding.duckSql("abs(share_raw - expected_raw)")} AS abs_gap
             |FROM sh
             |ORDER BY digit""".stripMargin)),

    // ------------------------------------------------------------------
    // q254: byte-weighted quantiles — "half the BYTES live in docs
    // larger than X" is a different (and for storage/packing planning,
    // the right) question than "half the DOCS are larger than X": the
    // weighted median/p90 of document size with the doc's own size as
    // weight, next to the unweighted median for contrast. Exact order
    // statistics via cumulative weight over the per-source DISTINCT
    // size grid (domain-bounded, the q228/q250 discipline) — integer
    // comparisons 2·cum ≥ W and 10·cum ≥ 9·W, no interpolation, no
    // data-sized sort. Per-source windows distribute across sources.
    Q(
      "q254_weighted_quantiles",
      (s, dir) => {
        val grid = Tables.load(s, dir, "documents")
          .groupBy("source", "n_chars")
          .agg(count(lit(1)).as("cnt"),
            sum("n_chars").as("w"))
        val wg = Window.partitionBy("source").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy("source")
        val cum = grid
          .withColumn("cumc", sum("cnt").over(wg))
          .withColumn("cumw", sum("w").over(wg))
          .withColumn("n", sum("cnt").over(wt))
          .withColumn("tw", sum("w").over(wt))
        cum.groupBy("source")
          .agg(first("n").as("n_docs"), first("tw").as("total_chars"),
            min(when(col("cumc") * 2 >= col("n"), col("n_chars")))
              .as("median_chars"),
            min(when(col("cumw") * 2 >= col("tw"), col("n_chars")))
              .as("wmedian_chars"),
            min(when(col("cumw") * 10 >= col("tw") * 9, col("n_chars")))
              .as("wp90_chars"))
          .select(col("source"), col("n_docs").cast("long").as("n_docs"),
            col("total_chars").cast("long").as("total_chars"),
            col("median_chars").cast("long").as("median_chars"),
            col("wmedian_chars").cast("long").as("wmedian_chars"),
            col("wp90_chars").cast("long").as("wp90_chars"))
          .orderBy("source")
      },
      Some(s"""WITH grid AS (
             |  SELECT source, n_chars, count(*) AS cnt,
             |    sum(n_chars) AS w
             |  FROM documents GROUP BY 1, 2),
             |cum AS (
             |  SELECT source, n_chars,
             |    sum(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cumc,
             |    sum(w) OVER (PARTITION BY source ORDER BY n_chars) AS cumw,
             |    sum(cnt) OVER (PARTITION BY source) AS n,
             |    sum(w) OVER (PARTITION BY source) AS tw
             |  FROM grid)
             |SELECT source, CAST(any_value(n) AS BIGINT) AS n_docs,
             |  CAST(any_value(tw) AS BIGINT) AS total_chars,
             |  CAST(min(CASE WHEN cumc * 2 >= n THEN n_chars END) AS BIGINT)
             |    AS median_chars,
             |  CAST(min(CASE WHEN cumw * 2 >= tw THEN n_chars END) AS BIGINT)
             |    AS wmedian_chars,
             |  CAST(min(CASE WHEN cumw * 10 >= tw * 9 THEN n_chars END)
             |    AS BIGINT) AS wp90_chars
             |FROM cum GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q255: Spearman rank correlation — the robust (monotone-invariant)
    // complement to the Pearson members of the correlation family (q127
    // per-group OLS, q191 lag correlation): per language, rho between
    // document size and vocabulary richness (distinct words). Ranks are
    // MIDRANKS with exact tie handling, kept integer by doubling:
    // 2·midrank = 2·cum_before + cnt + 1, computed over the per-lang
    // DISTINCT value grid (the q250/q254 discipline — never a
    // data-sized sort); the doc stream then joins its two rank columns
    // back on (lang, value). Closed-form Pearson on the integer 2·rank
    // sums: every aggregate is an exact LONG, one final double formula
    // on the stableRound6 grid. (Integer headroom: Σ(2r)² ≤ 4n³ —
    // exact in int64 up to ~10^6 rows per group; past that the sums
    // promote to DECIMAL(38) with the same plan shape.)
    Q(
      "q255_spearman",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars").as("x"),
            size(array_distinct(Text.words(Text.clean(col("text")))))
              .cast("long").as("y"))
          .localCheckpoint()
        def ranks(vcol: String, rcol: String) = {
          val wg = Window.partitionBy("lang").orderBy(vcol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          docs.groupBy("lang", vcol).agg(count(lit(1)).as("cnt"))
            .withColumn("cum", sum("cnt").over(wg))
            .select(col("lang"), col(vcol),
              (col("cum") * 2 - col("cnt") + 1).as(rcol))
        }
        docs
          .join(ranks("x", "rx2"), Seq("lang", "x"))
          .join(ranks("y", "ry2"), Seq("lang", "y"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("rx2").as("sx"), sum("ry2").as("sy"),
            sum(col("rx2") * col("ry2")).as("sxy"),
            sum(col("rx2") * col("rx2")).as("sxx"),
            sum(col("ry2") * col("ry2")).as("syy"))
          .select(col("lang"), col("n").cast("long").as("n"),
            Rounding.stableRound6(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))).as("rho"))
          .orderBy("lang")
      },
      Some(s"""WITH docs AS (
             |  SELECT lang, doc_id, n_chars AS x,
             |    len(list_distinct(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> '')))::BIGINT AS y
             |  FROM documents),
             |rx AS (
             |  SELECT lang, x,
             |    2 * sum(cnt) OVER (PARTITION BY lang ORDER BY x)
             |      - cnt + 1 AS rx2
             |  FROM (SELECT lang, x, count(*) AS cnt FROM docs GROUP BY 1, 2)),
             |ry AS (
             |  SELECT lang, y,
             |    2 * sum(cnt) OVER (PARTITION BY lang ORDER BY y)
             |      - cnt + 1 AS ry2
             |  FROM (SELECT lang, y, count(*) AS cnt FROM docs GROUP BY 1, 2)),
             |j AS (
             |  SELECT d.lang, rx.rx2, ry.ry2
             |  FROM docs d
             |  JOIN rx ON rx.lang = d.lang AND rx.x = d.x
             |  JOIN ry ON ry.lang = d.lang AND ry.y = d.y),
             |agg AS (
             |  SELECT lang, count(*) AS n, sum(rx2) AS sx, sum(ry2) AS sy,
             |    sum(rx2 * ry2) AS sxy, sum(rx2 * rx2) AS sxx,
             |    sum(ry2 * ry2) AS syy
             |  FROM j GROUP BY 1)
             |SELECT lang, CAST(n AS BIGINT) AS n,
             |  ${Rounding.duckSql(
                  "(n * sxy - sx * sy)::DOUBLE / " +
                  "sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE)")}
             |    AS rho
             |FROM agg
             |ORDER BY lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q256: Count-Min sketch — completes the frequency-sketch trio
    // (q93 Misra-Gries tracks the heavy SET, q206/q220 HLL counts
    // distincts; CM answers point frequency queries for ANY key in
    // w·d counters). d=4 rows × w=1024 columns, cell = squared-PolyHash
    // (the Sampling mixing rule) of 'cm<row>#'||word; the sketch is ONE
    // map-side-combined aggregate to a 4096-cell frame — the mergeable,
    // fixed-size state a 100 TB stream keeps where exact counts need
    // vocabulary-sized state. Estimates (min over the 4 row cells) are
    // audited for the 20 highest-df words against their exact counts;
    // the sketch is fully deterministic, so the ORACLE REPLAYS the
    // whole construction and the gate compares estimates EXACTLY — no
    // tolerance booleans (overestimate = same-cell collision mass,
    // identical in both engines by construction).
    Q(
      "q256_count_min",
      (s, dir) => {
        val P = graft.functions.PolyHash.Mod
        val toks = Tables.load(s, dir, "documents")
          .select(explode(Text.words(Text.clean(col("text")))).as("w"))
          .localCheckpoint()
        def cell(w: org.apache.spark.sql.Column,
                 j: org.apache.spark.sql.Column) = {
          val h = graft.functions.PolyHash(
            concat(lit("cm"), j.cast("string"), lit("#"), w))
          h * h % P % 1024
        }
        val sketch = toks
          .select(col("w"), explode(sequence(lit(0), lit(3))).as("j"))
          .select(col("j"), cell(col("w"), col("j")).as("cell"))
          .groupBy("j", "cell").agg(count(lit(1)).as("c"))
        val top = toks.groupBy("w").agg(count(lit(1)).as("exact"))
          .orderBy(desc("exact"), col("w")).limit(20)
        top.select(col("w"), col("exact"),
            explode(sequence(lit(0), lit(3))).as("j"))
          .withColumn("cell", cell(col("w"), col("j")))
          .join(broadcast(sketch), Seq("j", "cell"))
          .groupBy("w")
          .agg(first("exact").as("exact"), min("c").as("est"))
          .select(col("w"), col("exact").cast("long").as("exact"),
            col("est").cast("long").as("est"),
            (col("est") - col("exact")).cast("long").as("overcount"))
          .orderBy(desc("exact"), col("w"))
      },
      Some({
        val P = graft.functions.PolyHash.Mod
        def cellSql(wExpr: String) = {
          val h = graft.functions.PolyHash.duckSql(
            s"'cm' || j::VARCHAR || '#' || $wExpr")
          s"(($h) * ($h) % $P) % 1024"
        }
        s"""WITH toks AS (
           |  SELECT unnest(list_filter(string_split(
           |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
           |    w -> w <> '')) AS w
           |  FROM documents),
           |cells AS (
           |  SELECT j, ${cellSql("w")} AS cell
           |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS j)),
           |sketch AS (
           |  SELECT j, cell, count(*) AS c FROM cells GROUP BY 1, 2),
           |top AS (
           |  SELECT w, count(*) AS exact FROM toks GROUP BY 1
           |  ORDER BY exact DESC, w LIMIT 20),
           |probe AS (
           |  SELECT w, exact, j, ${cellSql("w")} AS cell
           |  FROM top CROSS JOIN (SELECT unnest(range(4)) AS j)),
           |est AS (
           |  SELECT probe.w, any_value(probe.exact) AS exact,
           |    min(sketch.c) AS est
           |  FROM probe JOIN sketch
           |    ON sketch.j = probe.j AND sketch.cell = probe.cell
           |  GROUP BY probe.w)
           |SELECT w, CAST(exact AS BIGINT) AS exact,
           |  CAST(est AS BIGINT) AS est,
           |  CAST(est - exact AS BIGINT) AS overcount
           |FROM est
           |ORDER BY exact DESC, w""".stripMargin
      })),

    // ------------------------------------------------------------------
    // q257: Poisson bootstrap — uncertainty for corpus-level statistics
    // WITHOUT resampling passes: the classic multinomial bootstrap needs
    // B full resamples; the Poisson approximation gives each row an
    // independent pseudo-Poisson(1) weight per replicate, so all B=32
    // replicate estimates fold out of ONE scan (explode + map-side
    // partial aggregation — the shuffle carries 32 rows per partition,
    // never 32× the data). Weights are DETERMINISTIC: the squared-
    // PolyHash bucket of ('boot<b>#'||doc_id) inverse-CDF-mapped through
    // the Poisson(1) pmf on a 1/10000 grid, so both engines draw
    // identical weights. Replicate means snap to the 1e-6 LONG grid
    // before the spread statistics (exact integer arithmetic over the
    // 32-row frame): bootstrap SE plus the percentile interval at
    // ranks ceil(0.025·B)=1 and B.
    Q(
      "q257_poisson_bootstrap",
      (s, dir) => {
        val P = graft.functions.PolyHash.Mod
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            explode(sequence(lit(0), lit(31))).as("b"))
        val h = graft.functions.PolyHash(
          concat(lit("boot"), col("b").cast("string"), lit("#"),
            col("doc_id").cast("string")))
        val u = h * h % P % 10000
        // inverse CDF of Poisson(1) on the 1/10000 grid:
        // cum pmf·10000 = 3679, 7358, 9197, 9810, 9963, 9994, 9999
        val wgt = when(u < 3679, 0L).when(u < 7358, 1L).when(u < 9197, 2L)
          .when(u < 9810, 3L).when(u < 9963, 4L).when(u < 9994, 5L)
          .when(u < 9999, 6L).otherwise(7L)
        val reps = d.withColumn("wgt", wgt)
          .groupBy("b")
          .agg(sum(col("wgt") * col("n_chars")).as("sw"),
            sum("wgt").as("w"))
          .withColumn("est6", floor(col("sw").cast("double") /
            col("w").cast("double") * lit(1000000.0) + lit(0.5))
            .cast("long"))
        val point = Tables.load(s, dir, "documents")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sc"))
        // est6 ~ 3e8, so Σest6² ~ 3e18 fits int64 but (Σest6)² ~ 9e19
        // does not — the spread arithmetic runs in decimal(38,0)
        // (DuckDB's integer sums are HUGEINT already)
        val e6d = col("est6").cast("decimal(38,0)")
        reps.agg(count(lit(1)).as("b_reps"),
            sum(e6d).as("se1"), sum(e6d * e6d).as("se2"),
            min("est6").as("lo6"), max("est6").as("hi6"))
          .crossJoin(broadcast(point))
          .select(col("n_docs").cast("long").as("n_docs"),
            Rounding.stableRound6(col("sc").cast("double") /
              col("n_docs").cast("double")).as("mean_chars"),
            col("b_reps").cast("long").as("b_reps"),
            Rounding.stableRound6(
              sqrt((col("b_reps").cast("decimal(38,0)") * col("se2") -
                col("se1") * col("se1")).cast("double") /
                (col("b_reps") * (col("b_reps") - 1)).cast("double")) /
                lit(1000000.0)).as("boot_se"),
            (col("lo6").cast("double") / lit(1000000.0)).as("ci_lo"),
            (col("hi6").cast("double") / lit(1000000.0)).as("ci_hi"))
          .orderBy("n_docs")
      },
      Some({
        val P = graft.functions.PolyHash.Mod
        val h = graft.functions.PolyHash.duckSql(
          "'boot' || b::VARCHAR || '#' || doc_id::VARCHAR")
        s"""WITH d AS (
           |  SELECT doc_id, n_chars, b,
           |    (($h) * ($h) % $P) % 10000 AS u
           |  FROM documents CROSS JOIN (SELECT unnest(range(32)) AS b)),
           |wts AS (
           |  SELECT b, n_chars,
           |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
           |      WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
           |      WHEN u < 9963 THEN 4 WHEN u < 9994 THEN 5
           |      WHEN u < 9999 THEN 6 ELSE 7 END AS wgt
           |  FROM d),
           |reps AS (
           |  SELECT b,
           |    CAST(floor(sum(wgt * n_chars)::DOUBLE / sum(wgt)::DOUBLE
           |      * 1000000 + 0.5) AS BIGINT) AS est6
           |  FROM wts GROUP BY b),
           |sp AS (
           |  SELECT count(*) AS b_reps, sum(est6) AS se1,
           |    sum(est6 * est6) AS se2, min(est6) AS lo6, max(est6) AS hi6
           |  FROM reps),
           |pt AS (SELECT count(*) AS n_docs, sum(n_chars) AS sc
           |       FROM documents)
           |SELECT CAST(n_docs AS BIGINT) AS n_docs,
           |  ${Rounding.duckSql("sc::DOUBLE / n_docs::DOUBLE")} AS mean_chars,
           |  CAST(b_reps AS BIGINT) AS b_reps,
           |  ${Rounding.duckSql(
                "sqrt((b_reps * se2 - se1 * se1)::DOUBLE / " +
                "(b_reps * (b_reps - 1))::DOUBLE) / 1000000")} AS boot_se,
           |  lo6::DOUBLE / 1000000 AS ci_lo,
           |  hi6::DOUBLE / 1000000 AS ci_hi
           |FROM sp CROSS JOIN pt
           |ORDER BY n_docs""".stripMargin
      })),

    // ------------------------------------------------------------------
    // q258: burstiness (Fano factor) — the dispersion diagnostic over
    // hourly event counts: a Poisson-like arrival process has
    // var/mean ≈ 1; heavy burstiness (Fano ≫ 1) means rate-limit and
    // capacity knobs must size for peaks, not means (q194 profiles
    // inter-arrival gaps; this profiles the COUNT process). The hour
    // grid is densified from the corpus min/max hour — silent zero
    // hours are exactly the evidence a sparse groupBy would drop —
    // and the variance runs as exact integer sums over integer counts
    // (H·Σc² − (Σc)², the q100 discipline), one final division per
    // statistic on the stableRound6 grid.
    Q(
      "q258_fano_burstiness",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("hr", expr(
            "unix_micros(cast(ts as timestamp)) div 3600000000"))
        val span = e.agg(min("hr").as("h0"), max("hr").as("h1"))
        val hours = span.select(explode(sequence(col("h0"), col("h1")))
          .as("hr"))
        val types = e.select("event_type").distinct()
        val counts = e.groupBy("event_type", "hr")
          .agg(count(lit(1)).as("c"))
        hours.crossJoin(broadcast(types))
          .join(counts, Seq("event_type", "hr"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("hours"), sum("c").as("total"),
            sum(col("c") * col("c")).as("sc2"),
            sum(when(col("c") === 0L, 1L).otherwise(0L)).as("zero_hours"))
          .select(col("event_type"), col("hours").cast("long").as("hours"),
            col("total").cast("long").as("total"),
            col("zero_hours").cast("long").as("zero_hours"),
            Rounding.stableRound6(col("total").cast("double") /
              col("hours").cast("double")).as("mean_per_hour"),
            Rounding.stableRound6(
              (col("hours") * col("sc2") - col("total") * col("total"))
                .cast("double") /
                (col("hours") * col("total")).cast("double")).as("fano"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr
             |  FROM events),
             |span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e),
             |hours AS (
             |  SELECT unnest(range(h0, h1 + 1)) AS hr FROM span),
             |types AS (SELECT DISTINCT event_type FROM e),
             |counts AS (
             |  SELECT event_type, hr, count(*) AS c FROM e GROUP BY 1, 2),
             |dense AS (
             |  SELECT t.event_type, h.hr, coalesce(c.c, 0) AS c
             |  FROM hours h CROSS JOIN types t
             |  LEFT JOIN counts c
             |    ON c.event_type = t.event_type AND c.hr = h.hr)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS hours,
             |  CAST(sum(c) AS BIGINT) AS total,
             |  CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS zero_hours,
             |  ${Rounding.duckSql("sum(c)::DOUBLE / count(*)::DOUBLE")}
             |    AS mean_per_hour,
             |  ${Rounding.duckSql(
                  "(count(*) * sum(c * c) - sum(c) * sum(c))::DOUBLE / " +
                  "(count(*) * sum(c))::DOUBLE")} AS fano
             |FROM dense GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q259: Mondrian (group-conditional) conformal — q250's guarantee is
    // MARGINAL: averaged over the whole test slice, so a minority
    // language can sit far below 1−α while the aggregate looks fine
    // (the same failure mode q235 fixes for perplexity thresholds and
    // q195 audits for splits). The Mondrian fix calibrates the order
    // statistic PER GROUP: each language gets its own
    // k_g = ceil((n_g+1)(1−α))-th smallest calibration score and its
    // own coverage audit. Same distributed shape as q250 — cumulative
    // counts over per-lang distinct score grids — with every window
    // partitioned by lang, so groups parallelize.
    Q(
      "q259_mondrian_conformal",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("calib", Sampling.bucket(col("doc_id"), "conf27") < 2000)
        val cal = d.where(col("calib"))
        val nCal = cal.groupBy("lang").agg(count(lit(1)).as("n_calib"))
        val wg = Window.partitionBy("lang").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val thr = cal.groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(wg))
          .join(broadcast(nCal), "lang")
          .where(col("cum") * 10 >= (col("n_calib") + 1) * 9)
          .groupBy("lang").agg(min("n_chars").as("threshold"))
        d.where(!col("calib"))
          .join(broadcast(thr), "lang")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("n_chars") <= col("threshold"), 1L).otherwise(0L))
              .as("n_covered"),
            first("threshold").as("threshold"))
          .join(broadcast(nCal), "lang")
          .select(col("lang"), col("n_calib").cast("long").as("n_calib"),
            expr("(9 * (n_calib + 1) + 9) div 10").as("k"),
            col("threshold").cast("long").as("threshold"),
            col("n_test").cast("long").as("n_test"),
            col("n_covered").cast("long").as("n_covered"),
            Rounding.stableRound6(col("n_covered").cast("double") /
              col("n_test").cast("double")).as("coverage"))
          .orderBy("lang")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, lang, n_chars,
             |    ${Sampling.bucketDuckSql("conf27", "doc_id")} < 2000 AS calib
             |  FROM documents),
             |nc AS (
             |  SELECT lang, count(*) AS n_calib FROM d WHERE calib
             |  GROUP BY 1),
             |grid AS (
             |  SELECT lang, n_chars, count(*) AS c FROM d WHERE calib
             |  GROUP BY 1, 2),
             |cum AS (
             |  SELECT lang, n_chars,
             |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
             |  FROM grid),
             |thr AS (
             |  SELECT cum.lang, min(n_chars) AS threshold
             |  FROM cum JOIN nc ON nc.lang = cum.lang
             |  WHERE cum * 10 >= (n_calib + 1) * 9 GROUP BY 1),
             |tst AS (
             |  SELECT d.lang, count(*) AS n_test,
             |    sum(CASE WHEN n_chars <= threshold THEN 1 ELSE 0 END)
             |      AS n_covered,
             |    any_value(threshold) AS threshold
             |  FROM d JOIN thr ON thr.lang = d.lang
             |  WHERE NOT calib GROUP BY 1)
             |SELECT tst.lang, CAST(n_calib AS BIGINT) AS n_calib,
             |  (9 * (n_calib + 1) + 9) // 10 AS k,
             |  CAST(threshold AS BIGINT) AS threshold,
             |  CAST(n_test AS BIGINT) AS n_test,
             |  CAST(n_covered AS BIGINT) AS n_covered,
             |  ${Rounding.duckSql("n_covered::DOUBLE / n_test::DOUBLE")}
             |    AS coverage
             |FROM tst JOIN nc ON nc.lang = tst.lang
             |ORDER BY tst.lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q260: DP-style noisy count release (calibration audit) — the
    // privacy family's RELEASE op next to its audit trio (q177
    // k-anonymity, q211 l-diversity, q227 t-closeness): per-source doc
    // counts perturbed by two-sided-geometric noise (the discrete
    // Laplace mechanism) at ε = ln 2. The noise here is DETERMINISTIC —
    // inverse-CDF of P(k) ∝ (1−α)·α^|k|, α = e^(−ε) = 1/2, on the
    // squared-PolyHash 1/10000 grid, tail clipped at |k| = 9 (0.27%
    // mass) — which is exactly what makes this an oracle-checkable
    // CALIBRATION AUDIT of the channel (true count, noisy count, and
    // error side by side) rather than a release: a production release
    // swaps the hash for a real RNG and drops the true columns, keeping
    // the identical plan. One source-sized rollup; noise is a pure
    // function of the group key.
    Q(
      "q260_dp_noisy_counts",
      (s, dir) => {
        val P = graft.functions.PolyHash.Mod
        val h = graft.functions.PolyHash(concat(lit("dp27#"), col("source")))
        val u = h * h % P % 10000
        // two-sided geometric at alpha=1/2: P(0)=1/3, P(±k)=(1/3)/2^k;
        // integer thresholds = cumulative pmf on the 1/10000 grid
        val noise = when(u < 3333, 0L).when(u < 5000, 1L).when(u < 6667, -1L)
          .when(u < 7500, 2L).when(u < 8333, -2L)
          .when(u < 8750, 3L).when(u < 9167, -3L)
          .when(u < 9375, 4L).when(u < 9583, -4L)
          .when(u < 9687, 5L).when(u < 9791, -5L)
          .when(u < 9843, 6L).when(u < 9895, -6L)
          .when(u < 9921, 7L).when(u < 9947, -7L)
          .when(u < 9960, 8L).when(u < 9973, -8L)
          .when(u < 9987, 9L).otherwise(-9L)
        Tables.load(s, dir, "documents")
          .groupBy("source").agg(count(lit(1)).as("n_true"))
          .withColumn("noise", noise)
          .select(col("source"), col("n_true").cast("long").as("n_true"),
            col("noise").cast("long").as("noise"),
            greatest(col("n_true") + col("noise"), lit(0L)).as("n_noisy"),
            Rounding.stableRound6(abs(col("noise")).cast("double") /
              col("n_true").cast("double")).as("rel_err"))
          .orderBy("source")
      },
      Some({
        val P = graft.functions.PolyHash.Mod
        val h = graft.functions.PolyHash.duckSql("'dp27#' || source")
        s"""WITH c AS (
           |  SELECT source, count(*) AS n_true,
           |    (($h) * ($h) % $P) % 10000 AS u
           |  FROM documents GROUP BY source),
           |n AS (
           |  SELECT source, n_true,
           |    CASE WHEN u < 3333 THEN 0 WHEN u < 5000 THEN 1
           |      WHEN u < 6667 THEN -1 WHEN u < 7500 THEN 2
           |      WHEN u < 8333 THEN -2 WHEN u < 8750 THEN 3
           |      WHEN u < 9167 THEN -3 WHEN u < 9375 THEN 4
           |      WHEN u < 9583 THEN -4 WHEN u < 9687 THEN 5
           |      WHEN u < 9791 THEN -5 WHEN u < 9843 THEN 6
           |      WHEN u < 9895 THEN -6 WHEN u < 9921 THEN 7
           |      WHEN u < 9947 THEN -7 WHEN u < 9960 THEN 8
           |      WHEN u < 9973 THEN -8 WHEN u < 9987 THEN 9
           |      ELSE -9 END AS noise
           |  FROM c)
           |SELECT source, CAST(n_true AS BIGINT) AS n_true,
           |  CAST(noise AS BIGINT) AS noise,
           |  CAST(greatest(n_true + noise, 0) AS BIGINT) AS n_noisy,
           |  ${Rounding.duckSql("abs(noise)::DOUBLE / n_true::DOUBLE")}
           |    AS rel_err
           |FROM n
           |ORDER BY source""".stripMargin
      })),

    // ------------------------------------------------------------------
    // q261: Kaplan-Meier survival — view→purchase conversion-time
    // analysis WITH censoring, which the plain funnel/retention members
    // (q72, q70, q132) throw away: a user who viewed but hasn't
    // purchased by their last observed event is CENSORED at that point,
    // not a failure, and dropping them biases conversion time low. Per
    // user: duration (days) from first view to first subsequent
    // purchase, else censored at the last event. The KM estimator runs
    // on the distinct-day grid: at-risk n(t) = total − cum_before(t)
    // (exact integers), survival S(t) = Π(1 − d_i/n_i) computed as
    // exp of the cumulative sum of per-factor ln values snapped to the
    // 1e-9 LONG grid — exact integer window arithmetic between two
    // identical-IEEE endpoints, the q204 discipline.
    Q(
      "q261_kaplan_meier",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("t"))
        val perUser = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("t"))).as("tv"),
            max("t").as("tlast"))
          .where(col("tv").isNotNull)
        // first purchase AT OR AFTER the first view: user-keyed join +
        // conditional min — never a per-user event list in state
        val durs = perUser
          .join(e.where(col("event_type") === "purchase")
            .select(col("user_id"), col("t").as("pt")),
            Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(first("tv").as("tv"), first("tlast").as("tlast"),
            min(when(col("pt") >= col("tv"), col("pt"))).as("tp"))
          .select(col("user_id"),
            when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L))
              .as("event"),
            (coalesce(col("tp"), col("tlast")) - col("tv")).as("dur_us"))
          .withColumn("t_days", expr("dur_us div 86400000000"))
        val grid = durs.groupBy("t_days")
          .agg(sum("event").as("d"),
            sum(lit(1L) - col("event")).as("cens"),
            count(lit(1)).as("cnt"))
        val wPrev = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
        grid
          .withColumn("n_risk",
            sum("cnt").over(tot) - coalesce(sum("cnt").over(wPrev), lit(0L)))
          .where(col("d") > 0)
          // d == n_risk is the factor (1 − d/n) = 0: survival drops to
          // EXACTLY 0 from that point on — kept out of the log walk
          .withColumn("zf", when(col("d") === col("n_risk"), 1L)
            .otherwise(0L))
          .withColumn("lnf9", when(col("zf") === 1L, lit(0L))
            .otherwise(floor(log(lit(1.0) -
              col("d").cast("double") / col("n_risk").cast("double")) *
              lit(1000000000.0) + lit(0.5)).cast("long")))
          .withColumn("survival",
            when(sum("zf").over(wCum) > 0, lit(0.0))
              .otherwise(Rounding.stableRound6(
                exp(sum("lnf9").over(wCum).cast("double") /
                  lit(1000000000.0)))))
          .select(col("t_days").cast("long").as("t_days"),
            col("n_risk").cast("long").as("n_risk"),
            col("d").cast("long").as("d_events"),
            col("cens").cast("long").as("n_censored"),
            col("survival"))
          .orderBy("t_days")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
             |pu AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN t END) AS tv,
             |    max(t) AS tlast
             |  FROM e GROUP BY 1 HAVING tv IS NOT NULL),
             |fp AS (
             |  SELECT pu.user_id,
             |    min(CASE WHEN e.event_type = 'purchase' AND e.t >= pu.tv
             |      THEN e.t END) AS tp,
             |    any_value(pu.tv) AS tv, any_value(pu.tlast) AS tlast
             |  FROM pu JOIN e ON e.user_id = pu.user_id
             |  GROUP BY 1),
             |durs AS (
             |  SELECT user_id,
             |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event,
             |    (coalesce(tp, tlast) - tv) // 86400000000 AS t_days
             |  FROM fp),
             |grid AS (
             |  SELECT t_days, sum(event) AS d,
             |    sum(1 - event) AS cens, count(*) AS cnt
             |  FROM durs GROUP BY 1),
             |risk AS (
             |  SELECT t_days, d, cens,
             |    (sum(cnt) OVER ()) -
             |      coalesce(sum(cnt) OVER (ORDER BY t_days
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n_risk
             |  FROM grid),
             |f AS (
             |  SELECT t_days, n_risk, d, cens,
             |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zf,
             |    CASE WHEN d = n_risk THEN 0
             |      ELSE CAST(floor(ln(1.0 - d::DOUBLE / n_risk::DOUBLE)
             |        * 1000000000 + 0.5) AS BIGINT) END AS lnf9
             |  FROM risk WHERE d > 0)
             |SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(d AS BIGINT) AS d_events,
             |  CAST(cens AS BIGINT) AS n_censored,
             |  CASE WHEN sum(zf) OVER (ORDER BY t_days) > 0 THEN 0.0
             |    ELSE ${Rounding.duckSql(
                  "exp((sum(lnf9) OVER (ORDER BY t_days))::DOUBLE / " +
                  "1000000000)")} END AS survival
             |FROM f
             |ORDER BY t_days""".stripMargin)),

    // ------------------------------------------------------------------
    // q262: Hill tail-index — the heavy-tail diagnostic for the size
    // distribution (is doc length power-law, and how heavy): the Hill
    // estimator α = k / Σ_{i≤k} ln(x_(i) / x_(k+1)) over the k = 200
    // largest n_chars. α near 1–2 means storage/packing planning must
    // budget for giant documents (truncation policy, q83 chunking);
    // α ≫ 3 means means-based sizing is safe. The top-(k+1) frame
    // arrives via TakeOrderedAndProject (per-partition top-k, the q236
    // discipline) with doc_id tiebreak; the log-ratio sum runs on the
    // 1e-9 LONG grid over the 200-row frame, one final division.
    Q(
      "q262_hill_tail_index",
      (s, dir) => {
        val topk = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(desc("n_chars"), col("doc_id")).limit(201)
        val w = Window.orderBy(desc("n_chars"), col("doc_id"))
        val ranked = topk.withColumn("rk", row_number().over(w))
        val ref = ranked.where(col("rk") === 201)
          .select(col("n_chars").as("x_ref"))
        ranked.where(col("rk") <= 200)
          .crossJoin(broadcast(ref))
          .withColumn("lr9", floor(log(col("n_chars").cast("double") /
            col("x_ref").cast("double")) * lit(1000000000.0) + lit(0.5))
            .cast("long"))
          .groupBy("x_ref")
          .agg(count(lit(1)).as("k"), sum("lr9").as("slr9"))
          .select(col("k").cast("long").as("k"),
            col("x_ref").cast("long").as("x_ref"),
            Rounding.stableRound6(col("k").cast("double") * lit(1000000000.0) /
              col("slr9").cast("double")).as("alpha"))
          .orderBy("k")
      },
      Some(s"""WITH ranked AS (
             |  SELECT doc_id, n_chars,
             |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents
             |  ORDER BY n_chars DESC, doc_id LIMIT 201),
             |ref AS (SELECT n_chars AS x_ref FROM ranked WHERE rk = 201),
             |lr AS (
             |  SELECT x_ref,
             |    CAST(floor(ln(n_chars::DOUBLE / x_ref::DOUBLE)
             |      * 1000000000 + 0.5) AS BIGINT) AS lr9
             |  FROM ranked CROSS JOIN ref WHERE rk <= 200)
             |SELECT CAST(count(*) AS BIGINT) AS k,
             |  CAST(any_value(x_ref) AS BIGINT) AS x_ref,
             |  ${Rounding.duckSql(
                  "count(*)::DOUBLE * 1000000000 / sum(lr9)::DOUBLE")}
             |    AS alpha
             |FROM lr
             |ORDER BY k""".stripMargin)))
}
