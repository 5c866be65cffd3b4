package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, SimilaritySearch, TextAnalysis}
import graft.functions.{PolyHash, Rounding}
import graft.io.Tables
import DriverSide._

/** Round-5 fourth wave: trigram-indexed fuzzy string pairs (q117),
  * near-dup cluster survivorship (q118), trailing-time-range window
  * stats (q119), dataset diff (q121), feature hashing (q122), and
  * labeled-embedding centroid reports (q123). Same contract as every
  * other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries5 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q117: all-pairs fuzzy string matching via a character-trigram
    // inverted index — q106 matches probes against a catalog; this is
    // the SELF-join form (dedupe a name/entity column against itself).
    // Scale shape: candidates meet through the trigram posting list
    // (pairs sharing >= 1 trigram — the pg_trgm strategy), trigram
    // counts arrive via vocabulary-sized broadcasts, and the quadratic
    // levenshtein verify runs only on candidates passing the trigram-
    // Jaccard cut. On a corpus-scale column the posting join adds a
    // document-frequency stop-trigram cut (drop trigrams in > x% of
    // names) — the same hot-key discipline as the shingle pipeline.
    Q(
      "q117_trigram_fuzzy_pairs",
      (s, dir) => {
        val names = Tables.load(s, dir, "part")
          .select(col("p_name").as("nm")).distinct()
          .where(length(col("nm")) >= 3)
        val tri = names.select(col("nm"), explode(array_distinct(expr(
          "transform(sequence(1, length(nm) - 2), i -> substring(nm, i, 3))")))
          .as("tg"))
        val cand = tri.toDF("na", "tga").join(tri.toDF("nb", "tgb"),
            col("tga") === col("tgb") && col("na") < col("nb"))
          .groupBy("na", "nb").agg(count(lit(1)).cast("long").as("shared"))
        val tc = tri.groupBy("nm").agg(count(lit(1)).cast("long").as("nt"))
        cand
          .join(broadcast(tc.toDF("na", "nta")), "na")
          .join(broadcast(tc.toDF("nb", "ntb")), "nb")
          .withColumn("jacc", col("shared").cast("double") /
            (col("nta") + col("ntb") - col("shared")).cast("double"))
          .where(col("jacc") >= 0.3 && levenshtein(col("na"), col("nb")) <= 4)
          .select(col("na"), col("nb"),
            Rounding.stableRound6(col("jacc")).as("jacc"),
            levenshtein(col("na"), col("nb")).cast("long").as("dist"))
          .orderBy("na", "nb")
      },
      Some(s"""WITH names AS (
             |  SELECT DISTINCT p_name AS nm FROM part WHERE length(p_name) >= 3),
             |tri AS (
             |  SELECT nm, unnest(list_distinct(list_transform(
             |    range(1, length(nm) - 1),
             |    i -> substr(nm, CAST(i AS INTEGER), 3)))) AS tg
             |  FROM names),
             |cand AS (
             |  SELECT a.nm AS na, b.nm AS nb, count(*)::BIGINT AS shared
             |  FROM tri a JOIN tri b ON a.tg = b.tg AND a.nm < b.nm
             |  GROUP BY 1, 2),
             |tc AS (SELECT nm, count(*)::BIGINT AS nt FROM tri GROUP BY 1),
             |j AS (
             |  SELECT na, nb,
             |    shared::DOUBLE / CAST(ta.nt + tb.nt - shared AS DOUBLE) AS jacc
             |  FROM cand JOIN tc ta ON ta.nm = na JOIN tc tb ON tb.nm = nb)
             |SELECT na, nb, ${Rounding.duckSql("jacc")} AS jacc,
             |  levenshtein(na, nb)::BIGINT AS dist
             |FROM j
             |WHERE jacc >= 0.3 AND levenshtein(na, nb) <= 4
             |ORDER BY na, nb""".stripMargin)),

    // ------------------------------------------------------------------
    // q118: near-dup cluster survivorship — the step that closes the
    // dedup pipeline: after clustering (q59), exactly one copy per
    // cluster is KEPT (highest quality score, doc_id as tiebreak) and
    // the rest map to it. The survivor is a `max(struct(quality, id))`
    // per cluster — one aggregation, no window — then a key join maps
    // every member to its cluster's survivor. The oracle extends q59's
    // WITH RECURSIVE reachability with the same argmax.
    Q(
      "q118_dedup_survivorship",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select("da", "db")
        val labels = Dedup.canonicalize(pairs)
        val withC = docs
          .join(labels, col("doc_id") === col("id"), "left")
          .select(col("doc_id"),
            coalesce(col("label"), col("doc_id")).as("canonical_id"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
        val surv = withC.groupBy("canonical_id")
          .agg(max(struct(col("quality"), col("doc_id"))).as("s"),
            count(lit(1)).cast("long").as("cluster_size"))
          .select(col("canonical_id"), col("s.doc_id").as("survivor_id"),
            col("cluster_size"))
        withC.join(surv, "canonical_id")
          .select(col("doc_id"), col("canonical_id"), col("survivor_id"),
            (col("doc_id") === col("survivor_id")).as("kept"),
            col("cluster_size"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE pairs AS (
             |${ExtensionQueries.NearDupPairsOracle}
             |),
             |edges AS (SELECT da AS s, db AS d FROM pairs
             |          UNION ALL SELECT db, da FROM pairs),
             |walk(id, lab) AS (
             |  SELECT s, s FROM edges
             |  UNION
             |  SELECT e.s, w.lab FROM edges e JOIN walk w ON w.id = e.d),
             |labels AS (SELECT id, min(lab) AS label FROM walk GROUP BY id),
             |docs AS (
             |  SELECT d.doc_id, coalesce(l.label, d.doc_id) AS canonical_id,
             |    ${ExtensionQueries.QualityScoreSql} AS quality
             |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id),
             |surv AS (
             |  SELECT canonical_id, doc_id AS survivor_id, cluster_size FROM (
             |    SELECT canonical_id, doc_id,
             |      count(*) OVER (PARTITION BY canonical_id) AS cluster_size,
             |      row_number() OVER (PARTITION BY canonical_id
             |        ORDER BY quality DESC, doc_id DESC) AS rn
             |    FROM docs)
             |  WHERE rn = 1)
             |SELECT d.doc_id, d.canonical_id, s.survivor_id,
             |  (d.doc_id = s.survivor_id) AS kept,
             |  CAST(s.cluster_size AS BIGINT) AS cluster_size
             |FROM docs d JOIN surv s USING (canonical_id)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q119: trailing-time-range window stats — the RANGE-frame
    // complement to q108's ROWS frame: "activity in the last hour" per
    // event, where the frame is defined by the TIME axis (peers at the
    // same instant are all included — RANGE semantics both engines
    // share), not a row count. One user-keyed shuffle; frame state
    // bounded by events-per-hour-per-user.
    Q(
      "q119_trailing_hour",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val te = unix_micros(col("ts").cast("timestamp"))
        val w = Window.partitionBy("user_id").orderBy(te)
          .rangeBetween(-3600000000L, Window.currentRow)
        e.withColumn("n_1h", count(lit(1)).over(w).cast("long"))
          .withColumn("sum_1h", round(sum("value").over(w), 2))
          .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
             |  round(sum(value) OVER w, 2) AS sum_1h
             |FROM (SELECT *, epoch_us(ts) AS te FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY te
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q121: dataset diff — snapshot comparison between two corpus
    // versions (the data-versioning/CDF shape: what was added, removed,
    // or edited between crawls). Versions are synthesized from
    // deterministic hash buckets (membership + a planted edit are pure
    // functions of doc_id), then a single full-outer join on the key
    // classifies every doc; content equality via md5 fingerprints, the
    // same exact-dedup discipline as q43. One key-partitioned shuffle.
    Q(
      "q121_dataset_diff",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val old = docs
          .where(Sampling.bucket(col("doc_id"), "ver1") < 9000)
          .select(col("doc_id"), col("text").as("text_old"))
        val neu = docs
          .where(Sampling.bucket(col("doc_id"), "ver2") < 9000)
          .select(col("doc_id"),
            when(Sampling.bucket(col("doc_id"), "edit1") < 1000,
              concat(col("text"), lit(" [v2]")))
              .otherwise(col("text")).as("text_new"))
        old.join(neu, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("text_old").isNull, lit("added"))
              .when(col("text_new").isNull, lit("removed"))
              .when(md5(col("text_old")) =!= md5(col("text_new")), lit("changed"))
              .otherwise(lit("unchanged")).as("status"))
          .orderBy("doc_id")
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id, text,
             |    ${Sampling.bucketDuckSql("ver1", "doc_id")} AS b1,
             |    ${Sampling.bucketDuckSql("ver2", "doc_id")} AS b2,
             |    ${Sampling.bucketDuckSql("edit1", "doc_id")} AS b3
             |  FROM documents),
             |old AS (SELECT doc_id, text AS text_old FROM b WHERE b1 < 9000),
             |neu AS (
             |  SELECT doc_id,
             |    CASE WHEN b3 < 1000 THEN text || ' [v2]' ELSE text END AS text_new
             |  FROM b WHERE b2 < 9000)
             |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             |  CASE WHEN o.doc_id IS NULL THEN 'added'
             |       WHEN n.doc_id IS NULL THEN 'removed'
             |       WHEN md5(o.text_old) <> md5(n.text_new) THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q122: feature hashing (HashingTF) — the fixed-width featurizer for
    // linear models/classifier-based quality filters: token → bucket via
    // PolyHash % k, counts per (doc, bucket). No vocabulary table at
    // all — the whole point of the hashing trick at corpus scale — so
    // it is one explode + one keyed aggregation with map-side partials.
    Q(
      "q122_hashing_tf",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.ops.Text.words(graft.ops.Text.clean(col("text"))))
              .as("w"))
          .withColumn("idx", pmod(graft.functions.PolyHash(col("w")), lit(64L)))
          .groupBy("doc_id", "idx")
          .agg(count(lit(1)).cast("long").as("cnt"))
          .orderBy("doc_id", "idx"),
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents)
             |SELECT doc_id, ${graft.functions.PolyHash.duckSql("w")} % 64 AS idx,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM toks
             |GROUP BY doc_id, idx
             |ORDER BY doc_id, idx""".stripMargin)),

    // ------------------------------------------------------------------
    // q123: labeled-embedding centroid report — the embedding-QA pass a
    // labeled corpus gets before training (class balance, centroid
    // norms, intra-class cohesion). Per-label centroids are dim
    // avg-aggregates in ONE hash agg (q95's update step), stable-rounded
    // and float-quantized so both engines score against identical bits;
    // members then meet their centroid through a 10-row broadcast and
    // the codegen'd cosine. Two corpus scans (centroid build + scoring).
    Q(
      "q123_label_centroids",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val dim = SimilaritySearch.deriveDim(e, "embedding")
        val avgs = (0 until dim).map(i =>
          avg(element_at(col("embedding"), i + 1)).as(s"c_$i"))
        val rows = e.groupBy("label").agg(avgs.head, avgs.tail: _*)
          .collectBounded("label centroids")
        // the collect is one row per LABEL (class count, not corpus size)
        // — fail loudly if someone points this at a high-cardinality
        // column instead of a class label
        require(rows.length <= 10000,
          s"label cardinality ${rows.length} too high for a centroid report " +
            "(driver collects one centroid per label)")
        def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
        val cents = rows.map { r =>
          val cv = (0 until dim).map(i => r6(r.getDouble(i + 1)).toFloat)
          val norm = {
            var d = 0.0
            cv.foreach(f => d += f.toDouble * f.toDouble)
            r6(math.sqrt(d))
          }
          (r.getInt(0), cv, norm)
        }
        import s.implicits._
        val cdf = cents.toSeq.toDF("label", "cv", "centroid_norm")
        e.join(broadcast(cdf), "label")
          .withColumn("cos", Rounding.stableRound6(
            graft.functions.VectorFunctions.cosineSim(col("embedding"), col("cv"))))
          .groupBy("label")
          .agg(count(lit(1)).cast("long").as("n_vectors"),
            first("centroid_norm").as("centroid_norm"),
            Rounding.stableRound6(avg("cos")).as("avg_cos"))
          .orderBy("label")
      },
      Some {
        val meanList = (1 to Tables.EmbeddingDim)
          .map(j => s"CAST(CAST(floor(avg(v[$j]) * 1000000 + 0.5) / 1000000 AS REAL) AS DOUBLE)")
          .mkString("[", ", ", "]")
        s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
           |c AS (SELECT label, $meanList AS cv FROM e GROUP BY label)
           |SELECT e.label, CAST(count(*) AS BIGINT) AS n_vectors,
           |  ${Rounding.duckSql("first(sqrt(list_dot_product(c.cv, c.cv)))")}
           |    AS centroid_norm,
           |  ${Rounding.duckSql(
                "avg(floor(list_cosine_similarity(e.v, c.cv) * 1000000 + 0.5) / 1000000)")}
           |    AS avg_cos
           |FROM e JOIN c USING (label)
           |GROUP BY e.label
           |ORDER BY e.label""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q124: repeated-span extraction — the exact-substring dedup signal
    // (Lee et al. 2022, "Deduplicating Training Data Makes Language
    // Models Better"): token 8-grams occurring in >= 2 distinct docs are
    // hits; per doc, overlapping hits merge into maximal repeated spans
    // (the byte ranges you'd excise). Gram frequency is one keyed
    // aggregation, hits one equi-join (NOT broadcast — the repeated-gram
    // set is data-dependent), and island merging is a doc-keyed lag
    // window: fixed gram length makes "overlaps previous" exactly
    // pos <= lag(pos)+8. Both the aggregation and the join key on
    // poly_hash(gram) — an 8-byte long — so the ~50-byte gram STRINGS
    // never enter a shuffle (round-5 plan-quality fix); the oracle
    // replays the identical hash (q86/q122 precedent), so any collision
    // merges the same grams in both engines and the gate stays exact.
    // At production scale swap poly_hash for xxhash64 (64-bit space, no
    // oracle-replay constraint) to push the collision rate to ~0.
    // Two corpus scans (freq build + hits), q94's accepted shape.
    Q(
      "q124_repeated_spans",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("ws", graft.ops.Text.words(graft.ops.Text.clean(col("text"))))
          .where(size(col("ws")) >= 8)
        val grams = docs.select(col("doc_id"), expr(
            "explode(transform(sequence(0, size(ws) - 8), " +
              "i -> struct(i AS pos, array_join(slice(ws, i + 1, 8), ' ') AS g)))")
            .as("e"))
          .select(col("doc_id"), col("e.pos").as("pos"),
            graft.functions.PolyHash(col("e.g")).as("gh"))
        val rep = grams.groupBy("gh")
          .agg(countDistinct("doc_id").as("nd"))
          .where(col("nd") >= 2).select("gh")
        // shuffle-hash, NOT broadcast: the repeated-gram set's size is
        // data-dependent (could be billions of grams on a crawl), and
        // the static post-aggregation size estimate that would pick
        // broadcast here is a guess; SHJ shuffles 8-byte keys instead
        val hits = grams.join(rep.hint("shuffle_hash"), "gh")
          .select("doc_id", "pos")
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val marked = hits.withColumn("new_s",
          when(lag("pos", 1).over(w).isNull ||
            col("pos") > lag("pos", 1).over(w) + 8, 1).otherwise(0))
        marked
          .withColumn("sid", sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("doc_id", "sid")
          .agg(min("pos").cast("long").as("span_start"),
            (max("pos") + 8).cast("long").as("span_end"),
            count(lit(1)).cast("long").as("n_grams"))
          .select("doc_id", "span_start", "span_end", "n_grams")
          .orderBy("doc_id", "span_start")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '') AS ws
             |  FROM documents),
             |grams0 AS (
             |  SELECT doc_id, unnest(list_transform(range(0, len(ws) - 7),
             |    i -> {'pos': i, 'g': array_to_string(ws[i+1:i+8], ' ')}),
             |    recursive := true)
             |  FROM toks WHERE len(ws) >= 8),
             |grams AS (
             |  SELECT doc_id, pos, ${PolyHash.duckSql("g")} AS gh FROM grams0),
             |rep AS (
             |  SELECT gh FROM grams GROUP BY gh
             |  HAVING count(DISTINCT doc_id) >= 2),
             |hits AS (SELECT doc_id, pos FROM grams JOIN rep USING (gh)),
             |marked AS (
             |  SELECT doc_id, pos,
             |    CASE WHEN lag(pos) OVER w IS NULL
             |           OR pos > lag(pos) OVER w + 8 THEN 1 ELSE 0 END AS new_s
             |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
             |sp AS (
             |  SELECT doc_id, pos, sum(new_s) OVER (PARTITION BY doc_id
             |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sid
             |  FROM marked)
             |SELECT doc_id, min(pos)::BIGINT AS span_start,
             |  (max(pos) + 8)::BIGINT AS span_end,
             |  CAST(count(*) AS BIGINT) AS n_grams
             |FROM sp
             |GROUP BY doc_id, sid
             |ORDER BY doc_id, span_start""".stripMargin)),

    // ------------------------------------------------------------------
    // q125: winsorization — clip a measure to its per-group [p01, p99]
    // before aggregate statistics (the standard heavy-tail guard for
    // reward/quality signals). The bounds come from the engine's
    // deterministic fixed-width-histogram quantile (the q61
    // Sketches.histogramQuantiles shape, inlined per-group): one
    // MERGEABLE aggregation whose state is #(group, bin) pairs — bounded
    // by value-range/binWidth, NOT corpus size — unlike exact
    // `percentile`, whose buffer materializes every group value (a
    // round-5-flagged executor OOM at 100 TB). Bound = bin midpoint
    // (bin+0.5)*binWidth, exact in doubles, so DuckDB replays it
    // bit-identically. The bounds join back via broadcast — keyed by
    // o_orderstatus, an enum domain of 3, so the broadcast is
    // domain-bounded, not data-sized. Clip is a pure projection; the
    // group mean is round6.
    Q(
      "q125_winsorize",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val bq = graft.ext.Sketches.groupedHistogramQuantiles(
          o, "o_orderstatus", "o_totalprice", 100.0, Seq(0.01, 0.99))
        val bounds = bq.groupBy("o_orderstatus")
          .agg(min(when(col("q") === 0.01, col("est"))).as("p01"),
            min(when(col("q") === 0.99, col("est"))).as("p99"))
        o.join(broadcast(bounds), "o_orderstatus")
          .withColumn("w", least(greatest(col("o_totalprice"), col("p01")),
            col("p99")))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("o_totalprice") < col("p01"), 1L).otherwise(0L))
              .cast("long").as("n_clipped_low"),
            sum(when(col("o_totalprice") > col("p99"), 1L).otherwise(0L))
              .cast("long").as("n_clipped_high"),
            Rounding.stableRound6(avg("w")).as("avg_winsorized"))
          .orderBy("o_orderstatus")
      },
      Some(s"""WITH bins AS (
             |  SELECT o_orderstatus, floor(o_totalprice / 100.0) AS bin,
             |    count(*) AS c
             |  FROM orders GROUP BY 1, 2),
             |cum AS (
             |  SELECT o_orderstatus, bin, c,
             |    sum(c) OVER (PARTITION BY o_orderstatus ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(c) OVER (PARTITION BY o_orderstatus) AS total
             |  FROM bins),
             |b AS (
             |  SELECT o_orderstatus,
             |    (min(CASE WHEN cum >= 0.01::DOUBLE * total THEN bin END) + 0.5)
             |      * 100.0 AS p01,
             |    (min(CASE WHEN cum >= 0.99::DOUBLE * total THEN bin END) + 0.5)
             |      * 100.0 AS p99
             |  FROM cum GROUP BY 1)
             |SELECT o.o_orderstatus,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN o.o_totalprice < b.p01 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_clipped_low,
             |  CAST(sum(CASE WHEN o.o_totalprice > b.p99 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_clipped_high,
             |  ${Rounding.duckSql(
                  "avg(least(greatest(o.o_totalprice, b.p01), b.p99))")}
             |    AS avg_winsorized
             |FROM orders o JOIN b USING (o_orderstatus)
             |GROUP BY o.o_orderstatus
             |ORDER BY o.o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q126: median/MAD robust outliers — q108's rolling z-score breaks
    // on heavy-tailed baselines (the outliers inflate the std that is
    // supposed to flag them); median absolute deviation is the robust
    // alternative. Two group aggregations (median, then median of
    // absolute deviations), joined back WITHOUT a broadcast hint: the
    // per-user aggregates are keyed by user_id, whose cardinality grows
    // with the corpus — an unconditional broadcast would OOM executors
    // at scale (the round-5-flagged anti-pattern; same rationale as the
    // guarded Dedup.contaminationReport broadcast). AQE picks broadcast
    // when the side is actually small and degrades to a shuffle join
    // when it isn't. The median buffers are bounded by per-user
    // activity, not corpus size. Flag |x − med| > 3·MAD; all comparisons
    // run on identical doubles in both engines; reported med/mad are
    // round6.
    Q(
      "q126_mad_outliers",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val med = e.groupBy("user_id")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val withMed = e.join(med, "user_id")
        val mad = withMed.groupBy("user_id")
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        withMed.join(mad, "user_id")
          .where(col("mad") > 0 &&
            abs(col("value") - col("med")) > col("mad") * 3)
          .select(col("event_id"), col("user_id"), col("value"),
            Rounding.stableRound6(col("med")).as("med"),
            Rounding.stableRound6(col("mad")).as("mad"))
          .orderBy("event_id")
      },
      Some(s"""WITH m AS (
             |  SELECT user_id, quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY 1),
             |d AS (
             |  SELECT e.user_id,
             |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
             |  FROM events e JOIN m USING (user_id) GROUP BY 1)
             |SELECT e.event_id, e.user_id, e.value,
             |  ${Rounding.duckSql("m.med")} AS med,
             |  ${Rounding.duckSql("d.mad")} AS mad
             |FROM events e JOIN m USING (user_id) JOIN d USING (user_id)
             |WHERE d.mad > 0 AND abs(e.value - m.med) > d.mad * 3
             |ORDER BY e.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q127: grouped linear regression — slope/intercept/R² of the metric
    // against time per event type (drift/trend detection over a metric
    // stream). One aggregation: regr_* are declarative aggregates with
    // map-side partials, so the trend over a 100 TB stream costs one
    // keyed shuffle of 6 moments per group. The time axis is hours since
    // the global minimum timestamp (an exact integer min both engines
    // agree on), keeping slope magnitudes in round6's resolution.
    Q(
      "q127_regr_per_type",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val te = unix_micros(col("ts").cast("timestamp"))
        val t0 = e.agg(min(te)).head().getLong(0)
        e.withColumn("x", (te - lit(t0)).cast("double") / 3600000000.0)
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            Rounding.stableRound6(regr_slope(col("value"), col("x")))
              .as("slope"),
            Rounding.stableRound6(regr_intercept(col("value"), col("x")))
              .as("intercept"),
            Rounding.stableRound6(regr_r2(col("value"), col("x"))).as("r2"))
          .orderBy("event_type")
      },
      Some(s"""WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
             |x AS (
             |  SELECT event_type, value,
             |    CAST(epoch_us(ts) - t0.t0 AS DOUBLE) / 3600000000.0 AS x
             |  FROM events CROSS JOIN t0)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  ${Rounding.duckSql("regr_slope(value, x)")} AS slope,
             |  ${Rounding.duckSql("regr_intercept(value, x)")} AS intercept,
             |  ${Rounding.duckSql("regr_r2(value, x)")} AS r2
             |FROM x
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin))
  )
}
