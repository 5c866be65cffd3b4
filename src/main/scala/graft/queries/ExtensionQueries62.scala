package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-9 twentieth wave: MinHash-LSH band-parameter planning against
  * measured pair similarities (q386), categorical modularity of the
  * co-purchase graph by brand (q387), a fully replayable Bloom-filter
  * false-positive audit (q388), and a user feature-store assembly
  * (q389).
  */
object ExtensionQueries62 {

  /** x^(2^k) by explicit squaring — the IEEE-exact cross-engine power
    * chain (pow() is not correctly-rounded; repeated multiplication is
    * the same instruction sequence in both engines). */
  private def sq(c: Column, k: Int): Column =
    (1 to k).foldLeft(c)((acc, _) => acc * acc)

  private def sqSql(e: String, k: Int): String =
    (1 to k).foldLeft(e)((acc, _) => s"($acc * $acc)")

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q386: LSH band-parameter planner — for the 64-permutation
    // MinHash signature, which (bands × rows) split catches the
    // corpus's ACTUAL near-duplicates best? For each candidate combo
    // (16×4, 8×8, 4×16), the catch probability of a pair with Jaccard
    // j is 1 − (1 − j^r)^b — evaluated over the MEASURED verified
    // near-dup pairs (the q44 pipeline at threshold 0.3), not a
    // hypothetical curve, plus the analytic S-curve threshold
    // (1/b)^(1/r). All powers are explicit squaring chains and sqrt
    // nests (IEEE-exact both engines — pow() is not); per-pair catch
    // probabilities snap to the 1e-6 grid before averaging. The pair
    // frame is banded-candidates only — never all-pairs.
    Q(
      "q386_lsh_planner",
      (s, dir) => {
        val pairs = graft.ext.Dedup.nearDupPairs(
            Tables.load(s, dir, "documents"), "text", "doc_id", 0.3)
          .select(col("jaccard").as("j"))
          .localCheckpoint()
        val combos = Seq((16, 4, 2), (8, 8, 3), (4, 16, 4))
        combos.map { case (b, r, rk) =>
          // j^r (r = 2^rk) and (1-x)^b (b = 2^(6-rk)) by squaring
          val jr = sq(col("j"), rk)
          val catchP = lit(1.0) - sq(lit(1.0) - jr, 6 - rk)
          val thr = (1 to rk).foldLeft(lit(1.0 / b))((acc, _) => sqrt(acc))
          pairs
            .select(floor(catchP * 1e6 + 0.5).cast("long").as("p6"))
            .agg(count(lit(1)).as("n_pairs"), sum("p6").as("sp6"))
            .select(lit(b.toLong).as("bands"),
              lit(r.toLong).as("rows_per_band"),
              col("n_pairs"),
              Rounding.stableRound6(col("sp6").cast("double") /
                col("n_pairs").cast("double") / 1e6)
                .as("expected_recall"),
              Rounding.stableRound6(thr).as("threshold_star"))
        }.reduce(_ unionAll _)
          .orderBy("bands")
      },
      Some {
        val combos = Seq((16, 4, 2), (8, 8, 3), (4, 16, 4))
        val rows = combos.map { case (b, r, rk) =>
          val jr = sqSql("j", rk)
          val catchP = s"(1.0 - ${sqSql(s"(1.0 - $jr)", 6 - rk)})"
          val thr = (1 to rk).foldLeft(s"(1.0 / $b)")((acc, _) =>
            s"sqrt($acc)")
          s"""SELECT CAST($b AS BIGINT) AS bands,
             |  CAST($r AS BIGINT) AS rows_per_band,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  ${Rounding.duckSql(
                  s"sum(CAST(floor($catchP * 1000000 + 0.5) AS BIGINT))" +
                    s"::DOUBLE / count(*)::DOUBLE / 1000000.0")}
             |    AS expected_recall,
             |  ${Rounding.duckSql(thr)} AS threshold_star
             |FROM pairs"""
        }.mkString("\n  UNION ALL ")
        s"""WITH pairs AS (
           |  SELECT jaccard AS j FROM (
           |    ${ExtensionQueries.nearDupPairsOracleAt(0.3)})),
           |u AS (
           |  $rows)
           |SELECT * FROM u
           |ORDER BY bands""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q387: brand modularity of the co-purchase graph — does the
    // co-purchase structure align with the brand partition? Newman
    // modularity with communities GIVEN by the p_brand attribute:
    // Q = Σ_c (e_c/m − (d_c/2m)²), every term an exact LONG count
    // (within-brand edges, brand degree mass) over q355's support>=2
    // edges. The per-brand contribution rows localize WHERE structure
    // concentrates; Q near 0 means brands don't explain co-purchase
    // at all (the q355 degree lens and this categorical lens complete
    // the assortativity pair). Keyed joins only, then arithmetic on
    // the 25-row brand frame.
    Q(
      "q387_brand_modularity",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val edges = li.join(li.toDF("l_orderkey", "p2"), "l_orderkey")
          .where(col("l_partkey") < col("p2"))
          .groupBy(col("l_partkey").as("a"), col("p2").as("b"))
          .agg(count(lit(1)).as("sup"))
          .where(col("sup") >= 2)
          .select("a", "b")
        val brand = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))
        val lab = edges
          .join(brand.toDF("a", "ba"), "a")
          .join(brand.toDF("b", "bb"), "b")
          .localCheckpoint()
        val m1 = lab.agg(count(lit(1)).as("m"))
        val degMass = lab.select(col("ba").as("brand"))
          .unionAll(lab.select(col("bb").as("brand")))
          .groupBy("brand").agg(count(lit(1)).as("d"))
        val within = lab.where(col("ba") === col("bb"))
          .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("e_in"))
        val per = degMass.join(within, Seq("brand"), "left")
          .na.fill(0L, Seq("e_in"))
          .crossJoin(m1)
          .withColumn("contrib",
            col("e_in").cast("double") / col("m").cast("double") -
              (col("d").cast("double") / (lit(2.0) * col("m").cast("double")))
              * (col("d").cast("double") / (lit(2.0) * col("m").cast("double"))))
          .withColumn("c9", floor(col("contrib") * 1e9 + 0.5).cast("long"))
        val q = per.agg(sum("c9").as("q9"))
        per.crossJoin(q)
          .select(col("brand"), col("e_in"), col("d").as("degree_mass"),
            Rounding.stableRound6(col("contrib")).as("contribution"),
            Rounding.stableRound6(col("q9").cast("double") / 1e9)
              .as("modularity"))
          .orderBy("brand")
      },
      Some(s"""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |edges AS (
             |  SELECT a.l_partkey AS a, b.l_partkey AS b
             |  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2
             |  HAVING count(*) >= 2),
             |lab AS (
             |  SELECT pa.p_brand AS ba, pb.p_brand AS bb
             |  FROM edges
             |  JOIN part pa ON pa.p_partkey = edges.a
             |  JOIN part pb ON pb.p_partkey = edges.b),
             |m1 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
             |dm AS (
             |  SELECT brand, CAST(count(*) AS BIGINT) AS d FROM (
             |    SELECT ba AS brand FROM lab
             |    UNION ALL SELECT bb FROM lab)
             |  GROUP BY 1),
             |wi AS (
             |  SELECT ba AS brand, CAST(count(*) AS BIGINT) AS e_in
             |  FROM lab WHERE ba = bb GROUP BY 1),
             |per AS (
             |  SELECT dm.brand, coalesce(wi.e_in, 0) AS e_in, dm.d,
             |    coalesce(wi.e_in, 0)::DOUBLE / m::DOUBLE
             |      - (dm.d::DOUBLE / (2.0 * m::DOUBLE))
             |      * (dm.d::DOUBLE / (2.0 * m::DOUBLE)) AS contrib
             |  FROM dm LEFT JOIN wi ON wi.brand = dm.brand
             |  CROSS JOIN m1),
             |p9 AS (
             |  SELECT brand, e_in, d, contrib,
             |    CAST(floor(contrib * 1000000000.0 + 0.5) AS BIGINT)
             |      AS c9
             |  FROM per),
             |q AS (SELECT CAST(sum(c9) AS BIGINT) AS q9 FROM p9)
             |SELECT brand, e_in, d AS degree_mass,
             |  ${Rounding.duckSql("contrib")} AS contribution,
             |  ${Rounding.duckSql("q9::DOUBLE / 1000000000.0")}
             |    AS modularity
             |FROM p9 CROSS JOIN q
             |ORDER BY brand""".stripMargin)),

    // ------------------------------------------------------------------
    // q388: Bloom-filter false-positive audit — the q92 bloom
    // prefilter trusts library internals; this one is REPLAYABLE: a
    // k=7, m=2²⁰ filter built from the eval split's 6-gram PolyHashes
    // (bit positions poly_hash('bf<i>#' || gram) % m), probed with
    // train grams that are verifiably NOT in the eval set (exact
    // anti-join) — a probe is a false positive iff all 7 of its
    // positions are occupied. Both engines replay the exact same bit
    // set, so measured_fpp is hash-gated to the bit, and the theory
    // column (1 − e^(−k·n/m))^k sits beside it; the audit bool pins
    // measured < 3× theory. The bit set and probe join are gram-hash
    // equi-joins — no UDF, no library sketch.
    Q(
      "q388_bloom_fp_audit",
      (s, dir) => {
        val M = 1048576L // 2^20 bits
        val K = 7
        val docs = Tables.load(s, dir, "documents")
          .withColumn("bucket",
            (PolyHash(concat(lit("bloom#"), col("doc_id").cast("string")))
              * PolyHash(concat(lit("bloom#"), col("doc_id").cast("string")))
              % 1000000007L) % 10000L)
        val evalSh = docs.where(col("bucket") < 2000L)
          .select(explode(graft.ext.Dedup.shingles(col("text"), 6)).as("g"))
          .distinct().localCheckpoint()
        val trainSh = docs.where(col("bucket") >= 2000L)
          .select(explode(graft.ext.Dedup.shingles(col("text"), 6)).as("g"))
          .distinct()
        val probes = trainSh.join(evalSh, Seq("g"), "left_anti")
          .localCheckpoint()
        def positions(df: org.apache.spark.sql.DataFrame) = df.select(
          col("g"), explode(transform(sequence(lit(1), lit(K)),
            i => PolyHash(concat(lit("bf"), i.cast("string"), lit("#"),
              col("g"))) % M)).as("pos"))
        val bits = positions(evalSh).select("pos").distinct()
        val hits = positions(probes)
          .join(bits, "pos")
          .groupBy("g").agg(count(lit(1)).as("nset"))
          .where(col("nset") === K.toLong)
          .agg(count(lit(1)).as("false_hits"))
        val nE = evalSh.agg(count(lit(1)).as("n_eval"))
        val nP = probes.agg(count(lit(1)).as("n_probes"))
        val nB = bits.agg(count(lit(1)).as("bits_set"))
        hits.crossJoin(nE).crossJoin(nP).crossJoin(nB)
          .withColumn("load", col("bits_set").cast("double") / M)
          .select(col("n_eval"), col("n_probes"), col("bits_set"),
            col("false_hits"),
            Rounding.stableRound6(col("false_hits").cast("double") /
              col("n_probes").cast("double")).as("measured_fpp"),
            Rounding.stableRound6 {
              // (bits_set / m)^7 — the occupancy-based exact FP model
              val l = col("load")
              l * l * l * l * l * l * l
            }.as("theory_fpp"),
            (col("false_hits").cast("double") /
              col("n_probes").cast("double") <=
              lit(3.0) * {
                val l = col("load")
                l * l * l * l * l * l * l
              } + lit(0.001)).as("within_band"))
      },
      Some(s"""WITH docs AS (
             |  SELECT doc_id, text,
             |    ((${PolyHash.duckSql("'bloom#' || doc_id::VARCHAR")}
             |      * ${PolyHash.duckSql("'bloom#' || doc_id::VARCHAR")})
             |      % 1000000007) % 10000 AS bucket
             |  FROM documents),
             |toks AS (
             |  SELECT doc_id, bucket,
             |    list_filter(string_split(text, ' '), t -> t <> '')
             |      AS arr
             |  FROM docs),
             |grams AS (
             |  SELECT DISTINCT bucket < 2000 AS is_eval, s AS g FROM (
             |    SELECT bucket, unnest(list_transform(
             |      range(len(arr) - 5),
             |      i -> arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3]
             |        || ' ' || arr[i+4] || ' ' || arr[i+5]
             |        || ' ' || arr[i+6])) AS s
             |    FROM toks WHERE len(arr) >= 6)),
             |ev AS (SELECT DISTINCT g FROM grams WHERE is_eval),
             |tr AS (SELECT DISTINCT g FROM grams WHERE NOT is_eval),
             |probes AS (SELECT g FROM tr ANTI JOIN ev USING (g)),
             |bits AS (
             |  SELECT DISTINCT
             |    ${PolyHash.duckSql("'bf' || i::VARCHAR || '#' || g")}
             |      % 1048576 AS pos
             |  FROM ev CROSS JOIN (SELECT unnest(range(1, 8)) AS i)),
             |ph AS (
             |  SELECT g,
             |    ${PolyHash.duckSql("'bf' || i::VARCHAR || '#' || g")}
             |      % 1048576 AS pos
             |  FROM probes CROSS JOIN (SELECT unnest(range(1, 8)) AS i)),
             |fh AS (
             |  SELECT CAST(count(*) AS BIGINT) AS false_hits FROM (
             |    SELECT ph.g FROM ph JOIN bits ON bits.pos = ph.pos
             |    GROUP BY ph.g HAVING count(*) = 7)),
             |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_eval FROM ev),
             |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes
             |       FROM probes),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS bits_set
             |       FROM bits),
             |x AS (
             |  SELECT n_eval, n_probes, bits_set, false_hits,
             |    bits_set::DOUBLE / 1048576 AS load
             |  FROM fh CROSS JOIN ne CROSS JOIN np CROSS JOIN nb)
             |SELECT n_eval, n_probes, bits_set, false_hits,
             |  ${Rounding.duckSql(
                  "false_hits::DOUBLE / n_probes::DOUBLE")}
             |    AS measured_fpp,
             |  ${Rounding.duckSql(
                  "load * load * load * load * load * load * load")}
             |    AS theory_fpp,
             |  false_hits::DOUBLE / n_probes::DOUBLE
             |    <= 3.0 * (load * load * load * load * load * load
             |      * load) + 0.001 AS within_band
             |FROM x""".stripMargin)),

    // ------------------------------------------------------------------
    // q389: user feature-store assembly — the materialization step a
    // training pipeline runs nightly: six behavioral signals meeting
    // on user_id with NO new shuffle class (one events groupBy, one
    // key-partitioned window for the dominant type, broadcast 1-row
    // frames for the global clock). Exact integers/cents throughout;
    // recency is whole days behind the corpus max timestamp.
    Q(
      "q389_user_features",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val mx = e.agg(max(to_date(col("ts"))).as("mxd"))
        val base = e.groupBy("user_id")
          .agg(count(lit(1)).as("frequency"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            sum(when(col("event_type") === "purchase", col("cents"))
              .otherwise(0L)).as("monetary_cents"),
            countDistinct(to_date(col("ts"))).as("active_days"),
            max(to_date(col("ts"))).as("last_day"))
        val dom = e.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id")
              .orderBy(col("c").desc, col("event_type"))))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("dominant_type"))
        base.join(dom, "user_id")
          .crossJoin(mx)
          .select(col("user_id"),
            datediff(col("mxd"), col("last_day")).cast("long")
              .as("recency_days"),
            col("frequency"), col("monetary_cents"), col("active_days"),
            col("dominant_type"),
            Rounding.stableRound6(col("n_purchases").cast("double") /
              col("frequency").cast("double")).as("purchase_share"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |mx AS (SELECT max(day) AS mxd FROM e),
             |base AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS frequency,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS n_purchases,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
             |      ELSE 0 END) AS BIGINT) AS monetary_cents,
             |    CAST(count(DISTINCT day) AS BIGINT) AS active_days,
             |    max(day) AS last_day
             |  FROM e GROUP BY 1),
             |dom AS (
             |  SELECT user_id, event_type AS dominant_type FROM (
             |    SELECT user_id, event_type, row_number() OVER (
             |      PARTITION BY user_id
             |      ORDER BY count(*) DESC, event_type) AS rn
             |    FROM e GROUP BY user_id, event_type)
             |  WHERE rn = 1)
             |SELECT base.user_id,
             |  CAST(date_diff('day', last_day, mxd) AS BIGINT)
             |    AS recency_days,
             |  frequency, monetary_cents, active_days, dominant_type,
             |  ${Rounding.duckSql(
                  "n_purchases::DOUBLE / frequency::DOUBLE")}
             |    AS purchase_share
             |FROM base
             |JOIN dom ON dom.user_id = base.user_id
             |CROSS JOIN mx
             |ORDER BY base.user_id""".stripMargin))
  )
}
