package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DamerauLevenshtein, PolyHash, Rounding}
import graft.io.Tables

/** Round-9 fourteenth wave: exact tail-latency attribution over the
  * value domain (q362), a difference-in-differences estimator on a
  * hash-split experiment (q363), weighted reciprocity of the
  * event-type transition digraph (q364), and brand-blocked fuzzy pairs
  * under the new true Damerau-Levenshtein codegen expression (q365).
  */
object ExtensionQueries56 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q362: p99 exceedance attribution — which event types own the
    // tail above the EXACT global p99 of value. The p99 comes from
    // the value-domain walk (q248/q351 discipline): aggregate to
    // ~50k distinct cent values, cumulative count over that tiny
    // frame, smallest value with cum >= ceil(0.99·n) — never a
    // corpus sort. Attribution per type: rows above the cut, share
    // of the global tail, and mean excess over the cut — all from
    // exact LONG sums. Two corpus scans (domain build + attribution),
    // one domain-sized window.
    Q(
      "q362_p99_exceedance",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val dom = e.groupBy("cents").agg(count(lit(1)).as("cnt"))
        val wDom = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val n1 = e.agg(count(lit(1)).as("n"))
        val p99 = dom.crossJoin(n1)
          .withColumn("cum", sum("cnt").over(wDom))
          .where(col("cum") >= expr("(99 * n + 99) div 100"))
          .agg(min("cents").as("p99"))
        val tail = e.crossJoin(p99)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("cents") > col("p99"), 1L).otherwise(0L))
              .as("n_above"),
            sum(when(col("cents") > col("p99"),
              col("cents") - col("p99")).otherwise(0L)).as("excess"),
            min("p99").as("p99c"))
        val tot = tail.agg(sum("n_above").as("tot_above"))
        tail.crossJoin(tot)
          .select(col("event_type"), col("n_events"), col("n_above"),
            Rounding.stableRound6(col("n_above").cast("double") /
              col("tot_above").cast("double")).as("tail_share"),
            when(col("n_above") > 0L,
              Rounding.stableRound6(col("excess").cast("double") /
                col("n_above").cast("double") / 100.0))
              .otherwise(lit(null).cast("double")).as("mean_excess"),
            Rounding.stableRound6(col("p99c").cast("double") / 100.0)
              .as("p99_value"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
             |dom AS (SELECT cents, count(*) AS cnt FROM e GROUP BY 1),
             |cum AS (
             |  SELECT cents, sum(cnt) OVER (ORDER BY cents
             |    ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM dom),
             |p99 AS (
             |  SELECT min(cents) AS p99 FROM cum CROSS JOIN n1
             |  WHERE cum >= (99 * n + 99) // 100),
             |tail AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CASE WHEN cents > p99 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_above,
             |    CAST(sum(CASE WHEN cents > p99 THEN cents - p99
             |      ELSE 0 END) AS BIGINT) AS excess,
             |    min(p99) AS p99c
             |  FROM e CROSS JOIN p99
             |  GROUP BY event_type),
             |tot AS (SELECT CAST(sum(n_above) AS BIGINT) AS tot_above
             |        FROM tail)
             |SELECT event_type, n_events, n_above,
             |  ${Rounding.duckSql(
                  "n_above::DOUBLE / tot_above::DOUBLE")} AS tail_share,
             |  CASE WHEN n_above > 0 THEN
             |    ${Rounding.duckSql(
                    "excess::DOUBLE / n_above::DOUBLE / 100.0")}
             |  ELSE NULL END AS mean_excess,
             |  ${Rounding.duckSql("p99c::DOUBLE / 100.0")} AS p99_value
             |FROM tail CROSS JOIN tot
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q363: difference-in-differences — the workhorse quasi-
    // experimental estimator (CUPED q335 reduces variance inside an
    // A/B test; DiD estimates treatment effect when assignment isn't
    // randomized per-exposure but a before/after boundary exists).
    // Treatment group = the q55 deterministic hash split on user_id
    // (bucket < 5000 of 10000); post period = day-of-month >= 16
    // (mid-window). Outcome = purchase value. The 2×2 cell means come
    // from exact LONG cent sums; the DiD estimate
    // (T,post − T,pre) − (C,post − C,pre) is evaluated in one fixed
    // left-to-right double expression, identical in both engines, and
    // repeated as a constant column (the q242 convention for global
    // scalars on a cell frame). One shuffle (the 2×2 groupBy).
    Q(
      "q363_did_estimator",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .select(
            when((PolyHash(concat(lit("exp7#"), col("user_id").cast("string")))
              * PolyHash(concat(lit("exp7#"), col("user_id").cast("string")))
              % 1000000007L) % 10000L < 5000L, lit("treat"))
              .otherwise(lit("control")).as("grp"),
            when(dayofmonth(col("ts").cast("timestamp")) >= 16,
              lit("post")).otherwise(lit("pre")).as("period"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val cells = e.groupBy("grp", "period")
          .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        def cell(g: String, p: String, c: String) =
          max(when(col("grp") === g && col("period") === p, col(c)))
        val did = cells.agg(
          (cell("treat", "post", "sc").cast("double") /
            cell("treat", "post", "n").cast("double") -
            cell("treat", "pre", "sc").cast("double") /
              cell("treat", "pre", "n").cast("double") -
            (cell("control", "post", "sc").cast("double") /
              cell("control", "post", "n").cast("double") -
              cell("control", "pre", "sc").cast("double") /
                cell("control", "pre", "n").cast("double")))
            .as("did_raw"))
        cells.crossJoin(did)
          .select(col("grp"), col("period"), col("n"),
            Rounding.stableRound6(col("sc").cast("double") /
              col("n").cast("double") / 100.0).as("mean_value"),
            Rounding.stableRound6(col("did_raw") / 100.0)
              .as("did_estimate"))
          .orderBy("grp", "period")
      },
      Some(s"""WITH e AS (
             |  SELECT CASE WHEN
             |      (${PolyHash.duckSql("'exp7#' || user_id::VARCHAR")}
             |       * ${PolyHash.duckSql("'exp7#' || user_id::VARCHAR")}
             |       % 1000000007) % 10000 < 5000
             |    THEN 'treat' ELSE 'control' END AS grp,
             |    CASE WHEN EXTRACT(day FROM ts::TIMESTAMP) >= 16
             |      THEN 'post' ELSE 'pre' END AS period,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events
             |  WHERE event_type = 'purchase'),
             |cells AS (
             |  SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS sc
             |  FROM e GROUP BY 1, 2),
             |did AS (
             |  SELECT
             |    max(CASE WHEN grp = 'treat' AND period = 'post'
             |      THEN sc END)::DOUBLE
             |    / max(CASE WHEN grp = 'treat' AND period = 'post'
             |      THEN n END)::DOUBLE
             |    - max(CASE WHEN grp = 'treat' AND period = 'pre'
             |      THEN sc END)::DOUBLE
             |    / max(CASE WHEN grp = 'treat' AND period = 'pre'
             |      THEN n END)::DOUBLE
             |    - (max(CASE WHEN grp = 'control' AND period = 'post'
             |      THEN sc END)::DOUBLE
             |    / max(CASE WHEN grp = 'control' AND period = 'post'
             |      THEN n END)::DOUBLE
             |    - max(CASE WHEN grp = 'control' AND period = 'pre'
             |      THEN sc END)::DOUBLE
             |    / max(CASE WHEN grp = 'control' AND period = 'pre'
             |      THEN n END)::DOUBLE) AS did_raw
             |  FROM cells)
             |SELECT grp, period, n,
             |  ${Rounding.duckSql("sc::DOUBLE / n::DOUBLE / 100.0")}
             |    AS mean_value,
             |  ${Rounding.duckSql("did_raw / 100.0")} AS did_estimate
             |FROM cells CROSS JOIN did
             |ORDER BY grp, period""".stripMargin)),

    // ------------------------------------------------------------------
    // q364: weighted reciprocity of the event-type transition digraph
    // — per user, consecutive distinct event types form directed
    // edges (the q119 session-path shape: one per-user lag window);
    // for each unordered type pair the forward/backward weights and
    // their reciprocity 2·min(w_fwd, w_rev)/(w_fwd+w_rev) say whether
    // behavior flows both ways (view↔click) or one way (click→buy) —
    // a funnel-direction audit. The grand reciprocity over all
    // ordered edges rides along as a constant column. The transition
    // matrix is (type-domain)²-sized — everything after the lag
    // window is arithmetic on ≤25 rows.
    Q(
      "q364_transition_reciprocity",
      (s, dir) => {
        val wU = Window.partitionBy("user_id").orderBy("us", "event_id")
        val tr = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"), col("event_type"))
          .withColumn("nxt", lead("event_type", 1).over(wU))
          .where(col("nxt").isNotNull && col("nxt") =!= col("event_type"))
        val w = tr.groupBy(col("event_type").as("src"),
            col("nxt").as("dst"))
          .agg(count(lit(1)).as("wt"))
        val pairs = w
          .withColumn("a", least(col("src"), col("dst")))
          .withColumn("b", greatest(col("src"), col("dst")))
          .groupBy("a", "b")
          .agg(sum(when(col("src") < col("dst"), col("wt"))
            .otherwise(0L)).as("w_fwd"),
            sum(when(col("src") > col("dst"), col("wt"))
              .otherwise(0L)).as("w_rev"))
        val grand = pairs.agg(
          (sum(least(col("w_fwd"), col("w_rev"))) * 2L).as("recip_mass"),
          sum(col("w_fwd") + col("w_rev")).as("total_mass"))
        pairs.crossJoin(grand)
          .select(col("a").as("src"), col("b").as("dst"),
            col("w_fwd"), col("w_rev"),
            Rounding.stableRound6(
              least(col("w_fwd"), col("w_rev")).cast("double") * 2.0 /
                (col("w_fwd") + col("w_rev")).cast("double"))
              .as("pair_reciprocity"),
            Rounding.stableRound6(col("recip_mass").cast("double") /
              col("total_mass").cast("double")).as("grand_reciprocity"))
          .orderBy("src", "dst")
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type AS src, nxt AS dst FROM (
             |    SELECT event_type, lead(event_type) OVER (
             |      PARTITION BY user_id
             |      ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS nxt
             |    FROM events)
             |  WHERE nxt IS NOT NULL AND nxt <> event_type),
             |w AS (
             |  SELECT src, dst, CAST(count(*) AS BIGINT) AS wt
             |  FROM tr GROUP BY 1, 2),
             |pairs AS (
             |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             |    CAST(sum(CASE WHEN src < dst THEN wt ELSE 0 END)
             |      AS BIGINT) AS w_fwd,
             |    CAST(sum(CASE WHEN src > dst THEN wt ELSE 0 END)
             |      AS BIGINT) AS w_rev
             |  FROM w GROUP BY 1, 2),
             |grand AS (
             |  SELECT CAST(2 * sum(least(w_fwd, w_rev)) AS BIGINT)
             |      AS recip_mass,
             |    CAST(sum(w_fwd + w_rev) AS BIGINT) AS total_mass
             |  FROM pairs)
             |SELECT a AS src, b AS dst, w_fwd, w_rev,
             |  ${Rounding.duckSql(
                  "least(w_fwd, w_rev)::DOUBLE * 2.0" +
                    " / (w_fwd + w_rev)::DOUBLE")} AS pair_reciprocity,
             |  ${Rounding.duckSql(
                  "recip_mass::DOUBLE / total_mass::DOUBLE")}
             |    AS grand_reciprocity
             |FROM pairs CROSS JOIN grand
             |ORDER BY src, dst""".stripMargin)),

    // ------------------------------------------------------------------
    // q365: typo-tolerant fuzzy pairs under TRUE Damerau-Levenshtein —
    // the codegen expression (graft.functions.DamerauLevenshtein,
    // pinned byte-for-byte to DuckDB's damerau_levenshtein,
    // unrestricted Lowrance-Wagner transpositions), with the r9-verdict
    // fix applied: candidates meet through the COMPOUND blocking key
    // (p_brand, position#token) — a positional-token posting join, the
    // q117 candidate shape — plus the length band |len(a)−len(b)| ≤ 3
    // (a DL≤3 match cannot differ by more). Brand-only blocking was
    // Σ(n/25)² ≈ n²/25 pairs (genuinely quadratic: 8.0M pairs at
    // sf0.1); the token posting cuts that to the posting-bucket-local
    // pair space (1.87M at sf0.1, measured), and on a real catalog —
    // bounded token document frequency — it is corpus-linear. The
    // blocking is DECLARED semantics, replayed verbatim by the oracle
    // (the q117 discipline): a DL≤3 pair sharing no same-position
    // token is out of scope by definition (on this fixture none is —
    // all 378,994 sf0.1 truth pairs share ≥1 positional token). The DL
    // evaluation itself is whole-stage codegen'd, no UDF.
    Q(
      "q365_dl_fuzzy_pairs",
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_name"))
        val toks = p
          .select(col("p_partkey").as("id"), col("p_brand"),
            length(col("p_name")).as("len"),
            posexplode(split(col("p_name"), " ")).as(Seq("i", "tok")))
          .select(col("id"), col("p_brand"), col("len"),
            concat_ws("#", (col("i") + 1).cast("string"), col("tok"))
              .as("bkey"))
        val cand = toks.as("a").join(toks.as("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.bkey") === col("b.bkey") &&
              col("a.id") < col("b.id") &&
              abs(col("a.len") - col("b.len")) <= 3)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
        cand
          .join(p.select(col("p_partkey").as("id_a"), col("p_brand"),
            col("p_name").as("name_a")), "id_a")
          .join(p.select(col("p_partkey").as("id_b"),
            col("p_name").as("name_b")), "id_b")
          .withColumn("dl", DamerauLevenshtein(col("name_a"), col("name_b")))
          .where(col("dl") <= 3 && col("dl") > 0)
          .select(col("id_a"), col("id_b"), col("p_brand"),
            col("dl").cast("long").as("dl"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH toks AS (
             |  SELECT p_partkey AS id, p_brand, length(p_name) AS len,
             |    unnest(list_transform(
             |      range(1, len(string_split(p_name, ' ')) + 1),
             |      i -> CAST(i AS VARCHAR) || '#'
             |        || string_split(p_name, ' ')[i])) AS bkey
             |  FROM part),
             |cand AS (
             |  SELECT DISTINCT a.id AS ia, b.id AS ib
             |  FROM toks a JOIN toks b
             |    ON a.p_brand = b.p_brand AND a.bkey = b.bkey
             |    AND a.id < b.id AND abs(a.len - b.len) <= 3)
             |SELECT c.ia AS id_a, c.ib AS id_b, pa.p_brand,
             |  CAST(damerau_levenshtein(pa.p_name, pb.p_name) AS BIGINT)
             |    AS dl
             |FROM cand c
             |JOIN part pa ON pa.p_partkey = c.ia
             |JOIN part pb ON pb.p_partkey = c.ib
             |WHERE damerau_levenshtein(pa.p_name, pb.p_name)
             |  BETWEEN 1 AND 3
             |ORDER BY id_a, id_b""".stripMargin))
  )
}
