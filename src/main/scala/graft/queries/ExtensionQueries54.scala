package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-9 twelfth wave: four analytics families the registry did not
  * cover yet — a clamped (non-linear) running balance computed through
  * its associative parallel-scan identity (q354), graph degree
  * assortativity as exact LONG moments (q355), Borda rank fusion with
  * ranks derived by broadcast counting instead of a global sort (q356),
  * and deterministic UCB1 bandit allocation scores (q357). Same
  * contract as every other module: each Spark pipeline pairs with
  * DuckDB oracle SQL replaying it bit-exactly.
  */
object ExtensionQueries54 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q354: clamped running balance — per-user ledger where purchases
    // deposit value and clicks/views consume it, with the balance
    // floored at zero: b_i = max(0, b_{i-1} + x_i). The recurrence
    // looks inherently sequential, but it has an exact associative
    // form: b_i = S_i - min(0, min_{j<=i} S_j) where S is the plain
    // prefix sum — so the whole thing is two per-key running windows
    // (cumsum + running-min of the cumsum), both parallel scans, no
    // mapGroups state and no driver loop. All arithmetic in exact
    // integer cents (the q248 discipline), so both engines agree to
    // the bit. Per-user summary: final balance (= total - clamp
    // correction, no last_value needed), peak balance, and how often
    // a consumption event hit the floor (demand the ledger rejected).
    // Scale: per-key windows — partitions by user, never a global
    // sort; the identity is exactly how a 1000-executor prefix-scan
    // would compute it.
    Q(
      "q354_clamped_running_balance",
      (s, dir) => {
        val cents = floor(col("value") * 100 + 0.5).cast("long")
        val e = Tables.load(s, dir, "events")
          .where(col("event_type").isin("purchase", "click", "view"))
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"),
            col("event_id"),
            when(col("event_type") === "purchase", cents)
              .otherwise(-cents).as("dx"))
        val run = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val scanned = e
          .withColumn("ps", sum("dx").over(run))
          .withColumn("b",
            col("ps") - least(lit(0L), min("ps").over(run)))
        scanned.groupBy("user_id")
          .agg(count(lit(1)).as("n_tx"),
            (sum("dx") - least(lit(0L), min("ps"))).as("final_cents"),
            max("b").as("peak_cents"),
            sum(when(col("b") === 0L && col("dx") < 0L, 1L)
              .otherwise(0L)).as("floor_hits"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us, event_id,
             |    CASE WHEN event_type = 'purchase'
             |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
             |      ELSE -CAST(floor(value * 100 + 0.5) AS BIGINT)
             |    END AS dx
             |  FROM events
             |  WHERE event_type IN ('purchase', 'click', 'view')),
             |w1 AS (
             |  SELECT user_id, us, event_id, dx,
             |    sum(dx) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS UNBOUNDED PRECEDING) AS ps
             |  FROM e),
             |w2 AS (
             |  SELECT user_id, dx, ps,
             |    ps - least(0, min(ps) OVER (
             |      PARTITION BY user_id ORDER BY us, event_id
             |      ROWS UNBOUNDED PRECEDING)) AS b
             |  FROM w1)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_tx,
             |  CAST(sum(dx) - least(0, min(ps)) AS BIGINT) AS final_cents,
             |  CAST(max(b) AS BIGINT) AS peak_cents,
             |  CAST(sum(CASE WHEN b = 0 AND dx < 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS floor_hits
             |FROM w2
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q355: degree assortativity of the co-purchase graph — Pearson
    // correlation between the degrees at the two ends of each edge
    // (Newman's r): positive = hubs link to hubs (a connectivity risk
    // for dedup clustering and recommendation diversity), negative =
    // hub-and-spoke. Edges are q288's support>=2 co-purchase pairs.
    // Listing each undirected edge in BOTH directions makes the x and
    // y marginals identical, so r collapses to
    // (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) over exact LONG moment sums —
    // degrees and counts are integers, so both engines agree exactly
    // before the single rounded division. Scale: two keyed joins
    // (edge ⋈ degree on each endpoint) + one scalar agg; degree sums
    // fit LONG up to ~3e9 edges × deg² ~ 1e9 — beyond that the same
    // moments move to DECIMAL(38,0), no shape change.
    Q(
      "q355_degree_assortativity",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val co = li.join(li.toDF("l_orderkey", "p2"), "l_orderkey")
          .where(col("l_partkey") < col("p2"))
          .groupBy(col("l_partkey").as("a"), col("p2").as("b"))
          .agg(count(lit(1)).as("sup"))
          .where(col("sup") >= 2)
          .select("a", "b")
        val und = co.select(col("a").as("src"), col("b").as("dst"))
          .union(co.select(col("b").as("src"), col("a").as("dst")))
        val deg = und.groupBy("src").agg(count(lit(1)).as("d"))
        val ends = und
          .join(deg, "src")
          .join(deg.toDF("dst", "d2"), "dst")
        val nodes = deg.agg(count(lit(1)).as("n_nodes"))
        ends
          .agg(count(lit(1)).as("m2"), sum("d").as("sx"),
            sum(col("d") * col("d")).as("sxx"),
            sum(col("d") * col("d2")).as("sxy"))
          .crossJoin(nodes)
          .select(col("n_nodes").cast("long").as("n_nodes"),
            (col("m2") / 2).cast("long").as("n_edges"),
            when(col("m2") * col("sxx") - col("sx") * col("sx") =!= 0L,
              Rounding.stableRound6(
                (col("m2") * col("sxy") - col("sx") * col("sx"))
                  .cast("double") /
                  (col("m2") * col("sxx") - col("sx") * col("sx"))
                    .cast("double")))
              .otherwise(lit(null).cast("double")).as("assortativity"))
      },
      Some(s"""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |co AS (
             |  SELECT a.l_partkey AS a, b.l_partkey AS b
             |  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2
             |  HAVING count(*) >= 2),
             |und AS (
             |  SELECT a AS src, b AS dst FROM co
             |  UNION ALL SELECT b AS src, a AS dst FROM co),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
             |        FROM und GROUP BY src),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS m2,
             |    CAST(sum(x.d) AS BIGINT) AS sx,
             |    CAST(sum(x.d * x.d) AS BIGINT) AS sxx,
             |    CAST(sum(x.d * y.d) AS BIGINT) AS sxy
             |  FROM und
             |  JOIN deg x ON x.src = und.src
             |  JOIN deg y ON y.src = und.dst),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
             |SELECT n.n_nodes, CAST(m.m2 / 2 AS BIGINT) AS n_edges,
             |  CASE WHEN m.m2 * m.sxx - m.sx * m.sx <> 0
             |    THEN ${Rounding.duckSql(
                    "(m.m2 * m.sxy - m.sx * m.sx)::DOUBLE" +
                      " / (m.m2 * m.sxx - m.sx * m.sx)::DOUBLE")}
             |    ELSE NULL END AS assortativity
             |FROM m CROSS JOIN n""".stripMargin)),

    // ------------------------------------------------------------------
    // q356: Borda rank fusion of supplier leaderboards — three
    // rankings (revenue cents, distinct parts supplied, shipment
    // count) fused into one by Borda count (score N − rank per list,
    // summed). The scale discipline is the point: candidate set =
    // union of the three top-50 lists (TakeOrderedAndProject — never
    // a global sort), and each candidate's EXACT full-population rank
    // is computed by broadcast counting — one pass over the supplier
    // frame counting strictly-better rows per candidate — instead of
    // ranking all N suppliers (the q30x "rank of few among many"
    // shape; the fused winner is by construction inside some top-50
    // list's candidates, the declared fusion semantics of top-k rank
    // fusion, same contract as q180's RRF). All metrics are exact
    // LONGs, so ranks and Borda scores are integer-deterministic with
    // a full (score DESC, suppkey) tiebreak.
    Q(
      "q356_borda_fusion",
      (s, dir) => {
        val f = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_suppkey").as("sk"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev_cents"),
            countDistinct("l_partkey").as("n_parts"),
            count(lit(1)).as("n_ships"))
        def top(c: String) =
          f.orderBy(col(c).desc, col("sk")).limit(50).select("sk")
        val cand = top("rev_cents").union(top("n_parts"))
          .union(top("n_ships")).distinct()
        val c2 = f.join(cand, "sk")
          .select(col("sk").as("ck"), col("rev_cents").as("c_rev"),
            col("n_parts").as("c_parts"), col("n_ships").as("c_ships"))
        def better(m: String, cm: String) =
          col(m) > col(cm) || (col(m) === col(cm) && col("sk") < col("ck"))
        f.crossJoin(broadcast(c2))
          .groupBy("ck")
          .agg((sum(when(better("rev_cents", "c_rev"), 1L).otherwise(0L))
            + 1L).as("r_rev"),
            (sum(when(better("n_parts", "c_parts"), 1L).otherwise(0L))
              + 1L).as("r_parts"),
            (sum(when(better("n_ships", "c_ships"), 1L).otherwise(0L))
              + 1L).as("r_ships"),
            count(lit(1)).as("n_sup"))
          .select(col("ck").as("s_suppkey"), col("r_rev"), col("r_parts"),
            col("r_ships"),
            (lit(3L) * col("n_sup") - col("r_rev") - col("r_parts")
              - col("r_ships")).as("borda"))
          .orderBy(col("borda").desc, col("s_suppkey"))
          .limit(10)
      },
      Some("""WITH f AS (
             |  SELECT l_suppkey AS sk,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS rev_cents,
             |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |    CAST(count(*) AS BIGINT) AS n_ships
             |  FROM lineitem GROUP BY 1),
             |cand AS (
             |  SELECT sk FROM
             |    (SELECT sk FROM f ORDER BY rev_cents DESC, sk LIMIT 50)
             |  UNION SELECT sk FROM
             |    (SELECT sk FROM f ORDER BY n_parts DESC, sk LIMIT 50)
             |  UNION SELECT sk FROM
             |    (SELECT sk FROM f ORDER BY n_ships DESC, sk LIMIT 50)),
             |c2 AS (SELECT f.* FROM f JOIN cand USING (sk)),
             |r AS (
             |  SELECT c.sk AS ck,
             |    1 + sum(CASE WHEN t.rev_cents > c.rev_cents
             |      OR (t.rev_cents = c.rev_cents AND t.sk < c.sk)
             |      THEN 1 ELSE 0 END) AS r_rev,
             |    1 + sum(CASE WHEN t.n_parts > c.n_parts
             |      OR (t.n_parts = c.n_parts AND t.sk < c.sk)
             |      THEN 1 ELSE 0 END) AS r_parts,
             |    1 + sum(CASE WHEN t.n_ships > c.n_ships
             |      OR (t.n_ships = c.n_ships AND t.sk < c.sk)
             |      THEN 1 ELSE 0 END) AS r_ships,
             |    count(*) AS n_sup
             |  FROM c2 c CROSS JOIN f t
             |  GROUP BY c.sk)
             |SELECT ck AS s_suppkey, CAST(r_rev AS BIGINT) AS r_rev,
             |  CAST(r_parts AS BIGINT) AS r_parts,
             |  CAST(r_ships AS BIGINT) AS r_ships,
             |  CAST(3 * n_sup - r_rev - r_parts - r_ships AS BIGINT)
             |    AS borda
             |FROM r
             |ORDER BY borda DESC, s_suppkey
             |LIMIT 10""".stripMargin)),

    // ------------------------------------------------------------------
    // q357: UCB1 bandit allocation scores — treat each event_type as
    // an arm, reward = value clipped to [0, 500] and normalized to
    // [0, 1] (UCB1's reward-range assumption), and score each arm
    // with mean + sqrt(2·ln N / n): the arm a UCB1 agent pulls next.
    // Deterministic by construction — means are exact LONG cent sums
    // before one double division, and the chosen flag compares scores
    // AFTER snapping to the 1e-6 LONG grid (both engines see the same
    // integers), via a window over the 5-arm frame (arm-domain-sized,
    // the q228 convention). One groupBy + a 1-row broadcast — the
    // whole query is a single shuffle at any scale.
    Q(
      "q357_ucb1_allocation",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"),
            least(lit(50000L),
              floor(col("value") * 100 + 0.5).cast("long")).as("rc"))
        val tot = e.agg(count(lit(1)).as("nn"))
        val scored = e.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("rc").as("src"))
          .crossJoin(tot)
          .withColumn("mean01",
            col("src").cast("double") / col("n").cast("double") / 50000.0)
          .withColumn("bonus",
            sqrt(lit(2.0) * log(col("nn").cast("double"))
              / col("n").cast("double")))
          .withColumn("u6",
            floor((col("mean01") + col("bonus")) * 1e6 + 0.5).cast("long"))
        scored
          .withColumn("chosen",
            col("u6") === max("u6").over(Window.partitionBy()))
          .select(col("event_type"), col("n"),
            Rounding.stableRound6(col("mean01")).as("mean_reward"),
            Rounding.stableRound6(col("bonus")).as("explore_bonus"),
            (col("u6").cast("double") / 1e6).as("ucb"),
            col("chosen"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (
             |  SELECT event_type,
             |    least(50000, CAST(floor(value * 100 + 0.5) AS BIGINT))
             |      AS rc
             |  FROM events),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM e),
             |g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(rc) AS BIGINT) AS src
             |  FROM e GROUP BY 1),
             |sc AS (
             |  SELECT event_type, n,
             |    src::DOUBLE / n::DOUBLE / 50000.0 AS mean01,
             |    sqrt(2.0 * ln(nn::DOUBLE) / n::DOUBLE) AS bonus
             |  FROM g CROSS JOIN tot),
             |u AS (
             |  SELECT event_type, n, mean01, bonus,
             |    CAST(floor((mean01 + bonus) * 1e6 + 0.5) AS BIGINT) AS u6
             |  FROM sc)
             |SELECT event_type, n,
             |  ${Rounding.duckSql("mean01")} AS mean_reward,
             |  ${Rounding.duckSql("bonus")} AS explore_bonus,
             |  u6::DOUBLE / 1e6 AS ucb,
             |  u6 = max(u6) OVER () AS chosen
             |FROM u
             |ORDER BY event_type""".stripMargin))
  )
}
