package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}
import graft.io.Tables

/** Round-9 twenty-seventh wave: the model-evaluation family — a trained
  * multinomial Naive-Bayes language classifier (q414), a decision-stump
  * split advisor (q415), a group-fairness audit (q416), and the
  * unbiased pass@k estimator (q417).
  */
object ExtensionQueries69 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q414: multinomial Naive Bayes language ID, trained and evaluated
    // inside the engine: an 80/20 leakage-safe PolyHash split, char-
    // bigram features (the q270 extraction), Laplace-smoothed per-class
    // log-likelihoods over the TRAIN vocabulary, and per-language test
    // accuracy. Determinism discipline: every log term is snapped to
    // the 1e-9 LONG grid BEFORE summation (the q270 trick), so each
    // (doc, class) score is an exact integer — the argmax can never
    // flip on cross-engine last-ulp drift — and ties break on class
    // name. The dense (class × vocab) likelihood grid is alphabet²·k
    // bounded, a broadcast frame at any corpus size; OOV test bigrams
    // are dropped by the inner join (standard multinomial NB).
    Q(
      "q414_naive_bayes_langid",
      (s, dir) => {
        val docs = Tables.loadParallel(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
          .withColumn("h",
            PolyHash(concat(lit("nb#"), col("doc_id").cast("string"))))
          // h² % Mod uniformizes the low digits (the q402 discipline —
          // raw PolyHash mod small k is skewed)
          .withColumn("is_test",
            col("h") * col("h") % lit(PolyHash.Mod) % lit(5L) === 0L)
        val pairs = docs.select(col("doc_id"), col("lang"), col("is_test"),
          explode(expr(
            "filter(transform(sequence(1, length(text) - 1), " +
              "i -> substring(text, i, 2)), p -> length(p) = 2)"))
            .as("pair"))
        // r14 note (guide §1.2 "measure first"): three rewrites of this
        // pipeline were measured and REJECTED — (a) a shared
        // per-(doc, pair) count frame feeding both the train and test
        // subtrees (flat: AQE never reuses the shared exchange here, so
        // it only added a shuffle per pass), (b) the same with a
        // localCheckpoint (SLOWER: 25 stages/60 tasks and the RDD-block
        // rescans + re-shuffles of the 250k-row frame cost more than
        // the codegen'd explode re-runs), (c) a parallelizing
        // repartition after the read (SLOWER: 274 tasks of scheduling
        // for sub-second map work). Left in its original two-branch
        // shape on purpose.
        // r15 re-measured (c) AFTER the trainCnt pin below: with the
        // explode running 2x instead of 5x, fanning the single-split
        // scan out (loadParallel above) now WINS — 2.78s -> 2.36s at
        // 32c (the r14 rejection was sound for the 5x shape; the pin
        // changed the calculus). The same sweep kept loadParallel OFF
        // q110/q162/q235/q243/q269 (all 0.07-0.62s slower — map sides
        // too cheap to pay the exchange).
        // r15: what r14 never tried is pinning trainCnt ITSELF — the
        // (cls, pair) aggregate is alphabet²·k bounded (the "small
        // aggregated frame over heavy upstream" profile that won on
        // q302/q345), and five consumers re-ran its explode+groupBy
        // subtree (vocab, vSize, classes, classTot, the grid join).
        // Isolated min-of-5 at 32 cores: 3.30-3.40s → 2.78s; explode
        // passes 5 → 2 (train + test). Unlike r14's (b), the wide
        // per-doc frame is never materialized.
        val trainCnt = pairs.where(!col("is_test"))
          .groupBy(col("lang").as("cls"), col("pair"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val vocab = trainCnt.select("pair").distinct()
        val vSize = vocab.agg(count(lit(1)).as("v"))
        val classes = trainCnt.select("cls").distinct()
        val classTot = trainCnt.groupBy("cls").agg(sum("cnt").as("tot"))
        val grid = vocab.crossJoin(classes)
          .join(trainCnt, Seq("pair", "cls"), "left")
          .na.fill(0L, Seq("cnt"))
          .join(classTot, "cls").crossJoin(broadcast(vSize))
          .withColumn("logp9",
            floor(log((col("cnt").cast("double") + 1.0) /
              (col("tot").cast("double") + col("v").cast("double")))
              * lit(1e9) + 0.5).cast("long"))
          .select("pair", "cls", "logp9")
        val nTrainDocs = docs.where(!col("is_test"))
          .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("nd"))
        val prior9 = nTrainDocs
          .crossJoin(broadcast(docs.where(!col("is_test"))
            .agg(count(lit(1)).as("d"))))
          .withColumn("prior9",
            floor(log(col("nd").cast("double") / col("d").cast("double"))
              * lit(1e9) + 0.5).cast("long"))
          .select("cls", "prior9")
        val testPairs = pairs.where(col("is_test"))
          .groupBy("doc_id", "lang", "pair").agg(count(lit(1)).as("c"))
        val scores = testPairs.join(broadcast(grid), "pair")
          .groupBy("doc_id", "lang", "cls")
          .agg(sum(col("c") * col("logp9")).as("ll9"))
          .join(broadcast(prior9), "cls")
          .withColumn("score9", col("ll9") + col("prior9"))
        val pred = scores
          .withColumn("mx", max("score9")
            .over(Window.partitionBy("doc_id")))
          .where(col("score9") === col("mx"))
          .groupBy("doc_id", "lang").agg(min("cls").as("predicted"))
        pred.groupBy("lang").agg(count(lit(1)).as("n_test"),
            sum(when(col("predicted") === col("lang"), 1L).otherwise(0L))
              .as("n_correct"))
          .select(col("lang"), col("n_test"), col("n_correct"),
            Rounding.stableRound6(col("n_correct").cast("double") /
              col("n_test").cast("double")).as("accuracy"))
          .orderBy("lang")
      },
      Some {
        val h = PolyHash.duckSql("'nb#' || doc_id::VARCHAR")
        s"""WITH docs AS (
           |  SELECT doc_id, lang, text,
           |    $h * $h % ${PolyHash.Mod} % 5 = 0 AS is_test
           |  FROM documents),
           |pairs AS (
           |  SELECT doc_id, lang, is_test,
           |    unnest(list_filter(list_transform(range(1, length(text)),
           |      i -> substr(text, i, 2)), p -> length(p) = 2)) AS pair
           |  FROM docs),
           |tc AS (
           |  SELECT lang AS cls, pair, CAST(count(*) AS BIGINT) AS cnt
           |  FROM pairs WHERE NOT is_test GROUP BY 1, 2),
           |vocab AS (SELECT DISTINCT pair FROM tc),
           |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
           |cls AS (SELECT DISTINCT cls FROM tc),
           |ct AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tot
           |       FROM tc GROUP BY 1),
           |grid AS (
           |  SELECT vocab.pair, cls.cls,
           |    CAST(floor(ln((coalesce(tc.cnt, 0)::DOUBLE + 1.0) /
           |      (ct.tot::DOUBLE + vs.v::DOUBLE)) * 1000000000 + 0.5)
           |      AS BIGINT) AS logp9
           |  FROM vocab CROSS JOIN cls
           |  LEFT JOIN tc ON tc.pair = vocab.pair AND tc.cls = cls.cls
           |  JOIN ct ON ct.cls = cls.cls
           |  CROSS JOIN vs),
           |ndoc AS (
           |  SELECT lang AS cls, CAST(count(*) AS BIGINT) AS nd
           |  FROM docs WHERE NOT is_test GROUP BY 1),
           |dtot AS (SELECT CAST(count(*) AS BIGINT) AS d
           |         FROM docs WHERE NOT is_test),
           |prior AS (
           |  SELECT cls, CAST(floor(ln(nd::DOUBLE / d::DOUBLE)
           |    * 1000000000 + 0.5) AS BIGINT) AS prior9
           |  FROM ndoc CROSS JOIN dtot),
           |tp AS (
           |  SELECT doc_id, lang, pair, CAST(count(*) AS BIGINT) AS c
           |  FROM pairs WHERE is_test GROUP BY 1, 2, 3),
           |sc AS (
           |  SELECT tp.doc_id, tp.lang, grid.cls,
           |    CAST(sum(tp.c * grid.logp9) AS BIGINT)
           |      + any_value(prior.prior9) AS score9
           |  FROM tp JOIN grid ON grid.pair = tp.pair
           |  JOIN prior ON prior.cls = grid.cls
           |  GROUP BY 1, 2, 3),
           |pred AS (
           |  SELECT doc_id, lang, min(cls) AS predicted
           |  FROM (SELECT *, max(score9) OVER (PARTITION BY doc_id) AS mx
           |        FROM sc)
           |  WHERE score9 = mx
           |  GROUP BY 1, 2)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_test,
           |  CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_correct,
           |  ${Rounding.duckSql(
                "sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END)::DOUBLE" +
                  " / count(*)::DOUBLE")} AS accuracy
           |FROM pred
           |GROUP BY lang
           |ORDER BY lang""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q415: decision-stump split advisor — the first split a gradient-
    // boosted tree would make: for every candidate threshold t over the
    // l_quantity VALUE DOMAIN (≤50 integers), the weighted Gini
    // impurity of {qty ≤ t} vs {qty > t} predicting returnflag = 'R'.
    // Left/right class counts come from ONE cumulative walk over the
    // (quantity → count, positives) domain frame — never a per-
    // threshold rescan — and the Gini arithmetic is fixed double ops
    // on exact LONGs. Emits each threshold's impurity, the information
    // gain vs the parent, and the argmin flag.
    Q(
      "q415_decision_stump",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("qty"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
        val dom = li.groupBy("qty")
          .agg(count(lit(1)).as("n_v"), sum("pos").as("pos_v"))
          .withColumn("nl", sum("n_v").over(Window.orderBy("qty")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("posl", sum("pos_v").over(Window.orderBy("qty")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = dom.agg(max("nl").as("n"), max("posl").as("p"))
        val g = dom.crossJoin(broadcast(tot))
          .where(col("nl") < col("n"))
          .withColumn("nr", col("n") - col("nl"))
          .withColumn("posr", col("p") - col("posl"))
          .withColumn("gl", lit(1.0)
            - (col("posl").cast("double") * col("posl").cast("double")
              + (col("nl") - col("posl")).cast("double")
                * (col("nl") - col("posl")).cast("double"))
              / (col("nl").cast("double") * col("nl").cast("double")))
          .withColumn("gr", lit(1.0)
            - (col("posr").cast("double") * col("posr").cast("double")
              + (col("nr") - col("posr")).cast("double")
                * (col("nr") - col("posr")).cast("double"))
              / (col("nr").cast("double") * col("nr").cast("double")))
          .withColumn("gw", (col("nl").cast("double") * col("gl")
            + col("nr").cast("double") * col("gr"))
            / col("n").cast("double"))
          .withColumn("gp", lit(1.0)
            - (col("p").cast("double") * col("p").cast("double")
              + (col("n") - col("p")).cast("double")
                * (col("n") - col("p")).cast("double"))
              / (col("n").cast("double") * col("n").cast("double")))
          .withColumn("best", min("gw").over(Window.partitionBy()))
        g.select(col("qty").as("threshold"), col("nl").as("n_left"),
            col("nr").as("n_right"),
            Rounding.stableRound6(col("gw")).as("gini_weighted"),
            Rounding.stableRound6(col("gp") - col("gw")).as("info_gain"),
            (col("gw") === col("best")).as("is_best"))
          .orderBy("threshold")
      },
      Some(s"""WITH li AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS qty,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
             |  FROM lineitem),
             |dom AS (
             |  SELECT qty, count(*) AS n_v, sum(pos) AS pos_v
             |  FROM li GROUP BY qty),
             |cw AS (
             |  SELECT qty,
             |    CAST(sum(n_v) OVER w AS BIGINT) AS nl,
             |    CAST(sum(pos_v) OVER w AS BIGINT) AS posl
             |  FROM dom
             |  WINDOW w AS (ORDER BY qty ROWS UNBOUNDED PRECEDING)),
             |tot AS (SELECT max(nl) AS n, max(posl) AS p FROM cw),
             |g AS (
             |  SELECT qty, nl, posl, n - nl AS nr, p - posl AS posr,
             |    n, p,
             |    1.0 - (posl::DOUBLE * posl::DOUBLE
             |      + (nl - posl)::DOUBLE * (nl - posl)::DOUBLE)
             |      / (nl::DOUBLE * nl::DOUBLE) AS gl,
             |    1.0 - ((p - posl)::DOUBLE * (p - posl)::DOUBLE
             |      + ((n - nl) - (p - posl))::DOUBLE
             |        * ((n - nl) - (p - posl))::DOUBLE)
             |      / ((n - nl)::DOUBLE * (n - nl)::DOUBLE) AS gr,
             |    1.0 - (p::DOUBLE * p::DOUBLE
             |      + (n - p)::DOUBLE * (n - p)::DOUBLE)
             |      / (n::DOUBLE * n::DOUBLE) AS gp
             |  FROM cw CROSS JOIN tot
             |  WHERE nl < n),
             |w AS (
             |  SELECT *, (nl::DOUBLE * gl + nr::DOUBLE * gr) / n::DOUBLE
             |    AS gw
             |  FROM g)
             |SELECT qty AS threshold, nl AS n_left, nr AS n_right,
             |  ${Rounding.duckSql("gw")} AS gini_weighted,
             |  ${Rounding.duckSql("gp - gw")} AS info_gain,
             |  gw = min(gw) OVER () AS is_best
             |FROM w
             |ORDER BY threshold""".stripMargin)),

    // ------------------------------------------------------------------
    // q416: group-fairness audit — the demographic-parity and
    // equalized-odds lenses a training-data selection rule must pass
    // before shipping: with selection = "word count ≥ 45" and the
    // outcome label "n_chars ≥ 300", report per language the selection
    // rate, TPR, FPR, and each one's gap vs the corpus-wide rate.
    // All rates are exact-count ratios; zero-denominator cells emit
    // NULL through an explicit CASE (never an engine-specific inf).
    // One scan, one groupBy(lang), one broadcast totals frame.
    Q(
      "q416_fairness_audit",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("lang"),
            (size(split(trim(col("text")), " +")) >= 45).as("sel"),
            (col("n_chars") >= 300).as("pos"))
        val byG = d.groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum(when(col("sel"), 1L).otherwise(0L)).as("n_sel"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("sel") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("sel") && !col("pos"), 1L).otherwise(0L)).as("fp"))
          .localCheckpoint()
        val tot = byG.agg(sum("n").as("tn"), sum("n_sel").as("tsel"),
          sum("n_pos").as("tpos"), sum("tp").as("ttp"),
          sum("fp").as("tfp"))
        def rate(num: org.apache.spark.sql.Column,
            den: org.apache.spark.sql.Column) =
          when(den > 0L, Rounding.stableRound6(
            num.cast("double") / den.cast("double")))
            .otherwise(lit(null).cast("double"))
        byG.crossJoin(broadcast(tot))
          .select(col("lang"), col("n"),
            rate(col("n_sel"), col("n")).as("selection_rate"),
            rate(col("tp"), col("n_pos")).as("tpr"),
            rate(col("fp"), col("n") - col("n_pos")).as("fpr"),
            Rounding.stableRound6(col("n_sel").cast("double")
              / col("n").cast("double") - col("tsel").cast("double")
              / col("tn").cast("double")).as("dp_gap"),
            Rounding.stableRound6(col("tp").cast("double")
              / col("n_pos").cast("double") - col("ttp").cast("double")
              / col("tpos").cast("double")).as("eo_gap"))
          .orderBy("lang")
      },
      Some(s"""WITH d AS (
             |  SELECT lang,
             |    length(string_split_regex(trim(text), ' +')) >= 45 AS sel,
             |    n_chars >= 300 AS pos
             |  FROM documents),
             |g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_sel,
             |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_pos,
             |    CAST(sum(CASE WHEN sel AND pos THEN 1 ELSE 0 END)
             |      AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN sel AND NOT pos THEN 1 ELSE 0 END)
             |      AS BIGINT) AS fp
             |  FROM d GROUP BY lang),
             |t AS (
             |  SELECT sum(n) AS tn, sum(n_sel) AS tsel,
             |    sum(n_pos) AS tpos, sum(tp) AS ttp, sum(fp) AS tfp
             |  FROM g)
             |SELECT lang, n,
             |  CASE WHEN n > 0 THEN
             |    ${Rounding.duckSql("n_sel::DOUBLE / n::DOUBLE")}
             |    ELSE NULL END AS selection_rate,
             |  CASE WHEN n_pos > 0 THEN
             |    ${Rounding.duckSql("tp::DOUBLE / n_pos::DOUBLE")}
             |    ELSE NULL END AS tpr,
             |  CASE WHEN n - n_pos > 0 THEN
             |    ${Rounding.duckSql("fp::DOUBLE / (n - n_pos)::DOUBLE")}
             |    ELSE NULL END AS fpr,
             |  ${Rounding.duckSql(
                  "n_sel::DOUBLE / n::DOUBLE - tsel::DOUBLE / tn::DOUBLE")}
             |    AS dp_gap,
             |  ${Rounding.duckSql(
                  "tp::DOUBLE / n_pos::DOUBLE - ttp::DOUBLE / tpos::DOUBLE")}
             |    AS eo_gap
             |FROM g CROSS JOIN t
             |ORDER BY lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q417: unbiased pass@k — the code-eval estimator (Chen et al.,
    // 2021): per task with n trials and c successes,
    // pass@k = 1 − C(n−c,k)/C(n,k), computed in the overflow-free
    // product form 1 − Π(n−c−i)/(n−i), i<k — a LEFT FOLD in both
    // engines (Spark `aggregate`, DuckDB `list_reduce`) so the IEEE op
    // sequence matches. Tasks = users, a trial = an event, success =
    // purchase; tasks with n < k are excluded (the estimator is
    // undefined), n−c < k short-circuits to exactly 1.0. Each task's
    // estimate snaps to the 1e-9 LONG grid before the corpus mean, so
    // the aggregate is order-independent.
    Q(
      "q417_pass_at_k",
      (s, dir) => {
        val t = Tables.load(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("c"))
        import s.implicits._
        val ks = Seq(1L, 5L, 10L).toDF("k")
        val per = t.crossJoin(broadcast(ks))
          .where(col("n") >= col("k"))
          .withColumn("pass", when(col("n") - col("c") < col("k"), 1.0)
            .otherwise(lit(1.0) - expr(
              "aggregate(sequence(0L, k - 1L), CAST(1.0 AS DOUBLE), " +
                "(acc, i) -> acc * (CAST(n - c - i AS DOUBLE) " +
                "/ CAST(n - i AS DOUBLE)))")))
          .withColumn("pass9",
            floor(col("pass") * lit(1e9) + 0.5).cast("long"))
        per.groupBy("k").agg(count(lit(1)).as("n_tasks"),
            sum("n").as("sum_trials"), sum("pass9").as("sp9"))
          .select(col("k"), col("n_tasks"),
            Rounding.stableRound6(col("sum_trials").cast("double")
              / col("n_tasks").cast("double")).as("mean_trials"),
            Rounding.stableRound6(col("sp9").cast("double")
              / col("n_tasks").cast("double") / lit(1e9)).as("pass_at_k"))
          .orderBy("k")
      },
      Some(s"""WITH t AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS c
             |  FROM events GROUP BY user_id),
             |ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
             |per AS (
             |  SELECT k, n,
             |    CAST(floor((CASE WHEN n - c < k THEN 1.0
             |      ELSE 1.0 - list_reduce(list_transform(range(0, k),
             |        i -> (n - c - i)::DOUBLE / (n - i)::DOUBLE),
             |        (a, b) -> a * b)
             |      END) * 1000000000 + 0.5) AS BIGINT) AS pass9
             |  FROM t CROSS JOIN ks
             |  WHERE n >= k)
             |SELECT k, CAST(count(*) AS BIGINT) AS n_tasks,
             |  ${Rounding.duckSql("sum(n)::DOUBLE / count(*)::DOUBLE")}
             |    AS mean_trials,
             |  ${Rounding.duckSql(
                  "sum(pass9)::DOUBLE / count(*)::DOUBLE / 1000000000")}
             |    AS pass_at_k
             |FROM per
             |GROUP BY k
             |ORDER BY k""".stripMargin))
  )
}
