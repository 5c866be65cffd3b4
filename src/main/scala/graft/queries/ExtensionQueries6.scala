package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, SimilaritySearch}
import graft.functions.Rounding
import graft.io.Tables
import graft.ops.Text

/** Round-6 wave: config-file job dispatch (q128) and the round's new
  * operators. Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries6 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q128: config-file job dispatch — the reference's literal entry
    // point (`input_info.json` + `master.py:178-198`): a JSON spec names
    // the input file and the job; the engine loads the spec and runs the
    // registered pipeline (api.JobConfig). The gate writes a spec that
    // is field-for-field the reference's shape (mapper_file/reducer_file
    // script names, stringly-typed counts) pointing word_count at the
    // reference corpus, dispatches it, and the oracle replays q34's
    // independent DuckDB word count — so the whole load→resolve→dispatch
    // path is hash-gated, not just the job underneath it.
    Q(
      "q128_job_config_dispatch",
      (s, _) => {
        val dir = java.nio.file.Files.createTempDirectory("graft_jobspec")
        val cfg = dir.resolve("input_info.json")
        java.nio.file.Files.writeString(cfg,
          s"""{
             |  "input_file_location" : "${TextQueries.ReferenceCorpus}",
             |  "no_of_mappers" : "3",
             |  "no_of_reducers" : "3",
             |  "mapper_file" : "mapper_word_count.py",
             |  "reducer_file" : "reducer_word_count.py"
             |}""".stripMargin)
        // JobConfig.run parses the spec eagerly (plain-Java read), so the
        // temp dir can go as soon as it returns — repeated verify/bench
        // runs must not leak a graft_jobspec dir per invocation
        try graft.api.JobConfig.run(s, cfg.toString).orderBy("word")
        finally {
          java.nio.file.Files.deleteIfExists(cfg)
          java.nio.file.Files.deleteIfExists(dir)
          ()
        }
      },
      Some(s"""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(string_split_regex(
             |    regexp_replace(content, '[^a-zA-Z0-9 \\n]', '', 'g'), '[ \\n]')) AS word
             |  FROM read_text('${TextQueries.ReferenceCorpus}'))
             |WHERE word <> ''
             |GROUP BY word
             |ORDER BY word""".stripMargin)),

    // ------------------------------------------------------------------
    // q129: BM25 retrieval scoring — the ranking function behind every
    // lexical search/retrieval stack (and the retrieval half of RAG
    // corpus curation). Query = fixed term set; score(d) = Σ_t idf(t) ·
    // tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with the Lucene "+1" idf.
    // Scale shape: one corpus scan builds doc lengths AND query-term
    // tfs (the term filter prunes the explode before the shuffle);
    // df/N/avgdl are term-count- and 1-row-sized broadcasts. No window,
    // no second corpus scan (dl aggregates from the same exploded scan;
    // Catalyst reuses nothing between lazy frames, so dl and tf are
    // built from one grouped pass each — tf's input is the FILTERED
    // token stream, dl's the unfiltered counts, both keyed on doc_id).
    Q(
      "q129_bm25",
      (s, dir) => {
        val k1 = 1.2
        val b = 0.75
        val terms = Seq("spark", "join", "window")
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          explode(Text.words(Text.clean(col("text")))).as("word"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val tf = toks.where(col("word").isin(terms: _*))
          .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("word")
          .agg(countDistinct("doc_id").as("df"))
        val stats = docs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(dl.agg(sum("dl").as("sum_dl")))
        val idf = log(
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
        val norm = col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") /
            (col("sum_dl").cast("double") / col("n_docs")))
        tf.join(dl, "doc_id")
          .join(broadcast(dfreq), "word")
          .crossJoin(broadcast(stats))
          .withColumn("contrib", idf * col("tf") * (k1 + 1.0) / norm)
          .groupBy("doc_id")
          .agg(Rounding.stableRound6(sum("contrib")).as("bm25"))
          .orderBy(desc("bm25"), col("doc_id"))
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS word
             |  FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks
             |       WHERE word IN ('spark', 'join', 'window') GROUP BY 1, 2),
             |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
             |stats AS (
             |  SELECT (SELECT count(*) FROM documents) AS n_docs,
             |         (SELECT sum(dl) FROM dl) AS sum_dl)
             |SELECT doc_id,
             |  ${Rounding.duckSql(
                  "sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) " +
                    "* tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + " +
                    "0.75 * dl / (sum_dl::DOUBLE / n_docs))))")} AS bm25
             |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (word)
             |  CROSS JOIN stats
             |GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q130: data-quality constraint report (the Deequ-style gate every
    // production ingest runs): each constraint contributes one row
    // (constraint, violations, total) — FK integrity via anti-joins
    // (dimension side broadcast-able), uniqueness as total−distinct,
    // domain/range checks as single-scan conditional counts. The fixture
    // makes customer_acctbal_nonneg genuinely fail (negative balances
    // exist) so the counting path is gated by nonzero violations, not
    // just zeros. Scale: every check is one scan + map-side-partial agg;
    // the union is of 1-row frames.
    Q(
      "q130_dq_constraints",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        val lineitem = Tables.load(s, dir, "lineitem")
        val events = Tables.load(s, dir, "events")
        def check(name: String, df: org.apache.spark.sql.DataFrame,
                  bad: org.apache.spark.sql.Column) =
          df.agg(sum(when(bad, 1L).otherwise(0L)).cast("long").as("violations"),
              count(lit(1)).cast("long").as("total"))
            .select(lit(name).as("constraint"), col("violations"), col("total"))
        val fkOrders = orders.join(customer,
            orders("o_custkey") === customer("c_custkey"), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
          .crossJoin(orders.agg(count(lit(1)).cast("long").as("total")))
          .select(lit("orders_custkey_fk").as("constraint"),
            col("violations"), col("total"))
        val fkLineitem = lineitem.join(orders,
            lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
          .crossJoin(lineitem.agg(count(lit(1)).cast("long").as("total")))
          .select(lit("lineitem_orderkey_fk").as("constraint"),
            col("violations"), col("total"))
        val unique = customer
          .agg((count(lit(1)) - countDistinct("c_custkey"))
              .cast("long").as("violations"),
            count(lit(1)).cast("long").as("total"))
          .select(lit("customer_custkey_unique").as("constraint"),
            col("violations"), col("total"))
        check("customer_acctbal_nonneg", customer, col("c_acctbal") < 0)
          .unionAll(check("events_type_domain", events,
            !col("event_type").isin("view", "click", "purchase", "signup", "error")))
          .unionAll(check("events_value_positive", events, col("value") <= 0))
          .unionAll(check("lineitem_quantity_range", lineitem,
            col("l_quantity") < 1 || col("l_quantity") > 50))
          .unionAll(fkOrders)
          .unionAll(fkLineitem)
          .unionAll(unique)
          .withColumn("pass", col("violations") === 0)
          .orderBy("constraint")
      },
      Some("""WITH raw AS (
             |  SELECT 'customer_acctbal_nonneg' AS "constraint",
             |    CAST(count(*) FILTER (c_acctbal < 0) AS BIGINT) AS violations,
             |    CAST(count(*) AS BIGINT) AS total FROM customer
             |  UNION ALL
             |  SELECT 'events_type_domain',
             |    CAST(count(*) FILTER (event_type NOT IN
             |      ('view','click','purchase','signup','error')) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM events
             |  UNION ALL
             |  SELECT 'events_value_positive',
             |    CAST(count(*) FILTER (value <= 0) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM events
             |  UNION ALL
             |  SELECT 'lineitem_quantity_range',
             |    CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'orders_custkey_fk',
             |    CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
             |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM orders
             |  UNION ALL
             |  SELECT 'lineitem_orderkey_fk',
             |    CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'customer_custkey_unique',
             |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM customer)
             |SELECT *, violations = 0 AS pass FROM raw
             |ORDER BY "constraint"""".stripMargin)),

    // ------------------------------------------------------------------
    // q131: inclusion-dependency discovery (FK profiling) — for each
    // candidate (child.col → parent.col) pair, the inclusion coefficient
    // |distinct(child) ∩ parent| / |distinct(child)|: 1.0 means the pair
    // is FK-shaped, fractions expose partial references (the schema-
    // inference pass a lakehouse catalog runs over new tables). Scale
    // shape: one distinct-agg per column (keyed shuffle), containment
    // via LEFT SEMI join against the parent's distinct set, coefficient
    // arithmetic over pair-count-sized frames. Includes a deliberately
    // partial reverse pair (customer → events.user_id ≈ 0.1: only ~10%
    // of customers ever appear in events).
    Q(
      "q131_inclusion_deps",
      (s, dir) => {
        val pairs = Seq(
          ("lineitem.l_orderkey->orders.o_orderkey",
            Tables.load(s, dir, "lineitem").select(col("l_orderkey").as("v")),
            Tables.load(s, dir, "orders").select(col("o_orderkey").as("v"))),
          ("orders.o_custkey->customer.c_custkey",
            Tables.load(s, dir, "orders").select(col("o_custkey").as("v")),
            Tables.load(s, dir, "customer").select(col("c_custkey").as("v"))),
          ("events.user_id->customer.c_custkey",
            Tables.load(s, dir, "events").select(col("user_id").as("v")),
            Tables.load(s, dir, "customer").select(col("c_custkey").as("v"))),
          ("customer.c_custkey->events.user_id",
            Tables.load(s, dir, "customer").select(col("c_custkey").as("v")),
            Tables.load(s, dir, "events").select(col("user_id").as("v"))))
        pairs.map { case (name, child, parent) =>
          val cd = child.distinct()
          val contained = cd.join(parent.distinct(), Seq("v"), "left_semi")
          cd.agg(count(lit(1)).cast("long").as("distinct_child"))
            .crossJoin(contained.agg(count(lit(1)).cast("long").as("contained")))
            .select(lit(name).as("dependency"), col("distinct_child"),
              col("contained"),
              Rounding.stableRound6(
                col("contained").cast("double") / col("distinct_child"))
                .as("coverage"))
        }.reduce(_ unionAll _).orderBy("dependency")
      },
      Some(s"""WITH pair AS (
             |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS dependency,
             |    (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS dc,
             |    (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
             |      WHERE EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey)) AS ct
             |  UNION ALL
             |  SELECT 'orders.o_custkey->customer.c_custkey',
             |    (SELECT count(DISTINCT o_custkey) FROM orders),
             |    (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) c
             |      WHERE EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey))
             |  UNION ALL
             |  SELECT 'events.user_id->customer.c_custkey',
             |    (SELECT count(DISTINCT user_id) FROM events),
             |    (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events) c
             |      WHERE EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.user_id))
             |  UNION ALL
             |  SELECT 'customer.c_custkey->events.user_id',
             |    (SELECT count(DISTINCT c_custkey) FROM customer),
             |    (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer) c
             |      WHERE EXISTS (SELECT 1 FROM events p WHERE p.user_id = c.c_custkey)))
             |SELECT dependency, CAST(dc AS BIGINT) AS distinct_child,
             |  CAST(ct AS BIGINT) AS contained,
             |  ${Rounding.duckSql("ct::DOUBLE / dc")} AS coverage
             |FROM pair
             |ORDER BY dependency""".stripMargin)),

    // ------------------------------------------------------------------
    // q132: cohort retention — the engagement matrix (cohort week ×
    // week offset → fraction of the cohort still active), the standard
    // longitudinal health view over any event stream. Two keyed
    // aggregations: per-user first-activity week (one shuffle on
    // user_id), then distinct-user counts per (cohort, offset); cohort
    // sizes fold in via a cohort-count-sized self-aggregation, joined
    // back (cohort cardinality = #weeks, tiny). Week arithmetic is exact
    // integer epoch math — both engines truncate to Monday.
    Q(
      "q132_cohort_retention",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        val firstWeek = e.groupBy("user_id")
          .agg(min("week").as("cohort_week"))
        val active = e.join(firstWeek, "user_id")
          .groupBy(col("cohort_week"),
            datediff(col("week"), col("cohort_week")).divide(7)
              .cast("int").as("week_offset"))
          .agg(countDistinct("user_id").cast("long").as("n_active"))
        val sizes = active.where(col("week_offset") === 0)
          .select(col("cohort_week"),
            col("n_active").as("cohort_size"))
        active.join(sizes, "cohort_week")
          .select(col("cohort_week").cast("date").as("cohort_week"),
            col("week_offset"), col("n_active"), col("cohort_size"),
            Rounding.stableRound6(
              col("n_active").cast("double") / col("cohort_size"))
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, date_trunc('week', ts) AS week FROM events),
             |fw AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
             |active AS (
             |  SELECT cohort_week,
             |    CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
             |  FROM e JOIN fw USING (user_id) GROUP BY 1, 2),
             |sizes AS (
             |  SELECT cohort_week, n_active AS cohort_size FROM active
             |  WHERE week_offset = 0)
             |SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
             |  n_active, cohort_size,
             |  ${Rounding.duckSql("n_active::DOUBLE / cohort_size")} AS retention
             |FROM active JOIN sizes USING (cohort_week)
             |ORDER BY cohort_week, week_offset""".stripMargin)),

    // ------------------------------------------------------------------
    // q133: key-skew diagnostics — the report you run BEFORE keying a
    // 100 TB shuffle on a column: per candidate key column, total rows,
    // distinct keys, and the top-5 hottest keys with their row share
    // (the inputs to the salt-or-not decision; see DESIGN.md Skew).
    // Scale shape: one keyed count agg per column; top-5 via
    // orderBy+limit (TakeOrderedAndProject per-partition heaps — no
    // global window, no single-partition sort); the rank window runs
    // over the ≤5-row post-limit frame per column.
    Q(
      "q133_key_skew_report",
      (s, dir) => {
        def top5(df: org.apache.spark.sql.DataFrame, colName: String) = {
          val counts = df.groupBy(col(colName).cast("string").as("key"))
            .agg(count(lit(1)).as("n"))
          val totals = df.agg(count(lit(1)).as("total"))
          val dk = counts.agg(count(lit(1)).cast("long").as("distinct_keys"))
          counts.orderBy(desc("n"), col("key")).limit(5)
            .crossJoin(broadcast(totals))
            .crossJoin(broadcast(dk))
            .select(lit(colName).as("column"), col("key"),
              col("n").cast("long").as("n"), col("distinct_keys"),
              Rounding.stableRound6(
                col("n").cast("double") / col("total")).as("share"))
        }
        val events = Tables.load(s, dir, "events")
        val lineitem = Tables.load(s, dir, "lineitem")
        val unioned = top5(events, "user_id")
          .unionAll(top5(lineitem, "l_suppkey"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("column").orderBy(desc("n"), col("key"))
        unioned.withColumn("rank", row_number().over(w))
          .orderBy("column", "rank")
      },
      Some(s"""WITH ranked AS (
             |  SELECT 'user_id' AS "column", user_id::VARCHAR AS key,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 2),
             |ranked2 AS (
             |  SELECT 'l_suppkey' AS "column", l_suppkey::VARCHAR AS key,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 2),
             |stats AS (
             |  SELECT 'user_id' AS "column",
             |    (SELECT count(*) FROM events) AS total,
             |    (SELECT count(DISTINCT user_id) FROM events) AS dk
             |  UNION ALL
             |  SELECT 'l_suppkey',
             |    (SELECT count(*) FROM lineitem),
             |    (SELECT count(DISTINCT l_suppkey) FROM lineitem)),
             |u AS (SELECT * FROM ranked UNION ALL SELECT * FROM ranked2),
             |top AS (
             |  SELECT *, row_number() OVER
             |    (PARTITION BY "column" ORDER BY n DESC, key) AS rank
             |  FROM u)
             |SELECT t."column", t.key, t.n,
             |  CAST(s.dk AS BIGINT) AS distinct_keys,
             |  ${Rounding.duckSql("t.n::DOUBLE / s.total")} AS share,
             |  t.rank
             |FROM top t JOIN stats s USING ("column")
             |WHERE t.rank <= 5
             |ORDER BY t."column", t.rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q134: grouped histogram quantiles — the first-class gate for
    // ext.Sketches.groupedHistogramQuantiles (q125 consumes the same
    // API for its bounds): per-group p50/p95/p99 from ONE mergeable
    // fixed-width-bin aggregation whose state is #(group, bin) pairs,
    // never the group's values. est = bin midpoint — exact double
    // arithmetic, replayed bit-identically by the oracle's cumulative-
    // histogram SQL.
    Q(
      "q134_grouped_quantiles",
      (s, dir) =>
        graft.ext.Sketches.groupedHistogramQuantiles(
            Tables.load(s, dir, "lineitem"),
            "l_returnflag", "l_extendedprice", 100.0, Seq(0.5, 0.95, 0.99))
          .select(col("l_returnflag"), col("q"), col("est"))
          .orderBy("l_returnflag", "q"),
      Some("""WITH bins AS (
             |  SELECT l_returnflag, floor(l_extendedprice / 100.0) AS bin,
             |    count(*) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (
             |  SELECT l_returnflag, bin, c,
             |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(c) OVER (PARTITION BY l_returnflag) AS total
             |  FROM bins),
             |qs AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS q)
             |SELECT l_returnflag, q,
             |  (min(CASE WHEN cum >= q * total THEN bin END) + 0.5) * 100.0 AS est
             |FROM cum CROSS JOIN qs
             |GROUP BY 1, 2
             |ORDER BY l_returnflag, q""".stripMargin)),

    // ------------------------------------------------------------------
    // q135: market-basket association rules — support/confidence/lift
    // for part pairs co-ordered in the same order (the co-occurrence
    // mining shape: product affinity, tag co-occurrence, co-citation).
    // Scale shape: the pair space is generated by a SELF-JOIN ON THE
    // ORDER KEY (fanout bounded by lines-per-order², ~tens — never the
    // parts² cross product), then one keyed pair aggregation; item
    // counts join back keyed on the part (no forced broadcast — part
    // cardinality grows with scale). All three metrics are single
    // integer-product/one-division forms, so both engines compute
    // bit-identical doubles before round6.
    Q(
      "q135_association_rules",
      (s, dir) => {
        // materialized ONCE: five downstream branches (pair self-join
        // sides, item counts, order count) would otherwise each rescan
        // the corpus and redo the distinct (plan audit: 10 parquet scans
        // without this, 2 with it)
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct().localCheckpoint()
        val nOrders = li.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_orders"))
        val itemCnt = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
        val bb = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
        val pairs = a.join(bb, "l_orderkey")
          .where(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("pair_cnt"))
          .where(col("pair_cnt") >= 3)
        pairs
          .join(itemCnt.select(col("l_partkey").as("pa"), col("cnt").as("ca")), "pa")
          .join(itemCnt.select(col("l_partkey").as("pb"), col("cnt").as("cb")), "pb")
          .crossJoin(broadcast(nOrders))
          .select(col("pa"), col("pb"), col("pair_cnt").cast("long").as("pair_cnt"),
            Rounding.stableRound6(
              col("pair_cnt").cast("double") / col("n_orders")).as("support"),
            Rounding.stableRound6(
              col("pair_cnt").cast("double") / col("ca")).as("confidence"),
            Rounding.stableRound6((col("pair_cnt") * col("n_orders"))
              .cast("double") / (col("ca") * col("cb"))).as("lift"))
          .orderBy("pa", "pb")
      },
      Some(s"""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
             |ic AS (SELECT l_partkey, count(*) AS cnt FROM li GROUP BY 1),
             |pairs AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS pair_cnt
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT pa, pb, CAST(pair_cnt AS BIGINT) AS pair_cnt,
             |  ${Rounding.duckSql("pair_cnt::DOUBLE / n_orders")} AS support,
             |  ${Rounding.duckSql("pair_cnt::DOUBLE / ca.cnt")} AS confidence,
             |  ${Rounding.duckSql(
                  "(pair_cnt * n_orders)::DOUBLE / (ca.cnt * cb.cnt)")} AS lift
             |FROM pairs
             |JOIN ic ca ON ca.l_partkey = pa
             |JOIN ic cb ON cb.l_partkey = pb
             |CROSS JOIN n
             |ORDER BY pa, pb""".stripMargin)),

    // ------------------------------------------------------------------
    // q136: taint propagation — multi-source BFS hop distances through
    // the near-dup evidence graph from a quarantined source's documents
    // (the "blast radius" question: if src0's docs are bad, which docs
    // are duplication-reachable from them, and how close?). Frontier BFS
    // as keyed joins (ext.Graph.bfsDistances): per round one edge join +
    // one anti-join against the visited set, lineage checkpoint-
    // truncated; first-reach = min-hop by construction. The oracle
    // replays it as a recursive CTE whose UNION-dedup on (node, dist)
    // keeps the walk polynomial, then takes min(dist) per node.
    Q(
      "q136_taint_bfs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select(col("da"), col("db"))
        val edges = pairs.unionAll(
          pairs.select(col("db").as("da"), col("da").as("db"))).toDF("src", "dst")
        val seeds = docs.where(col("source") === "src0").select("doc_id")
        graft.ext.Graph.bfsDistances(edges, seeds, maxHops = 4)
          .select(col("node").as("doc_id"), col("hops"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE pairs AS (
             |${ExtensionQueries.NearDupPairsOracle}
             |),
             |edges AS (SELECT da AS src, db AS dst FROM pairs
             |          UNION ALL SELECT db, da FROM pairs),
             |walk(node, dist) AS (
             |  SELECT doc_id, 0 FROM documents WHERE source = 'src0'
             |  UNION
             |  SELECT e.dst, w.dist + 1
             |  FROM walk w JOIN edges e ON e.src = w.node
             |  WHERE w.dist < 4)
             |SELECT node AS doc_id, CAST(min(dist) AS INT) AS hops
             |FROM walk GROUP BY node
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q137: distinctive terms per source — term lift (in-source rate vs
    // corpus rate), the "what characterizes this slice" profile every
    // corpus audit runs (per-domain, per-language, per-cluster). One
    // (source, word) aggregation + vocabulary-sized word totals joined
    // back on the word key + source totals (source-count rows,
    // broadcast); top-3 per source via a rank window over each source's
    // vocabulary partition. lift = (tf_s · total_g) / (total_s · tf_g)
    // — integer products, ONE double division: bit-identical in both
    // engines, so the rank order (lift desc, word) cannot diverge.
    Q(
      "q137_source_term_lift",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(Text.words(Text.clean(col("text")))).as("word"))
        val sw = toks.groupBy("source", "word").agg(count(lit(1)).as("tf_s"))
          .where(col("tf_s") >= 5)
        val st = toks.groupBy("source").agg(count(lit(1)).as("total_s"))
        val wt = toks.groupBy("word").agg(count(lit(1)).as("tf_g"))
        val gt = toks.agg(count(lit(1)).as("total_g"))
        val scored = sw.join(broadcast(st), "source").join(wt, "word")
          .crossJoin(broadcast(gt))
          .withColumn("lift", (col("tf_s") * col("total_g")).cast("double") /
            (col("total_s") * col("tf_g")))
        val w = Window.partitionBy("source")
          .orderBy(desc("lift"), col("word"))
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("source"), col("word"), col("tf_s").cast("long").as("tf_s"),
            Rounding.stableRound6(col("lift")).as("lift"), col("rank"))
          .orderBy("source", "rank")
      },
      Some(s"""WITH toks AS (
             |  SELECT source, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS word
             |  FROM documents),
             |sw AS (SELECT source, word, count(*) AS tf_s FROM toks
             |       GROUP BY 1, 2 HAVING count(*) >= 5),
             |st AS (SELECT source, count(*) AS total_s FROM toks GROUP BY 1),
             |wt AS (SELECT word, count(*) AS tf_g FROM toks GROUP BY 1),
             |gt AS (SELECT count(*) AS total_g FROM toks),
             |scored AS (
             |  SELECT source, word, tf_s,
             |    (tf_s * total_g)::DOUBLE / (total_s * tf_g) AS lift
             |  FROM sw JOIN st USING (source) JOIN wt USING (word)
             |    CROSS JOIN gt),
             |ranked AS (
             |  SELECT *, row_number() OVER
             |    (PARTITION BY source ORDER BY lift DESC, word) AS rank
             |  FROM scored)
             |SELECT source, word, CAST(tf_s AS BIGINT) AS tf_s,
             |  ${Rounding.duckSql("lift")} AS lift, rank
             |FROM ranked WHERE rank <= 3
             |ORDER BY source, rank""".stripMargin)),

    // ------------------------------------------------------------------
    // q138: conversion rates with Wilson 95% intervals — the experiment-
    // readout op (rate + uncertainty per arm), robust at small n and
    // p near 0/1 where the normal interval breaks. One single-scan
    // aggregation (n, successes per event_type); the interval is pure
    // per-row double arithmetic spelled with identical parenthesization
    // and ::DOUBLE literals in both engines, so lo/hi are bit-identical
    // before round6.
    Q(
      "q138_rate_wilson_ci",
      (s, dir) => {
        val z = lit(1.96)
        val e = Tables.load(s, dir, "events")
        val agg = e.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("value") > 250, 1L).otherwise(0L))
              .cast("long").as("successes"))
        val nD = col("n").cast("double")
        val p = col("successes").cast("double") / nD
        val z2 = z * z
        val denom = lit(1.0) + z2 / nD
        val center = p + z2 / (lit(2.0) * nD)
        val half = z * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD)
        agg.select(col("event_type"), col("n"), col("successes"),
            Rounding.stableRound6(p).as("rate"),
            Rounding.stableRound6((center - half) / denom).as("ci_lo"),
            Rounding.stableRound6((center + half) / denom).as("ci_hi"))
          .orderBy("event_type")
      },
      Some {
        val nD = "n::DOUBLE"
        val p = s"(successes::DOUBLE / $nD)"
        val z = "1.96::DOUBLE"
        val z2 = s"($z * $z)"
        val denom = s"(1.0::DOUBLE + $z2 / $nD)"
        val center = s"($p + $z2 / (2.0::DOUBLE * $nD))"
        val half = s"($z * sqrt(($p * (1.0::DOUBLE - $p) + " +
          s"$z2 / (4.0::DOUBLE * $nD)) / $nD))"
        s"""WITH agg AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(*) FILTER (value > 250) AS BIGINT) AS successes
           |  FROM events GROUP BY 1)
           |SELECT event_type, n, successes,
           |  ${Rounding.duckSql(p)} AS rate,
           |  ${Rounding.duckSql(s"(($center - $half) / $denom)")} AS ci_lo,
           |  ${Rounding.duckSql(s"(($center + $half) / $denom)")} AS ci_hi
           |FROM agg
           |ORDER BY event_type""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q141: chi-square independence — the contingency-table test (is
    // event type independent of value band?), the categorical-drift /
    // segmentation-significance primitive. One scan builds the observed
    // cell counts, then the table is DENSIFIED to the full type × band
    // grid (a zero cell still contributes (0−e)²/e = e — dropping empty
    // cells silently understates the statistic; caught by the
    // Σexpected = N spec). Marginals and expecteds are windows over the
    // CELL table (|types|×|bands| rows, never data rows). expected =
    // (row_tot · col_tot)/N is an integer product with ONE double
    // division — bit-identical across engines; contrib is the same
    // (o−e)²/e shape both sides.
    Q(
      "q141_chi_square",
      (s, dir) => {
        val observed = Tables.load(s, dir, "events")
          .groupBy(col("event_type"),
            floor(col("value") / 100.0).cast("long").as("band"))
          .agg(count(lit(1)).as("o"))
        val cells = observed.select("event_type").distinct()
          .crossJoin(observed.select("band").distinct())
          .join(observed, Seq("event_type", "band"), "left")
          .select(col("event_type"), col("band"),
            coalesce(col("o"), lit(0L)).as("o"))
        val byType = Window.partitionBy("event_type")
        val byBand = Window.partitionBy("band")
        val all = Window.partitionBy()
        cells
          .withColumn("rt", sum("o").over(byType))
          .withColumn("ct", sum("o").over(byBand))
          .withColumn("n", sum("o").over(all))
          .withColumn("expected", (col("rt") * col("ct")).cast("double") / col("n"))
          .select(col("event_type"), col("band"),
            col("o").cast("long").as("observed"),
            Rounding.stableRound6(col("expected")).as("expected"),
            Rounding.stableRound6(
              (col("o") - col("expected")) * (col("o") - col("expected"))
                / col("expected")).as("contrib"))
          .orderBy("event_type", "band")
      },
      Some(s"""WITH obs AS (
             |  SELECT event_type, CAST(floor(value / 100.0) AS BIGINT) AS band,
             |    count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |cells AS (
             |  SELECT t.event_type, b.band, coalesce(o.o, 0) AS o
             |  FROM (SELECT DISTINCT event_type FROM obs) t
             |  CROSS JOIN (SELECT DISTINCT band FROM obs) b
             |  LEFT JOIN obs o ON o.event_type = t.event_type AND o.band = b.band),
             |m AS (
             |  SELECT *,
             |    sum(o) OVER (PARTITION BY event_type) AS rt,
             |    sum(o) OVER (PARTITION BY band) AS ct,
             |    sum(o) OVER () AS n
             |  FROM cells),
             |x AS (SELECT *, (rt * ct)::DOUBLE / n AS expected FROM m)
             |SELECT event_type, band, CAST(o AS BIGINT) AS observed,
             |  ${Rounding.duckSql("expected")} AS expected,
             |  ${Rounding.duckSql("(o - expected) * (o - expected) / expected")}
             |    AS contrib
             |FROM x
             |ORDER BY event_type, band""".stripMargin)),

    // ------------------------------------------------------------------
    // q142: Gini concentration of customer spend — the inequality /
    // concentration metric (is 80% of volume coming from 2% of keys —
    // the same question behind skew planning and whale analysis).
    // Needs every value's GLOBAL rank: computed with ext.Ranking's
    // range-partition two-pass rank — NO single-partition window
    // anywhere (the q115/q116 machinery; a Window.orderBy here would
    // serialize the corpus through one task). Per-customer spend is
    // minted as exact integer CENTS at the row (o_totalprice is
    // 2-decimal data; round(·100) recovers the exact integer) and every
    // sum — per-customer, Σ rank·spend, Σ spend — is integer
    // arithmetic, so no distributed double accumulation exists anywhere
    // and the result is order-invariant by construction (round-6 ADVICE:
    // the old sum(rank·double) depended on accumulation order). The
    // rank·cents product runs as decimal(38,0) so it cannot overflow
    // LONG even at 1e9 customers; DuckDB mirrors with HUGEINT.
    Q(
      "q142_gini_concentration",
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(19, 0)
        val spend = Tables.load(s, dir, "orders")
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("c"))
          .groupBy("o_custkey")
          .agg(sum("c").as("cents"))
        val (ranked, n) = graft.ext.Ranking.withGlobalRankAndCount(
          spend, Seq(col("cents"), col("o_custkey")))
        val nD = lit(n.toDouble)
        ranked
          .agg(sum(col("global_rank").cast(dec) * col("cents").cast(dec))
              .as("s1"),
            sum("cents").as("tot"))
          .select(lit(n).as("n_customers"),
            (col("tot") / 100.0).as("total_spend"),
            Rounding.stableRound6(
              lit(2.0) * col("s1").cast("double")
                / (nD * col("tot").cast("double"))
                - (nD + lit(1.0)) / nD).as("gini"))
      },
      Some(s"""WITH spend AS (
             |  SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM orders GROUP BY 1),
             |ranked AS (
             |  SELECT cents,
             |    row_number() OVER (ORDER BY cents, o_custkey) AS global_rank,
             |    count(*) OVER () AS n
             |  FROM spend)
             |SELECT CAST(n AS BIGINT) AS n_customers,
             |  sum(cents) / 100.0 AS total_spend,
             |  ${Rounding.duckSql(
                  "2.0::DOUBLE * sum(global_rank::HUGEINT * cents)::DOUBLE" +
                    " / (n::DOUBLE * sum(cents)::DOUBLE)" +
                    " - (n::DOUBLE + 1.0::DOUBLE) / n::DOUBLE")} AS gini
             |FROM ranked
             |GROUP BY n
             |ORDER BY n_customers""".stripMargin)),

    // ------------------------------------------------------------------
    // q143: PSI distribution drift — the population-stability index
    // between the stream's first and last week (the standard "did the
    // feature distribution move" monitor gating model retrains and
    // corpus refreshes). Two filtered single-scan bin counts, a full
    // outer bin join (bin-count rows), Laplace-smoothed rates so
    // zero-count bins stay defined; scalars (slice sizes, bin count)
    // ride along as 1-row broadcasts. contrib = (pa−pb)·ln(pa/pb),
    // identical double shapes in both engines.
    Q(
      "q143_psi_drift",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("bin", floor(col("value") / 50.0).cast("long"))
        val a = e.where(col("ts") < lit("2024-01-08").cast("timestamp_ntz"))
        val bPart = e.where(col("ts") >= lit("2024-01-22").cast("timestamp_ntz"))
        val ca = a.groupBy("bin").agg(count(lit(1)).as("n_a"))
        val cb = bPart.groupBy("bin").agg(count(lit(1)).as("n_b"))
        val joined = ca.join(cb, Seq("bin"), "full_outer")
          .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
            coalesce(col("n_b"), lit(0L)).as("n_b"))
        val scalars = a.agg(count(lit(1)).as("na"))
          .crossJoin(bPart.agg(count(lit(1)).as("nb")))
          .crossJoin(joined.agg(count(lit(1)).as("nbins")))
        val pa = (col("n_a") + lit(0.5)) / (col("na") + lit(0.5) * col("nbins"))
        val pb = (col("n_b") + lit(0.5)) / (col("nb") + lit(0.5) * col("nbins"))
        joined.crossJoin(broadcast(scalars))
          .select(col("bin"), col("n_a").cast("long").as("n_a"),
            col("n_b").cast("long").as("n_b"),
            Rounding.stableRound6((pa - pb) * log(pa / pb)).as("contrib"))
          .orderBy("bin")
      },
      Some(s"""WITH e AS (
             |  SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, ts FROM events),
             |ca AS (SELECT bin, count(*) AS n_a FROM e
             |       WHERE ts < TIMESTAMP '2024-01-08' GROUP BY 1),
             |cb AS (SELECT bin, count(*) AS n_b FROM e
             |       WHERE ts >= TIMESTAMP '2024-01-22' GROUP BY 1),
             |j AS (
             |  SELECT coalesce(ca.bin, cb.bin) AS bin,
             |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
             |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
             |sc AS (
             |  SELECT (SELECT count(*) FROM e WHERE ts < TIMESTAMP '2024-01-08') AS na,
             |    (SELECT count(*) FROM e WHERE ts >= TIMESTAMP '2024-01-22') AS nb,
             |    (SELECT count(*) FROM j) AS nbins)
             |SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  ${Rounding.duckSql(
                  "((n_a + 0.5::DOUBLE) / (na + 0.5::DOUBLE * nbins) - " +
                    "(n_b + 0.5::DOUBLE) / (nb + 0.5::DOUBLE * nbins)) * " +
                    "ln(((n_a + 0.5::DOUBLE) / (na + 0.5::DOUBLE * nbins)) / " +
                    "((n_b + 0.5::DOUBLE) / (nb + 0.5::DOUBLE * nbins)))")}
             |    AS contrib
             |FROM j CROSS JOIN sc
             |ORDER BY bin""".stripMargin)),

    // ------------------------------------------------------------------
    // q144: purchase streaks — gaps-and-islands on CALENDAR days (the
    // engagement-streak op: consecutive-day activity runs per user),
    // the calendar twin of q29's time-gap sessions. The island key is
    // the classic `day − row_number()` constant: consecutive days share
    // it, any gap shifts it. One distinct-agg + one user-keyed window
    // (state O(1)/row) + one group agg; all date arithmetic is exact
    // integer days in both engines.
    Q(
      "q144_purchase_streaks",
      (s, dir) => {
        val d = Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        d.withColumn("grp", date_sub(col("day"), row_number().over(w)))
          .groupBy("user_id", "grp")
          .agg(min("day").as("streak_start"), max("day").as("streak_end"),
            count(lit(1)).cast("long").as("days"))
          .select("user_id", "streak_start", "streak_end", "days")
          .orderBy("user_id", "streak_start")
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |  FROM events WHERE event_type = 'purchase'),
             |g AS (
             |  SELECT user_id, day,
             |    day - CAST(row_number() OVER
             |      (PARTITION BY user_id ORDER BY day) AS INT) AS grp
             |  FROM d)
             |SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
             |  CAST(count(*) AS BIGINT) AS days
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, streak_start""".stripMargin)),

    // ------------------------------------------------------------------
    // q145: label-propagation communities — 3 SYNCHRONOUS iterations
    // over the near-dup evidence graph; each node adopts the most
    // frequent label among its neighbors, ties to the SMALLEST label
    // (the determinism rule that makes sync LPA engine-replayable —
    // async/random-order LPA is not). Per iteration: one edge⋈labels
    // join + one (node, label) count agg + one argmax agg — the q89
    // recurrence with a mode instead of a sum. The argmax is
    // max(struct(cnt, −label)) — no window over data rows. Oracle
    // unrolls the same 3 steps as chained CTEs.
    Q(
      "q145_label_propagation",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select(col("da"), col("db"))
        val e = pairs.unionAll(
            pairs.select(col("db").as("da"), col("da").as("db")))
          .toDF("src", "dst").localCheckpoint()
        val nodes = e.select(col("src").as("node")).distinct().localCheckpoint()
        var labels = nodes.withColumn("label", col("node"))
        for (_ <- 1 to 3) {
          labels = e.join(labels, e("src") === labels("node"))
            .groupBy(e("dst").as("node2"), col("label"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("node2").as("node"))
            .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
            .select(col("node"), (-col("m.nl")).as("label"))
            .localCheckpoint()
        }
        labels.select(col("node").as("doc_id"), col("label"))
          .orderBy("doc_id")
      },
      Some {
        val steps = (1 to 3).map { i =>
          s"""c$i AS (
             |  SELECT e.dst AS node, l.label, count(*) AS c
             |  FROM edges e JOIN lp${i - 1} l ON l.node = e.src
             |  GROUP BY 1, 2),
             |lp$i AS (
             |  SELECT node, label FROM (
             |    SELECT node, label, row_number() OVER
             |      (PARTITION BY node ORDER BY c DESC, label) AS rn
             |    FROM c$i) WHERE rn = 1)"""
        }.mkString(",\n")
        s"""WITH pairs AS (
           |${ExtensionQueries.NearDupPairsOracle}
           |),
           |edges AS (SELECT da AS src, db AS dst FROM pairs
           |          UNION ALL SELECT db, da FROM pairs),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |lp0 AS (SELECT node, node AS label FROM nodes),
           |$steps
           |SELECT node AS doc_id, label FROM lp3
           |ORDER BY doc_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q146: mixture rebalancing rates — given a token budget (half the
    // corpus) and a UNIFORM target share per language, the per-language
    // acceptance rate min(1, desired/available) and the expected token
    // yield: the solver that produces the rates q114-style mixture
    // selection then applies. One tokens-per-language aggregation (the
    // corpus scan); the rate table is language-count rows. Languages
    // whose supply is below their target keep rate 1.0 and under-fill;
    // redistributing that shortfall pro-rata is an iterative refinement
    // deliberately left to the caller (documented, deterministic as-is).
    Q(
      "q146_mixture_rates",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("lang"),
            size(Text.words(Text.clean(col("text")))).cast("long").as("n_tok"))
        val perLang = toks.groupBy("lang").agg(sum("n_tok").as("t_l"))
        val total = toks.agg(sum("n_tok").as("t"))
          .crossJoin(perLang.agg(count(lit(1)).as("n_langs")))
        val desired = col("t").cast("double") * lit(0.5) / col("n_langs")
        val rate = least(lit(1.0), desired / col("t_l"))
        perLang.crossJoin(broadcast(total))
          .select(col("lang"), col("t_l").cast("long").as("lang_tokens"),
            Rounding.stableRound6(rate).as("rate"),
            Rounding.stableRound6(rate * col("t_l")).as("expected_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH toks AS (
             |  SELECT lang, CAST(len(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS BIGINT) AS n_tok
             |  FROM documents),
             |pl AS (SELECT lang, sum(n_tok) AS t_l FROM toks GROUP BY 1),
             |tot AS (SELECT (SELECT sum(n_tok) FROM toks) AS t,
             |               (SELECT count(*) FROM pl) AS n_langs)
             |SELECT lang, CAST(t_l AS BIGINT) AS lang_tokens,
             |  ${Rounding.duckSql(
                  "least(1.0::DOUBLE, t::DOUBLE * 0.5::DOUBLE / n_langs / t_l)")}
             |    AS rate,
             |  ${Rounding.duckSql(
                  "least(1.0::DOUBLE, t::DOUBLE * 0.5::DOUBLE / n_langs / t_l) * t_l")}
             |    AS expected_tokens
             |FROM pl CROSS JOIN tot
             |ORDER BY lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q147: MMR diversified retrieval — maximal marginal relevance
    // (Carbonell & Goldstein 1998), the standard RAG reranker: greedily
    // pick 5 of the top-10 candidates maximizing λ·rel − (1−λ)·max-sim-
    // to-already-picked (λ=0.7), so results stay relevant but not
    // redundant. Scale shape: candidate generation is the distributed
    // top-k (q48 machinery); the greedy runs per query over its ≤10
    // candidates inside flatMapGroups — bounded group state, parallel
    // across queries, never a driver loop. Determinism: rel and
    // candidate-candidate sims are round6 values (1e-6-grid doubles),
    // λ-arithmetic is the same IEEE sequence both engines run, ties
    // break to the smallest neighbor id; the oracle unrolls the same 4
    // greedy steps as chained CTEs (q89's unrolled-iteration pattern).
    Q(
      "q147_mmr_rerank",
      (s, dir) => {
        import s.implicits._
        val e = Tables.load(s, dir, "embeddings")
        val cand = SimilaritySearch.bruteTopK(e.filter(col("vec_id") < 3), e, 10)
        val withVec = cand.join(
            e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
            "neighbor_id")
          .select(col("query_id"), col("neighbor_id"), col("cos").as("rel"),
            col("nv"))
          .as[(Long, Long, Double, Array[Float])]
        def cosD(a: Array[Float], b: Array[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          val n = math.min(a.length, b.length)
          while (i < n) {
            val x = a(i).toDouble; val y = b(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
        }
        def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
        withVec.groupByKey(_._1)
          .flatMapGroups { (qid, it) =>
            val cs = it.toArray.sortBy(c => (-c._3, c._2))
            val selected = scala.collection.mutable.ArrayBuffer(cs.head)
            val out = scala.collection.mutable.ArrayBuffer(
              (qid, 1, cs.head._2, cs.head._3))
            var remaining = cs.tail
            var pick = 2
            while (pick <= 5 && remaining.nonEmpty) {
              val scoredC = remaining.map { c =>
                val ms = selected.map(sel => r6(cosD(c._4, sel._4))).max
                (0.7 * c._3 - 0.3 * ms, c)
              }
              val best = scoredC.minBy { case (sc, c) => (-sc, c._2) }
              selected += best._2
              out += ((qid, pick, best._2._2, r6(best._1)))
              remaining = remaining.filterNot(_._2 == best._2._2)
              pick += 1
            }
            out.iterator
          }
          .toDF("query_id", "pick", "neighbor_id", "score")
          .orderBy("query_id", "pick")
      },
      Some {
        val steps = (2 to 5).map { k =>
          s"""rem$k AS (
             |  SELECT c.* FROM cand c
             |  WHERE NOT EXISTS (SELECT 1 FROM selall${k - 1} s
             |    WHERE s.query_id = c.query_id AND s.neighbor_id = c.neighbor_id)),
             |sc$k AS (
             |  SELECT r.query_id, r.neighbor_id, r.rel,
             |    0.7::DOUBLE * r.rel - 0.3::DOUBLE * max(si.sim) AS score
             |  FROM rem$k r
             |  JOIN selall${k - 1} s ON s.query_id = r.query_id
             |  JOIN sims si ON si.query_id = r.query_id
             |    AND si.ca = r.neighbor_id AND si.cb = s.neighbor_id
             |  GROUP BY 1, 2, 3),
             |sel$k AS (
             |  SELECT query_id, neighbor_id, score, $k AS pick FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, neighbor_id) AS rn
             |    FROM sc$k) WHERE rn = 1),
             |selall$k AS (SELECT * FROM selall${k - 1}
             |             UNION ALL SELECT * FROM sel$k)"""
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |q AS (SELECT * FROM e WHERE vec_id < 3),
           |scored AS (
           |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           |    floor(list_cosine_similarity(q.v, e.v) * 1000000 + 0.5) / 1000000
           |      AS rel, e.v
           |  FROM q CROSS JOIN e WHERE q.vec_id <> e.vec_id),
           |cand AS (
           |  SELECT query_id, neighbor_id, rel, v FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY rel DESC, neighbor_id) AS rank
           |    FROM scored) WHERE rank <= 10),
           |sims AS (
           |  SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
           |    floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) / 1000000
           |      AS sim
           |  FROM cand a JOIN cand b ON a.query_id = b.query_id
           |    AND a.neighbor_id <> b.neighbor_id),
           |selall1 AS (
           |  SELECT query_id, neighbor_id, rel AS score, 1 AS pick FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY rel DESC, neighbor_id) AS rn
           |    FROM cand) WHERE rn = 1),
           |$steps
           |SELECT query_id, pick, neighbor_id,
           |  floor(score * 1000000 + 0.5) / 1000000 AS score
           |FROM selall5
           |ORDER BY query_id, pick""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q148: Pareto concentration cut — "how many parts carry 80% of
    // revenue" (whale analysis; the same cumulative-share machinery
    // behind coverage curves and data-pruning score cuts). The
    // cumulative needs a running total in a GLOBAL order: computed with
    // ext.Ranking.withRunningTotal — range-partition two-pass prefix
    // sum, NO single-partition window. Revenue is minted as exact
    // integer units AT THE ROW, before any sum: l_extendedprice and
    // l_discount are 2-decimal data, so round(px·100) and round(disc·100)
    // each recover an exact integer (the true value sits ~1 ulp from the
    // integer, never near .5), and px_cents · (100 − disc_pct) is the
    // row's revenue in hundredths-of-cents — an exact LONG. Every
    // downstream sum/prefix/cut is then associative integer arithmetic,
    // immune to the round(sum(double),2) half-cent instability where
    // Spark (BigDecimal HALF_UP on the binary value) and DuckDB
    // (fp multiply-then-round) disagree — the r6 red. Division back to
    // dollars happens ONCE, in the display projection, as the identical
    // IEEE long→double / 10000.0 in both engines.
    Q(
      "q148_pareto_cut",
      (s, dir) => {
        val spend = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"),
            (round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("u"))
          .groupBy("l_partkey")
          .agg(sum("u").as("cents")) // hundredths-of-cents, exact LONG
        val (ranked, (n, total)) = graft.ext.Ranking.withRunningTotal(
          spend, Seq(desc("cents"), col("l_partkey")), "cents")
        ranked.where(col("running_total") * 10 >= lit(total) * 8)
          .agg(min("global_rank").as("k"),
            min_by(col("running_total"), col("global_rank")).as("cum_at_k"))
          .select(lit(n).as("n_parts"),
            (lit(total) / 10000.0).as("total_revenue"),
            col("k").as("parts_for_80pct"),
            Rounding.stableRound6(col("k").cast("double") / lit(n.toDouble))
              .as("part_share"),
            Rounding.stableRound6(
              col("cum_at_k").cast("double") / lit(total.toDouble))
              .as("revenue_share_at_cut"))
      },
      Some(s"""WITH spend AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
             |        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             |      AS cents
             |  FROM lineitem GROUP BY 1),
             |r AS (
             |  SELECT *,
             |    row_number() OVER (ORDER BY cents DESC, l_partkey) AS rank,
             |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(cents) OVER () AS total, count(*) OVER () AS n
             |  FROM spend)
             |SELECT CAST(max(n) AS BIGINT) AS n_parts,
             |  max(total) / 10000.0 AS total_revenue,
             |  CAST(min(rank) AS BIGINT) AS parts_for_80pct,
             |  ${Rounding.duckSql("min(rank)::DOUBLE / max(n)")} AS part_share,
             |  ${Rounding.duckSql("min_by(cum, rank)::DOUBLE / max(total)")}
             |    AS revenue_share_at_cut
             |FROM r WHERE cum * 10 >= total * 8""".stripMargin)),

    // ------------------------------------------------------------------
    // q149: rolling 7-day distinct users — the trailing-window
    // cardinality series (WAU over a sliding day grid), the batch twin
    // of q140's per-window streaming distinct but with OVERLAPPING
    // windows, where a plain windowed distinct can't work. Shape: dedup
    // to (user, day) first (the corpus-size reducer), then each (user,
    // day) EXPLODES into the ≤7 trailing grid days it serves —
    // fanout × 7 on the already-deduped frame, never on raw events —
    // then one distinct-count per grid day. Days where the trailing
    // window reaches before the stream start are reported too (partial
    // windows, standard WAU semantics).
    Q(
      "q149_rolling_distinct_users",
      (s, dir) => {
        val ud = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val bounds = ud.agg(min("day").as("d0"), max("day").as("d1"))
        val served = ud.crossJoin(broadcast(bounds))
          .select(col("user_id"), explode(sequence(col("day"),
            least(date_add(col("day"), 6), col("d1")))).as("grid_day"))
        served.groupBy("grid_day")
          .agg(countDistinct("user_id").cast("long").as("wau"))
          .orderBy("grid_day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |b AS (SELECT max(day) AS d1 FROM ud),
             |served AS (
             |  SELECT user_id, unnest(generate_series(day,
             |    least(day + 6, (SELECT d1 FROM b)), INTERVAL 1 DAY))::DATE
             |    AS grid_day
             |  FROM ud)
             |SELECT grid_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |FROM served
             |GROUP BY 1
             |ORDER BY grid_day""".stripMargin)),

    // ------------------------------------------------------------------
    // q150: source vocabulary overlap — exact pairwise Jaccard between
    // every source pair's vocabularies (the corpus-audit "which slices
    // say the same things" matrix; the exact small-domain complement to
    // the MinHash estimate the dedup family uses per-document).
    // Shape: one (source, word) distinct agg, vocabulary sizes as a
    // source-count broadcast, intersections from a SELF-JOIN ON THE
    // WORD (posting-list shape — pairs only meet where they share a
    // word, never the sources² × vocab cross product), union by
    // inclusion-exclusion.
    Q(
      "q150_source_vocab_overlap",
      (s, dir) => {
        val sw = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(Text.words(Text.clean(col("text")))).as("word"))
          .distinct().localCheckpoint()
        val sizes = sw.groupBy("source").agg(count(lit(1)).as("vocab"))
        val inter = sw.select(col("source").as("sa"), col("word"))
          .join(sw.select(col("source").as("sb"), col("word")), "word")
          .where(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("common"))
        inter
          .join(broadcast(sizes.select(col("source").as("sa"), col("vocab").as("va"))), "sa")
          .join(broadcast(sizes.select(col("source").as("sb"), col("vocab").as("vb"))), "sb")
          .select(col("sa"), col("sb"), col("common").cast("long").as("common"),
            Rounding.stableRound6(col("common").cast("double") /
              (col("va") + col("vb") - col("common"))).as("jaccard"))
          .orderBy("sa", "sb")
      },
      Some(s"""WITH sw AS (
             |  SELECT DISTINCT source, word FROM (
             |    SELECT source, unnest(list_filter(string_split(
             |      regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |      w -> w <> '')) AS word
             |    FROM documents)),
             |sizes AS (SELECT source, count(*) AS vocab FROM sw GROUP BY 1),
             |inter AS (
             |  SELECT a.source AS sa, b.source AS sb, count(*) AS common
             |  FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT sa, sb, CAST(common AS BIGINT) AS common,
             |  ${Rounding.duckSql("common::DOUBLE / (va.vocab + vb.vocab - common)")}
             |    AS jaccard
             |FROM inter
             |JOIN sizes va ON va.source = sa
             |JOIN sizes vb ON vb.source = sb
             |ORDER BY sa, sb""".stripMargin)),

    // ------------------------------------------------------------------
    // q151: mutual information of type × value-band — the information-
    // theoretic complement to q141's chi-square over the SAME densified
    // cell table: per-cell pointwise MI contribution
    // p_ab · ln(p_ab / (p_a · p_b)) (zero-count cells contribute 0 by
    // the 0·ln0 = 0 convention and are emitted with contrib 0 so the
    // grid stays complete). All probabilities are integer-count ratios;
    // the ln argument is ONE double division of integer products —
    // bit-identical across engines.
    Q(
      "q151_mutual_information",
      (s, dir) => {
        val observed = Tables.load(s, dir, "events")
          .groupBy(col("event_type"),
            floor(col("value") / 100.0).cast("long").as("band"))
          .agg(count(lit(1)).as("o"))
        val cells = observed.select("event_type").distinct()
          .crossJoin(observed.select("band").distinct())
          .join(observed, Seq("event_type", "band"), "left")
          .select(col("event_type"), col("band"),
            coalesce(col("o"), lit(0L)).as("o"))
        val byType = Window.partitionBy("event_type")
        val byBand = Window.partitionBy("band")
        val all = Window.partitionBy()
        cells
          .withColumn("rt", sum("o").over(byType))
          .withColumn("ct", sum("o").over(byBand))
          .withColumn("n", sum("o").over(all))
          .select(col("event_type"), col("band"),
            col("o").cast("long").as("observed"),
            Rounding.stableRound6(when(col("o") === 0, lit(0.0)).otherwise(
              (col("o").cast("double") / col("n")) *
                log((col("o") * col("n")).cast("double")
                  / (col("rt") * col("ct"))))).as("mi_contrib"))
          .orderBy("event_type", "band")
      },
      Some(s"""WITH obs AS (
             |  SELECT event_type, CAST(floor(value / 100.0) AS BIGINT) AS band,
             |    count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |cells AS (
             |  SELECT t.event_type, b.band, coalesce(o.o, 0) AS o
             |  FROM (SELECT DISTINCT event_type FROM obs) t
             |  CROSS JOIN (SELECT DISTINCT band FROM obs) b
             |  LEFT JOIN obs o ON o.event_type = t.event_type AND o.band = b.band),
             |m AS (
             |  SELECT *,
             |    sum(o) OVER (PARTITION BY event_type) AS rt,
             |    sum(o) OVER (PARTITION BY band) AS ct,
             |    sum(o) OVER () AS n
             |  FROM cells)
             |SELECT event_type, band, CAST(o AS BIGINT) AS observed,
             |  ${Rounding.duckSql(
                  "CASE WHEN o = 0 THEN 0.0::DOUBLE ELSE " +
                    "(o::DOUBLE / n) * ln((o * n)::DOUBLE / (rt * ct)) END")}
             |    AS mi_contrib
             |FROM m
             |ORDER BY event_type, band""".stripMargin)),

    // ------------------------------------------------------------------
    // q152: local clustering coefficient — per-node triangle density
    // over the near-dup graph (2·tri / deg·(deg−1)): distinguishes
    // tight duplicate CLIQUES (template families, lcc→1) from hub-and-
    // spoke near-dup patterns (one canonical + many partial copies,
    // lcc→0) — which of the two a cluster is changes the right dedup
    // action. Round 6 enumerated wedges at EVERY vertex (deg² rows per
    // node) — a hub-skew bomb for exactly the hub-and-spoke graphs this
    // query detects (one 100k-degree hub ⇒ 5·10⁹ wedge rows). Now it
    // uses q73's degree-oriented discipline, extended to PER-VERTEX
    // counts (ext.Graph.localTriangleCounts): orient each edge from its
    // lower (deg, id) endpoint, so every triangle is enumerated exactly
    // once, from its lowest-degree corner (oriented out-degree is O(√m);
    // wedge work drops from Σdeg² to O(m^{3/2})), then distribute one +1
    // credit to each of the three corners via a union and count per
    // vertex. A 100k-spoke hub has oriented OUT-degree ~0 (all its edges
    // point AT it) and generates no wedges at all — GraphSpec pins a
    // 1k-spoke hub fixture.
    Q(
      "q152_clustering_coefficient",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", 0.5)
          .select(col("da"), col("db"))
        val e = pairs.unionAll(
            pairs.select(col("db").as("da"), col("da").as("db")))
          .toDF("src", "dst")
        graft.ext.Graph.localTriangleCounts(e)
          .select(col("v").as("doc_id"), col("deg").as("degree"),
            col("tri").as("triangles"),
            Rounding.stableRound6(when(col("deg") < 2, lit(0.0)).otherwise(
              (col("tri") * 2).cast("double")
                / (col("deg") * (col("deg") - 1)))).as("lcc"))
          .orderBy("doc_id")
      },
      Some(s"""WITH pairs AS (
             |${ExtensionQueries.NearDupPairsOracle}
             |),
             |edges AS (SELECT da AS src, db AS dst FROM pairs
             |          UNION ALL SELECT db, da FROM pairs),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |tri AS (
             |  SELECT e1.src AS src, count(*) AS tri
             |  FROM edges e1
             |  JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst
             |  JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
             |  GROUP BY 1)
             |SELECT d.src AS doc_id, CAST(d.deg AS BIGINT) AS degree,
             |  CAST(coalesce(t.tri, 0) AS BIGINT) AS triangles,
             |  ${Rounding.duckSql(
                  "CASE WHEN d.deg < 2 THEN 0.0::DOUBLE ELSE " +
                    "(coalesce(t.tri, 0) * 2)::DOUBLE / (d.deg * (d.deg - 1)) END")}
             |    AS lcc
             |FROM deg d LEFT JOIN tri t ON t.src = d.src
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q153: incremental aggregate maintenance — the production ETL
    // pattern: a per-(day, type) aggregate table built from the base
    // slice is MERGED with a late-arriving delta batch's partials
    // (full outer join + component-wise combine) instead of recomputing
    // the base. Works because (count, sum) are mergeable state — the
    // same algebra behind map-side partials and the q61/q134 sketches.
    // The gate proves merged(base, delta) == full recompute (the oracle
    // aggregates everything at once): the equality IS the correctness
    // claim for incremental pipelines. For that equality to hold BY
    // CONSTRUCTION (not by rounding luck), the summed measure is minted
    // as exact integer CENTS at the row (value is 2-decimal data):
    // (ΣA)+(ΣB) == Σ(A∪B) is exact for LONGs, while the r6 shape
    // round(doubleA + doubleB, 2) vs round(doubleFull, 2) could flip a
    // cent on a .005 boundary (round-6 ADVICE). Cents → dollars happens
    // once, in the display projection, as the identical IEEE /100.0.
    Q(
      "q153_incremental_agg_merge",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("c", round(col("value") * 100).cast("long"))
        val cutoff = lit("2024-01-22").cast("timestamp_ntz")
        def partial(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("c").as("s"))
        val base = partial(e.where(col("ts") < cutoff))
        val delta = partial(e.where(col("ts") >= cutoff))
        base.as("b").join(delta.as("d"),
            col("b.day") === col("d.day")
              && col("b.event_type") === col("d.event_type"), "full_outer")
          .select(
            coalesce(col("b.day"), col("d.day")).as("day"),
            coalesce(col("b.event_type"), col("d.event_type")).as("event_type"),
            (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
              .cast("long").as("n"),
            ((coalesce(col("b.s"), lit(0L)) + coalesce(col("d.s"), lit(0L)))
              / 100.0).as("sum_value"))
          .orderBy("day", "event_type")
      },
      // the oracle is the FULL recompute — merged partials must equal it
      Some("""SELECT CAST(ts AS DATE) AS day, event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY day, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q154: telemetry debounce — drop events repeating the same (user,
    // type) within 5 minutes of the previously KEPT event (burst
    // collapse: retry storms, double-clicks, crash loops — the standard
    // telemetry-volume reducer). NOTE the kept-anchor semantics: a chain
    // of events 4 minutes apart collapses to its FIRST event only if
    // each is within 5 min of the last KEPT one — the lag()-vs-previous
    // row rule would re-anchor at every dropped event. That running
    // "last kept" is a per-key sequential fold, and — precisely because
    // debounce EXISTS for crash loops and retry storms — the adversarial
    // key has millions of events, so the r6 collect_list shape (whole
    // key history in one aggregation buffer) was its own scale hazard.
    // Now ext.Folds.streamingKeyFold: hash-partition on the key,
    // spill-backed secondary sort, one streamed pass with O(1) state
    // (the last-kept timestamp) per key. FoldsSpec pins the 100k-event
    // crash-loop key the old shape would have buffered.
    Q(
      "q154_debounce",
      (s, dir) => {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        val out = StructType(Seq(
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("event_id", LongType)))
        graft.ext.Folds.streamingKeyFold[Long](
          e, Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")),
          out,
          init = () => Long.MinValue, // no kept event yet: first is kept
          step = (lastKept, r) => {
            val ts = r.getLong(3)
            if (lastKept == Long.MinValue || ts - lastKept > 300000000L)
              (ts, Seq(Row(r.getLong(0), r.getString(1), r.getLong(2))))
            else (lastKept, Nil)
          },
          flush = (_, _) => Nil
        ).orderBy("event_id")
      },
      // NOT list_reduce: DuckDB 1.0.0's list_reduce corrupts a
      // struct-with-list accumulator across steps (concat applies once,
      // then prior ids vanish — reproduced on literals); the recursive
      // CTE walks each group's event sequence with scalar state instead,
      // recursion depth = max events per (user, type)
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY epoch_us(ts), event_id) AS idx
             |  FROM events),
             |walk AS (
             |  SELECT user_id, event_type, idx, t AS last_kept,
             |    true AS kept, event_id
             |  FROM ev WHERE idx = 1
             |  UNION ALL
             |  SELECT e.user_id, e.event_type, e.idx,
             |    CASE WHEN e.t - w.last_kept > 300000000
             |      THEN e.t ELSE w.last_kept END,
             |    e.t - w.last_kept > 300000000,
             |    e.event_id
             |  FROM walk w JOIN ev e ON e.user_id = w.user_id
             |    AND e.event_type = w.event_type AND e.idx = w.idx + 1)
             |SELECT user_id, event_type, event_id FROM walk WHERE kept
             |ORDER BY event_id""".stripMargin))
  )
}
