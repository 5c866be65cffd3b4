package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Ranking, Sampling}
import graft.functions.{Rounding, VectorFunctions}
import graft.io.Tables
import graft.ops.Text

/** Round-7 sixth wave: semantic train/test contamination, embedding
  * data-quality audit, and curriculum assembly. Same contract as every
  * other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries12 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q171: semantic train/test contamination — for a deterministic
    // 90/10 split of the embedding corpus (q55's salted square-mix
    // bucket on vec_id), report every TEST vector with a TRAIN
    // cluster-mate at cosine ≥ τ: the embedding-based contamination
    // protocol that catches paraphrases q78's exact match and q156's
    // n-gram overlap both miss. Scale shape is q155's cluster-bounded
    // discipline: pairs enumerate WITHIN a k-means cluster only
    // (Σ |train_c|·|test_c|, never |train|·|test|), one equi-join on
    // the cluster id, one test-keyed agg. Cosine + stableRound6 is the
    // q47-pinned bit-identical pairing so the τ cut is engine-exact.
    Q(
      "q171_semantic_contamination",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .withColumn("b", Sampling.bucket(col("vec_id"), "semcon7"))
        val train = e.where(col("b") < 9000)
          .select(col("label").as("lt"), col("embedding").as("vt"))
        val test = e.where(col("b") >= 9000)
          .select(col("label").as("ls"), col("vec_id"),
            col("embedding").as("vs"))
        test.join(train, col("ls") === col("lt"))
          .withColumn("cos", Rounding.stableRound6(
            VectorFunctions.cosineSim(col("vs"), col("vt"))))
          .where(col("cos") >= 0.3)
          .groupBy("vec_id")
          .agg(count(lit(1)).as("n_train_neighbors"),
            max("cos").as("max_cos"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
             |    ${Sampling.bucketDuckSql("semcon7", "vec_id")} AS b
             |  FROM embeddings),
             |train AS (SELECT label, v FROM e WHERE b < 9000),
             |test AS (SELECT vec_id, label, v FROM e WHERE b >= 9000)
             |SELECT t.vec_id, CAST(count(*) AS BIGINT) AS n_train_neighbors,
             |  max(floor(list_cosine_similarity(t.v, tr.v) * 1000000 + 0.5)
             |    / 1000000) AS max_cos
             |FROM test t JOIN train tr ON t.label = tr.label
             |WHERE floor(list_cosine_similarity(t.v, tr.v) * 1000000 + 0.5)
             |  / 1000000 >= 0.3
             |GROUP BY t.vec_id
             |ORDER BY t.vec_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q172: embedding data-quality audit — per cluster label: vector
    // count, dimension bounds (min ≠ max means ragged arrays — a
    // pipeline-stopping schema bug), norm bounds, and a corrupt-vector
    // count (norm < 0.5: zeroed or truncated embeddings that cosine
    // math silently mis-scores). The vector-column twin of q130's
    // tabular DQ constraints — run BEFORE any ANN/cluster op trusts
    // the column. Scale shape: one scan, norm computed per-row by a
    // sequential left-to-right fold over the array (both engines fold
    // in array order on doubles — bit-identical), one keyed agg;
    // extrema of per-row-exact values are exact, so only the mean
    // norm needs the stableRound6 grid.
    Q(
      "q172_embedding_audit",
      (s, dir) => {
        Tables.load(s, dir, "embeddings")
          .select(col("label").cast("long").as("cluster"),
            size(col("embedding")).as("dims"),
            expr("sqrt(aggregate(embedding, 0D, " +
              "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
              .as("norm"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_vecs"),
            min("dims").as("min_dims"), max("dims").as("max_dims"),
            Rounding.stableRound6(min("norm")).as("min_norm"),
            Rounding.stableRound6(max("norm")).as("max_norm"),
            Rounding.stableRound6(avg("norm")).as("mean_norm"),
            sum(when(col("norm") < 0.5, 1L).otherwise(0L)).as("n_corrupt"))
          .orderBy("cluster")
      },
      Some(s"""WITH v AS (
             |  SELECT CAST(label AS BIGINT) AS cluster,
             |    len(embedding) AS dims,
             |    sqrt(list_sum(list_transform(embedding::DOUBLE[],
             |      x -> x * x))) AS norm
             |  FROM embeddings)
             |SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(min(dims) AS INT) AS min_dims,
             |  CAST(max(dims) AS INT) AS max_dims,
             |  ${Rounding.duckSql("min(norm)")} AS min_norm,
             |  ${Rounding.duckSql("max(norm)")} AS max_norm,
             |  ${Rounding.duckSql("avg(norm)")} AS mean_norm,
             |  CAST(sum(CASE WHEN norm < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_corrupt
             |FROM v
             |GROUP BY cluster
             |ORDER BY cluster""".stripMargin)),

    // ------------------------------------------------------------------
    // q173: curriculum assembly — order the corpus easy→hard by q94's
    // unigram surprisal, cut into 4 curriculum phases, and give every
    // doc a deterministic within-phase shuffle key (training reads
    // phases in order, shuffled within each): the curriculum-learning
    // data layout, materialized. Scale shape: the difficulty score is
    // q94's two-scan pipeline; the phase cut is Ranking's TWO-PASS
    // range-partition rank + the exact ntile arithmetic (NO
    // single-partition window — the same machinery PlanSpec pins for
    // q115/q116); the shuffle key is q55's salted bucket (pure
    // function, shuffle-free). Rank order sorts on the ROUNDED
    // difficulty with doc_id tiebreak — a last-ulp cross-engine
    // difference in an unrounded double would otherwise swap ranks.
    Q(
      "q173_curriculum",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(Text.words(Text.clean(col("text")))).as("w"))
        val vocab = toks.groupBy("w").agg(count(lit(1)).cast("double").as("cnt"))
          .withColumn("total", sum("cnt").over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
        val scored = toks.join(broadcast(vocab), "w")
          .groupBy("doc_id")
          .agg(Rounding.stableRound6(avg(-log(col("cnt") / col("total"))))
            .as("difficulty"))
        val (ranked, n) = Ranking.withGlobalRankAndCount(
          scored, Seq(col("difficulty"), col("doc_id")))
        ranked
          .withColumn("phase",
            Ranking.ntileFromRank(col("global_rank"), n, 4).cast("int"))
          .withColumn("shuffle_key",
            Sampling.bucket(col("doc_id"), "curr7"))
          .select("doc_id", "difficulty", "phase", "shuffle_key")
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(string_split(
             |    regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
             |    w -> w <> '')) AS w
             |  FROM documents),
             |vocab AS (SELECT w, count(*)::DOUBLE AS cnt FROM toks GROUP BY w),
             |tot AS (SELECT count(*)::DOUBLE AS total FROM toks),
             |scored AS (
             |  SELECT doc_id,
             |    ${Rounding.duckSql("avg(-ln(cnt / total))")} AS difficulty
             |  FROM toks JOIN vocab USING (w) CROSS JOIN tot
             |  GROUP BY doc_id)
             |SELECT doc_id, difficulty,
             |  CAST(ntile(4) OVER (ORDER BY difficulty, doc_id) AS INT)
             |    AS phase,
             |  ${Sampling.bucketDuckSql("curr7", "doc_id")} AS shuffle_key
             |FROM scored
             |ORDER BY doc_id""".stripMargin))
  )
}
