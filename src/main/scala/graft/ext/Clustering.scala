package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{Rounding, VectorFunctions}

/** Semantic clustering over an embedding column — the curation step
  * between near-dup removal and mixture design: group documents by
  * meaning (topic balancing, per-cluster quality thresholds, diversity
  * sampling). Spherical k-means — assignment by maximum dot product
  * against UNIT-NORM centroids (= maximum cosine), update by cluster
  * mean — is the standard variant for normalized-ish embeddings.
  *
  * Everything is deterministic and engine-replayable, which is what makes
  * the operator gateable (q95) and its output stable across reruns:
  *  - init: [[SimilaritySearch.hashPickedCentroids]] (the k corpus
  *    vectors with smallest PolyHash — a pure function of the corpus,
  *    constant-size, no seeded RNG);
  *  - assignment: [[graft.functions.CentroidRanks]] limit=1 — one
  *    codegen'd shuffle-free projection per iteration, tie-break
  *    (dot DESC, cid ASC) replayed by a DuckDB window;
  *  - update: per-cell element-wise mean as `dim` avg aggregates in ONE
  *    hash aggregation (no posexplode shuffle), collected to the driver
  *    as k rows;
  *  - float discipline: each new centroid coordinate is stable-rounded
  *    (`floor(x·1e6+0.5)/1e6` — absorbs avg's summation-order drift),
  *    normalized with left-to-right accumulation, then QUANTIZED TO
  *    FLOAT. CentroidRanks stores its matrix as float, so without the
  *    quantization step the engine would assign against values the
  *    oracle cannot see; with it, both engines run identical IEEE ops
  *    on identical bits.
  *
  * Scale shape: per iteration, one corpus scan (narrow projection +
  * one aggregation whose output is k rows × dim columns) and an O(k·dim)
  * driver update — centroid state is constant-size like the IVF
  * codebook, never proportional to the corpus. Empty clusters carry
  * their previous centroid forward (deterministic; no re-seeding).
  */
object Clustering {

  /** Stable-round + L2-normalize + float-quantize one centroid.
    * Mirrored exactly by the oracle SQL:
    * `list_transform(mv, y -> CAST(CAST(y / sqrt(list_dot_product(mv, mv))
    * AS REAL) AS DOUBLE))` — same left-to-right Σy², same IEEE sqrt/div,
    * same round-to-nearest float cast. A zero-norm mean keeps the raw
    * coordinates (no NaN propagation).
    */
  private[graft] def normQuant(c: Seq[Double]): Seq[Double] = {
    var ss = 0.0
    c.foreach(x => ss += x * x)
    if (ss == 0.0) c
    else {
      val n = math.sqrt(ss)
      c.map(x => (x / n).toFloat.toDouble)
    }
  }

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** Runs `iters` spherical k-means iterations; returns the final
    * per-vector assignment with its cosine to the assigned centroid:
    * `(idCol, cluster: long, cos: double)`.
    *
    * @param k     number of clusters (hash-picked deterministic init)
    * @param iters Lloyd iterations (fixed count — the oracle unrolls them)
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    val spark = df.sparkSession
    import spark.implicits._

    val dim = SimilaritySearch.deriveDim(df, vecCol)
    val e = df.select(col(idCol), col(vecCol))
    var cents: IndexedSeq[Seq[Double]] =
      SimilaritySearch.hashPickedCentroids(df, idCol, vecCol, k)
        .map(normQuant).toIndexedSeq
    if (cents.isEmpty)
      return e.select(col(idCol), lit(0L).as("cluster"), lit(0.0).as("cos")).limit(0)

    val meanAggs = (0 until dim).map(i =>
      avg(element_at(col(vecCol), i + 1)).as(s"m$i"))
    for (_ <- 1 to iters) {
      val assigned = e.withColumn("cluster",
        element_at(VectorFunctions.centroidRanks(col(vecCol), cents, 1), 1))
      val means: Array[Row] = assigned.groupBy("cluster")
        .agg(meanAggs.head, meanAggs.tail: _*)
        .collect()
      val byCell = means.map(r => r.getInt(0) ->
        (0 until dim).map(i => round6(r.getDouble(i + 1)))).toMap
      cents = cents.indices.map(c => byCell.get(c).map(normQuant).getOrElse(cents(c)))
    }

    val centDf = broadcast(
      cents.zipWithIndex
        .map { case (cv, cid) => (cid, cv.map(_.toFloat)) }
        .toDF("cluster", "cv"))
    e.withColumn("cluster",
        element_at(VectorFunctions.centroidRanks(col(vecCol), cents, 1), 1))
      .join(centDf, "cluster")
      .select(col(idCol), col("cluster").cast("long").as("cluster"),
        Rounding.stableRound6(VectorFunctions.cosineSim(col(vecCol), col("cv")))
          .as("cos"))
  }
}
