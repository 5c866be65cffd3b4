package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `rand()`-based sampling is useless for dataset curation: membership
  * changes run-to-run and engine-to-engine, so train/test leak into each
  * other across pipeline versions. Here membership is a pure function of
  * the row's id — `bucket = PolyHash(id || "#" || salt) % 10000` — which
  * makes splits (a) stable when the corpus grows (a document never
  * changes split), (b) identical on any engine that can replay the hash
  * (the DuckDB oracle does, q55), and (c) shuffle-free: one codegen'd
  * projection, no shuffle, no driver-side state.
  *
  * The salt namespaces independent draws: sampling 1% for eval with one
  * salt is independent of an 80/10/10 split under another.
  */
object Sampling {

  final val Buckets = 10000

  /** The [0, 10000) assignment bucket for a row id under a salt:
    * `(h² mod p) mod 10000` with `h = PolyHash(salt # id)`.
    *
    * Two mixing rules, both caught by failing specs before they shipped:
    *  - the salt is a PREFIX — PolyHash is affine in its last characters,
    *    so suffix salts differing in one char shift every bucket by a
    *    constant ("eval1" vs "eval2" moved each bucket by exactly 1 —
    *    near-identical samples);
    *  - the hash is SQUARED mod p before bucketing — base-31 over short
    *    numeric id strings is nearly affine in the digits, clustering raw
    *    buckets badly enough to turn an 80% split into 60%. h < p ≈ 1e9
    *    keeps h² < 1.1e18 inside int64 on both engines; measured
    *    fractions land within 0.2% at 100k ids.
    */
  def bucket(id: Column, salt: String): Column = {
    val h = PolyHash(concat(lit(salt + "#"), id.cast("string")))
    (h * h % PolyHash.Mod) % Buckets
  }

  /** Adds `bucket` and `split` columns; `fractions` must sum to 1.
    * Fractions resolve to basis-point thresholds (0.8 → buckets 0-7999).
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fractions")
    val b = bucket(col(idCol), salt)
    val thresholds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * Buckets).toInt)
    val cases = fractions.init.zip(thresholds.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), thr)) =>
        Some(acc.fold(when(b < thr, name))(_.when(b < thr, name)))
      }
    val split = cases.fold(lit(fractions.head._1): Column)(_.otherwise(fractions.last._1))
    df.withColumn("bucket", b).withColumn("split", split)
  }

  /** Deterministic sample: keep rows whose bucket falls below
    * `fraction` (in basis points). Same id + salt ⇒ same decision, on
    * every run and every engine.
    */
  def hashSample(df: DataFrame, idCol: String, salt: String,
                 fraction: Double): DataFrame =
    df.where(bucket(col(idCol), salt) < math.round(fraction * Buckets).toInt)

  /** Stratified deterministic sample: per-stratum keep fractions (the
    * `sampleBy` shape, minus the nondeterminism — rebalancing a skewed
    * training mix must be reproducible run-to-run). Strata missing from
    * `fractions` are dropped. Still one shuffle-free projection+filter;
    * the stratum column only selects which threshold applies.
    */
  def hashSampleBy(df: DataFrame, idCol: String, salt: String,
                   strataCol: String, fractions: Map[String, Double]): DataFrame = {
    val b = bucket(col(idCol), salt)
    val thr = fractions.foldLeft(lit(0): Column) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, math.round(f * Buckets).toInt).otherwise(acc)
    }
    df.where(b < thr)
  }
}
