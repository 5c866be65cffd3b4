package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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

  /** The DuckDB replay of [[bucket]] for oracle SQL construction (the
    * hash expression is textually duplicated for the squaring — DuckDB
    * CSEs it). `idExpr` must be a short column reference.
    */
  def bucketDuckSql(salt: String, idExpr: String): String = {
    val h = PolyHash.duckSql(s"'$salt#' || $idExpr::VARCHAR")
    s"(($h) * ($h) % ${PolyHash.Mod}) % $Buckets"
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

  /** Deterministic WEIGHTED sampling without replacement
    * (Efraimidis-Spirakis A-ES): each row gets key `u^(1/w)` where `u` is
    * the row's hash-derived uniform `(bucket + 0.5) / 10000` and `w` its
    * weight; the k largest keys are the sample. Selection probability is
    * proportional to weight; membership is a pure function of
    * (salt, id, weight) — reproducible run-to-run and engine-to-engine
    * like every sampler here.
    *
    * Scale shape: one codegen'd projection then a top-k
    * (`TakeOrderedAndProject`: per-partition heaps of k rows, no global
    * sort). The only cross-engine caveat: `pow` is correct to the last
    * ulp, not exactly rounded, so the rank-k/rank-k+1 boundary could in
    * principle flip if two keys are within ~1e-15 — with hash-spread
    * uniforms the observed gaps are ~1e-3.
    *
    * @return the k selected rows: (idCol, weight, bucket, sel_key)
    */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: Column,
                   salt: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val b = bucket(col(idCol), salt)
    val w = greatest(weightCol.cast("double"), lit(1.0))
    val u = (b.cast("double") + 0.5) / Buckets.toDouble
    df.select(col(idCol), w.as("weight"), b.cast("long").as("bucket"),
        pow(u, lit(1.0) / w).as("sel_key"))
      .orderBy(col("sel_key").desc, col(idCol))
      .limit(k)
  }

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

  /** Deterministic global shuffle ORDER for training epochs: a
    * reproducible pseudo-random permutation key per row —
    * `shuffle_key = bucket(id, salt)` with the id as tiebreak. Consumers
    * `ORDER BY (shuffle_key, id)` (or range-partition on it) to get the
    * same epoch order on every run and engine; a new salt is a fresh
    * independent permutation. `rand()`-ordered epochs are
    * unreproducible, and at 100 TB an ORDER BY over a pure projection is
    * a range exchange — no extra scan, no driver state.
    */
  def shuffleKey(id: Column, salt: String): Column = {
    // same mixing as [[bucket]] (squared mod p — see the spec-pinned
    // rationale there) without the basis-point fold: ~1e9 distinct keys
    val h = PolyHash(concat(lit(salt + "#"), id.cast("string")))
    h * h % PolyHash.Mod
  }

  /** DOMAIN CAPPING: keep at most `n` rows per group, chosen
    * deterministically — the mixture-control step that stops one huge
    * domain/source from dominating a training mix. Which rows survive is
    * a pure function of (salt, id): rows rank within their group by
    * (bucket(id, salt), id) and ranks ≤ n are kept, so the kept set is a
    * uniform pseudo-random sample of each group, stable under corpus
    * growth ONLY in distribution (a group gaining rows can displace a
    * kept row — capping is inherently rank-based, unlike [[hashSample]]'s
    * per-row independence; callers who need growth-stable membership
    * want a fraction, not a cap).
    *
    * Scale shape: one window aggregation partitioned by the group column
    * — the shuffle is by group key and each group streams through one
    * task's sort. A pathological single-group skew (one domain = half
    * the corpus) pays that group's sort in one task; at that point cap
    * the offender separately or pre-filter with [[hashSample]] at an
    * estimated fraction. Adds `cap_rank`.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  salt: String, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucket(col(idCol), salt), col(idCol))
    df.withColumn("cap_rank", row_number().over(w).cast("long"))
      .where(col("cap_rank") <= n)
  }

  /** TOKEN-BUDGET curation: keep the best documents, in (score DESC, id)
    * order, until the cumulative token count would exceed `budget` — the
    * "fill N billion tokens from the top of the quality ranking" job
    * every pre-training data mix ends with.
    *
    * Scale shape: the naive formulation is a no-partition global-window
    * running sum (the whole corpus through one task). This instead
    * range-partitions on the selection order and runs the same two-pass
    * distributed prefix sum as [[graft.ext.Packing]] / `io.TextRecords`:
    * pass 1 ships ONE (partition, token-total) row per partition to the
    * driver, pass 2 streams each partition against its broadcast base
    * and keeps rows while `cum_tokens ≤ budget`. Partitions whose base
    * already exceeds the budget are skipped wholesale (their iterator is
    * never consumed past the short-circuit), so the post-budget tail
    * costs a scan, not a sort-and-sum. Result is deterministic and
    * range-boundary-invariant: the cumsum depends only on the global
    * (score DESC, id) order, which ties back to data, not to sampling.
    *
    * @return (idCol, score, tokens, cum_tokens) for every kept doc
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, budget: Long,
                        partitions: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(tokensCol).cast("long").as("tokens"))
      .repartitionByRange(partitions, col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))
    val rdd = sorted.rdd
    val partTotals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        it.foreach { r =>
          // fail fast with a usable message: a null id/score/tokens would
          // otherwise surface as an opaque task NPE after retries (a null
          // id specifically would NPE only in the second pass's getLong)
          require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
            s"tokenBudgetSelect: null id/score/tokens in row $r — " +
              "clean the input (na.drop or coalesce) before selection")
          sum += r.getLong(2)
        }
        Iterator((pid, sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val bases = partTotals.scanLeft(0L)(_ + _)
    val basesB = spark.sparkContext.broadcast(bases)
    val kept = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = basesB.value(pid)
      // > not >=: a zero-token doc landing exactly at the budget is kept
      if (cum > budget) Iterator.empty // whole partition past the budget
      else it
        .map { r =>
          cum += r.getLong(2)
          Row(r.getLong(0), r.getDouble(1), r.getLong(2), cum)
        }
        .takeWhile(_.getLong(3) <= budget)
    }
    spark.createDataFrame(kept, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("cum_tokens", LongType, nullable = false))))
      .withColumnRenamed("id", idCol)
  }

  /** Rendezvous (highest-random-weight) shard assignment: the shard of
    * `id` under an `n`-shard layout is the candidate with the maximum
    * `PolyHash("hrw#" || s || "#" || id)` (smallest shard index on
    * ties). The property that makes HRW the resharding scheme for a
    * 100 TB corpus: growing n → n+1 moves ONLY the ~1/(n+1) of keys
    * whose new-shard weight wins — every moved key moves TO the new
    * shard, nothing reshuffles among survivors (q216 measures it; the
    * spec asserts the moved-to-new-shard invariant). One codegen'd
    * projection of n struct comparisons — shuffle-free, like [[bucket]].
    */
  def rendezvousShard(id: Column, n: Int): Column = {
    require(n >= 1, s"need at least one shard, got $n")
    if (n == 1) return lit(0L)
    val cands = (0 until n).map { s =>
      // square-mix like [[bucket]]: raw PolyHash is affine in the id
      // suffix, so for same-length ids the candidate ORDER would be
      // id-independent and one shard would win everything (observed:
      // 500 docs → 2 shards before the fix); h² mod p breaks it
      val h = PolyHash(concat(lit(s"hrw#$s#"), id.cast("string")))
      struct((h * h % PolyHash.Mod).as("w"), lit(-s.toLong).as("ns"))
    }
    (greatest(cands: _*).getField("ns") * -1L).cast("long")
  }

  /** DuckDB replay of [[rendezvousShard]] for oracle SQL: two CTEs
    * (`cand<name>`, `<name>`) computing the per-doc argmax over the
    * unnested shard range as a cross join + window — structurally
    * different from the engine's greatest() fold, same result (DuckDB
    * can't correlate a window, so the candidate frame is materialized).
    * `<name>` has columns (doc_id, s).
    */
  def rendezvousDuckCtes(n: Int, name: String, table: String = "documents",
                         idCol: String = "doc_id"): String = {
    val h = PolyHash.duckSql(
      s"'hrw#' || u.s::VARCHAR || '#' || d.$idCol::VARCHAR")
    s"""cand$name AS (
       |  SELECT d.$idCol AS doc_id, u.s,
       |    ($h) * ($h) % ${PolyHash.Mod} AS w
       |  FROM $table d CROSS JOIN (SELECT unnest(range($n)) AS s) u),
       |$name AS (
       |  SELECT doc_id, s FROM (
       |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY w DESC, s) AS rk
       |    FROM cand$name)
       |  WHERE rk = 1)""".stripMargin
  }
}
