package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Graph, Sampling, Sketches}
import graft.io.Tables
import graft.ops.Upsert

/** Round-5 operator tests: PageRank, SCD-2 merge, weighted sampling,
  * bloom-accelerated decontamination, Misra-Gries heavy hitters, and the
  * session_window boundary rule the q88 oracle depends on. Constructed
  * inputs with hand-derivable expectations wherever possible.
  */
class Extension2Spec extends SparkSpec {

  import spark.implicits._

  test("pageRank: ranks sum to 1 and the hub outranks the spokes") {
    // star graph: node 0 connected to 1..4 (undirected). The hub receives
    // mass from every spoke and must outrank them; total mass conserved.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 5)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9,
      s"mass not conserved: ${ranks.values.sum}")
    assert((1L to 4L).forall(s => ranks(0L) > ranks(s)),
      s"hub must outrank spokes: $ranks")
    // spokes are symmetric — identical ranks
    assert((2L to 4L).forall(s => math.abs(ranks(s) - ranks(1L)) < 1e-12))
  }

  test("pageRank matches a driver-side power iteration on a small graph") {
    val edgeSeq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val got = Graph.pageRank(edgeSeq.toDF("src", "dst"), iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay the same recurrence sequentially
    val und = edgeSeq ++ edgeSeq.map(e => (e._2, e._1))
    val nodes = und.map(_._1).distinct.sorted
    val n = nodes.size.toDouble
    val deg = und.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val in = und.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(v => v -> ((1.0 - 0.85) / n + 0.85 * in(v))).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v)) < 1e-12, s"node $v: ${got(v)} vs ${rank(v)}")
    }
  }

  test("scd2: expired/carried/updated/inserted rows all present exactly once") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq((2L, 99.0), (4L, 40.0)).toDF("k", "v")
    val got = Upsert.scd2(base, changes, "k", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      (1L, 10.0, 1L, true),  // carried
      (2L, 20.0, 1L, false), // expired
      (2L, 99.0, 2L, true),  // updated
      (3L, 30.0, 1L, true),  // carried
      (4L, 40.0, 1L, true))) // inserted
  }

  test("weightedTopK: returns k rows, deterministic, and replays the A-ES formula") {
    val docs = Tables.load(spark, sf0001, "documents")
    val w = size(graft.ext.TextAnalysis.wsTokens(col("text")))
    def run() = Sampling.weightedTopK(docs, "doc_id", w, "spec9", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = run()
    assert(first.size == 25)
    assert(first == run(), "same salt must select the same rows")
    // replay: compute every key driver-side, take the top 25 the same way
    val keys = docs.select(col("doc_id"),
        greatest(w.cast("double"), lit(1.0)).as("wt"),
        Sampling.bucket(col("doc_id"), "spec9").cast("double").as("b"))
      .collect()
      .map(r => (r.getLong(0), math.pow((r.getDouble(2) + 0.5) / 10000.0, 1.0 / r.getDouble(1))))
    val expected = keys.sortBy { case (id, k) => (-k, id) }.take(25).map(_._1).toSet
    assert(first == expected)
  }

  test("heavyHitters: exact counts for every value above threshold, none below") {
    // skewed stream: 'hot' 600x, 'warm' 300x, 100 singletons — across
    // 8 partitions so the per-partition sketches must union correctly
    val rows = (Seq.fill(600)("hot") ++ Seq.fill(300)("warm") ++
      (1 to 100).map(i => s"cold_$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    val got = Sketches.heavyHitters(df, "v", k = 20, minCountOfTotal = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("hot", 600L), ("warm", 300L)))
    // a threshold below the sketch guarantee must be rejected, not
    // silently under-report
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "v", k = 3, minCountOfTotal = 0.1)
    }
  }

  test("contaminationReportBloom == exact contaminationReport (lossless shortcut)") {
    val docs = Tables.load(spark, sf0001, "documents")
    val b = Sampling.bucket(col("doc_id"), "decon1")
    val train = docs.where(b >= 2000)
    val eval = docs.where(b < 2000)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = canon(Dedup.contaminationReport(train, eval, "text", "doc_id", n = 6))
    val bloom = canon(Dedup.contaminationReportBloom(train, eval, "text", "doc_id", n = 6))
    assert(bloom == exact)
    assert(exact.nonEmpty, "fixture must actually exercise contamination")
  }

  test("session_window: a gap of exactly the duration MERGES (q29's > rule)") {
    // pins the boundary the q88 oracle replays: session_window merges an
    // event landing exactly at the previous window's close — identical to
    // q29's strict-> gap rule, so the two operators agree on membership
    val ts0 = java.sql.Timestamp.valueOf("2024-05-01 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-05-01 11:00:00") // +3600s exactly
    val ts2 = java.sql.Timestamp.valueOf("2024-05-01 12:00:01") // +3601s: splits
    val df = Seq((1L, ts0), (1L, ts1), (1L, ts2)).toDF("user_id", "ts")
    val n = df.groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .count().collect().length
    assert(n == 2, s"exact-gap merges, over-gap splits: expected 2 sessions, got $n")
  }
}
