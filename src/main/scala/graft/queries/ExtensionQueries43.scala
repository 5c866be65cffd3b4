package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.io.Tables

/** Round-9 wave: incremental maintenance of the persisted IVF-PQ index
  * (q322) — the delta-absorption path the r8 verdict named as the one
  * missing piece of the 100 TB ANN serving story (q207 wrote and served
  * the index; a delta batch still implied a rebuild). Same contract as
  * every other module: each Spark pipeline pairs with DuckDB oracle SQL
  * replaying it.
  */
object ExtensionQueries43 {

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q322: incremental IVF-PQ index maintenance — build the persisted
    // index (q207's layout) from the BASE slice only (vec_id % 10 <> 0),
    // absorb the remaining tenth as a delta batch
    // (SimilaritySearch.appendToIvfPqIndex: encode against the FROZEN
    // centroid/codebook sidecars, append into the delta's own cell
    // partitions — untouched cells and sidecars are never rewritten;
    // Extension25Spec pins the touched-cells-only write), then serve
    // q111's probe set from the maintained index. The gate: served
    // results must equal a single-shot index over the FULL corpus built
    // with the SAME (base-picked) sidecars — which is exactly what the
    // oracle replays (picks restricted to the base slice, cell
    // assignment + encoding + ADC over all vectors). That equality is
    // the correctness content of "append" — a delta row is scored
    // bit-identically to the same vector indexed on day one.
    Q(
      "q322_ivfpq_incremental",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val base = e.where(col("vec_id") % 10 =!= 0)
        val delta = e.where(col("vec_id") % 10 === 0)
        val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_inc")
        try {
          SimilaritySearch.writeIvfPqIndex(base, idx.toString,
            nCentroids = 16, m = 8, ksub = 16)
          SimilaritySearch.appendToIvfPqIndex(delta, idx.toString)
          SimilaritySearch.ivfPqTopKFromIndex(
              e.filter(col("vec_id") < 5), idx.toString, 5, nProbe = 4)
            .orderBy("query_id", "rank")
            .localCheckpoint()
        } finally deleteRecursively(idx)
      },
      Some(ExtensionQueries4.ivfPqOracleSqlPick("vec_id % 10 <> 0"))),

    // ------------------------------------------------------------------
    // q329: IVF-PQ tombstone delete + compaction — the other half of
    // the index CRUD story (q322 is insert): build from the base
    // slice, absorb the delta, DELETE every vec_id % 20 == 5 (an
    // O(delta) append to the tombstones sidecar), compact (dynamic
    // overwrite of ONLY the affected cells, dead cells removed,
    // tombstones dropped — Extension25Spec pins all three plus
    // serve-before == serve-after), and serve q111's probes from the
    // compacted index. The oracle replays base-only picks over the
    // full corpus MINUS the deleted slice — a deleted row must be
    // invisible whether it is still a pending tombstone or already
    // compacted away.
    Q(
      "q329_ivfpq_tombstone_compact",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_del")
        try {
          SimilaritySearch.writeIvfPqIndex(e.where(col("vec_id") % 10 =!= 0),
            idx.toString, nCentroids = 16, m = 8, ksub = 16)
          SimilaritySearch.appendToIvfPqIndex(
            e.where(col("vec_id") % 10 === 0), idx.toString)
          SimilaritySearch.deleteFromIvfPqIndex(
            e.where(col("vec_id") % 20 === 5).select("vec_id"), idx.toString)
          SimilaritySearch.compactIvfPqIndex(s, idx.toString)
          SimilaritySearch.ivfPqTopKFromIndex(
              e.filter(col("vec_id") < 5), idx.toString, 5, nProbe = 4)
            .orderBy("query_id", "rank")
            .localCheckpoint()
        } finally deleteRecursively(idx)
      },
      Some(ExtensionQueries4.ivfPqOracleSqlPick("vec_id % 10 <> 0",
        candWhere = "vec_id % 20 <> 5"))))
}
