package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling}
import graft.io.Tables

/** Round-11 second wave — exactly-once streaming ingest for the
  * persisted MinHash band index (q478): the last at-least-once write
  * path in the storage layer gets the batch-id commit-marker protocol,
  * so a crawler pipeline can stream crawl batches INTO the dedup index
  * with redelivery safety. Serve correctness is gated against the same
  * from-scratch MinHash recompute oracle as q459 — an index fed by
  * streaming commits must be indistinguishable from one built in one
  * shot.
  */
object ExtensionQueries86 {

  private val bsaRunId = new AtomicInteger(0)

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q478: EXACTLY-ONCE STREAMING APPEND into the band index. Base =
    // corpus minus the %7 slice (built in one shot); the %7 slice
    // arrives as a real AvailableNow file stream, two delta files ->
    // two foreachBatch deliveries -> appendToBandIndexIdempotent (each
    // batch in its own deltas/b<id> dir, committed by an atomic
    // create-exclusive marker). After termination the query REPLAYS
    // every committed batch id — each must refuse (at-least-once
    // redelivery is a no-op) — and then serves an incoming batch
    // through nearDupJoinIndexed, which unions base + committed deltas.
    // The oracle is the from-scratch recompute over the FULL corpus:
    // any double-append (duplicate candidates surviving the distinct?
    // duplicate hash rows changing a verify) or lost batch fails the
    // row hash.
    Q(
      "q478_band_index_streaming_append",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val id = bsaRunId.incrementAndGet()
        val path = s"${System.getProperty("java.io.tmpdir")}" +
          s"/graft_bandsa${tag}_$id"
        val deltaDir =
          java.nio.file.Files.createTempDirectory("graft_bandsa_delta")
        val ckptDir =
          java.nio.file.Files.createTempDirectory("graft_bandsa_ckpt")
        val d = Sampling.hashSplit(Tables.load(s, dir, "documents"),
          "doc_id", "inc", Seq(("corpus", 0.8), ("incoming", 0.2)))
        val incoming = d.filter(col("split") === "incoming")
          .select("doc_id", "text")
        val corpus = d.filter(col("split") === "corpus")
          .select("doc_id", "text")
        Dedup.writeBandIndex(corpus.where(col("doc_id") % 7 =!= 0),
          "text", "doc_id", path)
        val delta = corpus.where(col("doc_id") % 7 === 0)
        delta.repartition(2).write.mode("overwrite")
          .parquet(deltaDir.toString)
        val apply = (df: DataFrame, batchId: Long) => {
          Dedup.appendToBandIndexIdempotent(df, "text", "doc_id",
            path, batchId)
          ()
        }
        val q = s.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(deltaDir.toString)
          .writeStream
          .foreachBatch(apply)
          .option("checkpointLocation", ckptDir.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try {
          q.awaitTermination()
          // at-least-once redelivery drill: every committed id refuses
          val batches = Dedup.bandIndexAppliedBatches(path)
          require(batches.size == 2,
            s"expected 2 streamed batches, got ${batches.size}")
          batches.foreach(b => require(
            !Dedup.appendToBandIndexIdempotent(delta, "text", "doc_id",
              path, b),
            s"replayed batch $b appended again"))
        } finally {
          q.stop()
          graft.io.FsUtil.deleteRecursively(ckptDir)
          graft.io.FsUtil.deleteRecursively(deltaDir)
        }
        Dedup.nearDupJoinIndexed(incoming, s, path, "text", "doc_id", 0.5)
          .orderBy("da", "db")
      },
      Some(ExtensionQueries.NearDupJoinOracle)))
}
