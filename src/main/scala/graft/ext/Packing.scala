package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training pipelines: assign documents, in a
  * deterministic global order, to fixed-token-capacity bins — the
  * "concatenate the token stream and cut every `capacity` tokens"
  * formulation, where a doc's bin is `floor(exclusive_cumsum(tokens) /
  * capacity)`. Deterministic and engine-replayable (the DuckDB oracle is
  * one window function). A doc is assigned the single bin containing its
  * START offset; a doc whose tokens straddle a cut is NOT split — the
  * consumer decides whether to truncate or spill at materialization.
  *
  * Scale shape: the naive Spark formulation is a global-window running
  * sum — `Window.orderBy(id)` with no partition key, which moves the
  * WHOLE corpus through one task (Spark even warns). Instead this uses
  * the same two-pass distributed prefix sum as [[graft.io.TextRecords]]:
  * range-partition by id, pass 1 collects ONE (partition, token-total)
  * row per partition, the driver scan-sums those (O(#partitions)), pass
  * 2 streams each partition with its broadcast starting offset. Both
  * passes are narrow; nothing larger than the partition-count array ever
  * leaves the executors.
  */
object Packing {

  /** @param df        input with `idCol` (orderable, unique) and `tokensCol` (integral)
    * @param capacity  tokens per bin (> 0)
    * @return (idCol, tokens, start_token, bin) — `start_token` is the
    *         doc's exclusive cumulative token offset in id order
    */
  def packBins(df: DataFrame, idCol: String, tokensCol: String,
               capacity: Long, partitions: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val sorted = df
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("tokens"))
      .repartitionByRange(partitions, col("id"))
      .sortWithinPartitions("id")
    val rdd = sorted.rdd
    // pass 1: one total per partition, scan-summed on the driver
    val partTotals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        it.foreach(sum += _.getLong(1))
        Iterator((pid, sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val bases = partTotals.scanLeft(0L)(_ + _)
    val basesB = spark.sparkContext.broadcast(bases)
    // pass 2: per-partition running offset from the broadcast base
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var offset = basesB.value(pid)
      it.map { r =>
        val start = offset
        offset += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), start, start / capacity)
      }
    }
    spark.createDataFrame(packed, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("start_token", LongType, nullable = false),
      StructField("bin", LongType, nullable = false))))
      .withColumnRenamed("id", idCol)
  }

  /** The OTHER packing convention — GPT-style "concatenate the whole
    * token stream and cut every `seqLen` tokens", where documents ARE
    * split at sequence boundaries: emits one row per (document ×
    * training sequence it overlaps) with the token sub-range each side
    * sees. [[packBins]] assigns whole docs to bins; this materializes the
    * exact span map a sequence builder needs:
    * `(seq_id, idCol, doc_from, doc_to, seq_offset)` — the doc's tokens
    * `[doc_from, doc_to)` land in sequence `seq_id` starting at position
    * `seq_offset`. Zero-token docs emit nothing; every sequence's spans
    * concatenate to exactly `seqLen` tokens (except the final tail), a
    * property the spec pins.
    *
    * Scale shape: the same two-pass distributed prefix sum as
    * [[packBins]] for the exclusive cumulative offset, then a
    * shuffle-free `sequence()`+`explode` projection — a doc overlaps
    * `1 + ⌊(start+tokens-1)/seqLen⌋ − ⌊start/seqLen⌋` sequences, so the
    * fan-out is (total tokens)/seqLen rows, linear in corpus size.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Long, partitions: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val offsets = packBins(df, idCol, tokensCol, capacity = seqLen, partitions)
      .where(col("tokens") > 0)
    // `div`, not `/`: Column./ is double division, which silently loses
    // exactness past 2^53 total tokens — real territory for 100 TB text
    offsets
      .withColumn("seq_id", explode(sequence(
        expr(s"start_token div ${seqLen}L"),
        expr(s"(start_token + tokens - 1) div ${seqLen}L"))))
      .select(
        col("seq_id"),
        col(idCol),
        greatest(col("seq_id") * seqLen - col("start_token"), lit(0L))
          .as("doc_from"),
        least(col("tokens"), (col("seq_id") + 1) * seqLen - col("start_token"))
          .as("doc_to"),
        greatest(col("start_token") - col("seq_id") * seqLen, lit(0L))
          .as("seq_offset"))
  }
}
