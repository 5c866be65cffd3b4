package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator (SURVEY.md §2b "top-k per group"
  * upgrade path): a bounded min-heap buffer instead of a full window sort.
  *
  * vs `row_number().over(Window.partitionBy(...))`: the window operator
  * sorts every group in full; this Aggregator's state is O(k) per group
  * and merges map-side — at 100 TB with millions of rows per group the
  * shuffle carries k rows per group instead of all of them. This is the
  * engine's reusable UDAF surface (the reference's "bring your own
  * reducer", typed edition).
  *
  * Ordering: by `score` descending, ties broken by ascending `id` —
  * deterministic, matching the window formulation's tiebreak.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)],
      Seq[(Long, Double)]] {

  // min-heap on (score, -id): the head is the WORST kept element
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)

  private def push(b: mutable.PriorityQueue[(Double, Long)], s: Double, id: Long): Unit = {
    b.enqueue((s, id))
    if (b.size > k) b.dequeue() // drops the worst (lowest score, highest id)
    ()
  }

  override def reduce(b: mutable.PriorityQueue[(Double, Long)],
                      in: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    push(b, in._2, in._1); b
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { case (s, id) => push(a, s, id) }
    a
  }

  /** Best-first output: (id, score) sorted score desc, id asc. */
  override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
    b.toSeq.sortBy { case (s, id) => (-s, id) }.map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
