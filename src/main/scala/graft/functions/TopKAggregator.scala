package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator (SURVEY.md §2b "top-k per group"
  * upgrade path): a bounded buffer instead of a full window sort.
  *
  * vs `row_number().over(Window.partitionBy(...))`: the window operator
  * sorts every group in full; this Aggregator's state is O(k) per group
  * and merges map-side — at 100 TB with millions of rows per group the
  * shuffle carries ≤ 2k rows per group instead of all of them. This is
  * the engine's reusable UDAF surface (the reference's "bring your own
  * reducer", typed edition).
  *
  * Buffer representation: a plain `Seq[(Double, Long)]` compacted to the
  * best k whenever it reaches 2k — amortized O(log k) per row, and the
  * buffer rides the PRODUCT encoder (Tungsten array-of-struct), not
  * `Encoders.kryo` as in round 1: the Kryo round-trip on every partial
  * serialization was the aggregator's dominant cost (q51 bench).
  *
  * Ordering: by `score` descending, ties broken by ascending `id` —
  * deterministic, matching the window formulation's tiebreak.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Long, Double)]] {

  private def compact(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val nb = b :+ ((in._2, in._1))
    if (nb.length >= 2 * k) compact(nb) else nb
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    compact(a ++ b)

  /** Best-first output: (id, score) sorted score desc, id asc. */
  override def finish(b: Seq[(Double, Long)]): Seq[(Long, Double)] =
    compact(b).map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}
