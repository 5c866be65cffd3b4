package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** The reference framework's *actual* API surface (SURVEY.md §2a op 16 +
  * "generic surface"): bring your own
  * `mapper: records ⇒ (key, value) pairs` and
  * `reducer: all values for a key ⇒ result`
  * (`input_info.json:5-6` names arbitrary mapper/reducer scripts; the
  * prototype at `/root/reference/127.0.0.1:1-9` shows the intended shape).
  *
  * Spark re-expression: `mapPartitions` for the mapper (one call per
  * partition, mirroring one mapper process per chunk —
  * `master.py:63-81`) and `groupByKey(...).mapGroups` for the reducer. The
  * shuffle between them subsumes the reference's single-node XML-RPC
  * KV store (`database_server.py:52-72`) — partitioned, spilled, and
  * fault-tolerant instead of one global lock rewriting a JSON file.
  *
  * Scale note: `mapGroups` streams each key's values as an Iterator — the
  * reducer never needs the whole group in memory unless the user's lambda
  * materializes it. Reducers that are algebraic (sum/count/min/...) should
  * use the DataFrame pipelines instead (partial aggregation map-side); this
  * façade is the fully-general escape hatch, priced accordingly.
  */
final class MapReduceJob[I, K, V, R](
    mapper: Iterator[I] => Iterator[(K, V)],
    reducer: (K, Iterator[V]) => R)(
    implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K], outEnc: Encoder[(K, R)]) {

  def run(input: Dataset[I]): Dataset[(K, R)] = {
    // local copies so the task closures capture the functions, not `this`
    val m = mapper
    val r = reducer
    input
      .mapPartitions(m)
      .groupByKey(_._1)
      .mapGroups((k, pairs) => (k, r(k, pairs.map(_._2))))
  }
}

object MapReduceJob {
  def apply[I, K, V, R](
      mapper: Iterator[I] => Iterator[(K, V)],
      reducer: (K, Iterator[V]) => R)(
      implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K],
      outEnc: Encoder[(K, R)]): MapReduceJob[I, K, V, R] =
    new MapReduceJob(mapper, reducer)
}
