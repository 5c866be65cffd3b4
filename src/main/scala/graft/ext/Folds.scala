package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Per-key sequential folds WITHOUT per-key buffering — the classic
  * MapReduce reduce-with-secondary-sort, re-expressed on Spark.
  *
  * The `collect_list(...)` + `aggregate()` HOF shape (EWMA, debounce)
  * materializes a key's ENTIRE history inside one aggregation buffer
  * before the fold runs. That bound — "per-key state = per-key activity"
  * — is exactly wrong for the adversarial keys these operators exist to
  * tame: a crash-looping client or retry storm puts millions of events on
  * ONE (user, type) key and OOMs its buffer. Here instead the rows are
  * hash-partitioned on the key and secondary-sorted (key, order) within
  * partitions — Spark's sort is spill-backed (ExternalSorter), so a hot
  * key streams from disk — and a single `mapPartitions` pass walks the
  * iterator, detecting key boundaries by comparison with the previous
  * row's key. Live state is ONE fold accumulator per in-flight key:
  * O(1) memory per key regardless of how many events the key has.
  * FoldsSpec pins this with a planted 100k-event crash-loop key.
  *
  * Correctness contract: `orderCols` must totally order rows WITHIN a key
  * (include a unique tiebreaker such as the event id) — the fold is
  * sequential, so an ambiguous order would make the result depend on
  * physical placement. Keys need no global order: each lives entirely in
  * one partition (hash partitioning), and the fold resets at boundaries.
  */
object Folds {

  /** Streams each key's rows (in `orderCols` order) through a sequential
    * fold. `step` consumes one row and may emit output rows; `flush` runs
    * once when a key closes (its last row was consumed) and may emit
    * per-key summary rows. Emitted rows must match `outSchema`.
    *
    * @param keyCols   fold boundary: state resets when these change
    * @param orderCols within-key order; MUST be total (unique tiebreaker)
    * @param init      fresh accumulator for each key
    * @param step      (state, row) => (state', rows to emit now)
    * @param flush     (finalState, keyValues) => rows to emit at key close
    */
  def streamingKeyFold[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      outSchema: StructType,
      init: () => S,
      step: (S, Row) => (S, Seq[Row]),
      flush: (S, Seq[Any]) => Seq[Row],
      partitions: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val spark = df.sparkSession
    val sorted = df
      .repartition(partitions, keyCols.map(df.col): _*)
      .sortWithinPartitions(keyCols.map(df.col) ++ orderCols: _*)
    val kIdx = sorted.schema match {
      case sch => keyCols.map(sch.fieldIndex)
    }
    val out = sorted.rdd.mapPartitions { rows =>
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private var state: S = null.asInstanceOf[S]
        private var curKey: Seq[Any] = null
        private var open = false

        private def advance(): Unit =
          while (!pending.hasNext && (rows.hasNext || open)) {
            if (!rows.hasNext) { // partition exhausted: close last key
              pending = flush(state, curKey).iterator
              open = false
            } else {
              val r = rows.next()
              val k = kIdx.map(r.get)
              if (open && k != curKey) { // key boundary: flush, reset
                val closed = flush(state, curKey)
                curKey = k; state = init()
                val (s2, emitted) = step(state, r)
                state = s2
                pending = (closed ++ emitted).iterator
              } else {
                if (!open) { curKey = k; state = init(); open = true }
                val (s2, emitted) = step(state, r)
                state = s2
                pending = emitted.iterator
              }
            }
          }

        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): Row = { advance(); pending.next() }
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
