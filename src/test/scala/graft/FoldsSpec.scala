package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.Folds

/** ext.Folds.streamingKeyFold — the secondary-sort streaming fold that
  * replaced the collect_list-per-key shape in q154 (debounce) and q105
  * (EWMA). The headline test plants the adversarial key those operators
  * exist for: a crash-looping client putting 100k events on ONE
  * (user, type) key — the old shape buffered that key's whole history in
  * a single aggregation buffer; the fold streams it with O(1) state.
  */
class FoldsSpec extends SparkSpec {

  import spark.implicits._

  private val outSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("event_id", LongType)))

  /** The q154 debounce step: keep iff ts - lastKept > 300s (micros). */
  private def debounce(df: org.apache.spark.sql.DataFrame, partitions: Int) =
    Folds.streamingKeyFold[Long](
      df, Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")),
      outSchema,
      init = () => Long.MinValue,
      step = (lastKept, r) => {
        val ts = r.getLong(3)
        if (lastKept == Long.MinValue || ts - lastKept > 300000000L)
          (ts, Seq(Row(r.getLong(0), r.getString(1), r.getLong(2))))
        else (lastKept, Nil)
      },
      flush = (_, _) => Nil,
      partitions = partitions)

  /** Sequential single-threaded reference for the same rule. */
  private def referenceKept(
      rows: Seq[(Long, String, Long, Long)]): Set[Long] =
    rows.groupBy(r => (r._1, r._2)).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(r => (r._4, r._3))
      var last = Long.MinValue
      sorted.flatMap { case (_, _, id, ts) =>
        if (last == Long.MinValue || ts - last > 300000000L) {
          last = ts; Some(id)
        } else None
      }
    }.toSet

  test("crash-loop key: 100k events on one (user, type) streams through " +
    "with O(1) state and exact kept set") {
    // user 1 crash-loops: 100k events 1s apart (every 301st survives);
    // users 2..5 emit 200 events 150s apart (every 3rd survives) to
    // prove multi-key boundaries inside the same partitions
    val hot = spark.range(100000).select(
      lit(1L).as("user_id"), lit("crash").as("event_type"),
      col("id").as("event_id"), (col("id") * 1000000L).as("ts_us"))
    val normal = spark.range(4 * 200).select(
      (col("id") % 4 + 2).as("user_id"), lit("view").as("event_type"),
      (col("id") + 1000000L).as("event_id"),
      ((col("id") / lit(4)).cast("long") * 150000000L).as("ts_us"))
    val df = hot.unionAll(normal)
    val got = debounce(df, 4).collect()
      .map(_.getLong(2)).toSet
    // closed-form expectation for the hot key: anchors advance 301s at a
    // time (301 = first gap strictly greater than 300s on a 1s grid)
    val hotKept = (0L until 100000L by 301L).toSet
    val normalRows = (0 until 4 * 200).map { i =>
      ((i % 4 + 2).toLong, "view", i + 1000000L, (i / 4).toLong * 150000000L)
    }
    assert(got.filter(_ < 1000000L) == hotKept)
    assert(got.filter(_ >= 1000000L) == referenceKept(normalRows))
    // partition-count invariance: each key lives wholly in one partition
    assert(debounce(df, 1).collect().map(_.getLong(2)).toSet == got)
    assert(debounce(df, 13).collect().map(_.getLong(2)).toSet == got)
  }

  test("state resets exactly at key boundaries; ties break by the " +
    "order tiebreaker") {
    // two keys adjacent in sort order, second key's first event would be
    // dropped if state leaked across the boundary; plus a timestamp tie
    // where only the lower event_id survives
    val rows = Seq(
      (1L, "a", 10L, 0L),
      (1L, "a", 11L, 100000000L), // +100s: dropped
      (1L, "b", 20L, 100000001L), // new key: KEPT despite tiny gap
      (2L, "a", 30L, 0L),
      (2L, "a", 31L, 0L), // exact tie: higher id dropped (gap 0 ≤ 300s)
      (2L, "a", 32L, 300000001L)) // first gap > 300s: kept
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val got = debounce(rows, 4).collect().map(_.getLong(2)).toSet
    assert(got == Set(10L, 20L, 30L, 32L))
  }

  test("flush emits per-key summaries equal to the collect-based fold " +
    "(q105's EWMA shape)") {
    val ewmaSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("n", LongType),
      StructField("ewma", DoubleType)))
    val data = spark.range(1000).select(
      (col("id") % 7).as("user_id"), col("id").as("event_id"),
      (col("id") * 37 % 101).cast("double").as("value"))
    val got = Folds.streamingKeyFold[(Long, Double)](
      data, Seq("user_id"), Seq(col("event_id")), ewmaSchema,
      init = () => (0L, 0.0),
      step = { case ((n, acc), r) =>
        val v = r.getDouble(2)
        ((n + 1, if (n == 0L) v else acc * 0.5 + v * 0.5), Nil)
      },
      flush = { case ((n, acc), key) => Seq(Row(key.head, n, acc)) },
      partitions = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val expected = data.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, evs) =>
        val vals = evs.sortBy(_._2).map(_._3)
        u -> ((vals.length.toLong, vals.tail.foldLeft(vals.head)(
          (acc, v) => acc * 0.5 + v * 0.5)))
      }
    assert(got == expected)
  }
}
