package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text ingestion with the reference's exact record semantics
  * (`/root/reference/master.py:31-47`, SURVEY.md §1):
  *
  *  - lines that are blank (`"\n"` in the reference; `""` after Spark's
  *    newline strip) are dropped but contribute exactly 1 to the running
  *    offset (the un-reassigned `"\n"`'s length);
  *  - every other line is cleaned (chars outside `[a-zA-Z0-9 ]` deleted)
  *    and contributes `len(cleaned)` — so offsets address the concatenated
  *    *cleaned* text, not raw file bytes.
  *
  * Scale design: the running offset is a global prefix sum over file order.
  * A `Window.orderBy` would force all data through one partition, so we do
  * the classic two-pass partition prefix sum instead — pass 1 computes each
  * partition's (line count, offset contribution) pair (tiny: one row per
  * partition, collected to the driver), pass 2 re-streams each partition
  * with its broadcast starting offset. Both passes are narrow per-partition
  * scans; at 100 TB this is 2 reads and zero shuffles. `sc.textFile` split
  * order is deterministic (partition index = split index), which is what
  * makes the prefix sum well-defined.
  */
object TextRecords {

  private[graft] def cleanLine(s: String): String =
    s.replaceAll("[^a-zA-Z0-9 ]", "")

  /** Offset contribution of a raw (newline-stripped) line. */
  private[graft] def contribution(raw: String): Long =
    if (raw.isEmpty) 1L else cleanLine(raw).length.toLong

  /** Read a text file as the reference's record list:
    * `(line_id LONG, line STRING, offset LONG)` for each non-blank line,
    * where `line` is already cleaned and `offset` is the cumulative cleaned
    * offset of the line start.
    */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    val sc = spark.sparkContext
    // deliberately NOT persisted: the two passes cost two file scans
    // either way (pass 1 materializes on collect), and a persist here has
    // no safe unpersist point — the returned DataFrame is lazy — so it
    // would pin the corpus in block storage for the session's lifetime
    val raw =
      if (minPartitions > 0) sc.textFile(path, minPartitions) else sc.textFile(path)

    // Pass 1: per-partition (lines, offset-contribution) totals.
    val partTotals: Array[(Long, Long)] = raw
      .mapPartitionsWithIndex { (pid, it) =>
        var lines = 0L
        var contrib = 0L
        it.foreach { l => lines += 1; contrib += contribution(l) }
        Iterator((pid, (lines, contrib)))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)

    val lineBases = partTotals.map(_._1).scanLeft(0L)(_ + _)
    val offsetBases = partTotals.map(_._2).scanLeft(0L)(_ + _)

    // Pass 2: stream each partition with its broadcast starting state.
    val lineBasesB = sc.broadcast(lineBases)
    val offsetBasesB = sc.broadcast(offsetBases)
    val records = raw.mapPartitionsWithIndex { (pid, it) =>
      var lineId = lineBasesB.value(pid)
      var offset = offsetBasesB.value(pid)
      it.flatMap { l =>
        val id = lineId
        val off = offset
        lineId += 1
        offset += contribution(l)
        if (l.isEmpty) None else Some((id, cleanLine(l), off))
      }
    }

    val out = spark.createDataFrame(records).toDF("line_id", "line", "offset")
    out
  }

  /** The reference's result-sink shape (`database_server.py:88-102`): one
    * JSON object mapping each key to its value, keys sorted for determinism
    * (the reference's insertion order is arrival-order nondeterministic —
    * SURVEY.md §7 declares sorted as the contract).
    *
    * Scale note: a single JSON object is an inherently single-file format;
    * this collects and is only for reference-shaped golden outputs at demo
    * scale. Real pipelines use `df.write.json/parquet` (per-line, parallel).
    */
  def writeJsonObject(df: DataFrame, path: String, maxRows: Long = 1000000L): Unit = {
    val cols = df.columns
    require(cols.length == 2, s"expected (key, value) shape, got ${cols.toSeq}")
    // guard the unbounded collect: a single JSON object is a demo-scale
    // sink; count first (cheap aggregate) so an oversized input fails with
    // a pointer at the scale path instead of an executor->driver OOM
    val count = df.count()
    require(count <= maxRows,
      s"writeJsonObject collects to the driver and got $count rows (max $maxRows); " +
        "use graft.io.Sources.writeJsonLines for scale output")
    val rows = df.toJSON.collect() // per-row {"k":...,"v":...} objects
    val entries = rows.map { j =>
      // rewrap {"key":k,"value":v} rows into "k": v members
      val parsed = ujsonLite(j, cols(0), cols(1))
      parsed
    }.sorted
    val out = entries.mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), out)
  }

  // Minimal row-JSON → object-member rewrite without a JSON dependency:
  // toJSON emits {"<kcol>":<k>,"<vcol>":<v>} with no extra whitespace.
  private def ujsonLite(rowJson: String, kcol: String, vcol: String): String = {
    val kPrefix = "{\"" + kcol + "\":"
    val vMarker = ",\"" + vcol + "\":"
    val i = rowJson.indexOf(vMarker)
    require(rowJson.startsWith(kPrefix) && i > 0, s"unexpected row json: $rowJson")
    val k = rowJson.substring(kPrefix.length, i)
    val v = rowJson.substring(i + vMarker.length, rowJson.length - 1)
    s"$k: $v"
  }
}
