package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Dev diagnostic (r12 verdict item 1): MEASURED commit-cost scaling of
  * the delta-log manifests. For base tables of 50 / 200 / 800 files,
  * append ONE file and record (a) the append's manifest bytes, (b) the
  * base checkpoint's bytes, (c) the append's driver wall time. The
  * delta-log claim is that (a) is FLAT (a handful of lines regardless
  * of table size) while (b) grows linearly — i.e. commit cost is
  * O(delta), not O(table-files). Also times a readManifest fold at the
  * end of a 9-delta chain vs a fresh checkpoint read, bounding the
  * read-side tax of the interval-10 design.
  *
  * Run: sbt "runMain graft.tools.DeltaLogProbe"
  */
object DeltaLogProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "delta-log-probe")
    def bytes(path: String, v: Int): Long = java.nio.file.Files.size(
      java.nio.file.Paths.get(f"$path/_manifests/v$v%05d.txt"))
    println("base_files  checkpoint_bytes  append_delta_bytes  append_ms")
    Seq(50, 200, 800).foreach { n =>
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_dlp_$n"
      graft.io.FsUtil.deleteRecursively(path)
      VersionedTable.init(
        spark.range(n * 100L).select(col("id"), (col("id") % 97).as("k"))
          .repartition(n), path)
      val one = spark.range(1).select(lit(10000000L).as("id"),
        lit(1L).as("k")).repartition(1)
      // warm the write path once so the timed append is steady-state
      VersionedTable.append(one, path)
      val t0 = System.nanoTime()
      VersionedTable.append(one, path)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$n%10d  ${bytes(path, 0)}%16d  ${bytes(path, 2)}%18d" +
        f"  $ms%9.1f")
    }
    // read-side: fold depth 9 (worst case under interval 10) vs a
    // checkpoint read, at the 800-file base
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_dlp_800"
    (3 to 9).foreach(_ => VersionedTable.append(
      spark.range(1).select(lit(1L).as("id"), lit(1L).as("k"))
        .repartition(1), path))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    VersionedTable.readManifest(path, 9) // warm
    val foldMs = (1 to 5).map(_ =>
      time(VersionedTable.readManifest(path, 9))).min
    val ckptMs = (1 to 5).map(_ =>
      time(VersionedTable.readManifest(path, 0))).min
    println(f"readManifest fold(9 deltas) ${foldMs}%.1f ms vs " +
      f"checkpoint ${ckptMs}%.1f ms at 800 files")

    // PARQUET CHECKPOINT (r13 verdict #2): a synthetic 100k-entry
    // manifest (rc + nc + one zone-stat band per file — the shape a
    // real clustered table carries) written in BOTH checkpoint forms.
    // Claim: the columnar sidecar is >= 5x smaller than the text form
    // and a COLD readManifest off it is sub-second.
    val nBig = 100000
    val bigData = (0 until nBig)
      .map(i => f"c00000/part-$i%06d-4f9e2b1c.snappy.parquet")
    val big = VersionedTable.Manifest(
      data = bigData, dvs = Nil,
      stats = bigData.zipWithIndex.map { case (r, i) =>
        r -> Map("id" -> (i * 1000.0, i * 1000.0 + 999.0))
      }.toMap,
      batch = None,
      rowCounts = bigData.map(_ -> 50000L).toMap,
      nullCounts = bigData.map(_ -> Map("id" -> 0L)).toMap)
    val tmpdir = System.getProperty("java.io.tmpdir")
    val textPath = s"$tmpdir/graft_dlp_text100k"
    val pqPath = s"$tmpdir/graft_dlp_pq100k"
    Seq(textPath, pqPath).foreach(graft.io.FsUtil.deleteRecursively)
    graft.io.TableFs.writeUtf8Exclusive(
      s"$textPath/_manifests/v00000.txt",
      VersionedTable.checkpointLines(big).mkString("\n"))
    val rel = VersionedTable.writeCheckpointParquet(pqPath, 0, big)
    graft.io.TableFs.writeUtf8Exclusive(
      s"$pqPath/_manifests/v00000.txt", s"#ckpt=$rel")
    val textBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$textPath/_manifests/v00000.txt"))
    val pqBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$pqPath/_manifests/$rel"))
    // COLD = first read in this JVM (no warm pass)
    val textCold = time {
      assert(VersionedTable.readManifest(textPath, 0)
        .data.length == nBig)
    }
    val pqCold = time {
      assert(VersionedTable.readManifest(pqPath, 0)
        .data.length == nBig)
    }
    val pqWarm = (1 to 3).map(_ =>
      time(VersionedTable.readManifest(pqPath, 0))).min
    println(f"100k-file checkpoint: text ${textBytes / 1024}%d KB " +
      f"(cold read $textCold%.0f ms) vs parquet ${pqBytes / 1024}%d KB " +
      f"(cold read $pqCold%.0f ms, warm $pqWarm%.0f ms) — " +
      f"${textBytes.toDouble / pqBytes}%.1fx smaller")
    spark.stop()
  }
}
