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
    spark.stop()
  }
}
