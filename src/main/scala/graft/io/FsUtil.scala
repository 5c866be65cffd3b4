package graft.io

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Shared local-filesystem helpers for the query modules' scratch
  * directories (checkpoints, staged indexes, per-run temp tables).
  *
  * The one rule this module exists to enforce: `Files.walk`/`Files.list`
  * return STREAMS HOLDING AN OPEN DIRECTORY FD that is released only on
  * `close()` — the bare `.iterator().asScala` idiom leaks one fd per
  * call until GC, and scratch-dir cleanup runs on every query in a
  * long-lived driver. All walks here close via `Using.resource`.
  */
object FsUtil {

  /** Recursive delete, deepest-first; no-op when `p` doesn't exist. */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Using.resource(Files.walk(p)) { st =>
        st.iterator().asScala.toSeq.reverse
          .foreach(f => Files.deleteIfExists(f))
      }
    }
  }

  def deleteRecursively(p: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(p))
}
