package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension-maintenance merges as pure DataFrame compositions — the
  * MERGE INTO semantics a warehouse user expects, without requiring a
  * row-level-update table format. The reference has no mutable state at
  * all (its "database" rewrites a whole JSON file per set —
  * database_server.py:32-33); this is the standard-categories gap filler
  * for upsert-shaped workloads.
  */
object Upsert {

  /** SCD-2 apply (slowly changing dimension, type 2): fold a change
    * batch into a dimension snapshot, keeping history. Output is one row
    * per (key, version):
    *
    *  - matched keys: the base row expires (`is_current = false`,
    *    version 1) and the change row becomes current (version 2);
    *  - unmatched base keys: carried forward unchanged (version 1,
    *    current);
    *  - brand-new keys: inserted as version 1, current.
    *
    * Three joins on the key — semi, anti, left — each broadcastable when
    * the change batch is small relative to the dimension (the common
    * case: AQE or an explicit `broadcast(changes)` upstream turns all
    * three into one dimension scan with no shuffle). No driver state, no
    * collect; at 100 TB the dimension side streams through exactly once
    * per join.
    *
    * @param valueCols the non-key columns to carry (both inputs must
    *                  have them)
    */
  def scd2(base: DataFrame, changes: DataFrame, keyCol: String,
           valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "scd2: at least one value column")
    val outCols = col(keyCol) +: valueCols.map(col)
    val changeKeys = changes.select(keyCol)
    val expired = base.join(changeKeys, Seq(keyCol), "left_semi")
      .select(outCols :+ lit(1L).as("version") :+ lit(false).as("is_current"): _*)
    val carried = base.join(changeKeys, Seq(keyCol), "left_anti")
      .select(outCols :+ lit(1L).as("version") :+ lit(true).as("is_current"): _*)
    val applied = changes
      .join(base.select(col(keyCol), lit(1).as("matched")), Seq(keyCol), "left")
      .select(outCols
        :+ when(col("matched").isNotNull, 2L).otherwise(1L).as("version")
        :+ lit(true).as("is_current"): _*)
    expired.unionAll(carried).unionAll(applied)
  }
}
