package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Text

/** The reference's inverted-index job (`mapper_inverted_index.py` +
  * `reducer_inverted_index.py`): word → sorted list of character offsets
  * into the concatenated cleaned text (SURVEY.md §2a job 2, offset quirks
  * §1). The reference's posting order is arrival-order nondeterministic
  * (`database_server.py:61-66`); sorted postings are this engine's declared
  * contract.
  */
object InvertedIndex {

  /** Exploded postings — one row per (word, offset); the groupable form. */
  def postings(records: DataFrame,
               lineCol: String = "line",
               offsetCol: String = "offset"): DataFrame =
    records
      .select(explode(Text.tokensWithOffsets(col(lineCol), col(offsetCol))).as("t"))
      .select(col("t.word").as("word"), col("t.off").as("off"))

  /** word → sort_array(collect_list(offset)): one shuffle on the word. */
  def apply(records: DataFrame,
            lineCol: String = "line",
            offsetCol: String = "offset"): DataFrame =
    postings(records, lineCol, offsetCol)
      .groupBy("word")
      .agg(sort_array(collect_list(col("off"))).as("postings"))
}
