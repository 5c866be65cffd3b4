package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Text

/** The reference's word-count job (`mapper_word_count.py` +
  * `reducer_word_count.py`) as one declarative pipeline:
  * clean → tokenize → groupBy(word).count (SURVEY.md §2a job 1).
  *
  * The reference's `len(word) % R` routing (`mapper_word_count.py:28`) is an
  * execution detail with ~20 effective partitions and massive skew; results
  * are invariant to partitioning, so here the shuffle hash-partitions on the
  * full word — Spark's partial aggregation means each map task emits one row
  * per distinct word, not per occurrence, before the shuffle.
  */
object WordCount {

  /** @param lines DataFrame with a cleaned `line` column (TextRecords.read
    *              output, or any frame after Text.clean).
    */
  def apply(lines: DataFrame, lineCol: String = "line"): DataFrame =
    lines
      .select(explode(Text.words(col(lineCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
}
