package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's text-preprocessing semantics as reusable Catalyst column
  * expressions (SURVEY.md §1 + §2a ops 3 and 7).
  *
  * Cleaning (`/root/reference/master.py:43`): delete every character outside
  * `[a-zA-Z0-9 ]`.
  *
  * Tokenization with offsets (`/root/reference/mapper_word_count.py:11-22`,
  * byte-identical in `mapper_inverted_index.py`): split on single spaces,
  * drop empty tokens, and give each emitted word the running offset that
  * advances by `len(word)+1` per *emitted* word only — empty tokens from
  * runs of ≥2 spaces do NOT advance it (the reference's documented drift
  * quirk; SURVEY.md §1 pair-2). Implemented with the `aggregate` higher-order
  * function over the split array so the whole thing stays a Catalyst
  * expression — no UDF, no row serde, fully distributed per-row work.
  */
object Text {

  /** Op 3: regex-clean projection. */
  def clean(c: Column): Column = regexp_replace(c, "[^a-zA-Z0-9 ]", "")

  /** Op 7: tokenize a cleaned line into `array<struct<word,off>>`, where
    * `off` is `lineOffset` + the reference's per-word running offset.
    * Compiled expression (graft.functions.TokenizeWithOffsets) — same
    * semantics as the original `aggregate` HOF formulation, evaluated
    * once per row in compiled code.
    */
  def tokensWithOffsets(cleaned: Column, lineOffset: Column): Column =
    graft.functions.TokenizeWithOffsets(cleaned, lineOffset.cast("long"))

  /** Plain word tokens (no offsets) — the word-count path, pure
    * split+filter so it stays inside whole-stage codegen.
    */
  def words(cleaned: Column): Column =
    filter(split(cleaned, " "), w => length(w) > 0)
}
