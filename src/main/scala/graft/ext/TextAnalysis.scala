package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, Rounding}

/** Text-analysis operators for a training-data pipeline (north-star ops):
  * token counting (whitespace + BPE-ish regex), quality scoring, language
  * identification (marker-word heuristic), and document fingerprinting.
  * All pure Catalyst column expressions — codegen-friendly, no UDFs, no
  * shuffles; at 100 TB these are embarrassingly-parallel per-row scans
  * whose cost is the parquet read itself.
  *
  * Every definition here has an exact DuckDB replay used by the oracle
  * queries (graft.queries.ExtensionQueries), so the semantics are pinned
  * end-to-end, not just eyeballed.
  */
object TextAnalysis {

  /** Whitespace tokenization (count basis). */
  def wsTokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  /** BPE-ish pre-tokenizer: letter runs | single digits | single
    * non-alnum marks — the shape GPT-2's pre-tokenizer produces, minus
    * byte-level merges (a fair token-count proxy when no vocab is loaded).
    */
  val BpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Language-marker word lists (tiny stopword sets). Deterministic
    * heuristic: most marker hits wins; ties and zero-hit docs resolve in
    * declared order / to "unknown".
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  def markerHits(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers.map(lit(_)): _*)))

  /** Predicted language label from marker hits over lowercased ws tokens. */
  def langId(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val scores = Markers.map { case (l, ms) => l -> markerHits(toks, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("unknown"))) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }.otherwise(lit("unknown"))
  }

  /** Punctuation ratio: non-alnum-non-space chars / total chars. */
  def punctRatio(text: Column): Column =
    Rounding.stableRound6(size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double") / greatest(length(text), lit(1)))

  /** Stopword ratio over whitespace tokens (English marker set). */
  def stopwordRatio(text: Column): Column = {
    val toks = wsTokens(lower(text))
    Rounding.stableRound6(markerHits(toks, Markers.head._2).cast("double")
      / greatest(size(toks), lit(1)))
  }

  /** Composite quality score in [0,1]: length saturation + low punctuation
    * + stopword presence (the classic cheap heuristics, e.g. Gopher rules).
    */
  def qualityScore(text: Column): Column =
    Rounding.stableRound6(
      lit(0.4) * least(size(wsTokens(text)).cast("double") / 50.0, lit(1.0))
        + lit(0.3) * (lit(1.0) - punctRatio(text))
        + lit(0.3) * least(stopwordRatio(text) * 5.0, lit(1.0)))

  /** PII redaction patterns, applied IN ORDER (email before IP: an
    * email's host part can contain digit runs an IP pattern would
    * otherwise claim). Patterns are deliberately RE2-compatible — no
    * backreferences or lookaround — so the Java regex engine (Spark) and
    * RE2 (the DuckDB oracle) produce byte-identical redactions; that
    * cross-engine agreement is what q77 gates.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+\\d{1,2}-\\d{3}-\\d{4}" -> "<PHONE>")

  /** Scrub emails / IPv4s / phone numbers from a text column — the
    * standard pre-training redaction pass. Pure chained `regexp_replace`
    * projections: codegen'd, shuffle-free, embarrassingly parallel — the
    * 100 TB cost is the scan itself.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Word n-grams WITH multiplicity (unlike `Dedup.shingles`, which
    * dedups) — repetition analysis needs occurrence counts. Compiled
    * (`WordNgrams`); see `Dedup.shingles` for the HOF-inlining trap the
    * compiled form avoids.
    */
  def ngramsAll(text: Column, n: Int): Column =
    graft.functions.WordNgrams(text, n, distinct = false)

  /** Whitespace-normalized, lowercased canonical form (fingerprint basis). */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Gopher-style repetition statistics per document: total 2-gram
    * occurrences, the most-frequent 2-gram's share, and the share of
    * occurrences belonging to repeated 2-grams — the standard cheap
    * signals for boilerplate/spam (high dup_gram_frac) ahead of the
    * expensive near-dup pass. Docs with fewer than `n` tokens produce no
    * n-grams and are omitted.
    *
    * Scale shape: two keyed aggregations ((doc, gram) then doc) — the
    * word-count plan, with partial aggregation collapsing repeats
    * map-side; never a per-row O(grams²) multiplicity scan.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 2): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(ngramsAll(col(textCol), n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").cast("long").as("n_grams"),
        Rounding.stableRound6(max("c").cast("double") / sum("c")).as("top_gram_frac"),
        Rounding.stableRound6(
          sum(when(col("c") > 1, col("c")).otherwise(0)).cast("double") / sum("c"))
          .as("dup_gram_frac"))

  /** RAG-style document chunking: overlapping token windows of
    * `chunkSize` tokens every `stride` tokens (stride < chunkSize ⇒
    * overlap), the standard retrieval-corpus preparation. Output one row
    * per chunk: (doc_id, chunk_idx, start_tok, n_tokens, chunk_text);
    * the tail chunk may be short. Pure per-row projection + explode —
    * shuffle-free, embarrassingly parallel; chunk count per doc is
    * ⌈n/stride⌉, so the lambda re-evaluates the token split O(chunks)
    * times per row (bounded small — unlike the per-ELEMENT n-gram trap,
    * see `WordNgrams`).
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize and stride must be positive, got ($chunkSize, $stride)")
    // Text.words (single-space split), NOT wsTokens (\S+): the q83
    // oracle splits with string_split(text, ' '), and a tab/newline in a
    // document would move chunk boundaries between the engines under \S+
    df.select(col(idCol).as("doc_id"), graft.ops.Text.words(col(textCol)).as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("n"),
        posexplode(expr(
          s"""transform(sequence(0, n - 1, $stride), s -> struct(
             |  s AS start_tok,
             |  least($chunkSize, n - s) AS n_tokens,
             |  array_join(slice(toks, s + 1, $chunkSize), ' ') AS chunk_text))"""
            .stripMargin)).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"), col("c.start_tok"),
        col("c.n_tokens"), col("c.chunk_text"))
  }

  /** Content-addressed fingerprint (md5 of the normalized text). */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Rolling-hash fingerprint (PolyHash of the normalized text) — the
    * integer form used for MinHash/SimHash seeding.
    */
  def fingerprintPoly(text: Column): Column = PolyHash(normalize(text))
}
