package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding
import graft.io.Tables

/** Round-6 wave: config-file job dispatch (q128) and the round's new
  * operators. Same contract as every other module: each Spark pipeline
  * pairs with DuckDB oracle SQL replaying it.
  */
object ExtensionQueries6 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q128: config-file job dispatch — the reference's literal entry
    // point (`input_info.json` + `master.py:178-198`): a JSON spec names
    // the input file and the job; the engine loads the spec and runs the
    // registered pipeline (api.JobConfig). The gate writes a spec that
    // is field-for-field the reference's shape (mapper_file/reducer_file
    // script names, stringly-typed counts) pointing word_count at the
    // reference corpus, dispatches it, and the oracle replays q34's
    // independent DuckDB word count — so the whole load→resolve→dispatch
    // path is hash-gated, not just the job underneath it.
    Q(
      "q128_job_config_dispatch",
      (s, _) => {
        val dir = java.nio.file.Files.createTempDirectory("graft_jobspec")
        val cfg = dir.resolve("input_info.json")
        java.nio.file.Files.writeString(cfg,
          s"""{
             |  "input_file_location" : "${TextQueries.ReferenceCorpus}",
             |  "no_of_mappers" : "3",
             |  "no_of_reducers" : "3",
             |  "mapper_file" : "mapper_word_count.py",
             |  "reducer_file" : "reducer_word_count.py"
             |}""".stripMargin)
        graft.api.JobConfig.run(s, cfg.toString).orderBy("word")
      },
      Some(s"""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(string_split_regex(
             |    regexp_replace(content, '[^a-zA-Z0-9 \\n]', '', 'g'), '[ \\n]')) AS word
             |  FROM read_text('${TextQueries.ReferenceCorpus}'))
             |WHERE word <> ''
             |GROUP BY word
             |ORDER BY word""".stripMargin))
  )
}
