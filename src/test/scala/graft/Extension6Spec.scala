package graft

import org.apache.spark.sql.functions._

/** Round-6 operators: config-file job dispatch. */
class Extension6Spec extends SparkSpec {

  // --- config-file job dispatch -------------------------------------

  test("reference input_info.json dispatches the inverted-index job") {
    // the reference's OWN config file, unmodified: relative input path,
    // stringly-typed counts, python script names — the dispatcher must
    // resolve all of it (input_info.json names mapper_inverted_index.py)
    val out = graft.api.JobConfig
      .run(spark, "/root/reference/input_info.json")
    assert(out.columns.toSeq == Seq("word", "postings"))
    // same result as driving the job directly
    val direct = graft.jobs.InvertedIndex(
      graft.io.TextRecords.read(spark, "/root/reference/input.txt"))
    assert(out.orderBy("word").collect().toSeq ==
      direct.orderBy("word").collect().toSeq)
  }

  test("job spec parsing: job field wins, mismatched pair rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jobspec_t")
    def write(name: String, body: String) = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p, body)
      p.toString
    }
    val ok = write("a.json",
      """{"job": "word_count", "mapper_file": "mapper_inverted_index.py",
        |"input_file_location": "in.txt"}""".stripMargin)
    val spec = graft.api.JobConfig.load(spark, ok)
    assert(spec.job == "word_count")
    assert(spec.inputPath == dir.resolve("in.txt").toString)

    val bad = write("b.json",
      """{"mapper_file": "mapper_word_count.py",
        |"reducer_file": "reducer_inverted_index.py",
        |"input_file_location": "in.txt"}""".stripMargin)
    intercept[IllegalArgumentException] {
      graft.api.JobConfig.load(spark, bad)
    }
    val unknown = write("c.json",
      """{"job": "nope", "input_file_location": "in.txt"}""")
    intercept[IllegalArgumentException] {
      graft.api.JobConfig.run(spark, unknown)
    }
  }

  test("custom registered jobs are spec-addressable") {
    graft.api.JobConfig.register("line_count",
      records => records.agg(count(lit(1)).as("n")))
    val dir = java.nio.file.Files.createTempDirectory("graft_jobspec_c")
    val cfg = dir.resolve("spec.json")
    java.nio.file.Files.writeString(cfg,
      """{"job": "line_count",
        |"input_file_location": "/root/reference/input.txt"}""".stripMargin)
    val n = graft.api.JobConfig.run(spark, cfg.toString)
      .head().getLong(0)
    val expected = graft.io.TextRecords
      .read(spark, "/root/reference/input.txt").count()
    assert(n == expected && n > 0)
  }
}
