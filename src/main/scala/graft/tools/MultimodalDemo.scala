package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, SimilaritySearch}
import graft.io.Tables

/** Dev diagnostic: the full multimodal pipeline — binary content →
  * decode/resize/frame/feature stubs → ANN over the derived embeddings.
  */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    implicit val spark = graft.Engine.session(appName = "multimodal-demo")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val media = Multimodal.withBinaryContent(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("content"))
      .as[Multimodal.MediaRecord](org.apache.spark.sql.Encoders.product)
    val meta = Multimodal.decodeImageStub(media)
    println("DECODED=" + meta.count())
    meta.show(3, false)
    val feats = Multimodal.featureExtractStub(media).toDF()
      .withColumnRenamed("doc_id", "vec_id")
    val knn = SimilaritySearch.bruteTopK(feats.filter(col("vec_id") < 2), feats, 3)
    println("ANN_OVER_EXTRACTED_FEATURES:")
    knn.show(6, false)
    // probe: empty binary content
    import spark.implicits._
    val empty = Seq(Multimodal.MediaRecord(99L, Array.empty[Byte])).toDS()
    println("EMPTY_META=" + Multimodal.decodeImageStub(empty).collect().toSeq)
    println("EMPTY_FEAT_NORM=" + Multimodal.featureExtractStub(empty)
      .collect().head.embedding.sum)
    spark.stop()
  }
}
