package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.functions.GraftFunctions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("langId picks the marker-dominant language, 'und' when none") {
    val df = Seq(
      (0L, "the cat and the dog is in the house"),
      (1L, "el perro y la casa de un hombre en la calle"),
      (2L, "der hund ist von der frau und das kind nicht da"),
      (3L, "xyzzy plugh qwerty")
    ).toDF("id", "text")
    val out = TextAnalysis.langId(df, "id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, "en"), (1L, "es"), (2L, "de"), (3L, "und")))
  }

  test("quality features: clean prose scores higher than symbol soup") {
    val df = Seq(
      (0L, "A clear well written sentence with many distinct useful words."),
      (1L, "@@@@ #### $$$$ %%%% ^^^^ &&&& 1 1 1 1 1 1")
    ).toDF("id", "text")
    val out = TextAnalysis.qualityScore(df, "id", "text")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(out(0)._2 > out(1)._2)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = Seq(
      (0L, "Hello   World"),
      (1L, "hello world"),
      (2L, "hello worlds")
    ).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprintMd5(col("text")))
      .as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("tokenCount expression agrees with built-in split-based tokens") {
    val docs = Tables(spark, sfDir, "documents")
    val diff = docs.select(
        tokenCount(col("text")).as("a"),
        size(tokens(col("text"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }
}
