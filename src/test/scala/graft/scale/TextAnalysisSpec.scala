package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  def docs = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      // heavy in de profile n-grams (sch/ich/ung/ei): → de
      (1L, "schneller schein bereich zeichnung schwingung ein", "de"),
      // heavy in en profile n-grams (th/ing/wh/ow): → en
      (2L, "the thing which grows throws down the window showing", "en"),
      // empty-ish: all scores 0 → fixed-order tie-break picks en
      (3L, "zzz", "zh")
    ).toDF("doc_id", "text", "lang")
  }

  test("char-n-gram language ID picks the profile-dominant language, " +
    "with deterministic tie-break") {
    val conf = TextAnalysis.langNgramConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf === Map(("de", "de") -> 1L, ("en", "en") -> 1L, ("zh", "en") -> 1L))
  }

  test("word-level and char-level ID agree on clearly-marked text") {
    val pred = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    // doc 2 carries English stopwords too; doc 1 has no de stopwords in
    // this sample so word-level falls back to the tie-break
    assert(pred(2L) === "en")
  }
}
