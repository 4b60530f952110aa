package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q115 (chunk-level langid disagreement) and q116 (tokenizer fertility)
  * against independent sequential references on plain Scala collections.
  */
class LangConsistencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val stopwords: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Set("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Set("el", "los", "que", "y", "es", "un", "una"),
    "fr" -> Set("le", "les", "et", "est", "une", "des", "dans"),
    "zh" -> Set("的", "是", "在", "了", "我"))

  private def predict(chunk: Seq[String]): String = {
    val scores = stopwords.map { case (l, ws) => l -> chunk.count(ws) }
    // first lang alphabetically whose score >= every later lang's
    scores.zipWithIndex.collectFirst {
      case ((l, s), i) if scores.drop(i + 1).forall(s >= _._2) => l
    }.get
  }

  test("q115_lang_consistency equals the sequential chunk-langid reference") {
    import spark.implicits._
    val docs = graft.Fixtures.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expected = docs.flatMap { case (id, text) =>
      val preds = text.split(" ", -1).grouped(32).map(c => predict(c.toSeq)).toSeq
      val byPred = preds.groupBy(identity).view.mapValues(_.size)
      if (byPred.size > 1)
        Some((id, preds.size.toLong, byPred.size.toLong,
          math.floor(byPred.values.max.toDouble / preds.size * 1e6 + 0.5) / 1e6))
      else None
    }.sortBy(_._1)
    assert(expected.nonEmpty, "vacuous fixture: no mixed-prediction documents")
    val got = SparkEntry.queries("q115_lang_consistency")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q116_tokenizer_fertility equals the sequential regex-count reference") {
    import spark.implicits._
    val docs = graft.Fixtures.documents(spark, dir)
      .select($"lang", $"text").as[(String, String)].collect().toSeq
    val re = java.util.regex.Pattern.compile("\\w+|[^\\w\\s]")
    val expected = docs.groupBy(_._1).toSeq.map { case (lang, ds) =>
      val subw = ds.map { case (_, t) =>
        val m = re.matcher(t); var c = 0L; while (m.find()) c += 1; c
      }.sum
      val words = ds.map(_._2.split(" ", -1).length.toLong).sum
      (lang, ds.size.toLong, subw, words,
        math.floor(subw.toDouble / words * 1e6 + 0.5) / 1e6)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q116_tokenizer_fertility")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }
}
