package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.index.{IndexBuilder, IndexConfig}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Forward-index positions parity (reference `TermVector.java:25,62-89`):
  * positions(p) = 1-based stem index of the word at position p, 0 for
  * stopword gaps, array ending at the last indexed position — plus the
  * snippet consumer built on it. */
class FwdIndexSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  private def buildIndex(cfg: AnalyzerConfig, texts: Seq[String]) = {
    import spark.implicits._
    val corpus = texts.zipWithIndex.map { case (t, i) =>
      ("r", f"f$i%03d", "c", "scala", t)
    }.toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, corpus,
      IndexConfig(analyzer = cfg, buckets = 2, fields = Seq("body")))
  }

  it("positions reproduce the reference's word-position -> stem-index map") {
    val idx = buildIndex(AnalyzerConfig.code,
      Seq("beta alpha beta gamma alpha"))
    val r = idx.fwdIndex.filter(col("field") === "body")
      .select("stems", "stemFreq", "positions").collect()(0)
    assert(r.getSeq[String](0) == Seq("alpha", "beta", "gamma"))
    assert(r.getSeq[Int](1) == Seq(2, 2, 1))
    // beta alpha beta gamma alpha -> stem indexes 2 1 2 3 1
    assert(r.getSeq[Int](2) == Seq(2, 1, 2, 3, 1))
  }

  it("stopword positions are 0-gaps and the array ends at the last indexed position") {
    val idx = buildIndex(AnalyzerConfig.english,
      // 'the'/'and' are stopwords; trailing stopword is NOT in the array
      Seq("the alpha and beta the"))
    val r = idx.fwdIndex.filter(col("field") === "body")
      .select("stems", "positions").collect()(0)
    assert(r.getSeq[String](0) == Seq("alpha", "beta"))
    // positions: the(gap) alpha and(gap) beta | trailing 'the' dropped
    assert(r.getSeq[Int](1) == Seq(0, 1, 0, 2))
  }

  it("snippet returns the window around the first query-term hit") {
    val cfg = AnalyzerConfig.code
    val idx = buildIndex(cfg,
      Seq("one two three four target five six seven eight nine"))
    val engine = new SearchEngine(idx, cfg)
    val docid = idx.docs.select("docid").collect()(0).getLong(0)
    val s = engine.snippet(docid, "body", "target", window = 4)
    assert(s.contains("three four target five"))
    assert(engine.snippet(docid, "body", "nomatch").isEmpty)
    // un-indexed field => no vector => no snippet
    assert(engine.snippet(docid, "title", "target").isEmpty)
  }

  it("distributed snippets equal the per-doc point lookups, with stopword " +
     "gaps rendered") {
    val cfg = AnalyzerConfig.english
    val idx = buildIndex(cfg, Seq(
      "one two three target the five six",
      "alpha beta gamma delta",
      "target the epsilon"))
    val engine = new SearchEngine(idx, cfg)
    val got = engine.snippets("target", "body", window = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docids = idx.docs.select("path", "docid").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc 0: hit at pos 3, lo=1, window "two three target …(the)"
    assert(got(docids("f000")) == "two three target …")
    // doc 1: no hit — absent
    assert(!got.contains(docids("f001")))
    // doc 2: hit at 0, "target …(the) epsilon"
    assert(got(docids("f002")) == "target … epsilon")
    // parity with the point lookup on every returned doc
    got.foreach { case (d, snip) =>
      assert(engine.snippet(d, "body", "target", window = 4)
        .contains(snip))
    }
  }
}
