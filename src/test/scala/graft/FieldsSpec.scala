package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.model.RankedBoolean
import org.scalatest.funspec.AnyFunSpec

/** Field completeness (§2.5 / reference `QryEval.java:467`): inlink and
  * keywords analogs are real indexed fields, and an unknown field is a
  * query syntax error instead of silently matching nothing. */
class FieldsSpec extends AnyFunSpec {

  private val cfg = AnalyzerConfig.code
  private lazy val spark = TestSpark.spark

  private lazy val engine: SearchEngine = {
    val idx = IndexBuilder.build(spark, CorpusGen.df(spark, 120),
      IndexConfig(analyzer = cfg, buckets = 8,
        fields = Seq("body", "title", "url", "inlink", "keywords")))
      .cacheAll()
    new SearchEngine(idx, cfg)
  }

  it("keywords field matches the language tag") {
    // every 5th doc has lang=scala (CorpusGen cycles langs)
    val n = engine.search("#AND(scala.keywords)", RankedBoolean, 100).count()
    assert(n > 0)
  }

  it("inlink field matches referrer text (repo tokens)") {
    // all repos are org/repo-XXXXX → token "org" is in every inlink
    val n = engine.search("#AND(org.inlink)", RankedBoolean, 100).count()
    assert(n == 100)
  }

  it("unrecognized field suffix is analyzed into the term (parser quirk)") {
    // the reference parser only recognizes the five field names; any other
    // `.suffix` stays in the token and the analyzer keeps tokenized[0]
    // — `hash.bogusfield` ≡ `hash` (QueryParser multi-dot quirk)
    val a = engine.search("def.bogusfield", RankedBoolean, 10).count()
    val b = engine.search("def", RankedBoolean, 10).count()
    assert(a == b && a > 0)
  }

  it("fields the index was NOT built with also error") {
    val bodyOnly = new SearchEngine(
      IndexBuilder.build(spark, CorpusGen.df(spark, 30),
        IndexConfig(analyzer = cfg, buckets = 4, fields = Seq("body"))),
      cfg)
    val e = intercept[IllegalArgumentException] {
      bodyOnly.scores("org.inlink", RankedBoolean).count()
    }
    assert(e.getMessage.contains("Unknown field"))
  }
}
