package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import org.scalatest.funspec.AnyFunSpec

/** O18 internal↔external docid lookup (`QryEval.java:295-323`). */
class IdLookupSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private lazy val engine = {
    import spark.implicits._
    new SearchEngine(
      IndexBuilder.build(spark, CorpusGen.docs(40).toDF(),
        IndexConfig(buckets = 4)).cacheAll(),
      AnalyzerConfig.code)
  }

  it("round-trips internal → external → internal for every doc") {
    val docs = engine.index.docs.select("docid", "extid").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length == 40)
    docs.take(5).foreach { case (d, e) =>
      assert(engine.externalId(d).contains(e))
      assert(engine.internalId(e).contains(d))
    }
  }

  it("returns None for unknown ids") {
    assert(engine.externalId(-1L).isEmpty)
    assert(engine.internalId("no/such@doc").isEmpty)
  }
}
