package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.model._
import org.scalatest.funspec.AnyFunSpec

/** The reference repo's OWN query files
  * (`QryEval/queries.txt`, `queriesAnd.txt`, `queriesOr.txt`,
  * `queries (copy).txt`, `cw09testing.query`) parsed and evaluated
  * through this engine — every line must reproduce the reference
  * parser's behavior: the well-formed ones evaluate (the ClueWeb terms
  * simply may not match the synthetic corpus), and the one broken line
  * errors exactly like the reference's "Query syntax is incorrect". */
class RefQueriesSpec extends AnyFunSpec {

  private val cfg = AnalyzerConfig.code
  private lazy val spark = TestSpark.spark

  private lazy val engine: SearchEngine = {
    val idx = IndexBuilder.build(spark, CorpusGen.df(spark, 120),
      IndexConfig(analyzer = cfg, buckets = 8,
        fields = Seq("body", "title", "url", "inlink", "keywords")))
      .cacheAll()
    new SearchEngine(idx, cfg)
  }

  private def load(name: String): Seq[(Int, String)] = {
    val src = scala.io.Source.fromFile(s"/root/reference/QryEval/$name")
    try src.getLines().filter(_.contains(":")).map { l =>
      val i = l.indexOf(':')
      l.substring(0, i).trim.toInt -> l.substring(i + 1).trim
    }.toSeq
    finally src.close()
  }

  it("queries.txt (SDM #WAND shapes) all parse and evaluate under Indri") {
    val qs = load("queries.txt")
    assert(qs.size == 25)
    qs.foreach { case (_, q) =>
      val n = engine.search(q, Indri(2500f, 0.4f), 100).count()
      assert(n >= 0)
    }
  }

  it("queriesAnd.txt evaluates under Indri and RankedBoolean") {
    load("queriesAnd.txt").foreach { case (_, q) =>
      assert(engine.search(q, Indri(2500f, 0.4f), 100).count() >= 0)
      assert(engine.search(q, RankedBoolean, 100).count() >= 0)
    }
  }

  it("queriesOr.txt evaluates under RankedBoolean") {
    load("queriesOr.txt").foreach { case (_, q) =>
      assert(engine.search(q, RankedBoolean, 100).count() >= 0)
    }
  }

  it("cw09testing.query free text evaluates under BM25") {
    load("cw09testing.query").foreach { case (_, q) =>
      assert(engine.search(q, BM25(1.2f, 0.75f, 0f), 100).count() >= 0)
    }
  }

  it("queries (copy).txt quirks: mixed case, commas, nesting, fields parse; the broken line errors") {
    val qs = load("queries (copy).txt").toMap
    // mixed-case #Near/1, comma delimiters, nested #Near, .keywords field
    Seq(10, 12, 26, 29, 33, 52, 71, 149).foreach { id =>
      qs.get(id).foreach { q =>
        assert(engine.search(q, RankedBoolean, 100).count() >= 0, s"qid $id")
      }
    }
    // qid 102 `#And(fickle, #near(creek farm))` and qid 190
    // `#And(Near/1(...) clearance)`: `#near`/`Near/1` without the `#.../n`
    // shape is NOT an operator — it lexes to the term "near" and the inner
    // ")" closes the #And early, leaving tokens ⇒ the reference prints
    // "Query syntax is incorrect" and returns null; we throw the same
    Seq(102, 190).foreach { id =>
      val e = intercept[IllegalArgumentException] {
        engine.search(qs(id), RankedBoolean, 100).count()
      }
      assert(e.getMessage.contains("Query syntax is incorrect"), s"qid $id")
    }
  }
}
