package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.corpus.CorpusGen
import graft.exec.Expansion
import graft.index.{IndexBuilder, IndexConfig}
import graft.model._
import graft.oracle.RefEngine
import org.scalatest.funspec.AnyFunSpec

/** O16 PRF expansion (SURVEY §2.6): the learned `#WAND` query — weights
  * AND term order — and the final reranking of the combined query must be
  * identical to the reference-transliteration oracle. */
class ExpansionSpec extends AnyFunSpec {

  private val cfg = AnalyzerConfig.code
  private lazy val spark = TestSpark.spark
  private lazy val corpus = CorpusGen.docs(150)

  private lazy val engine: SearchEngine = {
    import spark.implicits._
    val idx = IndexBuilder.build(spark, corpus.toDF(),
      IndexConfig(analyzer = cfg, buckets = 8)).cacheAll()
    new SearchEngine(idx, cfg)
  }

  private lazy val oracle: RefEngine = new RefEngine(
    corpus.map { d =>
      (s"${d.repo}/${d.path}@${d.commit}", Map("body" -> d.content))
    }, cfg)

  private val model = Indri(2500f, 0.4f)

  private def check(name: String, query: String, fbDocs: Int, fbTerms: Int,
                    fbMu: Double, fbOrigWeight: Double): Unit = {
    it(s"$name: `$query` fbDocs=$fbDocs fbTerms=$fbTerms fbMu=$fbMu") {
      val fb = Expansion.FbParams(fbDocs, fbTerms, fbMu, fbOrigWeight)
      val (learned, combined) = engine.expand(query, model, fb)
      val (oLearned, oCombined) =
        oracle.expandQuery(query, model, fbDocs, fbTerms, fbMu, fbOrigWeight)
      assert(learned == oLearned, "learned query string")
      assert(combined == oCombined, "combined query string")

      val expected = oracle.topkQuery(oCombined, model, 50)
      val got = engine.search(combined, model, 50)
        .select("extid", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toVector
      assert(got.length == expected.length)
      got.zip(expected).zipWithIndex.foreach { case (((ge, gs), (oe, os)), i) =>
        assert(ge == oe, s"rank ${i + 1}: extid got=$ge expected=$oe")
        assert(java.lang.Double.doubleToLongBits(gs) ==
               java.lang.Double.doubleToLongBits(os),
          s"rank ${i + 1} ($ge): score got=$gs expected=$os")
      }
    }
  }

  describe("PRF query expansion vs reference-transliteration oracle") {
    check("free text", "open inverted index", 10, 10, 2500.0, 0.5)
    check("structured", "#AND(query evaluation)", 5, 8, 1500.0, 0.3)
    check("single feedback doc", "parser", 1, 5, 2500.0, 0.7)
    check("fbTerms > vocab", "zzznotaterm open", 3, 10000, 2500.0, 0.5)
  }

  describe("expansion vocabulary scan (round-4 VERDICT item 4)") {
    it("filters termStats with a pushable In/InSet — no corpus-wide " +
       "probe, and over a snapshot the predicate reaches the parquet scan") {
      import graft.index.IndexStore
      import org.apache.spark.sql.catalyst.expressions.{In, InSet}
      val terms = Seq("open", "inverted", "index")
      // in-memory index: the optimized plan carries the In/InSet filter
      val plan = Expansion.vocabScan(engine.index, terms)
        .queryExecution.optimizedPlan
      val hasIn = plan.expressions.exists(_.exists {
        case _: In | _: InSet => true
        case _                => false
      }) || plan.children.exists(_.expressions.exists(_.exists {
        case _: In | _: InSet => true
        case _                => false
      }))
      assert(hasIn, plan.toString)
      // snapshot-backed index: the predicate is PUSHED to the scan
      val dir = java.nio.file.Files.createTempDirectory("exp-vocab").toString
      IndexStore.save(engine.index, dir)
      val loaded = IndexStore.load(spark, dir)
      val exec = Expansion.vocabScan(loaded, terms)
        .queryExecution.executedPlan.toString
      assert(exec.contains("PushedFilters") &&
             (exec.contains("In(term") || exec.contains("In(`term`")), exec)
    }
  }
}
