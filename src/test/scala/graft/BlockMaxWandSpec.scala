package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.corpus.CorpusGen
import graft.exec.BlockMaxWand
import graft.index.{IndexBuilder, IndexConfig, PostingBlocks}
import graft.model.BM25
import org.scalatest.funspec.AnyFunSpec

/** SURVEY §4 item 5 / §5.3: block-max WAND must be provably
  * rank-identical — same extids, bit-identical scores — to the exhaustive
  * DAAT path, across many random bag-of-words queries and a block size
  * small enough (4) that multi-block skipping is genuinely exercised. */
class BlockMaxWandSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  private val model = BM25(1.2f, 0.75f, 0f)

  private lazy val (engine, blocks4) = {
    val idx = IndexBuilder.build(spark, CorpusGen.df(spark, 200),
      IndexConfig(buckets = 4)).cacheAll()
    val b4 = PostingBlocks
      .fromPostings(spark, idx.postings, idx.doclen, blockSize = 4).cache()
    (new SearchEngine(idx, AnalyzerConfig.code), b4)
  }

  private def vocab: Seq[String] = {
    import spark.implicits._
    engine.index.termStats.orderBy($"df".desc)
      .select($"term").as[String].take(60).toSeq
  }

  private def runBoth(terms: Seq[String], k: Int): Unit = {
    val q = terms.mkString(" ")
    val exhaustive = engine.search(s"#SUM(${terms.mkString(" ")})", model, k)
      .select("extid", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toVector
    val pruned = engine.rank(
      BlockMaxWand.topK(engine.index, blocks4, model, terms, "body", k), k)
      .select("extid", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toVector
    assert(pruned.length == exhaustive.length, s"[$q] row count")
    pruned.zip(exhaustive).zipWithIndex.foreach {
      case (((pe, ps), (ee, es)), i) =>
        assert(pe == ee, s"[$q] rank ${i + 1}: extid $pe vs $ee")
        assert(java.lang.Double.doubleToLongBits(ps) ==
               java.lang.Double.doubleToLongBits(es),
          s"[$q] rank ${i + 1} ($pe): score $ps vs $es")
    }
  }

  describe("block-max WAND vs exhaustive DAAT (bit-identical top-k)") {
    it("hot terms (negative RSJ possible), k = 10") {
      runBoth(vocab.take(3), 10)
    }
    it("mixed hot + rare terms, k = 25") {
      val v = vocab
      runBoth(Seq(v.head, v(v.length / 2), v.last), 25)
    }
    it("duplicate query terms (#SUM child multiplicity)") {
      val v = vocab
      runBoth(Seq(v(5), v(5), v(20)), 15)
    }
    it("single term") { runBoth(Seq(vocab(10)), 10) }
    it("term with no postings mixed in") {
      runBoth(Seq(vocab(8), "zzznotaterm"), 10)
    }
    it("k larger than the candidate set") {
      runBoth(Seq(vocab.last), 1000)
    }
    it("100 random seeded queries, k ∈ {1, 5, 20}") {
      val v = vocab
      val rnd = new scala.util.Random(42)
      (0 until 100).foreach { _ =>
        val n = 1 + rnd.nextInt(5)
        val terms = Seq.fill(n)(v(rnd.nextInt(v.length)))
        runBoth(terms, Seq(1, 5, 20)(rnd.nextInt(3)))
      }
    }
  }

  describe("searchPruned facade") {
    it("free text under BM25 takes the pruned path and matches search()") {
      val q = "open inverted index query"
      val a = engine.search(q, model, 50).select("extid", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toVector
      val b = engine.searchPruned(q, model, 50)
        .select("extid", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toVector
      assert(a == b)
    }
    it("structured queries fall back to the exhaustive planner") {
      val q = "#SUM(#NEAR/1(inverted index) open)"
      val a = engine.search(q, model, 20).select("extid").collect().toSeq
      val b = engine.searchPruned(q, model, 20).select("extid").collect().toSeq
      assert(a == b)
    }
  }
}
