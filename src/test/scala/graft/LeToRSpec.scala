package graft

import graft.analysis.AnalyzerConfig
import graft.api.SearchEngine
import graft.corpus.CorpusGen
import graft.exec.LeToR
import graft.index.{IndexBuilder, IndexConfig}
import graft.model.{BM25, Indri}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** O17 LeToR: feature assembly, the reference's per-query min-max
  * normalization rules, svm-light output, and the documented linear
  * ranker substitution (pairwise logistic for svm_rank). */
class LeToRSpec extends AnyFunSpec {

  private val cfg = AnalyzerConfig.code
  private lazy val spark = TestSpark.spark
  private val bm25 = BM25(1.2f, 0.75f, 0f)
  private val indri = Indri(2500f, 0.4f)

  private lazy val engine: SearchEngine = {
    import spark.implicits._
    val idx = IndexBuilder.build(spark, CorpusGen.df(spark, 150),
      IndexConfig(analyzer = cfg, buckets = 8,
        fields = Seq("body", "title", "url"))).cacheAll()
    new SearchEngine(idx, cfg)
  }

  private def featuresFor(q: String, qid: Int, k: Int = 30) = {
    val cands = engine.search(q, bm25, k).select("docid")
    LeToR.rawFeatures(engine.index, q, cfg, cands, bm25, indri)
      .withColumn("qid", lit(qid))
  }

  describe("feature assembly") {
    it("BM25-body feature equals the engine's #SUM BM25 score in double math") {
      import spark.implicits._
      val q = "open inverted index"
      val feats = featuresFor(q, 1)
      // f3 uses the same formula in plain double; ordering by f3 must match
      // the engine's BM25 ranking order on the same candidate set
      val byF3 = feats.join(engine.index.docs.select($"docid", $"extid"), "docid")
        .orderBy(desc("f3"), asc("extid"))
        .select("extid").as[String].collect().toVector
      val byEngine = engine.search(q, bm25, 30)
        .select("extid").as[String].collect().toVector
      assert(byF3 == byEngine)
    }

    it("overlap and contains-field features are in range and consistent") {
      import spark.implicits._
      val feats = featuresFor("open inverted index", 1).cache()
      feats.select("f5", "f8", "f11").as[(Double, Double, Double)]
        .collect().foreach { case (a, b, c) =>
          assert(a >= 0 && a <= 1 && b >= 0 && b <= 1 && c >= 0 && c <= 1)
        }
      // f13 counts fields with ≥1 query term; body overlap > 0 for every
      // BM25 candidate, so f13 ≥ 1
      feats.select("f13").as[Double].collect().foreach(v =>
        assert(v >= 1.0 && v <= 3.0))
      // Indri feature: 0 iff no overlap, else > 0
      feats.select("f4").as[Double].collect().foreach(v => assert(v > 0.0))
    }
  }

  describe("per-query min-max normalization (FeatureVector.java:589-622)") {
    it("normalized features land in [0,1]; degenerate ranges follow the rules") {
      import spark.implicits._
      val f1 = featuresFor("open inverted index", 1)
      val f2 = featuresFor("query evaluation", 2)
      val norm = LeToR.normalize(f1.unionByName(f2)).cache()
      LeToR.FeatureNames.foreach { f =>
        norm.select(col(f)).as[Double].collect().foreach { v =>
          assert(!v.isNaN && v >= 0.0 && v <= 1.0, s"$f: $v")
        }
      }
      // the {0,1}-range rule keeps indicator features as-is (f2 is 0/1)
      val kept = norm.select("f2").as[Double].collect().toSet
      assert(kept.subsetOf(Set(0.0, 1.0)))
    }
  }

  describe("svm-light output (FeatureVector.java:624-637)") {
    it("lines match `rel qid:N 1:v ... 13:v # extid`") {
      import spark.implicits._
      val norm = LeToR.normalize(featuresFor("open inverted", 7))
        .withColumn("rel", lit(1))
        .join(engine.index.docs.select(col("docid"), col("extid")), "docid")
      val lines = LeToR.svmLight(norm).select("line").as[String].collect()
      assert(lines.nonEmpty)
      val re = ("""1 qid:7 """ +
        (1 to 13).map(i => s"$i:[-0-9.E]+ ").mkString +
        """# .+""").r
      lines.foreach(l => assert(re.matches(l), l))
    }
  }

  describe("pairwise-logistic linear ranker (svm_rank substitution)") {
    it("learns to rank relevant docs above irrelevant ones on training data") {
      import spark.implicits._
      // synthetic qrels: the BM25 top-10 of the query are "relevant" —
      // guaranteed mixed labels, and learnable from the BM25 features
      val q = "open inverted index"
      val feats = LeToR.normalize(featuresFor(q, 1)).cache()
      val relDocs = engine.search(q, BM25(1.2f, 0.75f, 0f), 10)
        .select("docid").as[Long].collect().toSet
      val train = feats.withColumn("rel",
        when(col("docid").isin(relDocs.toSeq: _*), 1).otherwise(0))
      val w = LeToR.trainPairwise(train, epochs = 30)
      assert(w.length == 13 && w.exists(_ != 0.0))
      // training determinism
      val w2 = LeToR.trainPairwise(train, epochs = 30)
      assert(w.toSeq == w2.toSeq)
      // the learned model separates train pairs better than chance
      val scored = LeToR.score(feats, w)
        .join(train.select("docid", "rel"), "docid")
        .select("score", "rel").as[(Double, Int)].collect()
      val rels = scored.filter(_._2 == 1).map(_._1)
      val irr = scored.filter(_._2 == 0).map(_._1)
      if (rels.nonEmpty && irr.nonEmpty) {
        val pairs = for { a <- rels; b <- irr } yield if (a > b) 1.0 else 0.0
        assert(pairs.sum / pairs.length > 0.5, "pairwise accuracy")
      }
    }

    it("a unit weight on f3 reproduces the normalized BM25-body ordering") {
      import spark.implicits._
      val feats = LeToR.normalize(featuresFor("query evaluation", 3)).cache()
      val w = Array.tabulate(13)(i => if (i == 2) 1.0 else 0.0)
      val got = LeToR.score(feats, w)
        .select("docid", "score").as[(Long, Double)].collect().toMap
      val exp = feats.select("docid", "f3").as[(Long, Double)].collect().toMap
      assert(got == exp)
    }
  }
}
