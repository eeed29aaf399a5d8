package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Edge-case unit coverage for the training-data-pipeline operators —
  * the oracle gate checks them end-to-end on real data; these pin the
  * corner semantics (empty/short docs, identical docs, candidate-pruned
  * verification). */
class OpsSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  describe("shingles") {
    it("doc shorter than n gives an empty shingle set (no negative sequence)") {
      import spark.implicits._
      val df = docsDf(1L -> "one two", 2L -> "")
        .select(col("doc_id"), Dedup.shinglesCol(col("text"), 3).as("sh"))
      val m = df.as[(Long, Seq[String])].collect().toMap
      assert(m(1L).isEmpty && m(2L).isEmpty)
    }

    it("duplicate shingles are deduplicated") {
      import spark.implicits._
      val df = docsDf(1L -> "a b a b a b")
        .select(Dedup.shinglesCol(col("text"), 2).as("sh"))
      assert(df.as[Seq[String]].head().sorted == Seq("a b", "b a"))
    }
  }

  describe("exact dedup") {
    it("identical texts share the smallest id as canonical") {
      import spark.implicits._
      val df = Dedup.exactCanonical(
        docsDf(5L -> "same text", 2L -> "same text", 9L -> "other"),
        "doc_id", "text")
      val m = df.select("id", "canonical_id").as[(Long, Long)].collect().toMap
      assert(m(5L) == 2L && m(2L) == 2L && m(9L) == 9L)
    }
  }

  describe("minhash + LSH + verify") {
    it("identical docs collide on every band and verify at jaccard 1.0") {
      import spark.implicits._
      val docs = docsDf(
        1L -> "the quick brown fox jumps over the lazy dog again and again",
        2L -> "the quick brown fox jumps over the lazy dog again and again",
        3L -> "completely different content with nothing shared at all here")
      val sig = Dedup.minhashSignature(docs, "doc_id", "text", 3)
      val cands = Dedup.lshCandidates(sig)
      val pairs = cands.as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)))
      val verified = Dedup.jaccardVerify(docs, "doc_id", "text", cands, 3, 0.9)
        .select("a_id", "b_id", "jaccard")
        .as[(Long, Long, Double)].collect()
      assert(verified.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    }

    it("verify only returns pairs present in the candidate set") {
      import spark.implicits._
      val docs = docsDf(
        1L -> "shared words here shared words here shared words",
        2L -> "shared words here shared words here shared words",
        3L -> "shared words here shared words here shared words")
      // candidate set deliberately excludes (2,3)
      val cands = Seq((1L, 2L)).toDF("a_id", "b_id")
      val got = Dedup.jaccardVerify(docs, "doc_id", "text", cands, 3, 0.0)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)))
    }

    // the two subtree-double-evaluation lessons, pinned at the plan level:
    // the melt guarantees ONE corpus scan regardless of how many plan
    // references the pair sides make, and a PERSISTED candidate frame is
    // read from cache instead of re-running its band self-join lineage
    it("verify scans the corpus once and reads persisted candidates from cache") {
      val dir = java.nio.file.Files.createTempDirectory("jacc-docs-").toString
      docsDf(
        1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        3L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        4L -> "totally unrelated content that shares no shingles at all ok")
        .write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      val cands = Dedup.lshCandidates(
        Dedup.minhashSignature(docs, "doc_id", "text", 3)).cache()
      assert(cands.count() > 0)
      // AQE wraps the plan in an AdaptiveSparkPlanExec whose stages are
      // not reachable by TreeNode.collect, and the cached InMemoryRelation
      // PRINTS its full band-self-join lineage (so toString counts
      // overcount) — disable AQE for the assertion and collect nodes
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val verified = Dedup.jaccardVerify(docs, "doc_id", "text", cands, 3, 0.5)
        val plan = verified.queryExecution.executedPlan
        val fileScans = plan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.size
        val memScans = plan.collect {
          case m if m.nodeName.contains("InMemoryTableScan") => m }.size
        assert(fileScans == 1, s"expected exactly 1 corpus scan:\n${plan.toString.take(3000)}")
        assert(memScans >= 1,
          s"candidates should come from cache:\n${plan.toString.take(3000)}")
        assert(verified.count() > 0)
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        cands.unpersist(blocking = false)
      }
    }
  }

  describe("simhash") {
    it("is deterministic and identical for identical docs") {
      import spark.implicits._
      val docs = docsDf(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
        3L -> "delta epsilon zeta")
      val m = Dedup.simhash(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(m(1L) == m(2L))
      assert(m(1L) != m(3L))
    }
  }

  describe("text ops") {
    it("empty text yields zero token stats and 'und' language") {
      import spark.implicits._
      val df = docsDf(1L -> "")
      val (n, dis) = TextOps.tokenStats(col("text"))
      val r = df.select(n, dis, TextOps.langIdCol(col("text")))
        .as[(Long, Long, String)].head()
      assert(r == ((0L, 0L, "und")))
    }
  }
}
