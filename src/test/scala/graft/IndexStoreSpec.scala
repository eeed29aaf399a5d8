package graft

import graft.corpus.CorpusGen
import graft.index._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** SURVEY §5.5 resume tests + §5.3 salt-invariance property: a killed
  * build resumes from per-table checkpoints to the identical index, and
  * the salted (bucketed) build produces the same logical index at any
  * bucket count. */
class IndexStoreSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  private def freshDir(): Path = {
    val d = Files.createTempDirectory("graft-index-")
    d.toFile.deleteOnExit(); d
  }

  private def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  /** extid-keyed logical postings — docid-layout-independent view. */
  private def logicalPostings(idx: Index): Set[(String, String, String, Int, Seq[Int])] = {
    import spark.implicits._
    idx.postings
      .join(idx.docs.select($"docid", $"extid"), "docid")
      .select($"term", $"field", $"extid", $"tf", $"positions")
      .as[(String, String, String, Int, Seq[Int])].collect().toSet
  }

  private def collectSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  describe("IndexStore snapshot + resume (north rule: per-partition checkpoints)") {
    lazy val idx = IndexBuilder.build(spark, CorpusGen.df(spark, 100),
      IndexConfig(buckets = 4))

    it("save → load round-trips every table and the stats") {
      val dir = freshDir().toString
      IndexStore.save(idx, dir)
      assert(IndexStore.exists(dir))
      val loaded = IndexStore.load(spark, dir)
      assert(loaded.stats == idx.stats)
      assert(logicalPostings(loaded) == logicalPostings(idx))
      assert(collectSet(loaded.docs) == collectSet(idx.docs))
      assert(collectSet(loaded.doclen) == collectSet(idx.doclen))
      assert(collectSet(loaded.termStats) == collectSet(idx.termStats))
      // compressed serving form round-trips to the same logical postings
      val viaBlocks = PostingBlocks.toPostings(spark, loaded.blocks)
      assert(collectSet(viaBlocks.select("term", "field", "docid", "tf", "positions"))
        == collectSet(idx.postings.select("term", "field", "docid", "tf", "positions")))
      // persisted forward index equals the derived one
      assert(collectSet(loaded.fwdIndex) == collectSet(idx.fwdIndex))
      rmTree(Paths.get(dir))
    }

    it("records the analyzer identity and refuses a mismatched query config") {
      import graft.analysis.{AnalyzerConfig, Stemming}
      val dir = freshDir().toString
      val eidx = IndexBuilder.build(spark, CorpusGen.df(spark, 30),
        IndexConfig(analyzer = AnalyzerConfig.english, buckets = 2))
      IndexStore.save(eidx, dir)
      val loaded = IndexStore.load(spark, dir)
      assert(loaded.analyzerOpt.contains(AnalyzerConfig.english))
      // matching config constructs fine
      new graft.api.SearchEngine(loaded, AnalyzerConfig.english)
      // differently-stemmed config fails loudly instead of silently
      // matching nothing (round-4 ADVICE)
      val e1 = intercept[IllegalArgumentException] {
        new graft.api.SearchEngine(loaded, AnalyzerConfig.code)
      }
      assert(e1.getMessage.contains("analyzer mismatch"))
      // a legacy snapshot (no analyzer field) refuses the KStem profile
      val statsPath = Paths.get(dir, "stats.json")
      val legacy = Files.readString(statsPath)
        .replaceAll(""","analyzer":\{[^}]*\}""", "")
      Files.writeString(statsPath, legacy)
      val legacyIdx = IndexStore.load(spark, dir)
      assert(legacyIdx.analyzerOpt.isEmpty)
      val e2 = intercept[IllegalArgumentException] {
        new graft.api.SearchEngine(legacyIdx, AnalyzerConfig.english)
      }
      assert(e2.getMessage.contains("predates analyzer recording"))
      // ...but still serves the safe profiles
      new graft.api.SearchEngine(legacyIdx, AnalyzerConfig.code)
      new graft.api.SearchEngine(legacyIdx, AnalyzerConfig.englishLight)
      rmTree(Paths.get(dir))
    }

    it("fwdVectors over a snapshot is a partition-pruned point read " +
       "with the same rows as the derived forward index") {
      import spark.implicits._
      val dir = freshDir().toString
      IndexStore.save(idx, dir)
      val loaded = IndexStore.load(spark, dir)
      val ids = idx.docs.select($"docid").as[Long].collect().sorted.take(3).toSeq
      val stored = loaded.fwdVectors(ids)
      // the scan prunes on the derived segment partition dirs
      val plan = stored.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("segment"),
        plan.take(2000))
      assert(collectSet(stored) ==
        collectSet(idx.fwdIndex.filter($"docid".isin(ids: _*))))
      // the in-memory path pushes the docid filter BELOW the aggregate
      // (a join never does — round-3 VERDICT item 2); after optimization
      // the docid attribute is inlined into its defining expression, so
      // match the isin structurally (an In/InSet beneath the Aggregate)
      import org.apache.spark.sql.catalyst.expressions.{In, InSet}
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
      val mem = idx.fwdVectors(ids).queryExecution.optimizedPlan
      val agg = mem.collectFirst { case a: Aggregate => a }.get
      assert(agg.collectFirst {
        case f: Filter if f.condition.find(e =>
          e.isInstanceOf[In] || e.isInstanceOf[InSet]).isDefined => f
      }.isDefined, mem.toString.take(2000))
      rmTree(Paths.get(dir))
    }

    it("a killed build resumes: finished tables are skipped, the index is identical") {
      val dir = freshDir()
      IndexStore.save(idx, dir.toString)
      // simulate a crash AFTER docs/postings landed but BEFORE doclen:
      // wipe the snapshot, doclen's marker and data
      Files.delete(dir.resolve("SNAPSHOT.json"))
      Files.delete(dir.resolve("_done_doclen"))
      rmTree(dir.resolve("doclen"))
      assert(!IndexStore.exists(dir.toString))

      val mtimeBefore = Files.getLastModifiedTime(dir.resolve("postings"))
      IndexStore.save(idx, dir.toString) // resume
      assert(IndexStore.exists(dir.toString))
      // finished tables untouched (checkpoint skip), missing one rebuilt
      assert(Files.getLastModifiedTime(dir.resolve("postings")) == mtimeBefore)
      val loaded = IndexStore.load(spark, dir.toString)
      assert(collectSet(loaded.doclen) == collectSet(idx.doclen))
      assert(loaded.stats == idx.stats)
      rmTree(dir)
    }

    it("a half-finished dir without SNAPSHOT.json refuses to load") {
      val dir = freshDir()
      assertThrows[IllegalArgumentException] {
        IndexStore.load(spark, dir.toString)
      }
      rmTree(dir)
    }

    it("manifest records per-segment lineage + metrics") {
      import spark.implicits._
      val dir = freshDir()
      IndexStore.save(idx, dir.toString)
      val manifest = spark.read.parquet(s"$dir/manifest")
      val segs = manifest.select($"segment".cast("long")).as[Long]
        .collect().toSet
      assert(segs == (0L until 4L).toSet)
      val cols = manifest.columns.toSet
      assert(Set("postingCount", "termCountApprox", "maxDocid",
        "buildMillis", "snapshotId").subsetOf(cols))
      rmTree(dir)
    }
  }

  describe("salted build invariance (north rule: skew handling must not change results)") {
    it("buckets=2 and buckets=16 build the same logical index") {
      val c = CorpusGen.df(spark, 100)
      val a = IndexBuilder.build(spark, c, IndexConfig(buckets = 2))
      val b = IndexBuilder.build(spark, c, IndexConfig(buckets = 16))
      assert(logicalPostings(a) == logicalPostings(b))
      assert(collectSet(a.termStats) == collectSet(b.termStats))
      assert(a.stats == b.stats)
      // sha256 per-row invariant (BASELINE.json input_hint)
      import spark.implicits._
      val shaA = a.docs.select($"extid", $"sha256").as[(String, String)]
        .collect().toSet
      val shaB = b.docs.select($"extid", $"sha256").as[(String, String)]
        .collect().toSet
      assert(shaA == shaB)
      // identical QUERY ANSWERS at both bucket counts (round-3 VERDICT
      // item 4): ranked BM25 top-k agrees on (extid, rank, score)
      def top(i: Index): Seq[(String, Int, Double)] = {
        val e = new graft.api.SearchEngine(i)
        e.search("open inverted index", graft.model.BM25(1.2f, 0.75f, 0f), 20)
          .select($"extid", $"rank", $"score")
          .as[(String, Int, Double)].collect().toSeq
      }
      assert(top(a) == top(b))
    }

    it("AutoBuckets derives a corpus-sized bucket count") {
      val c = CorpusGen.df(spark, 100)
      val auto = IndexBuilder.build(spark, c, IndexConfig())
      // tiny corpus → parallelism floor (4 test cores), never 1-per-doc
      assert(auto.buckets == spark.sparkContext.defaultParallelism)
      assert(logicalPostings(auto) ==
        logicalPostings(IndexBuilder.build(spark, c, IndexConfig(buckets = 2))))
      // the sizing formula holds the per-bucket target at scale
      val big = IndexBuilder.bucketsFor(
        docCount = 1L << 40, contentBytes = 100L << 40, parallelism = 1000)
      assert(big == math.ceil((100L << 40).toDouble /
        IndexConfig.TargetBucketBytes).toInt)
      assert(IndexBuilder.bucketsFor(1L << 50, Long.MaxValue, 1000)
        == IndexConfig.MaxBuckets)
    }
  }
}
