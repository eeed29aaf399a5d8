package graft

import graft.ops.Similarity
import org.scalatest.funspec.AnyFunSpec
import java.nio.file.{Files, Paths}

/** ANN scale path: banded multi-probe SRP recall vs the single-bucket
  * probe, and the bucket-partitioned storage layout (partition-pruned
  * probe scans). */
class AnnSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private lazy val probe =
    Similarity.probeVector(emb, "vec_id", "embedding", 0L)

  it("banded multi-probe recalls at least as much as the single 8-bit bucket") {
    import spark.implicits._
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", probe, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("vec_id").as[Long].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val single = recall(
      Similarity.lshTopK(emb, "vec_id", "embedding", probe, 0L, 10))
    val banded = recall(
      Similarity.lshTopKBanded(emb, "vec_id", "embedding", probe, 0L, 10))
    assert(banded >= single)
    assert(banded > 0.0)
  }

  it("bucketed layout: partition-pruned probe equals band-0 scan results") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ann-bucketed-").toString
    Similarity.writeBucketed(emb, "vec_id", "embedding", dir)
    // 256 possible band keys → bucket=K directories, one file each
    val dirs = Files.list(Paths.get(dir)).filter(p =>
      p.getFileName.toString.startsWith("bucket=")).count()
    assert(dirs > 1 && dirs <= 256)

    val stored = Similarity.lshTopKStored(spark, dir, "vec_id", "embedding",
      probe, 0L, 10)
    // pruning is visible in the plan: the partition filter on bucket
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      plan.take(2000))

    // same answer as filtering band 0 over the raw table
    val expected = {
      val b0 = Similarity.bandKeyCol(org.apache.spark.sql.functions.col("embedding"), 0)
      val pk = spark.range(1).select(
        Similarity.bandKeyCol(org.apache.spark.sql.functions.lit(probe), 0).as("b"))
        .collect()(0).getLong(0)
      Similarity.cosineTopK(
        emb.filter(b0 === pk), "vec_id", "embedding", probe, 0L, 10)
        .select("vec_id").as[Long].collect().toSeq
    }
    assert(stored.select("vec_id").as[Long].collect().toSeq == expected)
  }
}
