package graft

import graft.ops.ArrayExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import scala.util.Random

/** [[graft.ops.SortedIntersectCount]] must be indistinguishable from
  * `size(array_intersect(a, b))` on its producer contract (sorted
  * ascending, duplicate-free `array<bigint>`), and must stay inside
  * whole-stage codegen — it replaces the per-pair hash-set build in the
  * near-dup verify hot path (one call per LSH candidate pair). */
class ArrayExprSpec extends AnyFunSpec {

  private def randSortedSet(rng: Random): Seq[Long] = {
    val n = rng.nextInt(40)
    Seq.fill(n)(rng.nextLong(1L << 60)).distinct.sorted
  }

  describe("SortedIntersectCount vs array_intersect (property, seed=11)") {
    lazy val spark = TestSpark.spark

    it("matches size(array_intersect) on 2000 random sorted sets") {
      import spark.implicits._
      val rng = new Random(11)
      val rows = (1 to 2000).map { id =>
        // overlap by construction: draw both sides from a shared pool
        val pool = randSortedSet(rng)
        val a = (pool.filter(_ => rng.nextBoolean()) ++ randSortedSet(rng))
          .distinct.sorted
        val b = (pool.filter(_ => rng.nextBoolean()) ++ randSortedSet(rng))
          .distinct.sorted
        (id, a, b)
      }
      val df = rows.toDF("id", "a", "b")
      val bad = df.select(
        ArrayExpressions.sortedIntersectCount($"a", $"b").as("merge"),
        size(array_intersect($"a", $"b")).cast("long").as("hof"))
        .filter($"merge" =!= $"hof")
      assert(bad.count() == 0)
    }

    it("handles empty and null inputs like the HOF form") {
      import spark.implicits._
      val df = Seq(
        (1L, Some(Seq(1L, 2L)), Some(Seq.empty[Long])),
        (2L, Some(Seq.empty[Long]), Some(Seq.empty[Long])),
        (3L, None, Some(Seq(1L)))).toDF("id", "a", "b")
      val got = df.select($"id",
        ArrayExpressions.sortedIntersectCount($"a", $"b").as("c"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> -1L))
    }

    it("stays inside whole-stage codegen") {
      import spark.implicits._
      val tmp = java.nio.file.Files
        .createTempDirectory("sic").toString + "/sets"
      Seq((Seq(1L, 5L, 9L), Seq(5L, 9L, 12L)))
        .toDF("a", "b").write.mode("overwrite").parquet(tmp)
      val exprOnly = spark.read.parquet(tmp).select(
        ArrayExpressions.sortedIntersectCount($"a", $"b").as("c"))
      val plan = exprOnly.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), plan)
      assert(plan.linesIterator.exists(l =>
        l.contains("*(") && l.toLowerCase.contains("sortedintersectcount")), plan)
      assert(exprOnly.collect().map(_.getLong(0)).toSeq == Seq(2L))
    }
  }
}
