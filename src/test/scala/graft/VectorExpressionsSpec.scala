package graft

import graft.ops.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The codegen'd [[graft.ops.DotProduct]] must be a drop-in for the HOF
  * fold it replaced: `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)` —
  * bit-identical sums (same left-to-right order), null on length
  * mismatch / null elements, per-element float widening. */
class VectorExpressionsSpec extends AnyFunSpec {

  // deterministic generator drive (same pattern as PostingCodecSpec)
  private def forAll[A](gen: Gen[A], cases: Int = 30)(check: A => Unit): Unit =
    (0 until cases).foreach { i =>
      check(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error("gen failed")))
    }

  private lazy val spark = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  it("matches the HOF fold bit-for-bit on random float vectors") {
    import spark.implicits._
    val gen = Gen.zip(Gen.listOfN(64, Gen.chooseNum(-1e3f, 1e3f)),
      Gen.listOfN(64, Gen.chooseNum(-1e3f, 1e3f)))
    forAll(gen) { case (xs, ys) =>
      val df = Seq((xs.toArray, ys.toArray)).toDF("a", "b")
      val row = df.select(
        VectorExpressions.dot(col("a"), col("b")),
        hofDot(col("a"), col("b"))).collect()(0)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  it("matches the HOF fold on double vectors and mixed float/double") {
    import spark.implicits._
    val df = Seq((Array(1.5, -2.25, 3.125), Array(0.5f, 4.0f, -1.75f)))
      .toDF("a", "b")
    val r = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("e"),
      hofDot(col("a"), col("b")).as("h")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
  }

  it("returns null on length mismatch and on null elements, like the HOF") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val r = df.select(VectorExpressions.dot(col("a"), col("b")).as("e"),
      hofDot(col("a"), col("b")).as("h")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))

    val withNullElem = spark.sql(
      "SELECT array(1.0D, NULL, 3.0D) AS a, array(1.0D, 2.0D, 3.0D) AS b")
    val r2 = withNullElem.select(
      VectorExpressions.dot(col("a"), col("b")).as("e"),
      hofDot(col("a"), col("b")).as("h")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  it("rejects non-numeric-array inputs at analysis time") {
    import spark.implicits._
    val df = Seq((Array("x"), Array(1.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dot(col("a"), col("b"))).collect()
    }
  }
}
