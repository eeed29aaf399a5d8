package graft

import graft.ops.{MediaItem, Multimodal}
import org.scalatest.funspec.AnyFunSpec

/** Real-image decode pipeline: the JDK encoder/decoder round-trips the
  * deterministic pixel formula exactly (PNG is lossless), and the
  * distributed extractFeatures equals the local decode. */
class MultimodalSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  describe("synthetic PNG generation + javax.imageio decode") {
    it("round-trips the pixel formula: decoded means equal formula means") {
      for (id <- Seq(0L, 1L, 7L, 123L, 99999L)) {
        val f = Multimodal.decode(MediaItem(id, Multimodal.syntheticPng(id)))
        val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
        assert(f.width == w && f.height == h)
        assert(f.magic == "89504E47", "PNG signature") // real encoded bytes
        for (c <- 0 until 3) {
          var sum = 0L
          for (y <- 0 until h; x <- 0 until w)
            sum += Multimodal.pixel(id, x, y, c)
          assert(f.feature(c) == sum.toFloat / (w * h).toFloat,
            s"id=$id channel=$c")
        }
      }
    }

    it("rejects undecodable bytes loudly") {
      val e = intercept[IllegalArgumentException] {
        Multimodal.decode(MediaItem(5L, Array[Byte](1, 2, 3, 4)))
      }
      assert(e.getMessage.contains("not a decodable image"))
    }

    it("distributed extractFeatures equals the local decode") {
      import spark.implicits._
      val ids = (0L until 50L).toDF("doc_id")
      val got = Multimodal
        .extractFeatures(spark,
          Multimodal.withSyntheticImages(spark, ids, "doc_id"))
        .collect().map(f => f.doc_id -> f).toMap
      assert(got.size == 50)
      for (id <- 0L until 50L) {
        val expect =
          Multimodal.decode(MediaItem(id, Multimodal.syntheticPng(id)))
        val g = got(id)
        assert(g.width == expect.width && g.height == expect.height &&
               g.n_bytes == expect.n_bytes && g.magic == expect.magic &&
               g.feature.toSeq == expect.feature.toSeq, s"id=$id")
      }
    }
  }
}
