package graft

import graft.exec.Svm2Weight
import org.scalatest.funspec.AnyFunSpec
import java.nio.file.{Files, Paths}

/** Model inspector vs the reference's `svm2weight.pl`
  * (`QryEval/svm2weight.pl`): fixed 11-line header parse, support-vector
  * fold `w[a] += alpha * v`, weights printed for feature ids 1..max.
  */
class Svm2WeightSpec extends AnyFunSpec {

  /** A minimal well-formed svm_rank model: 11 header lines (line 2 =
    * kernel type, line 11 = threshold), then support-vector lines. */
  private def model(svLines: String*): Seq[String] =
    Seq(
      "SVM-light Version V6.20",
      "0 # kernel type",
      "3 # kernel parameter -d",
      "1 # kernel parameter -g",
      "1 # kernel parameter -s",
      "1 # kernel parameter -r",
      "empty# kernel parameter -u",
      "18 # highest feature index",
      "3 # number of training documents",
      "4 # number of support vectors plus 1",
      "0.5 # threshold b, each following line is a SV (starting with alpha*y)"
    ) ++ svLines

  describe("weights") {
    it("folds alpha*v per feature over the support-vector lines") {
      val w = Svm2Weight.weights(model(
        "2.0 1:0.5 3:1.0 # sv 1",
        "-1.0 1:0.25 2:4.0 # sv 2"))
      // w1 = 2*0.5 - 1*0.25 = 0.75; w2 = -4.0; w3 = 2.0
      assert(w.toSeq == Seq(0.75, -4.0, 2.0))
    }

    it("leaves untouched ids inside the range at zero") {
      val w = Svm2Weight.weights(model("1.5 4:2.0 #"))
      assert(w.toSeq == Seq(0.0, 0.0, 0.0, 3.0))
    }

    it("rejects a non-linear kernel, like the perl") {
      val bad = model("1.0 1:1.0 #").updated(1, "2 # kernel type")
      val e = intercept[IllegalArgumentException](Svm2Weight.weights(bad))
      assert(e.getMessage.contains("Not linear Kernel!"))
    }

    it("rejects a header without the threshold line, like the perl") {
      val bad = model("1.0 1:1.0 #").updated(10, "0.5 # something else")
      val e = intercept[IllegalArgumentException](Svm2Weight.weights(bad))
      assert(e.getMessage.contains("Parsing error!"))
    }

    it("rejects a file too short to hold the header") {
      intercept[IllegalArgumentException](
        Svm2Weight.weights(Seq("SVM-light", "0")))
    }

    it("skips comment-only SV lines, including a bare '#' (perl splits " +
       "'#' to undef and skips; split(\"#\")(0) would crash)") {
      val w = Svm2Weight.weights(model(
        "#", "###", "# a comment", "   # indented", "1.0 2:1.5 #"))
      assert(w.toSeq == Seq(0.0, 1.5))
    }
  }

  /** Parse `i:v` lines from either implementation; perl prints an
    * undef slot as `i:` (empty) — read that as 0.0. */
  private def parse(lines: Seq[String]): Seq[(Int, Double)] =
    lines.filter(_.nonEmpty).map { l =>
      val Array(i, v) = l.split(":", 2)
      (i.toInt, if (v.isEmpty) 0.0 else v.toDouble)
    }

  describe("parity with the reference perl script") {
    val perlScript = Paths.get("/root/reference/QryEval/svm2weight.pl")

    def perlWeights(modelPath: String): Seq[(Int, Double)] = {
      val out = new java.io.ByteArrayOutputStream()
      val p = new ProcessBuilder("perl", perlScript.toString, modelPath)
        .redirectErrorStream(true).start()
      p.getInputStream.transferTo(out)
      assert(p.waitFor() == 0, out.toString)
      parse(out.toString.linesIterator.toSeq)
    }

    it("same ids and values on a hand-built model") {
      assume(Files.exists(perlScript), "reference perl script not present")
      val lines = model(
        "0.125 1:1.0 5:-2.5 18:0.75 # sv",
        "-0.5 2:3.0 5:1.0 #",
        "1.0 7:0.001 #")
      val f = Files.createTempFile("svm2w-", ".model")
      Files.writeString(f, lines.mkString("\n") + "\n")
      val ours = Svm2Weight.weights(lines).zipWithIndex
        .map { case (v, i) => (i + 1, v) }.toSeq
      assert(ours == perlWeights(f.toString))
    }

    it("same ids and values on a real svm_rank_learn model") {
      val learn = Paths.get(
        "/root/reference/QryEval/svm_rank_linux64/svm_rank_learn")
      assume(Files.exists(perlScript) && Files.isExecutable(learn),
        "reference perl script / svm_rank binary not present")
      val dir = Files.createTempDirectory("svm2w-real-")
      val fv = dir.resolve("train.fv")
      // two tiny queries, deterministic features
      Files.writeString(fv, (1 to 12).map { i =>
        val qid = 1 + (i - 1) / 6
        val rel = if (i % 3 == 0) 1 else 0
        s"$rel qid:$qid 1:${i * 0.1} 2:${(13 - i) * 0.05} 4:${i % 4} # d$i"
      }.mkString("\n") + "\n")
      val modelPath = dir.resolve("model.txt")
      val p = new ProcessBuilder(learn.toString, "-c", "0.01",
        fv.toString, modelPath.toString)
        .redirectErrorStream(true).start()
      p.getInputStream.transferTo(java.io.OutputStream.nullOutputStream())
      assert(p.waitFor() == 0)
      val lines = Files.readAllLines(modelPath)
      import scala.jdk.CollectionConverters._
      val ours = Svm2Weight.weights(lines.asScala.toSeq).zipWithIndex
        .map { case (v, i) => (i + 1, v) }.toSeq
      val ref = perlWeights(modelPath.toString)
      assert(ours.map(_._1) == ref.map(_._1))
      ours.zip(ref).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b)),
          s"$a vs $b")
      }
    }
  }
}
