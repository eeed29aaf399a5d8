package graft

import graft.analysis.{Analyzer, AnalyzerConfig, Tok}
import org.scalatest.funspec.AnyFunSpec

class AnalyzerSpec extends AnyFunSpec {

  describe("rawTokens") {
    it("lowercases and splits on non-alphanumerics") {
      assert(Analyzer.rawTokens("Foo_bar  Baz-42; qux.v2").toSeq ==
        Seq("foo", "bar", "baz", "42", "qux", "v2"))
    }
    it("handles empty / null / delimiter-only input") {
      assert(Analyzer.rawTokens("").isEmpty)
      assert(Analyzer.rawTokens(null).isEmpty)
      assert(Analyzer.rawTokens(" .,;! ").isEmpty)
    }
  }

  describe("tokenize") {
    it("keeps raw positions as gaps across removed stopwords") {
      val cfg = AnalyzerConfig(stopwords = Set("the", "of"))
      val toks = Analyzer.tokenize("the house of the rising sun", cfg)
      assert(toks.toSeq ==
        Seq(Tok("house", 1), Tok("rising", 4), Tok("sun", 5)))
    }
    it("code profile keeps everything with dense positions") {
      val toks = Analyzer.tokenize("if (x) return y;", AnalyzerConfig.code)
      assert(toks.toSeq ==
        Seq(Tok("if", 0), Tok("x", 1), Tok("return", 2), Tok("y", 3)))
    }
  }

  describe("s-stemmer") {
    it("applies the Harman rules") {
      assert(Analyzer.sStem("queries") == "query")
      assert(Analyzer.sStem("engines") == "engine")
      assert(Analyzer.sStem("cats") == "cat")
      assert(Analyzer.sStem("class") == "class")   // -ss kept
      assert(Analyzer.sStem("corpus") == "corpus") // -us kept
      assert(Analyzer.sStem("goes") == "goes")     // -oes kept
    }
  }

  describe("analyzeQueryToken") {
    it("drops stopwords and keeps first token of multi-token input") {
      val cfg = AnalyzerConfig(stopwords = Set("the"))
      assert(Analyzer.analyzeQueryToken("the", cfg).isEmpty)
      assert(Analyzer.analyzeQueryToken("multi-part", cfg).contains("multi"))
    }
  }
}
