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

  describe("Krovetz stemmer (KStem parity for the english profile)") {
    import graft.analysis.KrovetzStemmer.stem
    it("converts plurals to singular with dictionary validation") {
      assert(stem("policies") == "policy")
      assert(stem("factories") == "factory")
      assert(stem("calories") == "calorie") // -ie word wins over -y rule
      assert(stem("queries") == "query")
      assert(stem("crosses") == "cross")
      assert(stem("gases") == "gas")
      assert(stem("bases") == "base")
      assert(stem("engines") == "engine")
      assert(stem("class") == "class")      // -ss never stripped
      assert(stem("corpus") == "corpus")    // -us never stripped
    }
    it("handles past tense with undoubling and e-restoration") {
      assert(stem("hopped") == "hop")
      assert(stem("fitted") == "fit")
      assert(stem("used") == "use")
      assert(stem("agreed") == "agree")
      assert(stem("tried") == "try")
      assert(stem("suited") == "suit")
      assert(stem("hundred") == "hundred")  // no validated stem → unchanged
    }
    it("handles the present participle with the same recoding") {
      assert(stem("hopping") == "hop")
      assert(stem("hoping") == "hope")
      assert(stem("using") == "use")
      assert(stem("running") == "run")
      assert(stem("sing") == "sing")        // too short to be an inflection
      assert(stem("string") == "string")    // lexicon headword untouched
      assert(stem("meeting") == "meeting")  // lexical nouns pass through
      assert(stem("meetings") == "meeting")
    }
    it("conflates irregular forms directly") {
      assert(stem("matrices") == "matrix")
      assert(stem("indices") == "index")
      assert(stem("feet") == "foot")
      assert(stem("children") == "child")
    }
    it("leaves out-of-lexicon candidates unchanged (precision-first)") {
      assert(stem("graftified") == "graftified")
      assert(stem("blorbing") == "blorbing")
      assert(stem("xs") == "xs") // too short
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
