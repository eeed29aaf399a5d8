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

  describe("Krovetz stemmer (full KStem — golden values from Lucene " +
           "4.3.0's KStemFilter, the reference's exact analyzer stage; " +
           "the port is differentially validated bit-identical on 1.67M " +
           "probes: every dictionary word, ~45 generated suffix variants " +
           "each, random strings, and exhaustive short-alphabet combos)") {
    import graft.analysis.KrovetzStemmer.stem
    it("converts plurals to singular with dictionary validation") {
      assert(stem("policies") == "policy")
      assert(stem("factories") == "factory")
      assert(stem("calories") == "calorie") // -ie word wins over -y rule
      assert(stem("queries") == "query")
      assert(stem("crosses") == "cross")
      assert(stem("gases") == "gas")
      assert(stem("engines") == "engine")
      assert(stem("cities") == "city")
      assert(stem("studies") == "study")
      assert(stem("applies") == "apply")
      assert(stem("relies") == "rely")
      assert(stem("echoes") == "echo")
      assert(stem("heroes") == "hero")
      assert(stem("class") == "class")      // -ss never stripped
      assert(stem("corpus") == "corpus")    // -us never stripped
    }
    it("handles past tense with undoubling and e-restoration") {
      assert(stem("hopped") == "hop")
      assert(stem("used") == "use")
      assert(stem("agreed") == "agree")
      assert(stem("tried") == "try")
      assert(stem("suited") == "suit")
      assert(stem("jumped") == "jump")
      assert(stem("walked") == "walk")
      assert(stem("developed") == "develop")
      assert(stem("carried") == "carry")
      assert(stem("copied") == "copy")
      assert(stem("spied") == "spy")
      assert(stem("relied") == "rely")
      assert(stem("fled") == "flee")        // direct conflation
      assert(stem("dyed") == "dyed")        // dictionary headword
      assert(stem("hundred") == "hundred")  // dictionary headword
      assert(stem("unused") == "unused")    // un- prefix quirk keeps "ed"
    }
    it("handles the present participle with the same recoding") {
      assert(stem("hopping") == "hop")
      assert(stem("hoping") == "hope")
      assert(stem("using") == "use")
      assert(stem("jumping") == "jump")
      assert(stem("fighting") == "fight")
      assert(stem("skiing") == "ski")
      assert(stem("dying") == "die")        // direct conflation
      assert(stem("aging") == "age")        // direct conflation
      assert(stem("canoeing") == "canoe")
      assert(stem("agreeing") == "agree")
      assert(stem("sing") == "sing")        // too short to be an inflection
    }
    it("keeps dictionary headwords unchanged — the KStem vocabulary " +
       "quirks a rule-based stemmer would miss") {
      // inflected-LOOKING forms that ARE headwords in the public KStem
      // dictionary and therefore pass through verbatim
      for (w <- Seq("running", "walking", "flying", "seeing", "flies",
                    "applied", "educated", "fitted", "meeting", "string",
                    "indices", "feet", "children", "women", "mice",
                    "geese", "bases", "writer", "runner", "carrier",
                    "happiness", "education", "generation", "activity",
                    "ability", "management", "development", "beer"))
        assert(stem(w) == w, w)
      assert(stem("meetings") == "meeting") // plural of a headword
      assert(stem("matrices") == "matrice") // kstem's -es default, verbatim
    }
    it("applies derivational endings with kstem's exact defaults") {
      assert(stem("quickly") == "quick")
      assert(stem("hacker") == "hack")
      assert(stem("freer") == "free")       // buffer re-exposure path
      assert(stem("modernization") == "modernize")
      assert(stem("american") == "america") // country-nationality table
      assert(stem("french") == "france")
      assert(stem("nazism") == "nazi")      // direct conflation
      assert(stem("graftified") == "graftify") // unvalidated -ied default
      assert(stem("blorbing") == "blorb")   // consonant-cluster default
      assert(stem("xs") == "xs")            // too short
    }
  }

  describe("KStem golden sample (8k word→stem pairs recorded from " +
           "Lucene 4.3.0 KStemFilter output)") {
    it("matches every golden pair") {
      val in = getClass.getResourceAsStream(
        "/graft/analysis/kstem-golden-sample.tsv")
      assert(in != null, "golden sample resource missing")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try {
        var n = 0
        for (line <- src.getLines()
             if line.nonEmpty && !line.startsWith("#")) {
          val Array(w, s) = line.split('\t')
          assert(graft.analysis.KrovetzStemmer.stem(w) == s, w)
          n += 1
        }
        assert(n > 7000)
      } finally src.close()
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
