package graft

import graft.analysis.AnalyzerConfig
import graft.model._
import org.scalatest.funspec.AnyFunSpec

class QueryParserSpec extends AnyFunSpec {
  private val cfg = AnalyzerConfig.code
  private val en = AnalyzerConfig(stopwords = AnalyzerConfig.luceneEnglishStopwords)

  describe("addDefaultOp (QryEval.java:345-380)") {
    it("wraps free text with the model default") {
      assert(QueryParser.addDefaultOp("obama family tree", RankedBoolean) ==
        "#OR(obama family tree)")
      assert(QueryParser.addDefaultOp("obama family tree", BM25()) ==
        "#SUM(obama family tree)")
      assert(QueryParser.addDefaultOp("obama family tree", Indri()) ==
        "#AND(obama family tree)")
    }
    it("wraps leading #NEAR/#SYN/#WINDOW (case-insensitive)") {
      assert(QueryParser.addDefaultOp("#NEAR/4(a b)", Indri()) ==
        "#AND(#NEAR/4(a b))")
      assert(QueryParser.addDefaultOp("#Window/8(a b)", BM25()) ==
        "#SUM(#Window/8(a b))")
    }
    it("keeps a single top-level operator unwrapped") {
      assert(QueryParser.addDefaultOp("#AND(a b)", Indri()) == "#AND(a b)")
    }
    it("wraps multiple top-level operators") {
      assert(QueryParser.addDefaultOp("#AND(a) #AND(b)", Indri()) ==
        "#AND(#AND(a) #AND(b))")
    }
  }

  describe("parse (QryEval.java:391-492)") {
    it("parses nested structured queries") {
      val q = QueryParser.parse(
        "#WAND( 0.7 #AND( obama family ) 0.3 #NEAR/1( family tree ) )", cfg)
      assert(q.contains(WAnd(Seq(0.7f, 0.3f), Seq(
        And(Seq(Score(Term("obama")), Score(Term("family")))),
        Score(Near(1, Seq(Term("family"), Term("tree"))))))))
    }
    it("parses field suffixes and the multi-dot quirk") {
      assert(QueryParser.parse("#AND(games.keywords)", cfg)
        .contains(And(Seq(Score(Term("games", "keywords"))))))
      // "a.b.title" → term=a, field=b (QryEval.java:468-470)
      assert(QueryParser.parse("#AND(a.b.title)", cfg)
        .contains(And(Seq(Score(Term("a", "b"))))))
    }
    it("removes the weight of a vanished (stopword) term") {
      val q = QueryParser.parse("#WAND(0.4 the 0.6 def)", en)
      assert(q.contains(WAnd(Seq(0.6f), Seq(Score(Term("def"))))))
    }
    it("drops operators that end up empty") {
      val q = QueryParser.parse("#OR(#AND(the) def)", en)
      assert(q.contains(Or(Seq(Score(Term("def"))))))
    }
    it("keeps only the first analyzed token of a multi-token term") {
      assert(QueryParser.parse("#AND(ps-2)", cfg)
        .contains(And(Seq(Score(Term("ps"))))))
    }
    it("parses #NEAR/#WINDOW distances case-insensitively") {
      assert(QueryParser.parse("#Near/4(lower rate)", cfg)
        .contains(Near(4, Seq(Term("lower"), Term("rate")))))
      assert(QueryParser.parse("#wInDoW/8(a1 b2)", cfg)
        .contains(Window(8, Seq(Term("a1"), Term("b2")))))
    }
  }
}
