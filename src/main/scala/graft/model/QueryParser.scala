package graft.model

import graft.analysis.{Analyzer, AnalyzerConfig}
import scala.collection.mutable.ArrayBuffer

/** Transliteration of the reference's driver-side query parsing:
  * default-operator wrapping (`QryEval/src/QryEval.java:345-380`) and the
  * explicit-stack structured-query parser (`QryEval.java:391-492`),
  * including its quirks (weight/arg alternation via the `isWeight` flag,
  * empty operators dropped, multi-dot field split, only `tokenized[0]`
  * of a multi-token term kept, vanished-term weight removal).
  *
  * Pure driver-side Scala — queries are tiny; the heavy lifting happens in
  * the Spark plan this AST is lowered to.
  */
object QueryParser {

  private val Fields = Set("body", "url", "keywords", "title", "inlink")

  /** Wrap with the model's default operator when needed
    * (`QryEval.java:345-380`). */
  def addDefaultOp(qString0: String, model: RetrievalModel): String = {
    val qString = qString0.trim
    val defaultOp = model match {
      case UnrankedBoolean | RankedBoolean => "#OR("
      case BM25(_, _, _)                   => "#SUM("
      case Indri(_, _)                     => "#AND("
    }
    val lower = qString.toLowerCase
    if (lower.startsWith("#near") || lower.startsWith("#syn") ||
        lower.startsWith("#window") || !qString.startsWith("#")) {
      defaultOp + qString + ")"
    } else {
      // Multiple top-level operators → wrap (paren-balance scan,
      // QryEval.java:362-376).
      var count = 0
      var hasMet = false
      var i = 0
      var wrapped = qString
      var done = false
      while (i < qString.length && !done) {
        val c = qString.charAt(i)
        if (c == '(') { count += 1; hasMet = true }
        else if (c == ')') count -= 1
        if (hasMet && count == 0 && i != qString.length - 1) {
          wrapped = defaultOp + qString + ")"
          done = true
        }
        i += 1
      }
      wrapped
    }
  }

  /** Mutable operator-under-construction (stack cell). */
  private final class B(val kind: String, val dist: Int) {
    val args = ArrayBuffer.empty[Qry]
    val weights = ArrayBuffer.empty[Float]
    def build(): Qry = {
      def ils: Seq[Il] = args.toSeq.map {
        case il: Il => il
        case other =>
          throw new IllegalArgumentException(
            s"Invalid argument in #$kind: $other") // QryopIlNear.java:140-141
      }
      def sls: Seq[Sl] = args.toSeq.map(Qry.asSl)
      kind match {
        case "and"    => And(sls)
        case "or"     => Or(sls)
        case "sum"    => Sum(sls)
        case "wand"   => WAnd(weights.toSeq, sls)
        case "wsum"   => WSum(weights.toSeq, sls)
        case "syn"    => Syn(ils)
        case "near"   => Near(dist, ils)
        case "window" => Window(dist, ils)
      }
    }
  }

  private val NearRe = "(?i)#near/(\\d+)".r
  private val WindowRe = "(?i)#window/(\\d+)".r
  private val FieldRe = "(?i).+(\\.)(body|url|keywords|title|inlink)".r

  /** Stack parser (`QryEval.java:391-492`). Returns None on the
    * reference's "Query syntax is incorrect" condition (leftover tokens).
    */
  def parse(qString: String, cfg: AnalyzerConfig): Option[Qry] = {
    // StringTokenizer(qString, "\t\n\r ,()", true): every delimiter is its
    // own single-char token.
    val toks = ArrayBuffer.empty[String]
    val delims = "\t\n\r ,()"
    var cur = new StringBuilder
    qString.foreach { c =>
      if (delims.indexOf(c.toInt) >= 0) {
        if (cur.nonEmpty) { toks += cur.toString; cur = new StringBuilder }
        toks += c.toString
      } else cur += c
    }
    if (cur.nonEmpty) toks += cur.toString

    val stack = scala.collection.mutable.Stack.empty[B]
    var currentOp: B = null
    var isWeight = true
    var i = 0
    var brokeAtRoot = false

    while (i < toks.length && !brokeAtRoot) {
      val token = toks(i)
      var resetWeight = true // QryEval.java:480 — skipped by `continue`s

      if (token.length == 1 && " ,(\t\n\r".indexOf(token.charAt(0)) >= 0) {
        resetWeight = false // delimiter `continue` (QryEval.java:408-409)
      } else if (token.equalsIgnoreCase("#and")) {
        currentOp = new B("and", 0); stack.push(currentOp)
      } else if (token.equalsIgnoreCase("#wand")) {
        currentOp = new B("wand", 0); stack.push(currentOp)
      } else if (token.equalsIgnoreCase("#wsum")) {
        currentOp = new B("wsum", 0); stack.push(currentOp)
      } else if (token.equalsIgnoreCase("#syn")) {
        currentOp = new B("syn", 0); stack.push(currentOp)
      } else if (token.equalsIgnoreCase("#or")) {
        currentOp = new B("or", 0); stack.push(currentOp)
      } else if (token.equalsIgnoreCase("#sum")) {
        currentOp = new B("sum", 0); stack.push(currentOp)
      } else if (NearRe.matches(token)) {
        currentOp = new B("near", token.split("/")(1).toInt)
        stack.push(currentOp)
      } else if (WindowRe.matches(token)) {
        currentOp = new B("window", token.split("/")(1).toInt)
        stack.push(currentOp)
      } else if (token.startsWith(")")) {
        // Finish current operator (QryEval.java:436-453).
        val popped = stack.pop()
        if (stack.isEmpty) {
          currentOp = popped
          brokeAtRoot = true
        } else {
          currentOp = stack.top
          if (popped.args.nonEmpty) currentOp.args += popped.build()
        }
      } else {
        // Weight slot of #WAND/#WSUM (QryEval.java:458-464).
        if (currentOp != null &&
            (currentOp.kind == "wand" || currentOp.kind == "wsum") &&
            isWeight) {
          currentOp.weights += token.trim.toFloat
          isWeight = false
          resetWeight = false // `continue` at QryEval.java:463
        } else {
          var term = token
          var field = "body"
          if (FieldRe.matches(token)) {
            // Multi-dot quirk: token=parts(0), field=parts(1)
            // (QryEval.java:468-470).
            val split = token.split("\\.")
            term = split(0)
            field = split(1)
          }
          Analyzer.analyzeQueryToken(term, cfg) match {
            case Some(t) =>
              if (currentOp != null) currentOp.args += Term(t, field)
            case None =>
              // Vanished (stopword) term following a weight → drop the
              // weight (QryEval.java:475-478).
              if (!isWeight && currentOp != null &&
                  (currentOp.kind == "wand" || currentOp.kind == "wsum") &&
                  currentOp.weights.nonEmpty)
                currentOp.weights.remove(currentOp.weights.length - 1)
          }
        }
      }
      if (resetWeight) isWeight = true
      i += 1
    }

    // Leftover tokens after the root closed → syntax error
    // (QryEval.java:486-489). Trailing whitespace delimiters don't count
    // in the reference either (hasMoreTokens sees them — reference WOULD
    // error; replicate exactly: any remaining token at all).
    if (brokeAtRoot && i < toks.length) None
    else if (currentOp == null) None
    else Some(currentOp.build())
  }

  /** Full pipeline: default-op wrap + parse. */
  def parseQuery(q: String, model: RetrievalModel,
                 cfg: AnalyzerConfig): Option[Qry] =
    parse(addDefaultOp(q, model), cfg)
}
