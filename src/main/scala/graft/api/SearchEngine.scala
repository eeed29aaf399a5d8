package graft.api

import graft.analysis.AnalyzerConfig
import graft.exec.Planner
import graft.index.Index
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Facade: parse → plan → execute → rank — the reference's per-query
  * lifecycle E1 (SURVEY §3) as one declarative Spark plan.
  */
final class SearchEngine(val index: Index,
                         val analyzer: AnalyzerConfig = AnalyzerConfig.code) {

  /** (docid, score) for a raw query string (post default-op wrap). */
  def scores(queryText: String, model: RetrievalModel): DataFrame = {
    val ast = QueryParser.parseQuery(queryText, model, analyzer)
      .getOrElse(throw new IllegalArgumentException(
        s"Query syntax is incorrect. $queryText"))
    new Planner(index, model).plan(ast)
  }

  /** Pruned BM25 top-k via block-max WAND over the compressed block
    * table, when the query lowers to a bag-of-words `#SUM` (free text
    * under BM25 always does — the default-op wrap). Falls back to the
    * exhaustive planner for any other shape. Rank-identical to [[search]]
    * by construction (property-tested in BlockMaxWandSpec). */
  def searchPruned(queryText: String, model: RetrievalModel,
                   k: Int = 100): DataFrame = model match {
    case bm: graft.model.BM25 =>
      val ast = QueryParser.parseQuery(queryText, model, analyzer)
        .getOrElse(throw new IllegalArgumentException(
          s"Query syntax is incorrect. $queryText"))
      bagOfWords(ast) match {
        case Some((children, field)) =>
          rank(graft.exec.BlockMaxWand.topK(
            index, index.blocks, bm, children, field, k), k)
        case None => searchAst(ast, model, k)
      }
    case _ => search(queryText, model, k)
  }

  /** `#SUM(t1 t2 ...)` over one field → the child-ordered term bag. */
  private def bagOfWords(ast: Qry): Option[(Seq[String], String)] = ast match {
    case Sum(args) =>
      val terms = args.map {
        case Score(Term(t, f)) => Some((t, f))
        case _                 => None
      }
      if (terms.forall(_.isDefined)) {
        val ts = terms.flatten
        val fields = ts.map(_._2).distinct
        if (fields.size == 1) Some((ts.map(_._1), fields.head)) else None
      } else None
    case _ => None
  }

  /** Ranked top-k: descending score, ascending extid tiebreak
    * (`ScoreList.java:54-80`) — the tiebreak is part of the distributed
    * sort key, so `orderBy(...).limit(k)` lowers to Catalyst's
    * TakeOrderedAndProject (the reference's bounded heap,
    * `QryEval.java:640-660`, distributed). */
  def search(queryText: String, model: RetrievalModel,
             k: Int = 100): DataFrame = rank(scores(queryText, model), k)

  def searchAst(ast: Qry, model: RetrievalModel, k: Int = 100): DataFrame =
    rank(new Planner(index, model).plan(ast), k)

  def rank(scoreDf: DataFrame, k: Int): DataFrame = {
    val ranked = scoreDf
      .join(index.docs.select(col("docid"), col("extid")), "docid")
      .orderBy(desc("score"), asc("extid"))
      .limit(k)
    // rank numbering happens on ≤k rows — single tiny partition is fine.
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(desc("score"), asc("extid"))))
      .select("docid", "extid", "rank", "score")
  }
}

object TrecWriter {
  /** Reference TREC-eval line format (`QryEval/src/QryEval.java:563-589`):
    * `qid\tQ0\textid\trank\tscore\trun-1`, `dummy` row when empty; scores
    * printed with Java's Double.toString. Appends, like the reference. */
  def append(path: String, queryId: Int,
             rows: Seq[(String, Int, Double)]): Unit = {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(path, true))
    try {
      if (rows.isEmpty)
        w.write(s"$queryId\tQ0\tdummy\t1\t0\trun-1\n")
      else rows.foreach { case (extid, rank, score) =>
        w.write(s"$queryId\tQ0\t$extid\t$rank\t$score\trun-1\n")
      }
    } finally w.close()
  }

  def writeResults(path: String, queryId: Int, ranked: DataFrame): Unit = {
    val rows = ranked.select("extid", "rank", "score").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    append(path, queryId, rows)
  }
}

/** `key=value` parameter file (`QryEval/src/QryEval.java:68-78`) and
  * `id:querytext` query file (`QryEval.java:325-336`). */
object ParamFile {
  def parse(lines: Iterator[String]): Map[String, String] =
    lines.filter(_.contains("=")).map { l =>
      val i = l.indexOf('=')
      l.substring(0, i).trim -> l.substring(i + 1).trim
    }.toMap

  def load(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.getLines()) finally src.close()
  }

  def loadQueries(path: String): Seq[(Int, String)] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().filter(_.contains(":")).map { l =>
      val i = l.indexOf(':')
      l.substring(0, i).trim.toInt -> l.substring(i + 1).trim
    }.toSeq
    finally src.close()
  }
}
