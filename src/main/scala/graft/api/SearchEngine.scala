package graft.api

import graft.analysis.{AnalyzerConfig, Stemming}
import graft.exec.Planner
import graft.index.Index
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Facade: parse → plan → execute → rank — the reference's per-query
  * lifecycle E1 (SURVEY §3) as one declarative Spark plan.
  */
final class SearchEngine(val index: Index,
                         val analyzer: AnalyzerConfig = AnalyzerConfig.code) {

  // The query-time analyzer MUST be the build-time analyzer — a mismatch
  // stems/stops query terms differently from the index's vocabulary and
  // every query silently matches wrong (usually zero) postings. Snapshots
  // record their analyzer in stats.json (round-4 ADVICE); fail loudly
  // here instead.
  index.analyzerOpt match {
    case Some(built) =>
      require(built == analyzer,
        s"analyzer mismatch: the index was built with $built but is " +
        s"being queried with $analyzer — query stems/stopwords would " +
        "silently diverge from the indexed vocabulary. Query with the " +
        "build-time config, or rebuild the index.")
    case None =>
      // legacy snapshot with no recorded analyzer: the pre-KStem english
      // profiles used a different stemmer, so a KStem query config cannot
      // be trusted against it
      require(analyzer.stemming != Stemming.KStem,
        "this index snapshot predates analyzer recording in stats.json " +
        "and cannot be safely queried with the KStem english profile " +
        "(legacy english snapshots were stemmed differently). Rebuild " +
        "the index, or query with AnalyzerConfig.englishLight / code.")
  }

  /** (docid, score) for a raw query string (post default-op wrap). */
  def scores(queryText: String, model: RetrievalModel): DataFrame = {
    val ast = QueryParser.parseQuery(queryText, model, analyzer)
      .getOrElse(throw new IllegalArgumentException(
        s"Query syntax is incorrect. $queryText"))
    new Planner(index, model).plan(ast)
  }

  /** O18 internal↔external id lookup (`QryEval/src/QryEval.java:295-323`):
    * pushed-down point filters against the docs table (the reference's
    * stored-field read / externalId TermQuery). */
  def externalId(docid: Long): Option[String] =
    index.docs.filter(col("docid") === docid).select("extid")
      .collect().headOption.map(_.getString(0))

  def internalId(extid: String): Option[Long] =
    index.docs.filter(col("extid") === extid).select("docid")
      .collect().headOption.map(_.getLong(0))

  /** Positional snippet from the forward index — the `TermVector`
    * positions consumer (`QryEval/src/TermVector.java:25,62-89` carries a
    * per-word-position stem index exactly for uses like this): the
    * `window` stems around the FIRST occurrence of any query term, with
    * "…" at stopword/gap positions. One pushed-down (docid, field) point
    * read; None when the doc has no field vector or no query term hits. */
  def snippet(docid: Long, field: String, queryText: String,
              window: Int = 8): Option[String] = {
    val terms = graft.analysis.Analyzer.tokenize(queryText, analyzer)
      .map(_.term).toSet
    index.fwdVectors(Seq(docid))
      .filter(col("field") === field)
      .select("stems", "positions").collect().headOption
      .flatMap { r =>
        val stems = r.getSeq[String](0)
        val pos = r.getSeq[Int](1)
        val hit = pos.indexWhere(i => i > 0 && terms.contains(stems(i - 1)))
        if (hit < 0) None
        else {
          val lo = math.max(0, hit - window / 2)
          val hi = math.min(pos.length, lo + window)
          Some(pos.slice(lo, hi)
            .map(i => if (i == 0) "…" else stems(i - 1)).mkString(" "))
        }
      }
  }

  /** Distributed [[snippet]]: one snippet per document whose `field`
    * vector contains a query term — the same positions logic as the
    * point lookup, expressed as pure columnar expressions over the
    * forward index (no UDF, no driver loop), so a 100 TB corpus computes
    * snippets as a single scan-shaped pass. Returns (docid, snippet). */
  def snippets(queryText: String, field: String = "body",
               window: Int = 8): DataFrame = {
    val terms = graft.analysis.Analyzer.tokenize(queryText, analyzer)
      .map(_.term).distinct
    val termsLit = array(terms.map(lit(_)): _*)
    val fi = index.fwdIndex.filter(col("field") === field)
    // First word position whose stem is a query term (positions are
    // 1-based indexes into stems; 0 = stopword/gap) — via posexplode +
    // min, NOT a nested array-filter expression: an aggregate is an
    // optimization barrier, so `hit` reaches the snippet projection as a
    // plain column. (The expression form read beautifully and ran in
    // O(len³) per row: CollapseProject + filter pushdown inline the whole
    // positions derivation into every lambda element.)
    val hits = fi
      .select(col("docid"), col("stems"),
        posexplode(col("positions")).as(Seq("pos", "stem")))
      .filter(col("stem") > 0 &&
        array_contains(termsLit, element_at(col("stems"), col("stem"))))
      .groupBy("docid").agg(min(col("pos")).as("hit"))
    val lo = greatest(lit(0), col("hit") - lit(window / 2))
    val hi = least(size(col("positions")), lo + lit(window))
    fi.join(hits, "docid")
      .select(col("docid"),
        array_join(
          transform(
            slice(col("positions"), lo + 1, hi - lo),
            i => when(i === 0, lit("…"))
              .otherwise(element_at(col("stems"), i))),
          " ").as("snippet"))
  }

  /** Pseudo-relevance-feedback expansion (SURVEY §2.6; orchestration
    * `QryEval/src/QryEval.java:154-185`): evaluate the original query,
    * learn a `#WAND` term query from the top `fbDocs` docs' forward-index
    * vectors, and combine
    * `#WAND(fbOrigWeight original (1-fbOrigWeight) learned)`.
    * Returns (learnedQuery, combinedQuery); evaluate the combined query
    * with [[search]]. `initial` overrides the fresh evaluation when a
    * prior ranking is supplied (fbInitialRankingFile). */
  def expand(queryText: String, model: RetrievalModel,
             fb: graft.exec.Expansion.FbParams,
             initial: Option[Seq[(Long, Double)]] = None): (String, String) = {
    val topDocs = initial.getOrElse {
      search(queryText, model, fb.fbDocs)
        .orderBy("rank").select("docid", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val learned = graft.exec.Expansion
      .learnedQuery(index, topDocs, fb.fbMu, fb.fbTerms)
    // Java string concatenation of doubles (`QryEval.java:182-183`)
    val combined = "#WAND(" + fb.fbOrigWeight + " " +
      QueryParser.addDefaultOp(queryText, model) + " " +
      (1 - fb.fbOrigWeight) + " " + learned + ")"
    (learned, combined)
  }

  /** Pruned top-k over the compressed block table:
    *  - BM25 bag-of-words `#SUM` (free text under BM25 always is — the
    *    default-op wrap) → block-max WAND ([[graft.exec.BlockMaxWand]]);
    *  - Indri product-form `#WAND`/`#AND` trees — including the
    *    reference's flagship SDM shape — → Dirichlet block-max pruning
    *    ([[graft.exec.IndriBlockMax]]).
    * Falls back to the exhaustive planner for any other shape.
    * Rank-identical to [[search]] by construction (property-tested in
    * BlockMaxWandSpec / IndriBlockMaxSpec). */
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
    case ind: graft.model.Indri =>
      val ast = QueryParser.parseQuery(queryText, model, analyzer)
        .getOrElse(throw new IllegalArgumentException(
          s"Query syntax is incorrect. $queryText"))
      graft.exec.IndriBlockMax.topK(index, Qry.asSl(ast), ind, k) match {
        case Some(cands) => rank(cands, k)
        case None        => searchAst(ast, model, k)
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

  /** Two-phase top-k (round-3 VERDICT item 3 — the single-plan form
    * joined the CORPUS-SCALE docs table on every query BEFORE the limit,
    * a per-query full docs scan/shuffle at 100 TB):
    *
    *  1. `TakeOrderedAndProject` over the narrow (docid, score) frame by
    *     (score desc, docid asc), fetching `2k` rows — NO docs join. If
    *     the 2k-th row scores below the k-th, every doc tied at the k-th
    *     score is inside the fetch, so the candidate set is closed with
    *     one distributed pass (extid only breaks EQUAL-score ties, and
    *     all equal-score candidates are in hand).
    *  2. extids for the ≤2k survivors: a pushed-down `isin` point lookup
    *     against docs — never a corpus shuffle.
    *  3. Only when the boundary tie group overflows the fetch (a
    *     constant-score query — the reference would compare extids of
    *     every tied doc too, `ScoreList.java:46-78`): one distributed
    *     `TakeOrderedAndProject` by extid over JUST the tied docs,
    *     the single case that must touch doc rows beyond 2k.
    *
    * The final (score desc, extid asc) order + rank numbering happen on
    * ≤2k driver rows; result is a LocalRelation. */
  def rank(scoreDf: DataFrame, k: Int): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val m = 2 * k
    val head = scoreDf
      .orderBy(desc("score"), asc("docid")).limit(m)
      .select(col("docid").cast("long"), col("score").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    def extidsOf(ids: Seq[Long]): Map[Long, String] =
      if (ids.isEmpty) Map.empty
      else index.docs.filter(col("docid").isin(ids: _*))
        .select(col("docid"), col("extid"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val withExt: Seq[(Long, Double, String)] =
      if (head.length <= k) {
        // the frame is exhausted (≤ k rows) — everything survives
        val ext = extidsOf(head.map(_._1))
        head.map { case (d, s) => (d, s, ext(d)) }.toSeq
      } else {
        val sk = head(k - 1)._2
        if (head.length < m || head.last._2 < sk) {
          // closed: all docs scoring ≥ sk are within the fetched 2k
          val cands = head.filter(_._2 >= sk)
          val ext = extidsOf(cands.map(_._1))
          cands.map { case (d, s) => (d, s, ext(d)) }.toSeq
        } else {
          // boundary tie group overflows the fetch: docs with score > sk
          // are definite (fewer than k of them); the remaining seats are
          // filled by the globally smallest extids at exactly sk
          val above = head.takeWhile(_._2 > sk)
          val ext = extidsOf(above.map(_._1))
          val need = k - above.length
          val boundary = scoreDf.filter(col("score") === sk)
            .join(index.docs.select(col("docid"), col("extid")), "docid")
            .orderBy(asc("extid")).limit(need)
            .select(col("docid").cast("long"), col("extid"))
            .collect().map(r => (r.getLong(0), sk, r.getString(1)))
          above.map { case (d, s) => (d, s, ext(d)) }.toSeq ++ boundary
        }
      }

    val ranked = withExt
      .sortBy { case (_, s, e) => (-s, e) }
      .take(k).zipWithIndex
      .map { case ((d, s, e), i) => (d, e, i + 1, s) }
    ranked.toDF("docid", "extid", "rank", "score")
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

  /** Read a prior run's top-N (docid, score) for one query — the
    * reference's `getTopDocId` over fbInitialRankingFile
    * (`QryEval/src/QryEval.java:242-271`): TREC columns
    * `qid Q0 extid rank score run`, extids resolved via the docs table. */
  def readTopDocs(path: String, queryId: Int, n: Int,
                  index: graft.index.Index): Seq[(Long, Double)] = {
    val src = scala.io.Source.fromFile(path)
    val rows =
      try src.getLines().map(_.trim.split("\\s+"))
        .filter(p => p.length >= 5 && p(0) == queryId.toString)
        .take(n).map(p => (p(2), p(4).toDouble)).toSeq
      finally src.close()
    val byExt = rows.map(_._1)
    import org.apache.spark.sql.functions.col
    val idMap = index.docs.filter(col("extid").isin(byExt: _*))
      .select(col("extid"), col("docid")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.flatMap { case (e, s) => idMap.get(e).map(d => (d, s)) }
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
