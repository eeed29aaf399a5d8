package graft.exec

import graft.analysis.AnalyzerConfig
import graft.api.{ParamFile, SearchEngine, TrecWriter}
import graft.model.{BM25, Indri}
import org.apache.spark.sql.functions._

/** E3: the `retrievalAlgorithm=letor` end-to-end run
  * (`QryEval/src/QryEval.java:125-226`, `LearnToRank.java:21-104,120-167`):
  *
  *  1. TRAIN — for each `letor:trainingQueryFile` query, build features
  *     for every `letor:trainingQrelsFile` document (qrels file order =
  *     normalization insertion order), normalize per query, append
  *     svm-light lines to `letor:trainingFeatureVectorsFile`, then train
  *     the ranker (pairwise-logistic substitute for `svm_rank_learn`) and
  *     write the weight vector to `letor:svmRankModelFile`.
  *  2. TEST — for each test query, take the BM25 top-100 as candidates
  *     (rank order = insertion order, rel 0), append feature lines to
  *     `letor:testingFeatureVectorsFile`, score with the model
  *     (`svm_rank_classify` substitute) appending one score per line to
  *     `letor:testingDocumentScores`, re-sort each query's candidates by
  *     the new score (stable — ties keep BM25 rank order, like
  *     `Arrays.sort` with `ReverseScoreOrder`) and write the TREC file.
  *
  * Driver-side collects are the per-query ≤100-row candidate lists and
  * the training matrix — the same data the reference pipes through files
  * to the external svm_rank process.
  */
object LeToRRun {

  private def appendLines(path: String, lines: Seq[String]): Unit = {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(path, true))
    try lines.foreach(l => w.write(l + "\n")) finally w.close()
  }

  /** `qid 0 extid rel` lines → (qid, extid, rel) in FILE ORDER
    * (`LearnToRank.java:44-68`). */
  def loadQrels(path: String): Seq[(Int, String, Int)] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().map(_.trim).filter(_.nonEmpty).map { l =>
      val p = l.split("\\s+")
      (p(0).toInt, p(2), p(3).toInt)
    }.toSeq
    finally src.close()
  }

  /** `extid score` lines (`LearnToRank.java:82-90`). */
  def loadPageRank(path: String): Map[String, Double] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().map(_.trim).filter(_.nonEmpty).map { l =>
      val p = l.split("\\s+"); p(0) -> p(1).toDouble
    }.toMap
    finally src.close()
  }

  /** The reference's external-process call (`LearnToRank.java:195-226`):
    * consume stdout/stderr (an unread pipe stalls the child), require
    * exit 0. Used for the vendored svm_rank binaries when
    * `letor:svmRankLearnPath`/`letor:svmRankClassifyPath` are set. */
  def callCmd(args: Seq[String]): Unit = {
    val proc = new ProcessBuilder(args: _*)
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    try Iterator.continually(out.readLine()).takeWhile(_ != null)
      .foreach(System.out.println)
    finally out.close()
    require(proc.waitFor() == 0, s"SVM Rank crashed. (${args.head})")
  }

  def run(engine: SearchEngine, params: Map[String, String],
          cfg: AnalyzerConfig): Unit = {
    val spark = engine.index.spark
    import spark.implicits._
    val bm25 = BM25(params.getOrElse("BM25:k_1", "1.2").toFloat,
      params.getOrElse("BM25:b", "0.75").toFloat,
      params.getOrElse("BM25:k_3", "0").toFloat)
    val indri = Indri(params.getOrElse("Indri:mu", "2500").toFloat,
      params.getOrElse("Indri:lambda", "0.4").toFloat)
    val pageRank = params.get("letor:pageRankFile")
      .map(loadPageRank).getOrElse(Map.empty)
    val disabled = params.get("letor:featureDisable")
      .map(_.split(",").map(_.trim.toInt).toSet).getOrElse(Set.empty[Int])

    def normalizedFeatures(qid: Int, queryText: String,
                           cands: Seq[(String, Int)]) = {
      // cands = (extid, rel) in insertion order; unknown extids fail loudly
      val candDf = broadcast(cands.zipWithIndex
        .map { case ((e, r), i) => (e, r, i) }
        .toDF("extid", "rel", "ord"))
      val withIds = candDf
        .join(engine.index.docs.select($"docid", $"extid"), Seq("extid"))
      require(withIds.count() == cands.length,
        s"qrels/candidate extids missing from index for query $qid")
      val feats = LeToR.rawFeatures(engine.index, queryText, cfg,
        withIds.select("docid"), bm25, indri, pageRank)
      LeToR.normalize(
        feats.join(withIds, "docid").withColumn("qid", lit(qid)))
    }

    def svmLines(norm: org.apache.spark.sql.DataFrame): Seq[String] =
      LeToR.svmLight(norm, disabled)
        .orderBy("ord").select("line").as[String].collect().toSeq

    // ---------------------------------------------------------- train
    val trainQueries = ParamFile.loadQueries(params("letor:trainingQueryFile"))
    require(trainQueries.nonEmpty,
      s"letor:trainingQueryFile ${params("letor:trainingQueryFile")} " +
        "contains no 'id:querytext' lines — letor needs at least one " +
        "training query")
    val qrels = loadQrels(params("letor:trainingQrelsFile"))
    val trainVecFile = params("letor:trainingFeatureVectorsFile")
    new java.io.File(trainVecFile).delete()
    val trainNorm = trainQueries.map { case (qid, q) =>
      val rels = qrels.collect { case (id, e, r) if id == qid => (e, r) }
      if (rels.isEmpty)
        System.err.println(s"[letor] WARNING: training query $qid has no " +
          "qrels lines — it contributes nothing to the ranker")
      val norm = normalizedFeatures(qid, q, rels).cache()
      appendLines(trainVecFile, svmLines(norm))
      norm
    }
    // svm_rank binary integration (`LearnToRank.java:100-103,163-165`):
    // when letor:svmRankLearnPath / letor:svmRankClassifyPath point at
    // the vendored executables, training and scoring shell out exactly
    // like the reference (svm-light files in, model/score files out);
    // otherwise the documented in-repo pairwise-logistic ranker runs on
    // the same files.
    val learnPath = params.get("letor:svmRankLearnPath")
    val classifyPath = params.get("letor:svmRankClassifyPath")
    require(learnPath.isDefined == classifyPath.isDefined,
      "letor:svmRankLearnPath and letor:svmRankClassifyPath must be set " +
        "together (the external ranker needs both phases)")
    val useBinary = learnPath.isDefined
    val modelFile = params.get("letor:svmRankModelFile")

    val w: Array[Double] =
      if (useBinary) {
        val mf = modelFile.getOrElse(sys.error(
          "letor:svmRankModelFile is required with the svm_rank binaries"))
        new java.io.File(mf).delete()
        callCmd(Seq(learnPath.get, "-c",
          params.getOrElse("letor:svmRankParamC", "0.001"), trainVecFile, mf))
        null // scoring goes through svm_rank_classify, not a weight vector
      } else {
        val w0 = LeToR.trainPairwise(trainNorm.reduce(_ unionByName _),
          disabled = disabled)
        modelFile.foreach { f =>
          new java.io.File(f).delete()
          appendLines(f, w0.map(_.toString).toSeq)
        }
        w0
      }
    trainNorm.foreach(_.unpersist(false)) // query-scoped: done training

    // ----------------------------------------------------------- test
    // Phase 1 writes every query's feature vectors (the reference's
    // testingFeatureVectorsFile), THEN one scoring pass (external
    // classify over the whole file, or the in-repo model per query),
    // then the rerank + TREC write per query — the reference's E3 order.
    val testVecFile = params.get("letor:testingFeatureVectorsFile")
    val scoresFile = params.get("letor:testingDocumentScores")
    require(!useBinary || testVecFile.isDefined,
      "letor:testingFeatureVectorsFile is required with the svm_rank binaries")
    val out = params("trecEvalOutputPath")
    Seq(testVecFile, scoresFile, Some(out)).flatten
      .foreach(f => new java.io.File(f).delete())

    val perQuery = ParamFile.loadQueries(params("queryFilePath"))
      .map { case (qid, q) =>
        val top = engine.search(q, bm25, 100)
          .orderBy("rank").select("extid").as[String].collect().toSeq
        val norm =
          if (top.isEmpty) None
          else {
            val n = normalizedFeatures(qid, q, top.map(e => (e, 0))).cache()
            testVecFile.foreach(f => appendLines(f, svmLines(n)))
            Some(n)
          }
        (qid, top, norm)
      }

    val binaryScores: Iterator[Double] =
      if (!useBinary) Iterator.empty
      else {
        val sf = scoresFile.getOrElse(sys.error(
          "letor:testingDocumentScores is required with the svm_rank binaries"))
        callCmd(Seq(classifyPath.get, testVecFile.get, modelFile.get, sf))
        val src = scala.io.Source.fromFile(sf)
        val scores =
          try src.getLines().map(_.trim).filter(_.nonEmpty)
            .map(_.toDouble).toArray
          finally src.close()
        // a truncated classify output would otherwise surface as a bare
        // NoSuchElementException mid-rerank (round-3 ADVICE)
        val expected = perQuery
          .map { case (_, top, n) => if (n.isDefined) top.length else 0 }.sum
        require(scores.length == expected,
          s"svm_rank_classify wrote ${scores.length} scores to $sf but " +
            s"$expected test feature vectors were classified — truncated " +
            "or stale score file")
        scores.iterator
      }

    perQuery.foreach { case (qid, top, normOpt) =>
      normOpt match {
        case None => TrecWriter.append(out, qid, Seq.empty)
        case Some(norm) =>
          val scored: Seq[(String, Double, Int)] =
            if (useBinary)
              top.zipWithIndex.map { case (e, i) =>
                (e, binaryScores.next(), i)
              }
            else {
              val s = LeToR.score(norm, w)
                .join(norm.select("docid", "ord", "extid"), "docid")
                .orderBy("ord")
                .select("extid", "score", "ord").as[(String, Double, Int)]
                .collect().toSeq
              scoresFile.foreach(f => appendLines(f, s.map(_._2.toString)))
              s
            }
          norm.unpersist(false) // query-scoped: all actions done
          val reranked = scored.sortBy { case (_, s, ord) => (-s, ord) }
            .zipWithIndex
            .map { case ((e, s, _), i) => (e, i + 1, s) }
          TrecWriter.append(out, qid, reranked)
      }
    }
  }
}
