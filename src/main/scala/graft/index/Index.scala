package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-field collection statistics — the reference's
  * `sumTotalTermFreq(field)` / `getDocCount(field)` pair
  * (`QryEval/src/QryopSlScore.java:142-143,198`). `avgDocLen` reproduces
  * the reference's float division. */
final case class FieldStats(field: String, docCount: Long,
                            collectionLength: Long) {
  def avgDocLen: Float = collectionLength.toFloat / docCount
}

/** Global statistics — exact global aggregates (north rule). `numDocs` is
  * the reference's `READER.numDocs()` (`QryopSlScore.java:141`). */
final case class IndexStats(numDocs: Long, fields: Map[String, FieldStats])

/** A built inverted index: the Spark-shaped equivalent of the reference's
  * Lucene index + DocLengthStore (SURVEY §1).
  *
  *  - docs      (docid, extid, repo, path, commit, lang, sha256)
  *  - postings  (term, field, docid, tf, positions: array<int>)
  *  - doclen    (docid, field, len)
  *  - termStats (term, field, df, ctf)
  *
  * `postings` carries exact positions (like Lucene's positional postings);
  * the compressed block form lives in `postings_blocks` when the index is
  * persisted (see [[IndexStore]]).
  */
final class Index(
    val spark: SparkSession,
    val docs: DataFrame,
    val postings: DataFrame,
    val doclen: DataFrame,
    val termStats: DataFrame,
    /** Global statistics, computed on first use (exact aggregates over
      * docs/doclen) — loading a snapshot supplies the persisted values,
      * a fresh build defers the two counting jobs until a scorer needs
      * them. */
    statsThunk: () => IndexStats,
    /** Pre-built compressed block table (set when loaded from an
      * [[IndexStore]] snapshot); otherwise derived on demand. */
    blocksOpt: Option[Dataset[PostingBlock]] = None,
    /** docid-bucket count of the build (the salt domain) — the store
      * repartitions persisted tables to ~1 file per segment. */
    val buckets: Int = 64,
    /** Fields this index was built with (IndexConfig.fields), persisted
      * in stats.json. None (legacy snapshots) ⇒ derived from the fields
      * that actually contain documents. */
    indexedFieldsOpt: Option[Seq[String]] = None) extends Serializable {

  lazy val stats: IndexStats = statsThunk()

  /** Known fields — queries against any other field are a syntax error
    * (the round-1 behavior of silently matching nothing hid typos). */
  lazy val indexedFields: Set[String] =
    indexedFieldsOpt.map(_.toSet).getOrElse(stats.fields.keySet)

  def fieldStats(field: String): FieldStats =
    stats.fields.getOrElse(field, FieldStats(field, 0L, 0L))

  /** Delta-gap + varbyte compressed posting blocks (north rule), keyed by
    * (term, field, segment) with block-max metadata — the serving form of
    * the index and the input of [[graft.exec.BlockMaxWand]]. */
  lazy val blocks: Dataset[PostingBlock] =
    blocksOpt.getOrElse(
      PostingBlocks.fromPostings(spark, postings, doclen))

  /** Forward index (doc vector), built on demand for PRF / LeToR —
    * reference `TermVector` (`QryEval/src/TermVector.java:19-89`). */
  lazy val fwdIndex: DataFrame = {
    import org.apache.spark.sql.functions._
    postings
      .groupBy("docid", "field")
      .agg(sort_array(collect_list(struct(col("term"), col("tf"))))
        .as("stemsTf"))
      .select(col("docid"), col("field"),
        col("stemsTf.term").as("stems"), col("stemsTf.tf").as("stemFreq"))
  }

  def cacheAll(): Index = {
    docs.cache(); postings.cache(); doclen.cache(); termStats.cache()
    this
  }
}
