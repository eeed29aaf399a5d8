package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One compressed posting block — the grouped/compressed segment form of
  * SURVEY §1.1 / FIXTURES §2 `postings_blocks`, extended with per-block
  * skip + score-bound metadata for block-max WAND (SURVEY §4 item 5):
  *
  *  - key: (term, field, segment) — `segment = docid >> BucketShift` is
  *    the docid bucket of the build, so a hot term's list is spread over
  *    every segment (the salt) and no single block-encoder task ever sees
  *    more than one segment's slice of it;
  *  - blockId orders the ≤ blockSize-posting blocks within a segment;
  *  - firstDocid/lastDocid bound the block (skip without decode);
  *  - df/ctf are per-block counts (sum over blocks = per-(term,field,
  *    segment) totals; global df/ctf live in termStats);
  *  - maxTf/minLen/maxLen bound any posting's BM25 contribution: tf-weight
  *    is increasing in tf and decreasing in docLen, so
  *    `tfW(maxTf, minLen)` (rsj ≥ 0) / `tfW(1, maxLen)` (rsj < 0) bounds
  *    the block — computable for ANY (k1, b) at query time, unlike
  *    classic impact-ordered indexes that bake one model in.
  */
final case class PostingBlock(
    term: String, field: String, segment: Long, blockId: Int,
    firstDocid: Long, lastDocid: Long,
    df: Int, ctf: Long, maxTf: Int, minLen: Long, maxLen: Long,
    block: Array[Byte], lens: Array[Byte])

/** Builds/decodes the compressed block table. */
object PostingBlocks {

  val DefaultBlockSize = 1024

  /** postings (term, field, docid, tf, positions) ⋈ doclen → blocks.
    *
    * The shuffle key (term, field, segment) is the salted repartitioning
    * of the north rule: segment comes from the docid hash-bucket, so the
    * postings of a hot term ("the", "if", license headers) land on
    * `#segments` different reducers instead of one.
    *
    * Shape: hash repartition on the group key + SPILLABLE sort within
    * partitions + a streaming per-partition encoder whose working set is
    * ONE block (≤ blockSize postings), emitted when the block fills or
    * the (term, field, segment) key changes. Round 2 used
    * `groupBy.agg(collect_list)`, which holds every group's full posting
    * list in the aggregation hash map — at high task concurrency in a
    * bounded heap (the 1.2M-doc 8-core probe) those collect_list buffers
    * collapsed scaling to 0.54; the sort spills to disk instead of
    * ballooning, so per-task memory is O(blockSize) regardless of corpus
    * size or task count — the property a 1000-executor build needs.
    */
  def fromPostings(spark: SparkSession, postings: DataFrame,
                   doclen: DataFrame,
                   blockSize: Int = DefaultBlockSize): Dataset[PostingBlock] = {
    import spark.implicits._

    // doc length comes inline with the posting rows when the builder
    // provided it (the scale path — no join); otherwise join doclen
    val withLen =
      if (postings.columns.contains("len")) postings
      else {
        require(doclen.columns.contains("len"),
          "postings carry no inline len and no doclen table was supplied")
        postings.join(
          doclen.select($"docid", $"field", $"len"), Seq("docid", "field"))
      }
    withLen
      .select($"term", $"field",
        shiftright($"docid", IndexBuilder.BucketShift).as("segment"),
        $"docid", $"tf", $"positions", $"len")
      .repartition($"term", $"field", $"segment")
      .sortWithinPartitions($"term", $"field", $"segment", $"docid")
      .as[(String, String, Long, Long, Int, Array[Int], Long)]
      .mapPartitions(rows =>
        streamEncode(rows, blockSize, segmentMajor = false))
  }

  /** Block build over the PERSISTED postings layout — zero shuffle, zero
    * sort: [[IndexStore.save]] writes postings one-file-per-segment,
    * sorted by (term, field, docid) inside each file, so every scan
    * partition is a concatenation of whole, already-sorted segment runs
    * and the streaming encoder can consume it directly. The read uses a
    * cloned session with file-splitting disabled (maxPartitionBytes
    * ceiling) so a segment file is never split mid-run — segments are
    * the parallel unit, exactly as the snapshot layout intends; size
    * `buckets` so one segment's postings stay in the low GBs at target
    * scale. This is the snapshot path; [[fromPostings]] (hash shuffle +
    * spillable sort) serves unsorted in-memory postings. */
  def fromSortedPostings(spark: SparkSession, postingsDir: String,
                         blockSize: Int = DefaultBlockSize)
      : Dataset[PostingBlock] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", s"${64L << 30}")
    s2.conf.set("spark.sql.files.openCostInBytes", s"${1L << 30}")
    import s2.implicits._
    s2.read.parquet(postingsDir)
      .select($"term", $"field", $"segment".cast("long").as("segment"),
        $"docid", $"tf", $"positions", $"len")
      .as[(String, String, Long, Long, Int, Array[Int], Long)]
      .mapPartitions(rows =>
        streamEncode(rows, blockSize, segmentMajor = true))
  }

  /** Streaming encoder over a (term, field, segment, docid)-sorted row
    * iterator: buffers at most `blockSize` postings, emits a block on
    * fill or key change. Pure iterator-to-iterator — Spark pulls blocks
    * as the output parquet writer wants them.
    *
    * The encoder DEPENDS on layout invariants (docids ascending within a
    * key, each (term, field, segment) run contiguous) that, if violated,
    * would silently emit corrupt blocks (blockId restarting mid-group,
    * unsorted docids breaking the delta-gap varbyte) — so it ASSERTS them
    * and fails loudly instead (round-3 ADVICE). `segmentMajor` names the
    * incoming sort order: true for the persisted layout (whole segment
    * files, (term, field) sorted inside each, every segment in one file),
    * false for the shuffle path's (term, field, segment) sort — both
    * checks are O(1) memory apart from a per-segment set. */
  private def streamEncode(
      rows: Iterator[(String, String, Long, Long, Int, Array[Int], Long)],
      blockSize: Int, segmentMajor: Boolean): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private val in = rows.buffered
      private var blockId = 0
      private var lastKey: (String, String, Long) = _
      private var lastDocid = Long.MinValue
      private val seenSegments = scala.collection.mutable.HashSet.empty[Long]

      def hasNext: Boolean = in.hasNext

      /** New key run — assert the input ordering that makes runs
        * contiguous, per the declared layout. */
      private def checkRunStart(key: (String, String, Long)): Unit = {
        if (lastKey != null) {
          val ok =
            if (segmentMajor) {
              if (key._3 == lastKey._3)
                Ordering.Tuple2[String, String]
                  .gt((key._1, key._2), (lastKey._1, lastKey._2))
              else seenSegments.add(key._3)
            } else Ordering.Tuple3[String, String, Long].gt(key, lastKey)
          require(ok, s"posting layout violation: key run for $key is " +
            s"out of order after $lastKey (segmentMajor=$segmentMajor) — " +
            "blockId numbering would restart mid-group and emit corrupt " +
            "blocks")
        } else if (segmentMajor) seenSegments.add(key._3)
        lastKey = key
        lastDocid = Long.MinValue
      }

      def next(): PostingBlock = {
        val (term, field, segment, _, _, _, _) = in.head
        if (blockId == 0) checkRunStart((term, field, segment))
        val ps = new scala.collection.mutable.ArrayBuffer[Posting](16)
        val lens = new scala.collection.mutable.ArrayBuffer[Long](16)
        var maxTf = 0
        var minLen = Long.MaxValue
        var maxLen = Long.MinValue
        var ctf = 0L
        while (ps.length < blockSize && in.hasNext && {
          val h = in.head; h._1 == term && h._2 == field && h._3 == segment
        }) {
          val (_, _, _, docid, tf, positions, len) = in.next()
          require(docid > lastDocid, "posting layout violation: docids " +
            s"not strictly ascending for ($term,$field,$segment): $docid " +
            s"after $lastDocid — delta-gap varbyte would corrupt")
          lastDocid = docid
          ps += Posting(docid, tf, positions)
          lens += len
          ctf += tf
          if (tf > maxTf) maxTf = tf
          if (len < minLen) minLen = len
          if (len > maxLen) maxLen = len
        }
        val id = blockId
        val moreOfKey = in.hasNext && {
          val h = in.head; h._1 == term && h._2 == field && h._3 == segment
        }
        blockId = if (moreOfKey) blockId + 1 else 0
        PostingBlock(term, field, segment, id,
          ps.head.docid, ps.last.docid, ps.length, ctf, maxTf, minLen,
          maxLen, PostingCodec.encode(ps.toSeq, ps.head.docid),
          PostingCodec.encodeLens(lens.toSeq))
      }
    }

  /** Decode back to the row form (term, field, docid, tf, positions) —
    * inverse of [[fromPostings]] up to row order (property-tested). */
  def toPostings(spark: SparkSession,
                 blocks: Dataset[PostingBlock]): DataFrame = {
    import spark.implicits._
    blocks
      .flatMap { b =>
        PostingCodec.decode(b.block, b.firstDocid).map(p =>
          (b.term, b.field, p.docid, p.tf, p.positions))
      }
      .toDF("term", "field", "docid", "tf", "positions")
  }
}
