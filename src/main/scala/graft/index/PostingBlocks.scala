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
    * Shape: relational `groupBy.agg(collect_list)` (Tungsten hash
    * aggregation with map-side partials, whole-stage codegen up to the
    * encode UDF) — measurably faster than the typed
    * `groupByKey.flatMapGroups` equivalent, which deserializes every
    * posting into Scala objects before grouping. The doclen side
    * broadcast-joins when small (AQE decides from stats).
    */
  def fromPostings(spark: SparkSession, postings: DataFrame,
                   doclen: DataFrame,
                   blockSize: Int = DefaultBlockSize): Dataset[PostingBlock] = {
    import spark.implicits._

    val encodeUdf = udf((rows: Seq[org.apache.spark.sql.Row]) => {
      // one (term, field, segment) group: ≤ docs-per-bucket postings
      val sorted = rows.sortBy(_.getLong(0))
      sorted.grouped(blockSize).zipWithIndex.map { case (chunk, blockId) =>
        val ps = chunk.map(r =>
          Posting(r.getLong(0), r.getInt(1), r.getSeq[Int](2).toArray))
        val lens = chunk.map(_.getLong(3))
        val first = ps.head.docid
        (blockId, first, ps.last.docid, ps.length, ps.map(_.tf.toLong).sum,
          ps.map(_.tf).max, lens.min, lens.max,
          PostingCodec.encode(ps, first), PostingCodec.encodeLens(lens))
      }.toSeq
    })

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
        struct($"docid", $"tf", $"positions", $"len").as("p"))
      .groupBy($"term", $"field", $"segment")
      .agg(collect_list($"p").as("ps"))
      .select($"term", $"field", $"segment", explode(encodeUdf($"ps")).as("b"))
      .select($"term", $"field", $"segment",
        $"b._1".as("blockId"), $"b._2".as("firstDocid"),
        $"b._3".as("lastDocid"), $"b._4".as("df"), $"b._5".as("ctf"),
        $"b._6".as("maxTf"), $"b._7".as("minLen"), $"b._8".as("maxLen"),
        $"b._9".as("block"), $"b._10".as("lens"))
      .as[PostingBlock]
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
