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
    */
  def fromPostings(spark: SparkSession, postings: DataFrame,
                   doclen: DataFrame,
                   blockSize: Int = DefaultBlockSize): Dataset[PostingBlock] = {
    import spark.implicits._
    val withLen = postings
      .join(doclen.select($"docid", $"field", $"len"), Seq("docid", "field"))
      .select($"term", $"field",
        shiftright($"docid", IndexBuilder.BucketShift).as("segment"),
        $"docid", $"tf", $"positions", $"len")
      .as[(String, String, Long, Long, Int, Array[Int], Long)]

    withLen
      .groupByKey { case (term, field, segment, _, _, _, _) =>
        (term, field, segment)
      }
      .flatMapGroups { (key: (String, String, Long),
                        it: Iterator[(String, String, Long, Long, Int, Array[Int], Long)]) =>
        val (term, field, segment) = key
        // One segment's slice of one term: ≤ docs-per-bucket rows.
        val rows = it.map { case (_, _, _, docid, tf, positions, len) =>
          (Posting(docid, tf, positions), len)
        }.toArray.sortBy(_._1.docid)
        rows.grouped(blockSize).zipWithIndex.map { case (chunk, blockId) =>
          val ps = chunk.map(_._1)
          val lens = chunk.map(_._2)
          val first = ps.head.docid
          PostingBlock(term, field, segment, blockId,
            firstDocid = first, lastDocid = ps.last.docid,
            df = ps.length, ctf = ps.map(_.tf.toLong).sum,
            maxTf = ps.map(_.tf).max,
            minLen = lens.min, maxLen = lens.max,
            block = PostingCodec.encode(ps.toSeq, first),
            lens = PostingCodec.encodeLens(lens.toSeq))
        }
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
