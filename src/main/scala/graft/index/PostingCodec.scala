package graft.index

import scala.collection.mutable.ArrayBuffer

/** One decoded posting (docid-ascending within a block). */
final case class Posting(docid: Long, tf: Int, positions: Array[Int])

/** Delta-gap + variable-byte posting-block codec (north rule: "delta-gap +
  * variable-byte compressed posting lists").
  *
  * Pure Scala over `Array[Byte]` — used inside `mapGroups`/UDFs, no
  * Catalyst involvement (SURVEY §4 item 3). Layout, all varints:
  *
  * ```
  * count
  * repeat count times:
  *   docidGap   (first posting: docid - baseDocid; then docid - prev)
  *   tf
  *   tf position gaps (first: pos; then pos - prev)
  * ```
  *
  * Varint = little-endian base-128 (7 data bits/byte, MSB = continuation)
  * — the standard variable-byte scheme of the IR literature (Scholer et
  * al., "Compression of inverted indexes for fast query evaluation").
  * Gaps are non-negative by the docid/position-ascending invariant the
  * reference maintains (`QryEval/src/InvList.java:115-130`).
  */
object PostingCodec {

  private def writeVLong(out: ArrayBuffer[Byte], v0: Long): Unit = {
    require(v0 >= 0, s"varint underflow: $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Encode docid-ascending postings relative to `baseDocid`. */
  def encode(postings: Seq[Posting], baseDocid: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte](postings.length * 4)
    writeVLong(out, postings.length.toLong)
    var prevDoc = baseDocid
    postings.foreach { p =>
      writeVLong(out, p.docid - prevDoc)
      prevDoc = p.docid
      writeVLong(out, p.tf.toLong)
      var prevPos = 0
      var i = 0
      while (i < p.positions.length) {
        val pos = p.positions(i)
        writeVLong(out, (pos - prevPos).toLong)
        prevPos = pos
        i += 1
      }
    }
    out.toArray
  }

  /** Streaming decoder — lets block-max WAND stop mid-block. */
  final class Reader(bytes: Array[Byte], baseDocid: Long) {
    private var off = 0
    private def readVLong(): Long = {
      var v = 0L; var shift = 0
      var b = bytes(off); off += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        b = bytes(off); off += 1
      }
      v | (b.toLong << shift)
    }
    val count: Int = readVLong().toInt
    private var read = 0
    private var prevDoc = baseDocid
    def hasNext: Boolean = read < count
    def next(): Posting = {
      val docid = prevDoc + readVLong()
      prevDoc = docid
      val tf = readVLong().toInt
      val positions = new Array[Int](tf)
      var prevPos = 0; var i = 0
      while (i < tf) {
        prevPos += readVLong().toInt
        positions(i) = prevPos
        i += 1
      }
      read += 1
      Posting(docid, tf, positions)
    }
  }

  def decode(bytes: Array[Byte], baseDocid: Long): Array[Posting] = {
    val r = new Reader(bytes, baseDocid)
    val out = new Array[Posting](r.count)
    var i = 0
    while (r.hasNext) { out(i) = r.next(); i += 1 }
    out
  }

  /** Per-posting doc lengths, varint-packed alongside the block (BM25
    * needs docLen per posting; inlining it — like Lucene norms — saves
    * the doclen join on the pruned query path). */
  def encodeLens(lens: Seq[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](lens.length * 2)
    lens.foreach(writeVLong(out, _))
    out.toArray
  }

  def decodeLens(bytes: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    var off = 0; var i = 0
    while (i < count) {
      var v = 0L; var shift = 0
      var b = bytes(off); off += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        b = bytes(off); off += 1
      }
      out(i) = v | (b.toLong << shift)
      i += 1
    }
    out
  }
}
