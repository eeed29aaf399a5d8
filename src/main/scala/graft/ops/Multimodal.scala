package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item flowing through the typed decode pipeline. */
final case class MediaItem(doc_id: Long, media: Array[Byte])

/** Extracted (stubbed) features for one media item. */
final case class MediaFeatures(doc_id: Long, n_bytes: Long, magic: String,
                               feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing (schema, partition-batched iteration, typed
  * Dataset signature) is real; the decode itself is a STUB — the
  * image/audio libraries are not in this container, so
  * [[decodeStub]] produces a deterministic fake feature vector from the
  * raw bytes. Swap [[decodeStub]] for a real decoder (JNI/Pandas-style
  * batch worker) without touching the pipeline: the batch shape
  * (Iterator[MediaItem] per partition) is exactly what a vectorized
  * decoder wants.
  */
object Multimodal {

  /** Attach the opaque binary column + cheap scan-time metadata. Here the
    * "media bytes" are the UTF-8 bytes of the text column — a stand-in
    * payload with the same plumbing as real image bytes. */
  def withBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("media"))

  /** Scan-time metadata over the binary column — pure expressions, no
    * decode: byte length + 4-byte magic prefix (file-type sniffing). */
  def metadata(bin: DataFrame): DataFrame =
    bin.select(col("doc_id"),
      length(col("media")).cast("long").as("n_bytes"),
      upper(hex(substring(col("media"), 1, 4))).as("magic"))

  /** STUB decoder: deterministic fake features from the raw bytes
    * (byte-sum bucket + length), standing in for a real image decode.
    * Marked clearly; replace with a real per-batch decoder at will. */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val bytes = item.media
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val magic = bytes.take(4).map(b => f"${b & 0xff}%02X").mkString
    MediaFeatures(item.doc_id, bytes.length.toLong, magic,
      Array((sum % 256L).toFloat, bytes.length.toFloat,
        (if (bytes.length > 0) sum.toFloat / bytes.length else 0f)))
  }

  /** The decode pipeline: binary rows → per-partition batched decode →
    * typed features. `mapPartitions` is the right shape here (genuine
    * per-partition imperative decode, the documented exception to
    * expressions-only): one decoder init per partition, streaming
    * iteration, no driver collect. */
  def extractFeatures(spark: SparkSession, bin: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("media")).as[MediaItem]
      .mapPartitions { items => items.map(decodeStub) }
  }
}
