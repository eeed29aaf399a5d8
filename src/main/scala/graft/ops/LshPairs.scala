package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH banding machinery for the two propose stages
  * ([[Dedup.lshCandidates]] over minhash band keys,
  * [[Similarity.embeddingNearDup]] over SRP band keys).
  *
  * The self-join on (band, key) finds every pair sharing ≥1 band
  * bucket, but emits a pair once PER shared band — ~4×-20× multiplicity
  * at high dup density (identical items collide on all bands; the
  * 30×-scaled probe measured 85.2M multiplied rows collapsing to 4.2M
  * pairs), with every multiplied row paying the downstream verify and
  * the survivors a distinct shuffle. Carrying each row's full band-key
  * array through the join (bandCount values — linear in corpus) lets a
  * CASE-chain filter keep a pair only at its FIRST matching band:
  * exact, allocation-free (a zip_with/array_position form measured ~40%
  * slower from per-row array allocation), and it removes the trailing
  * distinct entirely.
  *
  * Contract: `keyed` must have one row per id — a duplicated id row
  * duplicates its pairs (the dropped distinct no longer hides it).
  * Both callers satisfy this (minhash signatures come from a groupBy;
  * embeddings are one row per vec_id). */
private[ops] object LshPairs {

  /** (id, keys, band, key) rows from a one-row-per-id (id, keys) frame. */
  def bandRows(keyed: DataFrame): DataFrame =
    keyed.select(col("id"), col("keys"),
      posexplode(col("keys")).as(Seq("band", "key")))

  /** Colliding (a_id, b_id) pairs with a_id < b_id, each emitted exactly
    * once, at its first matching band. A match at `band` exists by
    * construction; folding from the LAST band nests band 0's test
    * outermost, so the chain returns the first matching band. */
  def firstBandPairs(bands: DataFrame, bandCount: Int): DataFrame = {
    val l = bands.select(col("band"), col("key"), col("id").as("a_id"),
      col("keys").as("a_keys"))
    val r = bands.select(col("band"), col("key"), col("id").as("b_id"),
      col("keys").as("b_keys"))
    val firstMatch = (bandCount - 1 to 0 by -1).foldLeft(lit(-1)) {
      (acc, b) =>
        when(col("a_keys").getItem(b) === col("b_keys").getItem(b), lit(b))
          .otherwise(acc)
    }
    l.join(r, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("band") === firstMatch)
      .select("a_id", "b_id")
  }
}
