package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), Spark-first:
  *
  *  - brute-force cosine top-k: one narrow scan + TakeOrderedAndProject —
  *    the exactness baseline. All arithmetic is a deterministic
  *    left-to-right fold in double precision (`aggregate` over
  *    `zip_with`), so scores are bit-reproducible (and DuckDB-oracle
  *    checkable with the same fold via `list_reduce`).
  *  - LSH (sign-random-projection) buckets: 8 deterministic integer
  *    hyperplanes → 8-bit bucket; search only the probe's bucket. The
  *    scale path: the bucket join shuffles ~1/256 of the corpus per
  *    probe, and bucketing the stored table on `bucket` makes the probe
  *    side a pruned scan.
  */
object Similarity {

  val LshBits = 8
  val Dim = 64

  /** Deterministic pseudo-hyperplane weight: integer in [-48, 48].
    * Single source of truth for engine + oracle SQL. */
  def lshWeight(i: Int, j: Int): Long = ((i * 8191L + j * 127L) % 97L) - 48L

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** cosine(a, b) with deterministic fold order. */
  def cosineCol(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against the probe vector (excluded from
    * results). `orderBy.limit` lowers to TakeOrderedAndProject — a
    * distributed bounded heap, no global sort. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 probe: Array[Float], probeId: Long, k: Int): DataFrame = {
    val probeLit = lit(probe.map(_.toDouble))
    df.filter(col(idCol) =!= probeId)
      .select(col(idCol).as("vec_id"),
        cosineCol(col(vecCol), probeLit).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Sign-random-projection bucket id in [0, 2^LshBits). */
  def lshBucketCol(vecCol: Column): Column =
    (0 until LshBits).map { i =>
      val w = lit((0 until Dim).map(j => lshWeight(i, j).toDouble).toArray)
      when(dot(vecCol, w) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only vectors in the probe's bucket, then
    * exact cosine top-k within it. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              probe: Array[Float], probeId: Long, k: Int): DataFrame = {
    val probeRow = org.apache.spark.sql.SparkSession.active
      .range(1).select(lit(probe).as("v"))
      .select(lshBucketCol(col("v")).as("b")).collect()(0).getLong(0)
    df.withColumn("bucket", lshBucketCol(col(vecCol)))
      .filter(col("bucket") === probeRow && col(idCol) =!= probeId)
      .select(col(idCol).as("vec_id"),
        cosineCol(col(vecCol), lit(probe.map(_.toDouble))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Fetch a probe vector by id (tiny driver-side lookup). */
  def probeVector(df: DataFrame, idCol: String, vecCol: String,
                  id: Long): Array[Float] = {
    val r: Row = df.filter(col(idCol) === id).select(vecCol).head()
    r.getSeq[Float](0).toArray
  }

  // ------------------------------------------------ banded multi-probe

  /** Banded SRP: `BandCount` independent bands of `BandBits` hyperplanes
    * (32 signs total). A vector is a candidate iff it matches the probe
    * on ALL bits of ≥1 band — minhash-style banding applied to SRP, so
    * recall does not collapse the way one wide bucket's would, while a
    * probe still touches only ~`BandCount/2^BandBits` (~1.6%) of the
    * corpus. Hyperplanes extend [[lshWeight]] (same generator, rows
    * `band*BandBits+bit`). */
  val BandCount = 4
  val BandBits = 8

  /** Band key (0..255) of band `bnd`. */
  def bandKeyCol(vecCol: Column, bnd: Int): Column =
    (0 until BandBits).map { b =>
      val i = bnd * BandBits + b
      val w = lit((0 until Dim).map(j => lshWeight(i, j).toDouble).toArray)
      when(dot(vecCol, w) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banded-LSH ANN: candidates share ≥1 of the probe's band keys; exact
    * cosine top-k within the candidate set. One scan, pure expressions —
    * at scale, pair with [[writeBucketed]] so the scan prunes on band 0. */
  def lshTopKBanded(df: DataFrame, idCol: String, vecCol: String,
                    probe: Array[Float], probeId: Long, k: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val probeKeys: Seq[Long] = {
      val row = spark.range(1).select(
        (0 until BandCount).map(bnd =>
          bandKeyCol(lit(probe), bnd).as(s"b$bnd")): _*).collect()(0)
      (0 until BandCount).map(row.getLong)
    }
    val anyBand = (0 until BandCount)
      .map(bnd => bandKeyCol(col(vecCol), bnd) === lit(probeKeys(bnd)))
      .reduce(_ || _)
    df.filter(anyBand && col(idCol) =!= probeId)
      .select(col(idCol).as("vec_id"),
        cosineCol(col(vecCol), lit(probe.map(_.toDouble))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Bucket-partitioned storage: embeddings written partitioned by the
    * band-0 key (256 dirs). A probe's band-0 candidates then come from a
    * PARTITION-PRUNED scan (1/256 of files); the other bands' candidates
    * still need the full scan, so at 100 TB one replica per band (4×
    * storage, like any multi-index layout) makes every band pruned. */
  def writeBucketed(df: DataFrame, idCol: String, vecCol: String,
                    dir: String): Unit =
    df.select(col(idCol), col(vecCol),
        bandKeyCol(col(vecCol), 0).as("bucket"))
      // one file per partition dir, not one per (task × dir)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Probe the bucketed layout: band-0 candidates via partition pruning. */
  def lshTopKStored(spark: org.apache.spark.sql.SparkSession, dir: String,
                    idCol: String, vecCol: String, probe: Array[Float],
                    probeId: Long, k: Int): DataFrame = {
    val probeKey = spark.range(1)
      .select(bandKeyCol(lit(probe), 0).as("b")).collect()(0).getLong(0)
    spark.read.parquet(dir)
      .filter(col("bucket") === probeKey && col(idCol) =!= probeId)
      .select(col(idCol).as("vec_id"),
        cosineCol(col(vecCol), lit(probe.map(_.toDouble))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }
}
