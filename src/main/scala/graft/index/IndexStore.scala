package graft.index

import graft.analysis.{AnalyzerConfig, Stemming}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persisted index layout — Iceberg-style semantics (snapshot commit,
  * per-segment manifest with lineage + build metrics, resumable writes)
  * implemented explicitly over partitioned Parquet. (No Iceberg runtime
  * jar exists in this sandbox — SURVEY §7 documents the substitution; the
  * metadata layer below provides the snapshot/manifest/resume semantics
  * the north rule requires.)
  *
  * ```
  * dir/
  *   postings/segment=K/   docid-bucket-partitioned, term-sorted files
  *   docs/  doclen/  termstats/
  *   manifest/             per-(table, segment) lineage + metrics rows
  *   stats.json            global statistics (exact aggregates)
  *   _done_<table>         per-table checkpoint markers (resume points)
  *   SNAPSHOT.json         atomic commit record — written LAST; a load
  *                         refuses a dir without it
  * ```
  *
  * Resume: `save` skips any table whose `_done_` marker exists, so a
  * killed build re-runs only the unfinished tables/partitions; the
  * snapshot is only committed when every table landed.
  */
object IndexStore {

  private val Tables =
    Seq("docs", "postings", "postings_blocks", "doclen", "termstats",
      "fwdindex")

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(dir, "SNAPSHOT.json"))

  private def marker(dir: String, t: String) = Paths.get(dir, s"_done_$t")

  def save(index: Index, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val t0 = System.currentTimeMillis()
    val spark = index.spark

    def writeTable(name: String)(w: => Unit): Unit =
      if (!Files.exists(marker(dir, name))) {
        w
        Files.createFile(marker(dir, name))
      }

    // Staged build: the corpus is tokenized EXACTLY ONCE (the postings
    // write); every other table derives from the persisted columnar
    // postings via read-back — at 100 TB the corpus pass is the cost
    // that must not repeat, while postings re-reads are pruned columnar
    // scans.
    //
    // postings partitioned by docid segment (the build salt): query-time
    // term lookups prune via parquet row-group stats on the sorted term
    // column inside every segment; segment dirs are the parallel unit.
    //
    // `repartition(buckets, segment)` bounds the dynamic-partition write
    // to ~ONE file per segment — without it, every write task opens a
    // parquet writer per segment dir (tasks × segments files), and the
    // per-file open/commit overhead dominates the whole build (measured
    // 22s for an otherwise-instant write). The sortWithinPartitions key
    // leads with `segment` so the planned-write sorter sees its required
    // partition-column ordering already satisfied and the (term, field,
    // docid) file order survives — that order gives query scans term
    // row-group pruning AND lets the block build stream off this layout
    // with no shuffle or sort (PostingBlocks.fromSortedPostings).
    writeTable("postings") {
      index.postings
        .withColumn("segment",
          shiftright(col("docid"), IndexBuilder.BucketShift))
        .repartition(index.buckets, col("segment"))
        .sortWithinPartitions("segment", "term", "field", "docid")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("segment").parquet(s"$dir/postings")
    }
    def postingsOnDisk = spark.read.parquet(s"$dir/postings")
    def doclenOnDisk = spark.read.parquet(s"$dir/doclen")

    // Every derived table depends ONLY on the persisted postings (doc
    // length rides inline on posting rows, so even the block build needs
    // no doclen barrier) — run them as CONCURRENT Spark jobs. The
    // scheduler interleaves their tasks, filling the cores a sequential
    // job-per-table commit leaves idle between stages; this is the fixed
    // per-run overhead that capped round-1 scaling efficiency at ~0.74.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // one job group over all derived writes → a failing sibling can
    // cancel the rest (setJobGroup is thread-local: set in each future)
    val jobGroup = s"graft-index-save-$t0"
    // cancelJobGroup only reaches RUNNING jobs: a queued future that
    // starts after the cancel would still write fully and delay error
    // propagation (round-3 ADVICE) — the flag turns it into a no-op.
    @volatile var failed = false
    def grouped(body: => Unit): Unit = if (!failed) {
      spark.sparkContext.setJobGroup(jobGroup,
        s"index snapshot save $dir", interruptOnCancel = true)
      try body
      catch { case e: Throwable => failed = true; throw e }
    }
    val doclenF = Future(grouped(writeTable("doclen") {
      IndexBuilder.doclenOf(postingsOnDisk)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/doclen")
    }))
    val docsF = Future(grouped(writeTable("docs") {
      index.docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")
    }))
    // Global stats from the PERSISTED tables, scheduled as soon as docs
    // + doclen land (they do not wait for blocks/fwdindex/manifest).
    // Never touch `index.stats` here: the in-memory thunk aggregates the
    // UNPERSISTED doclen, i.e. a full corpus re-tokenize — measured as a
    // hidden serial pass at the end of every save.
    val statsF: Future[IndexStats] = for {
      _ <- docsF
      _ <- doclenF
    } yield IndexBuilder.statsOf(
      spark.read.parquet(s"$dir/docs"), doclenOnDisk)
    val derived = Seq(
      doclenF,
      docsF,
      Future(grouped(writeTable("termstats") {
        IndexBuilder.termStatsOf(postingsOnDisk)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/termstats")
      })),
      // the compressed serving form (north rule: delta-gap + varbyte
      // blocks with block-max metadata), partitioned like the postings.
      // Streamed straight off the persisted sorted layout — no shuffle,
      // no sort, O(blockSize) memory per task; each scan partition holds
      // whole segments, so the dynamic partitionBy still writes one file
      // per segment dir.
      Future(grouped(writeTable("postings_blocks") {
        PostingBlocks.fromSortedPostings(spark, s"$dir/postings")
          .write.mode(SaveMode.Overwrite)
          .partitionBy("segment").parquet(s"$dir/postings_blocks")
      })),
      // forward index (TermVector analog), partitioned by docid segment:
      // PRF / LeToR / snippet reads become partition-pruned point scans
      // (Index.fwdVectors) instead of a full postings re-aggregation per
      // query (round-3 VERDICT item 2). Streamed off the persisted
      // sorted segment layout with ZERO shuffle (an in-partition re-sort
      // to docid-major + a run assembler — Index.fwdIndexFromSorted
      // Postings); whole segments per scan partition keep the dynamic
      // partitionBy at one file per segment dir.
      Future(grouped(writeTable("fwdindex") {
        Index.fwdIndexFromSortedPostings(spark, s"$dir/postings")
          .write.mode(SaveMode.Overwrite)
          .partitionBy("segment").parquet(s"$dir/fwdindex")
      })),
      // lineage + metrics manifest (north rule): per-segment row counts,
      // term counts, build wall-clock.
      Future(grouped(if (!Files.exists(marker(dir, "manifest"))) {
        val buildMillis = System.currentTimeMillis() - t0
        postingsOnDisk
          .groupBy("segment")
          .agg(count(lit(1)).as("postingCount"),
            approx_count_distinct(col("term")).as("termCountApprox"),
            max(col("docid")).as("maxDocid"))
          .withColumn("buildMillis", lit(buildMillis))
          .withColumn("snapshotId", lit(t0))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
        Files.createFile(marker(dir, "manifest"))
      })))
    // On any table failure: cancel the sibling jobs (they share the job
    // group) and drain the remaining futures before rethrowing, so the
    // snapshot dir is quiescent when save() propagates the error —
    // otherwise siblings keep writing into it after the caller has moved
    // on (round-2 ADVICE).
    val stats =
      try {
        Await.result(Future.sequence(derived), Duration.Inf)
        Await.result(statsF, Duration.Inf)
      } catch {
        case e: Throwable =>
          spark.sparkContext.cancelJobGroup(jobGroup)
          (derived :+ statsF).foreach(f =>
            try { Await.result(f, Duration.Inf); () }
            catch { case _: Throwable => () })
          throw e
      }
      finally pool.shutdown()

    writeStats(stats, s"$dir/stats.json", index.buckets,
      index.indexedFields.toSeq.sorted, index.analyzerOpt)

    // atomic commit: tmp + move
    val snap = s"""{"snapshotId":$t0,"formatVersion":1,""" +
      s""""tables":[${Tables.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""numDocs":${stats.numDocs}}"""
    val tmp = Paths.get(dir, "SNAPSHOT.json.tmp")
    Files.writeString(tmp, snap)
    Files.move(tmp, Paths.get(dir, "SNAPSHOT.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  def load(spark: SparkSession, dir: String): Index = {
    require(exists(dir), s"no committed index snapshot at $dir")
    val (stats, buckets, indexedFields, analyzer) =
      readStats(s"$dir/stats.json")
    import spark.implicits._
    val blocks = spark.read.parquet(s"$dir/postings_blocks")
      .withColumn("segment", col("segment").cast("long"))
      .select("term", "field", "segment", "blockId", "firstDocid",
        "lastDocid", "df", "ctf", "maxTf", "minLen", "maxLen", "block",
        "lens")
      .as[PostingBlock]
    new Index(spark,
      spark.read.parquet(s"$dir/docs"),
      spark.read.parquet(s"$dir/postings")
        .select("term", "field", "docid", "tf", "positions", "len"),
      spark.read.parquet(s"$dir/doclen"),
      spark.read.parquet(s"$dir/termstats"),
      statsThunk = () => stats,
      blocksOpt = Some(blocks),
      buckets = buckets,
      indexedFieldsOpt =
        if (indexedFields.nonEmpty) Some(indexedFields) else None,
      // legacy snapshots (pre-round-4) carry no fwdindex table — fall
      // back to on-demand derivation from postings
      fwdIndexStoredOpt =
        if (Files.exists(Paths.get(dir, "fwdindex")))
          Some(spark.read.parquet(s"$dir/fwdindex")
            .withColumn("segment", col("segment").cast("long"))
            .select("docid", "field", "stems", "stemFreq", "positions",
              "segment"))
        else None,
      analyzerOpt = analyzer)
  }

  def writeStats(stats: IndexStats, path: String, buckets: Int = 64,
                 indexedFields: Seq[String] = Seq.empty,
                 analyzer: Option[AnalyzerConfig] = None): Unit = {
    val fields = stats.fields.values.map(f =>
      s"""{"field":"${f.field}","docCount":${f.docCount},""" +
      s""""collectionLength":${f.collectionLength}}""").mkString(",")
    val idxf = indexedFields.map("\"" + _ + "\"").mkString(",")
    // the analyzer IDENTITY is part of the snapshot: a snapshot queried
    // with a differently-configured analyzer silently mismatches stems
    // and stopwords (round-4 ADVICE) — SearchEngine validates this field.
    val an = analyzer.map { a =>
      val stem = a.stemming match {
        case Stemming.None  => "none"
        case Stemming.SStem => "sstem"
        case Stemming.KStem => "kstem"
      }
      // stats.json is hand-rolled JSON read back by regex: a stopword
      // containing a quote, backslash, or bracket would either corrupt
      // the file or silently truncate the parse — and a silently-dropped
      // analyzer record defeats the mismatch guard this field exists
      // for. Stopwords are analyzer-produced tokens (never those chars
      // in practice), so fail LOUDLY at save rather than escape.
      a.stopwords.find(w => w.exists(c => c == '"' || c == '\\' ||
          c == '[' || c == ']')).foreach { bad =>
        throw new IllegalArgumentException(
          s"stopword '$bad' contains JSON-breaking characters " +
          "(\" \\ [ ]) and cannot be recorded in the snapshot's " +
          "analyzer identity")
      }
      val stops = a.stopwords.toSeq.sorted.map("\"" + _ + "\"").mkString(",")
      s""","analyzer":{"stemming":"$stem","stopwords":[$stops]}"""
    }.getOrElse("")
    Files.writeString(Paths.get(path),
      s"""{"numDocs":${stats.numDocs},"buckets":$buckets,""" +
      s""""indexedFields":[$idxf]$an,"fields":[$fields]}""")
  }

  def readStats(path: String)
      : (IndexStats, Int, Seq[String], Option[AnalyzerConfig]) = {
    val s = Files.readString(Paths.get(path))
    val numDocs = """"numDocs":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    val buckets = """"buckets":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(64)
    val idxf = """"indexedFields":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(m => """"([^"]+)"""".r.findAllMatchIn(m.group(1))
        .map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)
    val analyzer =
      """"analyzer":\{"stemming":"(\w+)","stopwords":\[([^\]]*)\]\}""".r
        .findFirstMatchIn(s).map { m =>
          val stem = m.group(1) match {
            case "none"  => Stemming.None
            case "sstem" => Stemming.SStem
            case "kstem" => Stemming.KStem
            case other => throw new IllegalStateException(
              s"$path records unknown stemming variant '$other'")
          }
          val stops = """"([^"]+)"""".r.findAllMatchIn(m.group(2))
            .map(_.group(1)).toSet
          AnalyzerConfig(stopwords = stops, stemming = stem)
        }
    val fieldRe =
      """\{"field":"([^"]+)","docCount":(\d+),"collectionLength":(\d+)\}""".r
    val fields = fieldRe.findAllMatchIn(s).map { m =>
      m.group(1) -> FieldStats(m.group(1), m.group(2).toLong, m.group(3).toLong)
    }.toMap
    (IndexStats(numDocs, fields), buckets, idxf, analyzer)
  }
}
