package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language ID, and document
  * fingerprinting. All pure Column expressions (whole-stage codegen, no
  * UDFs) so they survive a 100 TB scan: one narrow pass over the corpus,
  * no shuffle except the caller's own aggregations.
  *
  * The tokenization here is the Column-expression twin of
  * [[graft.analysis.Analyzer.rawTokens]] (code profile: lowercase,
  * maximal `[a-z0-9]+` runs) — and is deliberately expressible in ANSI
  * SQL (`list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'))`)
  * so the driver's DuckDB oracle can replicate every operator exactly.
  */
object TextOps {

  /** Analyzed token array (order-preserving, stopword-free code profile). */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Portable 32-bit content hash: first 8 hex digits of md5, as a long in
    * [0, 2^32). Built from `md5`/`conv` builtins → codegen'd, and
    * bit-reproducible in any engine with md5 (the DuckDB oracle uses
    * `('0x' || substr(md5(s),1,8))::BIGINT`). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Portable 60-bit content hash: first 15 hex digits of md5, as a
    * non-negative long (< 2^60, so it fits a signed BIGINT in every
    * engine — the DuckDB oracle uses `('0x' || substr(md5(s),1,15))
    * ::BIGINT`). Used where a set of hashes stands in for a set of
    * strings ([[Dedup.shingleHashesCol]]): at 60 bits the collision
    * probability within one document's shingle set (~10^3 elements) is
    * ~10^-12, vs ~10^-4 for [[h32]]. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Token count + distinct-term count per document. */
  def tokenStats(text: Column): (Column, Column) = {
    val toks = tokensCol(text)
    (size(toks).cast("long"), size(array_distinct(toks)).cast("long"))
  }

  /** Quality signals: exact ratios (integer/integer in double — bit-exact
    * across engines). */
  def qualityColumns(text: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val toks = tokensCol(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val alnumChars = length(regexp_replace(lower(text), "[^a-z0-9]", ""))
      .cast("double")
    val stopTok = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast("double")
    val tokChars = aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
    Seq(
      "n_tokens" -> nTok.cast("long"),
      "alpha_ratio" -> when(nChars > 0, alnumChars / nChars).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nTok > 0, stopTok / nTok).otherwise(lit(0.0)),
      "avg_token_len" -> when(nTok > 0, tokChars / nTok).otherwise(lit(0.0)))
  }

  /** Marker-token sets per language for the n-gram-free heuristic
    * language ID. Deterministic tie order: first match in this list wins
    * (en > de > fr > es); all-zero → "und". */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Heuristic language ID: argmax of marker-token counts with the fixed
    * tie order above. Pure expressions (greatest + chained when). */
  def langIdCol(text: Column): Column = {
    val toks = tokensCol(text)
    val counts = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms.map(lit): _*))).cast("long")
    }
    val best = greatest(counts.map(_._2): _*)
    counts.foldRight(lit("und")) { case ((lang, c), acc) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight keeps the FIRST matching lang in list order on ties.
  }

  val FpMod = 1000000007L
  val FpMul = 1000003L

  /** Order-sensitive document fingerprint: left fold of the 32-bit token
    * hashes, `acc = (acc*1000003 + h32(tok)) % (1e9+7)`, acc0 = 0. A
    * rolling content hash that is stable under re-partitioning (pure
    * per-row) and cheap to compare for order-sensitive near-duplicate
    * detection. */
  def fingerprintCol(text: Column): Column =
    aggregate(
      transform(tokensCol(text), t => h32(t)),
      lit(0L),
      (acc, v) => pmod(acc * lit(FpMul) + v, lit(FpMod)))
}
