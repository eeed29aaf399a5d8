package graft.analysis

import java.util.Locale

/** One analyzed token: the (possibly stemmed) term plus its word position.
  *
  * Positions are indices into the *raw* token stream (before stopword
  * removal), so stopwords leave position gaps — mirroring Lucene's
  * StopFilter position increments that the reference engine relies on for
  * `#NEAR`/`#WINDOW` semantics (reference analyzer chain:
  * `QryEval/src/EnglishAnalyzerConfigurable.java:138-160`).
  */
final case class Tok(term: String, pos: Int)

/** Stemming stage of the analyzer chain. */
sealed trait Stemming extends Serializable
object Stemming {
  case object None extends Stemming
  /** Harman s-stemmer — the pre-round-4 light stemmer. */
  case object SStem extends Stemming
  /** Krovetz dictionary-validated stemmer ([[KrovetzStemmer]]) — the
    * reference's KStem stage (`EnglishAnalyzerConfigurable.java:156`). */
  case object KStem extends Stemming
}

/** Analyzer configuration. The reference uses Lucene's
  * StandardTokenizer → LowerCase → Stop → KStem
  * (`QryEval/src/QryEval.java:38-45`); for the source-code corpus the
  * analyzer choice is ours, but it MUST be byte-identical between index
  * build and query parse. The default `code` profile (no stopwords, no
  * stemming, ASCII-alnum tokens) is also exactly expressible in ANSI SQL
  * (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`), which lets the
  * driver's DuckDB oracle replicate it.
  */
final case class AnalyzerConfig(stopwords: Set[String] = Set.empty,
                                stemming: Stemming = Stemming.None)

object AnalyzerConfig {
  /** Default profile for source-code corpora: keep everything. */
  val code: AnalyzerConfig = AnalyzerConfig()

  /** Lucene StandardAnalyzer.STOP_WORDS_SET (public knowledge), as used by
    * the reference's StopFilter (`EnglishAnalyzerConfigurable.java:150`).
    */
  val luceneEnglishStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** English profile — the reference's chain: stopword removal + Krovetz
    * stemming (KStem parity for ClueWeb-style runs). */
  val english: AnalyzerConfig =
    AnalyzerConfig(stopwords = luceneEnglishStopwords, Stemming.KStem)

  /** The pre-round-4 english profile (documented Harman s-stemmer). */
  val englishLight: AnalyzerConfig =
    AnalyzerConfig(stopwords = luceneEnglishStopwords, Stemming.SStem)
}

/** Deterministic tokenizer shared by index build and query parsing. */
object Analyzer extends Serializable {

  /** Lowercase + split into maximal `[a-z0-9]+` runs. */
  def rawTokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val lower = text.toLowerCase(Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = lower.length
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val d = lower.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += lower.substring(start, i)
      } else i += 1
    }
    out.toArray
  }

  /** Harman "s-stemmer" — a deterministic, documented light stemmer
    * (public algorithm; stands in for the reference's KStem, which is
    * Lucene-internal). Only applied when `cfg.stem` is true.
    */
  def sStem(w: String): String = {
    if (w.length > 3 && w.endsWith("ies"))
      if (w.endsWith("eies") || w.endsWith("aies")) w
      else w.substring(0, w.length - 3) + "y"
    else if (w.length > 2 && w.endsWith("es"))
      if (w.endsWith("aes") || w.endsWith("ees") || w.endsWith("oes")) w
      else w.substring(0, w.length - 1)
    else if (w.length > 2 && w.endsWith("s"))
      if (w.endsWith("us") || w.endsWith("ss")) w
      else w.substring(0, w.length - 1)
    else w
  }

  /** Full analysis: raw tokens → positions → stopword drop (gap kept) →
    * optional stem. Identical at build time and query time.
    */
  def tokenize(text: String, cfg: AnalyzerConfig): Array[Tok] = {
    val raw = rawTokens(text)
    val out = new scala.collection.mutable.ArrayBuffer[Tok](raw.length)
    var p = 0
    while (p < raw.length) {
      val t = raw(p)
      if (!cfg.stopwords.contains(t))
        out += Tok(cfg.stemming match {
          case Stemming.None  => t
          case Stemming.SStem => sStem(t)
          case Stemming.KStem => KrovetzStemmer.stem(t)
        }, p)
      p += 1
    }
    out.toArray
  }

  /** Query-side single-token analysis, mirroring the reference's
    * `tokenizeQuery` + "keep only tokenized[0]" rule
    * (`QryEval/src/QryEval.java:472-474,673-687`): a query token that
    * analyzes to nothing (stopword) vanishes; multi-token output keeps
    * only the first.
    */
  def analyzeQueryToken(token: String, cfg: AnalyzerConfig): Option[String] =
    tokenize(token, cfg).headOption.map(_.term)
}
