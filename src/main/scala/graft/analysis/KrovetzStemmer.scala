package graft.analysis

/** Krovetz stemmer — R. Krovetz, "Viewing Morphology as an Inference
  * Process" (SIGIR 1993; public literature). The reference engine's
  * analyzer chain ends in Lucene's KStem
  * (`QryEval/src/EnglishAnalyzerConfigurable.java:138-160`); this is the
  * same algorithm: INFLECTIONAL morphology only (plural, past tense,
  * present participle), every conflation VALIDATED against a lexicon —
  * a word whose candidate stems are not dictionary-confirmed is returned
  * unchanged (the paper's precision-first design, in contrast to
  * rule-only stemmers like Porter).
  *
  * Steps (paper §3):
  *  1. direct conflation of irregular forms (matrices→matrix, feet→foot);
  *  2. lexicon words pass through unchanged (meeting stays meeting);
  *  3. plural → singular: `-ies`→`-ie` if that word exists (calories→
  *     calorie) else `-y` (policies→policy); `-es`→`-e` if that word
  *     exists (bases→base) else drop `-es` (crosses→cross); plain `-s`
  *     dropped (never `-ss`/`-us`/`-is`);
  *  4. past tense: `-ied`→`-y` (tried→try); `-ed` dropped with doubled-
  *     consonant undoubling (hopped→hop) and e-restoration (used→use),
  *     each step dictionary-validated — no validation, no change;
  *  5. present participle `-ing`: same recoding as step 4 (hopping→hop,
  *     hoping→hope); unvalidated stems revert (sing stays sing).
  *
  * The embedded lexicon is a compact common-word subset (the full KStem
  * lexicon is ~30k entries; only the validation MECHANISM changes
  * behavior — out-of-lexicon words are conservatively left unchanged,
  * which for a source-code corpus is almost everything). Headwords only:
  * the lexicon never contains inflected forms, so step 2 cannot mask
  * steps 3-5.
  */
object KrovetzStemmer extends Serializable {

  /** Irregular forms the rules cannot reach (paper §3.1 examples). */
  private val direct: Map[String, String] = Map(
    "matrices" -> "matrix", "indices" -> "index", "vertices" -> "vertex",
    "appendices" -> "appendix", "feet" -> "foot", "geese" -> "goose",
    "teeth" -> "tooth", "mice" -> "mouse", "men" -> "man",
    "women" -> "woman", "children" -> "child", "people" -> "person",
    "media" -> "medium", "criteria" -> "criterion", "data" -> "datum",
    "analyses" -> "analysis", "theses" -> "thesis")

  /** Compact headword lexicon: validation targets for steps 3-5 plus
    * common words that must pass through unchanged (step 2). */
  private val lexicon: Set[String] = Set(
    // -e restorations (used→use, hoping→hope, ...)
    "use", "hope", "care", "make", "take", "give", "live", "move", "name",
    "note", "time", "type", "file", "line", "page", "site", "size",
    "state", "store", "share", "close", "change", "charge", "create",
    "delete", "merge", "parse", "phrase", "cache", "range", "scale",
    "score", "table", "value", "write", "manage", "measure", "release",
    "remove", "require", "retrieve", "unite", "update", "agree", "free",
    "decide", "provide", "combine", "define", "derive", "encode",
    "decode", "invite", "locate", "rotate", "validate", "generate",
    "evaluate", "calculate", "estimate", "operate", "separate",
    "license", "reserve", "invert", "inverse",
    // undoubling targets (hopped→hop, fitted→fit, ...)
    "hop", "fit", "map", "plan", "stop", "drop", "run", "set", "get",
    "put", "cut", "hit", "let", "log", "tag", "trim", "wrap", "skip",
    "ship", "swap", "split", "submit", "omit", "commit", "permit",
    "refer", "occur", "control", "begin", "win", "dig", "pin", "scan",
    // bare stems (suited→suit, asked→ask, meetings→meeting, ...)
    "suit", "ask", "call", "check", "clean", "clear", "count", "crawl",
    "down", "end", "fail", "fetch", "field", "fill", "filter", "find",
    "flush", "form", "group", "hash", "head", "help", "hold", "index",
    "join", "key", "kind", "learn", "link", "list", "load", "lock",
    "look", "loop", "mark", "match", "meet", "meeting", "mean", "mount",
    "need", "open", "order", "pass", "point", "print", "process", "pull",
    "push", "read", "record", "report", "rest", "result", "return",
    "roll", "search", "seed", "seek", "select", "send", "show", "sign",
    "sort", "sound", "spill", "stack", "start", "stream", "string",
    "test", "text", "thing", "think", "train", "turn", "view", "wait",
    "walk", "want", "watch", "word", "work", "world", "year", "yield",
    // -ies/-es validation targets
    "calorie", "movie", "cookie", "policy", "query", "factory", "family",
    "library", "entry", "company", "country", "city", "study", "body",
    "copy", "try", "fly", "memory", "category", "property", "priority",
    "strategy", "directory", "history", "summary", "boundary", "array",
    "cross", "class", "gas", "bus", "box", "fix", "mix", "fox", "batch",
    "branch", "bench", "patch", "search", "switch", "watch", "wish",
    "base", "case", "cause", "course", "house", "phase", "purpose",
    "response", "sentence", "service", "source", "space", "voice",
    // common words that must survive step 2 untouched
    "during", "evening", "morning", "nothing", "ring", "king", "sing",
    "spring", "thing", "string", "bring", "being", "bed", "red", "need",
    "seed", "feed", "speed", "shed", "hundred", "sacred", "united")

  private def vowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  /** Plural → singular (paper §3: plurals conflate routinely; the
    * lexicon only picks AMONG candidate singulars). */
  private def plural(w: String): String =
    if (w.length > 4 && w.endsWith("ies")) {
      val ie = w.dropRight(1)               // calories → calorie
      if (lexicon(ie)) ie else w.dropRight(3) + "y" // policies → policy
    } else if (w.length > 3 && w.endsWith("es") &&
               !w.endsWith("aes") && !w.endsWith("ees") &&
               !w.endsWith("oes")) {
      val e = w.dropRight(1)                // bases → base
      if (lexicon(e)) e
      else {
        val es = w.dropRight(2)             // crosses → cross
        if (es.endsWith("ss") || es.endsWith("x") || es.endsWith("ch") ||
            es.endsWith("sh") || lexicon(es)) es
        else e
      }
    } else if (w.length > 3 && w.endsWith("s") &&
               !w.endsWith("ss") && !w.endsWith("us") && !w.endsWith("is"))
      w.dropRight(1)                        // engines → engine
    else w

  /** Shared `-ed`/`-ing` recoding: undouble a doubled final consonant,
    * restore a dropped `e` — each candidate dictionary-validated; if
    * nothing validates, the ORIGINAL word is returned (paper §3.2). */
  private def recode(original: String, stem: String): String = {
    val n = stem.length
    if (n >= 3 && stem(n - 1) == stem(n - 2) && !vowel(stem(n - 1))) {
      val un = stem.dropRight(1)            // hopped/hopping → hop
      if (lexicon(un)) un
      else if (lexicon(stem)) stem
      else original
    } else if (lexicon(stem + "e")) stem + "e" // used/hoping → use/hope
    else if (lexicon(stem)) stem            // suited → suit
    else original
  }

  private def pastTense(w: String): String =
    if (w.length > 4 && w.endsWith("ied")) {
      val y = w.dropRight(3) + "y"          // tried → try
      val ie = w.dropRight(1)               // died → die
      if (lexicon(y)) y else if (lexicon(ie)) ie else w
    } else if (w.length > 3 && w.endsWith("ed"))
      recode(w, w.dropRight(2))             // used → use
    else w

  private def participle(w: String): String =
    if (w.length > 4 && w.endsWith("ing"))
      recode(w, w.dropRight(3))             // using → use
    else w

  /** Stem one lowercase token. */
  def stem(word: String): String = {
    if (word.length <= 3) return word
    direct.get(word) match {
      case Some(s) => return s
      case None    =>
    }
    if (lexicon(word)) return word          // headwords pass through
    val p = plural(word)
    if (p != word) p else participle(pastTense(word))
  }
}
