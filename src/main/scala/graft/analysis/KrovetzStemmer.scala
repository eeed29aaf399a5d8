package graft.analysis

/** Krovetz stemmer — the full kstem algorithm (R. Krovetz, "Viewing
  * Morphology as an Inference Process", SIGIR 1993) exactly as shipped in
  * Apache Lucene 4.3.0 (`org.apache.lucene.analysis.en.KStemmer`, ALv2 —
  * itself a port of Krovetz's public kstem.c). This is the stage the
  * reference's analyzer chain ends in
  * (`QryEval/src/EnglishAnalyzerConfigurable.java:156-158`), so
  * english-profile runs are vocabulary-verbatim with the reference.
  *
  * The ~28k-entry dictionary (KStemData1-8 headwords + exception /
  * direct-conflation / country-nationality / supplement / proper-noun
  * tables — public data originally from the UMass kstem distribution)
  * rides in `graft/analysis/kstem-lexicon.txt` on the classpath.
  *
  * Faithfulness notes (all load-bearing, differentially validated against
  * Lucene's KStemFilter output on every dictionary word plus ~900k
  * generated inflections and random probes):
  *
  *  - Words found in the dictionary are returned unchanged (or mapped to
  *    their direct-conflation root); only out-of-dictionary words are
  *    stemmed. Many inflected-looking forms ("running", "indices") ARE
  *    headwords and therefore pass through.
  *  - Suffix steps run in kstem's exact order: plural → past tense →
  *    aspect → ity → ness → ion → er/or → ly → al → (dict side-effect
  *    probe) → ive → ize → ment → ble → ism → ic → ncy → nce, each
  *    short-circuited by the `matchedEntry` state of the LAST dictionary
  *    probe.
  *  - Several steps mutate the word buffer unvalidated (e.g. `-ness` and
  *    `-ism` are always removed); the final answer is the buffer, not a
  *    validated dictionary word.
  *  - The word buffer replicates Lucene's `OpenStringBuilder`: setLength
  *    does NOT clear, so growing it re-exposes previously written chars
  *    (e.g. "beer" → "bee" depends on re-exposing the 'e').
  *  - `endsIn(String)` resets the stem marker `j = k` on entry; the
  *    char-pair variants leave `j` stale on mismatch. Both behaviors are
  *    observable and preserved.
  *
  * Thread-safe: per-thread stemmer state via ThreadLocal (Lucene uses a
  * per-analyzer instance; executors call [[stem]] concurrently).
  */
object KrovetzStemmer extends Serializable {

  private final val MaxWordLen = 50

  private final class DictEntry(val root: String, val exception: Boolean)

  private val DefaultEntry = new DictEntry(null, false)

  /** word → entry; `word` lines are headwords (root=null), `a>b` lines are
    * direct conflations (root=b), `word!` lines are exception entries
    * (root = the word itself, exception flag set). */
  private val dict: java.util.HashMap[String, DictEntry] = {
    val m = new java.util.HashMap[String, DictEntry](65536)
    val in = getClass.getResourceAsStream("/graft/analysis/kstem-lexicon.txt")
    require(in != null, "graft/analysis/kstem-lexicon.txt missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      for (line <- src.getLines() if line.nonEmpty && !line.startsWith("#")) {
        if (line.endsWith("!")) {
          val w = line.substring(0, line.length - 1)
          m.put(w, new DictEntry(w, true))
        } else {
          val gt = line.indexOf('>')
          if (gt >= 0)
            m.put(line.substring(0, gt),
                  new DictEntry(line.substring(gt + 1), false))
          else m.put(line, DefaultEntry)
        }
      }
    } finally src.close()
    m
  }

  /** Lucene OpenStringBuilder semantics: `setLength` only moves the length
    * marker — the underlying chars stay, so a later grow re-exposes them.
    * `charAt` is unchecked (reads the raw array) like Lucene's. */
  private final class OpenBuf {
    private var arr = new Array[Char](64)
    private var len = 0
    def reset(capacity: Int): Unit = {
      if (arr.length < capacity) arr = new Array[Char](capacity)
      len = 0
    }
    def length: Int = len
    def charAt(i: Int): Char = arr(i)
    def setCharAt(i: Int, c: Char): Unit = arr(i) = c
    def setLength(n: Int): Unit = len = n
    def append(c: Char): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, len * 2)
      arr(len) = c
      len += 1
    }
    def append(s: String): Unit = {
      var i = 0
      while (i < s.length) { append(s.charAt(i)); i += 1 }
    }
    override def toString: String = new String(arr, 0, len)
  }

  /** One stemmer's mutable state — `word` buffer, `k` (index of the final
    * letter of the current word), `j` (index of the final letter of the
    * current stem candidate), and the last dictionary probe. */
  private final class Kst {
    private val word = new OpenBuf
    private var j = 0
    private var k = 0
    private var matchedEntry: DictEntry = null

    private def isAlpha(c: Char): Boolean = c >= 'a' && c <= 'z'

    private def isCons(i: Int): Boolean = {
      val c = word.charAt(i)
      if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') false
      else if (c != 'y' || i == 0) true
      else !isCons(i - 1)
    }
    private def isVowel(i: Int): Boolean = !isCons(i)

    private def penultChar: Char = word.charAt(k - 1)

    private def stemLength: Int = j + 1

    private def endsIn(s: String): Boolean = {
      val sl = s.length
      if (sl > k) return false
      val r = word.length - sl
      j = k // reset on entry — observable when no later branch sets j
      var i = 0
      var r2 = r
      while (i < sl) {
        if (s.charAt(i) != word.charAt(r2)) return false
        i += 1
        r2 += 1
      }
      j = r - 1
      true
    }
    private def endsIn(a: Char, b: Char): Boolean = {
      if (2 > k) return false
      if (word.charAt(k - 1) == a && word.charAt(k) == b) { j = k - 2; true }
      else false
    }
    private def endsIn(a: Char, b: Char, c: Char): Boolean = {
      if (3 > k) return false
      if (word.charAt(k - 2) == a && word.charAt(k - 1) == b &&
          word.charAt(k) == c) { j = k - 3; true }
      else false
    }
    private def endsIn(a: Char, b: Char, c: Char, d: Char): Boolean = {
      if (4 > k) return false
      if (word.charAt(k - 3) == a && word.charAt(k - 2) == b &&
          word.charAt(k - 1) == c && word.charAt(k) == d) { j = k - 4; true }
      else false
    }

    /** Probe the dictionary; caches only NON-exception entries (exception
      * words are valid only as whole-word matches at stem() entry). */
    private def wordInDict(): DictEntry = {
      if (matchedEntry != null) return matchedEntry
      val e = dict.get(word.toString)
      if (e != null && !e.exception) matchedEntry = e
      e
    }

    /** Probe the dictionary; UNCONDITIONALLY overwrites the cached entry
      * (even with null / an exception entry) — this last-probe-wins state
      * is what `matched()` checks between suffix steps. */
    private def lookup(): Boolean = {
      matchedEntry = dict.get(word.toString)
      matchedEntry != null
    }

    private def matched: Boolean = matchedEntry != null

    private def setSuff(s: String, len: Int): Unit = {
      word.setLength(j + 1)
      var i = 0
      while (i < len) { word.append(s.charAt(i)); i += 1 }
      k = j + len
    }
    private def setSuffix(s: String): Unit = setSuff(s, s.length)

    private def doubleC(i: Int): Boolean =
      i >= 1 && word.charAt(i) == word.charAt(i - 1) && isCons(i)

    private def vowelInStem: Boolean = {
      var i = 0
      while (i < stemLength) {
        if (isVowel(i)) return true
        i += 1
      }
      false
    }

    // ------------------------------------------------ inflectional steps

    private def plural(): Unit = {
      if (word.charAt(k) != 's') return
      if (endsIn('i', 'e', 's')) {
        word.setLength(j + 3); k -= 1
        if (lookup()) return // "...ie" (calories → calorie)
        k += 1; word.append('s')
        setSuffix("y") // "...y" (policies → policy)
        lookup()
        return
      }
      if (endsIn('e', 's')) {
        word.setLength(j + 2); k -= 1
        val tryE = j > 0 && !(word.charAt(j) == 's' && word.charAt(j - 1) == 's')
        if (tryE && lookup()) return // "...e" (bases → base)
        word.setLength(j + 1); k -= 1
        if (lookup()) return // drop "es" (crosses → cross)
        word.append('e'); k += 1 // restore "...e"
        if (!tryE) lookup()
        return
      }
      if (word.length > 3 && penultChar != 's' && !endsIn('o', 'u', 's')) {
        word.setLength(k); k -= 1 // plain "s" drop
        lookup()
      }
    }

    private def pastTense(): Unit = {
      if (word.length <= 4) return
      if (endsIn('i', 'e', 'd')) {
        word.setLength(j + 3); k -= 1
        if (lookup()) return // "...ie" (died → die)
        k += 1; word.append('d')
        setSuffix("y") // "...y" (tried → try)
        lookup()
        return
      }
      if (endsIn('e', 'd') && vowelInStem) {
        word.setLength(j + 2); k = j + 1
        val e = wordInDict()
        if (e != null && !e.exception) return // "...e" (used → use)
        word.setLength(j + 1); k = j
        if (lookup()) return // drop "ed" (suited → suit)
        if (doubleC(k)) {
          word.setLength(k); k -= 1
          if (lookup()) return // undouble (hopped → hop)
          word.append(word.charAt(k)); k += 1 // restore double
          lookup()
          return
        }
        if (word.charAt(0) == 'u' && word.charAt(1) == 'n') {
          word.append('e'); word.append('d'); k += 2 // un- words restore "ed"
          return
        }
        word.setLength(j + 1); word.append('e'); k = j + 1 // default: stem+e
      }
    }

    private def aspect(): Unit = {
      if (word.length <= 5) return
      if (endsIn('i', 'n', 'g') && vowelInStem) {
        word.setCharAt(j + 1, 'e')
        word.setLength(j + 2); k = j + 1
        val e = wordInDict()
        if (e != null && !e.exception) return // "...e" (hoping → hope)
        word.setLength(k); k -= 1
        if (lookup()) return // bare stem
        if (doubleC(k)) {
          k -= 1; word.setLength(k + 1)
          if (lookup()) return // undouble (hopping → hop)
          word.append(word.charAt(k)); k += 1 // restore double
          lookup()
          return
        }
        if (j > 0 && isCons(j) && isCons(j - 1)) {
          k = j; word.setLength(k + 1) // consonant cluster: no trailing e
          return
        }
        word.setLength(j + 1); word.append('e'); k = j + 1 // default: stem+e
      }
    }

    // ------------------------------------------------ derivational steps

    private def ityEndings(): Unit = {
      val oldK = k
      if (endsIn('i', 't', 'y')) {
        word.setLength(j + 1); k = j // drop "ity"
        if (lookup()) return
        word.append('e'); k = j + 1 // "...e" (sanity → sane)
        if (lookup()) return
        word.setCharAt(j + 1, 'i'); word.append("ty"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'l') {
          word.setLength(j - 1); word.append("le"); k = j // ility → le
          lookup()
          return
        }
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'v') {
          word.setLength(j + 1); word.append('e'); k = j + 1 // ivity → ive
          lookup()
          return
        }
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'l') {
          word.setLength(j + 1); k = j // ality → al
          lookup()
          return
        }
        if (lookup()) return // restored word itself
        word.setLength(j + 1); k = j // default: remove "ity" unvalidated
      }
    }

    private def nceEndings(): Unit = {
      val oldK = k
      if (endsIn('n', 'c', 'e')) {
        val c = word.charAt(j)
        if (!(c == 'e' || c == 'a')) return
        word.setLength(j); word.append('e'); k = j // "Xnce" → stem+e
        if (lookup()) return
        word.setLength(j); k = j - 1 // bare stem (difference → differ)
        if (lookup()) return
        word.append(c); word.append("nce"); k = oldK // restore
      }
    }

    private def nessEndings(): Unit = {
      if (endsIn('n', 'e', 's', 's')) {
        word.setLength(j + 1); k = j // always removed
        if (word.charAt(j) == 'i') word.setCharAt(j, 'y') // happiness → happy
        lookup()
      }
    }

    private def ismEndings(): Unit = {
      if (endsIn('i', 's', 'm')) {
        word.setLength(j + 1); k = j // always removed
        lookup()
      }
    }

    private def mentEndings(): Unit = {
      val oldK = k
      if (endsIn('m', 'e', 'n', 't')) {
        word.setLength(j + 1); k = j
        if (lookup()) return
        word.append("ment"); k = oldK // restore
      }
    }

    private def izeEndings(): Unit = {
      val oldK = k
      if (endsIn('i', 'z', 'e')) {
        word.setLength(j + 1); k = j // drop "ize"
        if (lookup()) return
        word.append('i')
        if (doubleC(j)) {
          word.setLength(j); k = j - 1
          if (lookup()) return // undoubled stem
          word.append(word.charAt(j - 1)) // restore double (drops the i)
        }
        word.setLength(j + 1); word.append('e'); k = j + 1 // stem+e
        if (lookup()) return
        word.setLength(j + 1); word.append("ize"); k = oldK // restore
      }
    }

    private def ncyEndings(): Unit = {
      if (endsIn('n', 'c', 'y')) {
        if (!(word.charAt(j) == 'e' || word.charAt(j) == 'a')) return
        word.setCharAt(j + 2, 't'); word.setLength(j + 3); k = j + 2 // ncy → nt
        if (lookup()) return
        word.setCharAt(j + 2, 'c'); word.append('e'); k = j + 3 // ncy → nce
        lookup()
      }
    }

    private def bleEndings(): Unit = {
      val oldK = k
      if (endsIn('b', 'l', 'e')) {
        if (!(word.charAt(j) == 'a' || word.charAt(j) == 'i')) return
        val c = word.charAt(j)
        word.setLength(j); k = j - 1 // drop "Xble"
        if (lookup()) return
        if (doubleC(k)) {
          word.setLength(k); k -= 1
          if (lookup()) return // undouble
          k += 1; word.append(word.charAt(k - 1)) // restore double
        }
        word.setLength(j); word.append('e'); k = j // stem+e (curable → cure)
        if (lookup()) return
        word.setLength(j); word.append("ate"); k = j + 2 // Xble → ate
        if (lookup()) return
        word.setLength(j); word.append(c); word.append("ble"); k = oldK // restore
      }
    }

    private def icEndings(): Unit = {
      if (endsIn('i', 'c')) {
        word.setLength(j + 3); word.append("al"); k = j + 4 // ic → ical
        if (lookup()) return
        word.setCharAt(j + 1, 'y'); word.setLength(j + 2); k = j + 1 // ic → y
        if (lookup()) return
        word.setCharAt(j + 1, 'e') // ic → e
        if (lookup()) return
        word.setLength(j + 1); k = j // drop "ic"
        if (lookup()) return
        word.append("ic"); k = j + 2 // restore unvalidated
      }
    }

    private def ionEndings(): Unit = {
      val oldK = k
      if (!endsIn('i', 'o', 'n')) return
      if (endsIn("ization")) {
        word.setLength(j + 3); word.append('e'); k = j + 3 // ization → ize
        lookup()
        return
      }
      if (endsIn("ition")) {
        word.setLength(j + 1); word.append('e'); k = j + 1 // ition → e
        if (lookup()) return
        word.setLength(j + 1); word.append("ition"); k = oldK // restore
        // falls through to the "ication" probe, like the original
      } else if (endsIn("ation")) {
        word.setLength(j + 3); word.append('e'); k = j + 3 // ation → ate
        if (lookup()) return
        word.setLength(j + 1); word.append('e'); k = j + 1 // ation → e
        if (lookup()) return
        word.setLength(j + 1); k = j // drop "ation"
        if (lookup()) return
        word.setLength(j + 1); word.append("ation"); k = oldK // restore
      }
      if (endsIn("ication")) {
        word.setLength(j + 1); word.append('y'); k = j + 1 // ication → y
        if (lookup()) return
        word.setLength(j + 1); word.append("ication"); k = oldK // restore
      }
      // plain "ion"
      j = k - 3
      word.setLength(j + 1); word.append('e'); k = j + 1 // ion → e
      if (lookup()) return
      word.setLength(j + 1); k = j // drop "ion"
      if (lookup()) return
      word.setLength(j + 1); word.append("ion"); k = oldK // restore
    }

    private def erAndOrEndings(): Unit = {
      val oldK = k
      if (word.charAt(k) != 'r') return
      if (endsIn('i', 'z', 'e', 'r')) {
        word.setLength(j + 4); k = j + 3 // izer → ize
        lookup()
        return
      }
      if (endsIn('e', 'r') || endsIn('o', 'r')) {
        val c = word.charAt(j + 1)
        if (doubleC(j)) {
          word.setLength(j); k = j - 1
          if (lookup()) return // runner → run
          word.append(word.charAt(j - 1)) // restore double (k stays stale)
        }
        if (word.charAt(j) == 'i') {
          word.setCharAt(j, 'y'); word.setLength(j + 1); k = j
          if (lookup()) return // carrier → carry
          word.setCharAt(j, 'i'); word.append('e') // restore as "...ie"
        }
        if (word.charAt(j) == 'e') {
          word.setLength(j); k = j - 1
          if (lookup()) return
          word.append('e') // restore
        }
        word.setLength(j + 2); k = j + 1 // keep suffix vowel (writer → write)
        if (lookup()) return
        word.setLength(j + 1); k = j // bare stem (hacker → hack)
        if (lookup()) return
        word.append('e'); k = j + 1 // stem+e
        if (lookup()) return
        word.setLength(j + 1); word.append(c); word.append('r'); k = oldK // restore
      }
    }

    private def lyEndings(): Unit = {
      val oldK = k
      if (endsIn('l', 'y')) {
        word.setCharAt(j + 2, 'e') // ly → le (doubly → double)
        if (lookup()) return
        word.setCharAt(j + 2, 'y')
        word.setLength(j + 1); k = j // drop "ly"
        if (lookup()) return
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'l')
          return // "...ally" keeps unvalidated stem (finally → final)
        word.append("ly"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'b') {
          word.setCharAt(j + 2, 'e'); k = j + 2 // ably → able
          return
        }
        if (word.charAt(j) == 'i') {
          word.setLength(j); word.append('y'); k = j // ily → y (happily → happy)
          if (lookup()) return
          word.setLength(j); word.append("ily"); k = oldK // restore
        }
        word.setLength(j + 1); k = j // default: remove "ly" unvalidated
      }
    }

    private def alEndings(): Unit = {
      val oldK = k
      if (word.length < 4) return
      if (endsIn('a', 'l')) {
        word.setLength(j + 1); k = j // drop "al"
        if (lookup()) return
        if (doubleC(j)) {
          word.setLength(j); k = j - 1
          if (lookup()) return // undouble
          word.append(word.charAt(j - 1)) // restore double
        }
        word.setLength(j + 1); word.append('e'); k = j + 1 // stem+e (arrival → arrive)
        if (lookup()) return
        word.setLength(j + 1); word.append("um"); k = j + 2 // al → um (minimal → minimum)
        if (lookup()) return
        word.setLength(j + 1); word.append("al"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'c') {
          word.setLength(j - 1); k = j - 2 // drop "ical"
          if (lookup()) return
          word.setLength(j - 1); word.append('y'); k = j - 1 // ical → y
          if (lookup()) return
          word.setLength(j - 1); word.append("ic"); k = j // ical → ic
          lookup()
          return
        }
        if (word.charAt(j) == 'i') {
          word.setLength(j); k = j - 1 // drop "ial"
          if (lookup()) return
          word.append("ial"); k = oldK // restore
          lookup()
        }
      }
    }

    /** Stem one token. Returns the stem, or the input itself when the word
      * is too short/long, non-alphabetic, or a dictionary headword. */
    def run(term: String): String = {
      k = term.length - 1
      if (k <= 1 || k >= MaxWordLen - 1) return term
      val entry0 = dict.get(term)
      if (entry0 != null) {
        if (entry0.root != null) return entry0.root
        return term
      }
      word.reset(term.length + 10)
      var i = 0
      while (i < term.length) {
        val c = term.charAt(i)
        if (!isAlpha(c)) return term
        word.append(c)
        i += 1
      }
      matchedEntry = null
      var done = false
      plural(); done = matched
      if (!done) { pastTense(); done = matched }
      if (!done) { aspect(); done = matched }
      if (!done) { ityEndings(); done = matched }
      if (!done) { nessEndings(); done = matched }
      if (!done) { ionEndings(); done = matched }
      if (!done) { erAndOrEndings(); done = matched }
      if (!done) { lyEndings(); done = matched }
      if (!done) { alEndings(); done = matched }
      if (!done) {
        wordInDict() // side effect only: may cache the current word's entry
        iveEndings(); done = matched
        if (!done) { izeEndings(); done = matched }
        if (!done) { mentEndings(); done = matched }
        if (!done) { bleEndings(); done = matched }
        if (!done) { ismEndings(); done = matched }
        if (!done) { icEndings(); done = matched }
        if (!done) { ncyEndings(); done = matched }
        if (!done) nceEndings()
      }
      val e = matchedEntry
      if (e != null && e.root != null) e.root
      else word.toString
    }

    private def iveEndings(): Unit = {
      val oldK = k
      if (endsIn('i', 'v', 'e')) {
        word.setLength(j + 1); k = j // drop "ive"
        if (lookup()) return
        word.append('e'); k = j + 1 // stem+e
        if (lookup()) return
        word.setLength(j + 1); word.append("ive") // restore (k stays stale)
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 't') {
          word.setCharAt(j - 1, 'e'); word.setLength(j); k = j - 1 // ative → e-stem
          if (lookup()) return
          word.setLength(j - 1) // drop that e too
          if (lookup()) return
          word.append("ative"); k = oldK // restore
        }
        word.setCharAt(j + 2, 'o'); word.setCharAt(j + 3, 'n') // ive → ion
        if (lookup()) return
        word.setCharAt(j + 2, 'v'); word.setCharAt(j + 3, 'e'); k = oldK // restore
      }
    }
  }

  private val local = new ThreadLocal[Kst] {
    override def initialValue(): Kst = new Kst
  }

  /** Stem one lowercase token (thread-safe). */
  def stem(word: String): String = local.get().run(word)
}
