package graft.text

import graft.sketches.Hashing

/**
 * Deterministic text-analysis kernel for training-data pipelines: token
 * counting, quality scoring, language identification, fingerprinting,
 * shingling, MinHash signatures and SimHash. Pure functions — safe inside
 * Spark UDFs/expressions, no per-call allocation beyond outputs.
 */
object TextFunctions {

  /** Whitespace-token count (matches `len(regexp_split_to_array(trim(s), '\s+'))`). */
  def tokenCount(s: String): Int = {
    if (s == null) return 0
    var count = 0
    var inToken = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inToken) { count += 1; inToken = true }
      else if (ws) inToken = false
      i += 1
    }
    count
  }

  /** BPE-ish subword token count: runs of word chars count ceil(len/4) tokens
   * (approximating ~4 chars/token), each punctuation char is one token. */
  def bpeishTokenCount(s: String): Int = {
    if (s == null) return 0
    var count = 0
    var runLen = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isWord = Character.isLetterOrDigit(c) || c == '_'
      if (isWord) runLen += 1
      else {
        if (runLen > 0) { count += (runLen + 3) / 4; runLen = 0 }
        if (!Character.isWhitespace(c)) count += 1
      }
      i += 1
    }
    if (runLen > 0) count += (runLen + 3) / 4
    count
  }

  private val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "as", "with", "was", "at", "by", "this", "be", "are")

  /** Integer quality components (exact, SQL-crosscheckable individually). */
  final case class QualityStats(
      chars: Int,
      tokens: Int,
      stopwords: Int,
      punct: Int,
      digits: Int,
      maxWordLen: Int)

  def qualityStats(s: String): QualityStats = {
    if (s == null) return QualityStats(0, 0, 0, 0, 0, 0)
    var tokens = 0
    var stop = 0
    var punct = 0
    var digits = 0
    var maxWord = 0
    val word = new java.lang.StringBuilder(32)
    def flush(): Unit = {
      if (word.length() > 0) {
        tokens += 1
        if (word.length() > maxWord) maxWord = word.length()
        if (Stopwords.contains(word.toString.toLowerCase)) stop += 1
        word.setLength(0)
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) flush()
      else {
        word.append(c)
        if (Character.isDigit(c)) digits += 1
        else if (!Character.isLetterOrDigit(c)) punct += 1
      }
      i += 1
    }
    flush()
    QualityStats(s.length, tokens, stop, punct, digits, maxWord)
  }

  /**
   * Heuristic document quality score in [0,1]: length in a healthy band,
   * moderate stopword density (real prose has some), low punctuation/digit
   * noise, no degenerate mega-words.
   */
  def qualityScore(s: String): Double = {
    val q = qualityStats(s)
    if (q.tokens == 0) return 0.0
    val lenScore = {
      val chars = q.chars.toDouble
      if (chars < 20) chars / 20.0
      else if (chars > 50000) math.max(0.0, 1 - (chars - 50000) / 50000.0)
      else 1.0
    }
    val stopRatio = q.stopwords.toDouble / q.tokens
    val stopScore = math.min(1.0, stopRatio / 0.1) // saturates at 10% stopwords
    val punctScore = math.max(0.0, 1.0 - 4.0 * q.punct.toDouble / math.max(1, q.chars))
    val digitScore = math.max(0.0, 1.0 - 2.0 * q.digits.toDouble / math.max(1, q.chars))
    val wordScore = if (q.maxWordLen > 40) 0.5 else 1.0
    lenScore * (0.4 + 0.6 * stopScore) * punctScore * digitScore * wordScore
  }

  // --------------------------------------------------------------------
  // language identification: stopword + character-profile heuristic
  // --------------------------------------------------------------------

  private val LangStopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "den", "von", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour", "pas", "vous"),
    "es" -> Set("el", "la", "los", "las", "es", "una", "que", "por", "para", "con", "del", "se"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "una", "per", "sono", "non", "con", "del"))

  /**
   * Identify language by stopword hits plus script detection (CJK/Cyrillic
   * ranges short-circuit). Returns ISO code or "und" when no evidence.
   */
  def langId(s: String): String = {
    if (s == null || s.isEmpty) return "und"
    // script detection first
    var cjk = 0
    var cyrillic = 0
    var letters = 0
    var i = 0
    val scanLimit = math.min(s.length, 2000)
    while (i < scanLimit) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          block == Character.UnicodeBlock.HIRAGANA ||
          block == Character.UnicodeBlock.KATAKANA) cjk += 1
        else if (block == Character.UnicodeBlock.CYRILLIC) cyrillic += 1
      }
      i += 1
    }
    if (letters == 0) return "und"
    if (cjk * 2 > letters) return "zh"
    if (cyrillic * 2 > letters) return "ru"
    // stopword voting on lowercase tokens
    val tokens = s.toLowerCase.split("\\s+").iterator.take(500)
    val scores = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var any = false
    tokens.foreach { t =>
      val w = t.filter(Character.isLetter)
      if (w.nonEmpty) {
        LangStopwords.foreach { case (lang, words) =>
          if (words.contains(w)) { scores(lang) += 1; any = true }
        }
      }
    }
    if (!any) "und"
    else scores.maxBy(kv => (kv._2, kv._1))._1
  }

  // --------------------------------------------------------------------
  // fingerprinting / near-duplicate signatures
  // --------------------------------------------------------------------

  /** Canonical 64-bit content fingerprint: lowercase, whitespace-collapsed. */
  def fingerprint64(s: String): Long = {
    if (s == null) return 0L
    val sb = new java.lang.StringBuilder(s.length)
    var lastWs = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!lastWs) sb.append(' ')
        lastWs = true
      } else {
        sb.append(Character.toLowerCase(c))
        lastWs = false
      }
      i += 1
    }
    while (sb.length() > 0 && sb.charAt(sb.length() - 1) == ' ') sb.setLength(sb.length() - 1)
    Hashing.hashString(sb.toString)
  }

  /** Hashes of the word k-shingles of the text (the MinHash item set). */
  def shingleHashes(s: String, k: Int = 3): Array[Long] = {
    if (s == null) return Array.empty
    val tokens = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < k) {
      if (tokens.isEmpty) Array.empty
      else Array(Hashing.hashString(tokens.mkString(" ")))
    } else {
      val set = new java.util.HashSet[Long]()
      var i = 0
      while (i + k <= tokens.length) {
        var h = 0L
        var j = 0
        while (j < k) {
          h = h * 0x100000001b3L ^ Hashing.hashString(tokens(i + j))
          j += 1
        }
        set.add(h)
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      out
    }
  }

  /**
   * MinHash signature over word shingles: element g of the signature is
   * min over shingles of hash(shingle, seed=g). P[sig_a(g) == sig_b(g)]
   * equals the Jaccard similarity of the shingle sets (Broder 1997).
   */
  def minhashSignature(s: String, numHashes: Int = 64, k: Int = 3): Array[Long] = {
    val shingles = shingleHashes(s, k)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      var g = 0
      while (g < numHashes) {
        val h = Hashing.hashLong(shingles(i), seed = g.toLong)
        if (h < sig(g)) sig(g) = h
        g += 1
      }
      i += 1
    }
    sig
  }

  /** Exact Jaccard similarity of the two texts' shingle sets. */
  def shingleJaccard(a: String, b: String, k: Int = 3): Double = {
    val sa = shingleHashes(a, k)
    val sb = shingleHashes(b, k)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val setA = sa.toSet
    var inter = 0
    sb.foreach(h => if (setA.contains(h)) inter += 1)
    inter.toDouble / (sa.length + sb.length - inter)
  }

  /** 64-bit SimHash over word-token hashes (Charikar 2002). */
  def simhash64(s: String): Long = {
    if (s == null) return 0L
    val counts = new Array[Int](64)
    s.toLowerCase.split("\\s+").foreach { t =>
      if (t.nonEmpty) {
        val h = Hashing.hashString(t)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
