package graft.functions

/** Static text-analysis kernels for large-scale training-data pipelines:
  * MinHash signatures, SimHash, language-ID, document fingerprints.
  *
  * All functions are pure and allocation-light; they are invoked per-row
  * from codegen'd Catalyst expressions (see
  * org.apache.spark.sql.graft.TextExpressions), so Spark parallelizes
  * across partitions and the whole stage stays in WholeStageCodegen.
  */
object TextKernels {

  // ---- hashing ----------------------------------------------------------

  /** FNV-1a 64-bit over UTF-16 chars of a substring [from, until). */
  def fnv1a64(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h ^= (c & 0xff); h *= 0x100000001b3L
      h ^= (c >>> 8); h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SplitMix64 — used to derive per-hash-function mixers deterministically. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Karp-Rabin-style document fingerprint: FNV-1a over the text with
    * whitespace runs collapsed to one space (normalization only — no
    * semantic processing). */
  def fingerprint64(text: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    var lastSpace = false
    while (i < text.length) {
      val c0 = text.charAt(i)
      val isSpace = Character.isWhitespace(c0)
      if (!(isSpace && lastSpace)) {
        val c = if (isSpace) ' ' else Character.toLowerCase(c0)
        h ^= (c & 0xff); h *= 0x100000001b3L
        h ^= (c >>> 8); h *= 0x100000001b3L
      }
      lastSpace = isSpace
      i += 1
    }
    h
  }

  // ---- tokenization -----------------------------------------------------

  /** Whitespace tokens; no allocation for the common single-space case
    * beyond the result array. */
  def tokens(text: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) out += text.substring(start, i)
    }
    out.toArray
  }

  /** Hashes of 3-word shingles (the MinHash/SimHash input universe).
    * Documents shorter than the shingle width fall back to one
    * whole-document shingle. */
  def shingleHashes(text: String, width: Int): Array[Long] = {
    val ts = tokens(text)
    if (ts.length < width) return Array(fnv1a64(text, 0, text.length))
    val out = new Array[Long](ts.length - width + 1)
    var i = 0
    while (i < out.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < width) {
        val t = ts(i + j)
        var k = 0
        while (k < t.length) {
          val c = t.charAt(k)
          h ^= (c & 0xff); h *= 0x100000001b3L
          h ^= (c >>> 8); h *= 0x100000001b3L
          k += 1
        }
        h ^= ' '; h *= 0x100000001b3L
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  // ---- MinHash ----------------------------------------------------------

  /** MinHash signature: `numHashes` hash functions derived from TWO
    * SplitMix64 mixes per shingle via h_i(x) = a(x) + i·b(x) (b forced
    * odd) — Kirsch–Mitzenmacher composition, which preserves the per-band
    * collision-probability ≈ Jaccard property while doing O(shingles)
    * strong mixes instead of O(numHashes · shingles). The unsigned-min per
    * function is kept over the document's 3-word shingle hashes.
    * Deterministic across JVMs (no Random). */
  def minhashSig(text: String, numHashes: Int): Array[Long] = {
    val shingles = shingleHashes(text, 3)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, -1L) // unsigned max
    var j = 0
    while (j < shingles.length) {
      val s = shingles(j)
      val a = splitmix64(s ^ 0x5eed0001L)
      val b = splitmix64(s ^ 0x5eed0002L) | 1L // odd → i·b never collapses
      var h = a
      var i = 0
      while (i < numHashes) {
        if (java.lang.Long.compareUnsigned(h, sig(i)) < 0) sig(i) = h
        h += b
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 64-bit SimHash over 3-word shingle hashes (+1/-1 bit voting). */
  def simhash64(text: String): Long = {
    val shingles = shingleHashes(text, 3)
    val counts = new Array[Int](64)
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- language ID ------------------------------------------------------

  private val langStopwords: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Set("el", "los", "las", "y", "es", "un", "una", "en", "que", "por"),
  )

  /** Heuristic language ID: CJK codepoint presence → zh; otherwise the
    * language whose stopword set matches the most tokens; 'und' when
    * nothing matches (n-gram heuristic per the pipeline spec — intended
    * for real prose, not a trained model). */
  /** Single-pass script census: CODEPOINT counts of Latin, Cyrillic,
    * Han, Arabic script characters and ASCII digits, in one loop.
    * Exactly replicates the five-regex formulation it replaced —
    * Spark's `length(regexp_replace(t, "[^\p{IsX}]", ""))` counts the
    * KEPT CODEPOINTS (UTF8String length is codepoints, so a
    * supplementary Han character counts 1), and Java's `\p{IsX}`
    * script classes are `Character.UnicodeScript` membership — while
    * scanning the string once instead of five times. */
  def scriptCounts(text: String): Array[Int] = {
    val out = new Array[Int](5)
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      if (cp >= '0' && cp <= '9') out(4) += 1
      else {
        val s = Character.UnicodeScript.of(cp)
        if (s eq Character.UnicodeScript.LATIN) out(0) += 1
        else if (s eq Character.UnicodeScript.CYRILLIC) out(1) += 1
        else if (s eq Character.UnicodeScript.HAN) out(2) += 1
        else if (s eq Character.UnicodeScript.ARABIC) out(3) += 1
      }
      i += Character.charCount(cp)
    }
    out
  }

  def langId(text: String): String = {
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return "zh"
      i += 1
    }
    val ts = tokens(text)
    var best = "und"
    var bestScore = 0
    var l = 0
    while (l < langStopwords.length) {
      val (lang, words) = langStopwords(l)
      var score = 0
      var j = 0
      while (j < ts.length) {
        if (words.contains(ts(j).toLowerCase)) score += 1
        j += 1
      }
      if (score > bestScore) { best = lang; bestScore = score }
      l += 1
    }
    best
  }

  /** Unicode normalization for corpus cleanup — mojibake, decomposed
    * accents, and compatibility ligatures are classic near-dup and
    * tokenizer poison. Modes:
    *  - "nfc"           canonical composition (DuckDB `nfc_normalize`)
    *  - "nfkc"          compatibility composition (ﬁ→fi, ²→2; no
    *                    vanilla-DuckDB twin — spec-covered only)
    *  - "strip_accents" NFD, drop combining marks (Unicode category
    *                    Mn), recompose — DuckDB `strip_accents`
    *                    semantics ('é'→'e', composed or not)
    * Unknown modes throw (a silently-identity normalizer is how wrong
    * pipelines ship). */
  def normalizeText(s: String, mode: String): String = {
    import java.text.Normalizer
    mode match {
      case "nfc" => Normalizer.normalize(s, Normalizer.Form.NFC)
      case "nfkc" => Normalizer.normalize(s, Normalizer.Form.NFKC)
      case "strip_accents" =>
        val d = Normalizer.normalize(s, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(d.length)
        var i = 0
        while (i < d.length) {
          val c = d.charAt(i)
          if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
          i += 1
        }
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      case other => throw new IllegalArgumentException(
        s"text_normalize: unknown mode '$other' (nfc | nfkc | strip_accents)")
    }
  }

  /** DEFLATE-compressed byte length of the text's UTF-8 encoding — the
    * classic compressibility quality signal (repetitive/template text
    * compresses far better than natural prose, which compresses better
    * than noise). Deterministic for a (text, level) pair within a JVM;
    * the absolute count is zlib-implementation-specific, so contracts
    * gate ORDERINGS and bounds, never exact compressed sizes. Level
    * outside [0, 9] throws (Deflater would too, later and worse). */
  def deflateLen(s: String, level: Int): Long = {
    require(level >= 0 && level <= 9,
      s"deflate_len: level must be in [0, 9] (got $level)")
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  // ---- record-linkage similarity ---------------------------------------

  /** Jaro similarity over UTF-8 BYTES — deliberately byte-level, not
    * code-point-level, because that is what the DuckDB oracle's
    * `jaro_similarity` computes (probed 2026-08-14: 'héllo' vs 'hello'
    * scores 0.8222 = the 6-byte-vs-5-byte answer, not the 5-vs-5
    * code-point answer 0.8667). Semantics pinned by probe:
    * empty-on-either-side → 0.0; match window = max(la,lb)/2 - 1
    * clamped to ≥ 0 ('ab' vs 'ba' → 0.0, 'a' vs 'a' → 1.0);
    * transpositions = (order mismatches among matched bytes) / 2 with
    * INTEGER halving ('abcxyz' vs 'bcaxyz' → 0.944..., the t=1 value,
    * not the t=1.5 value 0.9167); final sum evaluated left-to-right as
    * (m/la + m/lb + (m-t)/m) / 3 so the double is bit-identical to the
    * oracle's (JaroWinklerFuzzSpec checks 0 ulp drift over 60k pairs). */
  def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val bUsed = new Array[Boolean](lb)
    val aMatch = new Array[Byte](math.min(la, lb))
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + win)
      var j = math.max(0, i - win)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!bUsed(j) && b(j) == a(i)) {
          bUsed(j) = true; aMatch(m) = a(i); m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mism = 0; var k = 0; var j = 0
    while (k < m) {
      while (!bUsed(j)) j += 1
      if (aMatch(k) != b(j)) mism += 1
      j += 1; k += 1
    }
    val t = mism / 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** TRUE Damerau–Levenshtein over UTF-8 bytes — unrestricted edits,
    * not the OSA restriction: DuckDB's probe 'ca' → 'abc' = 2 (delete
    * then transpose through the edit), a value OSA (= 3) cannot
    * produce, so this is the classic da[]-table DP (Wikipedia's
    * "distance with adjacent transpositions", alphabet = 256 byte
    * values). Byte-level like [[jaroBytes]] ('héllo' vs 'hello' = 2).
    * O(la·lb) time and space; intended for short keys (names, titles)
    * on blocked candidate pairs, not document bodies. */
  def damerauLevenshteinBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val best = math.min(
          math.min(d(i)(j) + cost,                       // substitute/match
            d(i + 1)(j) + 1),                            // insert
          math.min(d(i)(j + 1) + 1,                      // delete
            d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))    // transpose span
        d(i + 1)(j + 1) = best
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  /** Byte-SET Jaccard similarity — |bytes(a) ∩ bytes(b)| / |∪|, sets
    * not multisets (DuckDB probe: 'aab' vs 'ab' = 1.0), byte-level
    * ('héllo' vs 'hello' = 0.5). DuckDB's `jaccard` rejects empty
    * inputs ("argument too short"); mirrored here so the contract is
    * identical. */
  def jaccardBytes(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length > 0 && b.length > 0, "jaccard_ch: empty input")
    val sa = new Array[Boolean](256); val sb = new Array[Boolean](256)
    var i = 0
    while (i < a.length) { sa(a(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < b.length) { sb(b(i) & 0xff) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (sa(i) && sb(i)) inter += 1
      if (sa(i) || sb(i)) union += 1
      i += 1
    }
    inter.toDouble / union.toDouble
  }

  /** Byte Hamming distance; throws on unequal lengths exactly like
    * DuckDB's `hamming` ("Strings must be of equal length"). */
  def hammingBytes(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length,
      s"hamming_str: strings must be of equal length (${a.length} vs ${b.length})")
    var n = 0; var i = 0
    while (i < a.length) { if (a(i) != b(i)) n += 1; i += 1 }
    n
  }

  /** Jaro–Winkler over UTF-8 bytes, matching DuckDB's
    * `jaro_winkler_similarity` exactly: prefix boost applied only when
    * jaro > 0.7 (probed: jaro 0.6667 with a 4-byte common prefix stays
    * 0.6667), common-prefix length capped at 4 bytes, scale 0.1, boost
    * evaluated as j + l·0.1·(1-j) left-to-right. */
  def jaroWinklerBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaroBytes(a, b)
    if (j > 0.7) {
      val cap = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < cap && a(l) == b(l)) l += 1
      j + l.toDouble * 0.1 * (1.0 - j)
    } else j
  }
}
