package graft.linkage.expr

import java.text.Normalizer

/** String-similarity / normalization kernels, written as static methods so
  * both interpreted `nullSafeEval` and whole-stage-codegen paths of the
  * Catalyst expressions in [[Expressions]] call the same code.
  *
  * Semantics are pinned to the reference's python `textdistance` library
  * (used via recordlinkage at /root/reference/households/matching.py:480–491
  * and directly at matching.py:110–247):
  *
  *  - jaroWinkler: Winkler prefix bonus (weight 0.1, prefix capped at 4) is
  *    applied ONLY when the plain Jaro score exceeds 0.7 — verified against
  *    the calibration exemplars at matching.py:25–31 ("205 GARDEN ST APT 5F"
  *    vs "…5J" → 0.9472 requires jaro("5F","5J")=2/3 to get NO bonus, while
  *    "…GARDEN STREET" vs "…GAREDN ST" → 0.9666 requires jw("STREET","ST")
  *    = 0.8222 i.e. bonus WITH no minimum-length rule).
  *  - jaroWinkler("", "") = 1, jaroWinkler("", x) = 0 (textdistance; the
  *    address comparator overrides the former to 0 — matching.py:71–77).
  *  - hammingSim: textdistance `hamming.normalized_similarity` with
  *    truncate=False: mismatches over zip_longest, normalized by max length;
  *    both-empty → 1 (matching.py:100–103).
  */
object Sim {

  // Reusable per-thread scratch for the Jaro match flags: the scoring
  // projection calls jaro millions of times per task; per-call array
  // allocation was measurable GC pressure at 32 executor threads.
  private val scratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }
  private def flags(n: Int): Array[Boolean] = {
    var a = scratch.get()
    if (a.length < n) { a = new Array[Boolean](n); scratch.set(a) }
    else java.util.Arrays.fill(a, 0, n, false)
    a
  }

  /** Jaro over raw UTF-8 bytes — valid when both operands are pure ASCII
    * (one byte = one char). All linkage fields are ASCII by construction
    * (NormalizeAscii), so this is the hot path; general strings fall back
    * to the char implementation. */
  private def jaroAsciiBytes(b1: Array[Byte], o1: Int, l1: Int,
                             b2: Array[Byte], o2: Int, l2: Int): Double = {
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m = flags(l1 + l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m(l1 + j) && b1(o1 + i) == b2(o2 + j)) {
          m(i) = true; m(l1 + j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var halfTrans = 0
    i = 0
    while (i < l1) {
      if (m(i)) {
        while (!m(l1 + k)) k += 1
        if (b1(o1 + i) != b2(o2 + k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    val t = halfTrans / 2
    (matches.toDouble / l1 + matches.toDouble / l2 +
      (matches - t).toDouble / matches) / 3.0
  }

  @inline private def isAscii(b: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off
    val end = off + len
    while (i < end) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** UTF8String entry point used by the Catalyst expressions: ASCII byte
    * fast path (no String/char[] materialization), char fallback. */
  def jaroWinklerUtf8(a: org.apache.spark.unsafe.types.UTF8String,
                      b: org.apache.spark.unsafe.types.UTF8String): Double = {
    val ab = a.getBytes; val bb = b.getBytes
    if (isAscii(ab, 0, ab.length) && isAscii(bb, 0, bb.length)) {
      val l1 = ab.length; val l2 = bb.length
      if (l1 == 0 && l2 == 0) return 1.0
      if (l1 == 0 || l2 == 0) return 0.0
      if (a.equals(b)) return 1.0
      val j = jaroAsciiBytes(ab, 0, l1, bb, 0, l2)
      if (j > 0.7) {
        val maxP = math.min(4, math.min(l1, l2))
        var p = 0
        while (p < maxP && ab(p) == bb(p)) p += 1
        if (p > 0) j + p * 0.1 * (1.0 - j) else j
      } else j
    } else jaroWinkler(a.toString, b.toString)
  }

  def hammingSimUtf8(a: org.apache.spark.unsafe.types.UTF8String,
                     b: org.apache.spark.unsafe.types.UTF8String): Double = {
    val ab = a.getBytes; val bb = b.getBytes
    if (isAscii(ab, 0, ab.length) && isAscii(bb, 0, bb.length)) {
      val l1 = ab.length; val l2 = bb.length
      val mx = math.max(l1, l2)
      if (mx == 0) return 1.0
      val mn = math.min(l1, l2)
      var d = mx - mn
      var i = 0
      while (i < mn) { if (ab(i) != bb(i)) d += 1; i += 1 }
      1.0 - d.toDouble / mx
    } else hammingSim(a.toString, b.toString)
  }

  /** NFKD-normalize, drop non-ASCII, trim, upper-case — exactly the
    * reference's `clean_string` (utils/data_reader.py:108–114:
    * `unicodedata.normalize("NFKD", s).encode("ascii","ignore").strip().upper()`).
    * Python bytes.strip() trims ASCII whitespace \t\n\v\f\r and space.
    */
  def normalizeAscii(s: String): String = {
    if (s == null) return null
    val n = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (c < 128) sb.append(Character.toUpperCase(c))
      i += 1
    }
    // trim ASCII whitespace (space, \t..\r) from both ends, like bytes.strip()
    var from = 0
    var to = sb.length
    while (from < to && isAsciiSpace(sb.charAt(from))) from += 1
    while (to > from && isAsciiSpace(sb.charAt(to - 1))) to -= 1
    sb.substring(from, to)
  }

  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** Digits-only projection of a string — reference `clean_phone`
    * (extract.py:87–90). */
  def digitsOnly(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Plain Jaro similarity (textdistance parity). */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m = flags(l1 + l2) // [0,l1) = s1 flags, [l1,l1+l2) = s2 flags
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m(l1 + j) && s1.charAt(i) == s2.charAt(j)) {
          m(i) = true; m(l1 + j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var k = 0
    var halfTrans = 0
    i = 0
    while (i < l1) {
      if (m(i)) {
        while (!m(l1 + k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    // textdistance parity: `trans_count //= 2` — integer FLOOR division
    // (an odd out-of-order count rounds down; verified against DuckDB's
    // implementation on e.g. "old anvil" vs "Brand#14" → t=1, not 1.5)
    val t = halfTrans / 2
    (matches.toDouble / l1 + matches.toDouble / l2 +
      (matches - t).toDouble / matches) / 3.0
  }

  /** Jaro-Winkler, textdistance parity: bonus iff jaro > 0.7, prefix ≤ 4,
    * weight 0.1. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      val maxP = math.min(4, math.min(s1.length, s2.length))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      if (p > 0) j + p * 0.1 * (1.0 - j) else j
    } else j
  }

  /** Normalized Hamming similarity, textdistance parity
    * (truncate=False: length difference counts as mismatches). */
  def hammingSim(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    val mx = math.max(l1, l2)
    if (mx == 0) return 1.0
    val mn = math.min(l1, l2)
    var d = mx - mn
    var i = 0
    while (i < mn) {
      if (s1.charAt(i) != s2.charAt(i)) d += 1
      i += 1
    }
    1.0 - d.toDouble / mx
  }

  private val metaphoneCodec = {
    val m = new org.apache.commons.codec.language.Metaphone
    m.setMaxCodeLen(8)
    m
  }

  /** Metaphone signature (p-sig blocking schema,
    * example-schema/blocking-schema/p-sig.json signatureSpecs[1]).
    * commons-codec Metaphone; non-alpha stripped first (codec requirement).
    */
  def metaphone(s: String): String = {
    if (s == null) return null
    val letters = s.filter(c => Character.isLetter(c))
    if (letters.isEmpty) "" else metaphoneCodec.metaphone(letters)
  }
}
