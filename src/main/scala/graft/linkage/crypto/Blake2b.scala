package graft.linkage.crypto

/** BLAKE2b (RFC 7693) — pure-Scala, supporting the full parameter block:
  * digest length 1–64, optional key (keyed MAC mode), 16-byte salt and
  * personalization. This is the hash the reference's garble stage uses
  * under anonlink/clkhash's "blakeHash" CLK strategy (garble.py:128–145;
  * clkhash bloomfilter blake_encode_ngrams), where each n-gram is hashed
  * with blake2b(data, key=field_key, salt=str(i)).
  *
  * Implemented from the RFC (IV/sigma/rotations per §2.6–2.7, 12 rounds,
  * keyed mode = key padded to one 128-byte block prepended); verified
  * against the RFC appendix-A "abc" vector in CryptoSpec. No JDK provider
  * ships BLAKE2 and the sandbox is offline, hence the from-spec build.
  */
object Blake2b {

  private val IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  @inline private def le64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** One compression of block m (128 bytes at off) into state h. */
  private def compress(h: Array[Long], m: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val v = new Array[Long](16)
    val w = new Array[Long](16)
    var i = 0
    while (i < 8) { v(i) = h(i); v(i + 8) = IV(i); i += 1 }
    v(12) ^= t // t1 (high word) is 0: inputs here are < 2^64 bytes
    if (last) v(14) = ~v(14)
    i = 0
    while (i < 16) { w(i) = le64(m, off + 8 * i); i += 1 }

    @inline def g(r: Int, gi: Int, a: Int, b: Int, c: Int, d: Int): Unit = {
      val x = w(SIGMA(r % 10)(2 * gi)); val y = w(SIGMA(r % 10)(2 * gi + 1))
      v(a) += v(b) + x; v(d) = rotr(v(d) ^ v(a), 32)
      v(c) += v(d); v(b) = rotr(v(b) ^ v(c), 24)
      v(a) += v(b) + y; v(d) = rotr(v(d) ^ v(a), 16)
      v(c) += v(d); v(b) = rotr(v(b) ^ v(c), 63)
    }
    var r = 0
    while (r < 12) {
      g(r, 0, 0, 4, 8, 12); g(r, 1, 1, 5, 9, 13)
      g(r, 2, 2, 6, 10, 14); g(r, 3, 3, 7, 11, 15)
      g(r, 4, 0, 5, 10, 15); g(r, 5, 1, 6, 11, 12)
      g(r, 6, 2, 7, 8, 13); g(r, 7, 3, 4, 9, 14)
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** blake2b(data, key, salt, personal) → digestLen bytes.
    * salt/personal are zero-padded to 16 bytes (hashlib semantics). */
  def hash(data: Array[Byte], digestLen: Int = 64,
           key: Array[Byte] = Array.emptyByteArray,
           salt: Array[Byte] = Array.emptyByteArray,
           personal: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(digestLen >= 1 && digestLen <= 64, s"digestLen $digestLen")
    require(key.length <= 64, "key up to 64 bytes")
    require(salt.length <= 16 && personal.length <= 16,
      "salt/personal up to 16 bytes")

    // 64-byte parameter block (RFC 7693 §2.8 / BLAKE2 spec table 2)
    val p = new Array[Byte](64)
    p(0) = digestLen.toByte
    p(1) = key.length.toByte
    p(2) = 1 // fanout (sequential mode)
    p(3) = 1 // depth
    System.arraycopy(salt, 0, p, 32, salt.length)
    System.arraycopy(personal, 0, p, 48, personal.length)

    val h = new Array[Long](8)
    var i = 0
    while (i < 8) { h(i) = IV(i) ^ le64(p, 8 * i); i += 1 }

    // keyed mode: the key, zero-padded to one block, precedes the data
    val keyBlock = if (key.isEmpty) Array.emptyByteArray else {
      val b = new Array[Byte](128); System.arraycopy(key, 0, b, 0, key.length); b
    }
    val msg = if (keyBlock.isEmpty) data else keyBlock ++ data
    val n = msg.length

    var t = 0L
    var off = 0
    // all blocks but the last
    while (n - off > 128) {
      t += 128
      compress(h, msg, off, t, last = false)
      off += 128
    }
    // final block, zero-padded (empty unkeyed input → one zero block, t=0)
    val fin = new Array[Byte](128)
    val rem = n - off
    if (rem > 0) System.arraycopy(msg, off, fin, 0, rem)
    t += rem
    compress(h, fin, 0, t, last = true)

    val out = new Array[Byte](digestLen)
    i = 0
    while (i < digestLen) {
      out(i) = ((h(i >> 3) >>> (8 * (i & 7))) & 0xff).toByte
      i += 1
    }
    out
  }
}
