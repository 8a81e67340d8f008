package graft.linkage.crypto

/** HKDF-SHA256 (RFC 5869) — extract-then-expand key derivation, the KDF
  * clkhash uses to turn one linkage secret into independent 64-byte keys
  * per PII field (clkhash key_derivation; reference garble.py feeds the
  * site secret to anonlink which does exactly this). Built on the JDK's
  * HmacSHA256; verified against RFC 5869 appendix-A test cases 1 and 3
  * in CryptoSpec.
  */
object Hkdf {

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    // HMAC with an empty key is legal in the RFC; SecretKeySpec refuses
    // zero-length material, so pad to one zero byte (same MAC result —
    // HMAC right-pads the key with zeros to the block size anyway)
    val k = if (key.isEmpty) new Array[Byte](1) else key
    mac.init(new javax.crypto.spec.SecretKeySpec(k, "HmacSHA256"))
    mac.doFinal(data)
  }

  /** RFC 5869 §2.2: PRK = HMAC-Hash(salt, IKM); empty salt → 32 zero bytes. */
  def extract(salt: Array[Byte], ikm: Array[Byte]): Array[Byte] =
    hmac(if (salt.isEmpty) new Array[Byte](32) else salt, ikm)

  /** RFC 5869 §2.3: OKM = first `len` bytes of T(1) ‖ T(2) ‖ …,
    * T(i) = HMAC(PRK, T(i-1) ‖ info ‖ i). */
  def expand(prk: Array[Byte], info: Array[Byte], len: Int): Array[Byte] = {
    require(len <= 255 * 32, s"HKDF-SHA256 output capped at 8160 bytes: $len")
    val out = new Array[Byte](len)
    var t = Array.emptyByteArray
    var filled = 0
    var i = 1
    while (filled < len) {
      t = hmac(prk, t ++ info ++ Array(i.toByte))
      val n = math.min(32, len - filled)
      System.arraycopy(t, 0, out, filled, n)
      filled += n
      i += 1
    }
    out
  }

  def derive(ikm: Array[Byte], salt: Array[Byte], info: Array[Byte],
             len: Int): Array[Byte] =
    expand(extract(salt, ikm), info, len)
}
