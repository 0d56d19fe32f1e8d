package graft.kernel

import java.nio.charset.StandardCharsets.UTF_8

/** Pure hashing kernel — bit-identical to the reference
  * (reference: internal/dedupe/dedupe.go:119-190). All 64-bit values live in
  * Scala `Long`; Go's `uint64` wrap-around multiply/xor are identical to
  * two's-complement `Long` ops, and Hamming distance is sign-agnostic.
  */
object Hashing {

  /** FNV-1a 64-bit offset basis (reference: internal/dedupe/dedupe.go:135),
    * as a wrapped Long (14695981039346656037 mod 2^64).
    */
  val FnvOffsetBasis64: Long = java.lang.Long.parseUnsignedLong("14695981039346656037")
  val FnvPrime64: Long = 1099511628211L

  /** FNV-1a 64-bit (reference: internal/dedupe/dedupe.go:140-147).
    * Empty input returns the offset basis.
    */
  def fnv1a64(data: Array[Byte]): Long = {
    var hash = FnvOffsetBasis64
    var i = 0
    while (i < data.length) {
      hash ^= (data(i) & 0xffL)
      hash *= FnvPrime64
      i += 1
    }
    hash
  }

  def fnv1a64(s: String): Long = fnv1a64(s.getBytes(UTF_8))

  /** Byte-level k-grams (reference: internal/dedupe/dedupe.go:120-131 — Go
    * string slicing is bytes, so `café` shingles across UTF-8 bytes). Returns
    * the raw byte windows; callers hash them directly.
    */
  def kgramBytes(text: String, k: Int): IndexedSeq[Array[Byte]] = {
    val b = text.getBytes(UTF_8)
    if (k <= 0 || b.length < k) IndexedSeq.empty
    else (0 to b.length - k).map(i => java.util.Arrays.copyOfRange(b, i, i + k))
  }

  /** String view of the k-grams for tests mirroring the reference's vectors
    * (reference: internal/dedupe/dedupe_test.go:104-156). Mid-rune windows
    * decode with replacement chars but hash over the same bytes.
    */
  def kgrams(text: String, k: Int): IndexedSeq[String] =
    kgramBytes(text, k).map(new String(_, UTF_8))

  /** Classic 64-bit SimHash over byte k-grams (reference:
    * internal/dedupe/dedupe.go:150-185): per k-gram h = fnv1a64; counter i
    * += (bit i of h ? +1 : -1); signature bit i set iff counter strictly > 0
    * (tie -> 0). Empty/too-short text or k<=0 -> 0.
    */
  def simhash64(text: String, k: Int): Long = {
    if (text.isEmpty || k <= 0) return 0L
    simhash64Bytes(text.getBytes(UTF_8), k)
  }

  /** Byte-level core of [[simhash64]] — also the codegen target of the
    * Catalyst expression (works straight off UTF8String bytes).
    */
  def simhash64Bytes(bytes: Array[Byte], k: Int): Long = {
    if (k <= 0 || bytes.length < k) return 0L
    val vector = new Array[Int](64)
    var i = 0
    while (i <= bytes.length - k) {
      // inline fnv1a64 over the window — no per-gram allocation
      var hash = FnvOffsetBasis64
      var j = i
      val end = i + k
      while (j < end) {
        hash ^= (bytes(j) & 0xffL)
        hash *= FnvPrime64
        j += 1
      }
      var bit = 0
      while (bit < 64) {
        if (((hash >>> bit) & 1L) != 0L) vector(bit) += 1 else vector(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var signature = 0L
    var bit = 0
    while (bit < 64) {
      if (vector(bit) > 0) signature |= (1L << bit)
      bit += 1
    }
    signature
  }

  /** Hamming distance = popcount(a ^ b) (reference: internal/dedupe/dedupe.go:188-190). */
  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Lowercase-hex SHA1 (reference: internal/dedupe/dedupe.go:92-93). */
  def sha1Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(s.getBytes(UTF_8))
    val sb = new StringBuilder(40)
    for (b <- d) sb.append(f"${b & 0xff}%02x")
    sb.toString
  }
}
