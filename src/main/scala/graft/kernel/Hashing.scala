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
    *
    * Counting is SWAR (SIMD-within-a-register) positional popcount, not the
    * textbook per-bit loop: eight accumulator longs, where `acc(j)` holds
    * eight 8-bit lanes counting bits {j, j+8, ..., j+56} of each gram hash
    * (`(hash >>> j) & 0x0101...01` drops exactly those bits into the lane
    * bytes). Lanes saturate at 255 grams, so they are flushed into 64-bit
    * totals every 255 grams. Equivalence to the reference's +/-1 counter
    * (dedupe.go:150-185) is exact arithmetic, not approximation: with o =
    * ones-count of a bit over n grams, the reference counter is
    * o - (n - o) = 2o - n, and "counter strictly > 0" is "2o > n" — the
    * per-gram work drops from a 64-iteration branchy loop to 8 shift-mask-
    * adds (the kernel's dominant cost in the pipeline profile; jstack put
    * simhash64Bytes at ~28% of active executor samples before this).
    */
  def simhash64Bytes(bytes: Array[Byte], k: Int): Long = {
    if (k <= 0 || bytes.length < k) return 0L
    val nGrams: Long = (bytes.length - k + 1).toLong
    val ones = new Array[Long](64)
    val acc = new Array[Long](8)
    val M = 0x0101010101010101L
    def flush(): Unit = {
      var j = 0
      while (j < 8) {
        val a = acc(j)
        var b = 0
        while (b < 8) {
          ones(j + 8 * b) += (a >>> (8 * b)) & 0xffL
          b += 1
        }
        acc(j) = 0L
        j += 1
      }
    }
    var sinceFlush = 0
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
      acc(0) += hash & M
      acc(1) += (hash >>> 1) & M
      acc(2) += (hash >>> 2) & M
      acc(3) += (hash >>> 3) & M
      acc(4) += (hash >>> 4) & M
      acc(5) += (hash >>> 5) & M
      acc(6) += (hash >>> 6) & M
      acc(7) += (hash >>> 7) & M
      sinceFlush += 1
      if (sinceFlush == 255) { flush(); sinceFlush = 0 }
      i += 1
    }
    if (sinceFlush > 0) flush()
    var signature = 0L
    var bit = 0
    while (bit < 64) {
      if (2L * ones(bit) > nGrams) signature |= (1L << bit)
      bit += 1
    }
    signature
  }

  /** Hamming distance = popcount(a ^ b) (reference: internal/dedupe/dedupe.go:188-190). */
  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val sha1Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("SHA-1"))
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lowercase-hex SHA1 (reference: internal/dedupe/dedupe.go:92-93).
    * Thread-local digest instance (getInstance per call allocated and did a
    * provider lookup per chunk) and table-driven hex (the f-interpolator
    * built a java.util.Formatter per BYTE).
    */
  def sha1Hex(s: String): String = {
    val md = sha1Local.get()
    md.reset()
    val d = md.digest(s.getBytes(UTF_8))
    val out = new Array[Char](40)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
