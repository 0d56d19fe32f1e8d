package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Fixture vectors lifted from the reference's own unit tests
  * (reference: internal/dedupe/dedupe_test.go) — see FIXTURES.md §5-6.
  */
class DedupeKernelSpec extends AnyFunSuite {
  import Hashing._

  // ---- k-grams (dedupe_test.go:104-156) ----
  test("kgrams: empty / too short") {
    assert(kgrams("", 3).isEmpty)
    assert(kgrams("ab", 3).isEmpty)
  }
  test("kgrams: exact length") { assert(kgrams("abc", 3) == Seq("abc")) }
  test("kgrams: hello k=3") { assert(kgrams("hello", 3) == Seq("hel", "ell", "llo")) }
  test("kgrams: abcdef k=2") { assert(kgrams("abcdef", 2) == Seq("ab", "bc", "cd", "de", "ef")) }
  test("kgrams: byte-level on non-ASCII") {
    // "café" = 5 bytes (c,a,f,0xC3,0xA9) -> 4 byte-windows of size 2
    assert(kgramBytes("café", 2).length == 4)
    // NOT the 3 char-windows a char-level impl would give
    assert(kgramBytes("café", 2).length != 3)
  }

  // ---- FNV-1a (dedupe_test.go:158-191) ----
  test("fnv1a64: empty = offset basis") {
    assert(fnv1a64(Array.empty[Byte]) == java.lang.Long.parseUnsignedLong("14695981039346656037"))
  }
  test("fnv1a64: deterministic, input-sensitive") {
    assert(fnv1a64("hello") == fnv1a64("hello"))
    assert(fnv1a64("hello") != fnv1a64("hellp"))
  }
  test("fnv1a64: known vector 'a'") {
    // FNV-1a 64 of "a" is 0xaf63dc4c8601ec8c (public test vector)
    assert(fnv1a64("a") == java.lang.Long.parseUnsignedLong("af63dc4c8601ec8c", 16))
  }

  // ---- simhash64 (dedupe_test.go:193-246) ----
  test("simhash: empty / short -> 0") {
    assert(simhash64("", 5) == 0L)
    assert(simhash64("ab", 5) == 0L)
    assert(simhash64("abc", 0) == 0L)
  }
  test("simhash: identical -> identical") {
    assert(simhash64("this is a test", 5) == simhash64("this is a test", 5))
  }

  test("simhash: SWAR positional counting == textbook per-bit counter (r6)") {
    // the r6 optimization replaced the 64-iteration +/-1 loop with SWAR
    // lane accumulation; this pins exact equivalence on adversarial sizes
    // (flush boundary 255 grams, +/-1, long runs, all-zero/all-ff bytes,
    // multibyte UTF-8) against an inline textbook implementation
    def naive(bytes: Array[Byte], k: Int): Long = {
      if (k <= 0 || bytes.length < k) return 0L
      val vector = new Array[Int](64)
      var i = 0
      while (i <= bytes.length - k) {
        var hash = Hashing.FnvOffsetBasis64
        var j = i
        while (j < i + k) { hash ^= (bytes(j) & 0xffL); hash *= Hashing.FnvPrime64; j += 1 }
        var bit = 0
        while (bit < 64) {
          if (((hash >>> bit) & 1L) != 0L) vector(bit) += 1 else vector(bit) -= 1
          bit += 1
        }
        i += 1
      }
      (0 until 64).foldLeft(0L)((s, b) => if (vector(b) > 0) s | (1L << b) else s)
    }
    val rnd = new scala.util.Random(42)
    val sizes = Seq(1, 4, 5, 6, 254, 255, 256, 258, 259, 260, 509, 510, 511, 1024, 5000)
    for (n <- sizes; k <- Seq(1, 2, 5, 8)) {
      val b = new Array[Byte](n); rnd.nextBytes(b)
      assert(Hashing.simhash64Bytes(b, k) == naive(b, k), s"n=$n k=$k random")
      val zeros = new Array[Byte](n)
      assert(Hashing.simhash64Bytes(zeros, k) == naive(zeros, k), s"n=$n k=$k zeros")
      val ffs = Array.fill[Byte](n)(0xff.toByte)
      assert(Hashing.simhash64Bytes(ffs, k) == naive(ffs, k), s"n=$n k=$k ff")
    }
    val uni = ("café über ναι 日本語テキスト " * 40).getBytes("UTF-8")
    for (k <- Seq(2, 5))
      assert(Hashing.simhash64Bytes(uni, k) == naive(uni, k), s"utf8 k=$k")
  }
  test("simhash: similar -> close") {
    val a = simhash64("this is a test string for simhash", 5)
    val b = simhash64("this is a test string for simhash with small change", 5)
    assert(hammingDistance(a, b) <= 20)
  }
  test("simhash: different -> far") {
    val a = simhash64("this is a test string", 5)
    val b = simhash64("completely different content here", 5)
    assert(hammingDistance(a, b) >= 10)
  }
  test("hamming: edges") {
    assert(hammingDistance(0x12345L, 0x12345L) == 0)
    assert(hammingDistance(0L, -1L) == 64)
  }

  // ---- exact dedup (dedupe_test.go:36-102) ----
  private def chunk(i: Int, norm: String, text: String = ""): Chunk =
    Chunk(f"c${i}%04d", if (text.isEmpty) norm else text, norm, i - 1)

  test("exact: three identical keep first") {
    val cs = Seq(chunk(1, "same text"), chunk(2, "same text"), chunk(3, "same text"))
    val (kept, dropped) = DedupeKernel.exactHashDedupe(cs)
    assert(kept.map(_.id) == Vector("c0001"))
    assert(dropped.map(d => (d.chunkId, d.reason, d.matchedChunkId, d.distance)) ==
      Vector(("c0002", "exact_duplicate", "c0001", 0), ("c0003", "exact_duplicate", "c0001", 0)))
  }
  test("exact: duplicate at positions 2 and 4") {
    val cs = Seq(chunk(1, "aaa"), chunk(2, "bbb"), chunk(3, "ccc"), chunk(4, "bbb"))
    val (kept, dropped) = DedupeKernel.exactHashDedupe(cs)
    assert(kept.map(_.id) == Vector("c0001", "c0002", "c0003"))
    assert(dropped.map(_.chunkId) == Vector("c0004"))
    assert(dropped(0).matchedChunkId == "c0002")
  }
  test("exact: empty norm always kept") {
    val cs = Seq(chunk(1, ""), chunk(2, ""), chunk(3, "x"))
    val (kept, dropped) = DedupeKernel.exactHashDedupe(cs)
    assert(kept.length == 3 && dropped.isEmpty)
  }
  test("exact: sha1 hex matches reference format") {
    assert(sha1Hex("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d")
  }

  // ---- simhash dedup window semantics (dedupe_test.go:319-364) ----
  private def longText(seed: String): String =
    s"$seed " + ("the quick brown fox jumps over the lazy dog " * 3)

  test("simhash dedup: window=0 compares against all kept") {
    val dup = longText("alpha")
    val cs = Seq(
      chunk(1, dup), chunk(2, longText("totally different beta zzz qqq")),
      chunk(3, dup))
    val cfg = DedupeConfig(method = "simhash", window = 0).validated
    val (kept, dropped) = DedupeKernel.simhashDedupe(cs, cfg)
    assert(dropped.exists(_.chunkId == "c0003"))
    assert(kept.map(_.id).contains("c0001"))
  }
  test("simhash dedup: window=1 lets a far duplicate through") {
    val dup = longText("alpha")
    val other = "completely unrelated words xylophone quartz jackal vivid numbers 99887766 done now"
    val cs = Seq(chunk(1, dup), chunk(2, other), chunk(3, dup))
    // sanity: dup vs other are far apart
    assert(hammingDistance(simhash64(dup, 5), simhash64(other, 5)) > 6)
    val cfg = DedupeConfig(window = 1)
    val (kept, dropped) = DedupeKernel.simhashDedupe(cs, cfg)
    // with window=1 only c0002 is in window when c0003 arrives -> survives
    assert(kept.map(_.id) == Vector("c0001", "c0002", "c0003"))
    assert(dropped.isEmpty)
    // with default window it would be dropped
    val (_, dropped2) = DedupeKernel.simhashDedupe(cs, DedupeConfig())
    assert(dropped2.map(_.chunkId) == Vector("c0003"))
  }
  test("simhash dedup: matched to earliest min-distance kept chunk") {
    val base = longText("gamma")
    val cs = Seq(chunk(1, base), chunk(2, base + " tiny"), chunk(3, base))
    val cfg = DedupeConfig(simHashThreshold = 10)
    val (_, dropped) = DedupeKernel.simhashDedupe(cs, cfg)
    val d3 = dropped.find(_.chunkId == "c0003").get
    assert(d3.matchedChunkId == "c0001" && d3.distance == 0)
  }

  // ---- dispatcher (dedupe_test.go:382-747) ----
  test("config validate clamps") {
    val c = DedupeConfig("nope", -1, 99, -5).validated
    assert(c == DedupeConfig("simhash", 5, 64, 250))
    assert(DedupeConfig("exact", 5, -1, 0).validated == DedupeConfig("exact", 5, 6, 0))
  }
  test("dedupe: method simhash = exact pre-pass then simhash on survivors") {
    val dup = longText("delta")
    val cs = Seq(chunk(1, dup), chunk(2, dup), chunk(3, dup + " x"))
    val r = DedupeKernel.dedupe(cs, DedupeConfig())
    assert(r.kept.map(_.id) == Vector("c0001"))
    val byId = r.dropped.map(d => d.chunkId -> d.reason).toMap
    assert(byId("c0002") == "exact_duplicate")
    assert(byId("c0003") == "near_duplicate")
    assert(r.stats == DedupeStats(3, 1, 2, 1, 1))
  }
  test("dedupe: both = intersection kept, dropped by min distance, sorted") {
    val dup = longText("epsilon")
    val other = "completely unrelated words xylophone quartz jackal vivid numbers 99887766 done now"
    val cs = Seq(chunk(1, dup), chunk(2, dup), chunk(3, other))
    val r = DedupeKernel.dedupe(cs, DedupeConfig(method = "both"))
    assert(r.kept.map(_.id) == Vector("c0001", "c0003"))
    assert(r.dropped.map(_.chunkId) == Vector("c0002"))
    assert(r.dropped(0).distance == 0) // exact (0) beats near-dup distance
  }
  test("dedupe: invariants kept+dropped=input, exact+near=dropped, order preserved") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val seeds = List.fill(40)(rnd.nextInt())
      val texts = seeds.zipWithIndex.map { case (s, i) =>
        if (s % 3 == 0) longText("shared") else longText(s"v$s-$i unique words here")
      }
      val cs = texts.zipWithIndex.map { case (t, i) => chunk(i + 1, t) }
      val r = DedupeKernel.dedupe(cs, DedupeConfig())
      assert(r.stats.keptCount + r.stats.droppedCount == r.stats.inputCount)
      assert(r.stats.exactDups + r.stats.nearDups == r.stats.droppedCount)
      // kept order preserved
      val keptIdx = r.kept.map(_.index)
      assert(keptIdx == keptIdx.sorted)
    }
  }
  test("dedupe: preview truncated at 200 bytes") {
    val big = "b" * 500
    val cs = Seq(Chunk("c0001", big, "samenorm", 0), Chunk("c0002", big, "samenorm", 1))
    val r = DedupeKernel.dedupe(cs, DedupeConfig(method = "exact"))
    assert(r.dropped(0).preview == ("b" * 200) + "...")
  }
}
