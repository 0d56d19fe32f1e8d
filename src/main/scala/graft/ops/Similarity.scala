package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.kernel.Hashing

/** Document-level deduplication + similarity-search operators for a
  * training-data pipeline, over `documents` (text) and `embeddings`
  * (Array[Float]) tables.
  *
  * Scale notes per operator are inline; the common theme: candidate
  * generation goes through key-equality joins (shingle / band / bucket) so
  * nothing ever compares all pairs, and only (id, signature) projections
  * enter exchanges — never full payloads.
  */
object Similarity {

  // ---------- exact dedup ----------

  /** Exact document dedup: hash-groupBy on sha1(text); winner = min doc_id.
    * Map-side partial agg + one exchange on the 20-byte hash; text payload
    * travels only for the winner via min_by.
    */
  def exactDocDedup(docs: DataFrame): DataFrame =
    docs.groupBy(sha1(col("text")).as("text_sha1"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).cast("long").as("n_copies"))

  /** Corpus-wide common-paragraph (boilerplate) filter, the
    * RefinedWeb/CCNet-style complement of per-corpus exact dedup: a chunk
    * whose normalized text recurs in MORE than `maxDocs` DISTINCT documents
    * is site chrome that leaked past the per-page chrome regexes (cookie
    * banners, nav footers), and EVERY occurrence is dropped — unlike exact
    * dedup (reference `internal/dedupe/dedupe.go:104-148`), which keeps the
    * first. Input: the chunk table (doc_id, id, text, norm, idx); output:
    * surviving (doc_id, id, idx).
    *
    * Scale shape: (1) groupBy md5(norm) with a two-phase distinct-doc count
    * — partial aggregation map-side, ONE exchange on the 16-byte hash, no
    * payload; (2) the heavy set (n_docs > maxDocs) is a vanishing fraction
    * of a real corpus (boilerplate norms only), so AQE broadcasts it and
    * the LEFT ANTI join adds no second exchange of the big side. Nothing
    * all-pairs, nothing driver-side.
    */
  def commonParagraphFilter(chunks: DataFrame, maxDocs: Long = 2L): DataFrame = {
    val heavy = chunks
      .groupBy(md5(col("norm")).as("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("h"))
    // Measured (r6): materializing a (doc_id, id, idx, md5) projection once
    // (lazy localCheckpoint) and serving both branches from it benched the
    // same-to-slightly-worse as this double-pass under matched conditions
    // (~1.55 s vs ~1.50 s at sf0.1): the two chunker passes stream inside
    // whole-stage codegen, while the materialization pays row copies +
    // block I/O and costs the anti-join its broadcast until AQE remeasures
    // (LogicalRDD has no size stats). Kept double-pass, eyes open.
    chunks
      .join(heavy, md5(col("norm")) === col("h"), "left_anti")
      .select(col("doc_id"), col("id"), col("idx"))
  }

  // ---------- word-shingle machinery ----------

  /** ASCII-only lowercase for the hash-bearing UDF paths (shingles,
    * feature-hash embeddings): Java's toLowerCase and DuckDB's lower()
    * disagree on some Unicode uppercase (U+0130 'İ' full-maps to "i" +
    * combining dot in Java, simple-maps in utf8proc), which would silently
    * flip every downstream FNV hash cross-engine. Lowering only A-Z —
    * mirrored by OracleSql.asciiLower — makes the folding identical by
    * construction; non-ASCII case folding is out of scope on both sides.
    */
  private[ops] def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** Distinct `n`-word shingles per doc. A compiled UDF: the higher-order-
    * function formulation (transform over sequence + slice + concat_ws) is
    * interpreted per element and dominated the sf0.1 bench; it also had a
    * latent bug — Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an
    * empty array, fabricating shingles for sub-n-token docs. Token rule and
    * output match the DuckDB oracle exactly (ASCII lowering via
    * [[asciiLower]], ASCII-ws split, drop empties, n-token windows joined
    * by ' ', distinct). Null text degrades to the empty set like the
    * engine-native paths, instead of NPEing the task.
    */
  private val shinglesU = udf { (text: String, n: Int) =>
    if (text == null) Array.empty[String]
    else {
      val toks = asciiLower(text).split("[\t\n\f\r ]+").filter(_.nonEmpty)
      if (toks.length < n) Array.empty[String]
      else toks.sliding(n).map(_.mkString(" ")).toArray.distinct
    }
  }

  def shingles(text: Column, n: Int): Column = shinglesU(text, lit(n))

  /** N-gram Jaccard near-dup pairs: explode distinct shingles, self-join on
    * shingle (candidates must share >= 1), count shared, Jaccard =
    * |A∩B| / (|A|+|B|-|A∩B|) >= thresholdBp/10000. Output quantized.
    *
    * Scale: the join key is the shingle string; fan-out is bounded by
    * document frequency of each shingle. Stop-shingle blowup (a shingle in
    * k docs -> k^2 pairs) is the known hazard; production recipe is a
    * doc-frequency cap on shingles before the join — here df <= `maxDf`.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, thresholdBp: Long, maxDf: Int = 1000): DataFrame = {
    // no pre-explode emptiness filter: explode() already drops empty
    // arrays, and a filter on size(sh) gets pushed into the parquet scan
    // CONDITION where it re-evaluates the shingle UDF per row (seen in the
    // round-3 formatted plan)
    val sets = docs.select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .withColumn("set_size", size(col("sh")).cast("long"))
    // ONE explicit exchange on `shingle`, then the df cap as a WINDOW count
    // over it. The round-2/3 agg+join formulation looked cheaper on paper
    // (hash agg, no sort), but the optimizer duplicated the
    // scan->UDF->explode subtree FOUR times (each self-join side times
    // [explode, df-agg]) and the shingle UDF — the dominant cost — ran 4x+
    // per doc; q23 was the one query over its historical best in round 3
    // for exactly this reason. The window keeps df-count + cap in the SAME
    // traversal, so the pre-join pipeline is one subtree shared across both
    // self-join sides via exchange reuse: measured on sf0.1, UDF
    // invocations dropped 2.3x and wall time 2.29s -> 1.35s (best-of-3,
    // same session, same JVM). The per-shingle sort the window adds is
    // df-bounded and is the price of single evaluation.
    val exploded = sets
      .select(col("doc_id"), col("set_size"), explode(col("sh")).as("shingle"))
      .repartition(col("shingle"))
    val capped = exploded
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
    val a = capped.select(col("shingle"), col("doc_id").as("doc_a"), col("set_size").as("size_a"))
    val b = capped.select(col("shingle"), col("doc_id").as("doc_b"), col("set_size").as("size_b"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"))
      .agg(count(lit(1)).cast("long").as("common"))
      .withColumn("jaccard_bp",
        floor(col("common") * 10000.0 / (col("size_a") + col("size_b") - col("common"))))
      .filter(col("jaccard_bp") >= thresholdBp)
      .select("doc_a", "doc_b", "common", "jaccard_bp")
  }

  // ---------- MinHash + LSH ----------

  val MinHashFns = 16
  val MinHashBands = 4 // 4 bands x 4 rows

  private def minhashU(fns: Int) = udf { (sh: Seq[String]) =>
    if (sh == null || sh.isEmpty) null
    else {
      val sig = new Array[Long](fns)
      java.util.Arrays.fill(sig, Long.MaxValue)
      for (s <- sh) {
        val h = Hashing.fnv1a64(s)
        var i = 0
        while (i < fns) {
          // xorshift-mix per hash function seed; universal enough for LSH
          val mixed = java.lang.Long.rotateLeft(h, i * 7 + 1) * (2654435761L + 2L * i) + i
          if (java.lang.Long.compareUnsigned(mixed, sig(i)) < 0) sig(i) = mixed
          i += 1
        }
      }
      sig.toSeq
    }
  }

  /** MinHash signatures over word shingles (deterministic, seedless —
    * derived from FNV + fixed odd multipliers). `fns` = signature length.
    */
  def minhashSignatures(docs: DataFrame, n: Int, fns: Int = MinHashFns): DataFrame =
    docs.select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashU(fns)(col("sh")).as("sig"),
        size(col("sh")).cast("long").as("set_size"))

  /** MinHash LSH candidate pairs: band the signature (default 4 bands x 4
    * rows), bucket-join on (band, hash(band slice)), then verify with the
    * estimated Jaccard = fraction of agreeing minhashes. Only (doc_id, sig)
    * shuffles.
    *
    * `bands`/`rowsPerBand` are the candidate-threshold knobs: a pair becomes
    * a candidate when >= 1 band agrees fully, which happens with probability
    * 1-(1-J^r)^b — the S-curve midpoint sits at J ~ (1/b)^(1/r) (defaults:
    * (1/4)^(1/4) ~ 0.71). More bands -> lower threshold / more candidates;
    * longer rows -> sharper cutoff. Signature length = bands * rowsPerBand.
    */
  def minhashLshPairs(docs: DataFrame, n: Int, minAgree: Int,
      bands: Int = MinHashBands, rowsPerBand: Int = MinHashFns / MinHashBands): DataFrame = {
    require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
    // lazy localCheckpoint: both self-join sides (and their pushed null
    // filters) re-evaluated the shingle + minhash UDF pipeline — the
    // dominant cost — up to 4x per doc; the cached (doc_id, sig, set_size)
    // rows are ~150 bytes/doc (same rationale as LshDedup.nearDupPairs)
    val sigs = minhashSignatures(docs, n, bands * rowsPerBand)
      .localCheckpoint(eager = false)
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bslice", slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)))
      // the murmur bucket is the narrow shuffle key; the band VALUES ride
      // along so candidate semantics are hash-collision-free (share >= 1
      // band BY VALUE), which is also what the DuckDB oracle joins on
      .withColumn("bucket", hash(col("band"), col("bslice")))
    val a = banded.select(col("band"), col("bucket"), col("bslice").as("bs_a"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("bslice").as("bs_b"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b") && col("bs_a") === col("bs_b"))
      .select(col("doc_a"), col("doc_b"),
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          v => v)).as("agree"))
      .distinct()
      .filter(col("agree") >= minAgree)
  }

  /** SimHash doc-level near-dup pairs via the banded LSH self-join
    * (delegates to [[LshDedup]]).
    */
  def simhashDocPairs(docs: DataFrame, k: Int, threshold: Int): DataFrame = {
    val sigs = docs.select(col("doc_id"),
      Exprs.simhash64(Exprs.normCol(col("text")), k).as("sig"))
    LshDedup.nearDupPairs(sigs, threshold)
  }

  // ---------- embedding similarity ----------

  /** Left-fold double dot product as a native codegen expression
    * (graft.functions.FloatDotExpr) — the built-in aggregate-over-zip_with
    * is interpreted (no codegen for higher-order functions) and was ~100x
    * slower per pair. Fold order matches DuckDB's list fold exactly, so
    * oracle comparisons stay bit-identical.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.FloatDotExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Embedding cosine near-dup pairs above a quantized threshold.
    * Brute-force O(n^2) candidate space — correct baseline; the scale path
    * is [[annLshTopK]] (bucketed). Norms are precomputed ONCE per vector on
    * each join side, so per-pair work is a single fused dot product.
    */
  def embeddingNearDupPairs(emb: DataFrame, thresholdBp: Long): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"),
      norm2(col("embedding")).as("n_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"),
      norm2(col("embedding")).as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_bp",
        floor(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")) * 10000))
      .filter(col("cos_bp") >= thresholdBp)
      .select("id_a", "id_b", "cos_bp")
  }

  /** Brute-force cosine top-k neighbors per query vector — the exact-recall
    * ANN baseline. Window top-k with deterministic (score desc, id asc)
    * tie-break; norms precomputed per side.
    */
  def annBruteForceTopK(emb: DataFrame, k: Int): DataFrame = {
    val a = emb.select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
      norm2(col("embedding")).as("n_q"))
    val b = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_n"),
      norm2(col("embedding")).as("n_n"))
    val scored = a.crossJoin(b)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_bp",
        floor(dot(col("e_q"), col("e_n")) / (col("n_q") * col("n_n")) * 10000))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_bp", "rank")
  }

  val HyperplaneBits = 12

  /** Self-tending scale knob for the hyperplane LSH family: expected bucket
    * population is n / 2^bits, so bits must GROW with log2(n) to keep the
    * bucket self-join bounded. Default bits = ceil(log2(n / targetBucket)),
    * floored at [[HyperplaneBits]] (the constant that sized the test
    * corpus); 10^9 vectors at the default 64/bucket gives bits = 24.
    * Recall lost to more bits is bought back by the 1-bit probing.
    */
  def autoBits(n: Long, targetBucket: Long = 64L): Int = {
    val m = math.max(1L, (n + targetBucket - 1L) / targetBucket)
    val ceilLog2 = if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1L)
    // capped at 31: signatures pack into an Int and probe masks are
    // `1 << i` Int shifts — bits = 33 (n ≈ 2×10^11 at the default target)
    // would silently wrap the shift, collapsing hyperplanes 32 and 0 into
    // one bit (wrong buckets, duplicate probes). Past the cap, buckets run
    // larger than targetBucket instead of corrupting; widening sig to Long
    // is the upgrade path if 2^31 buckets ever stops being enough.
    math.min(31, math.max(HyperplaneBits, ceilLog2))
  }

  /** Deterministic pseudo-random hyperplane component w[bit][dim] in {-1,+1},
    * derived from FNV of (bit, dim) — seedless, identical on every executor.
    *
    * Two FNV-1a traps make the naive `fnv("hp:b:d") & 1` DEGENERATE (round-1
    * bug: all 12 hyperplanes collapsed to ONE plane up to sign, 2 buckets
    * total): (a) bit 0 of FNV-1a is the parity of the input bytes' low bits
    * (the prime is odd), so it is a separable function f(b) XOR g(d);
    * (b) trailing-byte differences barely avalanche (the prime 0x100000001B3
    * is sparse — one multiply moves a last-byte delta only into bits ~0-8
    * and ~40). Fix: vary the LEADING bytes (every varying byte then passes
    * through many multiplies) and read a well-mixed bit (32).
    */
  def hyperplaneSign(bit: Int, dim: Int): Double =
    if (((Hashing.fnv1a64(s"$bit:$dim:hp") >>> 32) & 1L) == 0L) -1.0 else 1.0

  /** Executor-local cache of the bits x dim hyperplane matrix — computed
    * ONCE per (bits, dim) per JVM, never per row (the per-row FNV+string
    * formulation was a 10-50x constant factor on signature computation).
    */
  private val hpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    hpCache.computeIfAbsent((bits, dim), { case (b, d) =>
      Array.tabulate(b, d)((bit, dd) => hyperplaneSign(bit, dd))
    })

  private def signBitsU(bits: Int) = {
    require(bits >= 1 && bits <= 31,
      s"bits must be in [1, 31] (signatures pack into an Int; a wider " +
        s"shift wraps and collapses hyperplanes), got $bits")
    udf { (e: Seq[Float]) =>
    val hp = hyperplanes(bits, e.length)
    var sig = 0
    var bit = 0
    while (bit < bits) {
      val row = hp(bit)
      var s = 0.0
      var d = 0
      while (d < e.length) { s += e(d) * row(d); d += 1 }
      if (s > 0) sig |= (1 << bit)
      bit += 1
    }
    sig
  }
  }

  /** LSH-bucketed ANN: random-hyperplane sign buckets; candidates = bucket
    * collisions plus (when `probe`) all single-bit-flip probe buckets of the
    * query side; exact cosine re-rank inside the bucket. This is the shape
    * that survives 100TB — a bucket equi-join, no cross product.
    *
    * Scale knob: `bits`. Expected bucket population is n / 2^bits and join
    * fan-out is sum over buckets of |bucket|^2, so `bits` must GROW with
    * log2(n) to keep buckets bounded; recall lost to more bits is bought
    * back by probing. Default (bits = 0) is SELF-TENDING: [[autoBits]] of
    * the corpus count — one metadata-cheap count() action against the
    * input; callers that already know n (or whose emb is an expensive
    * unmaterialized plan) pass bits explicitly to skip it. AQE skew-join
    * splits any residual hot bucket.
    */
  def annLshTopK(emb: DataFrame, k: Int, bits: Int = 0,
      probe: Boolean = true): DataFrame = {
    val nbits = if (bits > 0) bits else autoBits(emb.count())
    // lazy localCheckpoint: the probe side and the neighbor side each
    // re-evaluated the signature UDF + norm over the full scan (plus the
    // pushed join-key null filter's second evaluation); one materialization
    // serves both (same rationale as LshDedup.nearDupPairs)
    val sigs = emb.select(col("vec_id"), col("embedding"),
      signBitsU(nbits)(col("embedding")).as("bucket"),
      norm2(col("embedding")).as("nrm"))
      .localCheckpoint(eager = false)
    // single-bit-flip probe buckets, built driver-side (NOT sequence():
    // sequence(0,-1) is a descending [0,-1], not empty)
    val probeArr =
      if (probe) array((col("bucket") +: (0 until nbits).map(i =>
        col("bucket").bitwiseXOR(lit(1 << i)))): _*)
      else array(col("bucket"))
    val probes = sigs.select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
      col("nrm").as("n_q"), explode(probeArr).as("bucket"))
    val cands = probes.join(
      sigs.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_n"),
        col("nrm").as("n_n"), col("bucket")),
      Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_bp",
        floor(dot(col("e_q"), col("e_n")) / (col("n_q") * col("n_n")) * 10000))
      // no distinct: (query_id, neighbor_id) pairs are unique by
      // construction — the query side's probe buckets (bucket plus its
      // single-bit flips) are pairwise-distinct Int values and each
      // neighbor carries exactly ONE bucket, so the equi-join matches any
      // pair at most once. The former defensive .distinct() was a full
      // Exchange+HashAggregate over the candidate set (the plan's largest
      // row volume) AND it blocked WindowGroupLimit from pruning the
      // top-k map-side before the only remaining exchange.
      .select("query_id", "neighbor_id", "cos_bp")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding near-dup PAIRS at scale — the bucketed complement of the
    * declared-cartesian [[embeddingNearDupPairs]] baseline, so
    * dedup-by-embedding (pairs -> clusterWinners -> dedupedDocs) has a
    * 100-TB path: hyperplane sign buckets + single-bit probes (same
    * deterministic hyperplanes as [[annLshTopK]]), exact cosine inside the
    * bucket, threshold filter, distinct (id_a < id_b) pairs. Recall: a
    * pair surfaces iff their buckets differ in <= 1 bit; near-duplicates
    * (cos -> 1) flip any given hyperplane with probability
    * arccos(cos)/pi -> 0, so expected flipped bits stay < 1 for the
    * near-dup band this exists for; raise probing (or lower bits) for
    * looser thresholds. Scale knob `bits` self-tends exactly as in
    * [[annLshTopK]]: 0 (the default) = [[autoBits]] of the corpus count.
    */
  def embeddingNearDupPairsLsh(emb: DataFrame, thresholdBp: Long,
      bits: Int = 0, probe: Boolean = true): DataFrame = {
    val nbits = if (bits > 0) bits else autoBits(emb.count())
    // lazy localCheckpoint — same double-evaluation fix as annLshTopK
    val sigs = emb.select(col("vec_id"), col("embedding"),
      signBitsU(nbits)(col("embedding")).as("bucket"),
      norm2(col("embedding")).as("nrm"))
      .localCheckpoint(eager = false)
    val probeArr =
      if (probe) array((col("bucket") +: (0 until nbits).map(i =>
        col("bucket").bitwiseXOR(lit(1 << i)))): _*)
      else array(col("bucket"))
    val a = sigs.select(col("vec_id").as("id_a"), col("embedding").as("e_a"),
      col("nrm").as("n_a"), explode(probeArr).as("bucket"))
    val b = sigs.select(col("vec_id").as("id_b"), col("embedding").as("e_b"),
      col("nrm").as("n_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_bp",
        floor(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")) * 10000))
      .filter(col("cos_bp") >= thresholdBp)
      // no distinct: a pair (id_a < id_b) can only surface via the a-side
      // row of id_a, whose probe buckets are pairwise-distinct, against
      // id_b's single bucket — at most one join match per pair (same
      // argument as annLshTopK). Dropping the defensive .distinct()
      // removes a full Exchange+HashAggregate of the surviving pairs.
      .select("id_a", "id_b", "cos_bp")
  }

  /** IVF-style ANN (the second scale path, complementing [[annLshTopK]]):
    * coarse quantizer = the `kCells` vectors with smallest vec_id used as
    * cell centroids (deterministic sampled init, no Lloyd refinement — so
    * no float AGGREGATION enters the oracle path and the whole operator is
    * bit-reproducible cross-engine); each vector is assigned to its
    * max-cosine cell; a query probes its `nprobe` nearest cells; exact
    * cosine re-rank inside the probed cells.
    *
    * Scale shape: the centroid table is tiny and BROADCAST, so assignment
    * and probe selection are map-side (no shuffle); the only exchange is the
    * candidate equi-join on `cell`. At 10^9+ vectors kCells grows ~sqrt(n)
    * and cell population stays bounded; skewed cells split via AQE.
    *
    * Empirical honesty note (measured on the synthetic embeddings): they
    * are ISOTROPIC random vectors (same-label cos == diff-label cos == 0),
    * where ANY sublinear index has recall ~= scanned fraction — that is a
    * property of random data, not of the index. On planted near-duplicates
    * (cos >= 0.99) this IVF reaches recall 1.0 and the fixed LSH >= 0.9
    * (SimilaritySpec).
    */
  def annIvfTopK(emb: DataFrame, k: Int, kCells: Int = 32, nprobe: Int = 8): DataFrame = {
    // "train" the coarse quantizer driver-side: K rows is tiny by design
    // (grows ~sqrt(n) at scale) and ships to executors in the UDF closure —
    // probe selection is then a pure MAP (no n*K window/exchange; the plan's
    // only shuffles are the cell equi-join and the final top-k window)
    val spark0 = emb.sparkSession
    import spark0.implicits._
    val cents: Array[(Long, Array[Float], Double)] =
      emb.orderBy(col("vec_id").asc).limit(kCells)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
        .map { case (id, e) =>
          val a = e.toArray
          var s = 0.0
          var d = 0
          while (d < a.length) { s += a(d).toDouble * a(d).toDouble; d += 1 }
          (id, a, math.sqrt(s))
        }
    // top-nprobe cells by (cosine desc, cent_id asc) — double arithmetic in
    // dim order, identical to FloatDotExpr's fold so the DuckDB oracle's
    // list_reduce ranks the same
    val probesU = udf { (e: Seq[Float]) =>
      var s = 0.0
      var d = 0
      while (d < e.length) { s += e(d).toDouble * e(d).toDouble; d += 1 }
      val en = math.sqrt(s)
      cents.map { case (cid, c, cn) =>
        var acc = 0.0
        var i = 0
        while (i < e.length) { acc += e(i).toDouble * c(i).toDouble; i += 1 }
        (cid, acc / (en * cn))
      }.sortBy { case (cid, csim) => (-csim, cid) }
        .take(nprobe).map(_._1)
    }
    // lazy localCheckpoint: the assignment side and the probe side each
    // re-evaluated the k-centroid scoring UDF over the full scan; one
    // materialization serves both (same rationale as annLshTopK's sigs)
    val base = emb.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("nrm"), probesU(col("embedding")).as("pcells"))
      .localCheckpoint(eager = false)
    val assign = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_n"),
      col("nrm").as("n_n"), element_at(col("pcells"), 1).as("cell"))
    val probes = base.select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
      col("nrm").as("n_q"), explode(col("pcells")).as("cell"))
    val cands = probes.join(assign, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_bp",
        floor(dot(col("e_q"), col("e_n")) / (col("n_q") * col("n_n")) * 10000))
      // no distinct: every neighbor is assigned to exactly ONE cell and a
      // query's probed cells (top-nprobe centroid ids) are distinct, so the
      // cell equi-join yields each (query_id, neighbor_id) at most once.
      // The former defensive .distinct() was the plan's biggest operator —
      // an Exchange+HashAggregate over n*nprobe*|cell| candidate rows —
      // and kept WindowGroupLimit from pruning top-k before the exchange.
      .select("query_id", "neighbor_id", "cos_bp")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
