package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D1 cross-document level — banded LSH self-join over 64-bit SimHash
  * signatures (SURVEY.md §2.7 "across 10^12 docs"; north_star: "flags
  * near-duplicate documents without shuffling full span payloads").
  *
  * Pipeline: project ONLY (doc_id, sig) — column pruning keeps payloads out
  * of the exchange — explode the signature into `bands` fixed-width band
  * keys, self-join on (band, band_bits), post-filter on true Hamming
  * distance, emit distinct candidate pairs (a < b).
  *
  * Why it scales: two docs within Hamming distance d share at least one of
  * b bands untouched when d < b (pigeonhole), so recall is exact for
  * d <= threshold when bands > threshold... strictly: with 8 bands of 8
  * bits, any pair with d <= 7 collides in >= 1 band, so threshold <= 7 has
  * perfect recall; the default threshold 6 qualifies. Join fan-out is
  * bounded by band-bucket sizes; a hot bucket (common boilerplate) is
  * handled by AQE skew-join splitting since the join is a plain equi-join.
  */
object LshDedup {

  val Bands = 8
  val BandBits = 8

  /** (doc_id, sig) -> distinct near-duplicate candidate pairs
    * (doc_a, doc_b, distance) with distance <= threshold and doc_a < doc_b.
    */
  def nearDupPairs(sigs: DataFrame, threshold: Int): DataFrame = {
    require(threshold < Bands, s"banded LSH with $Bands bands has exact recall only for threshold < $Bands")
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(Bands - 1))).as("band"))
      .withColumn("band_key",
        expr(s"shiftrightunsigned(sig, band * $BandBits)")
          .bitwiseAND(lit((1L << BandBits) - 1)))
    val a = banded.select(
      col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(
      col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(Exprs.hamming(col("sig_a"), col("sig_b")) <= threshold)
      .select(col("doc_a"), col("doc_b"),
        Exprs.hamming(col("sig_a"), col("sig_b")).as("distance"))
      .distinct()
  }

  /** Per-doc whole-document signatures from assembled raw text. */
  def docSignatures(assembled: DataFrame, k: Int): DataFrame =
    assembled.select(col("doc_id"),
      Exprs.simhash64(Exprs.normCol(col("raw")), k).as("sig"))

  /** The deduped corpus — the end product a training-data user actually
    * wants (doc-level analogue of the reference's kept-chunks surface,
    * internal/dedupe/dedupe.go:260-311): keep each component's winner doc
    * (min doc_id) and every doc that belongs to no near-dup cluster at all,
    * annotated with `n_members` = how many docs the survivor absorbed
    * (1 for singletons). Closes the loop sigs -> pairs -> components ->
    * corpus.
    *
    * Scale shape: `winners` maps ONLY clustered docs (docs without an edge
    * never enter [[clusterWinners]]), so both joins below key on doc_id —
    * a left join to decide survival and a left join against the per-winner
    * component size aggregate. No payload ever enters the winner/size
    * exchanges (they carry (doc_id, winner) only); the doc text rides the
    * docs side of an equi-join, and at web scale the winners side is the
    * duplicate fraction of the corpus, typically broadcast-able after AQE
    * measures it.
    */
  def dedupedDocs(docs: DataFrame, winners: DataFrame): DataFrame = {
    val sizes = winners.groupBy(col("winner"))
      .agg(count(lit(1)).cast("long").as("n_members"))
      .withColumnRenamed("winner", "doc_id")
    docs.join(winners.select(col("doc_id"), col("winner")), Seq("doc_id"), "left")
      .filter(col("winner").isNull || col("winner") === col("doc_id"))
      .join(sizes, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("n_members"), lit(1L)).as("n_members"))
  }

  /** Winner selection: TRUE connected components — map every doc in a
    * near-dup cluster to the minimum doc_id in its component.
    *
    * Algorithm: iterated min-label propagation with POINTER JUMPING, run to
    * a verified fixpoint. Each round does
    *   (1) edge step:  winner'(x) = min over neighbors y of winner(y)
    *   (2) jump step:  winner''(x) = winner'(winner'(x))   (path halving)
    * so label information travels ~2^r hops after r rounds (the jump step
    * is what makes a 10^12-doc chain-shaped cluster converge in O(log
    * diameter) rounds instead of O(diameter)); convergence is DETECTED (a
    * round that changes zero labels), not assumed from a fixed iteration
    * count — the fixed-diameter version mislabeled any cluster deeper than
    * its iteration budget (chains of drifting boilerplate are exactly that
    * shape at web scale).
    *
    * Correctness argument: the edge set carries SELF-LOOPS, so each round's
    * min includes the node's own previous label — labels are monotone
    * non-increasing and bounded below by the component min, hence a
    * fixpoint always exists and is always reached. At any fixpoint,
    * L(x) <= L(y) across every edge and (by symmetry) L(y) <= L(x), so L
    * is constant per component; labels only ever hold ids of component
    * members, so that constant is the component min. "No change" therefore
    * certifies the exact answer, not just a stall.
    *
    * Plan shape per round: two joins + one agg over PERSISTED edges, with
    * checkpoints truncating the growing lineage, plus one count
    * action for the convergence check. maxRounds is a runaway bound, not a
    * semantic knob (2^20 hops covers any real corpus); hitting it throws
    * rather than silently returning partial components.
    *
    * Durability: by default lineage is truncated with `localCheckpoint`,
    * whose blocks live on EXECUTORS — cheap and right for local mode, but
    * an executor lost mid-iteration takes blocks with it whose lineage no
    * longer exists, killing the whole job. Passing `checkpointDir` switches
    * every truncation to a RELIABLE `Dataset.checkpoint()` into that
    * directory (HDFS/S3-backed on a real cluster): an executor loss then
    * costs a recompute from the last durable snapshot instead of the job.
    * On a 1000-executor preemptible fleet running tens of rounds, the
    * reliable path is the one to run.
    */
  def clusterWinners(pairs: DataFrame, maxRounds: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach { d =>
      val sc = pairs.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
    }
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val half = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
    val selfLoops = half.select(col("x")).union(pairs.select(col("doc_b").as("x")))
      .distinct().withColumn("y", col("x"))
    val edges = half
      .union(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
      .union(selfLoops)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = ckpt(edges.groupBy(col("x").as("doc_id"))
      .agg(least(min(col("y")), first(col("x"))).as("winner")))
    var round = 0
    var converged = false
    while (!converged) {
      round += 1
      require(round <= maxRounds,
        s"clusterWinners did not converge within $maxRounds rounds (component diameter > 2^$maxRounds?)")
      // (1) pull the minimum label across each doc's neighborhood
      //     (checkpointed so the self-join below reads it once, not twice)
      val es = ckpt(edges
        .join(labels.withColumnRenamed("doc_id", "y"), Seq("y"))
        .groupBy(col("x").as("doc_id"))
        .agg(min(col("winner")).as("winner"))
        .withColumn("winner", least(col("winner"), col("doc_id"))))
      // (2) pointer jump: follow the winner's own label one more step —
      //     winner values are doc_ids that appear as label keys, so a
      //     self-join compresses paths (label distance doubles per round)
      val jump = es.select(col("doc_id").as("w"), col("winner").as("ww"))
      val next = ckpt(es.join(jump, es("winner") === jump("w"), "left")
        .select(es("doc_id").as("doc_id"),
          least(coalesce(col("ww"), es("winner")), es("winner")).as("winner")))
      val changed = next
        .join(labels.withColumnRenamed("winner", "prev"), Seq("doc_id"))
        .filter(col("winner") =!= col("prev")).count()
      labels = next
      converged = changed == 0L
    }
    edges.unpersist(blocking = false)
    labels
  }
}
