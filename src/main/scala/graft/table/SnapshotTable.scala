package graft.table

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Iceberg-STYLE snapshot layout on plain Parquet (no Iceberg runtime jar is
  * available in this environment — documented deviation, SURVEY.md §1.2):
  *
  *   <root>/data/bucket=N/ parquet files      bucketed output data
  *   <root>/_snapshots/v<k>.json           one manifest per committed run
  *   <root>/_snapshots/current             pointer to the latest manifest
  *   <root>/_metrics/ parquet files             per-bucket lineage + metrics rows
  *
  * Semantics matched to Iceberg snapshots at partition granularity:
  * a killed run resumes from the last committed manifest — completed
  * buckets are never recomputed; each manifest records its parent, the
  * cumulative completed-bucket set, and per-bucket lineage (input docs,
  * output rows, wall ms, and the DATA FILES the bucket committed).
  * [[read]] consumes only manifest-listed files, the real Iceberg reader
  * contract — uncommitted/stray files in a committed bucket dir are
  * invisible on read-back, not silently mixed in.
  *
  * Scale notes: buckets are hash partitions of doc_id (`pmod(xxhash64)`),
  * which salts document PLACEMENT uniformly — the defense against
  * large-document skew the north_rule asks for (a doc's sequential dedup
  * can never be split, so placement is the only knob; AQE handles residual
  * size skew within the run). One run processes ALL missing buckets in ONE
  * Spark job (`partitionBy(bucket)` write), so resume granularity costs no
  * extra jobs.
  */
object SnapshotTable {

  /** `wall_ms` is MEASURED per-bucket task time (not run wall / bucket
    * count): every row's production time is attributed to its bucket by a
    * timing iterator wrapped around the pipeline output (see
    * [[timedByBucket]]), so skew between buckets is visible in lineage.
    */
  final case class BucketLineage(
      bucket: Int, n_docs: Long, n_rows: Long, wall_ms: Long, snapshot_id: Int)

  private def snapshotsDir(root: String) = Paths.get(root, "_snapshots")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString

  /** Read the cumulative completed-bucket set from the current manifest. */
  def completedBuckets(root: String): Set[Int] = {
    val cur = snapshotsDir(root).resolve("current")
    if (!Files.exists(cur)) Set.empty
    else {
      val manifest = snapshotsDir(root).resolve(Files.readString(cur).trim)
      parseCompleted(Files.readString(manifest))
    }
  }

  private[table] def parseCompleted(json: String): Set[Int] = {
    // minimal parser for our own manifest shape: "completed":[1,2,3]
    val m = """"completed"\s*:\s*\[([0-9,\s]*)\]""".r
    m.findFirstMatchIn(json) match {
      case Some(g) if g.group(1).trim.nonEmpty =>
        g.group(1).split(",").map(_.trim.toInt).toSet
      case _ => Set.empty
    }
  }

  private def currentSnapshotId(root: String): Int = {
    val cur = snapshotsDir(root).resolve("current")
    if (!Files.exists(cur)) 0
    else Files.readString(cur).trim.stripPrefix("v").stripSuffix(".json").toInt
  }

  /** Schema marker of the current snapshot, if any. Guards resume against
    * silently mixing rows of a different pipeline output shape into a table
    * written by an older code version (the write would succeed and only the
    * sink derivation would fail, after the mixed data was committed).
    */
  private[table] def currentSchemaMd5(root: String): Option[String] = {
    val cur = snapshotsDir(root).resolve("current")
    if (!Files.exists(cur)) None
    else {
      val manifest = snapshotsDir(root).resolve(Files.readString(cur).trim)
      """"schema_md5"\s*:\s*"([0-9a-f]{32})"""".r
        .findFirstMatchIn(Files.readString(manifest)).map(_.group(1))
    }
  }

  private def commitSnapshot(root: String, completed: Set[Int],
      lineage: Seq[BucketLineage], schemaMd5: String,
      bucketFiles: Map[Int, Seq[String]]): Int = {
    val dir = snapshotsDir(root)
    Files.createDirectories(dir)
    val parent = currentSnapshotId(root)
    val id = parent + 1
    val lineageJson = lineage.map { l =>
      val files = bucketFiles.getOrElse(l.bucket, Seq.empty)
        .map(f => s""""$f"""").mkString(",")
      s"""{"bucket":${l.bucket},"n_docs":${l.n_docs},"n_rows":${l.n_rows},"wall_ms":${l.wall_ms},"files":[$files]}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"snapshot_id":$id,"parent_id":$parent,""" +
        s""""timestamp":"${java.time.Instant.now()}",""" +
        s""""schema_md5":"$schemaMd5",""" +
        s""""completed":[${completed.toSeq.sorted.mkString(",")}],""" +
        s""""lineage":$lineageJson}"""
    Files.writeString(dir.resolve(s"v$id.json"), json, UTF_8)
    // atomic-enough pointer flip (single writer; real Iceberg uses a catalog CAS)
    val tmp = dir.resolve("current.tmp")
    Files.writeString(tmp, s"v$id.json", UTF_8)
    Files.move(tmp, dir.resolve("current"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Resumable bucketed materialization of `pipeline(docs)`:
    * processes only buckets missing from the current snapshot (at most
    * `maxBucketsPerRun` of them, which is how a kill is simulated in tests),
    * appends their data + a new manifest + lineage/metrics rows. Returns
    * the set of buckets completed by THIS run.
    */
  def runResumable(
      docs: DataFrame,
      pipeline: DataFrame => DataFrame,
      root: String,
      nBuckets: Int,
      maxBucketsPerRun: Int = Int.MaxValue)(implicit spark: SparkSession): Set[Int] = {
    val done = completedBuckets(root)
    val missing = (0 until nBuckets).filterNot(done).take(maxBucketsPerRun)
    if (missing.isEmpty) return Set.empty

    val bucketed = docs.withColumn("bucket",
      pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int"))
    val subset = bucketed.filter(col("bucket").isin(missing.map(Int.box): _*))
    val out = pipeline(subset.drop("bucket"))
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int"))

    // refuse to resume a table whose committed rows have a different pipeline
    // output shape (e.g. out dir written by an older code version): mixing
    // schemas would commit fine and only break at sink-derivation time
    val schemaMd5 = md5Hex(out.schema.toDDL)
    currentSchemaMd5(root).foreach { prev =>
      require(prev == schemaMd5,
        s"snapshot table at $root was committed with a different pipeline " +
          s"output schema (manifest schema_md5=$prev, current=$schemaMd5); " +
          "refusing to resume — use a fresh --out dir or rerun the old build")
    }

    // Clean uncommitted partials: a kill mid-write leaves bucket dirs with no
    // manifest entry; Iceberg readers only see manifest-listed files — our
    // equivalent is deleting un-snapshotted bucket dirs before reprocessing,
    // which makes resume idempotent.
    for (b <- missing) {
      val dir = Paths.get(root, "data", s"bucket=$b")
      if (Files.exists(dir)) {
        Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }

    val bucketNanos = spark.sparkContext.collectionAccumulator[(Int, Long)]("graft.bucketNanos")
    timedByBucket(out, bucketNanos)
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(s"$root/data")

    // lineage: per-bucket doc/row counts from the files just written — a
    // cheap parquet re-scan of only the new bucket dirs, NOT a second
    // execution of the pipeline (the former out.groupBy here re-ran the
    // whole pipeline plan, doubling job cost). A bucket with zero output
    // rows gets NO dir from partitionBy — filter to dirs that exist, or the
    // read throws PATH_NOT_FOUND after the data append but before the
    // commit, wedging every future resume at the same point.
    val newDirs = missing.map(b => s"$root/data/bucket=$b")
      .filter(p => Files.exists(Paths.get(p)))
    val counts =
      if (newDirs.isEmpty) Map.empty[Int, (Long, Long)]
      else spark.read
        .option("basePath", s"$root/data")
        .parquet(newDirs: _*)
        .groupBy("bucket").agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nanos = bucketNanos.value.asScala
      .groupMapReduce(_._1)(_._2)(_ + _)
    val id = currentSnapshotId(root) + 1
    val lineage = missing.map { b =>
      val (rows, docsN) = counts.getOrElse(b, (0L, 0L))
      BucketLineage(b, docsN, rows, nanos.getOrElse(b, 0L) / 1000000L, id)
    }
    // file-level lineage: record exactly the data files this run produced
    // per bucket, so readers see only manifest-listed files (Iceberg's
    // contract) — a stray/partial file later dropped into a committed
    // bucket dir is invisible on read-back
    val bucketFiles = missing.map { b =>
      val d = Paths.get(root, "data", s"bucket=$b")
      val fs =
        if (!Files.exists(d)) Seq.empty[String]
        else {
          val stream = Files.list(d)
          try stream.iterator().asScala
            .filter(Files.isRegularFile(_))
            .map(_.getFileName.toString)
            .filterNot(n => n.startsWith(".") || n.startsWith("_"))
            .toSeq.sorted
          finally stream.close()
        }
      b -> fs
    }.toMap
    commitSnapshot(root, done ++ missing, lineage, schemaMd5, bucketFiles)

    import spark.implicits._
    lineage.toDF().write.mode(SaveMode.Append).parquet(s"$root/_metrics")
    missing.toSet
  }

  /** Wrap the bucketed pipeline output with a per-partition timing iterator
    * that attributes each row's PRODUCTION time (the upstream pipeline's
    * hasNext+next work, which is where pull-based whole-stage codegen spends
    * it) to that row's bucket, flushing aggregated (bucket, nanos) into the
    * accumulator at partition end. Measures actual per-bucket task time with
    * no extra exchange and no pipeline re-execution; the only cost is the
    * Row encode/decode at this single point. Task retries double-count into
    * the accumulator — acceptable for lineage metrics, not data.
    */
  private def timedByBucket(
      out: DataFrame,
      acc: org.apache.spark.util.CollectionAccumulator[(Int, Long)]): DataFrame = {
    val schema = out.schema
    val bucketIdx = schema.fieldIndex("bucket")
    out.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private val agg = scala.collection.mutable.HashMap.empty[Int, Long]
        private var pending = 0L
        private var flushed = false
        override def hasNext: Boolean = {
          val t0 = System.nanoTime()
          val h = it.hasNext
          pending += System.nanoTime() - t0
          if (!h && !flushed) {
            flushed = true
            agg.foreach { case (b, n) => acc.add((b, n)) }
          }
          h
        }
        override def next(): org.apache.spark.sql.Row = {
          val t0 = System.nanoTime()
          val r = it.next()
          pending += System.nanoTime() - t0
          agg.updateWith(r.getInt(bucketIdx)) {
            case Some(n) => Some(n + pending); case None => Some(pending)
          }
          pending = 0L
          r
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** All data files recorded by the manifest chain, as paths relative to
    * `<root>/data`. Walks current -> parent (ids are sequential by
    * construction); buckets commit exactly once, so entries never collide.
    */
  /** Per-committed-bucket read paths from the manifest chain. A lineage
    * entry WITH a `files` list contributes exactly those files (the
    * Iceberg contract); an entry WITHOUT one — written by a pre-file-level
    * manifest build — falls back to its whole `bucket=N/` directory
    * (marker: a path ending in "/"), so resuming a legacy table under this
    * build cannot silently lose the legacy buckets' rows (a chain-wide
    * any-files-present check would: one new-format commit would hide every
    * old-format bucket).
    */
  private[table] def manifestFiles(root: String): Seq[String] = {
    val dir = snapshotsDir(root)
    if (!Files.exists(dir.resolve("current"))) return Seq.empty
    val entry = """"bucket":(\d+)(?:[^}]*?"files":\[([^\]]*)\])?""".r
    (1 to currentSnapshotId(root)).flatMap { id =>
      val json = Files.readString(dir.resolve(s"v$id.json"))
      entry.findAllMatchIn(json).flatMap { m =>
        val bucket = m.group(1)
        Option(m.group(2)) match {
          case None => Iterator(s"bucket=$bucket/") // legacy entry: whole dir
          case Some(fs) => fs.split(",").iterator
            .map(_.trim.stripPrefix("\"").stripSuffix("\""))
            .filter(_.nonEmpty)
            .map(f => s"bucket=$bucket/$f")
        }
      }
    }
  }

  /** Read the materialized table back: ONLY the files the manifest chain
    * lists (the Iceberg reader contract) — a stray or partial file sitting
    * in a committed bucket dir is invisible here, exactly as it would be to
    * a real Iceberg reader. `basePath` keeps the `bucket` partition column.
    */
  def read(root: String)(implicit spark: SparkSession): DataFrame = {
    val files = manifestFiles(root)
    if (files.isEmpty) spark.read.parquet(s"$root/data") // no/empty snapshot: surface the scan error
    else spark.read.option("basePath", s"$root/data")
      .parquet(files.map(f => s"$root/data/${f.stripSuffix("/")}"): _*)
  }

  /** Lineage/metrics table. */
  def metrics(root: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$root/_metrics")
}
