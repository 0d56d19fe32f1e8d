package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case fixtures for the events operators: the exact 30-minute gap
  * boundary (must MERGE — sessions split only when gap > threshold, the
  * engine's inclusive merge, matching Events.sessionize and the
  * session_window streaming twin), single-event sessions, and the resize keep-branch
  * (dead on the synthetic corpus whose stub dims are always > 512, so the
  * oracle can never exercise it).
  */
class EventsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(min: Long, sec: Long = 0, us: Long = 0): Timestamp =
    new Timestamp(min * 60000L + sec * 1000L + us / 1000)

  test("session boundary: exactly-gap MERGES (engine's inclusive merge), gap+1us splits") {
    import spark.implicits._
    // u1: 0:00, then exactly +30:00 (must MERGE — session_window merges on
    // an inclusive boundary; the first sessionize cut split here and
    // diverged), then +30:00.001 after that (must SPLIT); u2: lone event
    val e2 = new Timestamp(ts(30).getTime)
    val e3 = new Timestamp(e2.getTime + 30 * 60000L + 1)
    val events = Seq(
      (1L, ts(0), 1L, "e", 1.0),
      (2L, e2, 1L, "e", 1.0),
      (3L, e3, 1L, "e", 1.0),
      (4L, ts(500), 2L, "e", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.sessionize(events)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)),
      s"expected [u1: 2-event + 1-event, u2: 1]: ${got.toSeq}")
    // and session_window agrees row for row on the same boundaries
    val sw = Events.sessionWindows(events)
      .orderBy("user_id", "start_us")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(sw.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)), sw.toSeq.toString)
  }

  test("sessionize: a gap one microsecond under the threshold does NOT split") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, "e", 1.0),
      (2L, new Timestamp(ts(30).getTime - 1), 1L, "e", 1.0) // 29:59.999
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.sessionize(events).collect()
    assert(got.length == 1 && got.head.getAs[Long]("n_events") == 2L)
  }

  test("resizeBatch keep-branch: dims already within maxDim pass through unscaled") {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val docs = Seq(("m1", Seq(("media", "", "img_m1_1.png", 0)))).toDF("doc_id", "sp")
      .select(col("doc_id"), transform(col("sp"), x =>
        struct(x.getField("_1").as("kind"), x.getField("_2").as("text"),
          x.getField("_3").as("media_ref"), x.getField("_4").as("offset"))).as("spans"))
    val media = Multimodal.mediaTable(docs)
    // maxDim larger than any stub dimension -> keep branch everywhere
    val kept = Multimodal.resizeBatch(media, maxDim = 4000).collect()
    assert(kept.nonEmpty)
    for (r <- kept) {
      assert(r.getAs[Long]("out_w") == r.getAs[Long]("width"))
      assert(r.getAs[Long]("out_h") == r.getAs[Long]("height"))
    }
    // and the scale branch preserves aspect within integer floor
    val scaled = Multimodal.resizeBatch(media, maxDim = 512).collect()
    for (r <- scaled) {
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(math.max(ow, oh) <= 512)
      val scale = 512.0 / math.max(w, h)
      assert(ow == math.floor(w * scale).toLong && oh == math.floor(h * scale).toLong)
    }
  }
}
