package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DOM-heuristic boilerplate classification + PDF reading-order fixtures. */
class HtmlLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("html blocks: nav/footer classified boilerplate, body paragraphs content") {
    import spark.implicits._
    val docs = Seq(("d1", "a body paragraph long enough to count as real content here")).toDF("doc_id", "text")
    val rows = Html.blocks(docs, Corpus.htmlCol(col("doc_id"), col("text")))
      .orderBy("block_idx").collect()
    val byText = rows.map(r => r.getAs[String]("text") -> r.getAs[Boolean]("is_content")).toMap
    assert(byText("Home Search Log in") == false, "nav is boilerplate (link density 100%)")
    assert(byText("(c) 2026 Example & Co About Terms") == false, "footer is boilerplate")
    assert(byText("Related one") == false, "bare link list item is boilerplate")
    val para = rows.filter(_.getAs[Long]("text_len") >= 50)
    assert(para.nonEmpty && para.forall(_.getAs[Boolean]("is_content")),
      "body paragraphs are content")
    // script/style subtrees leave no text block behind
    assert(!rows.exists(r => r.getAs[String]("text").contains("var x")), "script text stripped")
    assert(!rows.exists(r => r.getAs[String]("text").contains("margin")), "style text stripped")
    // entities decoded in visible text
    assert(rows.exists(_.getAs[String]("text").contains("\"tail\" paragraph 'two'")))
  }

  test("html main content: only content blocks, in block order") {
    import spark.implicits._
    val body = "a body paragraph long enough to count as real content here"
    val docs = Seq(("d1", body)).toDF("doc_id", "text")
    val main = Html.mainContent(docs, Corpus.htmlCol(col("doc_id"), col("text")))
      .head().getAs[String]("main_text")
    assert(main.startsWith(body), "first content block leads")
    assert(!main.contains("Home Search"), "nav stripped from main content")
    assert(!main.contains("About Terms"), "footer stripped from main content")
  }

  test("layout reading order: 2-column page read column-major, top to bottom") {
    import spark.implicits._
    // page 0: two boxes in the left column (y 300, 100), two in the right
    // (y 50, 400) — expected order: left col by y (b2, b1), then right
    // (b3, b4); box b5 on page 1 ranks independently
    val boxes = Seq(
      ("d", 0L, 1L, 100L, 300L), ("d", 0L, 2L, 120L, 100L),
      ("d", 0L, 3L, 700L, 50L), ("d", 0L, 4L, 600L, 400L),
      ("d", 1L, 5L, 900L, 10L)
    ).toDF("doc_id", "page", "box_id", "x", "y")
    val got = Layout.readingOrder(boxes)
      .orderBy("page", "reading_rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(6)))
    assert(got.toSeq == Seq((0L, 2L, 1L), (0L, 1L, 2L), (0L, 3L, 3L), (0L, 4L, 4L), (1L, 5L, 1L)),
      got.toSeq.toString)
  }
}
