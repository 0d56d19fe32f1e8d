package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PDF page-layout parsing into ordered spans (north_star: "parses PDF page
  * layouts into ordered spans"; the reference delegates this to
  * `pdftotext -layout`, internal/pipeline/pipeline.go:119-163 — here the
  * LAYOUT ALGORITHM itself is the operator, over a box table the upstream
  * decode emits).
  *
  * `pdftotext -layout` reading order for multi-column pages: boxes are
  * visited column-major — every box whose x falls in column 0 (top-to-
  * bottom), then column 1, … — with ties broken by x then a stable box id.
  * That is exactly one rank window per (doc, page): ONE hash exchange, and
  * the rank IS the span order the extraction contract verifies.
  */
object Layout {

  /** Defaults the q46 oracle interpolates (single source of truth). */
  val PageWidth = 1000
  val NCols = 2

  /** (doc_id, page, box_id, x, y) -> + (col_idx, reading_rank). `nCols`
    * fixed-width columns over `pageWidth`; rank restarts per (doc, page).
    */
  def readingOrder(boxes: DataFrame, pageWidth: Int = PageWidth, nCols: Int = NCols): DataFrame = {
    val colIdx = floor(col("x") * nCols / pageWidth).cast("long")
    val w = Window.partitionBy(col("doc_id"), col("page"))
      .orderBy(colIdx.asc, col("y").asc, col("x").asc, col("box_id").asc)
    boxes.select(
      col("doc_id"), col("page"), col("box_id"), col("x"), col("y"),
      colIdx.as("col_idx"),
      row_number().over(w).cast("long").as("reading_rank"))
  }
}
