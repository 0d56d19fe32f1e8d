package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over the `documents` table: emails, phone
  * numbers, IPv4 addresses — counted per doc and masked in place with typed
  * placeholders. The standard pre-release scrub of a web-scale training
  * corpus (the reference pipeline has no PII surface; graft-added §2.9).
  *
  * Map-only codegen end-to-end: three `regexp_extract_all` counts and a
  * three-stage `regexp_replace` chain next to the scan — zero exchanges at
  * any corpus scale, and the regexes live inside whole-stage codegen.
  *
  * The patterns are written to mean the same thing under Java regex
  * (Spark, leftmost-first backtracking) and RE2 (DuckDB oracle,
  * leftmost-longest): greedy character-class quantifiers with no
  * alternation and no overlap between the class and what follows — for
  * such patterns leftmost-first and leftmost-longest pick the identical
  * match. No backreferences, no lookaround (RE2 has neither).
  *
  * Replacement order is fixed email → ipv4 → phone; the pattern alphabets
  * are disjoint at the anchor character ('@' / dotted digit quad / '+'),
  * and no placeholder token can create a new match for a later pattern.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3} \\d{3}-\\d{4}\\b"

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def scrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      countOf(col("text"), EmailRe).as("n_emails"),
      countOf(col("text"), Ipv4Re).as("n_ips"),
      countOf(col("text"), PhoneRe).as("n_phones"),
      redactText(col("text")).as("redacted"))
}
