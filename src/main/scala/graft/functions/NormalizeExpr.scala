package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static eval target for the fused N1 normalize (reference:
  * internal/text/text.go:37-64). Replicates the 4-pass Column formulation
  *
  *   trim(regexp_replace(regexp_replace(regexp_replace(lower(c),
  *     "[ \t]+", " "), "\n+", "\n"), "[^\p{L}\p{Nd} \n]", ""), " \n")
  *
  * in ONE character pass after the lowercase — the byte-identical contract
  * is pinned by ExprSpec against the regex chain on the full corpus plus
  * adversarial fixtures. Order sensitivity that must be preserved: run
  * collapsing happens BEFORE the character filter, so a run-breaking char
  * that is itself later removed still leaves two separate spaces
  * ("a . b" -> "a  b"); the pass tracks the previous INPUT char's class,
  * not the previous EMITTED char's.
  */
object NormalizeEval {

  private final val ClassOther = 0
  private final val ClassSpaceTab = 1
  private final val ClassNewline = 2

  def eval(in: UTF8String): UTF8String = {
    // same lowercase as the built-in lower() (UTF8String.toLowerCase),
    // so the fused form can never diverge on case mapping
    val s = in.toLowerCase.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var prev = ClassOther
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == ' ' || cp == '\t') {
        if (prev != ClassSpaceTab) sb.append(' ')
        prev = ClassSpaceTab
      } else if (cp == '\n') {
        if (prev != ClassNewline) sb.append('\n')
        prev = ClassNewline
      } else {
        prev = ClassOther
        // \p{L} == Character.isLetter (general categories L*);
        // \p{Nd} == Character.isDigit (DECIMAL_DIGIT_NUMBER) — the Go
        // unicode.IsDigit twin the regex chain also uses
        if (Character.isLetter(cp) || Character.isDigit(cp)) sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    var b = 0
    var e = sb.length
    while (b < e && { val c = sb.charAt(b); c == ' ' || c == '\n' }) b += 1
    while (e > b && { val c = sb.charAt(e - 1); c == ' ' || c == '\n' }) e -= 1
    UTF8String.fromString(sb.substring(b, e))
  }
}

/** Static eval target for the fused HTML visible-text extraction — the
  * byte-identical single-pass form of Html.visibleText's Column chain
  *
  *   trim(regexp_replace(decodeEntities(regexp_replace(html, "<[^>]*>", " ")),
  *     "[ \t\r\n]+", " "))
  *
  * where decodeEntities is seven sequential regexp_replace passes
  * (&lt; &gt; &quot; &#39; &nbsp; &copy; &amp; — &amp; LAST). Equivalence
  * argument for the fusion (spec-pinned by HtmlLayoutSpec on the rendered
  * corpus plus adversarial fixtures):
  *   - tag strip: "<[^>]*>" matches a '<', any run of non-'>' chars, then
  *     '>'; a '<' with no closing '>' matches nothing and survives. The
  *     scanner mirrors exactly that (emit ' ' and skip through '>' iff a
  *     '>' exists, else emit the '<').
  *   - entity decode: the seven entities have pairwise-distinct spellings,
  *     no replacement output contains a later pattern's text, and the only
  *     replacement containing '&' (&amp; -> "&") is the LAST pass — so the
  *     sequential chain equals one first-match scan per '&' with no rescan
  *     of replacement output.
  *   - both rewrites only ever produce ' ' / fixed ASCII, so the final
  *     whitespace collapse + trim can run in the same emit loop (emit a
  *     single pending space on ws runs, suppressed at the start; trailing
  *     trim by construction).
  */
object HtmlVisibleTextEval {

  def eval(in: UTF8String): UTF8String = {
    val s = in.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingWs = false // a whitespace run is open (emitted lazily)
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
        if (sb.length > 0) pendingWs = true // leading ws never emits
      } else {
        if (pendingWs) { sb.append(' '); pendingWs = false }
        sb.append(c)
      }
    }
    def emitStr(r: String): Unit = { var k = 0; while (k < r.length) { emit(r.charAt(k)); k += 1 } }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close >= 0) { emit(' '); i = close + 1 }
        else { emit('<'); i += 1 }
      } else if (c == '&') {
        // first-match over the fixed entity set (pairwise-distinct spellings)
        if (s.startsWith("&lt;", i)) { emit('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { emit('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { emit('"'); i += 6 }
        else if (s.startsWith("&#39;", i)) { emit('\''); i += 5 }
        else if (s.startsWith("&nbsp;", i)) { emit(' '); i += 6 }
        else if (s.startsWith("&copy;", i)) { emitStr("(c)"); i += 6 }
        else if (s.startsWith("&amp;", i)) { emit('&'); i += 5 }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(sb.toString) // pendingWs at end == trailing trim
  }
}

/** Html.visibleText as a native codegen expression: one scan, one
  * allocation — replaces ten regex passes per block on the q43/q44/q45
  * hot path. Byte-parity with the Column chain is spec-pinned
  * (HtmlLayoutSpec).
  */
case class HtmlVisibleTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_visible_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlVisibleTextEval.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlVisibleTextEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlVisibleTextExpr =
    copy(child = newChild)
}

/** N1 normalize as a native codegen expression: one static call per row,
  * one allocation, one character pass — replaces four regex passes + trim
  * on the chunker hot path (every chunk of every document is normalized
  * before chrome filtering and hashing).
  */
case class NormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeEval.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}
