package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer-level Python source scan — the V2 syntax gate's teeth.
  *
  * The reference validates test sources with a full `ast.parse`
  * (`/root/reference/shared_tools/validators.py:194-219`); V2 here is
  * a regex extraction, so before this kernel a file matching
  * `^def test_` passed V2 even when it could never compile, failing
  * only later inside V4's container run (documented divergence,
  * SURVEY §7.4.5). This scan closes the most common cases at the
  * LEXICAL level — the part of `ast.parse` that is public-knowledge
  * string walking, no parser required:
  *
  *  - bracket balance: `()[]{}` matched via a stack, counted only in
  *    code (a `)` inside a string literal or comment is content, which
  *    is exactly what the old count-occurrences heuristic got wrong);
  *  - string termination: single-quoted strings must close before an
  *    unescaped newline, triple-quoted strings before EOF;
  *  - indentation consistency: CPython's ACTUAL tokenizer rule
  *    (Parser/tokenizer, the `indstack`/`altindstack` pair) — each
  *    logical line's indentation is measured twice, at tab size 8
  *    (`col`) and tab size 1 (`alt`), against a stack of enclosing
  *    indent levels; a TabError is raised exactly when the two
  *    measures DISAGREE about the comparison (equal under one, not
  *    under the other), and an IndentationError when a dedent lands
  *    between stack levels. A space-then-tab line like
  *    `" \tassert True"` is VALID (both measures agree with every
  *    stack level) and is accepted here too — a naive
  *    tab-after-space rejection would flip verdicts the reference's
  *    `ast.parse` passes. Checked only at statement level: inside an
  *    open bracket or after a backslash join Python ignores
  *    indentation, and blank/comment-only lines generate no
  *    INDENT/DEDENT tokens.
  *
  * What stays out of scope — and still only fails in the container
  * run — is genuinely SYNTACTIC invalidity (a stray `def def`, a
  * malformed expression): that requires the grammar, and
  * approximating it would guess. The scan never false-positives on
  * valid Python ≤ 3.11 (the reference validator's runtime): every
  * rule above is a necessary condition for `ast.parse` to succeed
  * there. Known scope note: PEP 701 (Python 3.12) legalizes
  * same-quote nesting inside f-string braces (`f"{"x"}"`); this scan
  * lexes strings the ≤ 3.11 way, matching the reference.
  *
  * Returns null when the source scans clean, else one of the
  * DISTINCT messages below (each with the offending line) so a
  * reviewer can tell the failure modes apart. Escape handling: a
  * backslash always consumes the next character inside strings; raw
  * strings differ only in how the escaped char is INTERPRETED, not
  * in where the string ends for `\"`/`\'` — the termination scan
  * matches CPython's tokenizer. */
object PySyntaxKernel {

  def scan(srcU: UTF8String): UTF8String = {
    if (srcU == null) return null
    val raw = srcU.toString
    // CPython normalizes the whole buffer BEFORE tokenizing
    // (translate_newlines: "\r\n" and lone "\r" both become "\n"), so a
    // CRLF source — including "\r\n" inside string literals and after a
    // backslash join — lexes exactly like its LF twin. Scanning the raw
    // '\r' as a code character instead would fire the indentation check
    // on whitespace-only CRLF lines CPython treats as blank.
    val s = if (raw.indexOf('\r') >= 0) {
      raw.replace("\r\n", "\n").replace('\r', '\n')
    } else raw
    val n = s.length
    var i = 0
    var line = 1
    // open-bracket stack: chars + the line each opened on
    var stack = List.empty[(Char, Int)]
    var atIndent = true       // scanning a line's leading whitespace
    var lineStart = 0         // index of the current line's first char
    // CPython's indent stacks: (col at tab size 8, col at tab size 1)
    // per enclosing level; root level is (0, 0)
    var indStack = List((0, 0))
    def err(m: String): UTF8String = UTF8String.fromString(m)
    while (i < n) {
      val c = s.charAt(i)
      if (atIndent && stack.isEmpty) {
        if (c == ' ' || c == '\t') i += 1
        else {
          atIndent = false
          // blank and comment-only lines generate no INDENT/DEDENT
          // tokens in CPython — only real code triggers the check
          if (c != '#' && c != '\n') {
            var col = 0; var alt = 0; var j = lineStart
            while (j < i) {
              if (s.charAt(j) == '\t') { col = (col / 8 + 1) * 8; alt += 1 }
              else { col += 1; alt += 1 }
              j += 1
            }
            val (t8, t1) = indStack.head
            if (col == t8) {
              if (alt != t1)
                return err(s"inconsistent use of tabs and spaces in indentation at line $line")
            } else if (col > t8) {
              if (alt <= t1)
                return err(s"inconsistent use of tabs and spaces in indentation at line $line")
              indStack = (col, alt) :: indStack
            } else {
              while (indStack.head._1 > col) indStack = indStack.tail
              if (indStack.head._1 != col)
                return err(s"unindent does not match any outer indentation level at line $line")
              if (indStack.head._2 != alt)
                return err(s"inconsistent use of tabs and spaces in indentation at line $line")
            }
          }
          // c itself is re-examined by the normal branches next pass
        }
      } else if (c == '\\' && i + 1 < n && s.charAt(i + 1) == '\n') {
        // explicit line join: the continuation line is NOT a statement
        // start, so its leading whitespace is not indentation
        line += 1; i += 2
      } else if (c == '\n') {
        // a physical line that starts at bracket depth > 0 is an
        // implicit continuation: CPython generates no INDENT/DEDENT
        // for it, and — crucially — none for the REST of that line
        // after the last bracket closes mid-line. atIndent must
        // therefore only arm when the stack is empty here; arming it
        // unconditionally made the post-close tail of a hanging-indent
        // signature (e.g. "        a):") get measured as indentation.
        line += 1; atIndent = stack.isEmpty; i += 1; lineStart = i
      } else if (c == '#') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '"' || c == '\'') {
        val delim = c
        if (i + 2 < n && s.charAt(i + 1) == delim && s.charAt(i + 2) == delim) {
          val startLine = line
          i += 3
          var closed = false
          while (i < n && !closed) {
            val c2 = s.charAt(i)
            if (c2 == '\\') {
              if (i + 1 < n && s.charAt(i + 1) == '\n') line += 1
              i += 2
            } else if (c2 == delim && i + 2 < n &&
              s.charAt(i + 1) == delim && s.charAt(i + 2) == delim) {
              closed = true; i += 3
            } else {
              if (c2 == '\n') line += 1
              i += 1
            }
          }
          if (!closed)
            return err(s"unterminated triple-quoted string starting at line $startLine")
        } else {
          val startLine = line
          i += 1
          var closed = false
          var broken = false
          while (i < n && !closed && !broken) {
            val c2 = s.charAt(i)
            if (c2 == '\\') {
              // escaped newline is a legal continuation inside a
              // single-quoted string; any other escape consumes one char
              if (i + 1 < n && s.charAt(i + 1) == '\n') line += 1
              i += 2
            } else if (c2 == delim) { closed = true; i += 1 }
            else if (c2 == '\n') { broken = true }
            else i += 1
          }
          if (!closed)
            return err(s"unterminated string literal at line $startLine")
        }
      } else if (c == '(' || c == '[' || c == '{') {
        stack = (c, line) :: stack
        i += 1
      } else if (c == ')' || c == ']' || c == '}') {
        val want = c match { case ')' => '('; case ']' => '['; case _ => '{' }
        stack match {
          case (open, _) :: rest if open == want => stack = rest; i += 1
          case _ =>
            return err(s"unbalanced brackets: unexpected '$c' at line $line")
        }
      } else i += 1
    }
    stack match {
      case (open, openLine) :: _ =>
        err(s"unbalanced brackets: '$open' opened at line $openLine never closed")
      case Nil => null
    }
  }
}

object PySyntaxExpression {
  def pySyntaxError(src: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PySyntaxError(org.apache.spark.sql.graftbridge.ColumnBridge.expression(src)))
}

/** `py_syntax_error(src)`: null when [[PySyntaxKernel]] finds nothing,
  * else the scan's message — a plain codegen'd projection like the
  * other graft kernels. */
case class PySyntaxError(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"py_syntax_error requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "py_syntax_error"

  override def nullSafeEval(input: Any): Any =
    PySyntaxKernel.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PySyntaxKernel.scan($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): PySyntaxError =
    copy(child = newChild)
}
