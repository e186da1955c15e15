package graft.adapters

/** Minimal LookML (.lkml) parser (syntax reference: the public `lkml`
  * Python package's grammar; fixture corpus
  * /root/reference/tests/fixtures/lookml/).
  *
  * LookML is `key: value` pairs where a value is one of:
  *   - a SQL-ish expression terminated by `;;` (any key containing "sql",
  *     plus `html` / `expression` / `link`-less variants) — may span lines
  *     and contain `#`, quotes, liquid tags verbatim
  *   - a named block: `dimension: id { ... }`
  *   - an anonymous block: `derived_table: { ... }`
  *   - a list: `timeframes: [date, week, month]` — items are bare tokens,
  *     quoted strings, or `key: "value"` pairs (measure filters shorthand)
  *   - a quoted string (single or double quotes)
  *   - a bare scalar running to end of line
  *
  * `#` starts a comment outside SQL/strings. Repeated keys are preserved
  * in order (a view holds many `dimension:` entries).
  */
object LkmlParser {

  sealed trait LVal
  final case class LStr(s: String) extends LVal
  final case class LList(items: Seq[LVal]) extends LVal
  final case class LPair(key: String, value: LVal) extends LVal
  final case class LObj(name: Option[String], entries: Seq[(String, LVal)]) extends LVal {
    def apply(key: String): Option[LVal] = entries.find(_._1 == key).map(_._2)
    def str(key: String): Option[String] = apply(key).collect { case LStr(s) => s }
    def all(key: String): Seq[LVal] = entries.filter(_._1 == key).map(_._2)
    def objs(key: String): Seq[LObj] = all(key).collect { case o: LObj => o }
    def list(key: String): Seq[LVal] =
      apply(key).collect { case LList(items) => items }.getOrElse(Nil)
  }

  /** Keys whose value is a `;;`-terminated expression. */
  private def isExprKey(key: String): Boolean =
    key.contains("sql") || key == "html" || key == "expression" ||
      key == "expression_custom_filter"

  def parse(text: String): LObj = {
    val p = new P(text)
    LObj(None, p.pairs(topLevel = true))
  }

  private final class P(s: String) {
    private var i = 0
    private def eof: Boolean = i >= s.length
    private def ch: Char = s.charAt(i)

    /** Skip whitespace and comments. */
    private def ws(): Unit = {
      while (!eof && (ch.isWhitespace || ch == '#')) {
        if (ch == '#') while (!eof && ch != '\n') i += 1
        else i += 1
      }
    }

    private def ident(): String = {
      val start = i
      while (!eof && (ch.isLetterOrDigit || ch == '_' || ch == '+' ||
        ch == '.' || ch == '*' || ch == '-')) i += 1
      s.substring(start, i)
    }

    private def quoted(): String = {
      val quote = ch; i += 1
      val sb = new StringBuilder
      while (!eof && ch != quote) {
        if (ch == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
        else { sb.append(ch); i += 1 }
      }
      if (!eof) i += 1
      sb.toString
    }

    /** Read until `;;` (SQL-ish expression body). */
    private def sqlBody(): String = {
      val start = i
      while (i + 1 < s.length && !(s.charAt(i) == ';' && s.charAt(i + 1) == ';')) i += 1
      val terminated = i + 1 < s.length // loop stopped on `;;`
      val out =
        if (terminated) s.substring(start, i).trim
        else { i = s.length; s.substring(start).trim } // unterminated: keep last char
      if (terminated) i += 2
      out
    }

    def pairs(topLevel: Boolean): Seq[(String, LVal)] = {
      val out = Vector.newBuilder[(String, LVal)]
      ws()
      while (!eof && ch != '}') {
        val key = ident()
        if (key.isEmpty) { i += 1 } // skip stray char, stay robust
        else {
          ws()
          if (!eof && ch == ':') { i += 1; ws(); out += (key -> value(key)) }
          // bare token with no colon (malformed) — skip
        }
        ws()
      }
      if (!eof && ch == '}') i += 1
      out.result()
    }

    private def value(key: String): LVal = {
      if (isExprKey(key)) return LStr(sqlBody())
      ws()
      if (eof) return LStr("")
      ch match {
        case '{' => i += 1; LObj(None, pairs(topLevel = false))
        case '[' => i += 1; LList(listItems())
        case '"' | '\'' => LStr(quoted())
        case _ =>
          val tok = ident()
          // peek for a named block: `dimension: id {`
          val save = i
          ws()
          if (!eof && ch == '{') { i += 1; LObj(Some(tok), pairs(topLevel = false)) }
          else {
            i = save
            // scalar runs to end of line (e.g. `type: left_outer`)
            val start = i
            while (!eof && ch != '\n' && ch != '#' && ch != '}') i += 1
            LStr((tok + s.substring(start, i)).trim)
          }
      }
    }

    private def listItems(): Seq[LVal] = {
      val out = Vector.newBuilder[LVal]
      ws()
      while (!eof && ch != ']') {
        if (ch == ',') { i += 1; ws() }
        else if (ch == '"' || ch == '\'') { out += LStr(quoted()); ws() }
        else {
          val tok = ident()
          ws()
          if (!eof && ch == ':') {
            i += 1; ws()
            val v: LVal =
              if (!eof && (ch == '"' || ch == '\'')) LStr(quoted())
              else LStr(ident())
            out += LPair(tok, v)
          } else if (tok.nonEmpty) out += LStr(tok)
          else i += 1 // unexpected char — skip
          ws()
        }
      }
      if (!eof) i += 1
      out.result()
    }
  }
}
