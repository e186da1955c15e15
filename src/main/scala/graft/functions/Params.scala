package graft.functions

/** Typed query parameters and the Jinja-subset SQL templating they ride
  * on (reference: core/parameter.py:49-100 `format_value`,
  * core/template.py `SQLTemplateRenderer`).
  *
  * `format` renders a raw value as a type-correct SQL fragment — the
  * injection boundary: strings/dates quote-and-escape, numbers must
  * parse, `unquoted` (identifier) values must be alphanumeric/underscore/
  * dot, `yesno` lowers to TRUE/FALSE. A value like `1 OR 1=1` can never
  * escape its predicate.
  *
  * `render` handles the template subset the reference's SQL fields use:
  * `{# comments #}`, `{% if var %} … {% elif var %} … {% else %} … {% endif %}`
  * (conditions: bare-variable truthiness, `var == 'lit'`, `var != 'lit'`),
  * then `{{ var }}` substitution. Full Jinja (loops, filters, macros) is
  * out of scope by design — SQL fields in the corpus never use them.
  */
object Params {

  /** SQL fragment for a typed parameter value. */
  def format(ptype: String, value: String): String = ptype match {
    case "string" => "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"
    case "date"   => "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"
    case "number" =>
      val ok = raw"-?\d+(\.\d+)?([eE][+-]?\d+)?".r.matches(value.trim)
      require(ok, s"Invalid numeric parameter value: $value")
      value.trim
    case "unquoted" =>
      require(value.replace("_", "").replace(".", "").forall(_.isLetterOrDigit)
          && value.nonEmpty,
        s"Unquoted parameter must be alphanumeric with underscores/dots only: $value")
      value
    case "yesno" | "boolean" =>
      if (Set("true", "yes", "1").contains(value.toLowerCase)) "TRUE" else "FALSE"
    case _ => "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"
  }

  /** Context values may already be SQL-formatted ('completed'); strip
    * the quoting for condition evaluation so templates compare RAW
    * values, like the reference's Jinja context does. */
  private def unq(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else s

  /** Jinja truthiness for our string-valued context. */
  private def truthy(v: Option[String]): Boolean = v.map(unq).exists(s =>
    s.nonEmpty && !s.equalsIgnoreCase("false") && s != "0" &&
      !s.equalsIgnoreCase("none"))

  private def evalCond(cond: String, ctx: Map[String, String]): Boolean = {
    val t = cond.trim
    val cmp = raw"^(\w+)\s*(==|!=)\s*'([^']*)'$$".r
    t match {
      // the comparison form matches FIRST so an and/or inside the quoted
      // literal (seg == 'Food and Drink') stays a plain comparison
      case cmp(v, op, lit) =>
        val eq = ctx.get(v).map(unq).contains(lit)
        if (op == "==") eq else !eq
      case _ =>
        // compound conditions are outside the supported subset — reject
        // loudly rather than evaluating `a and b` as one variable lookup
        require(raw"(?i)(^|\s)(and|or)(\s|$$)".r.findFirstIn(t).isEmpty,
          s"unsupported template condition (and/or not in the Jinja subset): $t")
        if (t.startsWith("not ")) !truthy(ctx.get(t.drop(4).trim))
        else truthy(ctx.get(t))
    }
  }

  private val IfBlock =
    raw"(?s)\{%\s*if\s+(.*?)\s*%\}(.*?)\{%\s*endif\s*%\}".r

  /** Render the template subset: comments → if-chains → substitution. */
  def render(sql: String, ctx: Map[String, String]): String = {
    var out = raw"(?s)\{#.*?#\}".r.replaceAllIn(sql, "")
    // innermost-last if-blocks resolve in a loop (no nesting inside one
    // match because .*? stops at the first endif)
    var changed = true
    while (changed) {
      changed = false
      out = IfBlock.replaceAllIn(out, m => {
        changed = true
        val cond = m.group(1)
        val body = m.group(2)
        // the non-greedy match stops at the FIRST endif, so a nested
        // {% if %} inside the body means the pairing is wrong — the
        // subset is intentionally flat; refuse rather than mis-render
        require(raw"\{%\s*if\b".r.findFirstIn(body).isEmpty,
          s"unsupported template: nested {% if %} blocks are not in the Jinja subset")
        // split on top-level elif/else
        val parts = raw"(?s)\{%\s*(elif\s+.*?|else)\s*%\}".r
          .split(body)
        val markers = raw"(?s)\{%\s*(elif\s+(.*?)|else)\s*%\}".r
          .findAllMatchIn(body).map(m2 =>
            Option(m2.group(2)).map(_.trim)).toVector // None = else
        val branches = (Some(cond.trim) +: markers).zip(parts.toVector)
        java.util.regex.Matcher.quoteReplacement(
          branches.collectFirst {
            case (condOpt, text) if condOpt.forall(evalCond(_, ctx)) => text
          }.getOrElse(""))
      })
    }
    // anything {% ... %} still standing is an unmatched endif or a
    // construct (for/macro/…) outside the subset — refuse, don't emit
    require(raw"\{%".r.findFirstIn(out).isEmpty,
      s"unsupported template: unmatched or unsupported {% ... %} block: $out")
    // {{ var }} substitution
    ctx.foldLeft(out) { case (acc, (k, v)) =>
      acc.replaceAll(raw"\{\{\s*" + java.util.regex.Pattern.quote(k) + raw"\s*\}\}",
        java.util.regex.Matcher.quoteReplacement(v))
    }
  }

  def isTemplate(sql: String): Boolean =
    Seq("{{", "{%", "{#").exists(sql.contains)
}
