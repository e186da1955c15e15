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
  * `{# comments #}`, `{% if cond %} … {% elif cond %} … {% else %} … {% endif %}`
  * (conditions: bare-variable truthiness, `not`, `var == 'lit'` /
  * `var != 'lit'` — dotted names like `loop.index` included —
  * `in`/`not in` membership against quoted-literal lists or a
  * variable's comma-separated list form, composed with `and`/`or` at
  * Jinja precedence with `(...)` grouping), `{% for item in items %} …
  * {% endfor %}` over comma-separated context lists and
  * `{% for k, v in m.items() %}` over `key: value` entries (both with
  * `loop.index`/`loop.first`/`loop.last`), then `{{ var }}`
  * substitution with the `default('x')`/`upper`/`lower`/`join('sep')`
  * filters. The rest of Jinja (macros, set, `is` tests, variable-in-
  * variable membership, other filters) is out of scope by design and
  * REFUSED loudly — never mis-rendered.
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

  /** Split `s` on a top-level keyword (`and` / `or`) — whitespace-
    * delimited, outside single-quoted literals AND outside `(...)` /
    * `[...]` groups — so a quoted value like 'Food and Drink' never
    * splits and `(a or b) and c` keeps its grouping. Returns the parts
    * (the whole string when the keyword is absent). */
  private def splitKw(s: String, kw: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var depth = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') {
        cur.append(c); i += 1
        while (i < s.length && s(i) != '\'') { cur.append(s(i)); i += 1 }
        if (i < s.length) { cur.append('\''); i += 1 }
      } else if (c == '(' || c == '[') {
        depth += 1; cur.append(c); i += 1
      } else if (c == ')' || c == ']') {
        depth -= 1; cur.append(c); i += 1
      } else if (depth == 0 && (c == ' ' || c == '\t') &&
          s.regionMatches(i + 1, kw, 0, kw.length) &&
          i + 1 + kw.length < s.length &&
          (s(i + 1 + kw.length) == ' ' || s(i + 1 + kw.length) == '\t')) {
        out += cur.toString; cur.clear()
        i += 1 + kw.length
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.result().map(_.trim)
  }

  /** Condition evaluation with Jinja precedence (`not` > `and` > `or`,
    * parentheses group): the condition splits on top-level `or`, each
    * branch on `and`, and every atom is a bare-variable truthiness
    * test, a `not` of an atom, a fully parenthesized sub-condition
    * (recursing back here), a `==`/`!=` comparison against a quoted
    * literal, or an `in`/`not in` membership — `v in ['a', 'b']`
    * against a quoted-literal list/tuple, or `'a' in v` against the
    * context's comma-separated list form (the same shape `{% for %}`
    * iterates and `join` re-delimits). Anything else (`is`, unquoted
    * right-hand sides, variable-in-variable) is outside the subset and
    * refuses loudly — never mis-rendered. */
  private def evalCond(cond: String, ctx: Map[String, String]): Boolean =
    splitKw(cond.trim, "or").exists(part =>
      splitKw(part, "and").forall(evalAtom(_, ctx)))

  private def evalAtom(atom: String, ctx: Map[String, String]): Boolean = {
    val t = atom.trim
    // dotted names included: for-loops bind loop.index/first/last as
    // plain context keys, and they compare like any other variable
    val cmp = raw"^([\w.]+)\s*(==|!=)\s*'([^']*)'$$".r
    // membership: a variable against a bracketed quoted-literal list
    // (Jinja list or tuple syntax), or a quoted literal against a
    // variable's list form. `not in` binds tighter than prefix `not`
    // (Jinja parses `not x in y` as `not (x in y)` — same result).
    val inList = raw"^([\w.]+)\s+(not\s+)?in\s+[\[(](.*)[\])]$$".r
    val litInVar = raw"^'([^']*)'\s+(not\s+)?in\s+([\w.]+)$$".r
    t match {
      // the comparison form matches FIRST so an and/or inside the quoted
      // literal (seg == 'Food and Drink') stays a plain comparison
      case cmp(v, op, lit) =>
        val eq = ctx.get(v).map(unq).contains(lit)
        if (op == "==") eq else !eq
      case inList(v, neg, items) =>
        val lits = splitList(items)
        require(lits.forall(s => s.length >= 2 && s.head == '\'' &&
            s.last == '\''),
          s"unsupported template condition (membership list must be " +
            s"quoted literals): $t")
        val found = ctx.get(v).map(unq).exists(x => lits.map(unq).contains(x))
        if (neg == null) found else !found
      case litInVar(lit, neg, v) =>
        require(ctx.contains(v),
          s"template condition tests membership in undefined variable: $v")
        val found = unq(ctx(v)).split(",").map(_.trim).contains(lit)
        if (neg == null) found else !found
      case _ if t.startsWith("not ") => !evalAtom(t.drop(4), ctx)
      case _ if t.startsWith("(") =>
        // must be ONE balanced group spanning the whole atom (splitKw
        // keeps groups intact, so anything else is malformed)
        require(t.endsWith(")") && balancedGroup(t),
          s"unsupported template condition (unbalanced grouping): $t")
        evalCond(t.substring(1, t.length - 1), ctx)
      case _ =>
        // whatever remains must be a bare variable; whitespace or parens
        // here means a construct outside the subset (a comparison the
        // cmp regex rejected, `is`, …) and an empty atom is a dangling
        // and/or — refuse loudly rather than silently truthiness-
        // testing a nonsense key
        require(t.nonEmpty &&
            !t.exists(c => c.isWhitespace || c == '(' || c == ')'),
          s"unsupported template condition (not in the Jinja subset): $t")
        truthy(ctx.get(t))
    }
  }

  /** Comma-split a bracketed list body outside single quotes. */
  private def splitList(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') {
        cur.append(c); i += 1
        while (i < s.length && s(i) != '\'') { cur.append(s(i)); i += 1 }
        if (i < s.length) { cur.append('\''); i += 1 }
      } else if (c == ',') { out += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Does the leading '(' close exactly at the final character? */
  private def balancedGroup(t: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < t.length) {
      val c = t(i)
      if (c == '\'') {
        i += 1
        while (i < t.length && t(i) != '\'') i += 1
        if (i < t.length) i += 1
      } else {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1
          if (depth == 0 && i != t.length - 1) return false
          if (depth < 0) return false
        }
        i += 1
      }
    }
    depth == 0
  }

  private val IfBlock =
    raw"(?s)\{%\s*if\s+(.*?)\s*%\}(.*?)\{%\s*endif\s*%\}".r

  private val ForBlock =
    raw"(?s)\{%\s*for\s+(\w+)\s+in\s+(\w+)\s*%\}(.*?)\{%\s*endfor\s*%\}".r

  private val ForItemsBlock =
    raw"(?s)\{%\s*for\s+(\w+)\s*,\s*(\w+)\s+in\s+(\w+)\.items\(\)\s*%\}(.*?)\{%\s*endfor\s*%\}".r

  /** Expand `{% for item in items %} … {% endfor %}` blocks: the
    * iterable is a context value holding a comma-separated list (the
    * string-valued context's list form); each iteration renders the
    * body RECURSIVELY with `item`, `loop.index` (1-based), `loop.first`
    * and `loop.last` bound — so `{% if not loop.first %}OR{% endif %}`
    * separators work, the pattern real LookML/Cube templates use.
    * Nested `{% for %}` stays outside the subset (refused loudly, like
    * nested if), and an iterable absent from the context is an error —
    * Jinja's strict-undefined behavior, not a silent empty loop. */
  private def expandFor(sql: String, ctx: Map[String, String]): String = {
    def loopCtx(i: Int, n: Int): Map[String, String] = Map(
      "loop.index" -> (i + 1).toString,
      "loop.first" -> (if (i == 0) "true" else "false"),
      "loop.last" -> (if (i == n - 1) "true" else "false"))
    def listOf(iter: String): Vector[String] = {
      require(ctx.contains(iter),
        s"template iterates over undefined variable: $iter")
      unq(ctx(iter)).split(",").map(_.trim).filter(_.nonEmpty).toVector
    }
    var out = sql
    var changed = true
    while (changed) {
      changed = false
      // dict iteration: `{% for k, v in m.items() %}` over the map form
      // of the string-valued context — comma-separated `key: value`
      // entries (the list convention extended one level); a valueless
      // entry refuses loudly rather than silently binding an empty v
      out = ForItemsBlock.replaceAllIn(out, m => {
        changed = true
        val (kVar, vVar, iter, body) =
          (m.group(1), m.group(2), m.group(3), m.group(4))
        require(raw"\{%\s*for\b".r.findFirstIn(body).isEmpty,
          s"unsupported template: nested {% for %} blocks are not in the Jinja subset")
        val entries = listOf(iter).map { e =>
          val sep = e.indexOf(':')
          require(sep > 0, s"template iterates $iter.items() but entry " +
            s"'$e' is not in the context's 'key: value' map form")
          (e.substring(0, sep).trim, e.substring(sep + 1).trim)
        }
        java.util.regex.Matcher.quoteReplacement(
          entries.zipWithIndex.map { case ((k, v), i) =>
            render(body, ctx + (kVar -> k) + (vVar -> v)
              ++ loopCtx(i, entries.size))
          }.mkString)
      })
      out = ForBlock.replaceAllIn(out, m => {
        changed = true
        val (item, iter, body) = (m.group(1), m.group(2), m.group(3))
        require(raw"\{%\s*for\b".r.findFirstIn(body).isEmpty,
          s"unsupported template: nested {% for %} blocks are not in the Jinja subset")
        val items = listOf(iter)
        java.util.regex.Matcher.quoteReplacement(
          items.zipWithIndex.map { case (v, i) =>
            render(body, ctx + (item -> v) ++ loopCtx(i, items.size))
          }.mkString)
      })
    }
    out
  }

  /** `{{ var | filter }}` resolution for the 3-filter subset the real
    * template corpora use: `default('x')` (missing/empty var → the
    * literal), `upper`, `lower`. Unknown filters refuse loudly; a bare
    * `{{ var }}` with no binding passes through untouched (callers
    * layer contexts — see [[render]]'s substitution contract). */
  private val VarRef =
    raw"\{\{\s*([\w.]+)\s*(?:\|\s*(\w+)\s*(?:\(\s*'([^']*)'\s*\))?\s*)?\}\}".r

  private def substitute(sql: String, ctx: Map[String, String]): String =
    VarRef.replaceAllIn(sql, m => {
      val (name, filt, arg) =
        (m.group(1), Option(m.group(2)), Option(m.group(3)))
      val bound = ctx.get(name)
      val resolved = filt match {
        case None => bound
        case Some("default") =>
          require(arg.isDefined,
            "default filter needs a quoted literal argument: " + m.matched)
          Some(bound.filter(v => unq(v).nonEmpty).getOrElse(arg.get))
        case Some("upper") => bound.map(_.toUpperCase)
        case Some("lower") => bound.map(_.toLowerCase)
        case Some("join") =>
          // the context's list form is a comma-separated string (the
          // same shape {% for %} iterates); join re-delimits it with
          // the quoted argument (Jinja's default separator is empty)
          bound.map(v => unq(v).split(",").map(_.trim).filter(_.nonEmpty)
            .mkString(arg.getOrElse("")))
        case Some(other) =>
          throw new IllegalArgumentException(
            s"unsupported template filter (not in the Jinja subset): $other")
      }
      // unresolved plain references stay verbatim for the next layer
      java.util.regex.Matcher.quoteReplacement(
        resolved.getOrElse(m.matched))
    })

  /** Render the template subset: comments → for-loops → if-chains →
    * filtered substitution. */
  def render(sql: String, ctx: Map[String, String]): String = {
    var out = raw"(?s)\{#.*?#\}".r.replaceAllIn(sql, "")
    out = expandFor(out, ctx)
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
    // anything {% ... %} still standing is an unmatched endif/endfor or
    // a construct (macro/set/…) outside the subset — refuse, don't emit
    require(raw"\{%".r.findFirstIn(out).isEmpty,
      s"unsupported template: unmatched or unsupported {% ... %} block: $out")
    substitute(out, ctx)
  }

  def isTemplate(sql: String): Boolean =
    Seq("{{", "{%", "{#").exists(sql.contains)
}
