package graft.core

import org.apache.spark.sql.DataFrame

/** pandas `DataFrame.query` expression dialect -> Spark SQL translation.
  *
  * The reference's whole query engine is expression strings handed to
  * `pandas.DataFrame.query` (dataslicer/dataset_base.py:198-230), e.g.
  * `"flags == 0 and snr>2"`, `"17.5 < cal_mag < 18.5"`,
  * `"clusterID not in @bad_ids"`. Spark SQL already accepts most of the
  * grammar (`and/or/not`, `==`, `!=`, `abs(...)`); the deltas handled
  * here are:
  *   - chained comparisons `a < x <= b` -> `a < x AND x <= b`
  *   - `@var` host references          -> inlined SQL literals
  *   - python list syntax `in [1, 2]`  -> `IN (1, 2)`
  *   - `&`, `|`, `~`                   -> `AND`, `OR`, `NOT`
  *   - `True`/`False`                  -> `true`/`false`
  */
object QueryDialect {

  private sealed trait Kind
  private case object Cmp extends Kind     // == != <= >= < > =
  private case object AndK extends Kind    // and & &&
  private case object OrK extends Kind     // or | ||
  private case object NotK extends Kind    // not ~
  private case object Open extends Kind    // ( [
  private case object Close extends Kind   // ) ]
  private case object Other extends Kind

  private case class Tok(s: String, kind: Kind)

  private val tokenRe =
    ("""(==|!=|<=|>=|<>|<|>|=|&&|\|\||&|\||~|\(|\)|\[|\]|,|\+|-|\*|/|%|""" +
      """@?[A-Za-z_][A-Za-z_0-9]*|`[^`]+`|""" +
      """(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|'[^']*'|"[^"]*")""").r

  /** Render a host value as a SQL literal (for `@var` references). */
  def sqlLit(v: Any): String = v match {
    case s: String          => "'" + s.replace("'", "''") + "'"
    case b: Boolean         => b.toString
    case xs: Iterable[_]    => xs.map(sqlLit).mkString("(", ", ", ")")
    case xs: Array[_]       => xs.map(sqlLit).mkString("(", ", ", ")")
    case n                  => String.valueOf(n)
  }

  private def kindOf(s: String): Kind = s.toLowerCase match {
    case "==" | "!=" | "<=" | ">=" | "<" | ">" | "=" | "<>" => Cmp
    case "and" | "&" | "&&"                                 => AndK
    case "or" | "|" | "||"                                  => OrK
    case "not" | "~"                                        => NotK
    case "(" | "["                                          => Open
    case ")" | "]"                                          => Close
    case _                                                  => Other
  }

  private def tokenize(expr: String, params: Map[String, Any]): List[Tok] = {
    val raw = tokenRe.findAllIn(expr).toList
    val consumed = raw.map(_.length).sum
    val nonWs = expr.count(!_.isWhitespace)
    require(consumed >= nonWs, s"cannot tokenize query expression: $expr")
    raw.map { s =>
      if (s.startsWith("@")) {
        val name = s.drop(1)
        require(params.contains(name), s"query references @$name but no such parameter was given")
        Tok(sqlLit(params(name)), Other)
      } else if (s == "True") Tok("true", Other)
      else if (s == "False") Tok("false", Other)
      else Tok(s, kindOf(s))
    }
  }

  /** Split `toks` at depth-0 tokens of kind `k`, or None if absent. */
  private def splitTop(toks: List[Tok], k: Kind): Option[List[List[Tok]]] = {
    val parts = scala.collection.mutable.ListBuffer[List[Tok]]()
    val cur = scala.collection.mutable.ListBuffer[Tok]()
    var depth = 0
    var found = false
    toks.foreach { t =>
      t.kind match {
        case Open  => depth += 1; cur += t
        case Close => depth -= 1; cur += t
        case kk if kk == k && depth == 0 =>
          // `not` between operands is `not in`, handled at leaf level
          val isNotIn = k == NotK && cur.nonEmpty
          if (isNotIn) cur += t
          else { found = true; parts += cur.toList; cur.clear() }
        case _ => cur += t
      }
    }
    parts += cur.toList
    if (found) Some(parts.toList) else None
  }

  private def renderExpr(toks: List[Tok]): String =
    splitTop(toks, OrK) match {
      case Some(parts) => parts.map(renderExpr).mkString("(", ") OR (", ")")
      case None =>
        splitTop(toks, AndK) match {
          case Some(parts) => parts.map(renderExpr).mkString("(", ") AND (", ")")
          case None => toks match {
            case Tok(_, NotK) :: rest => "NOT (" + renderExpr(rest) + ")"
            case _                    => renderLeaf(toks)
          }
        }
    }

  /** A leaf clause: operands separated by depth-0 comparison operators.
    * >=2 comparisons = a python chained comparison -> pairwise AND.
    */
  private def renderLeaf(toks: List[Tok]): String = {
    val operands = scala.collection.mutable.ListBuffer[List[Tok]]()
    val ops = scala.collection.mutable.ListBuffer[String]()
    val cur = scala.collection.mutable.ListBuffer[Tok]()
    var depth = 0
    toks.foreach { t =>
      t.kind match {
        case Open             => depth += 1; cur += t
        case Close            => depth -= 1; cur += t
        case Cmp if depth == 0 =>
          operands += cur.toList; cur.clear()
          ops += (if (t.s == "==") "=" else t.s)
        case _ => cur += t
      }
    }
    operands += cur.toList
    val rendered = operands.map(renderOperand).toList
    if (ops.isEmpty) rendered.head
    else if (ops.size == 1) s"${rendered(0)} ${ops(0)} ${rendered(1)}"
    else ops.indices
      .map(i => s"(${rendered(i)} ${ops(i)} ${rendered(i + 1)})")
      .mkString(" AND ")
  }

  /** Verbatim token rendering: parens recurse (they may hide boolean
    * sub-expressions), `[...]` lists become `(...)`, `in` -> `IN`.
    */
  private def renderOperand(toks: List[Tok]): String = {
    val sb = new StringBuilder
    var rest = toks
    while (rest.nonEmpty) {
      rest.head match {
        case Tok("(", _) =>
          val (inner, after) = takeGroup(rest.tail, "(", ")")
          sb.append("(").append(renderExpr(inner)).append(")")
          rest = after
        case Tok("[", _) =>
          val (inner, after) = takeGroup(rest.tail, "[", "]")
          sb.append("(").append(inner.map(_.s).mkString(" ")).append(")")
          rest = after
        case Tok(s, NotK) => sb.append(" NOT"); rest = rest.tail
        case Tok(s, _) if s.toLowerCase == "in" => sb.append(" IN "); rest = rest.tail
        case Tok(s, _) => sb.append(" ").append(s); rest = rest.tail
      }
    }
    sb.toString.trim
  }

  private def takeGroup(toks: List[Tok], open: String, close: String): (List[Tok], List[Tok]) = {
    var depth = 1
    val inner = scala.collection.mutable.ListBuffer[Tok]()
    var rest = toks
    while (rest.nonEmpty && depth > 0) {
      val t = rest.head
      if (t.s == open) depth += 1
      else if (t.s == close) depth -= 1
      if (depth > 0) inner += t
      rest = rest.tail
    }
    require(depth == 0, s"unbalanced $open$close in query expression")
    (inner.toList, rest)
  }

  /** Translate a pandas-query-dialect expression to a Spark SQL
    * boolean expression, inlining `@name` parameter references.
    */
  def translate(expr: String, params: Map[String, Any] = Map.empty): String =
    renderExpr(tokenize(expr, params))

  /** query_df equivalent (dataset_base.py:198-230): filter with a
    * pandas-dialect expression string.
    */
  def query(df: DataFrame, expr: String, params: Map[String, Any] = Map.empty): DataFrame =
    df.where(translate(expr, params))
}
