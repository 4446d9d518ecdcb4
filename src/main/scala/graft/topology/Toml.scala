package graft.topology

import scala.collection.mutable

/** Minimal TOML parser covering the reference's topology-config subset
  * (reference: config.go:16-34 uses a full TOML lib, but topologies only
  * exercise this grammar):
  *
  *   - `[table]` and nested `[a.b]` headers
  *   - `[[array.of.tables]]`
  *   - `key = value` with string ("..." with backslash escapes, '...'),
  *     integer, float, boolean, and (possibly multiline) homogeneous arrays
  *   - `#` comments, blank lines
  *   - `${VAR}` environment expansion over the raw text before parsing
  *     (reference: config.go:221-231)
  *
  * Zero-egress environment ⇒ no TOML dependency is resolvable; this
  * ~150-line subset parser is deliberate, not an oversight.
  *
  * Result shape: nested `Map[String, Any]` where array-of-tables is
  * `List[Map[String, Any]]` and arrays are `List[Any]`.
  */
object Toml {

  def parse(text: String, env: Map[String, String] = sys.env): Map[String, Any] = {
    val expanded = expandEnv(text, env)
    val root = mutable.LinkedHashMap[String, Any]()
    var current: mutable.LinkedHashMap[String, Any] = root

    val lines = expanded.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val line = stripComment(lines(i)).trim
      if (line.isEmpty) { i += 1 }
      else if (line.startsWith("[[") && line.endsWith("]]")) {
        val path = line.substring(2, line.length - 2).trim.split('.').map(_.trim)
        current = appendArrayTable(root, path.toIndexedSeq)
        i += 1
      } else if (line.startsWith("[") && line.endsWith("]")) {
        val path = line.substring(1, line.length - 1).trim.split('.').map(_.trim)
        current = descend(root, path.toIndexedSeq)
        i += 1
      } else {
        val eq = indexOfUnquoted(line, '=')
        require(eq > 0, s"TOML: expected 'key = value' at line ${i + 1}: '$line'")
        val key = unquoteKey(line.substring(0, eq).trim)
        var valueText = line.substring(eq + 1).trim
        if (valueText.startsWith("\"\"\"")) {
          // multiline basic string: consume raw lines until the closing """
          while (!(valueText.length >= 6 && valueText.endsWith("\"\"\"")) &&
              i + 1 < lines.length) {
            i += 1
            valueText += "\n" + lines(i)
          }
          current.put(key, valueText.substring(3, valueText.length - 3).stripPrefix("\n"))
        } else {
          // multiline array: keep consuming lines until brackets balance
          while (bracketBalance(valueText) > 0 && i + 1 < lines.length) {
            i += 1
            valueText += "\n" + stripComment(lines(i)).trim
          }
          current.put(key, parseValue(valueText.trim, i + 1))
        }
        i += 1
      }
    }
    deepImmutable(root)
  }

  def parseFile(path: String, env: Map[String, String] = sys.env): Map[String, Any] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"), env)

  /** `${VAR}` → env value; unset vars expand to "" (reference semantics:
    * os.Expand with Getenv, config.go:221-231).
    */
  def expandEnv(text: String, env: Map[String, String]): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r.replaceAllIn(text,
      m => java.util.regex.Matcher.quoteReplacement(env.getOrElse(m.group(1), "")))

  // --- internals ---

  private def stripComment(line: String): String = {
    var inB, inL = false
    var i = 0
    while (i < line.length) {
      line(i) match {
        case '"' if !inL  => inB = !inB
        case '\'' if !inB => inL = !inL
        case '#' if !inB && !inL => return line.substring(0, i)
        case '\\' if inB  => i += 1
        case _ =>
      }
      i += 1
    }
    line
  }

  private def indexOfUnquoted(s: String, ch: Char): Int = {
    var inB, inL = false
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '"' if !inL  => inB = !inB
        case '\'' if !inB => inL = !inL
        case '\\' if inB  => i += 1
        case c if c == ch && !inB && !inL => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def unquoteKey(k: String): String =
    if ((k.startsWith("\"") && k.endsWith("\"")) || (k.startsWith("'") && k.endsWith("'")))
      k.substring(1, k.length - 1)
    else k

  private def bracketBalance(s: String): Int = {
    var bal = 0
    var inB, inL = false
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '"' if !inL  => inB = !inB
        case '\'' if !inB => inL = !inL
        case '\\' if inB  => i += 1
        case '[' if !inB && !inL => bal += 1
        case ']' if !inB && !inL => bal -= 1
        case _ =>
      }
      i += 1
    }
    bal
  }

  private[topology] def parseValue(v: String, line: Int): Any = v match {
    case "" => ""
    case _ if v.startsWith("\"") =>
      require(v.endsWith("\"") && v.length >= 2, s"TOML: unterminated string at line $line")
      unescape(v.substring(1, v.length - 1))
    case _ if v.startsWith("'") =>
      require(v.endsWith("'") && v.length >= 2, s"TOML: unterminated string at line $line")
      v.substring(1, v.length - 1)
    case _ if v.startsWith("[") =>
      require(v.endsWith("]"), s"TOML: unterminated array at line $line")
      splitTopLevel(v.substring(1, v.length - 1)).map(e => parseValue(e.trim, line))
    case "true"  => true
    case "false" => false
    case _ if v.matches("[+-]?[0-9][0-9_]*") => v.replace("_", "").toLong
    case _ if v.matches("[+-]?[0-9][0-9_]*\\.[0-9_]+([eE][+-]?[0-9]+)?") ||
              v.matches("[+-]?[0-9][0-9_]*[eE][+-]?[0-9]+") =>
      v.replace("_", "").toDouble
    case other =>
      throw new IllegalArgumentException(s"TOML: cannot parse value at line $line: '$other'")
  }

  private def splitTopLevel(s: String): List[String] = {
    val out = List.newBuilder[String]
    var depth = 0
    var inB, inL = false
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      c match {
        case '"' if !inL  => inB = !inB; cur += c
        case '\'' if !inB => inL = !inL; cur += c
        case '\\' if inB  => cur += c; if (i + 1 < s.length) { cur += s(i + 1); i += 1 }
        case '[' if !inB && !inL => depth += 1; cur += c
        case ']' if !inB && !inL => depth -= 1; cur += c
        case ',' if depth == 0 && !inB && !inL => out += cur.toString; cur.clear()
        case '\n' if !inB && !inL => // newline inside multiline array
        case _ => cur += c
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result()
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case '"' => sb += '"'; case '\\' => sb += '\\'
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 4
          case other => sb += other
        }
        i += 2
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  private def descend(root: mutable.LinkedHashMap[String, Any], path: Seq[String])
      : mutable.LinkedHashMap[String, Any] = {
    var cur = root
    for (p <- path) {
      cur = cur.getOrElseUpdate(p, mutable.LinkedHashMap[String, Any]()) match {
        case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
        case buf: mutable.ArrayBuffer[Any @unchecked] =>
          // [a.b] after [[a]]: descend into the LAST array element
          buf.last.asInstanceOf[mutable.LinkedHashMap[String, Any]]
        case other =>
          throw new IllegalArgumentException(s"TOML: '$p' is both value and table ($other)")
      }
    }
    cur
  }

  private def appendArrayTable(root: mutable.LinkedHashMap[String, Any], path: Seq[String])
      : mutable.LinkedHashMap[String, Any] = {
    val parent = descend(root, path.init)
    val buf = parent.getOrElseUpdate(path.last, mutable.ArrayBuffer[Any]()) match {
      case b: mutable.ArrayBuffer[Any @unchecked] => b
      case other =>
        throw new IllegalArgumentException(s"TOML: '${path.last}' is not an array of tables")
    }
    val t = mutable.LinkedHashMap[String, Any]()
    buf += t
    t
  }

  private def deepImmutable(v: Any): Map[String, Any] = fix(v).asInstanceOf[Map[String, Any]]

  private def fix(v: Any): Any = v match {
    case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
      // preserve insertion order (filters are order-sensitive)
      scala.collection.immutable.VectorMap.from(m.map { case (k, x) => k -> fix(x) })
    case b: mutable.ArrayBuffer[Any @unchecked] => b.toList.map(fix)
    case l: List[Any @unchecked] => l.map(fix)
    case other => other
  }
}
