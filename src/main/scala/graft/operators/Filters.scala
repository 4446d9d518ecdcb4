package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A configured record-level operator: a pure `DataFrame => DataFrame`
  * transform. Mirrors the reference's filter interface (api.go:86-100 —
  * a per-record `Process(record, next)` with mutate/drop/emit semantics)
  * re-expressed as declarative Spark plans so Catalyst can fuse, reorder
  * and push the whole chain into the scan. Chains compose with
  * `df.transform(f1).transform(f2)` or [[Transform.chain]].
  */
trait Transform extends (DataFrame => DataFrame) {
  def name: String = getClass.getSimpleName.stripSuffix("$")
}

object Transform {
  def chain(ts: Seq[Transform]): DataFrame => DataFrame =
    df => ts.foldLeft(df)((d, t) => t(d))
}

/** The reference's 24 shipped filters (registry filter/all.go:9-34), each as
  * a Column-expression transform. None of these uses a UDF or RDD: every one
  * stays inside whole-stage codegen, so a chain of N filters compiles to a
  * single fused stage with predicate pushdown — the scale story at 100 TB.
  *
  * Null semantics: the reference's records are schema-lite CSV where an
  * empty field and a missing field are the same thing (logline.go:87-89).
  * Helpers below treat null and "" as the same "empty" value.
  */
object Filters {

  /** null ≡ "" (logline.go:87-89). */
  private def nz(c: Column): Column = coalesce(c.cast("string"), lit(""))
  private def isEmpty(c: Column): Column = c.isNull || c.cast("string") === ""

  /** ClauseFilter — keep rows matching a boolean s-expression.
    * reference: filter/clausefilter.go:14-282.
    */
  final case class Clause(clause: String) extends Transform {
    override def name = "ClauseFilter"
    private val pred = ClauseFilter.compile(clause)
    def apply(df: DataFrame): DataFrame = df.filter(pred)
  }

  /** ClearFields — set listed fields to empty. reference: filter/clear_fields.go:11-56. */
  final case class ClearFields(fields: Seq[String]) extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.withColumns(fields.map(f => f -> lit(null).cast(df.schema(f).dataType)).toMap)
  }

  /** Concatenate — join field values with a separator into a target field.
    * Separator goes between fields only (concatenate.go:69-81). Null fields
    * concatenate as empty (concat_ws skips nulls, so coalesce first to keep
    * positional parity with the reference).
    * reference: filter/concatenate.go:12-82.
    */
  final case class Concatenate(fields: Seq[String], target: String, separator: String = ",")
      extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(target, concat_ws(separator, fields.map(f => nz(col(f))): _*))
  }

  /** CountAndTag — count records through, tagged by a field's value
    * (`DefaultValue` when empty). The transform itself is a pass-through
    * with an `observe` total; [[tagCounts]] is the tagged side-aggregation.
    * reference: filter/count_and_tag.go:23-81.
    */
  final case class CountAndTag(field: String, metric: String, defaultValue: String = "__nil__")
      extends Transform {
    def apply(df: DataFrame): DataFrame = df.observe(metric, count(lit(1)).as("count"))
    def tagCounts(df: DataFrame): DataFrame =
      df.groupBy(when(isEmpty(col(field)), lit(defaultValue)).otherwise(col(field)).as("tag"))
        .agg(count(lit(1)).as("cnt"))
  }

  /** Dedup — drop records whose joined key of chosen fields was seen
    * before. The reference keeps a global in-memory set
    * (filter/dedup.go:13-97, with an OOM warning at :13-21); distributed
    * `dropDuplicates` on the joined key is the scale-correct equivalent
    * (shuffle on the key, O(unique/partition)).
    */
  final case class Dedup(fields: Seq[String], keySeparator: String = "\u001e")
      extends Transform {
    def apply(df: DataFrame): DataFrame = {
      // reference parity (dedup.go:91-97 constructKey + dedup_test.go
      // "separator clash"): the dedup key is the FIELD VALUES JOINED on
      // KeySeparator, so values that straddle the separator intentionally
      // collide — ("abc","def-") and ("abc-def","") with sep "-" are ONE
      // key. Same single shuffle as tuple-keyed dropDuplicates; null ≡
      // empty per logline.go:87-89
      val key = concat_ws(keySeparator,
        fields.map(f => coalesce(col(f).cast("string"), lit(""))): _*)
      df.withColumn("__dedup_key", key)
        .dropDuplicates("__dedup_key")
        .drop("__dedup_key")
    }
  }

  /** ExpandJSON — extract JSON paths from a source field into fields.
    * Mappings are `jsonPath -> dstField` with JMESPath paths: dotted /
    * indexed segments (every shipped reference use), plus pipes
    * (`a.b | [0]`), slices (`[1:3]`, `[::2]`), list projections (`[*]`),
    * filter expressions (`[?price > `10`]`, `[?name == 'x']`), and the
    * `join` / `length` / `sort_by` / `to_string` functions from
    * go-jmespath's wider grammar. Advanced constructs route through the
    * Jackson walker even in the default codegen mode (get_json_object
    * can't express them); plain dotted/indexed paths stay on the
    * codegen'd fast path.
    *
    * Number semantics: the default (codegen) path uses `get_json_object`,
    * which preserves big integers verbatim but normalizes decimals through
    * double ("1.50" → "1.5", 19-significant-digit decimals lose precision).
    * The reference keeps number text verbatim (`UseNumber`,
    * expand_json.go:117-128); set `verbatimNumbers = true` to match it via
    * a BigDecimal-exact Jackson UDF (one parse per record for ALL paths;
    * exponent notation is canonicalized, e.g. "1e3" → "1E+3").
    * reference: filter/expand_json.go:33-145.
    */
  final case class ExpandJSON(
      source: String,
      mappings: Map[String, String],
      trueFalseValues: (String, String) = ("true", "false"),
      verbatimNumbers: Boolean = false,
  ) extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val (t, f) = trueFalseValues
      if (!verbatimNumbers && !mappings.keys.exists(ExpandJSON.isAdvancedPath)) {
        df.withColumns(mappings.map { case (path, dst) =>
          // root-array paths ([0].name) attach to $ without a dot
          val jp = if (path.startsWith("$")) path
            else if (path.startsWith("[")) s"$$$path" else s"$$.$path"
          val raw = get_json_object(col(source), jp)
          dst -> when(raw === "true", lit(t)).when(raw === "false", lit(f)).otherwise(raw)
        })
      } else {
        val paths = mappings.keys.toSeq
        val extractAll = ExpandJSON.verbatimUdf(paths)
        // single parse per record: UDF returns one array aligned with paths
        val tmp = "__json_vals"
        val withVals = df.withColumn(tmp, extractAll(col(source)))
        val out = withVals.withColumns(mappings.map { case (path, dst) =>
          val raw = col(tmp).getItem(paths.indexOf(path))
          dst -> when(raw === "true", lit(t)).when(raw === "false", lit(f)).otherwise(raw)
        })
        out.drop(tmp)
      }
    }
  }
  object ExpandJSON {
    import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

    @transient private lazy val mapper: ObjectMapper =
      new ObjectMapper()
        .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
        // default node factory strips trailing zeros from BigDecimals
        .setNodeFactory(new com.fasterxml.jackson.databind.node.JsonNodeFactory(true))

    /** Paths needing the Jackson evaluator: pipes, slices/projections,
      * filter expressions, function calls, negative indices
      * (get_json_object returns null for `[-1]` where the walker resolves
      * it from the end). Plain `a.b[2].c` stays on get_json_object.
      */
    private[operators] def isAdvancedPath(p: String): Boolean =
      p.exists(c => c == '|' || c == ':' || c == '(' || c == '*' || c == '?') ||
        p.contains("[]") || p.contains("[-")

    /** [[isAdvancedPath]] for the differential spec's battery guard. */
    private[graft] def isAdvancedPathForTest(p: String): Boolean =
      isAdvancedPath(p)

    /** Evaluate a JMESPath expression: `a.b[2].c` walks (leading `$.`
      * optional; root-array paths like `[0].name` — expand_json_test.go
      * "more complex JMESPath expression" — start with a bare index),
      * `|` pipes stages, `[start:stop:step]` slices, `[*]` / `.*` / `[]`
      * project (list / object-values / flatten), `[?lhs op rhs]` /
      * `[?expr]` filters elements (comparators on `'raw'` / `` `json` `` /
      * subexpression operands; bare form = truthiness), and the function
      * subset `join` / `length` / `sort_by` / `to_string` applies (with
      * trailing segments, `sort_by(a, &k)[0].id`). Projections map later
      * segments over elements with nulls dropped, and a pipe stops them,
      * per the JMESPath spec. Unsupported syntax → null, like the
      * reference's compile-error path (expand_json.go:80-84).
      */
    private def eval(root: JsonNode, path: String): JsonNode =
      try splitPipes(path).foldLeft(root)((n, stage) => evalStage(n, stage.trim))
      catch { case _: Exception => null }

    // split on top-level '|' (not inside quotes/brackets/parens)
    private def splitPipes(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; var quote = false; var start = 0
      for (i <- s.indices) s(i) match {
        case '\'' => quote = !quote
        case '[' | '(' if !quote => depth += 1
        case ']' | ')' if !quote => depth -= 1
        case '|' if !quote && depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      out += s.substring(start)
      out.result()
    }

    private def evalStage(node: JsonNode, stage: String): JsonNode = stage match {
      case null => null
      case _ if node == null => null
      case _ => parseCall(stage) match {
        case Some((fn, args, rest)) =>
          val out = applyFn(node, fn, args)
          if (out == null || rest.isEmpty) out
          else walkSegments(out, rest.stripPrefix("."))
        case None => walkSegments(node, stage.stripPrefix("$").stripPrefix("."))
      }
    }

    /** `fn(args)rest` with a MATCHING close paren (quote-aware) — go-jmespath
      * function calls may take trailing segments (`sort_by(a, &k)[0].id`).
      */
    private def parseCall(stage: String): Option[(String, Seq[String], String)] = {
      val open = stage.indexOf('(')
      if (open <= 0 || !stage.take(open).forall(c => c.isLetterOrDigit || c == '_'))
        return None
      var depth = 0; var quote = false; var close = -1; var i = open
      while (i < stage.length && close < 0) {
        stage(i) match {
          case '\'' => quote = !quote
          case '(' if !quote => depth += 1
          case ')' if !quote => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close < 0) return None
      Some((stage.take(open), splitArgs(stage.substring(open + 1, close)),
        stage.substring(close + 1).trim))
    }

    // split at top-level commas (quote/bracket/paren/backtick-aware)
    private def splitArgs(s: String): Seq[String] = {
      if (s.trim.isEmpty) return Nil
      val out = Seq.newBuilder[String]
      var depth = 0; var quote = false; var tick = false; var start = 0
      for (i <- s.indices) s(i) match {
        case '\'' if !tick => quote = !quote
        case '`' if !quote => tick = !tick
        case '[' | '(' if !quote && !tick => depth += 1
        case ']' | ')' if !quote && !tick => depth -= 1
        case ',' if !quote && !tick && depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      out += s.substring(start).trim
      out.result()
    }

    /** An argument / filter operand against the current node: `'raw'`
      * string literal, `` `json` `` literal, `@`(-rooted) or plain
      * subexpression (evaluated, pipes allowed), `&expr` is the caller's
      * business (sort_by strips it before calling back in).
      */
    private def operand(node: JsonNode, s: String): JsonNode = s.trim match {
      case t if t.startsWith("'") && t.endsWith("'") && t.length >= 2 =>
        mapper.getNodeFactory.textNode(t.substring(1, t.length - 1))
      case t if t.startsWith("`") && t.endsWith("`") && t.length >= 2 =>
        mapper.readTree(t.substring(1, t.length - 1))
      case "@" => node
      case t =>
        val expr = if (t.startsWith("@.")) t.drop(2) else if (t.startsWith("@")) t.drop(1) else t
        splitPipes(expr).foldLeft(node)((n, st) => evalStage(n, st.trim))
    }

    /** go-jmespath function library subset: every function a shipped
      * MessageFormat/ExpandJSON path can reach (`join`, `length`,
      * `sort_by`, `to_string`) plus the common string/array/object rest
      * (`contains`, `starts_with`, `ends_with`, `keys`, `values`,
      * `reverse`, `min`, `max`, `abs`, `ceil`, `floor`, `to_number`,
      * `not_null`, `type`, `merge`); unknown names → null like the
      * reference's compile-error path.
      */
    private def applyFn(node: JsonNode, fn: String, args: Seq[String]): JsonNode =
      (fn, args) match {
        case ("contains", Seq(subjArg, searchArg)) =>
          val f = mapper.getNodeFactory
          (operand(node, subjArg), operand(node, searchArg)) match {
            case (null, _) => null
            case (s, x) if s.isArray =>
              f.booleanNode((0 until s.size).exists(i => s.get(i) == x))
            case (s, x) if s.isTextual && x != null && x.isTextual =>
              f.booleanNode(s.asText().contains(x.asText()))
            case _ => null
          }
        case ("starts_with" | "ends_with", Seq(subjArg, prefArg)) =>
          (operand(node, subjArg), operand(node, prefArg)) match {
            case (s, p) if s != null && s.isTextual && p != null && p.isTextual =>
              mapper.getNodeFactory.booleanNode(
                if (fn == "starts_with") s.asText().startsWith(p.asText())
                else s.asText().endsWith(p.asText()))
            case _ => null
          }
        case ("keys" | "values", Seq(arg)) =>
          operand(node, arg) match {
            case o if o != null && o.isObject =>
              import scala.jdk.CollectionConverters._
              val arr = mapper.createArrayNode()
              if (fn == "keys")
                o.fieldNames().asScala.foreach(k => arr.add(mapper.getNodeFactory.textNode(k)))
              else o.elements().asScala.foreach(arr.add)
              arr
            case _ => null
          }
        case ("reverse", Seq(arg)) =>
          operand(node, arg) match {
            case a if a != null && a.isArray =>
              val arr = mapper.createArrayNode()
              (a.size - 1 to 0 by -1).foreach(i => arr.add(a.get(i)))
              arr
            case s if s != null && s.isTextual =>
              mapper.getNodeFactory.textNode(s.asText().reverse)
            case _ => null
          }
        case ("min" | "max", Seq(arg)) =>
          operand(node, arg) match {
            case a if a != null && a.isArray && a.size == 0 =>
              mapper.getNodeFactory.nullNode()
            case a if a != null && a.isArray =>
              val elems = (0 until a.size).map(a.get)
              val numOrd =
                if (fn == "max") Ordering[java.math.BigDecimal].reverse
                else Ordering[java.math.BigDecimal]
              val strOrd =
                if (fn == "max") Ordering[String].reverse else Ordering[String]
              if (elems.forall(e => e != null && e.isNumber))
                elems.min(Ordering.by((e: JsonNode) => e.decimalValue)(numOrd))
              else if (elems.forall(e => e != null && e.isTextual))
                elems.min(Ordering.by((e: JsonNode) => e.asText())(strOrd))
              else null
            case _ => null
          }
        case ("abs" | "ceil" | "floor", Seq(arg)) =>
          operand(node, arg) match {
            case n if n != null && n.isNumber =>
              val d = n.decimalValue
              val out = fn match {
                case "abs"  => d.abs
                case "ceil" => d.setScale(0, java.math.RoundingMode.CEILING)
                case _      => d.setScale(0, java.math.RoundingMode.FLOOR)
              }
              if (out.scale <= 0) mapper.getNodeFactory.numberNode(out.toBigIntegerExact)
              else mapper.getNodeFactory.numberNode(out)
            case _ => null
          }
        case ("to_number", Seq(arg)) =>
          operand(node, arg) match {
            case n if n != null && n.isNumber => n
            case s if s != null && s.isTextual =>
              try mapper.getNodeFactory.numberNode(new java.math.BigDecimal(s.asText().trim))
              catch { case _: NumberFormatException => null }
            case _ => null
          }
        case ("not_null", as) if as.nonEmpty =>
          as.iterator.map(operand(node, _))
            .find(v => v != null && !v.isNull).orNull
        case ("type", Seq(arg)) =>
          operand(node, arg) match {
            case null => null
            case n =>
              val t = if (n.isTextual) "string" else if (n.isNumber) "number"
                else if (n.isBoolean) "boolean" else if (n.isArray) "array"
                else if (n.isObject) "object" else "null"
              mapper.getNodeFactory.textNode(t)
          }
        case ("merge", as) if as.nonEmpty =>
          val objs = as.map(operand(node, _))
          if (objs.exists(o => o == null || !o.isObject)) null
          else {
            import scala.jdk.CollectionConverters._
            val out = mapper.createObjectNode()
            // replace, not set: set's generic return infers Nothing in
            // Scala statement position and the inserted cast throws
            for (o <- objs; k <- o.fieldNames().asScala.toSeq)
              out.replace(k, o.get(k))
            out
          }
        case ("join", Seq(sepArg, innerArg)) =>
          (operand(node, sepArg), operand(node, innerArg)) match {
            case (sep, a: com.fasterxml.jackson.databind.node.ArrayNode)
                if sep != null && sep.isTextual =>
              val parts = (0 until a.size).map(a.get)
              if (parts.forall(_.isTextual))
                mapper.getNodeFactory.textNode(
                  parts.map(_.asText()).mkString(sep.asText()))
              else null // join() is defined on string arrays only
            case _ => null
          }
        case ("length", Seq(arg)) =>
          operand(node, arg) match {
            case null => null
            case n if n.isArray || n.isObject => mapper.getNodeFactory.numberNode(n.size)
            case n if n.isTextual => mapper.getNodeFactory.numberNode(n.asText().length)
            case _ => null
          }
        case ("to_string", Seq(arg)) =>
          operand(node, arg) match {
            case null => null
            case n if n.isTextual => n
            case n => mapper.getNodeFactory.textNode(n.toString)
          }
        case ("sort_by", Seq(arrArg, keyArg)) =>
          val keyExpr = keyArg.trim.stripPrefix("&")
          operand(node, arrArg) match {
            case a: com.fasterxml.jackson.databind.node.ArrayNode =>
              val elems = (0 until a.size).map(a.get)
              val keys = elems.map(e => operand(e, keyExpr))
              val sorted =
                if (keys.forall(k => k != null && k.isNumber))
                  elems.zip(keys).sortBy(_._2.decimalValue).map(_._1)
                else if (keys.forall(k => k != null && k.isTextual))
                  elems.zip(keys).sortBy(_._2.asText()).map(_._1)
                else return null // mixed/unorderable keys: invalid-type
              val arr = mapper.createArrayNode()
              sorted.foreach(arr.add)
              arr
            case _ => null
          }
        case _ => null
      }

    /** JMESPath truthiness: null, false, empty string/array/object are
      * false; everything else true.
      */
    private def truthy(n: JsonNode): Boolean = n match {
      case null => false
      case _ if n.isNull => false
      case _ if n.isBoolean => n.asBoolean()
      case _ if n.isTextual => n.asText().nonEmpty
      case _ if n.isArray || n.isObject => n.size > 0
      case _ => true
    }

    private val cmpOps = Seq("==", "!=", "<=", ">=", "<", ">")

    /** `[?cond]` element predicate: `lhs op rhs` (operands per [[operand]],
      * evaluated against the ELEMENT) or bare-expression truthiness.
      * Ordering comparators are defined on numbers only (JMESPath spec);
      * elsewhere the comparison is invalid and the element is dropped.
      */
    private def evalFilterCond(elem: JsonNode, cond: String): Boolean = {
      // find a top-level comparator (quote/backtick/bracket-aware)
      var depth = 0; var quote = false; var tick = false
      var opAt = -1; var op: String = null
      var i = 0
      while (i < cond.length && opAt < 0) {
        cond(i) match {
          case '\'' if !tick => quote = !quote
          case '`' if !quote => tick = !tick
          case '[' | '(' if !quote && !tick => depth += 1
          case ']' | ')' if !quote && !tick => depth -= 1
          case _ if !quote && !tick && depth == 0 =>
            cmpOps.find(o => cond.startsWith(o, i)) match {
              case Some(o) => opAt = i; op = o
              case None =>
            }
          case _ =>
        }
        if (opAt < 0) i += 1
      }
      if (opAt < 0) return truthy(operand(elem, cond))
      val l = operand(elem, cond.take(opAt))
      val r = operand(elem, cond.drop(opAt + op.length))
      def eq: Boolean =
        if (l == null || r == null) l == r
        else if (l.isNumber && r.isNumber) l.decimalValue.compareTo(r.decimalValue) == 0
        else l == r
      op match {
        case "==" => eq
        case "!=" => !eq
        case _ =>
          if (l == null || r == null || !l.isNumber || !r.isNumber) false
          else {
            val c = l.decimalValue.compareTo(r.decimalValue)
            op match {
              case "<" => c < 0; case "<=" => c <= 0
              case ">" => c > 0; case ">=" => c >= 0
            }
          }
      }
    }

    private val sliceRe = """^(-?\d*)\:(-?\d*)(?:\:(-?\d*))?$""".r

    private def walkSegments(root: JsonNode, expr: String): JsonNode = {
      // tokenize into identifiers and bracket ops, then fold with
      // projection state: project=true means `nodes` are the elements of
      // an open projection and each token maps over them
      var nodes: Vector[JsonNode] = Vector(root)
      var project = false
      def mapStep(f: JsonNode => Iterator[JsonNode]): Unit =
        nodes = nodes.iterator.flatMap(n => if (n == null) Iterator.empty else f(n))
          .filter(_ != null).toVector
      for (tok <- tokenize(expr)) tok match {
        case Ident(name) =>
          if (project) mapStep(n => Iterator(n.get(name)))
          else nodes = nodes.map(n => if (n == null) null else n.get(name))
        case Index(i) =>
          def at(n: JsonNode): JsonNode =
            if (!n.isArray) null else n.get(if (i < 0) n.size + i else i)
          if (project) mapStep(n => Iterator(at(n)))
          else nodes = nodes.map(n => if (n == null) null else at(n))
        case Star =>
          mapStep(n => if (n.isArray) (0 until n.size).iterator.map(n.get)
            else Iterator.empty)
          project = true
        case ObjStar =>
          import scala.jdk.CollectionConverters._
          mapStep(n => if (n.isObject) n.elements().asScala else Iterator.empty)
          project = true
        case Flatten =>
          mapStep { n =>
            if (!n.isArray) Iterator.empty
            else (0 until n.size).iterator.map(n.get).flatMap(e =>
              if (e != null && e.isArray) (0 until e.size).iterator.map(e.get)
              else Iterator(e))
          }
          project = true
        case Filt(cond) =>
          mapStep(n => if (!n.isArray) Iterator.empty
            else (0 until n.size).iterator.map(n.get)
              .filter(e => e != null && evalFilterCond(e, cond)))
          project = true
        case Slice(a, b, st) =>
          mapStep { n =>
            if (!n.isArray) Iterator.empty
            else {
              val len = n.size
              val step = st.getOrElse(1)
              if (step == 0) throw new IllegalArgumentException("step 0")
              def clamp(v: Int): Int = math.max(if (v < 0) len + v else v, if (step > 0) 0 else -1)
              val from = a.map(clamp).getOrElse(if (step > 0) 0 else len - 1)
              val until = b.map(clamp).getOrElse(if (step > 0) len else -1)
              Range(math.min(from, if (step > 0) len else len - 1), until, step)
                .iterator.filter(i => i >= 0 && i < len).map(n.get)
            }
          }
          project = true
      }
      if (project) {
        val arr = mapper.createArrayNode()
        nodes.foreach(arr.add)
        arr
      } else nodes.headOption.orNull
    }

    private sealed trait Tok
    private final case class Ident(name: String) extends Tok
    private final case class Index(i: Int) extends Tok
    private final case class Slice(from: Option[Int], until: Option[Int], step: Option[Int])
      extends Tok
    private final case class Filt(cond: String) extends Tok // [?cond]
    private case object Star extends Tok    // [*]
    private case object ObjStar extends Tok // .*
    private case object Flatten extends Tok // []

    // matching close bracket (nesting + quote aware: a filter body may
    // itself contain brackets, e.g. [?tags[0] == 'x'])
    private def matchBracket(expr: String, open: Int): Int = {
      var depth = 0; var quote = false; var tick = false; var i = open
      while (i < expr.length) {
        expr(i) match {
          case '\'' if !tick => quote = !quote
          case '`' if !quote => tick = !tick
          case '[' if !quote && !tick => depth += 1
          case ']' if !quote && !tick =>
            depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }

    private def tokenize(expr: String): Seq[Tok] = {
      val out = Seq.newBuilder[Tok]
      var i = 0
      while (i < expr.length) expr(i) match {
        case '.' => i += 1
        case '[' =>
          val close = matchBracket(expr, i)
          require(close > i, s"unclosed bracket in '$expr'")
          val body = expr.substring(i + 1, close).trim
          body match {
            case ""  => out += Flatten
            case "*" => out += Star
            case b if b.startsWith("?") => out += Filt(b.drop(1).trim)
            case sliceRe(a, b, c) =>
              def opt(s: String) = Option(s).filter(_.nonEmpty).map(_.toInt)
              out += Slice(opt(a), opt(b), opt(c))
            case n => out += Index(n.toInt)
          }
          i = close + 1
        case _ =>
          val end = expr.indexWhere(c => c == '.' || c == '[', i)
          val stop = if (end < 0) expr.length else end
          val name = expr.substring(i, stop).trim
          require(name.nonEmpty, s"empty segment in '$expr'")
          out += (if (name == "*") ObjStar else Ident(name))
          i = stop
      }
      out.result()
    }

    private def render(n: JsonNode): String =
      if (n == null || n.isNull) null
      else if (n.isTextual) n.asText()
      else if (n.isNumber) n.decimalValue match {
        case _ if n.isIntegralNumber => n.bigIntegerValue.toString
        case d                       => d.toString
      }
      else n.toString // bool / object / array → JSON text

    /** One (json, path) evaluation through the exact verbatimUdf kernel
      * (parse → eval → render) — the surface ExpandJsonPropertySpec
      * fuzzes against the documented subset grammar without a Spark job
      * per case.
      */
    private[graft] def evalPath(json: String, path: String): String = {
      val root = try mapper.readTree(json) catch { case _: Exception => null }
      if (root == null) null else render(eval(root, path))
    }

    private[operators] def verbatimUdf(paths: Seq[String])
        : Column => Column = {
      val f = udf { (json: String) =>
        if (json == null) paths.map(_ => null: String)
        else {
          val root = try mapper.readTree(json) catch { case _: Exception => null }
          if (root == null) paths.map(_ => null: String)
          else paths.map(p => render(eval(root, p)))
        }
      }
      c => f(c)
    }
  }

  /** ExpandList — split a source field on a separator; mappings are
    * `listIndex -> dstField`. Out-of-range indexes yield empty, as the
    * reference leaves the dst untouched/empty. reference: filter/expand_list.go:36-131.
    */
  final case class ExpandList(source: String, mappings: Map[Int, String], separator: String = ";")
      extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val arr = split(nz(col(source)), java.util.regex.Pattern.quote(separator))
      df.withColumns(mappings.map { case (i, dst) =>
        dst -> coalesce(try_element_at(arr, lit(i + 1)), lit(""))
      })
    }
  }

  /** ExternalMatch — keep (or drop) rows whose field value is in an external
    * value set. The reference loads CSVs into an in-memory set with periodic
    * refresh (filter/external_match.go:25-264); at Spark scale this is a
    * broadcast left-semi/anti join, which AQE keeps shuffle-free for any
    * realistically-sized match set.
    */
  final case class ExternalMatch(field: String, values: DataFrame, keepOnMatch: Boolean = false)
      extends Transform {
    override def name = "ExternalMatch"
    def apply(df: DataFrame): DataFrame = {
      val vcol = values.columns.head
      val joinType = if (keepOnMatch) "left_semi" else "left_anti"
      df.join(broadcast(values.select(col(vcol).cast("string").as("__match_v")).distinct()),
        nz(col(field)) === col("__match_v"), joinType)
    }
  }

  /** FormatTime — parse a source time field and re-format into dst; parse
    * failure clears dst but keeps the record (format_time.go:113-122).
    * Named Go layouts translate to JDK patterns; `unix`/`unixms`/`unixns`
    * are epoch integers. reference: filter/format_time.go:12-210.
    */
  final case class FormatTime(
      src: String,
      dst: String,
      srcFormat: String = "UnixDate",
      dstFormat: String = "unixms",
  ) extends Transform {
    import FormatTime._
    def apply(df: DataFrame): DataFrame = {
      val parsed: Column = srcFormat match {
        case "unix"   => timestamp_seconds(try_cast_long(col(src)))
        case "unixms" => timestamp_millis(try_cast_long(col(src)))
        // integral `div`: `/` goes through double and loses precision at
        // epoch-nanosecond magnitudes (>2^53)
        case "unixns" =>
          timestamp_micros(call_function("div", try_cast_long(col(src)), lit(1000L)))
        case fmt      => try_to_timestamp(col(src).cast("string"), lit(layout(fmt)))
      }
      val out: Column = dstFormat match {
        case "unix"   => unix_timestamp(parsed).cast("string")
        case "unixms" => unix_millis(parsed).cast("string")
        case "unixns" => (unix_micros(parsed) * 1000).cast("string")
        case fmt      => date_format(parsed, layout(fmt))
      }
      df.withColumn(dst, out)
    }
  }
  object FormatTime {
    private def try_cast_long(c: Column): Column = c.cast("string").try_cast("long")
    /** Go named layouts → JDK DateTimeFormatter patterns (format_time.go:125-150). */
    def layout(name: String): String = name match {
      case "ANSIC"       => "EEE MMM ppd HH:mm:ss yyyy"
      case "UnixDate"    => "EEE MMM ppd HH:mm:ss zzz yyyy"
      case "RubyDate"    => "EEE MMM dd HH:mm:ss Z yyyy"
      case "RFC822"      => "dd MMM yy HH:mm zzz"
      case "RFC822Z"     => "dd MMM yy HH:mm Z"
      case "RFC850"      => "EEEE, dd-MMM-yy HH:mm:ss zzz"
      case "RFC1123"     => "EEE, dd MMM yyyy HH:mm:ss zzz"
      case "RFC1123Z"    => "EEE, dd MMM yyyy HH:mm:ss Z"
      case "RFC3339"     => "yyyy-MM-dd'T'HH:mm:ssXXX"
      case "RFC3339Nano" => "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX"
      // a custom GO layout (the reference-time convention — format_time
      // tests use e.g. "Jan-02-2006_15:04:05") is detected by its
      // reference-date tokens and translated; anything else is assumed to
      // already be a JDK pattern
      case custom if custom.contains("2006") || custom.contains("15:04") =>
        translateGoLayout(custom)
      case custom        => custom
    }

    /** Go reference-time tokens → JDK pattern tokens, longest-first. */
    private val goTokens: Seq[(String, String)] = Seq(
      "2006" -> "yyyy", "January" -> "MMMM", "Monday" -> "EEEE",
      "Jan" -> "MMM", "Mon" -> "EEE",
      ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
      ".999999999" -> ".SSSSSSSSS", ".999999" -> ".SSSSSS", ".999" -> ".SSS",
      "-07:00" -> "XXX", "Z07:00" -> "XXX", "-0700" -> "Z", "Z0700" -> "XX",
      "-07" -> "X", "MST" -> "zzz", "_2" -> "ppd",
      "15" -> "HH", "03" -> "hh", "04" -> "mm", "05" -> "ss",
      "02" -> "dd", "01" -> "MM", "06" -> "yy", "PM" -> "a", "pm" -> "a",
      "3" -> "h", "4" -> "m", "5" -> "s", "2" -> "d", "1" -> "M")

    /** Translate a Go layout: map reference-time tokens, single-quote any
      * other letter run (JDK treats bare letters as pattern characters).
      */
    private[graft] def translateGoLayout(go: String): String = {
      val sb = new StringBuilder
      var i = 0
      def tokenAt(j: Int): Option[(String, String)] =
        goTokens.find { case (tok, _) => go.startsWith(tok, j) }
      while (i < go.length) {
        tokenAt(i) match {
          case Some((tok, jdk)) => sb.append(jdk); i += tok.length
          case None =>
            val c = go.charAt(i)
            if (c.isLetter) {
              var j = i + 1
              while (j < go.length && go.charAt(j).isLetter && tokenAt(j).isEmpty) j += 1
              sb.append('\'').append(go.substring(i, j)).append('\'')
              i = j
            } else { sb.append(c); i += 1 }
        }
      }
      sb.toString
    }
  }

  /** Hash — md5/sha256 of src into dst (hex). On empty src the reference
    * errors and DROPS the record (crypt-family semantics, hash.go:94-118
    * via RaiseError): we drop rows whose src is null.
    * reference: filter/hash.go:14-121.
    */
  final case class Hash(src: String, dst: String, function: String = "md5") extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val h = function.toLowerCase match {
        case "md5"    => md5(col(src).cast("binary"))
        case "sha256" => sha2(col(src).cast("binary"), 256)
        case other    => throw new IllegalArgumentException(s"unknown hash function: $other")
      }
      df.filter(col(src).isNotNull).withColumn(dst, h)
    }
  }

  /** MetadataLastModified — copy file metadata last-modified (unix secs)
    * into a field. reference: filter/metadata_lastmodified.go:12-58.
    * Requires a file-based source; `_metadata` is Spark's hidden file column.
    */
  final case class MetadataLastModified(dst: String) extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(dst, unix_timestamp(col("_metadata.file_modification_time")).cast("string"))
  }

  /** MetadataUrl — copy the source file URL into a field.
    * reference: filter/metadata_url.go:12-79.
    */
  final case class MetadataUrl(dst: String) extends Transform {
    def apply(df: DataFrame): DataFrame = df.withColumn(dst, input_file_name())
  }

  /** NotNull — drop rows where any listed field is empty or null
    * (empty ≡ null, logline.go:87-89). reference: filter/notnull.go:10-62.
    */
  final case class NotNull(fields: Seq[String]) extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.filter(fields.map(f => !isEmpty(col(f))).reduce(_ && _))
  }

  /** PartialClone — emit a new record with only the listed fields; all other
    * fields empty. reference: filter/partial_clone.go:9-57.
    */
  final case class PartialClone(fields: Seq[String]) extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val keep = fields.toSet
      df.select(df.columns.map { c =>
        if (keep(c)) col(c) else lit(null).cast(df.schema(c).dataType).as(c)
      }.toIndexedSeq: _*)
    }
  }

  /** RegexMatch — keep rows where field(i) matches regex(i) for ALL i;
    * `invert` drops rows where ANY matches (regex_match.go:70-90 polarity).
    * reference: filter/regex_match.go:11-100.
    */
  final case class RegexMatch(patterns: Seq[(String, String)], invert: Boolean = false)
      extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val all = patterns.map { case (f, re) => nz(col(f)).rlike(re) }.reduce(_ && _)
      if (invert) df.filter(!patterns.map { case (f, re) => nz(col(f)).rlike(re) }.reduce(_ || _))
      else df.filter(all)
    }
  }

  /** ReplaceFields — copy src fields onto dst fields and/or set dst fields
    * to fixed literals. reference: filter/replace_fields.go:10-113.
    */
  final case class ReplaceFields(
      copies: Seq[(String, String)] = Nil,    // (srcField, dstField)
      literals: Seq[(String, String)] = Nil,  // (value, dstField)
  ) extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val dsts = (copies.map(_._2) ++ literals.map(_._2))
      require(dsts.distinct.size == dsts.size, "ReplaceFields: duplicate destination field")
      df.withColumns(
        copies.map { case (s, d) => d -> col(s) }.toMap ++
          literals.map { case (v, d) => d -> lit(v) }.toMap)
    }
  }

  /** SetStringFromURL — set a field to the first configured literal found in
    * the source-file URL path; DROP the row when none match
    * (set_string_from_url.go:68-82). reference: filter/set_string_from_url.go:14-84.
    * [[fromColumn]] applies the same semantics to an arbitrary column.
    */
  final case class SetStringFromURL(dst: String, strings: Seq[String]) extends Transform {
    def apply(df: DataFrame): DataFrame =
      SetStringFromURL.fromColumn(df, dst, parse_url(input_file_name(), lit("PATH")), strings)
  }
  object SetStringFromURL {
    def fromColumn(df: DataFrame, dst: String, src: Column, strings: Seq[String]): DataFrame = {
      val tag = strings.foldLeft(lit(null).cast("string")) { (acc, s) =>
        when(acc.isNotNull, acc).when(src.contains(s), lit(s)).otherwise(lit(null).cast("string"))
      }
      df.withColumn(dst, tag).filter(col(dst).isNotNull)
    }
  }

  /** Slice — substring src[start,end) into dst, clamped to the value length.
    * The reference slices BYTES (slice.go:9-87); on ASCII data `substring`
    * is identical, on multi-byte UTF-8 this operates on characters (see
    * SURVEY §7.2 — documented divergence).
    */
  final case class Slice(src: String, dst: String, start: Int, end: Int) extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(dst, substring(nz(col(src)), start + 1, end - start))
  }

  /** StringMatch — drop rows whose field equals any of the literals;
    * `invert` keeps only matching rows (string_match.go:76).
    * reference: filter/string_match.go:11-82.
    */
  final case class StringMatch(field: String, strings: Seq[String], invert: Boolean = false)
      extends Transform {
    def apply(df: DataFrame): DataFrame = {
      // null field ≡ "" (logline.go:87-89), compiled WITHOUT coalesce so the
      // In/Not(In) predicate reaches the parquet scan as a pushed filter;
      // both branches are definite (never NULL) so negation is exact
      val f = col(field).cast("string")
      val nonEmpty = strings.filterNot(_.isEmpty)
      val matchesNonEmpty =
        if (nonEmpty.nonEmpty) f.isNotNull && f.isin(nonEmpty: _*) else lit(false)
      val matchesEmpty =
        if (strings.exists(_.isEmpty)) f.isNull || f === lit("") else lit(false)
      val matches = matchesNonEmpty || matchesEmpty
      df.filter(if (invert) matches else !matches)
    }
  }

  /** Timestamp — set a field to the processing-time unix seconds.
    * reference: filter/timestamp.go:11-52.
    */
  final case class Timestamp(field: String) extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(field, unix_timestamp(current_timestamp()).cast("string"))
  }

  /** TimestampRange — keep rows with `start <= epochField < end` (upper bound
    * EXCLUSIVE, timestamp_range.go:99); non-numeric values drop the row.
    * reference: filter/timestamp_range.go:12-105.
    */
  final case class TimestampRange(field: String, startSec: Long, endSec: Long) extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val epoch = col(field).cast("string").try_cast("long")
      df.filter(epoch.isNotNull && epoch >= startSec && epoch < endSec)
    }
  }

  /** URLEscape — percent-encode or -decode src into dst; decode failure
    * clears dst but keeps the row (url_escape.go:58-71).
    * reference: filter/url_escape.go:12-79.
    */
  final case class URLEscape(src: String, dst: String, decode: Boolean = false) extends Transform {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(dst, if (decode) try_url_decode(nz(col(src))) else url_encode(nz(col(src))))
  }

  /** URLParam — extract a query parameter from a URL field ("" when the URL
    * is bad or the param missing). reference: filter/url_param.go:10-73.
    *
    * Go's `url.Parse` accepts RELATIVE urls — the reference's own test
    * extracts from "/home?parameter_a=value_a" — while Spark's parse_url
    * rejects scheme-less input; scheme-less values get a placeholder
    * scheme+host prefixed so the query part parses identically.
    */
  final case class URLParam(src: String, dst: String, param: String) extends Transform {
    def apply(df: DataFrame): DataFrame = {
      val u = nz(col(src))
      // absolute = LEADING scheme only: a relative URL embedding an
      // absolute one in a query value ("/redirect?to=http://x") must still
      // take the placeholder-scheme path, like Go's url.Parse
      val full = when(u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), u)
        .otherwise(concat(lit("http://graft.invalid"),
          when(u.startsWith("/"), u).otherwise(concat(lit("/"), u))))
      df.withColumn(dst, coalesce(try_parse_url(full, lit("QUERY"), lit(param)), lit("")))
    }
  }
}
