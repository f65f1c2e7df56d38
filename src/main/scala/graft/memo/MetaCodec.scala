package graft.memo

import scala.jdk.CollectionConverters._

import org.apache.spark.unsafe.types.UTF8String

/** Typed string encoding for memo metadata values.
  *
  * The reference engine (/root/reference/memo_cli.py) keeps metadata as
  * parsed YAML — values stay dynamically typed, and the filter algebra's
  * comparison semantics depend on the ORIGINAL type (memo_cli.py:179-222):
  * `compare_values` is numeric only when BOTH sides are Python numbers
  * (bool included — it subclasses int), `$prefix` matches `isinstance(value,
  * str)` only, and record-deletion truthiness is Python `bool(...)` (any
  * non-empty string is truthy, including "false").
  *
  * This engine stores metadata as `MAP<STRING,STRING>`; to keep the typed
  * semantics, every value is stored as a one-sigil-prefixed typed string:
  *
  *   - `s<raw>`            string, payload verbatim
  *   - `i<digits>`         int, payload = Python `str(int)`
  *   - `f<repr>`           float, payload = Python `repr(float)`
  *                         (`2.0`, `100000.0`, `1e+16`, `1.5e-05`, `inf`)
  *   - `bTrue` / `bFalse`  bool, payload = Python `str(bool)`
  *   - `z`                 None
  *   - `l<json-array>`     list; elements are JSON strings holding the
  *                         typed encoding of each element (recursive)
  *   - `m<json-object>`    mapping; values are JSON strings holding typed
  *                         encodings (recursive), keys raw strings
  *
  * Scalar payloads are exactly the Python `str()` rendering, so equality /
  * ordering comparisons and display never re-derive them per row. All
  * methods here are deterministic, allocation-light, and callable from
  * generated code (static forwarders) — see
  * [[graft.functions.MetaExpressions]].
  */
object MetaCodec {

  // ---------------------------------------------------------------- encode

  /** Encode a parsed YAML value (java or scala types) as a typed string. */
  def encode(v: Any): String = v match {
    case null => "z"
    case b: java.lang.Boolean => if (b) "bTrue" else "bFalse"
    case i: java.lang.Integer => "i" + i
    case l: java.lang.Long => "i" + l
    case s: java.lang.Short => "i" + s
    case b: java.lang.Byte => "i" + b
    case bi: java.math.BigInteger => "i" + bi
    case bi: BigInt => "i" + bi
    case d: java.lang.Double => "f" + pyFloatRepr(d)
    case f: java.lang.Float => "f" + pyFloatRepr(f.toDouble)
    case bd: java.math.BigDecimal => "f" + pyFloatRepr(bd.doubleValue)
    case s: String => "s" + s
    case l: java.util.List[_] =>
      "l" + l.asScala.iterator.map(e => jsonQuote(encode(e)))
        .mkString("[", ",", "]")
    case m: java.util.Map[_, _] =>
      // .iterator keeps the source mapping's insertion order (a .map on the
      // wrapper would rebuild into an unordered HashMap)
      "m" + m.asScala.iterator.map { case (k, x) =>
        jsonQuote(String.valueOf(k)) + ":" + jsonQuote(encode(x))
      }.mkString("{", ",", "}")
    case l: Seq[_] =>
      "l" + l.iterator.map(e => jsonQuote(encode(e))).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      "m" + m.iterator.map { case (k, x) =>
        jsonQuote(String.valueOf(k)) + ":" + jsonQuote(encode(x))
      }.mkString("{", ",", "}")
    case other => "s" + other.toString
  }

  def sigil(t: String): Char = if (t.isEmpty) 's' else t.charAt(0)
  def payload(t: String): String = if (t.isEmpty) "" else t.substring(1)

  // ---------------------------------------------------- Python str()/repr()

  /** Python `str()` of the decoded value (memo_cli.py:195-198 uses str()
    * coercion for equality and lexicographic compare). */
  def pyStr(t: String): String = sigil(t) match {
    case 's' | 'i' | 'f' | 'b' => payload(t)
    case 'z' => "None"
    case 'l' =>
      parseJsonStringArray(payload(t)).map(pyReprTyped).mkString("[", ", ", "]")
    case 'm' =>
      parseJsonStringMap(payload(t)).map { case (k, v) =>
        pyReprStr(k) + ": " + pyReprTyped(v)
      }.mkString("{", ", ", "}")
    case _ => t // untagged legacy value: treat as raw string
  }

  /** Python `repr()` of a typed value — used for container elements
    * (Python's list/dict str() calls repr() on elements). */
  def pyReprTyped(t: String): String = sigil(t) match {
    case 's' => pyReprStr(payload(t))
    case 'i' | 'f' | 'b' => payload(t)
    case 'z' => "None"
    case _ => pyStr(t) // containers: str == repr
  }

  /** Python string repr: single quotes, double when the string holds a
    * single quote but no double quote; \n/\r/\t/\\ escapes, \xNN for other
    * control chars. */
  def pyReprStr(s: String): String = {
    val hasSingle = s.indexOf('\'') >= 0
    val hasDouble = s.indexOf('"') >= 0
    val q = if (hasSingle && !hasDouble) '"' else '\''
    val sb = new StringBuilder(s.length + 2)
    sb.append(q)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case c if c == q => sb.append('\\').append(q)
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' || c == '\u007f' => sb.append(f"\\x${c.toInt}%02x")
      case c => sb.append(c)
    }
    sb.append(q)
    sb.toString
  }

  /** Python `repr(float)`: shortest round-trip digits, fixed notation for
    * 1e-4 <= |v| < 1e16, else scientific with signed 2-digit exponent. */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    val neg = d < 0.0 || (d == 0.0 && 1.0 / d < 0.0)
    val sign = if (neg) "-" else ""
    val bd = new java.math.BigDecimal(java.lang.Double.toString(math.abs(d)))
      .stripTrailingZeros()
    if (bd.unscaledValue().signum() == 0) return sign + "0.0"
    val digits = bd.unscaledValue().abs().toString
    val e = digits.length - 1 - bd.scale() // decimal exponent of first digit
    if (e >= 16 || e < -4) {
      val mant =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (e < 0) f"-${-e}%02d" else f"+$e%02d"
      s"$sign${mant}e$es"
    } else if (e >= digits.length - 1) {
      sign + digits + "0" * (e - (digits.length - 1)) + ".0"
    } else if (e >= 0) {
      sign + digits.substring(0, e + 1) + "." + digits.substring(e + 1)
    } else {
      sign + "0." + ("0" * (-e - 1)) + digits
    }
  }

  /** Parse a Python float repr payload back to a double. */
  def parsePyFloat(p: String): Double = p match {
    case "inf" => Double.PositiveInfinity
    case "-inf" => Double.NegativeInfinity
    case "nan" => Double.NaN
    case _ => java.lang.Double.parseDouble(p)
  }

  // ----------------------------------------------------- typed predicates

  /** Python `isinstance(value, (int, float))` — bools are ints in Python. */
  def isNumeric(t: String): Boolean = sigil(t) match {
    case 'i' | 'f' | 'b' => true
    case _ => false
  }

  def numValue(t: String): Double = sigil(t) match {
    case 'i' => java.lang.Double.parseDouble(payload(t))
    case 'f' => parsePyFloat(payload(t))
    case 'b' => if (t == "bTrue") 1.0 else 0.0
    case _ => Double.NaN
  }

  /** Python `bool(value)` truthiness (memo_cli.py:146-155 uses it for the
    * deleted flag): non-empty strings are truthy — including "false". */
  def truthy(t: String): Boolean = sigil(t) match {
    case 'b' => t == "bTrue"
    case 'i' => BigInt(payload(t)) != 0
    case 'f' => parsePyFloat(payload(t)) != 0.0
    case 's' => payload(t).nonEmpty
    case 'z' => false
    case 'l' => parseJsonStringArray(payload(t)).nonEmpty
    case 'm' => parseJsonStringMap(payload(t)).nonEmpty
    case _ => t.nonEmpty
  }

  /** Reference `is_deleted_record`'s body variant (memo_cli.py:145-154):
    * body YAML-parses to a mapping whose "deleted" key is truthy. Parse
    * failures and non-mapping bodies are never deleted. */
  def bodyDeleted(body: String): Boolean = {
    if (body == null) return false
    val parsed =
      try {
        // PyYAML 1.1 typing: `deleted: yes` is a truthy bool here, matching
        // the reference's safe_load of the body (memo_cli.py:145-154)
        new org.snakeyaml.engine.v2.api.Load(Yaml11Schema.loadSettings)
          .loadFromString(body)
      } catch { case _: Exception => return false }
    parsed match {
      case m: java.util.Map[_, _] =>
        m.asScala.collectFirst {
          case (k: String, v) if k == "deleted" => truthy(encode(v))
        }.getOrElse(false)
      case _ => false
    }
  }

  // ------------------------------------------------------------- display

  /** Reference `format_cell` (memo_cli.py:552-557): None → "", containers →
    * YAML flow dump (stripped), scalars → Python str(). */
  def display(t: String): String = sigil(t) match {
    case 's' | 'i' | 'f' | 'b' => payload(t)
    case 'z' => ""
    case 'l' | 'm' => flowYaml(t)
    case _ => t
  }

  /** YAML flow rendering of a typed value (PyYAML
    * `safe_dump(default_flow_style=True).strip()` semantics). */
  def flowYaml(t: String): String = sigil(t) match {
    case 's' => yamlScalar(payload(t), flow = true)
    case 'i' => payload(t)
    case 'f' => yamlFloat(payload(t))
    case 'b' => if (t == "bTrue") "true" else "false"
    case 'z' => "null"
    case 'l' =>
      val es = parseJsonStringArray(payload(t))
      if (es.isEmpty) "[]" else es.map(flowYaml).mkString("[", ", ", "]")
    case 'm' =>
      val es = parseJsonStringMap(payload(t))
      if (es.isEmpty) "{}"
      else es.map { case (k, v) =>
        yamlScalar(k, flow = true) + ": " + flowYaml(v)
      }.mkString("{", ", ", "}")
    case _ => yamlScalar(t, flow = true)
  }

  /** YAML rendering of a float payload: PyYAML writes a mantissa decimal
    * point in scientific notation (`1e+16` → `1.0e+16`) and dotted forms
    * for infinities. */
  def yamlFloat(p: String): String = p match {
    case "inf" => ".inf"
    case "-inf" => "-.inf"
    case "nan" => ".nan"
    case _ =>
      val ei = p.indexOf('e')
      if (ei >= 0 && p.indexOf('.') < 0)
        p.substring(0, ei) + ".0" + p.substring(ei)
      else p
  }

  // --------------------------------------------------------- YAML export

  /** Emit a typed value as a YAML node (scalars quoted so our own importer
    * re-parses them to the identical typed value; containers flow-style). */
  def exportValue(t: String): String = sigil(t) match {
    case 's' => yamlScalar(payload(t), flow = false)
    case 'i' => payload(t)
    case 'f' => yamlFloat(payload(t))
    case 'b' => if (t == "bTrue") "true" else "false"
    case 'z' => "null"
    case 'l' | 'm' => flowYaml(t)
    case _ => yamlScalar(t, flow = false)
  }

  /** Scalars a YAML 1.1 resolver (the reference's PyYAML) would type as
    * something other than a string even though YAML 1.2 (snakeyaml here)
    * keeps them strings: bool/null words (yes/on/…), leading-zero octal
    * ints ("007"), hex/binary/underscored numbers, sexagesimals, .inf/.nan,
    * ISO dates/timestamps. Quoting these keeps the export readable by BOTH
    * resolvers as the same string. Over-quoting is always safe. */
  private val Yaml11Ambiguous = java.util.regex.Pattern.compile(
    "^(?:yes|Yes|YES|no|No|NO|true|True|TRUE|false|False|FALSE" +
      "|on|On|ON|off|Off|OFF|~|null|Null|NULL" +
      "|[-+]?(?:0b[01_]+|0o?[0-7_]+|0x[0-9a-fA-F_]+|[0-9][0-9_]*(?::[0-5]?[0-9])*)" +
      "|[-+]?(?:\\.[0-9_]+|[0-9][0-9_]*(?:\\.[0-9_]*)?)(?:[eE][-+]?[0-9]+)?" +
      "|[-+]?\\.(?:inf|Inf|INF)|\\.(?:nan|NaN|NAN)" +
      "|[0-9]{4}-[0-9]{1,2}-[0-9]{1,2}([Tt ].*)?)$")

  /** Quote a string scalar for YAML emission. Plain only when it is
    * structurally safe AND re-parses (via snakeyaml) to exactly itself AND
    * is not YAML-1.1-ambiguous — so "007", "true", "1e5", "null", "yes"
    * etc all get quoted and round-trip as strings under both resolvers
    * (reference keeps them typed via PyYAML's own resolver). */
  def yamlScalar(s: String, flow: Boolean): String = {
    if (s.isEmpty) return "''"
    if (s.exists(c => c < ' ' || c == '\u007f')) return jsonQuote(s)
    val plainOk =
      !s.head.isWhitespace && !s.last.isWhitespace &&
        s.forall(c => plainChar(c, flow)) &&
        !s.contains(": ") && !s.endsWith(":") && !s.startsWith("#") &&
        !Yaml11Ambiguous.matcher(s).matches() &&
        reparsesToSelf(s)
    if (plainOk) s
    else "'" + s.replace("'", "''") + "'"
  }

  private def plainChar(c: Char, flow: Boolean): Boolean = c match {
    case '[' | ']' | '{' | '}' | ',' | '"' | '\'' | '#' | '&' | '*' | '!' |
        '|' | '>' | '%' | '@' | '`' => false
    case ':' => !flow // colon allowed in block plain scalars, not flow
    case _ => c >= ' ' && c != '\u007f'
  }

  private def reparsesToSelf(s: String): Boolean =
    try {
      // the 1.1 schema makes this check exact for BOTH resolvers: any
      // scalar PyYAML would type as non-string fails here and gets quoted
      new org.snakeyaml.engine.v2.api.Load(Yaml11Schema.loadSettings)
        .loadFromString(s) match {
        case r: String => r == s
        case _ => false
      }
    } catch { case _: Exception => false }

  // --------------------------------------------------- flat JSON helpers

  /** JSON-escape a string (used for container payload elements). */
  def jsonQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Parse a flat JSON array whose elements are all strings. */
  def parseJsonStringArray(s: String): Vector[String] = {
    val p = new JsonCursor(s)
    p.ws(); p.expect('[')
    val out = Vector.newBuilder[String]
    p.ws()
    if (p.peek == ']') { p.next(); return out.result() }
    var more = true
    while (more) {
      p.ws(); out += p.string(); p.ws()
      if (p.peek == ',') { p.next() } else { p.expect(']'); more = false }
    }
    out.result()
  }

  /** Parse a flat JSON object whose values are all strings; preserves
    * key order (Python dicts are insertion-ordered). */
  def parseJsonStringMap(s: String): Vector[(String, String)] = {
    val p = new JsonCursor(s)
    p.ws(); p.expect('{')
    val out = Vector.newBuilder[(String, String)]
    p.ws()
    if (p.peek == '}') { p.next(); return out.result() }
    var more = true
    while (more) {
      p.ws(); val k = p.string(); p.ws(); p.expect(':'); p.ws()
      val v = p.string(); p.ws()
      out += ((k, v))
      if (p.peek == ',') { p.next() } else { p.expect('}'); more = false }
    }
    out.result()
  }

  private final class JsonCursor(s: String) {
    private var i = 0
    def peek: Char = if (i < s.length) s.charAt(i) else ' '
    def next(): Char = {
      if (i >= s.length) throw new IllegalArgumentException(
        s"truncated container payload: $s")
      val c = s.charAt(i); i += 1; c
    }
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit =
      if (next() != c) throw new IllegalArgumentException(
        s"malformed container payload at $i in: $s")
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        val c = next()
        c match {
          case '"' => done = true
          case '\\' =>
            next() match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                val hex = s.substring(i, i + 4); i += 4
                sb.append(Integer.parseInt(hex, 16).toChar)
              case other => sb.append(other)
            }
          case ' ' => throw new IllegalArgumentException(
            s"unterminated string in container payload: $s")
          case other => sb.append(other)
        }
      }
      sb.toString
    }
  }

  // -------------------------------------------- UTF8String codegen entry

  def pyStrU(t: UTF8String): UTF8String = UTF8String.fromString(pyStr(t.toString))
  def displayU(t: UTF8String): UTF8String = UTF8String.fromString(display(t.toString))
  def flowYamlU(t: UTF8String): UTF8String = UTF8String.fromString(flowYaml(t.toString))
  def yamlScalarU(t: UTF8String): UTF8String =
    UTF8String.fromString(yamlScalar(t.toString, flow = true))
  def truthyU(t: UTF8String): Boolean = truthy(t.toString)
  def isNumericU(t: UTF8String): Boolean = isNumeric(t.toString)
  def numValueU(t: UTF8String): Double = numValue(t.toString)
  def bodyDeletedU(b: UTF8String): Boolean = bodyDeleted(b.toString)
}
