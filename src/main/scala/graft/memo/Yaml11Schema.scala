package graft.memo

import java.util.regex.Pattern

import org.snakeyaml.engine.v2.api.ConstructNode
import org.snakeyaml.engine.v2.nodes.{Node, ScalarNode, Tag}
import org.snakeyaml.engine.v2.resolver.ScalarResolver
import org.snakeyaml.engine.v2.schema.CoreSchema

/** PyYAML (YAML 1.1) scalar resolution for the import paths.
  *
  * The reference loads YAML with PyYAML's `safe_load`
  * (/root/reference/memo_cli.py:66, 371), whose implicit resolver follows
  * YAML 1.1: `yes`/`on`/`Off` are booleans, leading-zero ints are octal
  * (`007` → 7), `0x`/`0b`/underscored/sexagesimal (`1:30` → 90) numbers
  * resolve, and a float exponent only counts WITH a sign (`1.5e+3` is a
  * float but `1.5e3` is a string — a famous PyYAML quirk, reproduced
  * deliberately). snakeyaml-engine's default schema is YAML 1.2 Core, which
  * types all of these differently; this schema swaps in the PyYAML rules so
  * foreign YAML imports get the same typed metadata the reference would.
  *
  * Exports need no counterpart: [[MetaCodec.yamlScalar]] already quotes
  * every 1.1-ambiguous string, so both resolvers read our own output
  * identically.
  *
  * Deliberately NOT mirrored: PyYAML's timestamp resolution (a bare
  * `2026-03-14` stays a string here; the reference's metadata date handling
  * parses strings anyway) and Python's arbitrary-precision ints (values
  * beyond Long range fall back to strings).
  */
class Yaml11Schema extends CoreSchema {
  import Yaml11Schema._

  override def getScalarResolver: ScalarResolver = PyResolver

  // built once per schema instance — queried on every parse
  private lazy val constructors: java.util.Map[Tag, ConstructNode] = {
    val m = new java.util.HashMap[Tag, ConstructNode](super.getSchemaTagConstructors)
    m.put(Tag.BOOL, (node: Node) => {
      val v = scalar(node).toLowerCase
      java.lang.Boolean.valueOf(v == "yes" || v == "true" || v == "on")
    })
    m.put(Tag.INT, (node: Node) => pyInt(scalar(node)))
    m.put(Tag.FLOAT, (node: Node) => pyFloat(scalar(node)))
    java.util.Collections.unmodifiableMap(m)
  }

  override def getSchemaTagConstructors: java.util.Map[Tag, ConstructNode] =
    constructors

  private def scalar(node: Node): String = node.asInstanceOf[ScalarNode].getValue
}

object Yaml11Schema {
  /** Shared parse settings (immutable, thread-safe; `Load` instances are
    * created per call). Built once per JVM — body-YAML probes run per ROW,
    * so rebuilding schema + settings there would be measurable churn. */
  val loadSettings: org.snakeyaml.engine.v2.api.LoadSettings =
    org.snakeyaml.engine.v2.api.LoadSettings.builder()
      .setSchema(new Yaml11Schema()).build()

  // PyYAML resolver.py implicit patterns (public PyYAML source, YAML 1.1)
  private val BoolP = Pattern.compile(
    "^(?:yes|Yes|YES|no|No|NO|true|True|TRUE|false|False|FALSE" +
      "|on|On|ON|off|Off|OFF)$")
  private val IntP = Pattern.compile(
    "^(?:[-+]?0b[0-1_]+|[-+]?0[0-7_]+|[-+]?(?:0|[1-9][0-9_]*)" +
      "|[-+]?0x[0-9a-fA-F_]+|[-+]?[1-9][0-9_]*(?::[0-5]?[0-9])+)$")
  private val FloatP = Pattern.compile(
    "^(?:[-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+][0-9]+)?" +
      "|\\.[0-9_]+(?:[eE][-+][0-9]+)?" +
      "|[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*" +
      "|[-+]?\\.(?:inf|Inf|INF)|\\.(?:nan|NaN|NAN))$")
  private val NullP = Pattern.compile("^(?:~|null|Null|NULL|)$")

  private object PyResolver extends ScalarResolver {
    override def resolve(value: String, implicitFlag: java.lang.Boolean): Tag = {
      if (!implicitFlag) return Tag.STR
      if (value.isEmpty) return Tag.NULL
      val c = value.charAt(0)
      if ("yYnNtTfFoO".indexOf(c) >= 0 && BoolP.matcher(value).matches())
        Tag.BOOL
      else if ((c == '-' || c == '+' || (c >= '0' && c <= '9')) &&
          IntP.matcher(value).matches() && inLongRange(value))
        Tag.INT
      else if ((c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) &&
          FloatP.matcher(value).matches())
        Tag.FLOAT
      else if ("~nN".indexOf(c) >= 0 && NullP.matcher(value).matches())
        Tag.NULL
      else Tag.STR
    }
  }

  /** Python ints are unbounded; here values that overflow Long stay
    * strings rather than silently truncating. */
  private def inLongRange(raw: String): Boolean =
    try { pyInt(raw); true } catch { case _: NumberFormatException => false }

  private def pyInt(raw: String): java.lang.Long = {
    var s = raw.replace("_", "")
    var sign = 1L
    if (s.startsWith("-")) { sign = -1L; s = s.substring(1) }
    else if (s.startsWith("+")) s = s.substring(1)
    val v =
      if (s == "0") 0L
      else if (s.startsWith("0b")) java.lang.Long.parseLong(s.substring(2), 2)
      else if (s.startsWith("0x")) java.lang.Long.parseLong(s.substring(2), 16)
      else if (s.contains(":"))
        s.split(":").foldLeft(0L)((acc, p) => acc * 60L + java.lang.Long.parseLong(p))
      else if (s.startsWith("0")) java.lang.Long.parseLong(s, 8)
      else java.lang.Long.parseLong(s)
    java.lang.Long.valueOf(sign * v)
  }

  private def pyFloat(raw: String): java.lang.Double = {
    var s = raw.replace("_", "").toLowerCase
    var sign = 1.0
    if (s.startsWith("-")) { sign = -1.0; s = s.substring(1) }
    else if (s.startsWith("+")) s = s.substring(1)
    val v =
      if (s == ".inf") Double.PositiveInfinity
      else if (s == ".nan") Double.NaN
      else if (s.contains(":"))
        s.split(":").foldLeft(0.0)((acc, p) => acc * 60.0 + p.toDouble)
      else s.toDouble
    java.lang.Double.valueOf(sign * v)
  }
}
