package graft.schema

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

/** Minimal JSON AST with lexical-fidelity numbers.
  *
  * The reference engine (doctosql) stores JSON numbers as text
  * (`VARCHAR(38)`, /root/reference/src/lib/sqlMetadata.ts:35-37) to avoid
  * double-precision loss, so the exact lexical form of a number matters for
  * row-hash equality. `JNum` therefore keeps the raw token text.
  */
sealed trait JValue
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
/** `lexical` is the number exactly as it appeared in the JSON text. */
final case class JNum(lexical: String) extends JValue
final case class JStr(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
/** Field order preserved (drives attribute-tree insertion order, which in
  * turn drives table ordering like the reference's `for..in` loops). */
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  lazy val map: Map[String, JValue] = fields.toMap
  def get(name: String): Option[JValue] = map.get(name)
}

object Json {
  private val factory = new JsonFactory()

  /** Streaming Jackson parse → AST. Thread-safe (JsonFactory is). */
  def parse(text: String): JValue = {
    val p = factory.createParser(text)
    try {
      p.nextToken()
      readValue(p)
    } finally p.close()
  }

  def parseOpt(text: String): Option[JValue] =
    try Some(parse(text))
    catch { case _: Exception => None }

  private def readValue(p: JsonParser): JValue = p.currentToken() match {
    case JsonToken.START_OBJECT =>
      val buf = Vector.newBuilder[(String, JValue)]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        buf += name -> readValue(p)
      }
      JObj(buf.result())
    case JsonToken.START_ARRAY =>
      val buf = Vector.newBuilder[JValue]
      while (p.nextToken() != JsonToken.END_ARRAY) buf += readValue(p)
      JArr(buf.result())
    case JsonToken.VALUE_STRING => JStr(p.getText)
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
      JNum(p.getText)
    case JsonToken.VALUE_TRUE  => JBool(true)
    case JsonToken.VALUE_FALSE => JBool(false)
    case JsonToken.VALUE_NULL  => JNull
    case t => throw new IllegalArgumentException(s"unexpected JSON token $t")
  }

  /** Render back to compact JSON (deterministic, preserves field order and
    * number lexical form). Used by tests and the registry snapshot. */
  def render(v: JValue): String = {
    val sb = new StringBuilder
    renderTo(v, sb)
    sb.toString
  }

  private def renderTo(v: JValue, sb: StringBuilder): Unit = v match {
    case JNull     => sb.append("null")
    case JBool(b)  => sb.append(b)
    case JNum(lex) => sb.append(lex)
    case JStr(s)   => quote(s, sb)
    case JArr(xs) =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(','); first = false
        renderTo(x, sb)
      }
      sb.append(']')
    case JObj(fs) =>
      sb.append('{')
      var first = true
      fs.foreach { case (k, x) =>
        if (!first) sb.append(','); first = false
        quote(k, sb); sb.append(':'); renderTo(x, sb)
      }
      sb.append('}')
  }

  def quote(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'          => sb.append("\\\"")
      case '\\'         => sb.append("\\\\")
      case '\n'         => sb.append("\\n")
      case '\r'         => sb.append("\\r")
      case '\t'         => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c            => sb.append(c)
    }
    sb.append('"')
  }

  def quote(s: String): String = {
    val sb = new StringBuilder; quote(s, sb); sb.toString
  }
}
