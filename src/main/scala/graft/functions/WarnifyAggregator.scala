package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Warnify as a single typed UDAF (SURVEY §2.9 "aggregating" surface): the
  * map-valued accumulator fold of the reference
  * (`/root/reference/src/from-ground-up.js:245-260`) as an
  * `Aggregator[IN, BUF, OUT]` registered via `functions.udaf`.
  *
  * The production pipeline composes built-ins instead
  * ([[graft.operators.Warnify]]) — collect_list + to_json stays in codegen
  * and needs no buffer serialization — but the typed form is part of the
  * declared engine surface, and the spec pins both to identical output. */
class WarnifyAggregator
    extends Aggregator[WarnifyAggregator.In, WarnifyAggregator.Buf, String] {
  import WarnifyAggregator._

  override def zero: Buf = Buf(Nil, Nil)

  override def reduce(b: Buf, in: In): Buf = in.warn_type match {
    case "managing-risk" => b.copy(managingRisk = in.warning :: b.managingRisk)
    case "concern" => b.copy(concern = in.warning :: b.concern)
    case _ => b
  }

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.managingRisk ++ b.managingRisk, a.concern ++ b.concern)

  override def finish(b: Buf): String = {
    // UTF-8 byte order, matching Spark's sort_array (binary collation) —
    // JVM String ordering compares UTF-16 code units, which diverges for
    // supplementary-plane characters
    def arr(xs: List[String]) =
      xs.sortWith(WarnifyAggregator.utf8LessThan)
        .map(s => "\"" + escape(s) + "\"").mkString("[", ",", "]")
    s"""{"managing-risk":${arr(b.managingRisk)},"concern":${arr(b.concern)}}"""
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object WarnifyAggregator {
  case class In(warn_type: String, warning: String)
  case class Buf(managingRisk: List[String], concern: List[String])

  /** UTF-8 lexicographic comparison (sort_array-compatible). */
  private[functions] def utf8LessThan(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Jackson-compatible JSON string escaping (matches to_json output). */
  private[functions] def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The registered-UDAF column form. */
  def udafColumn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new WarnifyAggregator,
      Encoders.product[In])
}
