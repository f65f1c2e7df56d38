package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded exact value→multiplicity dictionary aggregator backing the
  * view family's COUNT DISTINCT measures
  * ([[graft.memo.MemoEngine.viewState]]): per group, the full multiset
  * of STRING values with exact counts while the group's distinct
  * cardinality stays ≤ `cap` — or NULL once it exceeds it (the
  * "overflowed" marker; the group's scalar distinct count is then
  * maintained separately and the group rescans when next touched).
  *
  * Scale rationale — the reserve idiom ([[ReserveAggregator]])
  * generalized to an aggregate with no order structure: COUNT DISTINCT
  * has no additive inverse, but a retraction against a group whose FULL
  * value dictionary is stored is exact — decrement one instance,
  * drop the key at zero, the scalar is the key count. The cap bounds
  * state size per group (cap+1 entries worst case in any partial
  * buffer) and the shuffle carries ≤ cap+1 (value, count) pairs per
  * group per partition — never the group's rows. Nulls are ignored
  * (SQL COUNT(DISTINCT) semantics, and what DuckDB replays). */
object DictAggregator {

  case class Buf(m: Map[String, Long], over: Boolean)

  def dict(cap: Int): Aggregator[String, Buf, Map[String, Long]] = {
    require(cap >= 1, s"dict cap must be >= 1, got $cap")
    new Aggregator[String, Buf, Map[String, Long]] {
      private def clamp(m: Map[String, Long]): Buf =
        if (m.size > cap) Buf(Map.empty, over = true) else Buf(m, over = false)
      override def zero: Buf = Buf(Map.empty, over = false)
      override def reduce(b: Buf, v: String): Buf =
        if (b.over || v == null) b
        else clamp(b.m.updated(v, b.m.getOrElse(v, 0L) + 1L))
      override def merge(a: Buf, b: Buf): Buf =
        if (a.over) a
        else if (b.over) b
        else clamp(b.m.foldLeft(a.m) { case (m, (v, c)) =>
          m.updated(v, m.getOrElse(v, 0L) + c)
        })
      override def finish(b: Buf): Map[String, Long] =
        if (b.over) null else b.m
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
