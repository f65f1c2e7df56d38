package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k VALUE multiset aggregator backing the view family's
  * MIN/MAX reserves ([[graft.memo.MemoEngine.viewState]]): keeps the k
  * most-extreme Long values per group WITH multiplicity — `dir = +1`
  * keeps the largest (a MAX reserve), `dir = -1` the smallest — and
  * emits them champion-first.
  *
  * Scale rationale: the reserve is what makes a champion retraction
  * O(delta) — the runner-up is already in the stored array, so the view
  * refresh only pays a corpus rescan when an entire reserve is exhausted
  * by retractions. Map-side partial aggregation (Aggregator, not a
  * collect_list) means the rebuild arm's shuffle carries ≤ k values per
  * group per partition, never the group's rows. k is small (default 8),
  * so the buffer is a plain sorted Vector — clarity over constant-factor
  * tuning.
  */
object ReserveAggregator {

  case class Buf(vs: Seq[Long])

  /** Aggregator over nullable Longs (nulls ignored — the caller's
    * sign-gated `when` produces them for the other side's rows). */
  def reserve(k: Int, dir: Int): Aggregator[java.lang.Long, Buf, Seq[Long]] = {
    require(k >= 1, s"reserve k must be >= 1, got $k")
    require(dir == 1 || dir == -1, s"dir must be +-1, got $dir")
    new Aggregator[java.lang.Long, Buf, Seq[Long]] {
      private def norm(s: Seq[Long]): Seq[Long] =
        s.sortBy(v => -dir * v).take(k) // champion-first
      override def zero: Buf = Buf(Vector.empty)
      override def reduce(b: Buf, v: java.lang.Long): Buf =
        if (v == null) b else Buf(norm(b.vs :+ v.longValue))
      override def merge(a: Buf, b: Buf): Buf = Buf(norm(a.vs ++ b.vs))
      override def finish(b: Buf): Seq[Long] = b.vs
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
