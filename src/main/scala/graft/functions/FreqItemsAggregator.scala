package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted Misra–Gries frequent-items sketch as a typed `Aggregator` —
  * fixed memory (≤ k counters per partial), map-side partial aggregation,
  * executor-side merge. The shape `stat.freqItems` lacks: Spark's built-in
  * runs on the legacy RDD path and merges its per-partition maps ON THE
  * DRIVER, a cost that grows with partition count; this aggregator
  * partial-aggregates like any hash agg (the q19 HLL / q84 quantile
  * sibling shape), so the driver only ever sees the final ≤ k items.
  *
  * Algorithm (Misra & Gries 1982; weighted form and the mergeability
  * result per Agarwal, Cormode et al., "Mergeable Summaries", PODS 2012):
  *
  *  - update(t, w): add w to t's counter (insert if absent); while more
  *    than k counters are live, subtract the (k+1)-th largest counter
  *    value from ALL counters and drop the zeros (for a single overflowing
  *    insert that value is just the minimum).
  *  - merge: sum counters pointwise, then apply the same shrink.
  *
  * Every unit subtracted is subtracted from ≥ k+1 counters at once, so
  * total undercount per item ≤ W/(k+1) for total weight W — any item with
  * true weight > W/(k+1) is GUARANTEED present in the final counter set
  * (no false negatives above that support), and the bound survives merge
  * (errors add, weights add). Feeding the sketch pre-aggregated
  * (item, count) rows — e.g. a term-frequency table — is the weighted
  * update and preserves the guarantee for the underlying raw stream.
  */
object FreqItemsAggregator {

  /** ≤ k live counters. Immutable map: inputs are vocabulary-sized
    * aggregates in the designed use, so per-update cost is never hot. */
  case class MgBuf(k: Int, counts: Map[String, Long])

  private def shrink(k: Int, m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // (k+1)-th largest value: everything strictly above it survives.
      // The per-insert overflow (size == k+1, the reduce hot case) needs
      // only the minimum — O(size) without the sort.
      val cut =
        if (m.size == k + 1) m.valuesIterator.min
        else m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      m.iterator.collect { case (t, v) if v > cut => t -> (v - cut) }.toMap
    }

  /** Frequent-items sketch with capacity k → the surviving items, sorted.
    * Guarantee: contains every item whose total weight exceeds W/(k+1). */
  def frequentItems(k: Int): Aggregator[(String, Long), MgBuf, Seq[String]] = {
    require(k >= 1, s"capacity must be >= 1, got $k")
    new Aggregator[(String, Long), MgBuf, Seq[String]] {
      override def zero: MgBuf = MgBuf(k, Map.empty)
      override def reduce(b: MgBuf, a: (String, Long)): MgBuf = {
        val (t, w) = a
        if (w <= 0L) b
        else MgBuf(b.k, shrink(b.k, b.counts.updated(t, b.counts.getOrElse(t, 0L) + w)))
      }
      override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
        val (small, big) =
          if (b1.counts.size < b2.counts.size) (b1.counts, b2.counts)
          else (b2.counts, b1.counts)
        val merged = small.foldLeft(big) { case (m, (t, v)) =>
          m.updated(t, m.getOrElse(t, 0L) + v)
        }
        MgBuf(b1.k, shrink(b1.k, merged))
      }
      override def finish(b: MgBuf): Seq[String] = b.counts.keys.toSeq.sorted
      override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
