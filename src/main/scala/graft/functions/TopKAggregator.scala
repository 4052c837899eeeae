package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §7: custom `Aggregator` for
  * streaming top-k similarity).
  *
  * Versus `row_number().over(Window)` ranking, this is a partial aggregate:
  * each map task keeps only its local top-k (bounded buffer), so the shuffle
  * moves k rows per (group × partition) instead of every candidate row —
  * the difference between shipping 100 TB of scored pairs and shipping
  * kilobytes. Results are identical (same score-desc, id-asc total order).
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)
  case class TopKBuf(items: List[Scored])

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  class TopK(k: Int) extends Aggregator[Scored, TopKBuf, List[Scored]] {
    // Loud, not degrading: with k <= 0 the buffer is permanently empty, so
    // the fast-path `items.last` below would throw NoSuchElementException
    // mid-aggregation — an executor-side crash with a useless stack trace
    // where the construction site is the actual bug.
    require(k > 0, s"TopK needs k > 0, got $k")
    override def zero: TopKBuf = TopKBuf(Nil)
    // Buffer is kept sorted best-first, so when it is full and the new row
    // is no better than the current worst (`items.last`) the row is
    // rejected in O(k) with zero allocation — the overwhelmingly common
    // case on a large scoring pass; the O(k log k) rebuild runs only on
    // genuine top-k entries.
    override def reduce(b: TopKBuf, a: Scored): TopKBuf =
      if (b.items.lengthCompare(k) >= 0 && ord.gteq(a, b.items.last)) b
      else TopKBuf((a :: b.items).sorted(ord).take(k))
    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
      TopKBuf((b1.items ++ b2.items).sorted(ord).take(k))
    override def finish(r: TopKBuf): List[Scored] = r.items.sorted(ord)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  }
}
