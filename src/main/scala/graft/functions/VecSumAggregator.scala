package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector-sum aggregator over `Array[Long]` columns — the
  * partial-aggregate building block for distributed centroid updates
  * (q166 k-means) and any other "sum a fixed-width feature vector per
  * group" reduction.
  *
  * Versus posexploding the vector into (group, dim, value) rows and
  * summing per (group, dim), this keeps the vector WHOLE through the
  * aggregation: each map task folds its rows into one length-d buffer per
  * group, so the shuffle moves one d-long array per (group × partition)
  * instead of d rows per input row — at a 64-dim embedding table that is
  * a 64× cut in shuffled row count, and the reduce side needs no re-zip.
  *
  * Inputs may be empty (the zero buffer) but otherwise must share one
  * length; the first non-empty input fixes d. Long arithmetic is exact and
  * order-independent, which the fixed-point cross-engine discipline
  * (see `ext/Quality`) relies on.
  */
object VecSumAggregator {

  class VecSum extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
      // Symmetric empty-guard: Spark currently only ever passes the zero
      // buffer as the FIRST argument, but a general-purpose aggregator
      // must not index past an empty second argument either.
      if (b.isEmpty) a.clone()
      else if (a.isEmpty) b
      else {
        // Loud on violated shared-length contract: iterating b.length alone
        // would silently DROP a longer input's tail (wrong sums, no error)
        // while a shorter one threw — asymmetric and order-dependent.
        require(a.length == b.length,
          s"vector aggregate over mismatched lengths: ${a.length} vs ${b.length}")
        var i = 0
        while (i < b.length) { b(i) += a(i); i += 1 }
        b
      }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      reduce(b1, b2)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Element-wise vector-MIN twin of [[VecSum]] — the partial-aggregate
    * form of a per-group MinHash sketch: each map task folds its rows'
    * k-long component vectors into one running-minimum buffer per group,
    * so the shuffle moves one k-long array per (group × partition) instead
    * of k posexploded rows per input row (q185's 64-component source
    * sketch: 64× fewer aggregate input rows). Same empty-buffer and
    * shared-length contract as VecSum; min is exact and order-independent,
    * so the result is bit-identical to the posexplode + min-per-(group, j)
    * form. */
  class VecMin extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
      if (b.isEmpty) a.clone()
      else if (a.isEmpty) b
      else {
        require(a.length == b.length,
          s"vector aggregate over mismatched lengths: ${a.length} vs ${b.length}")
        var i = 0
        while (i < b.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
        b
      }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      reduce(b1, b2)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
