package graft.ops

import org.apache.spark.sql.Dataset

/** A point competing on two maximize-me dimensions. Coordinates are Long so
  * dominance is exact — callers convert money to cents / quantities to units
  * before entering the skyline (the q106 fixed-point discipline).
  */
case class SkyPoint(key: Long, x: Long, y: Long)

/** Distributed 2-D skyline (Pareto frontier): the points no other point
  * dominates, where q dominates p iff q.x >= p.x && q.y >= p.y and at least
  * one is strict. Coordinate ties are kept (identical points do not dominate
  * each other), matching the NOT EXISTS dominance SQL the oracle runs.
  *
  * Plan shape is the classic two-phase skyline: an exact per-partition sweep
  * first (sort by x desc, y desc; survivors are the points whose y exceeds
  * every strictly-greater-x point's y), then the same sweep once more over
  * the union of survivors. Phase 1 is a narrow mapPartitions — no shuffle —
  * and discards everything a partition can already prove dominated, so the
  * single-partition phase 2 sees only candidate frontiers (expected
  * O(partitions x log n) points for independent dimensions), not the corpus.
  * At 100 TB the phase-2 input is still tiny because local frontiers are;
  * if a pathological correlated dataset made it large, phase 2 generalizes
  * to a tree of sweeps — the sweep is associative-ish in exactly that way.
  *
  * Local sweep correctness: after sorting by (x desc, y desc, key), a point
  * p survives iff p.y equals its x-group's max y (else the group head
  * dominates it with equal x, greater y) AND p.y > maxYStrict, the best y
  * over all strictly-greater-x points seen so far (any such point dominates
  * p when its y >= p.y, x being strictly greater).
  */
object Skyline {

  def skyline(points: Dataset[SkyPoint]): Dataset[SkyPoint] = {
    import points.sparkSession.implicits._
    val local = points.mapPartitions(localSweep)
    local.repartition(1).mapPartitions(localSweep)
  }

  private[graft] def localSweep(it: Iterator[SkyPoint]): Iterator[SkyPoint] = {
    val pts = it.toArray
    if (pts.isEmpty) return Iterator.empty
    scala.util.Sorting.stableSort(
      pts, (a: SkyPoint, b: SkyPoint) =>
        a.x > b.x || (a.x == b.x && (a.y > b.y || (a.y == b.y && a.key < b.key))))
    val out = scala.collection.mutable.ArrayBuffer.empty[SkyPoint]
    // maxYStrict is only meaningful once a strictly-greater-x group has been
    // consumed; the flag avoids a sentinel collision at y == Long.MinValue.
    var maxYStrict = Long.MinValue
    var anyStrict = false
    var i = 0
    while (i < pts.length) {
      val x = pts(i).x
      val groupMaxY = pts(i).y // y-desc within the x-group
      var j = i
      while (j < pts.length && pts(j).x == x) {
        val p = pts(j)
        if (p.y == groupMaxY && (!anyStrict || p.y > maxYStrict)) out += p
        j += 1
      }
      if (!anyStrict || groupMaxY > maxYStrict) maxYStrict = groupMaxY
      anyStrict = true
      i = j
    }
    out.iterator
  }
}
