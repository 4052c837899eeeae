package graft

import graft.ops.{SkyPoint, Skyline}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The distributed two-phase skyline must equal the quadratic dominance
  * definition (the exact check the DuckDB NOT EXISTS oracle runs) on any
  * input, for any partitioning. */
class SkylineSpec extends SparkSpec {

  private def naive(pts: Seq[SkyPoint]): Set[SkyPoint] =
    pts.filter(p => !pts.exists(q =>
      q.x >= p.x && q.y >= p.y && (q.x > p.x || q.y > p.y))).toSet

  test("property: skyline == quadratic dominance oracle on random inputs, any partitioning") {
    import spark.implicits._
    // small coordinate domain on purpose: forces x-ties, y-ties, and exact
    // duplicate points, the cases the sweep's tie rules exist for
    val genPts: Gen[List[SkyPoint]] = for {
      n <- Gen.choose(0, 40)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 8L); y <- Gen.choose(0L, 8L)
      } yield (x, y))
    } yield pts.zipWithIndex.map { case ((x, y), i) => SkyPoint(i.toLong, x, y) }
    val prop = Prop.forAll(genPts, Gen.choose(1, 7)) { (pts, parts) =>
      val got = Skyline.skyline(
        spark.createDataset(pts).repartition(parts)).collect().toSet
      got == naive(pts)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("local sweep handles sentinel coordinates (Long.MinValue)") {
    val pts = Seq(SkyPoint(1, 0, Long.MinValue), SkyPoint(2, -1, Long.MinValue))
    assert(Skyline.localSweep(pts.iterator).toSet == naive(pts))
  }

  test("duplicate frontier points are all kept; dominated duplicates are not") {
    val pts = Seq(
      SkyPoint(1, 5, 5), SkyPoint(2, 5, 5), // identical frontier twins
      SkyPoint(3, 5, 4),                    // same x, lower y: dominated
      SkyPoint(4, 4, 5),                    // same y, lower x: dominated
      SkyPoint(5, 6, 1))                    // frontier on the x axis
    assert(Skyline.localSweep(pts.iterator).map(_.key).toSet == Set(1L, 2L, 5L))
  }

  test("q113 returns a non-empty frontier with no dominated row") {
    val rows = graft.queries.Extra.q113Skyline(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pts = rows.map(r => (r.getLong(1), r.getLong(2)))
    pts.foreach { p =>
      assert(!pts.exists(q =>
        q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)))
    }
  }
}
