package graft

import graft.ext.KMeans

/** q166: the distributed k-means result is checked against a from-scratch
  * single-threaded reimplementation of the same fixed-point algorithm on
  * the collected fixture — every column (sizes, inertia, centroid
  * checksums) must agree exactly, so the distributed aggregation path
  * (VecSumAggregator + literal-centroid assignment) is pinned end to end.
  */
class KMeansSpec extends SparkSpec {

  test("q166: distributed result equals a driver-side reimplementation exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = 4; val iters = 3; val fp = 1000000L

    val raw = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val pts = raw.map { case (_, e) =>
      // HALF_UP (away from zero), matching Spark's round() on doubles —
      // math.round would floor(x+0.5), diverging on negative exact halves.
      e.map(x => BigDecimal(x.toDouble * fp)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    var cents = pts.take(k).map(_.clone())
    def assignOf(p: Array[Long]): (Int, Long) = {
      var best = -1; var bd = Long.MaxValue
      for (c <- 0 until k) {
        var d = 0L; var i = 0
        while (i < p.length) {
          val t = p(i) - cents(c)(i); d += t * t; i += 1
        }
        if (d < bd) { bd = d; best = c } // strict: ties keep lowest cl
      }
      (best, bd)
    }
    for (_ <- 1 to iters) {
      val asg = pts.map(assignOf(_)._1)
      cents = (0 until k).map { c =>
        val members = pts.indices.filter(asg(_) == c)
        if (members.isEmpty) cents(c)
        else {
          val d = pts.head.length
          Array.tabulate(d) { i =>
            val s = members.map(m => pts(m)(i)).sum
            math.floor(s.toDouble / members.size).toLong
          }
        }
      }.toArray
    }
    val fin = pts.map(assignOf)
    val expected = (0 until k).flatMap { c =>
      val ms = fin.filter(_._1 == c)
      if (ms.isEmpty) None
      else Some((c, ms.length.toLong,
        BigDecimal(ms.map(_._2).sum.toDouble / 1e12)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        cents(c).sum))
    }

    val got = KMeans.q166KMeans(spark, sf0001, k, iters)
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == pts.length.toLong)
  }

  test("q179: silhouette recomputes from the driver-side reimplementation and matches q166's sizes") {
    import spark.implicits._
    val got = KMeans.q179Silhouette(spark, sf0001)
      .as[(Int, Long, Double)].collect().toSeq
    val sizes = KMeans.q166KMeans(spark, sf0001)
      .as[(Int, Long, Double, Long)].collect().map(r => (r._1, r._2)).toSeq
    // Same assignment ⇒ same cluster sizes; silhouette bounded in [-1, 1].
    assert(got.map(r => (r._1, r._2)) == sizes)
    assert(got.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
    // Independent recomputation with the same training loop as the q166
    // spec, then per-point (a, b) and the fixed-point mean.
    val k = 4; val iters = 3; val fp = 1000000L
    val pts = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
      .map(_._2.map(x => BigDecimal(x.toDouble * fp)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    var cents = pts.take(k).map(_.clone())
    def dists(p: Array[Long]): Seq[(Long, Int)] =
      (0 until k).map { c =>
        var d = 0L; var i = 0
        while (i < p.length) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
        (d, c)
      }
    for (_ <- 1 to iters) {
      val asg = pts.map(p => dists(p).min._2)
      cents = (0 until k).map { c =>
        val ms = pts.indices.filter(asg(_) == c)
        if (ms.isEmpty) cents(c)
        else Array.tabulate(pts.head.length) { i =>
          math.floor(ms.map(m => pts(m)(i)).sum.toDouble / ms.size).toLong
        }
      }.toArray
    }
    val per = pts.map { p =>
      val s = dists(p).sorted
      val ((da, cl), (db, _)) = (s(0), s(1))
      val sfp = if (math.max(da, db) == 0) 0L
        else BigDecimal((db - da).toDouble / math.max(da, db) * fp)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (cl, sfp)
    }
    val expected = per.groupBy(_._1).toSeq.sortBy(_._1).map { case (cl, g) =>
      (cl, g.length.toLong, BigDecimal(g.map(_._2).sum / (1e6 * g.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == expected)
  }

  test("q176: streaming monitor replays as 2 micro-batches and equals the batch report exactly") {
    import spark.implicits._
    val watch = graft.sources.Staged.embeddingsWatchDir(spark, sf0001)
    val deliveries = new java.io.File(watch)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(deliveries == 2, s"expected 2 staged deliveries, got $deliveries")
    val stream = graft.streaming.KmeansMonitor
      .q176StreamingKmeans(spark, sf0001)
      .as[(Int, Long, Double, Long)].collect().toSeq
    val batch = KMeans.q166KMeans(spark, sf0001)
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(stream == batch)
  }
}
