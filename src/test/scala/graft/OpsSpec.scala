package graft

import graft.ops.AsOfJoin
import graft.functions.{RollingHash, RollingHashKernel, VectorOps}
import org.apache.spark.unsafe.types.UTF8String

/** As-of join semantics and native-expression kernels. */
class OpsSpec extends SparkSpec {

  test("as-of join picks latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 100L, "l3"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, 50L, 5.0), (1L, 150L, 15.0), (1L, 200L, 20.0), (2L, 300L, 30.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.lookup(left, right, Seq("k"), "t", Seq("v"))
      .select("payload", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("l1") == 5.0)   // latest right at t<=100 is t=50
    assert(out("l2") == 20.0)  // right at exactly t=200 counts (ties: right first)
    assert(out("l3") == null)  // no right row at or before t=100 for k=2
  }

  test("rolling-hash fingerprint: codegen result equals kernel; equal text equal hash") {
    import spark.implicits._
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "a completely different document body here")
    val out = texts.toDF("text")
      .select(RollingHash.rollingHashMin($"text", 8)).collect().map(_.getLong(0))
    assert(out(0) == out(1))
    assert(out(0) != out(2))
    assert(out(0) == RollingHashKernel.minRollingHash(UTF8String.fromString(texts.head), 8))
  }

  test("native as-of join exec equals the composed formulation (handcrafted + events)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 100L, "l3"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, 50L, 5.0), (1L, 150L, 15.0), (1L, 200L, 20.0), (2L, 300L, 30.0))
      .toDF("k", "t", "v")
    val composed = AsOfJoin.lookup(left, right, Seq("k"), "t", Seq("v"))
      .select("k", "t", "payload", "asof_v").collect().map(_.toSeq).toSet
    val native = graft.plans.NativeAsOfJoin.lookup(left, right, Seq("k"), "t", Seq("v"))
      .select("k", "t", "payload", "asof_v").collect().map(_.toSeq).toSet
    assert(native == composed)

    // real events data: clicks pick up the latest prior view value
    val ev = graft.sources.Tables.events(spark, sf0001)
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id", "ts_ns", "event_id", "value")
    val views = ev.filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .selectExpr("user_id", "ts_ns", "value AS view_value")
    val c2 = AsOfJoin.lookup(clicks, views, Seq("user_id"), "ts_ns", Seq("view_value"))
      .select("event_id", "asof_view_value").collect().map(_.toSeq).toSet
    val n2 = graft.plans.NativeAsOfJoin.lookup(clicks, views, Seq("user_id"), "ts_ns", Seq("view_value"))
      .select("event_id", "asof_view_value").collect().map(_.toSeq).toSet
    assert(n2 == c2)
  }

  test("property: both as-of implementations equal a naive reference on random inputs") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0, 99)
    } yield (k, t, v.toDouble)
    val prop = Prop.forAll(Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen)) { (l, r) =>
      // right side unique on (k,t): equal-time ties between right rows are
      // undefined order in every implementation
      val rs = r.groupBy(x => (x._1, x._2)).map(_._2.head).toList
      val left = l.toDF("k", "t", "payload")
      val right = rs.toDF("k", "t", "v")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "t", "payload", "asof_v").collect()
          .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2),
            if (row.isNullAt(3)) None else Some(row.getDouble(3))))
          .sortBy(x => (x._1, x._2, x._3)).toSeq
      val composed = canon(AsOfJoin.lookup(left, right, Seq("k"), "t", Seq("v")))
      val native = canon(graft.plans.NativeAsOfJoin.lookup(left, right, Seq("k"), "t", Seq("v")))
      val naive = l.map { case (k, t, p) =>
        val m = rs.filter(x => x._1 == k && x._2 <= t)
        (k, t, p, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.sortBy(x => (x._1, x._2, x._3)).toSeq
      composed == naive && native == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("native kernels equal their HOF reference formulations on real data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(50)
    val pair = emb.select($"vec_id", $"embedding")
      .crossJoin(emb.select($"embedding".as("e2")).limit(3))
    val cosDiff = pair.select(
        abs(VectorOps.cosine($"embedding", $"e2") -
          VectorOps.cosineHof($"embedding", $"e2")).as("d"))
      .agg(max($"d")).collect().head.getDouble(0)
    assert(cosDiff == 0.0)

    val lshEq = emb.select(
        (graft.ext.Similarity.lshSignatures($"embedding") ===
         graft.ext.Similarity.lshSignaturesHof($"embedding")).as("eq"))
      .collect().forall(_.getBoolean(0))
    assert(lshEq)

    val docs = graft.sources.Tables.documents(spark, sf0001).limit(50)
      .withColumn("hs", graft.ext.Dedup.hashedShingles(
        graft.ext.Dedup.wordShingles($"text", 3)))
    val mhEq = docs.select(
        (graft.ext.Dedup.minhashSignature($"hs") ===
         graft.ext.Dedup.minhashSignatureHof($"hs")).as("eq"))
      .collect().forall(_.getBoolean(0))
    assert(mhEq)
  }

  test("vector ops: cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine($"a", $"b"), VectorOps.cosine($"a", $"c")).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }
}
