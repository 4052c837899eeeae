package graft

import graft.ext.Bpe

/** q167: BPE merge training pinned against the classic worked example
  * (the Sennrich et al. 2016 {low×5, lower×2, newest×6, widest×3} corpus,
  * whose first merges are the textbook es → est → est</w> sequence),
  * independently hand-derivable; plus structural invariants on the real
  * fixture corpus.
  */
class BpeSpec extends SparkSpec {

  test("q167: classic corpus learns the textbook merge table") {
    import spark.implicits._
    val docs = Seq(
      ("low " * 5).trim,
      ("lower " * 2).trim,
      ("newest " * 6).trim,
      ("widest " * 3).trim).toDF("text")
    val got = Bpe.train(spark, docs, 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val expected = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L),
      (6, "e", "w", "ew", 6L))
    assert(got == expected)
  }

  test("pair exhaustion stops training cleanly with the merges learned so far") {
    import spark.implicits._
    // Vocab {a, b}: round 1 merges (a,</w>), round 2 merges (b,</w>);
    // after that every word is ONE symbol and the pair stream is empty.
    // Asking for 5 merges must return the 2 learnable ones, not index
    // into an empty collect() (the pre-round-13 crash).
    val docs = Seq("a b", "b a").toDF("text")
    val got = Bpe.train(spark, docs, 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got.length == 2, s"expected exactly the learnable merges, got $got")
    assert(got.forall(_._3 == "</w>"), s"both merges fold the end marker: $got")
    assert(got.map(_._1) == Seq(1, 2))
  }

  test("in-driver merge loop equals the distributed loop (merges, vocab, encode)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // The local path (default: vocab under the cap) against the
    // distributed path (cap 0 forces it) on the fixture corpus: identical
    // learned merges, identical final segmented vocabulary, identical
    // q168 encode output.
    val docs = graft.sources.Tables.documents(spark, sf0001)
    def run(): (Seq[(Int, String, String, String, Long)],
                Seq[(String, String, Long)], Seq[org.apache.spark.sql.Row]) = {
      val (vocab, learned) = Bpe.learnMerges(spark, docs, 6)
      (learned,
        vocab.orderBy($"word").as[(String, String, Long)].collect().toSeq,
        Bpe.encode(spark, docs, 6).collect().toSeq)
    }
    val (lmLocal, vLocal, eLocal) = run()
    spark.conf.set("spark.graft.bpe.localVocabCap", "0")
    try {
      val (lmDist, vDist, eDist) = run()
      assert(lmLocal == lmDist)
      assert(vLocal == vDist)
      assert(eLocal == eDist)
    } finally spark.conf.unset("spark.graft.bpe.localVocabCap")
  }

  test("q167: fixture-corpus merge table is monotone and well-formed") {
    import spark.implicits._
    val rows = Bpe.q167BpeTrain(spark, sf0001)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(rows.map(_._1) == (1 to 6))
    rows.foreach { case (_, lhs, rhs, merged, n) =>
      assert(merged == lhs + rhs)
      assert(n > 0)
    }
    // Each merge's support cannot exceed the earlier round's pick (the
    // earlier argmax saw this pair too, or a merge that subsumed it could
    // only have had at least this weight).
    rows.sliding(2).foreach { case Seq(a, b) => assert(b._5 <= a._5) }
  }

  test("q168: classic-corpus encoding matches the hand-derived segmentation") {
    import spark.implicits._
    // After the 6 textbook merges: low → [low, </w>] (2 tokens),
    // lower → [low, e, r, </w>] (4), newest → [n, ew, est</w>] (3),
    // widest → [w, i, d, est</w>] (4).
    val docs = Seq(
      ("x1", ("low " * 5).trim), ("x1", ("lower " * 2).trim),
      ("x2", ("newest " * 6).trim), ("x2", ("widest " * 3).trim))
      .toDF("lang", "text")
    val got = Bpe.encode(spark, docs, 6)
      .as[(String, Long, Long, Double)].collect().toSeq
    val expected = Seq(
      // x1: 7 words, 5*2+2*4 = 18 tokens, 5*3+2*5 = 25 chars
      ("x1", 7L, 18L, BigDecimal(25.0 / 18)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      // x2: 9 words, 6*3+3*4 = 30 tokens, 6*6+3*6 = 54 chars
      ("x2", 9L, 30L, 1.8))
    assert(got == expected)
  }
}
