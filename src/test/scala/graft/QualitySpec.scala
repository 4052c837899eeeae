package graft

import org.apache.spark.sql.functions._
import graft.ext.Quality
import graft.queries.Extra

/** Properties of the quality/sampling/graph/sketch ops that the DuckDB
  * oracle can't (or only partially) express: LM-score semantics on a planted
  * corpus, A-ES sampling stability, triangle-count ground truth, and sketch
  * rollup losslessness. */
class QualitySpec extends SparkSpec {

  /** A tiny controlled corpus written as a documents.parquet table dir. */
  private def writeCorpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_quality_").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q115: repeated-bigram doc scores lower nll than unique-bigram doc; value matches hand formula") {
    val dir = writeCorpus(Seq(
      (1L, "the cat sat the cat sat the cat sat the cat sat", "en"),
      (2L, "zq wv xk jm qf vb hz kd mw fj bn dg", "en"),
      (3L, "the cat sat on the mat", "en")))
    val out = Quality.q115LmQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Doc 2 (all-unseen bigrams) must be the most surprising; doc 1 (one
    // bigram repeated) the least.
    assert(out(2L)._2 > out(3L)._2, s"unique-bigram doc not above mixed doc: $out")
    assert(out(3L)._2 > out(1L)._2, s"mixed doc not above repeated doc: $out")
    // Hand formula for doc 1: tokens = (the cat sat)*4 — bigrams the>cat x4,
    // cat>sat x4, sat>the x3. Recompute expected nll with the same add-one
    // model over the full 3-doc corpus.
    val docs = Seq(
      "the cat sat the cat sat the cat sat the cat sat",
      "zq wv xk jm qf vb hz kd mw fj bn dg",
      "the cat sat on the mat").map(_.split("[^a-z]+").filter(_.nonEmpty).toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val v = uni.size
    val bi = docs.flatMap(t => t.zip(t.tail)).groupBy(identity).view.mapValues(_.size).toMap
    def nll(tokens: Seq[String]): Double = {
      val bs = tokens.zip(tokens.tail)
      val fps = bs.map { case (w1, w2) =>
        math.round(-math.log((bi((w1, w2)) + 1.0) / (uni(w1) + v)) * 1e6)
      }
      BigDecimal(fps.sum.toDouble / (1e6 * bs.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L)._1 === 11L)
    assert(math.abs(out(1L)._2 - nll(docs.head)) < 1e-9,
      s"doc1 nll ${out(1L)._2} != expected ${nll(docs.head)}")
  }

  test("q116: per-lang cutoff, key formula, and append-stability of the weighted draw") {
    import spark.implicits._
    val out = Quality.q116WeightedSample(spark, sf0001)
    val rows = out.collect()
    val perLang = rows.groupBy(_.getString(0))
    perLang.foreach { case (_, rs) =>
      assert(rs.length <= 10)
      assert(rs.map(_.getInt(4)).sorted.toSeq === (1 to rs.length))
    }
    // key_fp is the A-ES key ln(u)/w at 1e-12 fixed point, u from md5.
    rows.take(20).foreach { r =>
      val docId = r.getLong(1); val w = r.getLong(2)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val expected = math.round(math.log(u) / w * 1e12)
      assert(r.getLong(3) === expected, s"key_fp mismatch for doc $docId")
    }
    // Append-stability, actually exercised: write the same corpus PLUS new
    // documents (in a language of their own, so existing per-lang pools are
    // unchanged) and assert the original languages' draws are bit-identical
    // — keys are a pure function of doc_id, so corpus growth cannot move
    // them (a rank- or count-derived key would fail here).
    val base = graft.sources.Tables.documents(spark, sf0001)
    val extra = base.limit(5)
      .withColumn("doc_id", $"doc_id" + 900000000L)
      .withColumn("lang", lit("zz_new"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_q116_append_").toString
    base.unionByName(extra).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val appended = Quality.q116WeightedSample(spark, dir2).collect()
      .filter(_.getString(0) != "zz_new")
    assert(rows.map(_.toString).toSeq === appended.map(_.toString).toSeq,
      "appending documents changed an existing language's draw")
  }

  test("q117: two-join count equals driver-side brute force over adjacency sets") {
    import spark.implicits._
    val r = Extra.q117Triangles(spark, sf0001).collect().head
    val (nNodes, nEdges, nTri) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val n = graft.sources.Tables.part(spark, sf0001).count()
    assert(nNodes === n)
    // Independent reconstruction: same deterministic graph, hash-set count.
    val ids = graft.sources.Tables.part(spark, sf0001)
      .select($"p_partkey".cast("long")).as[Long].collect().toSet
    val edges = ids.filter(_ >= 2).flatMap(i => Seq((i - 1, i), (i / 2, i)))
      .filter { case (u, v) => ids.contains(u) && u < v }
    assert(nEdges === edges.size)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val brute = edges.toSeq.map { case (a, b) =>
      adj.getOrElse(a, Set.empty).count(c => c > b && adj.getOrElse(b, Set.empty).contains(c))
    }.sum
    assert(nTri === brute && nTri > 0, s"triangles $nTri != brute $brute")
  }

  test("q119: transition probabilities normalize per source; pair mass = events minus stream tails") {
    import spark.implicits._
    val out = queries.EventAnalytics.q119MarkovTransitions(spark, sf0001).collect()
    // Per-source probabilities sum to 1 within the 1e-6 rounding grain.
    out.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val mass = rs.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$src transition mass $mass")
    }
    // Every event except each user's last contributes exactly one pair.
    val ev = graft.sources.Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum === expected)
  }

  test("q120: entropy is 0 for degenerate text, ln 2 for two-char alternation, ranked ascending") {
    val dir = writeCorpus(Seq(
      (1L, "a" * 40, "en"),
      (2L, "ab" * 20, "en"),
      (3L, "the quick brown fox jumps over the lazy dog", "en")))
    val out = Quality.q120CharEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === 0.0)
    assert(math.abs(out(2L) - math.log(2.0)) < 1e-5, s"alternation entropy ${out(2L)}")
    assert(out(1L) < out(2L) && out(2L) < out(3L), s"ordering violated: $out")
  }

  test("q121: prefix-filtered join equals the quadratic all-pairs scan and finds every planted pair") {
    import spark.implicits._
    val pp = ext.Dedup.q121SetSimJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Brute force: the exact quadratic join the prefix filter replaces,
    // over the same byte-level tokenization the operator defines.
    val sets = ext.Dedup.withPlantedNear(graft.sources.Tables.documents(spark, sf0001), 20)
      .select($"doc_id",
        expr("filter(split(text, '[\\\\x00-\\\\x20]+'), x -> x <> '')").as("tk"))
      .filter(size($"tk") > 0)
      .select($"doc_id", ext.Dedup.wordShinglesFromTokens($"tk", 3).as("toks"))
      .filter(size($"toks") > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val brute = (for {
      (a, ta) <- sets; (b, tb) <- sets if a < b
      i = (ta & tb).size
      j = BigDecimal(i.toDouble / (ta.size + tb.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (a, b, j)).toSet
    assert(pp === brute, s"ppjoin ${pp.size} pairs != brute ${brute.size}")
    // Every planted near-copy (one appended token) must be found.
    sets.toMap.keySet.filter(id => id < 20 && sets.toMap.contains(id + 1000000L))
      .foreach { id =>
        assert(pp.exists(p => p._1 == id && p._2 == id + 1000000L),
          s"planted pair ($id, ${id + 1000000L}) missed")
      }
  }

  test("q121: hash generator and string verify agree on whitespace-padded and control-byte text") {
    import spark.implicits._
    // Kernel tokens = runs of bytes > 0x20. These docs would desynchronize a
    // \\s+-based string side (leading/trailing empty tokens, control-byte
    // splits the regex misses).
    val dir = writeCorpus(Seq(
      (100L, "  alpha beta gamma delta  ", "en"),
      (101L, "alpha beta gamma delta", "en"),
      (102L, "alpha\u0001beta gamma delta epsilon", "en"),
      (103L, "alpha beta gamma delta epsilon", "en"),
      (104L, "unrelated words entirely different tokens", "en")))
    val got = ext.Dedup.q121SetSimJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100 vs 101: identical token streams after byte-rule tokenization -> J=1.
    assert(got.contains((100L, 101L)), s"padded twin pair missed: $got")
    // 102 vs 103: \u0001 is a separator under the byte rule on BOTH sides.
    assert(got.contains((102L, 103L)), s"control-byte twin pair missed: $got")
  }

  test("q138: sliding sketch WAU tracks the exact q135 within 5% on every day") {
    val exact = graft.queries.EventAnalytics.q135RollingWau(spark, sf0001).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val est = graft.queries.EventAnalytics.q138RollingWauSketch(spark, sf0001).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1).toDouble).toMap
    assert(est.keySet === exact.keySet, "same observed-day grid as the exact path")
    est.foreach { case (d, e) =>
      val x = exact(d).toDouble
      assert(math.abs(e - x) / x < 0.05, s"$d: sketch $e vs exact $x drifts >5%")
    }
  }

  test("q136: HHI bounded by [1/n, 1], exact on a hand-computed basket, 1 for singletons") {
    import spark.implicits._
    val rows = Extra.q136BasketConcentration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, n, total, hhi) =>
      assert(hhi <= 1.0 + 1e-9 && hhi >= 1.0 / n - 1e-9,
        s"order $k: hhi $hhi outside [1/$n, 1]")
      if (n == 1) assert(math.abs(hhi - 1.0) < 1e-9, s"singleton basket $k must have hhi 1")
      assert(total > 0)
    }
    // recompute one multi-item basket driver-side from raw lineitem
    val k = rows.filter(_._2 > 1).head._1
    val cs = graft.sources.Tables.lineitem(spark, sf0001)
      .filter($"l_orderkey" === k)
      .select(round($"l_extendedprice" * 100).cast("long")).collect().map(_.getLong(0))
    val exp = BigDecimal(cs.map(c => c.toDouble * c).sum / (cs.sum.toDouble * cs.sum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_._1 == k).get
    assert(got._3 === cs.sum && math.abs(got._4 - exp) < 1e-9,
      s"order $k: got $got expected total ${cs.sum} hhi $exp")
  }

  test("q122: association stats are internally consistent and match direct recounts") {
    import spark.implicits._
    val out = Extra.q122MarketBasket(spark, sf0001).collect()
    assert(out.nonEmpty)
    val ns = out.map(_.getLong(2))
    assert(ns.sorted.reverse.toSeq === ns.toSeq, "not sorted by support")
    out.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0)
    }
    // Recount the top pair's support directly.
    val (pa, pb, nab) = (out.head.getLong(0), out.head.getLong(1), out.head.getLong(2))
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").distinct()
    val direct = li.filter($"l_partkey" === pa).select($"l_orderkey")
      .intersect(li.filter($"l_partkey" === pb).select($"l_orderkey")).count()
    assert(nab === direct)
  }

  test("q122: the exactness-guard fallback returns the unpruned result when " +
    "pruning starves the top-k") {
    // minSupport far above any item's support empties the pruned path, so
    // the guard (pruned top-k shorter than topK) must fall back to the
    // full expansion — bit-equal to the never-pruned minSupport=1 run.
    val fallback = Extra.q122MarketBasket(spark, sf0001, topK = 20,
      minSupport = 1000000L).collect().map(_.toString).toSeq
    val unpruned = Extra.q122MarketBasket(spark, sf0001, topK = 20,
      minSupport = 1L).collect().map(_.toString).toSeq
    assert(fallback == unpruned)
  }

  test("q123: attribution conserves purchase mass; 'none' appears on both touches or neither") {
    import spark.implicits._
    val out = queries.EventAnalytics.q123Attribution(spark, sf0001).collect()
    val ev = graft.sources.Tables.events(spark, sf0001)
    val purchases = ev.filter($"event_type" === "purchase").count()
    assert(out.map(_.getLong(2)).sum === purchases,
      "attribution matrix does not sum to the purchase count")
    // first-touch and last-touch are over the SAME preceding frame: one is
    // null exactly when the other is.
    out.foreach { r =>
      val (f, l) = (r.getString(0), r.getString(1))
      assert((f == "none") == (l == "none"), s"inconsistent none row: ($f, $l)")
    }
  }

  test("q124: skew report reconciles with direct counts and orders its quantiles") {
    import spark.implicits._
    val r = Extra.q124SkewReport(spark, sf0001).collect().head
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    assert(r.getLong(0) === li.select($"l_partkey").distinct().count())
    assert(r.getLong(1) === li.count())
    val (maxC, p99, p50) = (r.getLong(2).toDouble, r.getDouble(4), r.getDouble(3))
    assert(maxC >= p99 && p99 >= p50 && p50 >= 1.0)
    val share = r.getDouble(5)
    assert(share > 0 && share <= 1.0)
    // Top-1% of keys must own at least 1% of rows (counts are sorted desc).
    assert(share >= 0.01 * 0.9, s"top-1% share $share below uniform floor")
  }

  test("q125: RRF fusion is order-correct and bounded; arms agree with their standalone rankers") {
    import spark.implicits._
    val out = ext.Corpus.q125HybridRetrieval(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 15)
    // rrf descending, and every score inside (0, 2/61].
    val scores = out.map(_.getDouble(3))
    assert(scores.sorted.reverse.toSeq === scores.toSeq)
    scores.foreach(s => assert(s > 0 && s <= 2.0 / 61 + 1e-9))
    // A doc ranked by both arms must beat a doc with only the same single-arm
    // rank: rrf(r,r') > rrf(r,absent).
    out.foreach { r =>
      val (rl, rv, s) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      val expected = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      assert(math.abs(s - BigDecimal(expected).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // The lexical arm's rank-1 doc is q114's top result.
    val bmTop = ext.Corpus.q114Bm25(spark, sf0001).collect().head.getLong(0)
    out.find(_.getInt(1) == 1).foreach(r => assert(r.getLong(0) === bmTop))
  }

  test("q126: winsorized mean sits inside [lo, hi]; clipped tails match direct counts") {
    import spark.implicits._
    val out = Extra.q126Winsorize(spark, sf0001).collect()
    assert(out.nonEmpty)
    val o = graft.sources.Tables.orders(spark, sf0001)
      .select($"o_orderstatus", round($"o_totalprice" * 100).cast("long").as("c"))
    out.foreach { r =>
      val (st, n, nLo, nHi) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (lo, hi, mean) = (r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(mean * 100 >= lo - 1 && mean * 100 <= hi + 1)
      assert(n === o.filter($"o_orderstatus" === st).count())
      assert(nLo === o.filter($"o_orderstatus" === st && $"c" < lo).count())
      assert(nHi === o.filter($"o_orderstatus" === st && $"c" > hi).count())
      // ~1% tails by construction.
      assert(nLo <= n * 0.02 + 1 && nHi <= n * 0.02 + 1)
    }
  }

  test("q118: sketch rollup is lossless (merged == direct) and within 2% of exact") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf0001)
    val rolled = Extra.q118SketchRollup(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val direct = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled.keySet === exact.keySet)
    rolled.foreach { case (t, est) =>
      assert(est === direct(t),
        s"$t: rollup estimate $est != direct one-pass ${direct(t)} — union not lossless")
      assert(math.abs(est.toDouble - exact(t)) / exact(t) < 0.02,
        s"$t: estimate $est vs exact ${exact(t)} exceeds 2%")
    }
  }

  test("q158: first-failing-rule semantics on hand-built docs; the funnel partitions the corpus") {
    import spark.implicits._
    // One doc per rule, each FAILING its own rule while also matching a
    // later one — proving attribution goes to the FIRST failing rule.
    val handmade = Seq(
      // 3 tokens AND no stopwords: too_short must win over low_stopword.
      ("xx", "zz zz zz"),
      // 16 one-char tokens (mfp 1000) AND no stopwords: weird_tokens wins.
      ("xx", Seq.fill(16)("z").mkString(" ")),
      // 16 normal tokens, no stopwords: only low_stopword fires.
      ("xx", Seq.fill(16)("zebra").mkString(" ")),
      // 16 normal tokens, 1 stopword (6.25% ≥ 2%): passes everything.
      ("xx", ("the" +: Seq.fill(15)("zebra")).mkString(" "))
    ).toDF("lang", "text")
    val verdicts = graft.ext.Quality.filterFunnel(handmade).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(verdicts == Map(
      "too_short" -> 1L, "weird_tokens" -> 1L, "low_stopword" -> 1L,
      "pass" -> 1L), s"got $verdicts")
    // Funnel property on the real corpus: verdicts partition the documents.
    val funnel = graft.ext.Quality.q158FilterFunnel(spark, sf0001).collect()
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(funnel.map(_.getLong(2)).sum == total, "every doc exactly one verdict")
    val allowed = Set("too_short", "too_long", "weird_tokens", "low_stopword", "pass")
    assert(funnel.map(_.getString(1)).forall(allowed))
  }

  test("q181: per-source KL is non-negative and src0 recomputes from scratch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = ext.Quality.q181SourceKl(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.size == 20)
    // Gibbs: KL ≥ 0 up to the 1e-6 fixed-point rounding slack.
    rows.foreach { case (_, _, _, kl) => assert(kl >= -0.000002) }
    // From-scratch recomputation of src0's plug-in KL.
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"source", lower($"text")).as[(String, String)].collect()
    def toks(t: String) = t.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val all = docs.flatMap(d => toks(d._2))
    val cc = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nc = all.length.toLong
    val srcToks = docs.filter(_._1 == "src0").flatMap(d => toks(d._2))
    val cs = srcToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ns = srcToks.length.toLong
    val s = cs.map { case (t, c) =>
      BigDecimal(c * math.log((c * nc).toDouble / (cc(t) * ns)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val expected = BigDecimal(s / (1e6 * ns))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r0 = rows.find(_._1 == "src0").get
    assert(r0._2 == ns && r0._3 == cs.size.toLong)
    assert(r0._4 == expected)
  }

  test("q172: DSIR scores recompute from scratch and target docs are excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = ext.Quality.q172DsirSelection(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 15)
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    // From-scratch reimplementation on the collected fixture.
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", lower($"text"))
      .as[(Long, String, String)].collect()
    def toks(t: String) = t.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val targetIds = docs.filter(_._2 == "src0").map(_._1).toSet
    assert(got.forall(r => !targetIds.contains(r._1)))
    val ct = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cr = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, src, txt) =>
      val m = if (src == "src0") ct else cr
      toks(txt).foreach(w => m(w) += 1)
    }
    val v = (ct.keySet ++ cr.keySet).size.toLong
    val nt = ct.values.sum; val nr = cr.values.sum
    got.foreach { case (id, nTok, score) =>
      val ws = toks(docs.find(_._1 == id).get._3)
      assert(nTok == ws.size)
      val s = ws.map { w =>
        BigDecimal(math.log(
          ((ct(w) + 1) * (nr + v)).toDouble / ((cr(w) + 1) * (nt + v))) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      val expected = BigDecimal(s / (1e6 * ws.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == expected, s"doc $id: $score vs $expected")
    }
  }

  test("q194: KS statistic recomputes from scratch for one source; bounds hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = ext.Quality.q194KsDrift(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.size == 20)
    rows.foreach { case (_, _, _, d) => assert(d >= 0 && d <= 1) }
    // From-scratch two-sample KS for src0 over doc lengths.
    val lens = graft.sources.Tables.documents(spark, sf0001)
      .select($"source", size(split($"text", "\\s+")))
      .as[(String, Int)].collect()
    val a = lens.filter(_._1 == "src0").map(_._2).sorted
    val b = lens.filter(_._1 != "src0").map(_._2).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val values = (a ++ b).distinct.sorted
    val dnum = values.map { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    val r0 = rows.find(_._1 == "src0").get
    assert(r0._2 == n1 && r0._3 == dnum)
    assert(r0._4 == BigDecimal(dnum.toDouble / (n1 * n2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q196: mean percentiles recompute from a driver-side global ranking") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = ext.Quality.q196ScoreCalibration(spark, sf0001)
      .as[(String, Long, Double)].collect().toSeq
    assert(rows.size == 20)
    rows.foreach { case (_, _, p) => assert(p > 0 && p < 1) }
    // Weighted overall mean percentile must be exactly 0.5 by symmetry of
    // ranks 1..N: Σrank = N(N+1)/2 ⇒ mean = ((N+1)/2 − 1)/(N−1) = 0.5.
    val n = rows.map(_._2).sum
    val weighted = rows.map { case (_, nd, p) => nd * p }.sum / n
    assert(math.abs(weighted - 0.5) < 1e-4)
    // From scratch: global fixed-point score ranking.
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"source", $"doc_id", lower($"text"))
      .as[(String, Long, String)].collect()
    val scored = docs.flatMap { case (s, id, t) =>
      val tk = t.split("[^a-z]+").filter(_.nonEmpty)
      if (tk.isEmpty) None
      else Some((s, id, BigDecimal(
        tk.map(_.length.toLong).sum.toDouble / tk.length * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
    val ranked = scored.sortBy { case (_, id, sc) => (sc, id) }.zipWithIndex
    val nt = ranked.length.toLong
    val bySrc = ranked.groupBy(_._1._1)
    rows.foreach { case (src, nd, p) =>
      val g = bySrc(src)
      assert(nd == g.length.toLong)
      val sumRank = g.map(_._2.toLong + 1).sum
      val expected = BigDecimal(
        (sumRank.toDouble / g.length - 1) / (nt - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p == expected, s"$src: $p vs $expected")
    }
  }

  test("q198: holdout NLL recomputes from a train-only model; holdout is harder than self-scoring") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = ext.Quality.q198HoldoutPerplexity(spark, sf0001)
      .as[(String, Long, Double)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("test", "val"))
    // From scratch: split, train counts, holdout scoring.
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = (hex(0).toInt * 31 + hex(1).toInt) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        (splitOf(id), t.split("[^a-z]+").filter(_.nonEmpty).toSeq)
      }.filter(_._2.size >= 2)
    val trainBi = docs.filter(_._1 == "train")
      .flatMap { case (_, tk) => tk.zip(tk.tail) }
    val c1 = trainBi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c12 = trainBi.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = (trainBi.map(_._1) ++ trainBi.map(_._2)).distinct.size.toLong
    rows.foreach { case (split, nBi, nll) =>
      val bs = docs.filter(_._1 == split)
        .flatMap { case (_, tk) => tk.zip(tk.tail) }
      assert(nBi == bs.size.toLong)
      val s = bs.map { b =>
        BigDecimal(math.log(
          (c1.getOrElse(b._1, 0L) + v + 1).toDouble
            / (c12.getOrElse(b, 0L) + 1)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      assert(nll == BigDecimal(s / (1e6 * bs.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q204: flagged set is exactly the planted repetitive docs; fractions match a scala recount") {
    import org.apache.spark.sql.functions.col
    val out = graft.ext.TextAnalysis.q204DocRepetition(spark, sf0001).collect()
    val flagged = out.filter(_.getAs[Boolean]("flagged")).map(_.getLong(0)).toSet
    assert(flagged == (0L until 20L).map(_ + 500000L).toSet,
      s"flagged must be the 20 planted docs, got ${flagged.toSeq.sorted.take(25)}")
    // planted docs: 6 words repeated 12x = 72 words = 70 trigrams; the
    // sequence is 6-periodic so distinct <= 6 (exactly 6 unless the base
    // doc's own first words repeat), dup_frac >= 1 - 6/70 ≈ 0.914 — far
    // past the 0.2 flag line by construction
    val planted = out.filter(_.getLong(0) >= 500000L)
    assert(planted.length == 20)
    planted.foreach { r =>
      assert(r.getInt(1) == 70 && r.getInt(2) <= 6,
        s"doc ${r.getLong(0)}: grams=${r.getInt(1)} distinct=${r.getInt(2)}")
      assert(r.getDouble(3) >= 0.9)
      assert(r.getDouble(3) == BigDecimal(1.0 - r.getInt(2) / 70.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // natural docs: recount one doc's trigram dup fraction in plain scala
    val doc0 = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val ws = doc0.toLowerCase.split("\\s+").toSeq
    val grams = ws.sliding(3).map(_.mkString(" ")).toSeq
    val row0 = out.find(_.getLong(0) == 0L).get
    assert(row0.getInt(1) == grams.size && row0.getInt(2) == grams.distinct.size)
  }
}
