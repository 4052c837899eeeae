package graft

import graft.ext.{Corpus, Dedup}

/** Properties of the corpus-preparation ops that the DuckDB oracle can't
  * express: chunk coverage/shape, split determinism, quota exactness, and
  * scrub completeness. */
class CorpusSpec extends SparkSpec {

  test("q94: chunks tile each document — last chunk ends at the token count, others are full-size") {
    import spark.implicits._
    val docLen = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"text", "\\s+")).as("len"))
    val chunks = Corpus.q94DocChunks(spark, sf0001)
    val bad = chunks.join(docLen, "doc_id")
      .groupBy($"doc_id", $"len")
      .agg(
        org.apache.spark.sql.functions.max($"start" + $"n_tok" - 1).as("covered"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            $"start" + 49 <= $"len" && $"n_tok" =!= 50, 1).otherwise(0)).as("short_inner"))
      .filter($"covered" =!= $"len" || $"short_inner" > 0)
    assert(bad.count() === 0)
  }

  test("q93: split assignment is a pure function of doc_id — stable across runs and subsets") {
    val full = Corpus.q93TrainSplit(spark, sf0001).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = Corpus.q93TrainSplit(spark, sf0001).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full === again)
    assert(full.keySet === Set("train", "val", "test"))
    val n = full.values.sum.toDouble
    assert(full("train") / n > 0.7 && full("train") / n < 0.9, s"train share off: $full")
  }

  test("q95: every language is capped at the quota, under-quota languages keep all docs") {
    import spark.implicits._
    val perLang = graft.sources.Tables.documents(spark, sf0001)
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Corpus.q95QuotaSample(spark, sf0001, quota = 50)
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(sampled(lang) === math.min(n, 50L), s"lang $lang: ${sampled(lang)} vs $n")
    }
  }

  test("q97: no digit survives the scrub, and n_masked counts the replaced runs") {
    import spark.implicits._
    val scrubbed = Corpus.q97PiiScrub(spark, sf0001)
    assert(scrubbed.filter($"masked_props".rlike("[0-9]")).count() === 0)
    val mismatched = scrubbed.filter(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"masked_props", "<NUM>")) - 1 =!= $"n_masked")
    assert(mismatched.count() === 0)
  }

  test("q114: BM25 scores are positive, sorted, and rank tf/length correctly on a fixture") {
    import spark.implicits._
    val rows = Corpus.q114Bm25(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))

    // controlled fixture: same vocabulary pressure, one query term "merge".
    // doc 1: tf=3 in 6 tokens; doc 2: tf=1 in 6 tokens (same length, lower
    // tf); doc 3: tf=3 in 18 tokens (same tf, longer doc); doc 4: no hit.
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_").toString
    Seq(
      (1L, "merge merge merge pad pad pad"),
      (2L, "merge pad pad pad pad pad"),
      (3L, "merge merge merge " + Seq.fill(15)("pad").mkString(" ")),
      (4L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Corpus.q114Bm25(spark, dir, terms = Seq("merge")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L), "only term-bearing docs score")
    val byDoc = got.toMap
    assert(byDoc(1L) > byDoc(2L), "higher tf at equal length wins")
    assert(byDoc(1L) > byDoc(3L), "equal tf in a shorter doc wins")
  }

  test("q154: weights renormalize to 1, flattening upweights the low-resource tail") {
    val rows = Corpus.q154TemperatureMixing(spark, sf0001).collect()
    val weightSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(weightSum - 1.0) < 1e-4, s"weights must sum to ~1, got $weightSum")
    val budget = rows.map(_.getLong(4)).sum
    assert(budget <= 100000L && budget > 99000L,
      s"integer budget split must not overshoot and floors lose <1 doc/lang, got $budget")
    // α = 0.5 flattening: every language's weight sits between its natural
    // char share and the uniform share (the defining property of 0<α<1).
    val totChars = rows.map(_.getLong(2)).sum.toDouble
    val uniform = 1.0 / rows.length
    rows.foreach { r =>
      val natural = r.getLong(2) / totChars
      val w = r.getDouble(3)
      val lo = math.min(natural, uniform) - 1e-6
      val hi = math.max(natural, uniform) + 1e-6
      assert(w >= lo && w <= hi,
        s"lang ${r.getString(0)}: weight $w outside [$lo, $hi] (natural $natural)")
    }
  }

  test("q155: a permutation into shards — every doc once, positions contiguous per shard") {
    val rows = Corpus.q155CorpusShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(rows.length.toLong == nDocs, "every document appears exactly once")
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (shard, members) =>
      val ps = members.map(_._3).sorted
      assert(ps.toSeq == (1 to members.length).toSeq,
        s"shard $shard positions must be contiguous 1..${members.length}")
    }
    // Deterministic: a second run reproduces the identical order.
    val again = Corpus.q155CorpusShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q156: every planted header is discovered and stripped; organic text untouched") {
    import spark.implicits._
    val planted = graft.sources.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.pmod($"doc_id",
        org.apache.spark.sql.functions.lit(3L)) === 0)
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val report = Corpus.q156BoilerplateStrip(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(report.keySet == planted.keySet, "every source reports")
    report.foreach { case (src, (nDocs, nStripped, before, after)) =>
      assert(nStripped == planted(src),
        s"$src: stripped $nStripped docs, planted ${planted(src)}")
      assert(before - after == 6 * nStripped,
        s"$src: exactly the 6-token header must be removed per flagged doc")
      assert(nDocs >= nStripped)
    }
  }

  test("q164: PMI recomputes from counts and corpus totals; pairs canonical and support-ranked") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(size(split($"text", "\\s+")).as("n"))
    // T = total tokens; P = sum over docs of forward pairs within window 3.
    val totT = docs.agg(sum($"n".cast("long"))).head.getLong(0)
    val totP = docs.agg(sum(
      greatest($"n" - 1, lit(0)).cast("long")
        + greatest($"n" - 2, lit(0)).cast("long")
        + greatest($"n" - 3, lit(0)).cast("long"))).head.getLong(0)
    val rows = Corpus.q164CooccurrencePmi(spark, sf0001).collect()
    assert(rows.length == 30)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (a, b, cab, ca, cb, pmi) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a <= b, s"pair ($a,$b) not canonical")
      assert(cab >= 5 && cab <= prev, "support-ranked with min count")
      prev = cab
      val expected = BigDecimal(math.log(
        (cab * totT * totT).toDouble / (totP * ca * cb).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pmi == expected, s"pmi($a,$b)=$pmi expected $expected")
    }
  }

  test("q164: the overflow-proof ln-sum form equals the exact decimal form on the fixture") {
    // The automatic per-row width guard switches to
    // ln(c_ab)+2ln(T)−ln(P)−ln(c_a)−ln(c_b) once the exact decimal(38,0)
    // products would saturate (~10¹⁴ tokens — one order above the 100 TB
    // design point). No fixture can reach that scale, so the fallback is
    // pinned the only way it can be: force it and assert the rounded PMI
    // of EVERY reported pair is identical to the exact form's — i.e. at
    // any in-range scale the two forms agree to the reported precision,
    // so the automatic switch is seamless where both are defined.
    //
    // Tolerance of ONE 6-decimal rounding step, not bit-equality: the two
    // forms differ by ~1-2 ulp pre-rounding (one division+log vs five
    // summed logs), so a pair whose PMI sits within that of a x.xxxxx5
    // boundary can legitimately round one step apart — a fixture
    // regeneration or a platform with a different 1-ulp Math.log must not
    // turn that into a spurious suite failure. (On the current fixture
    // every pair is in fact bit-equal after rounding.)
    val exact = Corpus.q164CooccurrencePmi(spark, sf0001).collect()
    val lnForm = Corpus.q164CooccurrencePmi(spark, sf0001, forceLnForm = true).collect()
    assert(exact.length == 30 && lnForm.length == 30)
    exact.zip(lnForm).foreach { case (e, l) =>
      assert(e.getString(0) == l.getString(0) && e.getString(1) == l.getString(1),
        s"row order diverged: ${e.toSeq} vs ${l.toSeq}")
      assert(math.abs(e.getDouble(5) - l.getDouble(5)) <= 1.0000001e-6,
        s"ln-form pmi ${l.getDouble(5)} != exact ${e.getDouble(5)} for ${e.toSeq}")
    }
  }

  test("q169: vocab-growth curve conserves totals and is cumulative-consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Corpus.q169VocabGrowth(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.size == 10)
    // Cumulative columns are running sums of the per-bucket columns, and
    // the TTR recomputes from them.
    var cv = 0L; var ct = 0L
    rows.foreach { case (_, nw, cumV, bt, cumT, ttr) =>
      cv += nw; ct += bt
      assert(cumV == cv && cumT == ct)
      assert(ttr == BigDecimal(cv.toDouble / ct)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // Final cum_vocab = corpus distinct vocabulary; cum_tokens = token mass.
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("w"))
    assert(rows.last._3 == toks.distinct().count())
    assert(rows.last._5 == toks.count())
    // New words can only decline or hold as the corpus saturates… not
    // guaranteed in general, but the FIRST bucket must dominate all others.
    assert(rows.head._2 == rows.map(_._2).max)
  }

  test("q171: closed-form allocation equals the sequential greedy water-filling") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Corpus.q171UnimaxMixture(spark, sf0001)
      .as[(String, Long, Boolean, Double, Double)].collect().toSeq
    // Independent greedy: ascending by size, quota = min(cap·n, B/m).
    val n = graft.sources.Tables.documents(spark, sf0001)
      .select($"lang",
        size(expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')"))
          .cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n")).as[(String, Long)].collect()
      .sortBy { case (l, t) => (t, l) }
    var bHalf = 3.0 * n.map(_._2).sum
    var m = n.size
    val expected = n.map { case (lang, tok) =>
      val cap = 4.0 * tok
      val quota = math.min(cap, bHalf / m)
      bHalf -= quota; m -= 1
      (lang, tok, quota == cap,
        BigDecimal(quota / 2.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(quota / (2.0 * tok))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    assert(got == expected)
    // Both regimes must actually occur on the fixture.
    assert(got.exists(_._3) && got.exists(!_._3))
    // Budget conservation: total allocation never exceeds 1.5× the corpus.
    assert(got.map(_._4).sum <= 1.5 * n.map(_._2).sum + 0.01)
  }

  test("q187: raking hits the language target and recomputes from scratch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Corpus.q187RakingWeights(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    val counts = graft.sources.Tables.documents(spark, sf0001)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSeq
    assert(rows.size == counts.size)
    // Driver-side IPF with the identical fixed-point discipline.
    val fp = 1000000000L
    val total = counts.map(_._3).sum
    val rowT = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum * fp).toMap
    // Derived from the fixture's own language count, mirroring the query
    // (which no longer hardcodes a 5-language assumption).
    val nLangs = counts.map(_._2).distinct.size
    val colT = total * fp / nLangs
    var w = counts.map { case (s, l, n) => ((s, l), n * fp) }.toMap
    def rnd(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for (_ <- 1 to 3) {
      val rs = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      w = w.map { case ((s, l), v) =>
        ((s, l), rnd(v * (rowT(s).toDouble / rs(s)))) }
      val cs = w.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      w = w.map { case ((s, l), v) =>
        ((s, l), rnd(v * (colT.toDouble / cs(l)))) }
    }
    rows.foreach { case (s, l, n, weight) =>
      val expected = BigDecimal(w((s, l)).toDouble / fp / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(weight == expected, s"($s,$l): $weight vs $expected")
    }
    // Column marginal is exactly on target after the final column step
    // (up to per-cell rounding); rows drift only slightly.
    val colMass = rows.groupBy(_._2).view.mapValues(
      _.map { case (s, l, n, wt) => wt * n }.sum).toMap
    colMass.values.foreach(m =>
      assert(math.abs(m - total.toDouble / nLangs) < 0.001, s"col mass $m"))
  }

  test("q178: truncation loss is monotone in the limit and totals reconcile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Corpus.q178TruncationLoss(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    val limits = Seq(128L, 512L, 2048L, 4096L)
    assert(rows.size == 20 * limits.size)
    rows.groupBy(_._1).values.foreach { g =>
      val byLimit = g.sortBy(_._2)
      assert(byLimit.map(_._2) == limits)
      // Loss and kept mass are monotone in L; tok_mass constant per source.
      assert(byLimit.map(_._6).zip(byLimit.map(_._6).tail)
        .forall { case (a, b) => a >= b })
      assert(byLimit.map(_._5).zip(byLimit.map(_._5).tail)
        .forall { case (a, b) => a <= b })
      assert(byLimit.map(_._4).distinct.size == 1)
      g.foreach { case (_, lim, _, mass, kept, loss) =>
        assert(kept <= mass)
        assert(loss == BigDecimal(1.0 - kept.toDouble / mass)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    // Corpus-wide token mass reconciles with a direct recount.
    val mass = graft.sources.Tables.documents(spark, sf0001)
      .select(size(split($"text", "\\s+")).cast("long").as("n"))
      .agg(sum($"n")).head.getLong(0)
    assert(rows.filter(_._2 == 128L).map(_._4).sum == mass)
  }

  test("q189: dataset card recomputes for one source and stats are internally consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Corpus.q189DatasetCard(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getDouble(3) == BigDecimal(
        r.getLong(2).toDouble / r.getLong(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(4) >= 0) // entropy non-negative
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
    }
    // src0 from scratch: masses and language entropy.
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .filter($"source" === "src0")
      .select($"lang", $"text").as[(String, String)].collect()
    val r0 = rows.find(_.getString(0) == "src0").get
    assert(r0.getLong(1) == docs.length.toLong)
    assert(r0.getLong(2) ==
      docs.map(_._2.split("\\s+").length.toLong).sum)
    val fp = 1000000L
    def lnFp(x: Long) = BigDecimal(math.log(x.toDouble) * fp)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val lc = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nd = lc.values.sum
    val ent = BigDecimal(
      (lnFp(nd) * nd - lc.values.map(c => c * lnFp(c)).sum) / (1e6 * nd))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getDouble(4) == ent)
    // Span sharing reconciles with q165's per-source distinct counts.
    val nA = Dedup.q165SourceOverlap(spark, sf0001).collect()
      .collectFirst { case r if r.getString(0) == "src0" => r.getLong(3) }
    nA.foreach(n => assert(r0.getLong(5) == n))
  }

  test("q199: manifest fingerprints recompute, are order-independent, and detect a mutation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Corpus.q199ReleaseManifest(spark, sf0001).collect()
    assert(rows.length == 20)
    // From-scratch XOR lanes for every source.
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"source", $"text").as[(String, String)].collect()
    def lanes(t: String): (Long, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16),
        java.lang.Long.parseLong(hex.substring(8, 16), 16))
    }
    val expected = docs.groupBy(_._1).view.mapValues { g =>
      val ls = g.map(d => lanes(d._2))
      // mod-2^32 multiset lane sums (xor cancelled even multiplicities)
      (g.length.toLong,
        ls.map(_._1).sum % 4294967296L, ls.map(_._2).sum % 4294967296L,
        g.map(_._2.length.toLong).sum)
    }.toMap
    rows.foreach { r =>
      val e = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e)
    }
    // Mutation detection: a corpus copy with ONE changed character in one
    // document must produce a different fingerprint for that source only.
    val dir2 = java.nio.file.Files.createTempDirectory("graft_q199_").toString
    graft.sources.Tables.documents(spark, sf0001)
      .withColumn("text", when($"doc_id" === 0,
        concat($"text", lit("!"))).otherwise($"text"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val mutated = Corpus.q199ReleaseManifest(spark, dir2).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val origSrc = docs.find(_._2 == docs.head._2).get._1
    val doc0src = graft.sources.Tables.documents(spark, sf0001)
      .filter($"doc_id" === 0).select($"source").as[String].head()
    rows.foreach { r =>
      val same = mutated(r.getString(0)) == (r.getLong(2), r.getLong(3))
      if (r.getString(0) == doc0src) assert(!same, "mutation must change the fingerprint")
      else assert(same, s"untouched source ${r.getString(0)} fingerprint moved")
    }
  }

  test("q200: the funnel is monotone, splits partition the survivors, and stage 2 recomputes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Corpus.q200CurationPipeline(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val byStage = rows.map { case (s, n, _) => s -> n }.toMap
    assert(byStage("1_raw") >= byStage("2_quality"))
    assert(byStage("2_quality") >= byStage("3_exact_dedup"))
    assert(byStage("3_exact_dedup") >= byStage("4_span_prune"))
    val splitDocs = rows.filter(_._1.startsWith("5_")).map(_._2).sum
    val splitToks = rows.filter(_._1.startsWith("5_")).map(_._3).sum
    assert(splitDocs == byStage("4_span_prune"))
    assert(splitToks == rows.find(_._1 == "4_span_prune").get._3)
    // Stage 2 from scratch.
    val stopset = Set("the", "a", "of", "and", "to", "in")
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"text").as[String].collect()
    val pass = docs.count { t =>
      val tk = t.split("\\s+")
      val nTok = tk.length.toLong
      val nsp = t.replaceAll("\\s+", "").length.toLong
      val stopN = t.toLowerCase.split("\\s+").count(stopset.contains)
      val mfp = nsp * 1000 / nTok
      nTok >= 15 && nTok <= 5000 && mfp >= 4000 && mfp <= 9000 &&
        stopN * 100 >= nTok * 2
    }
    assert(byStage("2_quality") == pass.toLong)
    assert(byStage("1_raw") == docs.length.toLong)
  }

  test("q205: packing conserves docs and tokens; every shard starts at sequence 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Corpus.q205SequencePacking(spark, sf0001).collect()
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // conservation: every document lands in exactly one sequence, no token
    // appears twice or vanishes
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(out.map(_.getAs[Long]("n_tokens_packed")).sum ==
      docs.select(sum(size(split($"text", "\\s+")))).head().getLong(0))
    // each shard's packing starts at sequence 0 (cum_before of the first
    // doc is 0 by the 1-PRECEDING frame); ids may legitimately SKIP when a
    // single doc straddles multiple capacities, so no contiguity assert
    out.groupBy(_.getInt(0)).foreach { case (s, rows) =>
      assert(rows.map(_.getInt(1)).min == 0, s"shard $s missing seq 0") }
    // utilization restates packed tokens vs the 2048 capacity
    out.foreach(r => assert(r.getAs[Double]("utilization") ==
      BigDecimal(r.getAs[Long]("n_tokens_packed").toDouble / 2048)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }
}
