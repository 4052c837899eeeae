package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.BloomIndex

/** Bloom file index: must never change results (no false negatives +
  * predicate re-applied), must actually skip files on a hash-clustered
  * layout, and must stay correct when the index is stale.
  */
class BloomIndexSpec extends SparkSpec {

  private def hashClustered(nFiles: Int): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bloom_").toString + "/li"
    graft.sources.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_quantity")
      .repartition(nFiles, $"l_orderkey")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("pruned read equals full-scan IN filter and skips files on a hash-clustered layout") {
    import spark.implicits._
    val dir = hashClustered(16)
    val idx = BloomIndex.build(spark, dir, "l_orderkey",
      expectedItems = 100000L, numBits = 1L << 20)
    val keys: Seq[Any] = Seq(1L, 33L, 1000L, 5000L)
    val pruned = BloomIndex.prunedRead(spark, dir, idx, "l_orderkey", keys)
    val expected = spark.read.parquet(dir).filter($"l_orderkey".isin(keys: _*))
    assert(pruned.df.count() == expected.count() && expected.count() > 0)
    assert(pruned.df.exceptAll(expected).isEmpty && expected.exceptAll(pruned.df).isEmpty)
    assert(pruned.totalFiles == 16)
    // each key hashes to one file; 4 keys can match at most 4 files exactly
    // plus bloom false positives (~2% of 16 files) — strictly fewer than all
    assert(pruned.selectedFiles < pruned.totalFiles,
      s"bloom should skip files, read ${pruned.selectedFiles}/${pruned.totalFiles}")
  }

  test("min/max zone map CANNOT prune this layout — the bloom can") {
    import spark.implicits._
    val dir = hashClustered(8)
    // hash clustering scatters keys: every file's [min,max] spans ~the whole
    // domain, so a zone map rules out nothing
    val zm = graft.ops.ZoneMap.build(spark, dir, "l_orderkey")
    val zmPruned = graft.ops.ZoneMap.prunedRead(spark, dir, zm,
      Seq(("l_orderkey", 1000L, 1001L)))
    assert(zmPruned.selectedFiles == zmPruned.totalFiles,
      "hash layout should defeat min/max pruning (that is the point)")
    val idx = BloomIndex.build(spark, dir, "l_orderkey",
      expectedItems = 100000L, numBits = 1L << 20)
    val bPruned = BloomIndex.prunedRead(spark, dir, idx, "l_orderkey", Seq(1000L))
    assert(bPruned.selectedFiles < bPruned.totalFiles)
  }

  test("stale index: a file appended after build is always scanned (no lost rows)") {
    import spark.implicits._
    val dir = hashClustered(4)
    val idx = BloomIndex.build(spark, dir, "l_orderkey",
      expectedItems = 100000L, numBits = 1L << 20)
    val indexedFiles = idx.count()
    // append a new file containing a key the index has never seen
    Seq((999999999L, 1.0)).toDF("l_orderkey", "l_quantity")
      .coalesce(1).write.mode("append").parquet(dir)
    val pruned = BloomIndex.prunedRead(spark, dir, idx, "l_orderkey",
      Seq(999999999L))
    assert(pruned.df.count() == 1L,
      "unindexed file must be scanned even though no bloom matches")
    assert(pruned.totalFiles.toLong == indexedFiles + 1)
  }

  test("probe literals are cast to the indexed column's type (Int keys vs BIGINT column)") {
    import spark.implicits._
    val dir = hashClustered(8)
    val idx = BloomIndex.build(spark, dir, "l_orderkey",
      expectedItems = 100000L, numBits = 1L << 20)
    // xxhash64(1: Int) != xxhash64(1L); without the cast these probes would
    // silently rule out the files that DO hold the keys — lost rows
    val intKeys: Seq[Any] = Seq(1, 33, 1000)
    val pruned = BloomIndex.prunedRead(spark, dir, idx, "l_orderkey", intKeys)
    val expected = spark.read.parquet(dir)
      .filter($"l_orderkey".isin(1L, 33L, 1000L))
    assert(pruned.df.count() == expected.count() && expected.count() > 0,
      "Int probes against a BIGINT column must find every row")
  }

  test("property: pruned read equals full IN filter for random data, layouts, and probes") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 50L), Gen.choose(0, 1000)))
    val prop = Prop.forAll(
      rowsGen, Gen.choose(1, 6),
      Gen.nonEmptyListOf(Gen.choose(-5L, 55L))) { (rows, nFiles, probes) =>
      val dir = Files.createTempDirectory("graft_bloomprop_").toString + "/t"
      rows.toDF("k", "v").repartition(nFiles, $"k")
        .write.mode("overwrite").parquet(dir)
      val idx = BloomIndex.build(spark, dir, "k",
        expectedItems = 1000L, numBits = 1L << 14)
      val keys: Seq[Any] = probes.distinct
      val pruned = BloomIndex.prunedRead(spark, dir, idx, "k", keys)
        .df.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val expected = rows.filter(r => keys.contains(r._1)).sorted
      pruned == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("all-null key column builds an empty filter and is pruned; empty probe rejected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bloomnull_").toString + "/t"
    Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "v")
      .coalesce(1).write.parquet(dir)
    Seq((Option.empty[Long], "c"), (Option.empty[Long], "d")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val idx = BloomIndex.build(spark, dir, "k",
      expectedItems = 1000L, numBits = 1L << 14)
    val pruned = BloomIndex.prunedRead(spark, dir, idx, "k", Seq(1L))
    assert(pruned.df.count() == 1L)
    assert(pruned.selectedFiles == 1 && pruned.totalFiles == 2,
      "the all-null file cannot contain any probed key and must be skipped")
    intercept[IllegalArgumentException] {
      BloomIndex.candidateFiles(idx, Seq.empty)
    }
  }

  test("mixed key_type index: each bloom is probed at the type ITS row recorded") {
    import spark.implicits._
    // The scenario key_type exists for: an index built while the column was
    // INT, unioned with an incremental rebuild after the column widened to
    // BIGINT. One probe-type-for-all (the pre-round-16 shape) hashes at
    // whichever type a nondeterministic head row carried and silently
    // false-negative-prunes every file recorded at the OTHER type.
    val dirOld = Files.createTempDirectory("graft_bloommix_").toString + "/old"
    val dirNew = Files.createTempDirectory("graft_bloommix_").toString + "/new"
    Seq((1000, "a")).toDF("k", "v").coalesce(1).write.parquet(dirOld)
    Seq((1000L, "b")).toDF("k", "v").coalesce(1).write.parquet(dirNew)
    val idx = BloomIndex.build(spark, dirOld, "k",
        expectedItems = 100L, numBits = 1L << 12)
      .unionByName(BloomIndex.build(spark, dirNew, "k",
        expectedItems = 100L, numBits = 1L << 12))
    assert(idx.select("key_type").distinct().count() == 2L,
      "fixture must actually carry two recorded types")
    // key 1000 lives in BOTH files; losing either is the forbidden failure
    val cands = BloomIndex.candidateFiles(idx, Seq(1000L))
    assert(cands.size == 2,
      s"both type generations must survive the probe, got $cands")
    // and the caller's runtime key type still cannot matter
    assert(BloomIndex.candidateFiles(idx, Seq(1000)) == cands)
  }

  test("many-file index: only per-file verdicts reach the driver, candidates stay exact") {
    import spark.implicits._
    // 48 files ≈ 6 MiB of bloom bytes at this sizing; the distributed probe
    // ships 48 (file, hit) rows instead. At 10⁵ production files the old
    // driver-side collect was O(files × 1 MiB) — the structural bound this
    // pins is that candidateFiles never materializes a bloom on the driver.
    val dir = Files.createTempDirectory("graft_bloommany_").toString + "/t"
    (0L until 4800L).map(i => (i, i.toString)).toDF("k", "v")
      .repartition(48, $"k").write.parquet(dir)
    val idx = BloomIndex.build(spark, dir, "k",
      expectedItems = 1000L, numBits = 1L << 20)
    val pruned = BloomIndex.prunedRead(spark, dir, idx, "k", Seq(7L, 4777L))
    assert(pruned.totalFiles == 48)
    assert(pruned.selectedFiles < pruned.totalFiles,
      s"read ${pruned.selectedFiles}/48")
    assert(pruned.df.select("k").as[Long].collect().sorted.toSeq == Seq(7L, 4777L))
  }

  test("probe envelope: an index past the indexed-file cap fails loudly, at the cap it works") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bloomcap_").toString + "/t"
    (0L until 600L).map(i => (i, i.toString)).toDF("k", "v")
      .repartition(6, $"k").write.parquet(dir)
    val idx = BloomIndex.build(spark, dir, "k",
      expectedItems = 200L, numBits = 1L << 14).cache()
    try {
      // boundary: cap == file count probes fine (the limit(cap+1) collect
      // sees exactly cap rows)
      spark.conf.set(BloomIndex.MaxProbedFilesKey, "6")
      assert(BloomIndex.candidateFiles(idx, Seq(7L)).nonEmpty)
      // one past: the collect is BOUNDED (cap+1 rows, never the index) and
      // the failure is the documented exception, not a driver OOM
      spark.conf.set(BloomIndex.MaxProbedFilesKey, "5")
      val ex = intercept[IllegalStateException] {
        BloomIndex.candidateFiles(idx, Seq(7L))
      }
      assert(ex.getMessage.contains("more than 5 indexed files"), ex.getMessage)
      assert(ex.getMessage.contains(BloomIndex.MaxProbedFilesKey), ex.getMessage)
      // an UNPARSEABLE cap fails loudly naming the conf — a user raising it
      // past Int.MaxValue must hear "ignored", not hit the default-cap path
      for (bad <- Seq("5000000000", "lots", "0", "-3")) {
        spark.conf.set(BloomIndex.MaxProbedFilesKey, bad)
        val e2 = intercept[IllegalArgumentException] {
          BloomIndex.candidateFiles(idx, Seq(7L))
        }
        assert(e2.getMessage.contains(BloomIndex.MaxProbedFilesKey), e2.getMessage)
        assert(e2.getMessage.contains(bad), e2.getMessage)
      }
    } finally spark.conf.unset(BloomIndex.MaxProbedFilesKey)
  }

  test("candidateFiles derives the key type from the index: Int keys probe a BIGINT column safely") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bloomtype_").toString + "/t"
    Seq((1000L, "x"), (2000L, "y")).toDF("k", "v").coalesce(1).write.parquet(dir)
    val idx = BloomIndex.build(spark, dir, "k",
      expectedItems = 100L, numBits = 1L << 12).cache()
    // xxhash64 is type-sensitive: hashing Int 1000 instead of Long 1000
    // yields a different value, and before the index carried `key_type`
    // this probe silently LOST the file — a bloom false negative. The
    // index's own type column now drives the cast, so the caller's runtime
    // key type cannot matter.
    val viaInt = BloomIndex.candidateFiles(idx, Seq(1000))
    val viaLong = BloomIndex.candidateFiles(idx, Seq(1000L))
    assert(viaInt == viaLong && viaInt.nonEmpty,
      s"Int-keyed probe lost files: int=$viaInt long=$viaLong")
    idx.unpersist()
  }
}
