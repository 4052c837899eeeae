package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Layout, ZoneMap}

/** Zone-map file-skipping: the index must never change results (predicate
  * re-applied) and must actually skip files on a clustered layout.
  */
class ZoneMapSpec extends SparkSpec {

  test("pruned read equals full-scan filter on a sorted layout, and skips files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zmsorted_").toString + "/li"
    val li = graft.sources.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    Layout.sortedWrite(li, dir, 8, "l_orderkey")
    val zm = ZoneMap.build(spark, dir, "l_orderkey")
    val bounds = Seq[(String, Any, Any)](("l_orderkey", 2000L, 4000L))
    val pruned = ZoneMap.prunedRead(spark, dir, zm, bounds)
    val expected = li.filter($"l_orderkey".between(2000L, 4000L))
    assert(pruned.df.count() == expected.count())
    assert(pruned.df.exceptAll(expected).isEmpty && expected.exceptAll(pruned.df).isEmpty)
    // 8 disjoint orderkey ranges over [0, ~15000]: a 2k-wide interval cannot
    // touch them all
    assert(pruned.totalFiles == 8)
    assert(pruned.selectedFiles < pruned.totalFiles,
      s"sorted layout should skip files, read ${pruned.selectedFiles}/${pruned.totalFiles}")
  }

  test("2-D box over a z-ordered layout: identical result, fewer files than either 1-D sort can give") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val zDir = Files.createTempDirectory("graft_zmz_").toString + "/li"
    Layout.zorderWrite(li, zDir, 16, "l_orderkey", "l_partkey")
    val zm = ZoneMap.build(spark, zDir, "l_orderkey", "l_partkey")
    val bounds = Seq[(String, Any, Any)](
      ("l_orderkey", 1000L, 5000L), ("l_partkey", 50L, 150L))
    val pruned = ZoneMap.prunedRead(spark, zDir, zm, bounds)
    val expected = li.filter(
      $"l_orderkey".between(1000L, 5000L) && $"l_partkey".between(50L, 150L))
    assert(pruned.df.count() == expected.count() && expected.count() > 0)
    assert(pruned.df.exceptAll(expected).isEmpty && expected.exceptAll(pruned.df).isEmpty)
    assert(pruned.selectedFiles < pruned.totalFiles,
      s"z-order box should skip files, read ${pruned.selectedFiles}/${pruned.totalFiles}")
  }

  test("footer-based build equals the scan-based build and prunes identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zmfooter_").toString + "/li"
    val li = graft.sources.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate", $"l_quantity")
    Layout.sortedWrite(li, dir, 8, "l_orderkey")
    val scanned = ZoneMap.build(spark, dir, "l_orderkey", "l_returnflag", "l_shipdate")
    val footer = ZoneMap.buildFromFooters(spark, dir, "l_orderkey", "l_returnflag", "l_shipdate")
    def key(s: String) = new java.net.URI(s).getPath
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => key(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5),
          r.getAs[java.time.LocalDateTime](6), r.getAs[java.time.LocalDateTime](7))).toMap
    val (s, f) = (canon(scanned.select($"file", $"rows",
        $"min_l_orderkey", $"max_l_orderkey", $"min_l_returnflag",
        $"max_l_returnflag", $"min_l_shipdate", $"max_l_shipdate")),
      canon(footer.select($"file", $"rows",
        $"min_l_orderkey", $"max_l_orderkey", $"min_l_returnflag",
        $"max_l_returnflag", $"min_l_shipdate", $"max_l_shipdate")))
    assert(s === f, "footer statistics must reproduce the scan-based envelope exactly")
    // and the footer index must drive the same pruned read
    val bounds = Seq[(String, Any, Any)](("l_orderkey", 2000L, 4000L))
    val pruned = ZoneMap.prunedRead(spark, dir, footer, bounds)
    val expected = li.filter($"l_orderkey".between(2000L, 4000L))
    assert(pruned.df.count() == expected.count())
    assert(pruned.selectedFiles < pruned.totalFiles)
    intercept[IllegalArgumentException] {
      ZoneMap.buildFromFooters(spark, dir, "no_such_column")
    }
  }

  test("an empty candidate set returns an empty frame with the table schema, scanning nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zmempty_").toString + "/t"
    Layout.sortedWrite(Seq((1L, "a"), (2L, "b"), (50L, "c")).toDF("k", "s"), dir, 2, "k")
    val zm = ZoneMap.build(spark, dir, "k")
    val pruned = ZoneMap.prunedRead(spark, dir, zm,
      Seq[(String, Any, Any)](("k", 1000L, 2000L)))
    assert(pruned.selectedFiles == 0)
    assert(pruned.df.columns.toSeq == Seq("k", "s"))
    assert(pruned.df.isEmpty)
  }

  test("stale index is correctness-safe: files appended after build are still scanned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zmstale_").toString + "/t"
    Seq((1L, "old"), (2L, "old2")).toDF("k", "s").repartition(1).write.parquet(dir)
    val zm = ZoneMap.build(spark, dir, "k").cache()
    zm.count()
    // the index is now persisted; new data arrives without a rebuild
    Seq((3L, "late")).toDF("k", "s").repartition(1).write.mode("append").parquet(dir)
    val pruned = ZoneMap.prunedRead(spark, dir, zm,
      Seq[(String, Any, Any)](("k", 3L, 10L)))
    assert(pruned.df.select($"s").as[String].collect().toSeq == Seq("late"),
      "a file the stale index has never seen must still be scanned")
    // and the stale index still rules out what it CAN rule out
    assert(pruned.selectedFiles < pruned.totalFiles)
    zm.unpersist()
  }

  test("all-null files are pruned; mixed files keep only matching rows after the re-filter") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zmnull_").toString + "/t"
    // partition by a flag so one file holds only null keys
    val df = Seq((Some(10L), "keep"), (Some(999L), "drop"), (None: Option[Long], "nullkey"))
      .toDF("k", "s")
    df.repartition(1).filter($"k".isNotNull).write.parquet(dir)
    df.repartition(1).filter($"k".isNull).write.mode("append").parquet(dir)
    val zm = ZoneMap.build(spark, dir, "k")
    assert(zm.count() == 2)
    val pruned = ZoneMap.prunedRead(spark, dir, zm,
      Seq[(String, Any, Any)](("k", 0L, 100L)))
    // the all-null file is ruled out by its null envelope; the surviving
    // file still holds k=999, which the re-applied filter removes
    assert(pruned.selectedFiles == 1 && pruned.totalFiles == 2)
    assert(pruned.df.select($"s").as[String].collect().toSeq == Seq("keep"))
  }

  test("footer fold uses unsigned UTF-8 order: supplementary chars across row groups keep the envelope safe") {
    import spark.implicits._
    // U+E000 (3-byte UTF-8) sorts ABOVE an emoji (4-byte UTF-8, surrogate
    // pair) in java.lang.String's UTF-16 order but BELOW it in the unsigned
    // UTF-8 byte order parquet stats and Spark comparisons use. A UTF-16
    // fold across row-group chunks would record max = U+E000…, and a probe
    // for the emoji rows would then WRONGLY prune the file — lost rows, the
    // one failure the zone-map contract forbids.
    val pua = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    val dir = Files.createTempDirectory("graft_zmutf8_").toString + "/t"
    val rows = (1 to 8000).map(i => (i.toLong, pua + f"$i%05d")) ++
      (8001 to 16000).map(i => (i.toLong, emoji + f"$i%05d"))
    rows.toDF("k", "s").coalesce(1).sortWithinPartitions($"k")
      .write.option("parquet.block.size", 64 * 1024).parquet(dir)
    // The scenario needs the two script ranges in DIFFERENT row groups of
    // ONE file — verify the tiny block size actually produced that.
    val status = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
        spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head
    val nRowGroups = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(status,
          spark.sparkContext.hadoopConfiguration))
      try r.getFooter.getBlocks.size finally r.close()
    }
    assert(nRowGroups >= 2, s"need >= 2 row groups to exercise the fold, got $nRowGroups")
    val footer = ZoneMap.buildFromFooters(spark, dir, "s")
    val scanned = ZoneMap.build(spark, dir, "s")
    def env(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(2), r.getString(3))).toSeq
    assert(env(footer) == env(scanned),
      "footer fold must reproduce Spark's own min/max envelope")
    // and the emoji rows survive a pruned read driven by the footer index
    val pruned = ZoneMap.prunedRead(spark, dir, footer,
      Seq[(String, Any, Any)](("s", emoji, emoji + "zzzzz")))
    assert(pruned.df.count() == 8000,
      "file holding the UTF-8-larger rows must not be pruned")
  }
}
