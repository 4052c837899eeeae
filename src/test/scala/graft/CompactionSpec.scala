package graft

import java.nio.file.Files
import graft.ops.Compaction

class CompactionSpec extends SparkSpec {

  test("compaction collapses many small files into few, preserving content") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_").toString + "/table"
    (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(32).write.parquet(dir)
    assert(Compaction.parquetFileCount(spark, dir) >= 16)
    val before = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq

    Compaction.compact(spark, dir)

    assert(Compaction.parquetFileCount(spark, dir) == 1)
    val after = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
  }

  test("versioned compaction is atomic: readers resolve only committed versions") {
    import org.apache.hadoop.fs.Path
    import graft.ops.VersionedTable
    import spark.implicits._
    val root = Files.createTempDirectory("graft_vcompact_").toString + "/table"
    val data = (1 to 10000).map(i => (i.toLong, s"row$i"))
    data.toDF("id", "s").repartition(32).write.parquet(s"$root/v=0")
    assert(Compaction.parquetFileCount(spark, s"$root/v=0") >= 16)

    // A half-written new version (no _SUCCESS) must be invisible to readers:
    // this is the exact state a reader observes DURING compaction.
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/v=1"))
    fs.create(new Path(s"$root/v=1/part-00000.parquet")).close() // torn write
    assert(VersionedTable.latest(spark, root).map(_._1).contains(0),
      "uncommitted version directory must not be resolved as current")
    val during = VersionedTable.read(spark, root, data.toDF("id", "s").schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(during == data.map(_._1), "reader mid-compaction must see the old complete table")

    // Compaction claims v=1 (overwriting the torn leftover), commits, vacuums.
    Compaction.compactVersioned(spark, root)
    assert(VersionedTable.latest(spark, root).map(_._1).contains(1))
    val latestDir = s"$root/v=1"
    assert(Compaction.parquetFileCount(spark, latestDir) == 1)
    val after = VersionedTable.read(spark, root, data.toDF("id", "s").schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == data.map(_._1))
    assert(!fs.exists(new Path(s"$root/v=0")), "old version vacuumed after commit")
  }

  test("sorted layout yields disjoint per-file ranges (file-skipping precondition)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_layout_").toString + "/li"
    graft.ops.Layout.sortedWrite(
      graft.sources.Tables.lineitem(spark, sf001), dir, 8, "l_shipdate")
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"l_shipdate").as("lo"), max($"l_shipdate").as("hi"))
      .collect().map { r =>
        // l_shipdate reads back as TIMESTAMP_NTZ → LocalDateTime
        val lo = r.getAs[java.time.LocalDateTime]("lo")
        val hi = r.getAs[java.time.LocalDateTime]("hi")
        (lo, hi)
      }.sortBy(_._1)
    assert(ranges.length == 8)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(!hi1.isAfter(lo2), "file ranges overlap")
      case _ =>
    }
  }

  test("shingle-hash kernel edge cases: empty, single token, duplicates") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Kernels
    assert(Kernels.shingleHashes(UTF8String.fromString(""), 3).numElements() == 0)
    assert(Kernels.shingleHashes(UTF8String.fromString("word"), 3).numElements() == 1)
    assert(Kernels.shingleHashes(UTF8String.fromString("   "), 3).numElements() == 0)
    // identical repeated windows dedupe
    val rep = Kernels.shingleHashes(UTF8String.fromString("a a a a a a"), 3)
    assert(rep.numElements() == 1)
    // minhash of empty shingles is the defined zero signature
    val mh = Kernels.minhashSig(Kernels.shingleHashes(UTF8String.fromString(""), 3))
    assert((0 until 64).forall(i => mh.getLong(i) == 0L))
  }
}
