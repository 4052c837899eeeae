package graft

/** Pins the input-derived shuffle-partitioning rule (design rule #6 in the
  * engine, not an env override): small dirs floor at core count — so every
  * bench/verify plan at sf0.01/sf0.1 is unchanged — and big dirs scale
  * linearly to the measured-good 64× setting, bounded by the cap. */
class TuningSpec extends SparkSpec {

  test("derivation floors at core count for bench-scale dirs") {
    // sf0.1 is ~17 MB — under any plausible core count × 4 MiB
    assert(Tuning.partitionsForBytes(17L << 20, floor = 32) == 32)
    assert(Tuning.partitionsForBytes(0L, floor = 32) == 32)
    // empty/missing dir probe (0 bytes) keeps the session floor
    assert(Tuning.partitionsForBytes(0L, floor = 4) == 4)
  }

  test("derivation scales with bytes: the 64x sweep dir lands near the measured-good 256") {
    // the sweep's 64× dir is ~1.1 GB: 1.1 GB / 4 MiB ≈ 280
    val p = Tuning.partitionsForBytes(1100L << 20, floor = 32)
    assert(p >= 256 && p <= 320, s"expected ~256-320 partitions, got $p")
  }

  test("derivation is capped") {
    // a 100 TB dir must not demand 26M partitions from the scheduler
    assert(Tuning.partitionsForBytes(100L << 40, floor = 32) == 4096)
    assert(Tuning.partitionsForBytes(100L << 40, floor = 32, cap = 512) == 512)
  }

  test("tuneFor sets the session conf from the dir's size and floors at sf scale") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // sf0.001 (~0.5 MB) floors at defaultParallelism (4 in tests)
      Tuning.tuneFor(spark, sf0001)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
        spark.sparkContext.defaultParallelism)
      // a missing dir keeps the floor instead of throwing
      Tuning.tuneFor(spark, "/nonexistent/graft/dir")
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
        spark.sparkContext.defaultParallelism)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("a failed size probe is not memoized: the dir re-probes once it exists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tune_retry_")
      .resolve("later").toString
    // first probe fails (dir absent) — must not poison the cache
    Tuning.tuneFor(spark, dir)
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
      spark.sparkContext.defaultParallelism)
    // dir appears with enough bytes to out-derive the floor
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "blob.bin"),
      new Array[Byte](48 << 20)) // 48 MB -> 12 partitions > floor 4
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Tuning.tuneFor(spark, dir)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt == 12,
        "transient probe failure must not pin the dir at the floor forever")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("tuning.enabled=false leaves the session's setting alone") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set(Tuning.EnabledKey, "false")
      spark.conf.set("spark.sql.shuffle.partitions", "77")
      SparkEntry.queries("q02_project_filter")(spark, sf0001)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "77",
        "disabled tuner must not clobber an explicitly-set partition count")
    } finally {
      spark.conf.unset(Tuning.EnabledKey)
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("build-then-act contract: last build's setting governs until the next per-action re-tune") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val bigDir = java.nio.file.Files.createTempDirectory("graft_tune_multi_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(bigDir, "blob.bin"),
      new Array[Byte](48 << 20)) // 48 MB -> 12 partitions > floor 4
    try {
      // A multi-dir caller builds for the small dir FIRST, then the big
      // one, then acts: the conf it executes under is the LAST build's.
      Tuning.tuneFor(spark, sf0001)
      Tuning.tuneFor(spark, bigDir)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt == 12,
        "after building for two dirs, the last dir's derivation must govern")
      // The documented remedy: re-tune per action — the small dir's floor
      // comes back for ITS action.
      Tuning.tuneFor(spark, sf0001)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
        spark.sparkContext.defaultParallelism)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("explicit env override wins over the derivation") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val bigDir = java.nio.file.Files.createTempDirectory("graft_tune_env_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(bigDir, "blob.bin"),
      new Array[Byte](48 << 20)) // would derive 12 without the override
    try {
      Tuning.tuneForWith(spark, bigDir, envOverride = Some("77"))
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt == 77,
        "SPARK_GRAFT_SHUFFLE_PARTITIONS must be applied verbatim, derivation skipped")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("every SparkEntry query passes through the tuner") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "999")
      // building any registered query must re-derive the conf for its dir
      SparkEntry.queries("q02_project_filter")(spark, sf0001)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
        spark.sparkContext.defaultParallelism,
        "SparkEntry wrapper did not tune the session for the query dir")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
