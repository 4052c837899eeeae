package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ext.Dedup
import graft.sources.{Staged, Tables, TempDirs}

/** The incremental near-dup ingest (q150) run as a LIVE pipeline: new
  * document files land in a watched directory, and each micro-batch is
  * checked against the corpus-wide materialized MinHash signature table —
  * the crawl-ingest deployment shape at 100 TB, where dedup-on-arrival
  * must never rescan (or re-shingle) the accumulated corpus.
  *
  * Composition, all pre-existing engine pieces:
  *  - file stream source over the landing dir (q201's learning replay
  *    keeps `maxFilesPerTrigger=1` so each landed file is its own
  *    micro-batch — the cross-batch matching its oracle pins needs it;
  *    q153's history-only probe is slicing-independent and runs its
  *    replay as one batch);
  *  - `foreachBatch` → [[graft.ext.Dedup.newNearDupsAgainstSignatureTable]]
  *    — the same zero-corpus-shuffle probe q150 uses (batch bands
  *    BROADCAST against the signature-table scan; only result-bounded
  *    candidate pairs ever shuffle);
  *  - append sink: each micro-batch's accepted near-dup report lands as
  *    its own parquet delivery, the streaming analog of q150's one-shot
  *    result.
  *
  * Because every batch row is compared against HISTORY only, the union of
  * per-micro-batch results equals the one-shot batch result regardless of
  * how the ingest is sliced into files — which is why q153 shares q150's
  * DuckDB oracle verbatim. (The shared staged table stays immutable so
  * repeated runs — and q143/q150 beside it — stay independent.)
  *
  * [[learningIngest]] is the FULL deployment shape: each accepted
  * micro-batch also lands its signature rows as a batchId-keyed delta, and
  * every later batch probes base ∪ deltas — so batch N+1 matches batch N,
  * not just the pre-existing corpus. Delta writes are batchId-keyed
  * OVERWRITES (foreachBatch is at-least-once), so a checkpoint replay is
  * append-once, and a retried batch reads only deltas with batch_id
  * strictly below its own — its own half-written delta can never feed its
  * own probe. Spec-verified in NearDupIngestSpec (q153's oracle is
  * deliberately left on the history-only pipeline).
  */
object NearDupIngest {

  private val batchSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** q153: stream the deterministic q150 ingest batch through the landing
    * dir and probe each micro-batch against the signature table. */
  def q153StreamingNearDupIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = Dedup.withPlantedNear(docs, 20)
    val table = Staged.minhashSignatureTable(spark, dir)
    val watch = Staged.neardupIngestWatchDir(spark, dir)
    val outDir = TempDirs.create("graft_ndingest_out_").toString
    // No maxFilesPerTrigger: every batch row probes HISTORY only, so the
    // union of per-micro-batch reports is independent of file slicing (the
    // scaladoc invariant above) — one micro-batch is the cheapest exact
    // replay. Genuinely-incremental multi-batch probing is exercised by
    // q201 and NearDupIngestSpec.
    val q = spark.readStream
      .schema(batchSchema)
      .parquet(watch)
      .writeStream
      .option("checkpointLocation",
        TempDirs.create("graft_ndingest_ck_").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // batchId-keyed OVERWRITE, never append (the file's own discipline,
        // see the scaladoc above): an append sink double-writes on replay,
        // and was shielded here only by the fresh temp checkpoint. The
        // partition key is micro_batch (report rows already carry a
        // batch_id DATA column — the probing document's id).
        Dedup.newNearDupsAgainstSignatureTable(spark, table, b, corpus)
          .write.mode("overwrite").parquet(s"$outDir/micro_batch=$batchId")
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir).drop("micro_batch")
      .orderBy("batch_id", "history_id")
  }

  /** State layout of one learning-ingest run: per-batch signature and
    * document deltas plus the per-batch near-dup reports, every write
    * batchId-keyed so replays overwrite rather than double-append. */
  final case class IngestState(root: String) {
    val sigsDir = s"$root/sigs"
    val docsDir = s"$root/docs"
    val reportDir = s"$root/report"
    def sigDelta(batchId: Long): String = s"$sigsDir/batch_id=$batchId"
    def docDelta(batchId: Long): String = s"$docsDir/batch_id=$batchId"
    // `micro_batch`, not `batch_id`: the report rows already carry a
    // batch_id DATA column (the probing document's id) — a same-named
    // partition key would collide at read time.
    def report(batchId: Long): String = s"$reportDir/micro_batch=$batchId"
  }

  // Explicit delta schemas (batch_id is the partition dir key): schema
  // INFERENCE over the delta root wedges checkpoint replay — a batch that
  // crashed after creating its batch_id=N dir but before committing any
  // part file leaves the root existing with ZERO data files, and an
  // inferring read throws UNABLE_TO_INFER_SCHEMA forever after. With the
  // schema supplied, that state reads back as an empty frame and the
  // replay proceeds — the same explicit-schema device the report read
  // below already uses.
  // (hs, the delta files' third data column, is deliberately absent —
  // consumers only read (doc_id, sig), and a user schema prunes unlisted
  // columns at the reader.)
  private val sigDeltaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", org.apache.spark.sql.types.ArrayType(LongType)),
    StructField("batch_id", LongType)))
  private val docDeltaSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("batch_id", LongType)))

  private def readDeltas(spark: SparkSession, dir: String, below: Long,
                         schema: StructType): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val df = spark.read.schema(schema).parquet(dir)
      // Strictly-earlier deltas only: a RETRIED batch must not probe the
      // half-written delta of its own first attempt.
      Some(df.filter(col("batch_id") < below))
    }
  }

  /** One micro-batch of the learning ingest, exposed for direct
    * idempotency testing: probe `b` against base-table ∪ earlier deltas,
    * write the report, then land this batch's signature + document
    * deltas. All three writes are batchId-keyed overwrites.
    *
    * PRECONDITION: doc_ids are globally unique across the base table and
    * every landed batch (the crawl-ingest contract — ids are
    * monotonically assigned at crawl time). A re-delivered id under a
    * DIFFERENT batchId would appear in both the base union and a delta,
    * and the verify join on doc_id would fan out duplicate report rows;
    * same-batchId re-delivery (the foreachBatch retry case) is the case
    * the batchId-keyed overwrites make safe. */
  def ingestBatch(spark: SparkSession, baseTable: String, corpus: DataFrame,
                  state: IngestState, b: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    val baseSigs = spark.table(baseTable).select($"doc_id", $"sig")
    val histSigs = readDeltas(spark, state.sigsDir, batchId, sigDeltaSchema) match {
      case Some(d) => baseSigs.unionByName(d.select($"doc_id", $"sig"))
      case None => baseSigs
    }
    val histText = readDeltas(spark, state.docsDir, batchId, docDeltaSchema) match {
      case Some(d) => corpus.unionByName(d.select($"doc_id", $"text"))
      case None => corpus
    }
    val cand = Dedup.nearDupCandidatesAgainstSigs(histSigs, b)
    graft.JobStage.named(spark, s"neardup-ingest: probe+verify report (batch $batchId)") {
      Dedup.verifyNearDupCandidates(cand, histText, b)
        .write.mode("overwrite").parquet(state.report(batchId))
    }
    graft.JobStage.named(spark, s"neardup-ingest: signature delta (batch $batchId)") {
      Dedup.batchSignatureRows(b)
        .write.mode("overwrite").parquet(state.sigDelta(batchId))
    }
    graft.JobStage.named(spark, s"neardup-ingest: doc delta (batch $batchId)") {
      b.select($"doc_id", $"text")
        .write.mode("overwrite").parquet(state.docDelta(batchId))
    }
  }

  /** The learning pipeline over a watched landing dir: like
    * [[q153StreamingNearDupIngest]] but each accepted batch's signatures
    * are appended, so batch N+1 can match batch N. Returns the union of
    * per-batch reports. `stateRoot` defaults to a fresh temp dir. */
  def learningIngest(spark: SparkSession, dir: String, watch: String,
                     stateRoot: Option[String] = None,
                     checkpoint: Option[String] = None): DataFrame = {
    import spark.implicits._
    // The two options are a PAIR: the checkpoint records which batches are
    // committed, the stateRoot holds those batches' deltas and reports.
    // Resuming a persistent checkpoint against a fresh temp stateRoot
    // would silently skip the committed batches' reports AND probe new
    // batches against an empty delta history — the cross-batch matches
    // this pipeline exists for would just not appear.
    require(stateRoot.isDefined == checkpoint.isDefined,
      "stateRoot and checkpoint must be passed together (both persistent " +
        "for a resumable ingest, both absent for a fresh run)")
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = Dedup.withPlantedNear(docs, 20)
    val table = Staged.minhashSignatureTable(spark, dir)
    val state = IngestState(
      stateRoot.getOrElse(TempDirs.create("graft_ndlearn_state_").toString))
    val q = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(watch)
      .writeStream
      .option("checkpointLocation", checkpoint.getOrElse(
        TempDirs.create("graft_ndlearn_ck_").toString))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        ingestBatch(spark, table, corpus, state, b, batchId)
      }
      .start()
    q.awaitTermination()
    // Explicit schema: no inference, so an all-empty run (no near-dups in
    // any batch) still reads back as an empty frame instead of failing.
    val reportSchema = StructType(Seq(
      StructField("batch_id", LongType), StructField("history_id", LongType),
      StructField("jaccard", org.apache.spark.sql.types.DoubleType),
      StructField("micro_batch", LongType)))
    // Zero micro-batches (empty watch dir) means foreachBatch never ran and
    // reportDir was never created — same existence guard as readDeltas.
    val rp = new org.apache.hadoop.fs.Path(state.reportDir)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], reportSchema)
        .select($"micro_batch", $"batch_id", $"history_id", $"jaccard")
    spark.read.schema(reportSchema).parquet(state.reportDir)
      .select($"micro_batch", $"batch_id", $"history_id", $"jaccard")
      .orderBy("micro_batch", "batch_id", "history_id")
  }

  /** q201: the LEARNING ingest as an oracle-checked driver query — replay
    * the deterministic two-slice fixture ([[graft.sources.Staged
    * .learningIngestWatchDir]]: the q153 batch parity-split, plus a
    * cross-batch planted pair that only base ∪ delta probing can catch)
    * and report every accepted near-dup pair. Micro-batch 0's planted doc
    * 5000000 matches nothing (its reversed text shares no shingles with
    * the corpus, and the base signature table has never seen it);
    * micro-batch 1's near-copy 5000001 MUST match it — the oracle row
    * that separates this pipeline from q153's history-only probe.
    *
    * The report is windowed exactly like q150/q153 (history_id < 400, the
    * planted ' xtra' ids, plus everything above [[graft.ext.Dedup
    * .BatchIdOffset]] — i.e. all learned-delta matches) so the quadratic
    * DuckDB oracle stays feasible while every cross-batch pair is kept. */
  def q201LearningIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val watch = Staged.learningIngestWatchDir(spark, dir)
    learningIngest(spark, dir, watch)
      .filter($"history_id" < 400L ||
        ($"history_id" >= Dedup.NearDupIdOffset &&
          $"history_id" < Dedup.NearDupIdOffset + 20) ||
        $"history_id" >= Dedup.BatchIdOffset)
      .orderBy("micro_batch", "batch_id", "history_id")
  }
}
