package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.RollingHash

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: token counting, quality scoring, n-gram language ID,
  * document fingerprinting. All per-row expression work — narrow plans, no
  * shuffles, codegen end-to-end; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  def tokens(c: Column): Column = split(c, "\\s+")

  /** Non-overlapping occurrence count of `needle` in `padded` text, via the
    * replace trick — exactly reproducible in any SQL engine. */
  private def occurrences(text: Column, needle: String): Column =
    (length(text) - length(replace(text, lit(needle), lit("")))) / needle.length

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Tokens, characters, punctuation, stopword ratio and a composite quality
    * score per document. */
  def q30TextStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val stopArr = typedLit(stopwords)
    Tables.documents(spark, dir)
      .select(
        $"doc_id", $"lang",
        length($"text").as("n_chars_measured"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => array_contains(stopArr, t))).as("n_stopwords"),
        (length($"text") - length(regexp_replace($"text", "[.,!?;:]", ""))).as("n_punct"))
      .withColumn("stop_ratio",
        round($"n_stopwords".cast("double") / $"n_tokens", 6))
      .withColumn("quality_score",
        round(least(lit(1.0), $"n_tokens" / 200.0) * 0.5
          + $"stop_ratio" * 0.3
          + (lit(1.0) - least(lit(1.0), $"n_punct" / 20.0)) * 0.2, 6))
      .orderBy($"doc_id")
  }

  /** BPE-ish token count estimate: pre-tokenize with a GPT-style regex
    * (letter runs / digit runs / single punctuation), then charge
    * ceil(len/4) subword tokens per word — the standard cheap proxy for
    * tokenizer budgeting when the real BPE vocab isn't in the loop. */
  def q52BpeTokenEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Case-folded like every other tokenizer here: against raw text the
    // letter class would treat each UPPERCASE letter as a single-char
    // punctuation piece ("Hello" -> "H","ello"), inflating the estimate on
    // any natural-case corpus (the fixture happens to be all-lowercase).
    // Native one-pass kernel (Kernels.bpeEstimate) since round 16: the
    // regexp_extract_all + aggregate-HOF form ran its lambda interpreted
    // per piece and measured 25.3x at the 64x octave. Lowering stays here
    // (codegen'd, Unicode-correct); the kernel reproduces the piece regex
    // byte-exactly. Struct aliased in its own projection so the kernel
    // runs once per row.
    Tables.documents(spark, dir)
      .select($"doc_id",
        graft.functions.NativeKernels.bpeEstimate(lower($"text")).as("bs"))
      .select($"doc_id",
        $"bs.n_pieces".as("n_pieces"),
        $"bs.bpe_estimate".as("bpe_estimate"))
      .orderBy($"doc_id")
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a "),
    "de" -> Seq(" der ", " und "),
    "es" -> Seq(" el ", " los "),
    "fr" -> Seq(" le ", " la "),
    "zh" -> Seq(" de ", " shi "))

  /** N-gram-heuristic language ID: count per-language marker words (space
    * padded, replace-trick) and take the argmax with a fixed preference
    * order. Compared against the table's `lang` label. */
  def q31LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val padded = concat(lit(" "), $"text", lit(" "))
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", padded.as("padded"))
    val withScores = langMarkers.foldLeft(scored) { case (df, (lang, markers)) =>
      df.withColumn(s"score_$lang",
        markers.map(m => occurrences(col("padded"), m)).reduce(_ + _))
    }
    // argmax with preference order = langMarkers order on ties: a language
    // wins if its score is positive and >= every later language's score
    // (earlier clauses already failed, so it is the overall max).
    val langs = langMarkers.map(_._1)
    val pred = langs.zipWithIndex.reverse
      .foldLeft(lit("und")) { case (acc, (lang, idx)) =>
        val c = col(s"score_$lang")
        val geLater = langs.drop(idx + 1)
          .map(o => c >= col(s"score_$o"))
          .foldLeft(lit(true))(_ && _)
        when(geLater && c > 0, lit(lang)).otherwise(acc)
      }
    withScores
      .withColumn("lang_pred", pred)
      .withColumn("is_match", $"lang_pred" === $"lang")
      .select($"doc_id", $"lang", $"lang_pred", $"is_match")
      .orderBy($"doc_id")
  }

  /** Winnowing-style fingerprint per document via the native
    * [[graft.functions.RollingHashMin]] expression (codegen'd). Documents
    * sharing a fingerprint share a minimal substring window — a cheap
    * near-dup prefilter. No SQL oracle (engine-specific hash); golden-tested. */
  def q33Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        RollingHash.rollingHashMin($"text", 32).as("fingerprint"),
        length($"text").as("n_chars_measured"))
      .orderBy($"doc_id")
  }

  /** Planted-equality COMPANION ORACLE for q33 (VERDICT r09 #4): q33 itself
    * is `no_oracle` — DuckDB cannot compute the rolling-hash kernel — but
    * this invariant is SQL-statable without computing it: the fingerprint is
    * a pure function of the text, so exact copies of the 25 lowest-doc_id
    * documents planted at doc_id + [[graft.ext.Dedup.ExactDupIdOffset]]
    * must fingerprint identically — `fp_equal` is TRUE on every planted
    * pair. Null-safe (`<=>`): a doc shorter than the 32-char window
    * fingerprints as null on BOTH sides, which still counts as equal. The
    * 25-pair probe side broadcasts; the fingerprint pass is the real
    * corpus-wide scan-speed kernel. */
  def q144FingerprintPlanted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 25
    val off = graft.ext.Dedup.ExactDupIdOffset
    val base = Tables.documents(spark, dir).select($"doc_id", $"text")
    val firstK = base.orderBy($"doc_id").limit(k)
    val fp = base.unionByName(firstK.select(($"doc_id" + off).as("doc_id"), $"text"))
      .select($"doc_id", RollingHash.rollingHashMin($"text", 32).as("fingerprint"))
    firstK.select($"doc_id".as("orig_id"), ($"doc_id" + off).as("copy_id"))
      .join(fp.select($"doc_id".as("orig_id"), $"fingerprint".as("fp_orig")), Seq("orig_id"))
      .join(fp.select($"doc_id".as("copy_id"), $"fingerprint".as("fp_copy")), Seq("copy_id"))
      .select($"orig_id", $"copy_id", ($"fp_orig" <=> $"fp_copy").as("fp_equal"))
      .orderBy($"orig_id")
  }

  /** q180: lexical diversity per source — distinct-1 and distinct-2 (the
    * Li et al. 2016 generation-diversity metrics): the fraction of
    * unigram/bigram occurrences that are distinct types. The degenerate-
    * output detector for synthetic/model-generated corpora: mode collapse
    * shows up as distinct-n cratering while perplexity still looks fine.
    *
    * Scale shape: one tokenize pass feeds both n-gram streams; the
    * distinct counts are per-(source, gram) aggregates keyed by bounded
    * source × gram (map-side combined), collapsing to a source-keyed
    * bounded aggregate; the two ratios are correctly-rounded divisions of
    * exact counts.
    */
  def q180LexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"source", $"doc_id",
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')").as("tk"))
    val uni = tok.select($"source", explode($"tk").as("g"))
    val bi = tok.select($"source", explode(expr(
      "CASE WHEN size(tk) > 1 THEN transform(sequence(1, size(tk) - 1), " +
        "i -> concat(tk[i-1], ' ', tk[i])) ELSE array() END")).as("g"))
    def stats(grams: DataFrame, n: String): DataFrame =
      grams.groupBy($"source", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(count(lit(1)).as(s"types_$n"), sum($"c").as(s"tokens_$n"))
    stats(uni, "1")
      .join(stats(bi, "2"), Seq("source"))
      .select($"source", $"types_1", $"tokens_1",
        round($"types_1".cast("double") / $"tokens_1", 6).as("distinct_1"),
        $"types_2", $"tokens_2",
        round($"types_2".cast("double") / $"tokens_2", 6).as("distinct_2"))
      .orderBy($"source")
  }

  /** q183: term burstiness — the Church–Gale dispersion statistic: for
    * the 20 highest-mass terms, the variance-to-mean ratio of per-document
    * counts (zeros included). VMR ≈ 1 is Poisson (topic-neutral function
    * words); VMR ≫ 1 is bursty (topical terms clumping in few docs); a
    * whole corpus of VMR ≈ 1 content terms flags template/synthetic text.
    *
    * Exactness: VMR = (N·Σc² − (Σc)²) / (N·Σc) — numerator and
    * denominator are exact BIGINT sums over (doc, term) counts (absent
    * docs contribute zeros to both sums for free), so the one division is
    * correctly rounded and cross-engine identical. Scale shape: one
    * (doc, term) aggregate (map-side combined), one term-keyed rollup,
    * TakeOrdered(20); the doc total N rides as a broadcast scalar frame.
    */
  def q183Burstiness(spark: SparkSession, dir: String,
                     topN: Int = 20): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs
      .select($"doc_id", explode(
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .groupBy($"term").agg(
        count(lit(1)).as("n_docs_with"),
        sum($"c").as("total"),
        // exact decimal(38,0) (q166/q195 device): a 100 TB corpus' common
        // terms push Σc² and N·Σc² past 2⁶³; in-range values bit-identical
        // to the int64 form (oracle unchanged)
        sum($"c".cast("decimal(38,0)") * $"c").as("sum_sq"))
      .crossJoin(broadcast(nDocs))
      .select($"term", $"n_docs_with", $"total",
        round(($"n_docs" * $"sum_sq"
            - $"total".cast("decimal(38,0)") * $"total").cast("double")
          / ($"n_docs".cast("decimal(38,0)") * $"total").cast("double"), 6).as("vmr"))
      .orderBy($"total".desc, $"term")
      .limit(topN)
  }

  /** q190: lexical cosine retrieval — document-to-document similarity
    * WITHOUT embeddings: cosine over the q177 hashed bag-of-words vectors,
    * computed as an inverted-index join (candidates meet only on shared
    * hash buckets, partial dot products aggregate per pair). This is the
    * sparse complement of the dense q37/q174 paths — the retrieval shape
    * when no encoder has run yet.
    *
    * Exactness: bucket counts and Σc² norms are exact ints; cosine is
    * dot / (√q2 · √c2) — one shape-mirrored double chain (√ correctly
    * rounded IEEE) rounded before ranking, ties on neighbor id. Scale
    * shape: the query vectors broadcast into the bucket-keyed join, so
    * the corpus-side vector table shuffles ONCE on bucket; per-pair dots
    * aggregate map-side; top-k is a WindowGroupLimit per query.
    */
  def q190LexicalCosine(spark: SparkSession, dir: String, nQueries: Int = 5,
                        k: Int = 5, dim: Int = 1024): DataFrame = {
    import spark.implicits._
    // ONE corpus tokenize (r19): the vector table has four consumers (both
    // norm2 uses, the broadcast query side, the join probe side), and a lazy
    // plan re-ran the tokenize+hash+aggregate chain for each — the before
    // plan shows 8 parquet scans / 24 Exchanges. localCheckpoint the bounded
    // (doc, bucket, c) table once (≤ docs×dim rows — the materialized
    // feature table a production retrieval layer stores anyway); every
    // consumer, including both norm2 aggregates, derives from the leaf.
    // The q121/q198 device; values and oracle unchanged.
    val vec = hashedBow(Tables.documents(spark, dir), dim).localCheckpoint()
    val norm2 = vec.groupBy($"doc_id").agg(sum($"c" * $"c").as("n2"))
    val q = vec.filter($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), $"bucket", $"c".as("cq"))
    val dot = vec
      .join(broadcast(q), vec("bucket") === q("bucket")
        && $"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id".as("neighbor_id"))
      .agg(sum($"cq" * $"c").as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    dot
      .join(broadcast(norm2.filter($"doc_id" < nQueries)
        .select($"doc_id".as("query_id"), $"n2".as("q2"))), Seq("query_id"))
      .join(norm2.select($"doc_id".as("neighbor_id"), $"n2".as("c2")),
        Seq("neighbor_id"))
      .withColumn("cos", round($"dot".cast("double")
        / (sqrt($"q2".cast("double")) * sqrt($"c2".cast("double"))), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** q197: Good–Turing frequency-of-frequencies — the classic missing-mass
    * estimator over corpus trigrams: N_r (how many distinct trigrams occur
    * exactly r times), the smoothed count r* = (r+1)·N_{r+1}/N_r, and the
    * unseen-mass estimate P₀ = N₁/N. This is the statistic that says how
    * much probability a model should reserve for n-grams it has never
    * seen — the quantitative form of "is this corpus big enough".
    *
    * Exactness: every N_r and N are exact integer aggregates; r* and P₀
    * are single correctly-rounded divisions. Scale shape: one trigram
    * aggregate (map-side combined, the q86-style shingle stream), one
    * count-keyed frequency-of-frequencies aggregate (output bounded by
    * max count), and an 8-row literal grid join.
    */
  def q197GoodTuring(spark: SparkSession, dir: String,
                     maxR: Int = 8): DataFrame = {
    import spark.implicits._
    val tri = Tables.documents(spark, dir)
      .select(expr(
        "filter(split(lower(text), '[^a-z]+'), x -> x <> '')").as("tk"))
      .select(explode(expr(
        "CASE WHEN size(tk) > 2 THEN transform(sequence(1, size(tk) - 2), " +
          "i -> concat(tk[i-1], ' ', tk[i], ' ', tk[i+1])) " +
          "ELSE array() END")).as("g"))
    val counts = tri.groupBy($"g").agg(count(lit(1)).as("c"))
    val fof = counts.groupBy($"c").agg(count(lit(1)).as("n_r"))
    val totals = counts.agg(sum($"c").as("n_total"),
      sum(when($"c" === 1, 1L).otherwise(0L)).as("n1"))
    val grid = spark.range(1, maxR + 1).select($"id".cast("long").as("r"))
    grid
      .join(broadcast(fof.select($"c".as("r"), $"n_r")), Seq("r"), "left")
      .join(broadcast(fof.select(($"c" - 1).as("r"), $"n_r".as("n_next"))),
        Seq("r"), "left")
      .crossJoin(broadcast(totals))
      .select($"r",
        coalesce($"n_r", lit(0L)).as("n_r"),
        coalesce($"n_next", lit(0L)).as("n_next"),
        when(coalesce($"n_r", lit(0L)) === 0, lit(null))
          .otherwise(round((($"r" + 1) * coalesce($"n_next", lit(0L)))
            .cast("double") / $"n_r", 6)).as("r_star"),
        round($"n1".cast("double") / $"n_total", 6).as("p_unseen"))
      .orderBy($"r")
  }

  /** q177: feature hashing (the Weinberger "hashing trick") — project each
    * document's bag-of-words into a fixed 1024-bucket count vector via a
    * hash of the term, the dimensionality-fixing featurizer for linear
    * probes/classifiers over unbounded vocabularies (colliding terms
    * intentionally share a bucket). Reported as the 5 heaviest buckets for
    * the first 10 documents.
    *
    * The bucket hash is the engine-neutral md5-u32 device (q93/q116):
    * first 8 md5 hex chars as an unsigned int, mod the dimension — a pure
    * function both engines compute identically, so the featurization
    * itself is oracle-checked. Scale shape: hashing is scan-local; the
    * (doc, bucket) aggregate is one shuffle bounded by docs×1024; the
    * top-5 window is per-document, WindowGroupLimit-bounded.
    */
  /** The hashed bag-of-words featurizer shared by q177 and q190 (whose doc
    * promises "cosine over the q177 vectors"): (doc_id, bucket, c) counts
    * with bucket = md5-u32(term) mod dim. One definition so the bucket
    * hash can never silently diverge between the two. */
  private def hashedBow(docs: DataFrame, dim: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("term"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))

  def q177FeatureHashing(spark: SparkSession, dir: String, dim: Int = 1024,
                         nDocs: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"cnt".desc, $"bucket")
    hashedBow(Tables.documents(spark, dir).filter($"doc_id" < nDocs), dim)
      .withColumnRenamed("c", "cnt")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"doc_id", $"rank", $"bucket", $"cnt")
      .orderBy($"doc_id", $"rank")
  }

  /** q175: Zipf rank–frequency fit — least-squares slope/intercept/R² of
    * ln(frequency) against ln(rank) over the top-1000 terms, the corpus-
    * health statistic that flags template/boilerplate-heavy or synthetic
    * corpora (natural text fits slope ≈ −1; a flat or cliff-shaped curve
    * means the token distribution is wrong before any model sees it).
    *
    * Cross-engine discipline: ln(rank) and ln(count) are pinned to 1e-4
    * fixed point per term, so every regression sum (Σx, Σy, Σxy, Σx², Σy²)
    * is exact integer arithmetic within int64 at n = 1000 — order-
    * independent — and the slope/intercept/R² formulas are shape-mirrored
    * double expressions over those exact sums. Scale shape: the top-1000
    * cut is a TakeOrdered (bounded output, no global sort materialized);
    * the ranking window and the regression run on the 1000-row table.
    */
  def q175ZipfFit(spark: SparkSession, dir: String,
                  topN: Int = 1000): DataFrame = {
    import spark.implicits._
    val Fp = 10000L
    val top = Tables.documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"term").limit(topN)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"c".desc, $"term")
    // The unpartitioned window runs over the topN-row table, never data.
    val fx = top
      .withColumn("rk", row_number().over(w))
      .select(
        round(log($"rk".cast("double")) * Fp).cast("long").as("x"),
        round(log($"c".cast("double")) * Fp).cast("long").as("y"))
    val sums = fx.agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
      sum($"y" * $"y").as("syy"))
    sums.select(
      $"n".as("n_terms"),
      round(($"n" * $"sxy" - $"sx" * $"sy").cast("double")
        / ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
      round((($"sy" - (($"n" * $"sxy" - $"sx" * $"sy").cast("double")
          / ($"n" * $"sxx" - $"sx" * $"sx")) * $"sx") / $"n") / Fp, 6)
        .as("intercept"),
      round((($"n" * $"sxy" - $"sx" * $"sy").cast("double")
          * ($"n" * $"sxy" - $"sx" * $"sy"))
        / (($"n" * $"sxx" - $"sx" * $"sx").cast("double")
          * ($"n" * $"syy" - $"sy" * $"sy")), 6).as("r2"))
  }

  /** q204: intra-document repetition audit — the Gopher-family quality
    * filter the inventory lacked (Rae et al. 2021 §A1.1 "repetition"
    * filters; also C4's heuristics): per document, the fraction of word
    * trigrams that are DUPLICATES of an earlier trigram in the same
    * document. Boilerplate, keyword stuffing, and decoding loops all show
    * up as high trigram dup fractions long before any cross-document
    * signal fires; `flagged` applies the conventional 0.2 threshold.
    *
    * Fixture device (planted-copy convention, cf. q39/q145/q152): the
    * natural corpus tops out at dup_frac ≈ 0.04, so docs 0-19 get a
    * planted sibling (doc_id + 500000) whose text is its first 6 words
    * repeated 12 times — id-arithmetic-derived, so the DuckDB oracle
    * rebuilds the identical corpus and the flagged set is exactly the 20
    * planted rows. Fully scan-local: grams, distinct-count and fraction
    * are per-row array expressions (zero shuffle until the output sort);
    * at 100 TB this is scan-speed work, the shape a quality-filter pass
    * must have. */
  def q204DocRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", lower($"text").as("text"))
    val planted = docs.filter($"doc_id" < 20)
      .select(($"doc_id" + 500000L).as("doc_id"),
        concat_ws(" ", flatten(array_repeat(
          slice(split($"text", "\\s+"), 1, 6), 12))).as("text"))
    // Native one-pass kernel (graft.functions.Kernels.trigramStats): the
    // composable form — transform over an index sequence building every
    // gram string, then size + array_distinct — materializes the gram
    // array and walks it twice, and measured 42.8x at the 64x octave
    // (honest compute, double the necessary work). The kernel builds each
    // gram once into a single hash-set pass; exact UTF8String equality ==
    // the concat_ws(' ') semantics the DuckDB oracle states (injective:
    // split(\s+) words contain no spaces). Struct aliased in its own
    // projection so the kernel runs once per row, not once per consumer.
    docs.unionByName(planted)
      .select($"doc_id",
        graft.functions.NativeKernels.trigramStats(split($"text", "\\s+")).as("ts"))
      .select($"doc_id",
        $"ts.n_grams".as("n_grams"),
        $"ts.n_distinct".as("n_distinct"))
      .withColumn("dup_frac",
        when($"n_grams" > 0,
          round(lit(1.0) - $"n_distinct".cast("double") / $"n_grams", 6)))
      .withColumn("flagged", coalesce($"dup_frac" >= 0.2, lit(false)))
      .orderBy($"doc_id")
  }
}
