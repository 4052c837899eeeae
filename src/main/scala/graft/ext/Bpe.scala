package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** q167: BPE merge training (Sennrich et al. 2016) — learn the first k
  * byte-pair merges from the corpus, the tokenizer-training step upstream
  * of every LLM data pipeline (q52 only ESTIMATES token counts with a
  * fixed heuristic; this learns the actual merge table). The reference has
  * no text path (`etl_process.py:71-102`).
  *
  * Algorithm (classic): words become space-joined symbol strings
  * (chars + a `</w>` end marker); each round counts adjacent symbol pairs
  * weighted by word frequency, picks the most frequent pair (ties: lowest
  * (lhs, rhs)), and merges every greedy left-to-right occurrence. The
  * merge is a pure string fold — `aggregate(symbols, '', merge-or-append)`
  * — which DuckDB replicates verbatim with `list_reduce`, so the whole
  * k-round loop is oracle-checkable.
  *
  * Scale shape: the ONLY corpus-scale work is the word-count aggregate
  * (one shuffle keyed by word, map-side combined). The entire merge loop
  * runs on the distinct-word table — vocabulary-bounded, cached once —
  * and each round ships exactly one (pair, count) row to the driver (model
  * state, as in q166). Re-deriving round r's symbols re-applies r narrow
  * scan-local folds to the cached vocab; with k ≤ ~32 the O(k²) fold work
  * on a bounded table is cheaper than materializing per-round state.
  */
object Bpe {

  /** One merge application: greedy left-to-right rewrite of the
    * space-joined symbol string, as a string-accumulator fold. Merging
    * extends the accumulator's last token in place (`acc || rhs`), because
    * the last token already IS lhs. */
  private def applyMerge(w: Column, lhs: String, rhs: String): Column =
    aggregate(split(w, " "), lit(""), (acc, x) =>
      when(acc === "", x)
        .when((acc === lhs || acc.endsWith(lit(" " + lhs))) && x === rhs,
          concat(acc, lit(rhs)))
        .otherwise(concat(acc, lit(" "), x)))

  def q167BpeTrain(spark: SparkSession, dir: String,
                   merges: Int = 6): DataFrame =
    train(spark, Tables.documents(spark, dir), merges)

  /** Training core over any frame with a `text` column (spec entry point:
    * the classic four-word corpus pins the learned merge table). */
  def train(spark: SparkSession, docs: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    learnMerges(spark, docs, merges)._2
      .toDF("step", "lhs", "rhs", "merged", "pair_count")
      .orderBy($"step")
  }

  /** Runs the merge loop; returns the FINAL segmented vocabulary
    * (`word`, space-joined symbols `w`, count `c`) and the learned merge
    * list. The final vocabulary IS the trained tokenizer applied to every
    * distinct word — q168 joins it back onto the corpus to encode. */
  def learnMerges(spark: SparkSession, docs: DataFrame, merges: Int)
      : (DataFrame, Seq[(Int, String, String, String, Long)]) = {
    import spark.implicits._
    // Corpus-scale pass: word frequencies (the q115 tokenization, so the
    // symbol alphabet is a–z + </w> and both engines split identically).
    val vocab0 = docs
      .select(explode(
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
      .select($"word",
        concat(array_join(split($"word", ""), " "), lit(" </w>")).as("w"),
        $"c")
      .cache()
    var vocab = vocab0
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    var exhausted = false
    for (step <- 1 to merges if !exhausted) {
      // One (pair, count) row to the driver per round — model state.
      // Adjacent pairs as zip(symbols, symbols.tail) — slice handles the
      // fully-merged single-symbol case with an empty array, where
      // sequence(1, size-1) would DESCEND through [1, 0] and fabricate
      // null pairs.
      val tk = split($"w", " ")
      val bestRows = vocab
        .select(explode(zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"), $"c")
        .groupBy($"p.a", $"p.b").agg(sum($"c").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b").limit(1)
        .collect()
      // Pair stream exhausted — every vocab word is already one symbol
      // (tiny corpus, or merges > what the alphabet supports). BPE
      // training is DONE at this point; stop cleanly with the merges
      // learned so far rather than indexing into an empty result.
      if (bestRows.isEmpty) exhausted = true
      else {
        val best = bestRows(0)
        val (a, b, n) = (best.getString(0), best.getString(1), best.getLong(2))
        learned += ((step, a, b, a + b, n))
        vocab = vocab.select($"word", applyMerge($"w", a, b).as("w"), $"c")
      }
    }
    // Checkpoint-and-free (the iterative-kernel discipline): the returned
    // vocabulary is materialized (vocab-sized — distinct words) so the
    // cached word-frequency table can be released NOW; without this every
    // learnMerges call (q167, and q168's retrain) left one cached copy
    // pinned in block storage for the session's lifetime.
    val out = vocab.localCheckpoint()
    vocab0.unpersist(blocking = false)
    (out, learned.result())
  }

  /** q168: encode the corpus with the tokenizer q167 just learned —
    * per-language word mass, BPE token mass, and the chars-per-token
    * compression ratio (the statistic tokenizer and data teams actually
    * budget with; q52's heuristic estimate carries no learned vocab).
    *
    * Scale shape: the final segmented vocabulary from `learnMerges` maps
    * every distinct word to its token count, so encoding is a join keyed
    * by word — the same key as the training aggregate, vocabulary-bounded
    * build side (broadcast here; at a 100M-word vocabulary flip to a
    * shuffle join, the probe stays corpus-sized either way) — followed by
    * one bounded-key (lang) aggregate. The one double division
    * (exact char sum / exact token sum) is correctly rounded, so both
    * engines emit identical ratios.
    */
  def q168BpeEncode(spark: SparkSession, dir: String,
                    merges: Int = 6): DataFrame =
    encode(spark, Tables.documents(spark, dir), merges)

  /** Encoding core over any frame with (`lang`, `text`) columns (spec
    * entry point: the classic corpus's segmentation is hand-checkable). */
  def encode(spark: SparkSession, docs: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    val (vocab, _) = learnMerges(spark, docs, merges)
    val wordTok = vocab.select($"word",
      size(split($"w", " ")).cast("long").as("n_tok"))
    docs
      .select($"lang", explode(
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("word"))
      .join(broadcast(wordTok), Seq("word"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_tok").as("n_tokens"),
        round(sum(length($"word")).cast("double") / sum($"n_tok"), 6)
          .as("chars_per_token"))
      .orderBy($"lang")
  }
}
