package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality scoring — public API over any (id, text) DataFrame.
  *
  * Generic, column-parameterized versions of the engine's declared
  * quality gates (the `text_gopher_rules` / `text_token_entropy` /
  * `text_burstiness` / `text_vocab_coverage` queries bind these to the
  * harness `documents` table and carry the DuckDB oracles); a pipeline
  * embeds THESE over its own corpus schema. Every function is a pure
  * plan transformation — no actions, no caching contract — and keeps
  * the engine's determinism discipline: integer flag algebra, round-8
  * decimal log-term sums, one final double cast.
  *
  * Scale notes per function are the operator rows in SURVEY §2.2; the
  * short version: [[gopherFlags]] and [[tokenProfile]] are per-row /
  * per-doc (map-side until the declared fold), [[burstiness]] and
  * [[vocabCoverage]] collapse the corpus in one map-side aggregate and
  * do all statistics on the bounded vocabulary grid.
  */
object TextQuality {

  /** Default stopword probe used by [[gopherFlags]] — deliberately tiny:
    * the Gopher rule wants "has ANY common word", not a lexicon. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "value", "data")

  /** Gopher-style quality rule flags (Rae et al. 2021 §A1.1) for each
    * row of `df`: word-count bounds, mean-word-length bounds,
    * alphabetic-word fraction, stopword presence, digit-character share,
    * and the conjunction `pass`. Flags are decided in INTEGER arithmetic
    * (bounds cross-multiplied), so no float boundary can flip a flag
    * between runs or engines; `mean_wlen`/`alpha_frac` are display-only.
    *
    * Output: every input column plus (n_tok, mean_wlen, alpha_frac,
    * stop_hits, f_words, f_wlen, f_alpha, f_stop, f_digit, pass). */
  def gopherFlags(df: DataFrame, textCol: String,
      minWords: Long = 20L, maxWords: Long = 100000L,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = split(col(textCol), " ")
    df.withColumn("n_tok", size(toks).cast("long"))
      .withColumn("sum_len",
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (a, x) => a + x))
      .withColumn("n_alpha",
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_digit",
        length(regexp_replace(col(textCol), "[^0-9]", "")).cast("long"))
      .withColumn("stop_hits",
        size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
          .cast("long"))
      .withColumn("f_words",
        col("n_tok") >= minWords && col("n_tok") <= maxWords)
      .withColumn("f_wlen",
        col("sum_len") >= lit(2L) * col("n_tok") &&
          col("sum_len") <= lit(12L) * col("n_tok"))
      .withColumn("f_alpha",
        lit(5L) * col("n_alpha") >= lit(3L) * col("n_tok"))
      .withColumn("f_stop", col("stop_hits") >= 1L)
      .withColumn("f_digit",
        lit(5L) * col("n_digit") <= length(col(textCol)).cast("long"))
      .withColumn("pass",
        col("f_words") && col("f_wlen") && col("f_alpha") && col("f_stop")
          && col("f_digit"))
      .withColumn("mean_wlen",
        round(col("sum_len").cast("double") / col("n_tok").cast("double"), 6))
      .withColumn("alpha_frac",
        round(col("n_alpha").cast("double") / col("n_tok").cast("double"), 6))
      .drop("sum_len", "n_alpha", "n_digit")
  }

  /** Per-document token profile: token count, distinct count, Shannon
    * entropy of the token distribution and its ln(n_distinct)-normalized
    * form ∈ [0, 1]. Entropy terms round to 8 decimals then sum as exact
    * DECIMAL — partition-order free. One (id, token) hash aggregate +
    * one id-keyed window/fold; everything doc-keyed. */
  def tokenProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
    counts
      .withColumn("term",
        round(-(col("c").cast("double") / col("n").cast("double"))
          * log(col("c").cast("double") / col("n").cast("double")), 8)
          .cast("decimal(20,8)"))
      .groupBy(col(idCol))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("term")).as("h_dec"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        round(col("h_dec").cast("double"), 6).as("entropy"),
        when(col("n_distinct") > 1L,
          round(col("h_dec").cast("double")
            / log(col("n_distinct").cast("double")), 6))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /** Corpus-level token burstiness (Church & Gale): for the `topK`
    * most frequent tokens, total frequency, document frequency,
    * burst = tf/df and document share. One (id, token) aggregate
    * collapses the corpus; the grid never exceeds the vocabulary. */
  def burstiness(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 64): DataFrame = {
    val dt = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val tg = dt.groupBy(col("tok"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
    val top = tg.orderBy(col("tf").desc, col("tok")).limit(topK)
    val nd = df.agg(count(lit(1)).as("n_docs"))
    top.crossJoin(broadcast(nd))
      .select(col("tok"), col("tf"), col("df"),
        round(col("tf").cast("double") / col("df").cast("double"), 6)
          .as("burst"),
        round(col("df").cast("double") / col("n_docs").cast("double"), 6)
          .as("doc_share"))
  }

  /** Vocabulary coverage curve: the share of corpus tokens captured by
    * the top-N vocabulary for each N in `bands` (ascending). Only the
    * top-max(bands) tokens can contribute to any band, so candidates are
    * pre-cut to exactly those via an ordered limit (TakeOrderedAndProject
    * — the sample_dsir rule) BEFORE ranking; within that top set the
    * strictly-prior count against its broadcast copy equals the global
    * rank, because every excluded token sorts strictly after every kept
    * one. A full |vocab|² rank join would be quadratic in the vocabulary
    * — infeasible at multi-million-token scale (ADVICE r9); this is
    * max(bands)², a constant. Never a partition-less window (the
    * engine-wide PlanSpec rule). */
  def vocabCoverage(df: DataFrame, textCol: String,
      bands: Seq[Long] = Seq(4L, 8L, 16L)): DataFrame = {
    require(bands.nonEmpty, "bands must be non-empty")
    // bands.max.toInt below feeds limit(); a band above Int.MaxValue would
    // silently wrap negative — fail loudly instead (ADVICE r10)
    require(bands.max <= Int.MaxValue.toLong,
      s"band ${bands.max} exceeds Int.MaxValue — limit() takes an Int")
    val counts = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("tok"))
      .limit(bands.max.toInt)
    val ranked = top
      .join(broadcast(top.select(col("c").as("bc"), col("tok").as("bt"))),
        col("bc") > col("c")
          || (col("bc") === col("c") && col("bt") < col("tok")), "left")
      .groupBy(col("tok"), col("c")).agg((count(col("bt")) + 1L).as("rnk"))
    val tot = counts.agg(sum(col("c")).as("n_tok"),
      count(lit(1)).as("n_vocab"))
    val bandSums: Seq[Column] = bands.map(b =>
      sum(when(col("rnk") <= b, col("c")).otherwise(0L)).as(s"c$b"))
    val folded = ranked.crossJoin(broadcast(tot))
      .groupBy(col("n_tok"), col("n_vocab"))
      .agg(bandSums.head, bandSums.tail: _*)
    val stackArgs = bands.map(b => s"${b}L, c$b").mkString(", ")
    folded
      .select(expr(s"stack(${bands.size}, $stackArgs) AS (band, covered)"),
        col("n_tok"), col("n_vocab"))
      .select(col("band"), col("covered"), col("n_tok"), col("n_vocab"),
        round(col("covered").cast("double") / col("n_tok").cast("double"), 6)
          .as("coverage"))
  }
}
