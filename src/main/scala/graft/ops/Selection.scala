package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Bands
import graft.core.{Tables => T}

/** Round-9 operators: DATA SELECTION for training corpora (the published
  * filter/reweight recipes a 100 TB pipeline actually runs — Gopher rules,
  * DSIR importance resampling, DoReMi mixture reweighting, soft dedup
  * downweighting, binary-quantized ANN) plus two experimentation
  * estimators (CUPED, difference-in-differences).
  *
  * Reference basis: the reference engine (db.cpp) has no analytics surface
  * — every key here is a BASELINE.json north-star capability extension,
  * same as ops/LlmPipeline.scala. All determinism follows the SURVEY §2.2
  * rules: integer/decimal inner math, one final double cast, explicit
  * ORDER BY on a unique key set.
  */
object Selection {
  type Q = (SparkSession, String) => DataFrame

  private def h48(c: Column): Column = graft.expr.Md5Prefix48.md548(c)
  private def h48Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 12) AS BIGINT)"
  private def dotp(x: Column, y: Column): Column =
    graft.expr.FloatDotProduct.fdot(x, y)
  private def dotSql(a: String, b: String): String =
    s"(SELECT sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)) FROM range(1, 65) r(i))"
  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  // ------------------------------------------------------- gopher rule gate

  /** GOPHER-STYLE QUALITY RULESET (Rae et al. 2021 §A1.1, the rule gate
    * FineWeb/Dolma-class pipelines run before any model-based filter):
    * per-doc boolean flags for word-count bounds, mean-word-length bounds,
    * alphabetic-word fraction, stopword presence and digit-character
    * share, plus the conjunction. EVERY flag is decided in integer
    * arithmetic (bounds cross-multiplied — `sum_len >= 2*n_tok` instead
    * of `mean >= 2.0`), so no float boundary can diverge across engines;
    * the reported ratios are display-only rounded doubles.
    *
    * 100 TB shape: a pure per-row projection fused into the scan — the
    * cheapest possible filter stage; the flags then drive a partition-
    * local `filter()`, no shuffle anywhere. */
  val textGopherRules: Q = (s, d) => {
    val toks = split(col("text"), " ")
    T.documents(s, d)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("sum_len",
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (a, x) => a + x))
      .withColumn("n_alpha",
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_digit",
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
      .withColumn("stop_hits",
        size(filter(toks, t => t.isin("the", "a", "value", "data")))
          .cast("long"))
      .withColumn("f_words", col("n_tok") >= 20L && col("n_tok") <= 100000L)
      .withColumn("f_wlen",
        col("sum_len") >= lit(2L) * col("n_tok") &&
          col("sum_len") <= lit(12L) * col("n_tok"))
      .withColumn("f_alpha", lit(5L) * col("n_alpha") >= lit(3L) * col("n_tok"))
      .withColumn("f_stop", col("stop_hits") >= 1L)
      .withColumn("f_digit",
        lit(5L) * col("n_digit") <= length(col("text")).cast("long"))
      .select(col("doc_id"), col("n_tok"),
        round(col("sum_len").cast("double") / col("n_tok").cast("double"), 6)
          .as("mean_wlen"),
        round(col("n_alpha").cast("double") / col("n_tok").cast("double"), 6)
          .as("alpha_frac"),
        col("stop_hits"),
        col("f_words"), col("f_wlen"), col("f_alpha"), col("f_stop"),
        col("f_digit"),
        (col("f_words") && col("f_wlen") && col("f_alpha") && col("f_stop")
          && col("f_digit")).as("pass"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------- DSIR importance weights

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * score every raw-pool doc by how target-like its hashed-n-gram
    * distribution is, keep the top-k. Target = the `src0` slice (the
    * trusted-domain proxy), raw pool = everything else; features are
    * unigrams hashed into 64 buckets; per-bucket log likelihood ratio
    * ln((ct+1)/(Nt+64)) − ln((cr+1)/(Nr+64)) with add-1 smoothing is
    * computed ONCE on the model table and rounded to 8 decimals, so each
    * doc's importance weight is an EXACT decimal sum of model constants
    * (partition-order-free — the text_perplexity discipline). Output =
    * the top-50 selected docs, ranked on the exact decimal (ties →
    * doc_id).
    *
    * 100 TB shape: the bucket model is 64 rows → BROADCAST; scoring is
    * one token explode + map-side bucket projection + broadcast join +
    * doc_id partial-agg. The rank is a top-k over doc-level rows. */
  val sampleDsir: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("source"),
      col("text"))
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("bkt", pmod(h48(col("tok")), lit(64L)))
    val model = toks.groupBy(col("bkt"))
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("cr"))
    val tots = model.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val ratios = model.crossJoin(broadcast(tots))
      .select(col("bkt"),
        round(log((col("ct") + 1L).cast("double")
            / (col("nt") + 64L).cast("double"))
          - log((col("cr") + 1L).cast("double")
            / (col("nr") + 64L).cast("double")), 8)
          .cast("decimal(20,8)").as("llr"))
    val scored = toks.filter(col("source") =!= "src0")
      .join(broadcast(ratios), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("llr")).as("lw_dec"))
    // distributed top-k FIRST (TakeOrderedAndProject: per-partition top-50
    // + merge — no global sort shuffle), then rank the 50 survivors by a
    // strictly-prior count over the broadcast 50-row set: a partition-less
    // row_number() window would single-task the rank (the windowLag rule),
    // and PlanSpec bans that shape engine-wide
    val top = scored.orderBy(col("lw_dec").desc, col("doc_id")).limit(50)
    top.join(broadcast(top.select(col("lw_dec").as("bl"),
        col("doc_id").as("bd"))),
        col("bl") > col("lw_dec")
          || (col("bl") === col("lw_dec") && col("bd") < col("doc_id")),
        "left")
      .groupBy(col("doc_id"), col("n_tok"), col("lw_dec"))
      .agg((count(col("bd")) + 1L).as("rnk"))
      .select(col("rnk"), col("doc_id"), col("n_tok"),
        round(col("lw_dec").cast("double"), 6).as("log_weight"))
      .orderBy(col("rnk"))
  }

  // ------------------------------------------------ DoReMi mixture reweight

  /** DOREMI-STYLE DOMAIN REWEIGHTING STEP (Xie et al. 2023): one
    * exponentiated-gradient update of the per-domain (source) mixture
    * weights, driven by each domain's excess loss — here the unigram
    * cross-entropy of the domain under the GLOBAL corpus LM (domains that
    * diverge from the corpus average read as "harder" and get upweighted).
    * The LM is the bounded top-256 vocabulary + one OOV class (the
    * text_perplexity scale rule); per-token −ln p terms round to 8
    * decimals once at the model level, so domain losses are exact decimal
    * sums; exp() of the single per-domain double rounds to 8 and the
    * normalizer is again an exact decimal sum — no step depends on
    * partition or domain enumeration order.
    *
    * 100 TB shape: vocab model ≤ 257 rows → BROADCAST; one token explode
    * + broadcast probe + per-domain partial agg; the update itself is
    * domain-count-sized. */
  val textDoremiStep: Q = (s, d) => {
    val toks = T.documents(s, d).select(col("source"),
      explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("tok")).limit(256)
    val totals = counts.agg(sum(col("c")).as("n"))
    val vocabTot = vocab.agg(sum(col("c")).as("nv"))
    // model rows: (tok, nlp) for the top-V + the OOV class mass
    val inV = vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        round(-log(col("c").cast("double") / col("n").cast("double")), 8)
          .cast("decimal(20,8)").as("nlp"))
    val oov = totals.crossJoin(vocabTot)
      .select(round(-log(greatest(col("n") - col("nv"), lit(1L))
          .cast("double") / col("n").cast("double")), 8)
          .cast("decimal(20,8)").as("nlp_oov"))
    val scored = toks
      .join(broadcast(inV), Seq("tok"), "left")
      .crossJoin(broadcast(oov))
      .select(col("source"), coalesce(col("nlp"), col("nlp_oov")).as("nlp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nlp")).as("loss_dec"))
    val k = scored.agg(count(lit(1)).as("nd"))
    val stepped = scored.crossJoin(broadcast(k))
      .withColumn("loss",
        col("loss_dec").cast("double") / col("n_tokens").cast("double"))
      .withColumn("w_old", lit(1.0) / col("nd").cast("double"))
      .withColumn("w_exp",
        round(col("w_old") * exp(col("loss")), 8).cast("decimal(20,8)"))
    val z = stepped.agg(sum(col("w_exp")).as("z"))
    stepped.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"), round(col("loss"), 6).as("loss"),
        round(col("w_old"), 6).as("w_old"),
        round(col("w_exp").cast("double") / col("z").cast("double"), 6)
          .as("w_new"))
      .orderBy(col("source"))
  }

  // -------------------------------------------------- soft-dedup downweight

  /** SOFT DEDUP — repetition DOWNWEIGHTING instead of removal (the
    * FineWeb/RedPajama-2 alternative to hard dropping: keep every near-dup
    * but weight each cluster member 1/|cluster| so the cluster contributes
    * one doc's worth of gradient): near-dup pairs from the exact
    * prefix-filtered Jaccard join (the dedup_cluster candidates),
    * pointer-doubling connected components, then per-doc weight =
    * round(1/|cluster|, 6) with the component min as the canonical rep.
    *
    * 100 TB shape: identical cost class to dedup_cluster (one shingle
    * shuffle + O(log diameter) model-sized CC rounds) plus ONE component
    * aggregate for the sizes. */
  val dedupDownweight: Q = (s, d) => {
    val c = LlmPipeline.corpus(s, d)
    val pairs = graft.api.TextDedup.jaccardJoin(
      c.filter(col("doc_id") % Bands.DocBand >= 200000L),
      c.filter(col("doc_id") % Bands.DocBand < 200000L),
      "doc_id", "text", 0.7)
    val cc = graft.api.TextDedup
      .connectedComponents(pairs, "left_id", "right_id")
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    cc.join(sizes, Seq("component"))
      .select(col("id").as("doc_id"), col("component").as("cluster_root"),
        col("csize"),
        round(lit(1.0) / col("csize").cast("double"), 6).as("weight"),
        (col("id") === col("component")).as("is_rep"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------ binary-quantized top-k

  /** BINARY-QUANTIZED ANN (sign quantization + Hamming search — the
    * 1-bit-per-dim memory tier under [[LlmPipeline.simTopkPq]]'s PQ
    * codes): each vector compresses to a 48-bit SIGN MASK (bit i set ⟺
    * dim i > 0); probes find candidates through pigeonhole bit-BLOCK LSH
    * (6 blocks of 8 bits — any pair at Hamming ≤ 5 must agree exactly on
    * some block, so the equi-join on (block, bits) is LOSSLESS for the
    * declared radius), verifies exact `bit_count(xor)`, and reports the
    * top-5 per probe ordered by (hamming, cand_id) — a pure-integer total
    * order, no float ties anywhere. Exact cosine on the few survivors is
    * carried as evidence of what the 1-bit tier preserves.
    *
    * 100 TB shape: the corpus never self-joins — candidates come from a
    * 6×-corpus block equi-join against the PROBE blocks (probe side
    * broadcast-scale); masks are one map-side projection of the scan. */
  val simTopkBq: Q = (s, d) => {
    val maskExpr = expr("aggregate(sequence(0, 47), 0L, (acc, i) -> " +
      "acc + CASE WHEN element_at(embedding, i + 1) > CAST(0.0 AS FLOAT) " +
      "THEN CAST(round(pow(2, i)) AS BIGINT) ELSE 0L END)")
    // planted-variant corpus (LlmPipeline.vecCorpus): positive scaling
    // preserves every sign bit, so each variant probe MUST recover its
    // base at Hamming 0 — the recall contract this key pins
    val e = LlmPipeline.vecCorpus(s, d)
      .select(col("vec_id"), col("embedding"), maskExpr.as("mask"))
    def blocks(df: DataFrame, idc: String): DataFrame =
      df.select(col(idc), col("mask"),
        posexplode(array((0 until 6).map(b =>
          shiftright(col("mask"), 8 * b).bitwiseAND(lit(255L))): _*))
          .as(Seq("blk", "bits")))
    val probes = e.filter(col("vec_id") % Bands.VecBand >= 10000L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("mask").as("pm"))
    val cand = blocks(e.filter(col("vec_id") % Bands.VecBand < 10000L), "vec_id")
    val cands = blocks(probes.select(col("probe_id"), col("pm").as("mask")),
        "probe_id")
      .join(cand, Seq("blk", "bits"))
      .select(col("probe_id"), col("vec_id").as("cand_id")).distinct()
    val verified = cands
      .join(broadcast(probes), Seq("probe_id"))
      .join(e.filter(col("vec_id") % Bands.VecBand < 10000L)
        .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
          col("mask").as("cm")), Seq("cand_id"))
      .withColumn("hamming", bit_count(col("pm").bitwiseXOR(col("cm")))
        .cast("long"))
      .filter(col("hamming") <= 5L)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("hamming"), col("cand_id"))
    verified.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), col("hamming"),
        round(dotp(col("pe"), col("ce"))
          / (sqrt(dotp(col("pe"), col("pe"))) * sqrt(dotp(col("ce"), col("ce")))),
          6).as("cos"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---------------------------------------------------- per-doc token entropy

  /** PER-DOC TOKEN ENTROPY — the repetition/diversity quality signal
    * (low-entropy docs are boilerplate or word-stuffing; the Shannon
    * dual of [[LlmPipeline.textRepetition]]'s top-gram share): H =
    * −Σ (c/n)·ln(c/n) over the doc's token distribution, each term
    * rounded to 8 decimals then summed as exact DECIMAL (order-free),
    * plus the normalized H/ln(n_distinct). The per-doc token counts and
    * totals are integers end to end.
    *
    * 100 TB shape: one (doc_id, tok) hash aggregate (map-side combine),
    * a doc_id window for the total, one doc_id aggregate — all keyed by
    * doc, nothing corpus-quadratic. */
  val textTokenEntropy: Q = (s, d) => {
    val counts = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
    counts
      .withColumn("term",
        round(-(col("c").cast("double") / col("n").cast("double"))
          * log(col("c").cast("double") / col("n").cast("double")), 8)
          .cast("decimal(20,8)"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("term")).as("h_dec"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("h_dec").cast("double"), 6).as("entropy"),
        when(col("n_distinct") > 1L,
          round(col("h_dec").cast("double")
            / log(col("n_distinct").cast("double")), 6))
          .otherwise(lit(0.0)).as("norm_entropy"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------- CUPED estimator

  /** CUPED — variance-reduced experiment readout (Deng et al., WSDM'13:
    * adjust the experiment metric with a pre-experiment covariate;
    * var(Y−θX) shrinks by the squared correlation): per user, X =
    * non-purchase value (the covariate), Y = purchase value (the
    * metric); arms by user_id parity. θ = cov(X,Y)/var(X) is computed
    * from centi-unit INTEGER moment sums (products kept in DECIMAL(38,0)
    * — exact; the agg_hhi discipline) with ONE double division at the
    * end; per arm the adjusted mean Y − θ·(X̄_arm − X̄) follows from the
    * same exact sums. Output: one row per arm with raw and adjusted
    * means and the shared θ.
    *
    * 100 TB shape: one user_id aggregate folds events to per-user (x, y)
    * rows; everything after is two model-sized aggregates. */
  val aggCuped: Q = (s, d) => {
    val per = T.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") =!= "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("y"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    val g = per.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      // cast BEFORE multiplying (the agg_hhi rule): long*long wraps
      // silently in non-ANSI mode once per-user sums pass ~3e9 centi-units
      sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .as("sxx"),
      sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
        .as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        // θ = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²): every moment sum is exact
        // (integer / decimal) and casts to double ONCE; the four scalar
        // IEEE multiply-subtract-divide steps are then bit-identical in
        // both engines (a n·Sxx decimal product would exceed DuckDB's
        // 38-digit multiply width, so the exact-product form is out)
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
          .as("theta"),
        (col("sx").cast("double") / col("n").cast("double")).as("mx_g"))
    per.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      .crossJoin(broadcast(g))
      .select(col("arm"), col("n_users"),
        round(col("sya").cast("double") / col("n_users").cast("double")
          / 100.0, 6).as("mean_y"),
        round((col("sya").cast("double") / col("n_users").cast("double")
          - col("theta") * (col("sxa").cast("double")
            / col("n_users").cast("double") - col("mx_g"))) / 100.0, 6)
          .as("mean_y_cuped"),
        round(col("theta"), 6).as("theta"))
      .orderBy(col("arm"))
  }

  // ------------------------------------------------ difference-in-differences

  /** DIFFERENCE-IN-DIFFERENCES — the 2×2 quasi-experiment estimator
    * (treated vs control × pre vs post; the causal readout when
    * randomization isn't available): cells by user_id parity (treat) and
    * event_id parity (period — a deterministic stand-in for the rollout
    * timestamp), per-cell exact-decimal mean of `value`, effect =
    * (T.post − T.pre) − (C.post − C.pre) from the four rounded means.
    * Every cell mean uses the dsum discipline (decimal sum rounded 2,
    * one double division).
    *
    * 100 TB shape: ONE 4-group aggregate over the events scan; the DiD
    * arithmetic is a 4-row broadcast fold. */
  val eventsDid: Q = (s, d) => {
    import graft.core.Numeric.dsum
    val cells = T.events(s, d)
      .select(pmod(col("user_id"), lit(2L)).as("treat"),
        when(pmod(col("event_id"), lit(2L)) === 0L, "post").otherwise("pre")
          .as("period"),
        col("value"))
      .groupBy(col("treat"), col("period"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      .withColumn("mean_v",
        round(col("sum_v") / col("n").cast("double"), 6))
    val eff = cells.agg(round(
      sum(when(col("treat") === 1L && col("period") === "post", col("mean_v"))
        .otherwise(0.0))
        - sum(when(col("treat") === 1L && col("period") === "pre", col("mean_v"))
          .otherwise(0.0))
        - sum(when(col("treat") === 0L && col("period") === "post", col("mean_v"))
          .otherwise(0.0))
        + sum(when(col("treat") === 0L && col("period") === "pre", col("mean_v"))
          .otherwise(0.0)), 6).as("did"))
    cells.crossJoin(broadcast(eff))
      .select(col("treat"), col("period"), col("n"), col("mean_v"),
        col("did"))
      .orderBy(col("treat"), col("period"))
  }

  // --------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "text_gopher_rules" -> textGopherRules,
    "sample_dsir" -> sampleDsir,
    "text_doremi_step" -> textDoremiStep,
    "dedup_downweight" -> dedupDownweight,
    "sim_topk_bq" -> simTopkBq,
    "text_token_entropy" -> textTokenEntropy,
    "agg_cuped" -> aggCuped,
    "events_did" -> eventsDid,
  )

  val oracles: Map[String, String] = Map(
    "text_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS l,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_tok,
        |    CAST(list_sum(list_transform(l, t -> length(t))) AS BIGINT)
        |      AS sum_len,
        |    CAST(len(list_filter(l, t -> regexp_matches(t, '[a-z]')))
        |      AS BIGINT) AS n_alpha,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
        |      AS n_digit,
        |    CAST(len(list_filter(l, t -> t IN ('the', 'a', 'value', 'data')))
        |      AS BIGINT) AS stop_hits,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM base)
        |SELECT doc_id, n_tok,
        |  CAST(round(CAST(sum_len AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        |    AS DOUBLE) AS mean_wlen,
        |  CAST(round(CAST(n_alpha AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        |    AS DOUBLE) AS alpha_frac,
        |  stop_hits,
        |  (n_tok >= 20 AND n_tok <= 100000) AS f_words,
        |  (sum_len >= 2 * n_tok AND sum_len <= 12 * n_tok) AS f_wlen,
        |  (5 * n_alpha >= 3 * n_tok) AS f_alpha,
        |  (stop_hits >= 1) AS f_stop,
        |  (5 * n_digit <= n_chars) AS f_digit,
        |  ((n_tok >= 20 AND n_tok <= 100000)
        |    AND (sum_len >= 2 * n_tok AND sum_len <= 12 * n_tok)
        |    AND (5 * n_alpha >= 3 * n_tok) AND (stop_hits >= 1)
        |    AND (5 * n_digit <= n_chars)) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,

    "sample_dsir" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |b AS (SELECT doc_id, source, ${h48Sql("tok")} % 64 AS bkt FROM toks),
         |model AS (
         |  SELECT bkt,
         |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
         |    SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cr
         |  FROM b GROUP BY bkt),
         |tots AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM model),
         |ratios AS (
         |  SELECT bkt, CAST(round(
         |      ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 64 AS DOUBLE))
         |    - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 64 AS DOUBLE)), 8)
         |    AS DECIMAL(20,8)) AS llr
         |  FROM model CROSS JOIN tots),
         |scored AS (
         |  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |    SUM(llr) AS lw_dec
         |  FROM b JOIN ratios USING (bkt)
         |  WHERE b.source <> 'src0' GROUP BY b.doc_id),
         |ranked AS (
         |  SELECT doc_id, n_tok, lw_dec,
         |    ROW_NUMBER() OVER (ORDER BY lw_dec DESC, doc_id) AS rnk
         |  FROM scored)
         |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, n_tok,
         |  CAST(round(CAST(lw_dec AS DOUBLE), 6) AS DOUBLE) AS log_weight
         |FROM ranked WHERE rnk <= 50 ORDER BY rnk""".stripMargin,

    "text_doremi_step" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 256),
        |tot AS (SELECT SUM(c) AS n FROM counts),
        |vt AS (SELECT SUM(c) AS nv FROM vocab),
        |inv AS (
        |  SELECT tok, CAST(round(-ln(CAST(c AS DOUBLE)
        |    / CAST(n AS DOUBLE)), 8) AS DECIMAL(20,8)) AS nlp
        |  FROM vocab CROSS JOIN tot),
        |oov AS (
        |  SELECT CAST(round(-ln(CAST(greatest(n - nv, 1) AS DOUBLE)
        |    / CAST(n AS DOUBLE)), 8) AS DECIMAL(20,8)) AS nlp_oov
        |  FROM tot CROSS JOIN vt),
        |scored AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    SUM(COALESCE(inv.nlp, oov.nlp_oov)) AS loss_dec
        |  FROM toks LEFT JOIN inv USING (tok) CROSS JOIN oov
        |  GROUP BY source),
        |k AS (SELECT COUNT(*) AS nd FROM scored),
        |stepped AS (
        |  SELECT source, n_tokens,
        |    CAST(loss_dec AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS loss,
        |    1.0 / CAST(nd AS DOUBLE) AS w_old,
        |    CAST(round((1.0 / CAST(nd AS DOUBLE))
        |      * exp(CAST(loss_dec AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 8)
        |      AS DECIMAL(20,8)) AS w_exp
        |  FROM scored CROSS JOIN k),
        |z AS (SELECT SUM(w_exp) AS z FROM stepped)
        |SELECT source, n_tokens, CAST(round(loss, 6) AS DOUBLE) AS loss,
        |  CAST(round(w_old, 6) AS DOUBLE) AS w_old,
        |  CAST(round(CAST(w_exp AS DOUBLE) / CAST(z.z AS DOUBLE), 6)
        |    AS DOUBLE) AS w_new
        |FROM stepped CROSS JOIN z ORDER BY source""".stripMargin,

    "text_token_entropy" ->
      """WITH counts AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok),
        |wn AS (
        |  SELECT doc_id, tok, c, SUM(c) OVER (PARTITION BY doc_id) AS n
        |  FROM counts),
        |terms AS (
        |  SELECT doc_id, n,
        |    CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 8)
        |      AS DECIMAL(20,8)) AS term
        |  FROM wn)
        |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(round(CAST(SUM(term) AS DOUBLE), 6) AS DOUBLE) AS entropy,
        |  CAST(CASE WHEN COUNT(*) > 1 THEN
        |      round(CAST(SUM(term) AS DOUBLE)
        |        / ln(CAST(COUNT(*) AS DOUBLE)), 6)
        |    ELSE 0.0 END AS DOUBLE) AS norm_entropy
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_downweight" ->
      s"""WITH RECURSIVE ${LlmPipeline.corpusSql},
         |${LlmPipeline.shingleSetsSql},
         |pairs AS (
         |  SELECT sa.doc_id AS a, sb.doc_id AS b
         |  FROM ssets sa JOIN ssets sb
         |    ON sa.doc_id % 252000 >= 200000 AND sb.doc_id % 252000 < 200000
         |  WHERE ${LlmPipeline.jaccSql} >= 0.7),
         |edges AS (SELECT a AS x, b AS y FROM pairs
         |          UNION SELECT b, a FROM pairs),
         |nodes AS (SELECT DISTINCT x AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.x AS id, reach.r FROM edges e JOIN reach ON e.y = reach.id),
         |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
         |          FROM cc GROUP BY component)
         |SELECT cc.id AS doc_id, cc.component AS cluster_root, sizes.csize,
         |  CAST(round(CAST(1.0 AS DOUBLE) / CAST(sizes.csize AS DOUBLE), 6)
         |    AS DOUBLE) AS weight,
         |  (cc.id = cc.component) AS is_rep
         |FROM cc JOIN sizes USING (component) ORDER BY doc_id""".stripMargin,

    "sim_topk_bq" ->
      s"""WITH ${LlmPipeline.vecCorpusSql},
         |masks AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(0, 48),
         |      i -> CASE WHEN embedding[CAST(i + 1 AS INT)] > 0
         |        THEN CAST(round(power(2, i)) AS BIGINT) ELSE 0 END))
         |      AS BIGINT) AS mask
         |  FROM vcorpus),
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    CAST(bit_count(xor(p.mask, c.mask)) AS BIGINT) AS hamming,
         |    round(${cosineSql("p.embedding", "c.embedding")}, 6) AS cos
         |  FROM masks p JOIN masks c
         |    ON p.vec_id % 30000 >= 10000 AND c.vec_id % 30000 < 10000
         |  WHERE bit_count(xor(p.mask, c.mask)) <= 5),
         |ranked AS (
         |  SELECT probe_id, cand_id, hamming, cos,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY hamming, cand_id) AS rnk
         |  FROM pairs)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, hamming, cos
         |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    "agg_cuped" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type <> 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y,
        |    user_id % 2 AS arm
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
        |  FROM per),
        |th AS (
        |  SELECT
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx_g
        |  FROM g),
        |arms AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    SUM(x) AS sxa, SUM(y) AS sya
        |  FROM per GROUP BY arm)
        |SELECT arm, n_users,
        |  CAST(round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0,
        |    6) AS DOUBLE) AS mean_y,
        |  CAST(round((CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - theta * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE)
        |      - mx_g)) / 100.0, 6) AS DOUBLE) AS mean_y_cuped,
        |  CAST(round(theta, 6) AS DOUBLE) AS theta
        |FROM arms CROSS JOIN th ORDER BY arm""".stripMargin,

    "events_did" ->
      s"""WITH cells AS (
         |  SELECT user_id % 2 AS treat,
         |    CASE WHEN event_id % 2 = 0 THEN 'post' ELSE 'pre' END AS period,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(round(${graft.core.Numeric.dsumSql("value")}
         |      / COUNT(*), 6) AS DOUBLE) AS mean_v
         |  FROM events GROUP BY 1, 2),
         |eff AS (
         |  SELECT CAST(round(
         |      SUM(CASE WHEN treat = 1 AND period = 'post' THEN mean_v ELSE 0 END)
         |    - SUM(CASE WHEN treat = 1 AND period = 'pre' THEN mean_v ELSE 0 END)
         |    - SUM(CASE WHEN treat = 0 AND period = 'post' THEN mean_v ELSE 0 END)
         |    + SUM(CASE WHEN treat = 0 AND period = 'pre' THEN mean_v ELSE 0 END),
         |    6) AS DOUBLE) AS did
         |  FROM cells)
         |SELECT treat, period, n, mean_v, did
         |FROM cells CROSS JOIN eff ORDER BY treat, period""".stripMargin,
  )
}
