package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Tables => T}

/** Round-11 second operator batch: feature hashing (the hashing-trick
  * vectorizer every sparse-features pipeline starts from), HITS
  * hubs/authorities (the second classic link-analysis score next to
  * `graph_pagerank`), interrupted time-series estimation (the
  * pre/post-intervention causal read next to `events_did`), and CCNet-style
  * perplexity bucketing (the head/middle/tail quality split on top of
  * `text_perplexity`'s per-doc scores).
  *
  * Reference semantics anchor: statements over scanned tables with
  * engine-invariant arithmetic (`/root/reference/db.cpp:487-502`
  * executeSelect discipline — every declared result is a deterministic
  * function of the stored rows).
  */
object Frontier2 {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------ text_feature_hash

  /** Hash-space width for [[textFeatureHash]] — 64 buckets stands in for
    * the 2^18–2^20 of a production HashingVectorizer; small enough that the
    * harness corpus exercises real collisions (31 token types over 64
    * buckets at sf0.001). */
  private val HashDim = 64

  /** FEATURE HASHING (the "hashing trick", Weinberger et al. 2009; the
    * HashingTF / HashingVectorizer op) — the fixed-width sparse featurizer
    * a training pipeline uses when the vocabulary is unbounded: every token
    * maps to bucket `md5_48(term) % D` with NO dictionary, so the feature
    * space is known before the data is read and two shards never disagree
    * on a feature id. The declared result is the bucket-level census the
    * pipeline owner audits before training: per bucket, total token mass,
    * distinct terms sharing the bucket (the collision count — the quantity
    * the D-vs-vocabulary tradeoff is tuned on), distinct documents
    * touching it, and the bucket's share of total token mass. The grid is
    * COMPLETE: all D buckets appear, zero-filled (the cramers_v
    * grid-completion rule), so the result shape is engine- and
    * data-independent.
    *
    * Float discipline: counts are exact integers; the one double is
    * `n_tokens / n_total` — a single IEEE division of two int64s
    * (deliberately unrounded; both casts are exact below 2^53, the same
    * contract as `graph_louvain_pass`'s delta_q).
    *
    * 100 TB shape: THREE bounded aggregates, no unbounded intermediate —
    * token mass is one map-side-combined groupBy onto D rows; the
    * collision census aggregates the DISTINCT TERM table (vocabulary-
    * sized, never the token stream); doc coverage distincts (doc, bucket)
    * — at most D rows per doc — then counts per bucket. The D-row grid and
    * the 1-row total both broadcast. Nothing downstream of the first
    * aggregates is input-sized. */
  val textFeatureHash: Q = (s, d) => {
    val h48 = (c: Column) => graft.expr.Md5Prefix48.md548(c)
    val toks = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val hashed = toks.select(col("doc_id"), col("term"),
      (h48(col("term")) % HashDim).as("bucket"))
    val byTok = hashed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val byTerm = toks.select(col("term")).distinct()
      .select((h48(col("term")) % HashDim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_terms"))
    val byDoc = hashed.select(col("doc_id"), col("bucket")).distinct()
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val tot = toks.agg(count(lit(1)).as("n_total"))
    s.range(0, HashDim).select(col("id").as("bucket"))
      .join(byTok, Seq("bucket"), "left")
      .join(byTerm, Seq("bucket"), "left")
      .join(byDoc, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)).cast("double")
          / col("n_total").cast("double")).as("mass_share"))
      .orderBy(col("bucket"))
  }

  // ------------------------------------------------------------ graph_hits

  /** HITS (Kleinberg 1999) on the customer→supplier purchase graph — the
    * second classic link-analysis score next to `graph_pagerank`, and the
    * one built for BIPARTITE endorsement structure: customers are hubs
    * (they point), suppliers are authorities (they are pointed at), and
    * two mutual-reinforcement iterations from h₀ = 1 score both sides:
    * a₁ = indegree, h₁ = Σ_neighbors a₁, a₂ = Σ_neighbors h₁,
    * h₂ = Σ_neighbors a₂. The declared result is the top-10 per role at
    * iteration depth 2 with the UNNORMALIZED integer score — HITS'
    * eigenvector direction is determined by the un-normalized iterate
    * (normalization only rescales), so staying in integer space makes the
    * ranking EXACT and engine-invariant where the textbook L2-normalized
    * float iteration is neither. Scores accumulate in DECIMAL(38,0): the
    * iterate grows like (edge degree)² per level, so int64 is the wrong
    * accumulator at cluster scale — the same overflow guard as the
    * checksum keys.
    *
    * 100 TB shape: the edge list is one orders⋈lineitem equi-join +
    * distinct (shuffled on the order key, then the pair grain); each HITS
    * level is ONE node-keyed equi-join of the edge list against the
    * previous level's node-score table (node-count-sized — broadcast at
    * harness scale, shuffle-hash on the node key at cluster scale) + one
    * map-side-combined aggregate. Exactly 2 levels per side — bounded, no
    * convergence loop. The top-10 is TakeOrderedAndProject (never a global
    * sort), and the rank window runs on the 10 surviving rows. */
  val graphHits: Q = (s, d) => {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val edges = T.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(T.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        "o_orderkey")
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
      .distinct()
    val a1 = edges.groupBy(col("p"))
      .agg(dec38(count(lit(1))).as("a1"))
    val h1 = edges.join(a1, "p").groupBy(col("c"))
      .agg(sum(col("a1")).as("h1"))
    val a2 = edges.join(h1, "c").groupBy(col("p"))
      .agg(sum(col("h1")).as("a2"))
    val h2 = edges.join(a2, "p").groupBy(col("c"))
      .agg(sum(col("a2")).as("h2"))
    def top10(df: DataFrame, node: String, score: String, role: String) =
      df.orderBy(col(score).desc, col(node).asc).limit(10)
        .select(lit(role).as("role"), col(node).as("node"),
          dec38(col(score)).as("score"))
    // one role-partitioned rank window over the 20 surviving rows — never
    // a partition-less Window (the all-query sweep pin)
    val w = Window.partitionBy(col("role"))
      .orderBy(col("score").desc, col("node").asc)
    top10(a2, "p", "a2", "authority")
      .unionByName(top10(h2, "c", "h2", "hub"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("role"), col("rnk"), col("node"), col("score"))
      .orderBy(col("role"), col("rnk"))
  }

  // ------------------------------------------------------------ events_its

  /** INTERRUPTED TIME SERIES (segmented regression; the
    * Wagner et al. 2002 design) — the causal read next to `events_did`
    * when there is NO control group: the daily revenue series per event
    * type splits at the intervention day (the midpoint of the observed
    * range — at deploy time, the feature-launch date), an OLS line fits
    * each segment, and the estimands are the LEVEL SHIFT at the
    * intervention (post-intercept − pre-intercept at x = 0) and the SLOPE
    * CHANGE — the two coefficients an ITS analysis reports.
    *
    * Arithmetic discipline (the `agg_linreg` device): x is the integer
    * day offset from the intervention; y rides exactly in integer cents
    * (the dsum-rounded daily revenue ×100); every regression moment (n,
    * Σx, Σy, Σxy, Σx²) is an int64, int64→double casts are exact, and
    * slope/intercept are one fixed IEEE expression per segment —
    * bit-identical across engines and partition counts, reported
    * deliberately UNROUNDED (the quotients are integer-ratio-fed; a
    * rounding step is the r10 half-way trap, not a determinism gain).
    *
    * 100 TB shape: the corpus folds map-side onto the (type × day) grid
    * (ONE shuffle); the intervention day is a 1-row broadcast; the ten
    * conditional moments ride ONE hash aggregate to the per-type grain.
    * Nothing after the daily fold is input-sized, and there is no
    * per-segment second pass — the CASE-gated moments make both
    * regressions share the single aggregate. */
  val eventsIts: Q = (s, d) => {
    import graft.core.Numeric.dsum
    val daily = T.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("rev"))
    val cut = T.events(s, d)
      .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      .select(expr("date_add(d0, CAST(datediff(d1, d0) DIV 2 AS INT))").as("cut"))
    val base = daily.crossJoin(broadcast(cut))
      .withColumn("x", datediff(col("day"), col("cut")).cast("long"))
      .withColumn("y100",
        (round(col("rev").cast("decimal(28,8)"), 2) * 100).cast("long"))
      .withColumn("post", col("x") >= 0L)
    def seg(p: Column, e: Column) = sum(when(p, e).otherwise(lit(0L)))
    val pre = !col("post")
    val post = col("post")
    val m = base.groupBy(col("event_type")).agg(
      seg(pre, lit(1L)).as("n0"), seg(post, lit(1L)).as("n1"),
      seg(pre, col("x")).as("sx0"), seg(post, col("x")).as("sx1"),
      seg(pre, col("y100")).as("sy0"), seg(post, col("y100")).as("sy1"),
      seg(pre, col("x") * col("y100")).as("sxy0"),
      seg(post, col("x") * col("y100")).as("sxy1"),
      seg(pre, col("x") * col("x")).as("sxx0"),
      seg(post, col("x") * col("x")).as("sxx1"))
      .filter(col("n0") >= 2L && col("n1") >= 2L)
    def fit(n: Column, sx: Column, sy: Column, sxy: Column, sxx: Column) = {
      val nd = n.cast("double"); val sxd = sx.cast("double")
      val syd = sy.cast("double"); val sxyd = sxy.cast("double")
      val sxxd = sxx.cast("double")
      val slope100 = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
      (slope100 / lit(100.0), ((syd - slope100 * sxd) / nd) / lit(100.0))
    }
    val (s0, i0) = fit(col("n0"), col("sx0"), col("sy0"), col("sxy0"), col("sxx0"))
    val (s1, i1) = fit(col("n1"), col("sx1"), col("sy1"), col("sxy1"), col("sxx1"))
    m.select(col("event_type"), col("n0").as("n_pre"), col("n1").as("n_post"),
        s0.as("slope_pre"), i0.as("intercept_pre"),
        s1.as("slope_post"), i1.as("intercept_post"),
        (s1 - s0).as("slope_change"), (i1 - i0).as("level_shift"))
      .orderBy(col("event_type"))
  }

  // -------------------------------------------------------- text_ppl_bucket

  /** PERPLEXITY BUCKETING (the CCNet head/middle/tail split,
    * Wenzek et al. 2020) — the quality-tiering step downstream of
    * `text_perplexity`'s per-doc scores: within each LANGUAGE, documents
    * rank by perplexity (ascending — fluent first; ties by doc_id) and
    * split into tertiles via NTILE(3), the exact device CCNet uses to
    * keep "head" data for training and route "tail" to filtering. The
    * declared result is the per-(lang, bucket) datasheet: doc count,
    * token mass, min/max perplexity and the mean — what a pipeline owner
    * reads to pick the keep-cutoff per language.
    *
    * Float discipline: per-doc ppl is `text_perplexity`'s 6-rounded
    * double (already engine-exact); the bucket mean re-uses the
    * integer-micro device — ppl round-trips through DECIMAL(20,6) (exact
    * at its own rounding scale), sums exactly, and the mean rounds
    * HALF-UP in integer micro space before ONE int→double division —
    * never a double-space rounding of a decimal-terminating half (the
    * r10 lesson, applied by construction).
    *
    * 100 TB shape: the scoring pass is text_perplexity's (all LM model
    * tables bounded and broadcast, one doc_id shuffle); the NTILE window
    * partitions by language — per-language state is a sort of that
    * language's doc scores, the price of exact tertiles (CCNet itself
    * sorts per language); the final aggregate lands on the (lang × 3)
    * grid. */
  val textPplBucket: Q = (s, d) => {
    val p = LlmPipeline.textPerplexity(s, d)
      .select(col("doc_id"), col("n_tok"), col("ppl"))
    val lang = T.documents(s, d).select(col("doc_id"), col("lang"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ppl").asc, col("doc_id").asc)
    p.join(lang, "doc_id")
      .withColumn("bucket", ntile(3).over(w))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("ppl")).as("min_ppl"),
        max(col("ppl")).as("max_ppl"),
        (sum(col("ppl").cast("decimal(20,6)")) * 1000000L).cast("long").as("s6"))
      .select(col("lang"), col("bucket").cast("long").as("bucket"),
        col("n_docs"), col("n_tokens"),
        col("min_ppl"), col("max_ppl"),
        (expr("(s6 * 2 + n_docs) DIV (n_docs * 2)").cast("double")
          / lit(1000000.0)).as("mean_ppl"))
      .orderBy(col("lang"), col("bucket"))
  }

  // --------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "text_feature_hash" -> textFeatureHash,
    "graph_hits" -> graphHits,
    "events_its" -> eventsIts,
    "text_ppl_bucket" -> textPplBucket,
  )

  /** DuckDB oracle texts. graph_hits is dual-dialect ANSI (listed in
    * SqlCatalog.sharedWithOracle); the others tokenize or use date
    * arithmetic, so each dialect spells its own primitives. */
  val oracles: Map[String, String] = Map(
    "text_feature_hash" -> {
      val h = (e: String) => LlmPipeline.h48Sql(e)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |h AS (SELECT doc_id, term, ${h("term")} % $HashDim AS bucket FROM toks),
         |bt AS (SELECT bucket, COUNT(*) AS n_tokens FROM h GROUP BY bucket),
         |tm AS (SELECT ${h("term")} % $HashDim AS bucket, COUNT(*) AS n_terms
         |       FROM (SELECT DISTINCT term FROM toks) GROUP BY 1),
         |bd AS (SELECT bucket, COUNT(DISTINCT doc_id) AS n_docs
         |       FROM h GROUP BY bucket),
         |tot AS (SELECT COUNT(*) AS n_total FROM toks),
         |g AS (SELECT unnest(generate_series(0, ${HashDim - 1})) AS bucket)
         |SELECT g.bucket,
         |  COALESCE(bt.n_tokens, 0) AS n_tokens,
         |  COALESCE(tm.n_terms, 0) AS n_terms,
         |  COALESCE(bd.n_docs, 0) AS n_docs,
         |  CAST(COALESCE(bt.n_tokens, 0) AS DOUBLE)
         |    / CAST(tot.n_total AS DOUBLE) AS mass_share
         |FROM g
         |LEFT JOIN bt ON bt.bucket = g.bucket
         |LEFT JOIN tm ON tm.bucket = g.bucket
         |LEFT JOIN bd ON bd.bucket = g.bucket
         |CROSS JOIN tot
         |ORDER BY g.bucket""".stripMargin
    },

    "graph_hits" ->
      """WITH edges AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS p
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |a1 AS (SELECT p, CAST(COUNT(*) AS DECIMAL(38,0)) AS a1
        |       FROM edges GROUP BY p),
        |h1 AS (SELECT c, SUM(a1) AS h1
        |       FROM edges JOIN a1 USING (p) GROUP BY c),
        |a2 AS (SELECT p, SUM(h1) AS a2
        |       FROM edges JOIN h1 USING (c) GROUP BY p),
        |h2 AS (SELECT c, SUM(a2) AS h2
        |       FROM edges JOIN a2 USING (p) GROUP BY c),
        |u AS (
        |  SELECT 'authority' AS role, p AS node,
        |    CAST(a2 AS DECIMAL(38,0)) AS score FROM a2
        |  UNION ALL
        |  SELECT 'hub' AS role, c AS node,
        |    CAST(h2 AS DECIMAL(38,0)) AS score FROM h2),
        |r AS (SELECT role, node, score,
        |    ROW_NUMBER() OVER (PARTITION BY role
        |      ORDER BY score DESC, node ASC) AS rnk
        |  FROM u)
        |SELECT role, CAST(rnk AS BIGINT) AS rnk, node, score
        |FROM r WHERE rnk <= 10
        |ORDER BY role, rnk""".stripMargin,

    "events_its" -> {
      val fit = (n: String, sx: String, sy: String, sxy: String, sxx: String) => {
        val nd = s"CAST($n AS DOUBLE)"; val sxd = s"CAST($sx AS DOUBLE)"
        val syd = s"CAST($sy AS DOUBLE)"; val sxyd = s"CAST($sxy AS DOUBLE)"
        val sxxd = s"CAST($sxx AS DOUBLE)"
        val slope100 = s"(($nd * $sxyd - $sxd * $syd) / ($nd * $sxxd - $sxd * $sxd))"
        (s"($slope100 / 100.0)",
          s"((($syd - $slope100 * $sxd) / $nd) / 100.0)")
      }
      val (s0, i0) = fit("n0", "sx0", "sy0", "sxy0", "sxx0")
      val (s1, i1) = fit("n1", "sx1", "sy1", "sxy1", "sxx1")
      val dsumSql = graft.core.Numeric.dsumSql _
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    ${dsumSql("value")} AS rev
         |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
         |cutoff AS (
         |  SELECT CAST(MIN(ts) AS DATE)
         |    + CAST(date_diff('day', CAST(MIN(ts) AS DATE),
         |        CAST(MAX(ts) AS DATE)) // 2 AS INTEGER)
         |    AS cut
         |  FROM events),
         |base AS (
         |  SELECT event_type,
         |    CAST(date_diff('day', cut, day) AS BIGINT) AS x,
         |    CAST(ROUND(CAST(rev AS DECIMAL(28,8)), 2) * 100 AS BIGINT) AS y100
         |  FROM daily CROSS JOIN cutoff),
         |m AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(SUM(CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN x < 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
         |    CAST(SUM(CASE WHEN x >= 0 THEN x ELSE 0 END) AS BIGINT) AS sx1,
         |    CAST(SUM(CASE WHEN x < 0 THEN y100 ELSE 0 END) AS BIGINT) AS sy0,
         |    CAST(SUM(CASE WHEN x >= 0 THEN y100 ELSE 0 END) AS BIGINT) AS sy1,
         |    CAST(SUM(CASE WHEN x < 0 THEN x * y100 ELSE 0 END) AS BIGINT) AS sxy0,
         |    CAST(SUM(CASE WHEN x >= 0 THEN x * y100 ELSE 0 END) AS BIGINT) AS sxy1,
         |    CAST(SUM(CASE WHEN x < 0 THEN x * x ELSE 0 END) AS BIGINT) AS sxx0,
         |    CAST(SUM(CASE WHEN x >= 0 THEN x * x ELSE 0 END) AS BIGINT) AS sxx1
         |  FROM base GROUP BY event_type
         |  HAVING SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) >= 2
         |     AND SUM(CASE WHEN x >= 0 THEN 1 ELSE 0 END) >= 2)
         |SELECT event_type, n0 AS n_pre, n1 AS n_post,
         |  $s0 AS slope_pre, $i0 AS intercept_pre,
         |  $s1 AS slope_post, $i1 AS intercept_post,
         |  ($s1 - $s0) AS slope_change, ($i1 - $i0) AS level_shift
         |FROM m ORDER BY event_type""".stripMargin
    },

    "text_ppl_bucket" ->
      s"""WITH ${LlmPipeline.pplCoreSql},
         |b AS (
         |  SELECT d.lang, p.doc_id, p.n_tok, p.ppl,
         |    NTILE(3) OVER (PARTITION BY d.lang
         |      ORDER BY p.ppl ASC, p.doc_id ASC) AS bucket
         |  FROM ppl p JOIN documents d USING (doc_id)),
         |g AS (
         |  SELECT lang, bucket, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |    MIN(ppl) AS min_ppl, MAX(ppl) AS max_ppl,
         |    CAST(SUM(CAST(ppl AS DECIMAL(20,6))) * 1000000 AS BIGINT) AS s6
         |  FROM b GROUP BY lang, bucket)
         |SELECT lang, CAST(bucket AS BIGINT) AS bucket, n_docs, n_tokens,
         |  min_ppl, max_ppl,
         |  CAST((s6 * 2 + n_docs) // (n_docs * 2) AS DOUBLE) / 1000000.0
         |    AS mean_ppl
         |FROM g ORDER BY lang, bucket""".stripMargin,
  )
}
