package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.api.CheckpointStrategy
import graft.core.{Tables => T}

/** Data-insight / curation operators — round-7 widening of the declared
  * surface (SURVEY §2.2) past the reference's two-statement scope
  * (`/root/reference/db.cpp:428-441`): corpus-balancing samplers, skew
  * observability, blocklist filtering, contrastive-pair mining, exact
  * correlation, activity CCDF, and the degree/k-core graph profile that
  * complements `graph_jaccard`/`graph_triangles`. Every op follows the
  * engine's determinism discipline (portable hashes, exact decimal or
  * integer moments, round-then-cast doubles, total ORDER BY) so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object Insights {
  type Q = (SparkSession, String) => DataFrame

  /** Portable 48-bit hash (md5 prefix — [[graft.expr.Md5Prefix48]]),
    * identical to DuckDB's `CAST('0x'||substr(md5(x),1,12) AS BIGINT)`. */
  private def h48(c: Column): Column = graft.expr.Md5Prefix48.md548(c)

  /** CLASS-BALANCED sampling — cap each class (language) at K docs, the
    * mixture-rebalancing primitive every multilingual training corpus
    * needs (a raw web crawl is 10:1 English-heavy; the training mix is
    * not). Selection within a class follows the portable (md5-48, id)
    * total order, so the kept set is a pure row property: reproducible
    * across engines, partitionings and reruns, and STABLE under corpus
    * appends in the same sense as `sample_split`'s hash gate. The rank
    * filter is `row_number ≤ K` over (class | hash, id) — Spark rewrites
    * rank-limit filters into WindowGroupLimit, so each map task keeps a
    * K-row heap per class and the shuffle carries O(classes · K) rows,
    * not the corpus: the 100 TB cost is one scan + a bounded shuffle. */
  val sampleBalanced: Q = (s, d) => {
    val k = 40
    val hk = h48(concat(lit("bal:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
    T.documents(s, d)
      .select(col("doc_id"), col("lang"), hk.as("hk"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** JOIN-KEY SKEW REPORT — the observability pass behind every salting /
    * AQE-skew decision in this engine (`join_skew_salted`, `agg_salted`):
    * per-key frequencies for a prospective join key, the top-10 heaviest
    * keys with their row share, and the global skew ratio
    * max·keys ⁄ rows (1.0 = uniform). At 100 TB this is the query you run
    * BEFORE the big join: one partial-aggregated groupBy (map-side
    * combine — the shuffle carries one row per distinct key), a scalar
    * stats row that broadcasts, and a bounded top-10. Nothing here is
    * proportional to input rows after the first aggregate. */
  val metaSkewReport: Q = (s, d) => {
    val cnt = T.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    val stats = cnt.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    cnt.orderBy(col("cnt").desc, col("o_custkey")).limit(10)
      .crossJoin(broadcast(stats))
      .select(col("o_custkey"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"),
        col("n_keys"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double"), 4).as("skew_ratio"))
      .orderBy(col("cnt").desc, col("o_custkey"))
  }

  /** BLOCKLIST-DENSITY filter audit — the safety-filter stage of a
    * training pipeline (NSFW / boilerplate wordlists): a doc is flagged
    * when ≥ 12% of its tokens come from the blocklist (density, not mere
    * presence — on web-scale corpora almost every long doc CONTAINS any
    * given common term once; density is what the production filters
    * threshold on). The list is a query literal (broadcast-sized by
    * construction); the density is a fused scalar projection over the
    * scan; the only shuffle is the per-source report aggregate. */
  val textBlocklist: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val dens = size(filter(toks, x => x.isin("slow", "dup", "big")))
      .cast("double") / size(toks).cast("double")
    val flagged = when(dens >= 0.12, 1L).otherwise(0L)
    T.documents(s, d)
      .select(col("source"), flagged.as("f"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("f")).as("n_flagged"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        round(col("n_flagged").cast("double") / col("n_docs").cast("double"), 6)
          .as("flag_rate"))
      .orderBy(col("source"))
  }

  /** CONTRASTIVE-PAIR mining — the embedding-training data generator:
    * adjacent fixed-width token windows of the same document form
    * (anchor, positive) pairs (in-batch negatives come free at training
    * time). Chunking is deterministic (16 whole tokens per chunk, ragged
    * tail dropped so both sides of every pair are full windows); the
    * entire op is a per-row Generate over the scan — embarrassingly
    * parallel, no shuffle except the declared output sort. A 100 TB
    * corpus maps to pair shards in one pass; this is the same
    * tokenize-once discipline as `text_chunk` (which serves inference
    * packing, where ragged tails must be KEPT — hence two keys). */
  val textContrastivePairs: Q = (s, d) => {
    val cw = 16
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("parts"))
      .withColumn("n_chunks", (size(col("parts")) / cw).cast("int"))
      .filter(col("n_chunks") >= 2)
      .select(col("doc_id"), col("parts"),
        explode(sequence(lit(0), col("n_chunks") - 2)).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("pair_idx"),
        concat_ws(" ", slice(col("parts"), col("i") * cw + 1, lit(cw)))
          .as("anchor"),
        concat_ws(" ", slice(col("parts"), col("i") * cw + cw + 1, lit(cw)))
          .as("positive"))
      .orderBy(col("doc_id"), col("pair_idx"))
  }

  /** Exact Pearson CORRELATION MATRIX over lineitem measures — the
    * feature-redundancy screen run before any model training, and the
    * engine's stance on distributed float stats: built-in `corr` is a
    * streaming-covariance aggregate whose result depends on partition
    * merge order, so the engine instead computes the SIX raw moments as
    * exact DECIMAL sums (order-independent — inputs have ≤ 2 decimal
    * digits, so DECIMAL(18,4) products at DECIMAL(37,8) are exact and
    * the DECIMAL(38,8) sums cannot overflow below ~10¹⁴ rows) in ONE
    * map-side-combined aggregate, then applies the closed-form
    *   r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²))
    * as a fixed IEEE sequence on the single stats row. One scan, one
    * scalar shuffle row, engine-invariant to the last bit. */
  val aggCorrMatrix: Q = (s, d) => {
    def dec(c: String): Column = col(c).cast("decimal(18,4)")
    val li = T.lineitem(s, d)
    val m = li.agg(
      count(lit(1)).as("n"),
      sum(dec("l_quantity")).as("sq"),
      sum(dec("l_extendedprice")).as("sp"),
      sum(dec("l_discount")).as("sd"),
      sum(dec("l_quantity") * dec("l_quantity")).as("sqq"),
      sum(dec("l_extendedprice") * dec("l_extendedprice")).as("spp"),
      sum(dec("l_discount") * dec("l_discount")).as("sdd"),
      sum(dec("l_quantity") * dec("l_extendedprice")).as("sqp"),
      sum(dec("l_quantity") * dec("l_discount")).as("sqd"),
      sum(dec("l_extendedprice") * dec("l_discount")).as("spd"))
    val pairs = m.select(explode(array(
      struct(lit("l_quantity").as("col_x"), lit("l_extendedprice").as("col_y"),
        col("n"), col("sq").as("sx"), col("sp").as("sy"),
        col("sqq").as("sxx"), col("spp").as("syy"), col("sqp").as("sxy")),
      struct(lit("l_quantity").as("col_x"), lit("l_discount").as("col_y"),
        col("n"), col("sq").as("sx"), col("sd").as("sy"),
        col("sqq").as("sxx"), col("sdd").as("syy"), col("sqd").as("sxy")),
      struct(lit("l_extendedprice").as("col_x"), lit("l_discount").as("col_y"),
        col("n"), col("sp").as("sx"), col("sd").as("sy"),
        col("spp").as("sxx"), col("sdd").as("syy"), col("spd").as("sxy"))))
      .as("p")).select(col("p.*"))
    def dbl(c: String): Column = col(c).cast("double")
    pairs.select(col("col_x"), col("col_y"),
      round((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
        / (sqrt(dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
          * sqrt(dbl("n") * dbl("syy") - dbl("sy") * dbl("sy"))), 6)
        .as("corr"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** Per-user activity CCDF — the survival-curve view of engagement
    * ("what share of users produced ≥ N events"), the retention-quality
    * metric next to `agg_retention`'s day-grid and `events_rfm`'s bands.
    * Per-user counts partial-aggregate map-side and collapse to the
    * bucket GRID (≤ a few hundred rows regardless of user count); the
    * descending cumulative itself is then a grid⋈grid triangle join —
    * NOT a partition-less running-sum window, the one plan shape the
    * engine bans everywhere (PlanSpec sweeps for it): the tiny grid
    * broadcasts, so the cumulative costs |grid|² pair rows instead of
    * funneling anything through a single reducer. */
  val eventsCcdf: Q = (s, d) => {
    val bw = 5
    val u = T.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val tot = u.agg(count(lit(1)).as("nu"))
    val g = u.select((col("n") - pmod(col("n"), lit(bw.toLong))).as("min_events"))
      .groupBy(col("min_events")).agg(count(lit(1)).as("c"))
    val hi = g.select(col("min_events").as("b2"), col("c").as("c2"))
    g.select(col("min_events"))
      .join(broadcast(hi), col("b2") >= col("min_events"))
      .groupBy(col("min_events")).agg(sum(col("c2")).as("n_users_ge"))
      .crossJoin(broadcast(tot))
      .select(col("min_events"), col("n_users_ge"),
        round(col("n_users_ge").cast("double") / col("nu").cast("double"), 6)
          .as("share"))
      .orderBy(col("min_events"))
  }

  /** Co-purchase edge list shared by [[graphDegreeDist]] and
    * [[graphKcore]] — the `graph_jaccard` graph (parts co-occurring in a
    * 1-in-3 order slice), kept identical so the three keys profile ONE
    * graph: distinct (order, part) pairs self-join on the order basket.
    * The basket join is the only edge-building shuffle; `distinct`
    * bounds multi-line baskets. */
  private def coEdges(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb")).distinct()
  }

  /** Undirected degree of every node in [[coEdges]]. */
  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("pa").as("p")).unionAll(edges.select(col("pb").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("deg"))

  /** DEGREE DISTRIBUTION of the co-purchase graph — the first thing a
    * graph pipeline reports (and the input to every skew decision the
    * iterative ops make: a heavy-tailed histogram is what mandates
    * `graph_triangles`' degree orientation). Buckets are power-of-two
    * CASE bands — an explicit ladder, NOT floor(log2(deg)) computed in
    * floating point, where `ln(8)/ln(2) = 2.999…` floors to the wrong
    * bucket and libm rounding may differ between engines. Output is the
    * bounded histogram; the only data-sized shuffles are the edge build
    * and one degree aggregate. */
  val graphDegreeDist: Q = (s, d) => {
    val deg = degrees(coEdges(s, d))
    val bucket = when(col("deg") === 1, 1L).when(col("deg") <= 3, 2L)
      .when(col("deg") <= 7, 4L).when(col("deg") <= 15, 8L)
      .when(col("deg") <= 31, 16L).when(col("deg") <= 63, 32L)
      .otherwise(64L)
    deg.select(bucket.as("bucket_lo"), col("deg"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"))
      .orderBy(col("bucket_lo"))
  }

  /** K-CORE peel (k = 32, exactly TWO declared rounds) — the density
    * filter that isolates the graph's stable community backbone (nodes
    * that keep ≥ k neighbors even after their weak neighbors vanish).
    * Each round drops sub-k nodes, restricts edges to survivors (two
    * broadcast-able semi-joins), and recomputes degrees. The full k-core
    * iterates to fixpoint — an open loop like
    * [[graft.api.TextDedup.connectedComponents]]'s — but the DECLARED
    * key pins two unrolled rounds so the oracle is closed-form SQL; the
    * round count is part of the query contract, exactly like
    * `graph_pagerank`'s fixed iteration count. The edge list is the
    * multiply-consumed value (degrees ×2, restrictions ×2), so it is the
    * one [[CheckpointStrategy]] barrier; per-round cost is two
    * aggregates + two semi-joins — linear in edges, and the edge set
    * only shrinks. */
  def graphKcore(cp: CheckpointStrategy = CheckpointStrategy.Local): Q =
    (s, d) => {
      val k = 32
      val e0 = cp.materialize(coEdges(s, d))
      val keep0 = degrees(e0).filter(col("deg") >= k).select(col("p"))
      val e1 = cp.materialize(e0
        .join(keep0.select(col("p").as("pa")), Seq("pa"), "left_semi")
        .join(keep0.select(col("p").as("pb")), Seq("pb"), "left_semi"))
      degrees(e1).filter(col("deg") >= k)
        .select(col("p").as("node"), col("deg"))
        .orderBy(col("node"))
    }

  /** RADIUS (range) similarity search — the threshold companion to
    * `sim_topk`'s rank cut: every corpus vector within cosine ≥ 0.2 of
    * each probe, for a bounded probe set (1-in-50 id slice). The probe
    * side broadcasts with precomputed norms, the corpus scan stays
    * embarrassingly parallel, and each pair costs ONE fused
    * [[graft.expr.FloatDotProduct]] — the `VectorSearch.topK` discipline
    * minus the window (a threshold needs no per-probe ranking state at
    * all). The corpus never self-joins; at 100 TB the cost is
    * |corpus| · |probes| fused dot products, the floor for exact radius
    * search, and the IVF-cell route (`sim_topk_ivf`) is the declared
    * approximate escape when the probe set itself grows. Scores round
    * to 6 before the threshold test, so the keep/drop decision cannot
    * flip on a ulp between engines. */
  val simRadius: Q = (s, d) => {
    val tau = 0.2
    def dotp(x: Column, y: Column): Column =
      graft.expr.FloatDotProduct.fdot(x, y)
    val e = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dotp(col("embedding"), col("embedding"))).as("norm"))
    val p = e.filter(col("vec_id") % 50 === 7)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("norm").as("pn"))
    broadcast(p).crossJoin(e)
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cos",
        round(dotp(col("pe"), col("embedding")) / (col("pn") * col("norm")), 6))
      .filter(col("cos") >= tau)
      .select(col("probe_id"), col("vec_id").as("cand_id"), col("cos"))
      .orderBy(col("probe_id"), col("cos").desc, col("cand_id"))
  }

  /** Lag-k AUTOCORRELATION of the daily event-count series per type —
    * the seasonality detector feeding `events_forecast`'s lag-7 naive
    * model (a strong lag-7 autocorrelation is what justifies it) and
    * `agg_seasonality`'s weekday profile. The series is the tiny daily
    * GRID (one count per (type, day)); lag pairing is a self-equi-join
    * on (type, day+lag) — at 100 TB the grid is still days × types
    * rows, so everything after the first aggregate is model-sized.
    * Counts are integers → DECIMAL(19,0) moments are exact; the Pearson
    * closed form runs once per (type, lag) row. */
  val aggAutocorr: Q = (s, d) => {
    val daily = T.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lagged = daily.select(col("event_type"),
      col("day"), col("n").as("x"),
      explode(array(lit(1), lit(7))).as("lag"))
    val d2 = daily.select(col("event_type"), col("day").as("day2"),
      col("n").as("y"))
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val pairs = lagged.join(d2, Seq("event_type"))
      .filter(col("day2") === date_add(col("day"), col("lag")))
    val mom = pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("np"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    def dbl(c: String): Column = col(c).cast("double")
    mom.select(col("event_type"), col("lag").cast("long").as("lag"),
        col("np").as("n_pairs"),
        round((dbl("np") * dbl("sxy") - dbl("sx") * dbl("sy"))
          / (sqrt(dbl("np") * dbl("sxx") - dbl("sx") * dbl("sx"))
            * sqrt(dbl("np") * dbl("syy") - dbl("sy") * dbl("sy"))), 6)
          .as("autocorr"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Per-user INTER-EVENT GAP profile — the engagement-cadence /
    * churn-risk signal next to `events_sessionize` (whose 30-minute gap
    * threshold this query is how you calibrate): per user, the count,
    * max and mean of second-granularity gaps between consecutive
    * events. The lag window is user-partitioned (the scalable window
    * shape — state is one row per task), gaps are exact integers
    * (truncate-to-second diffs, identical in both engines), and the
    * result is one row per user. */
  val eventsGaps: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .withColumn("gap",
        unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(col("gap")).as("n_gaps"), max(col("gap")).as("max_gap_s"),
        round(sum(col("gap")).cast("double") / count(col("gap")).cast("double"), 6)
          .as("avg_gap_s"))
      .orderBy(col("user_id"))
  }

  /** Bigram NOVELTY scoring — per-doc share of bigrams whose global
    * FIRST occurrence (min doc_id) is this doc: the marginal-contribution
    * measure behind dedup-aware data valuation (a doc full of
    * already-seen n-grams adds little; the SSI/D4 family of curation
    * methods ranks on exactly this signal). Grams travel as portable
    * 48-bit hashes, never strings — the shuffle carries (doc, hash)
    * pairs; first-occurrence is one gram-keyed aggregate (map-side
    * combined), credit assignment one hash join back. Tokenize-once:
    * the gram stream is an index-sequence Generate over the scan. */
  val textNovelty: Q = (s, d) => {
    val g = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("parts"))
      .filter(size(col("parts")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("parts")) - 1)).as("i"),
        col("parts"))
      .select(col("doc_id"),
        h48(concat_ws(" ", slice(col("parts"), col("i"), lit(2)))).as("gh"))
      .distinct()
    val fo = g.groupBy(col("gh")).agg(min(col("doc_id")).as("fd"))
    g.join(fo, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6)
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** HARD-NEGATIVE mining for contrastive training — the similarity
    * band BELOW the duplicate threshold: per probe, the top-5 corpus
    * vectors with cosine in [0.05, 0.2) — similar enough to be
    * informative negatives, far enough to not be positives (the
    * `text_contrastive_pairs` anchor/positive generator's counterpart).
    * Same plan family as `sim_radius`/`sim_topk`: broadcast probes with
    * precomputed norms, one fused dot per pair, band filter on the
    * ROUNDED score, then a per-probe window top-5 (bounded state). */
  val simHardNegatives: Q = (s, d) => {
    def dotp(x: Column, y: Column): Column =
      graft.expr.FloatDotProduct.fdot(x, y)
    val e = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dotp(col("embedding"), col("embedding"))).as("norm"))
    val p = e.filter(col("vec_id") % 50 === 23)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("norm").as("pn"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(p).crossJoin(e)
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cos",
        round(dotp(col("pe"), col("embedding")) / (col("pn") * col("norm")), 6))
      .filter(col("cos") >= 0.05 && col("cos") < 0.2)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("cand_id"), col("cos"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Higher-moment distribution profile (mean / sample stddev /
    * SKEWNESS) per order status — `agg_stats` extended to the third
    * moment, the long-tail detector a pricing or fraud pipeline reports
    * before choosing transforms. All three raw moments are exact
    * decimals in ONE aggregate: S3 multiplies through a staged
    * (19,2)→(19,4) cast chain so BOTH engines stay on their 128-bit
    * decimal path with zero scale adjustment (a (12,2)³ spelling
    * overflows DuckDB's int64 fast path; a (19,4)² spelling trips
    * Spark's precision-loss scale trim — the staged chain does
    * neither). The closed forms run on the 3-row stats grid; the
    * skewness denominator is m2·√m2, NOT pow(m2, 1.5) — pow is not
    * correctly rounded and may differ by an ulp across libm
    * implementations, multiply and sqrt are exact/correctly-rounded
    * everywhere. */
  val aggMoments: Q = (s, d) => {
    val p = col("o_totalprice").cast("decimal(19,2)")
    val m = T.orders(s, d).groupBy(col("o_orderstatus")).agg(
      count(lit(1)).as("n"),
      sum(p).as("s1"),
      sum(p * p).as("s2"),
      sum((p * p).cast("decimal(19,4)") * p).as("s3"))
    def dbl(c: String): Column = col(c).cast("double")
    val mu = dbl("s1") / dbl("n")
    val m2 = dbl("s2") / dbl("n") - mu * mu
    val m3 = dbl("s3") / dbl("n") - lit(3) * mu * (dbl("s2") / dbl("n")) +
      lit(2) * mu * mu * mu
    m.select(col("o_orderstatus"), col("n"),
        round(mu, 6).as("mean_price"),
        round(sqrt((dbl("n") * dbl("s2") - dbl("s1") * dbl("s1"))
          / (dbl("n") * (col("n") - 1).cast("double"))), 6).as("stddev_price"),
        round(m3 / (m2 * sqrt(m2)), 6).as("skewness"))
      .orderBy(col("o_orderstatus"))
  }

  /** DOMAIN-DRIFT screen — document-frequency rates compared between
    * two source cohorts (sources 0–9 vs 10–19), top-20 most-drifted
    * terms: the distribution-shift check run before mixing a new crawl
    * snapshot into the training corpus (`text_mixture` decides
    * proportions; this query is why you'd change them). One distinct
    * (doc, term) pass, one term-keyed aggregate with conditional
    * per-cohort counts (no pivot join), cohort totals as a broadcast
    * scalar row, bounded top-20 output. Rates round to 6 BEFORE the
    * drift subtraction so the ranking is engine-invariant. */
  val textDomainDrift: Q = (s, d) => {
    val grp = when(substring(col("source"), 4, 10).cast("int") < 10, "a")
      .otherwise("b")
    val docs = T.documents(s, d).select(col("doc_id"), grp.as("grp"), col("text"))
    val tot = docs.agg(
      sum(when(col("grp") === "a", 1L).otherwise(0L)).as("na"),
      sum(when(col("grp") === "b", 1L).otherwise(0L)).as("nb"))
    val td = docs
      .select(col("doc_id"), col("grp"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    val dfs = td.groupBy(col("term")).agg(
      sum(when(col("grp") === "a", 1L).otherwise(0L)).as("dfa"),
      sum(when(col("grp") === "b", 1L).otherwise(0L)).as("dfb"))
    dfs.crossJoin(broadcast(tot))
      .select(col("term"),
        round(col("dfa").cast("double") / col("na").cast("double"), 6)
          .as("rate_a"),
        round(col("dfb").cast("double") / col("nb").cast("double"), 6)
          .as("rate_b"))
      .withColumn("drift", round(abs(col("rate_a") - col("rate_b")), 6))
      .orderBy(col("drift").desc, col("term"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "sample_balanced" -> sampleBalanced,
    "meta_skew_report" -> metaSkewReport,
    "text_blocklist" -> textBlocklist,
    "text_contrastive_pairs" -> textContrastivePairs,
    "agg_corr_matrix" -> aggCorrMatrix,
    "events_ccdf" -> eventsCcdf,
    "graph_degree_dist" -> graphDegreeDist,
    "graph_kcore" -> graphKcore(),
    "sim_radius" -> simRadius,
    "agg_autocorr" -> aggAutocorr,
    "events_gaps" -> eventsGaps,
    "text_novelty" -> textNovelty,
    "sim_hard_negatives" -> simHardNegatives,
    "agg_moments" -> aggMoments,
    "text_domain_drift" -> textDomainDrift,
  )

  /** DuckDB positional dot product over the 64-dim float lists (the
    * LlmPipeline oracle convention). */
  private def dotSql(a: String, b: String): String =
    s"(SELECT sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)) FROM range(1, 65) r(i))"

  /** BOUNDED LABEL PROPAGATION — community seeding on the basket
    * co-occurrence graph in a FIXED number of supersteps (3 rounds of
    * synchronous min-label: each node takes the minimum of its own and
    * its neighbors' labels). The bounded-depth sibling of
    * `dedup_cluster`'s loop-to-fixpoint connected components: when the
    * interesting structure has small diameter (near-dup clusters,
    * co-purchase pockets), a fixed superstep budget makes the op fully
    * DECLARATIVE — the oracle unrolls the same 3 joins — and the cost
    * exactly 3 node-keyed shuffles. Declared result: per surviving label,
    * member count + node range (singleton communities dropped).
    *
    * 100 TB shape: each round is one (edges ⋈ labels) hash join + a
    * node-keyed min — the Pregel superstep reduced to relational form;
    * rounds materialize via localCheckpoint so round k+1 reads a O(V)
    * table, not a doubling lineage (the `dedup_cluster` barrier rule). */
  def graphLabelProp(cp: CheckpointStrategy = CheckpointStrategy.Local): Q =
    (s, d) => {
    val li = T.lineitem(s, d).filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val edges = cp.materialize(a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb")).distinct())
    val msgs = edges.select(col("pa").as("node"), col("pb").as("nbr"))
      .unionAll(edges.select(col("pb").as("node"), col("pa").as("nbr")))
    var lab = li.select(col("l_partkey").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to 3) {
      val incoming = msgs
        .join(lab.select(col("node").as("nbr"), col("lab")), "nbr")
        .select(col("node"), col("lab"))
      lab = cp.materialize(lab.select(col("node"), col("lab"))
        .unionAll(incoming)
        .groupBy(col("node")).agg(min(col("lab")).as("lab")))
    }
    lab.groupBy(col("lab"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"),
        max(col("node")).as("max_node"))
      .filter(col("n_members") >= 2)
      .orderBy(col("lab"))
  }

  val oracles: Map[String, String] = Map(
    // 3 unrolled min-label supersteps — integer-exact in any engine
    "graph_label_prop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_orderkey % 5 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey),
        |msgs AS (
        |  SELECT pa AS node, pb AS nbr FROM edges
        |  UNION ALL
        |  SELECT pb AS node, pa AS nbr FROM edges),
        |l0 AS (SELECT DISTINCT l_partkey AS node, l_partkey AS lab FROM li),
        |l1 AS (SELECT node, MIN(lab) AS lab FROM (
        |    SELECT node, lab FROM l0
        |    UNION ALL
        |    SELECT m.node, l.lab FROM msgs m JOIN l0 l ON m.nbr = l.node)
        |  GROUP BY node),
        |l2 AS (SELECT node, MIN(lab) AS lab FROM (
        |    SELECT node, lab FROM l1
        |    UNION ALL
        |    SELECT m.node, l.lab FROM msgs m JOIN l1 l ON m.nbr = l.node)
        |  GROUP BY node),
        |l3 AS (SELECT node, MIN(lab) AS lab FROM (
        |    SELECT node, lab FROM l2
        |    UNION ALL
        |    SELECT m.node, l.lab FROM msgs m JOIN l2 l ON m.nbr = l.node)
        |  GROUP BY node)
        |SELECT lab, COUNT(*) AS n_members, MIN(node) AS min_node,
        |  MAX(node) AS max_node
        |FROM l3 GROUP BY lab HAVING COUNT(*) >= 2 ORDER BY lab""".stripMargin,

    // portable md5-48 order, rank cap per class
    "sample_balanced" ->
      """SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY CAST('0x' || substr(md5('bal:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT),
        |      doc_id) AS rk
        |  FROM documents) t WHERE rk <= 40 ORDER BY lang, rk""".stripMargin,

    "meta_skew_report" ->
      """WITH c AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
        |s AS (SELECT COUNT(*) AS n_keys, SUM(cnt) AS n_rows, MAX(cnt) AS max_cnt FROM c)
        |SELECT c.o_custkey, c.cnt,
        |  CAST(round(CAST(c.cnt AS DOUBLE) / CAST(s.n_rows AS DOUBLE), 6) AS DOUBLE) AS share,
        |  CAST(s.n_keys AS BIGINT) AS n_keys,
        |  CAST(round(CAST(s.max_cnt AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
        |    / CAST(s.n_rows AS DOUBLE), 4) AS DOUBLE) AS skew_ratio
        |FROM c CROSS JOIN s ORDER BY c.cnt DESC, c.o_custkey LIMIT 10""".stripMargin,

    // density (not presence) over the token list; threshold on the exact
    // integer-ratio double — identical list semantics both engines
    "text_blocklist" ->
      """WITH f AS (SELECT source,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> list_contains(['slow','dup','big'], x))) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dens
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN dens >= 0.12 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(round(CAST(SUM(CASE WHEN dens >= 0.12 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS flag_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    // whole-window pairs only (ragged tail dropped); 1-based inclusive
    // list slices mirror Spark's slice(parts, start, length)
    "text_contrastive_pairs" ->
      """WITH p AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        |g AS (SELECT doc_id, parts, CAST(len(parts) // 16 AS BIGINT) AS n_chunks FROM p),
        |idx AS (SELECT unnest(generate_series(0, 62)) AS i)
        |SELECT doc_id, CAST(i AS BIGINT) AS pair_idx,
        |  array_to_string(parts[(i*16+1):(i*16+16)], ' ') AS anchor,
        |  array_to_string(parts[(i*16+17):(i*16+32)], ' ') AS positive
        |FROM g CROSS JOIN idx WHERE n_chunks >= 2 AND i <= n_chunks - 2
        |ORDER BY doc_id, pair_idx""".stripMargin,

    // six exact decimal moments -> the same fixed IEEE closed form
    "agg_corr_matrix" ->
      """WITH m AS (SELECT COUNT(*) AS n,
        |  SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sq,
        |  SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sp,
        |  SUM(CAST(l_discount AS DECIMAL(19,4))) AS sd,
        |  SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sqq,
        |  SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS spp,
        |  SUM(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS sdd,
        |  SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sqp,
        |  SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS sqd,
        |  SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS spd
        |  FROM lineitem)
        |SELECT col_x, col_y, CAST(round(
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  AS DOUBLE) AS corr
        |FROM (
        |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
        |    n, sq AS sx, sp AS sy, sqq AS sxx, spp AS syy, sqp AS sxy FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount',
        |    n, sq, sd, sqq, sdd, sqd FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |    n, sp, sd, spp, sdd, spd FROM m) t
        |ORDER BY col_x, col_y""".stripMargin,

    "events_ccdf" ->
      """WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
        |tot AS (SELECT COUNT(*) AS nu FROM u),
        |g AS (SELECT (n // 5) * 5 AS min_events, COUNT(*) AS c FROM u GROUP BY 1)
        |SELECT CAST(min_events AS BIGINT) AS min_events,
        |  CAST(SUM(c) OVER (ORDER BY min_events DESC) AS BIGINT) AS n_users_ge,
        |  CAST(round(CAST(SUM(c) OVER (ORDER BY min_events DESC) AS DOUBLE)
        |    / CAST(tot.nu AS DOUBLE), 6) AS DOUBLE) AS share
        |FROM g CROSS JOIN tot ORDER BY min_events""".stripMargin,

    // explicit power-of-two CASE ladder (no float log2)
    "graph_degree_dist" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_orderkey % 3 = 0),
        |e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT p, COUNT(*) AS deg FROM (
        |    SELECT pa AS p FROM e UNION ALL SELECT pb FROM e) u GROUP BY p)
        |SELECT CAST(CASE WHEN deg = 1 THEN 1 WHEN deg <= 3 THEN 2
        |    WHEN deg <= 7 THEN 4 WHEN deg <= 15 THEN 8 WHEN deg <= 31 THEN 16
        |    WHEN deg <= 63 THEN 32 ELSE 64 END AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n_nodes, CAST(MIN(deg) AS BIGINT) AS min_deg,
        |  CAST(MAX(deg) AS BIGINT) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bucket_lo""".stripMargin,

    // two unrolled peel rounds, k = 32 — the declared contract
    "graph_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_orderkey % 3 = 0),
        |e0 AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |d0 AS (SELECT p, COUNT(*) AS deg FROM (
        |    SELECT pa AS p FROM e0 UNION ALL SELECT pb FROM e0) u GROUP BY p),
        |k0 AS (SELECT p FROM d0 WHERE deg >= 32),
        |e1 AS (SELECT pa, pb FROM e0
        |  WHERE pa IN (SELECT p FROM k0) AND pb IN (SELECT p FROM k0)),
        |d1 AS (SELECT p, COUNT(*) AS deg FROM (
        |    SELECT pa AS p FROM e1 UNION ALL SELECT pb FROM e1) u GROUP BY p)
        |SELECT CAST(p AS BIGINT) AS node, CAST(deg AS BIGINT) AS deg
        |FROM d1 WHERE deg >= 32 ORDER BY node""".stripMargin,

    // exact integer moments on the (type, day) grid; lag pairing by date
    // arithmetic; Pearson closed form in fixed IEEE order
    "agg_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT d1.event_type, l.lag, d1.n AS x, d2.n AS y
        |  FROM daily d1
        |  CROSS JOIN (SELECT 1 AS lag UNION ALL SELECT 7) l
        |  JOIN daily d2 ON d2.event_type = d1.event_type
        |    AND d2.day = d1.day + CAST(l.lag AS INT)),
        |m AS (SELECT event_type, lag, COUNT(*) AS np,
        |  SUM(CAST(x AS DECIMAL(19,0))) AS sx, SUM(CAST(y AS DECIMAL(19,0))) AS sy,
        |  SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |  SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
        |  SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(np AS BIGINT) AS n_pairs,
        |  CAST(round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(np AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS DOUBLE) AS autocorr
        |FROM m ORDER BY event_type, lag""".stripMargin,

    // truncate-to-second gaps are exact integers in both engines
    "events_gaps" ->
      """WITH g AS (SELECT user_id,
        |  date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap
        |  FROM events)
        |SELECT user_id, COUNT(gap) AS n_gaps, CAST(MAX(gap) AS BIGINT) AS max_gap_s,
        |  CAST(round(CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(gap) AS DOUBLE), 6) AS DOUBLE) AS avg_gap_s
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin,

    // 2-token grams as portable 48-bit hashes; 1-based inclusive slices
    "text_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |  CAST('0x' || substr(md5(array_to_string(l[i:i+1], ' ')), 1, 12) AS BIGINT) AS gh
        |  FROM t CROSS JOIN (SELECT unnest(generate_series(1, 120)) AS i) s
        |  WHERE i <= len(l) - 1),
        |fo AS (SELECT gh, MIN(doc_id) AS fd FROM g GROUP BY gh)
        |SELECT g.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN fo.fd = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(round(CAST(SUM(CASE WHEN fo.fd = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS novelty
        |FROM g JOIN fo USING (gh) GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    // the sim_topk window discipline restricted to the negative band
    "sim_hard_negatives" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id % 50 = 23),
         |s AS (SELECT probe_id, c.vec_id AS cand_id,
         |  round(${dotSql("pe", "c.embedding")}
         |    / (sqrt(${dotSql("pe", "pe")}) * sqrt(${dotSql("c.embedding", "c.embedding")})), 6) AS cos
         |  FROM p JOIN embeddings c ON c.vec_id <> p.probe_id),
         |b AS (SELECT probe_id, cand_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |  FROM s WHERE cos >= 0.05 AND cos < 0.2)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos
         |FROM b WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // staged (19,2)->(19,4) cast chain keeps both engines exact-int128;
    // skew denominator spelled m2*sqrt(m2) (pow is not correctly rounded)
    "agg_moments" ->
      """WITH m AS (SELECT o_orderstatus, COUNT(*) AS n,
        |  SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS s1,
        |  SUM(CAST(o_totalprice AS DECIMAL(19,2)) * CAST(o_totalprice AS DECIMAL(19,2))) AS s2,
        |  SUM(CAST(CAST(o_totalprice AS DECIMAL(19,2)) * CAST(o_totalprice AS DECIMAL(19,2)) AS DECIMAL(19,4))
        |    * CAST(o_totalprice AS DECIMAL(19,2))) AS s3
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
        |  CAST(round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS DOUBLE) AS mean_price,
        |  CAST(round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6) AS DOUBLE) AS stddev_price,
        |  CAST(round(
        |    (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 3 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 2 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |    / (((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
        |  AS DOUBLE) AS skewness
        |FROM m ORDER BY o_orderstatus""".stripMargin,

    // rates round to 6 BEFORE the drift subtraction (ranking invariance)
    "text_domain_drift" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'a' ELSE 'b' END AS grp,
        |  text FROM documents),
        |tot AS (SELECT
        |  SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS na,
        |  SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS nb FROM d),
        |td AS (SELECT DISTINCT doc_id, grp, unnest(string_split(text, ' ')) AS term FROM d),
        |dfs AS (SELECT term,
        |  SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS dfa,
        |  SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS dfb
        |  FROM td GROUP BY term),
        |rates AS (SELECT term,
        |  CAST(round(CAST(dfa AS DOUBLE) / CAST(tot.na AS DOUBLE), 6) AS DOUBLE) AS rate_a,
        |  CAST(round(CAST(dfb AS DOUBLE) / CAST(tot.nb AS DOUBLE), 6) AS DOUBLE) AS rate_b
        |  FROM dfs CROSS JOIN tot)
        |SELECT term, rate_a, rate_b,
        |  CAST(round(abs(rate_a - rate_b), 6) AS DOUBLE) AS drift
        |FROM rates ORDER BY drift DESC, term LIMIT 20""".stripMargin,

    // round-6-then-threshold: the keep decision tests identical values
    "sim_radius" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id % 50 = 7),
         |s AS (SELECT probe_id, c.vec_id AS cand_id,
         |  round(${dotSql("pe", "c.embedding")}
         |    / (sqrt(${dotSql("pe", "pe")}) * sqrt(${dotSql("c.embedding", "c.embedding")})), 6) AS cos
         |  FROM p JOIN embeddings c ON c.vec_id <> p.probe_id)
         |SELECT probe_id, cand_id, cos FROM s WHERE cos >= 0.2
         |ORDER BY probe_id, cos DESC, cand_id""".stripMargin,
  )
}
