package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Bands
import graft.core.{Tables => T}

/** LLM-training-data pipeline operators — SURVEY.md §2.2 "LLM-data-pipeline
  * extensions": deduplication (exact, shingle-Jaccard, MinHash+LSH,
  * SimHash, embedding-cosine), similarity search (brute-force and IVF
  * top-k), text analysis (stats, language-ID, quality scoring, token
  * counting, fingerprinting), and a multimodal join.
  *
  * The reference has none of this (its full statement surface is
  * insert/select, `/root/reference/db.cpp:428-441`); these are the
  * north-star operators a 100 TB training-data pipeline needs.
  *
  * Design rules:
  *   - Portable hashing: every hash is derived from `md5` hex (identical in
  *     Spark and DuckDB), so even MinHash/SimHash results are bit-equal and
  *     oracle-checkable — no engine-specific `hash()`/`xxhash64`.
  *   - No UDFs: everything is built-ins + higher-order functions, so the
  *     whole pipeline stays inside whole-stage codegen.
  *   - Planted variants: the harness corpus has no duplicates, so dedup
  *     queries union deterministic perturbed copies of a document slice
  *     (uppercased/padded → exact dups after normalization; last-2-tokens
  *     dropped → near dups) and must find exactly those.
  *   - Scale notes per operator: the quadratic exact variants are bounded
  *     to a small probe/variant side; MinHash-LSH and IVF are the 100 TB
  *     paths (candidate generation via equi-join on bucket keys — shuffle
  *     on bucket, never all-pairs).
  */
object LlmPipeline {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------- shared pieces

  /** 48-bit portable hash: first 12 hex digits of md5. The native
    * [[graft.expr.Md5Prefix48]] and DuckDB `CAST('0x…' AS BIGINT)` agree
    * exactly; 48 bits stays well inside a signed long for the affine
    * re-hash arithmetic below. */
  private def h48(c: Column): Column = graft.expr.Md5Prefix48.md548(c)
  private[ops] def h48Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 12) AS BIGINT)"

  /** MinHash family: K affine re-hashes of the 48-bit shingle hash modulo a
    * 31-bit prime. Multipliers < 2^14 keep a*h < 2^45 — no overflow.
    * Constants live in [[graft.expr.MinHashAgg]] (shared with the one-pass
    * aggregator and the SQL oracle). */
  private val (p0, k0, a0, b0) = graft.expr.MinHashAgg.params
  private val P = p0
  private val K = k0
  private val NBands = 8
  private val R = 4 // rows per band; NBands * R == K
  private val A: IndexedSeq[Long] = a0
  private val B: IndexedSeq[Long] = b0

  private val JaccThreshold = 0.7
  private val SimhashBits = 48
  private val HammingMax = 10

  /** DuckDB word-3-gram shingles (the Spark side shingles via
    * [[graft.api.TextDedup.shingleRows]] — a Generate-barrier shape). */
  private[ops] val shinglesSql =
    "list_transform(list_slice(list_zip(l, l[2:], l[3:]), 1, len(l)-2), x -> x[1] || ' ' || x[2] || ' ' || x[3])"

  /** Dedup corpus: documents ∪ planted exact-dup variants (doc_id%10==0 →
    * +100000, uppercased + padded: identical after lower/trim) ∪ planted
    * near-dup variants (doc_id%7==0 → +200000, last 2 tokens dropped). */
  private[graft] def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val exactVars = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(upper(col("text")), lit("  ")).as("text"))
    val toks = split(col("text"), " ")
    val nearVars = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 2), " ").as("text"))
    docs.unionByName(exactVars).unionByName(nearVars)
  }

  private[ops] val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000,
      |         array_to_string(list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 2), ' ')
      |  FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  private[ops] val shingleSetsSql =
    s"""tok AS (SELECT doc_id, string_split(text, ' ') l FROM corpus),
       |ssets AS (SELECT doc_id, list_distinct($shinglesSql) sset FROM tok WHERE len(l) >= 3)""".stripMargin

  // ------------------------------------------------------------ dedup: exact

  /** Exact dedup by normalized-text hash — [[graft.api.TextDedup.exact]]
    * on the planted-variant corpus. At 100 TB this is one hash-shuffle
    * groupBy — the canonical first dedup pass of any training pipeline. */
  val dedupExact: Q = (s, d) =>
    graft.api.TextDedup.exact(corpus(s, d), "doc_id", "text")
      .orderBy(col("kept_id"))

  // ---------------------------------------------- dedup: exact shingle Jaccard

  /** Near-dup detection by exact 3-gram Jaccard ≥ 0.7, planted variants vs
    * the full corpus — with AllPairs-style prefix filtering for candidate
    * generation (Bayardo et al., WWW'07): each distinct-shingle set is
    * sorted in a canonical global order (by 48-bit shingle hash) and only
    * its first |S| - ceil(t*|S|) + 1 shingles are exploded; any pair with
    * J >= t MUST share a prefix shingle (pigeonhole), so the equi-join on
    * prefix shingles is a guaranteed superset of the answer and the result
    * is byte-identical to the naive quadratic join. A size-ratio filter
    * (t*|B| <= |A| <= |B|/t, also exact) prunes candidates before the
    * exact-Jaccard verify. At 100 TB this is the shape that survives:
    * one hash shuffle on shingle, never all-pairs. */
  val dedupNear: Q = (s, d) => {
    val c = corpus(s, d)
    graft.api.TextDedup.jaccardJoin(
        c.filter(col("doc_id") % Bands.DocBand >= 200000L),
        c.filter(col("doc_id") % Bands.DocBand < 200000L),
        "doc_id", "text", JaccThreshold)
      .select(col("left_id").as("var_id"), col("right_id").as("base_id"),
        col("jacc"))
      .orderBy(col("var_id"), col("base_id"))
  }

  /** [[dedupNear]] with the hot-key salting path ACTIVE: any prefix
    * shingle whose right-side document frequency exceeds hotDf=8 is spread
    * deterministically over saltFactor=4 sub-keys (left rows pick one salt
    * by id hash, right rows replicate across all four), so no single
    * Zipfian stopword shingle can swallow a reducer. Salting is pure skew
    * mitigation — every pair still meets in exactly one salt bucket — so
    * the declared result is hash-identical to the UNSALTED oracle, which
    * is precisely what the correctness gate proves. */
  val dedupNearSalted: Q = (s, d) => {
    val c = corpus(s, d)
    graft.api.TextDedup.jaccardJoin(
        c.filter(col("doc_id") % Bands.DocBand >= 200000L),
        c.filter(col("doc_id") % Bands.DocBand < 200000L),
        "doc_id", "text", JaccThreshold, saltFactor = 4, hotDf = 8)
      .select(col("left_id").as("var_id"), col("right_id").as("base_id"),
        col("jacc"))
      .orderBy(col("var_id"), col("base_id"))
  }

  // ------------------------------------------------------- dedup: MinHash-LSH

  /** MinHash + LSH banding dedup — the 100 TB near-dup path
    * ([[graft.api.TextDedup.minhashPairs]]). K=32 hashes, 8 bands × 4
    * rows: P(candidate | J=0.7) ≈ 1-(1-0.7⁴)⁸ ≈ 0.90 per the standard
    * banding bound; candidates are exact-Jaccard-verified at ≥ 0.7, so
    * false positives cost only the verify join. Candidate generation is an
    * equi-join on (band, band-key) — never an all-pairs comparison. */
  val dedupMinhash: Q = (s, d) =>
    graft.api.TextDedup.minhashPairs(corpus(s, d), "doc_id", "text",
        JaccThreshold, NBands, R)
      .orderBy(col("a"), col("b"))

  /** INCREMENTAL MinHash dedup — the production pattern [[dedupMinhash]]
    * composes into at scale: the base corpus builds a persistable LSH
    * INDEX once (written to parquet here — a table in a real pipeline),
    * and each arriving batch (the planted truncated variants standing in
    * for a new crawl) probes ONLY the index: candidates from the
    * delta-bands ⋈ index equi-join, corpus text fetched just for the
    * candidate docs (semi-join prune BEFORE shingling), exact-Jaccard
    * verify. Batch cost is O(|delta| + |candidates|), never O(|corpus|) —
    * re-dedup of a 100 TB corpus per ingest batch is exactly what this
    * avoids. */
  val dedupIncremental: Q = (s, d) => {
    val idxDir =
      s"${sys.props("java.io.tmpdir")}/graft_io/dedup_incr_index"
    val base = T.documents(s, d).select(col("doc_id"), col("text"))
    graft.api.TextDedup.minhashIndex(base, "doc_id", "text", NBands, R)
      .write.mode("overwrite").parquet(idxDir)
    val toks = split(col("text"), " ")
    val delta = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 2), " ").as("text"))
    graft.api.TextDedup.minhashIncremental(s.read.parquet(idxDir), base,
        delta, "doc_id", "text", JaccThreshold, NBands, R)
      .orderBy(col("delta_id"), col("base_id"))
  }

  /** MINHASH ESTIMATOR AUDIT — the measurement that justifies the sketch
    * (the `sim_recall_audit` discipline applied to [[dedupMinhash]]): for
    * every LSH-banded candidate pair, the signature-agreement estimate of
    * Jaccard (matching positions / K — the unbiased MinHash estimator)
    * sits next to the EXACT shingle Jaccard and the absolute error. This
    * is the query a pipeline owner runs before trusting a threshold: it
    * turns "LSH found these pairs" into "and the 32-hash estimate is
    * within ε of truth on exactly this corpus".
    *
    * Determinism: the estimate is an integer count over K=32 positions
    * divided by 32 (a power of two — the division is exact in IEEE), the
    * exact Jaccard is the usual integer-ratio, and the error subtracts
    * the two ROUNDED values, so every column is engine-invariant.
    *
    * 100 TB shape: identical to `dedup_minhash` (per-row signatures, band
    * equi-join candidates, shuffled verify) plus one zip_with over two
    * 32-int arrays per candidate — audit cost rides the dedup plan. */
  val dedupMinhashAudit: Q = (s, d) => {
    val docs = corpus(s, d)
    val sigs = graft.api.TextDedup.minhashSignatures(docs, "doc_id", "text")
    val bands = graft.api.TextDedup.minhashIndex(docs, "doc_id", "text",
      NBands, R)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sets = graft.api.TextDedup.hashedShingleSets(docs, "doc_id", "text", 3)
    val est = size(filter(zip_with(col("siga"), col("sigb"),
        (x, y) => x === y), m => m)).cast("double") / 32.0
    val exact = graft.api.TextDedup.jaccard(col("sa"), col("sb"))
    cand.hint("shuffle_hash")
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("siga")), "a")
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sigb")), "b")
      .join(sets.select(col("doc_id").as("a"), col("sset").as("sa")), "a")
      .join(sets.select(col("doc_id").as("b"), col("sset").as("sb")), "b")
      .select(col("a"), col("b"),
        round(est, 6).as("est_jacc"), round(exact, 6).as("exact_jacc"))
      .withColumn("abs_err", round(abs(col("est_jacc") - col("exact_jacc")), 6))
      .orderBy(col("a"), col("b"))
  }

  /** SHARD MANIFEST — deterministic assignment of the corpus to N
    * training shards (the data-loader contract: every worker must
    * derive the SAME shard membership from the data alone, across
    * engines and reruns): shard = md5-48('shard:'||doc_id) mod 8, and
    * the manifest rows a loader validates against — per shard: docs,
    * tokens, chars, an order-independent 48-bit content checksum (exact
    * decimal sum of per-doc hashes), and the doc share. Hash assignment
    * (not round-robin) is what keeps shards stable under corpus appends
    * — the `sample_split` gate discipline applied to sharding.
    *
    * 100 TB shape: assignment and per-doc stats are map-side; ONE
    * 8-row-out aggregate crosses an exchange. The manifest is the cheap
    * half of `mm_shard` (which writes the actual WebDataset bytes). */
  val textShardManifest: Q = (s, d) => {
    val nShards = 8
    val docs = T.documents(s, d).select(col("doc_id"), col("text"),
      col("n_chars"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    docs
      .select((h48(concat(lit("shard:"), col("doc_id"))) % nShards)
          .as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        col("n_chars"), h48(col("text")).as("ch"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("ch").cast("decimal(20,0)")).as("checksum"))
      .crossJoin(broadcast(tot))
      // surface the checksum as BIGINT mod 2^61-1 (order-independent,
      // single-doc-sensitive) — a DECIMAL(20,0) column canonicalizes
      // differently across engines (the SURVEY §2.2 stable-type rule)
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("checksum").cast("decimal(38,0)") % lit(2305843009213693951L))
          .cast("bigint").as("checksum"),
        round(col("n_docs").cast("double") / col("n_total").cast("double"), 6)
          .as("share"))
      .orderBy(col("shard"))
  }

  // ---------------------------------------------------------- dedup: SimHash

  /** 48-bit SimHash near-dup pairs at Hamming ≤ 10
    * ([[graft.api.TextDedup.simhashPairs]]) via pigeonhole bit-block LSH:
    * 11 signature blocks, equi-join on (block, bits) for candidates, exact
    * `bit_count(xor)` verify — lossless (identical to all-pairs output)
    * and never quadratic, the shape that survives 100 TB. */
  val dedupSimhash: Q = (s, d) =>
    graft.api.TextDedup.simhashPairs(corpus(s, d), "doc_id", "text",
        HammingMax, SimhashBits)
      .orderBy(col("a"), col("b"))

  // ------------------------------------------------- embedding-cosine pieces

  /** Exact double-precision dot product of two float-array columns — the
    * native codegen'd [[graft.expr.FloatDotProduct]] (fused index-ascending
    * loop; bit-identical to the zip_with/aggregate HOF chain it replaces
    * and to DuckDB's positional-sum oracle). */
  private def dotp(x: Column, y: Column): Column =
    graft.expr.FloatDotProduct.fdot(x, y)

  /** Exact cosine between two float-array columns (norms recomputed —
    * use only where each side appears in O(1) pairs; the hot paths below
    * precompute a `norm` column per vector instead, so each candidate
    * pair costs ONE dot product, not three). */
  private def cosine(a: Column, b: Column): Column =
    dotp(a, b) / (sqrt(dotp(a, a)) * sqrt(dotp(b, b)))

  /** Attach the precomputed L2 norm: (id, vec) → (id, vec, norm). */
  private def withNorm(df: DataFrame, vec: String): DataFrame =
    df.withColumn("norm", sqrt(dotp(col(vec), col(vec))))

  /** DuckDB positional dot product over 64-dim float lists. */
  private[ops] def dotSql(a: String, b: String): String =
    s"(SELECT sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)) FROM range(1, 65) r(i))"
  private[ops] def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Embedding corpus with planted near-dup variants: vec_id%10==0 → copy
    * at +10000 scaled by 1.5f (cosine-invariant up to float rounding). */
  private[ops] def vecCorpus(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val vars = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.5f)).cast("float")).as("embedding"))
    e.unionByName(vars)
  }

  private[ops] val vecCorpusSql =
    """vcorpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000,
      |         list_transform(embedding, x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT))
      |  FROM embeddings WHERE vec_id % 10 = 0)""".stripMargin

  /** Embedding near-dup: planted variants vs the base set, cosine ≥ 0.999,
    * blocked through IVF centroid cells
    * ([[graft.api.VectorSearch.blockedThresholdJoin]]): base vectors
    * shard into their nearest cell, variants probe their 3 nearest cells,
    * candidates are the cell-equi-join — never |variants|·|corpus| — and
    * the exact cosine verifies. Near-identical vectors share a nearest
    * cell, so planted recall is 1.0 (asserted in LlmPipelineSpec). This is
    * the "new batch vs corpus" dedup shape that survives 100 TB. */
  val dedupEmbed: Q = (s, d) => {
    val vc = vecCorpus(s, d)
    val cents = T.embeddings(s, d)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))
    graft.api.VectorSearch.blockedThresholdJoin(
        vc.filter(col("vec_id") % Bands.VecBand >= 10000L),
        vc.filter(col("vec_id") % Bands.VecBand < 10000L),
        cents, "vec_id", "embedding", 0.999, nprobe = 3)
      .select(col("left_id").as("var_id"), col("right_id").as("base_id"),
        col("cos"))
      .orderBy(col("var_id"), col("base_id"))
  }

  /** Embedding near-dup via SIGN-LSH (random hyperplanes, Charikar
    * STOC'02) — the hyperplane-family twin of [[dedupEmbed]]'s IVF cells,
    * the same way the text side carries both MinHash bands and SimHash
    * blocks. Signature = 12 sign bits of rounded dot products against a
    * fixed broadcast plane set (the first 12 corpus vectors), banded
    * 3×4; candidates are the (band, bandKey) equi-join, verified by exact
    * cosine ≥ 0.999. Near-identical vectors (θ≈0) flip a bit with
    * probability θ/π per plane, so planted variants collide in every
    * band; random pairs must match 4 signs per band. Blocking is a
    * broadcast + map-side signature + one band-key shuffle — never
    * |variants|·|corpus|. */
  val dedupEmbedLsh: Q = (s, d) => {
    val vc = vecCorpus(s, d)
    val planes = T.embeddings(s, d).filter(col("vec_id") < 12)
      .select(col("vec_id"), col("embedding")) // vec_id < 12 IS dense 0-based
    graft.api.VectorSearch.signLshThresholdJoin(
        vc.filter(col("vec_id") % Bands.VecBand >= 10000L),
        vc.filter(col("vec_id") % Bands.VecBand < 10000L),
        planes, "vec_id", "vec_id", "embedding", 0.999, rowsPerBand = 4)
      .select(col("left_id").as("var_id"), col("right_id").as("base_id"),
        col("cos"))
      .orderBy(col("var_id"), col("base_id"))
  }

  // -------------------------------------------------------- decontamination

  /** Benchmark DECONTAMINATION — the training-pipeline stage that keeps
    * eval data out of the training set: a training shard is flagged when
    * it shares ≥ 1 distinct 13-token-gram with any benchmark document
    * (the n-gram-overlap rule used by GPT-3/PaLM-style decontam, n=13).
    *
    * Shard under test = the planted variants (doc_id ≥ 100000);
    * benchmark = the base documents that have planted derivatives
    * (doc_id%7==0 near / doc_id%10==0 exact). Both sides normalize
    * (lower/trim) before shingling, so the uppercased exact variants are
    * caught too. Grams hash through the portable md5-derived
    * [[graft.api.TextDedup.h48]].
    *
    * 100 TB shape: a benchmark set is small and FIXED (eval suites, not
    * corpus-sized), so its distinct gram set BROADCASTS; the corpus side
    * streams through a map-side hash join — no shuffle of corpus grams at
    * all — then one aggregate keyed on doc_id. Output: one row per
    * contaminated doc, (doc_id, n_gram_hits, n_eval_docs). */
  val dedupContaminate: Q = (s, d) => {
    val n = 13
    val norm = (df: DataFrame) => df.withColumn("text", lower(trim(col("text"))))
    val shard = norm(corpus(s, d).filter(col("doc_id") % Bands.DocBand >= 100000L))
    val bench = norm(
      T.documents(s, d).filter(col("doc_id") % 7 === 0 || col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), col("text")))
    val shardGrams = graft.api.TextDedup.shingleRows(shard, "doc_id", "text", n)
      .select(col("doc_id"), h48(col("sh")).as("hv"))
    val benchGrams = graft.api.TextDedup.shingleRows(bench, "eval_id", "text", n)
      .select(col("eval_id"), h48(col("sh")).as("hv")).distinct()
    shardGrams.join(broadcast(benchGrams), "hv")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("hv")).as("n_gram_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy(col("doc_id"))
  }

  /** BLOOM-GATED exact dedup of an arriving batch against the base corpus
    * — the cheapest member of the incremental-dedup family (next to
    * [[dedupIncremental]]'s LSH index): the base corpus folds into ONE
    * fixed-size bloom filter (a mergeable aggregate — map-side partials,
    * 2¹⁷ bits here regardless of corpus size), the filter broadcasts, and
    * the arriving batch drops every doc the bloom rules out BEFORE any
    * join. Survivors (true matches + bloom false positives) verify
    * against the base hash set by an exact equi-join, so the bloom is a
    * pure superset prefilter — result-invariant, which is exactly what
    * the oracle (a plain hash join, no bloom) pins. Uses the engine's
    * portable [[graft.expr.Bloom]] (same bit math both sides of
    * `join_bloom`). At 100 TB: bits scale with corpus NDV (~10 bits/key
    * for 1% fpp); the batch never shuffles except its surviving
    * candidates. */
  val dedupBloom: Q = (s, d) => {
    val c = corpus(s, d)
    def nh(t: Column): Column = h48(lower(trim(t)))
    val base = c.filter(col("doc_id") % Bands.DocBand < 100000L)
      .select(col("doc_id").as("base_id"), nh(col("text")).as("hv"))
    val batch = c.filter(col("doc_id") % Bands.DocBand >= 100000L)
      .select(col("doc_id"), nh(col("text")).as("hv"))
    val bloom = base.agg(graft.expr.Bloom.agg(col("hv"), 1 << 17, 5).as("bf"))
    val cand = batch.join(broadcast(bloom))
      .filter(graft.expr.Bloom.mightContain(col("bf"), col("hv")))
      .drop("bf")
    cand.join(base.hint("shuffle_hash"), "hv")
      .groupBy(col("doc_id"))
      .agg(min(col("base_id")).as("base_id"), count(lit(1)).as("n_base"))
      .orderBy(col("doc_id"))
  }

  /** URL-canonicalization dedup — the web-corpus front gate (CommonCrawl
    * pipelines dedup by canonical URL before any text ever loads): URLs
    * decorated with the classic noise (scheme/WWW case, `www.` prefix,
    * default `:443` port, trailing slash, `utm_*` tracking params,
    * fragments — planted deterministically from doc_id, the text_pii
    * discipline) normalize through a fixed regex chain to one canonical
    * form; grouping on it collapses every decoration variant of the same
    * resource. Pure per-row canonicalization (fused into the scan) + ONE
    * hash aggregate on the canonical key — `dedup_exact`'s shape with a
    * normalizer instead of a text hash. The regex chain is RE2-common
    * syntax, identical in both engines (DuckDB needs the 'g' flag; Spark
    * replaces all by default). */
  val dedupUrl: Q = (s, d) => {
    val pk = (col("doc_id") % 100L).cast("string")
    val raw = concat(
      when(col("doc_id") % 4 === 0, lit("HTTPS://")).otherwise(lit("https://")),
      when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
      col("source"), lit(".Example.com"),
      when(col("doc_id") % 7 === 0, lit(":443")).otherwise(lit("")),
      lit("/docs/"), pk,
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 2 === 0, lit("?utm_source=feed&utm_campaign=x"))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0, lit("#sec2")).otherwise(lit("")))
    def canon(u0: Column): Column = {
      var u = lower(u0)
      u = regexp_replace(u, "#.*$", "")            // fragment
      u = regexp_replace(u, "[?&]utm_[^&#]*", "")  // tracking params
      u = regexp_replace(u, "\\?&", "?")           // ?& left by a leading utm
      u = regexp_replace(u, "\\?$", "")            // empty query
      u = regexp_replace(u, "://www\\.", "://")    // www prefix
      u = regexp_replace(u, ":443/", "/")          // default https port
      regexp_replace(u, "/$", "")                  // trailing slash
    }
    T.documents(s, d)
      .withColumn("url", raw)
      .withColumn("curl", canon(col("url")))
      .groupBy(col("curl"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_variants"),
        min(col("doc_id")).as("rep_doc_id"))
      .orderBy(col("curl"))
  }

  // ------------------------------------------------------- similarity search

  /** Brute-force exact cosine top-5 for a fixed probe set (vec_id < 10) —
    * the correctness baseline for ANN. The probe side broadcasts; the
    * candidate scan is embarrassingly parallel; per-probe top-k is a
    * partitioned window, no global sort. */
  val simTopk: Q = (s, d) => {
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    graft.api.VectorSearch.topK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Exact MAXIMUM-INNER-PRODUCT top-5 over the planted-variant corpus —
    * the dot-product retrieval order ([[simTopk]] ranks by cosine; MIPS
    * is what dual-encoder/recommender models actually score with, and the
    * orders genuinely differ: a 1.5×-scaled variant's dot against any
    * candidate is 1.5× its base probe's, so norm — not just alignment —
    * decides rank). Ranked on the round-6 dot (ties → cand_id), the
    * engine-reproducible total order. Probe side broadcasts; the
    * candidate scan stays embarrassingly parallel. */
  val simTopkMips: Q = (s, d) => {
    val e = vecCorpus(s, d)
    graft.api.VectorSearch.mipsTopK(
        e.filter(col("vec_id") % Bands.VecBand >= 10000L),
        e.filter(col("vec_id") % Bands.VecBand < 10000L),
        "vec_id", "embedding", k = 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** PQ-ADC top-k SEARCH (Jégou et al., PAMI'11 §III) — the query half
    * of [[embedPq]]'s encoder, and the memory-bounded ANN path: the
    * corpus is represented ONLY by its 4 sub-space codes; a probe scans
    * codes via an ASYMMETRIC DISTANCE lookup table (probe-to-codeword
    * partial L2 per (sub, codeword) — 16 integers per probe), takes the
    * top-12 candidates by table-sum, and re-ranks just those 12 against
    * the exact vectors for the final top-3. Everything is exact integer
    * micro-unit L2 (ties → lowest vec_id), so approximate AND exact
    * stages are engine-reproducible; the reported adc_d2/d2 pair is the
    * compression-error evidence next to [[simRecallAudit]]'s recall.
    *
    * 100 TB shape: codebook and ADC tables are O(probes·16) —
    * BROADCAST; the corpus contributes one code-join + one
    * (probe, vec) partial-agg pass (map-side combine, ×4 rows per
    * vector, never the 64 raw dims); only ≤ 12 candidates per probe
    * ever touch full vectors again. The full-vector corpus never joins
    * itself — the [[api.VectorSearch]] discipline. */
  val simTopkPq: Q = (s, d) => {
    val micro = T.embeddings(s, d).select(col("vec_id"),
      posexplode(expr("transform(embedding," +
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"))
        .as(Seq("dim", "qd")))
      .withColumn("sub", col("dim") - pmod(col("dim"), lit(16)))
    val seeds = T.embeddings(s, d).select(col("vec_id"))
      .orderBy(col("vec_id")).limit(4)
    val cents = micro.join(broadcast(seeds), Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("dim"), col("qd").as("cv"))
    val d2c = micro.join(broadcast(cents), Seq("dim"))
      .groupBy(col("vec_id"), col("sub"), col("cid"))
      .agg(sum((col("qd") - col("cv")) * (col("qd") - col("cv"))).as("cd2"))
    val wMin = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("cd2"), col("cid"))
    val codes = d2c.withColumn("rnk", row_number().over(wMin))
      .filter(col("rnk") === 1).select(col("vec_id"), col("sub"), col("cid"))
    val probes = micro.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("dim"), col("qd").as("pd"))
    val adc = probes.join(broadcast(cents), Seq("dim"))
      .groupBy(col("probe_id"),
        (col("dim") - pmod(col("dim"), lit(16))).as("sub"), col("cid"))
      .agg(sum((col("pd") - col("cv")) * (col("pd") - col("cv"))).as("pd2"))
    val approx = codes.join(broadcast(adc), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
    val wCand = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_d2"), col("vec_id"))
    val cand = approx.withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= 12).drop("crk")
    // cand is <= 12*|probes| rows by the crk filter, but it sits behind a
    // window so Catalyst can't see the bound — at sf3 the estimate crossed
    // the autoBroadcast threshold and this join sort-merged the WHOLE
    // corpus-dim stream (the r13 sweep residual). The hint is size-stable:
    // the bound is the query's own top-k contract, valid at every SF.
    val exact = broadcast(cand)
      .join(micro.select(col("vec_id"), col("dim"), col("qd")), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id", "dim"))
      .groupBy(col("probe_id"), col("vec_id"), col("adc_d2"))
      .agg(sum((col("qd") - col("pd")) * (col("qd") - col("pd"))).as("d2"))
    val wFin = Window.partitionBy(col("probe_id"))
      .orderBy(col("d2"), col("vec_id"))
    exact.withColumn("rnk", row_number().over(wFin))
      .filter(col("rnk") <= 3)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id"), col("adc_d2"), col("d2"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** IVF (inverted-file) approximate top-k — the 100 TB similarity path:
    * vectors are partitioned into centroid cells (assignment = nearest of
    * 10 fixed centroids, an equi-joinable cell id), and each probe searches
    * only its nprobe=3 nearest cells. Exactly the shape of a distributed
    * IVF index: cell assignment is a broadcast join + argmin, search is an
    * equi-join on cell id — never a full cross join. */
  val simTopkIvf: Q = (s, d) => {
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    graft.api.VectorSearch.ivfTopK(
        probes = e.filter(col("vec_id") < 10), cands = e,
        cents = e.filter(col("vec_id") % 50 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Corpus-self k-NN JOIN — every embedding finds its 3 approximate
    * nearest neighbours among all the others via
    * [[graft.api.VectorSearch.knnJoin]]: ONE broadcast-centroid argmin
    * pass ranks each vector's 3 nearest IVF cells; rank-1 rows shard the
    * corpus into cells, rank ≤ 3 rows are the probe replicas, and
    * candidates meet probes in a shuffled cell equi-join. This is the
    * batch kNN-graph build (the precursor of embedding-cluster dedup and
    * graph-ANN indexes): where `sim_topk_ivf` answers a bounded probe
    * batch, this one scales with the corpus itself — still never |N|². */
  val simKnnJoin: Q = (s, d) => {
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    graft.api.VectorSearch.knnJoin(e,
        cents = e.filter(col("vec_id") % 50 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3, nprobe = 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** MATRYOSHKA TRUNCATION AUDIT (Kusupati et al., NeurIPS'22 — MRL
    * embeddings serve their PREFIX as a cheaper vector): for each probe,
    * the top-1 neighbour under the first-16 and first-32 dims versus the
    * full 64, plus agreement flags — the retrieval-quality check a team
    * runs before switching ANN search to truncated vectors (agreement
    * rate ≈ how much recall the cheap prefix keeps). One pass: the probe
    * set broadcasts, all three prefix cosines compute per candidate row
    * (native `float_dot` on array slices — index-ascending double
    * accumulation, same bit discipline as `sim_topk`), and the per-k
    * winner is a lexicographic struct-max aggregate (highest cosine,
    * lowest cand tie-break) — NO window over the candidate stream, so
    * the only shuffle is the k-independent probe-keyed aggregate. */
  val embedMatryoshka: Q = (s, d) => {
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    def cosK(k: Int): Column = {
      val a = slice(col("pe"), 1, k)
      val b = slice(col("ce"), 1, k)
      round(dotp(a, b) / (sqrt(dotp(a, a)) * sqrt(dotp(b, b))), 6)
    }
    def win(c: Column): Column = max(struct(c.as("c"), (-col("cand_id")).as("n")))
    val agg0 = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(probes))
      .filter(col("cand_id") =!= col("probe_id"))
      .groupBy(col("probe_id"))
      .agg(win(cosK(16)).as("m16"), win(cosK(32)).as("m32"),
        win(cosK(64)).as("m64"))
    agg0.select(col("probe_id"),
      (-col("m16.n")).as("top1_16"), col("m16.c").as("cos_16"),
      (-col("m32.n")).as("top1_32"), col("m32.c").as("cos_32"),
      (-col("m64.n")).as("top1_64"), col("m64.c").as("cos_64"),
      (col("m16.n") === col("m64.n")).as("agree_16"),
      (col("m32.n") === col("m64.n")).as("agree_32"))
      .orderBy(col("probe_id"))
  }

  /** ANN RECALL AUDIT — the quality gate that justifies the IVF
    * approximation (`sim_topk_ivf`) against ground truth (`sim_topk`):
    * per probe, how many of the exact top-5 the cell-routed search
    * recovered (recall@5). Composes the two existing declared paths and
    * joins them — the measurement EVERY approximate index needs before
    * production traffic moves to it; nprobe is tuned by re-running this
    * audit, not by faith. The probe set is bounded, so both sides and
    * the audit join are probe-keyed small frames; at 100 TB the exact
    * side runs on a SAMPLED probe set (the standard recall-estimation
    * protocol) while the IVF side is the production path. */
  val simRecallAudit: Q = (s, d) => {
    val exact = simTopk(s, d).select(col("probe_id"), col("cand_id"))
    val approx = simTopkIvf(s, d)
      .select(col("probe_id").as("p2"), col("cand_id").as("c2"))
    exact.join(approx,
        col("probe_id") === col("p2") && col("cand_id") === col("c2"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("c2").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("probe_id"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact").cast("double"), 6)
          .as("recall"))
      .orderBy(col("probe_id"))
  }

  /** DEDUP SAVINGS REPORT — the accounting every dedup run publishes
    * (what did the pipeline actually reclaim?): [[dedupCluster]]'s
    * components joined back to corpus byte sizes, rolled up per cluster
    * into kept/dropped doc counts, bytes reclaimed and the savings
    * share. The report is one model-sized aggregate on the component
    * table (dedup output is clustered docs only, never corpus-scale). */
  val dedupReport: Q = (s, d) => {
    val sizes = corpus(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    dedupCluster(s, d)
      .join(sizes, "doc_id")
      .groupBy(col("cluster_root"))
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) - 1L).as("n_dropped"),
        sum(when(col("doc_id") =!= col("cluster_root"), col("n_chars"))
          .otherwise(0L)).as("bytes_dropped"),
        sum(col("n_chars")).as("bytes_total"))
      .select(col("cluster_root"), col("n_docs"), col("n_dropped"),
        col("bytes_dropped"), col("bytes_total"),
        round(col("bytes_dropped").cast("double")
          / col("bytes_total").cast("double"), 6).as("savings_pct"))
      .orderBy(col("cluster_root"))
  }

  /** Scalar INT8 quantization of the embedding corpus — the memory lever
    * behind every large ANN deployment (4× smaller vectors than float32 →
    * 4× more candidates per executor, and SIMD-friendly integer distance).
    * Classic min-max scheme: per-DIMENSION corpus min/max (one fixed-size
    * aggregate — d rows regardless of corpus size), folded into a single
    * 1-row model of ordered (mns, mxs) arrays that BROADCASTS back; each
    * vector then quantizes map-side with a codegen'd HOF —
    * `floor((x - mn_i) * 255 / (mx_i - mn_i))` clamped to [0, 255] — so
    * the only data shuffle is the final per-label checksum aggregate.
    * Every arithmetic step is one fixed IEEE double op sequence and the
    * codes/checksums are integers — bit-identical across engines, which
    * is exactly what the oracle hash-checks. Constant dimensions
    * (mx == mn) quantize to 0 by convention. */
  val embedQuantize: Q = (s, d) => {
    val e = T.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val model = e
      .select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx"))))
        .as("st"))
      .select(transform(col("st"), r => r.getField("mn")).as("mns"),
        transform(col("st"), r => r.getField("mx")).as("mxs"))
    e.crossJoin(broadcast(model))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), (xf, i) => {
          val mn = element_at(col("mns"), i + lit(1))
          val mx = element_at(col("mxs"), i + lit(1))
          when(mx > mn,
            least(lit(255.0), greatest(lit(0.0),
              floor((xf.cast("double") - mn) * lit(255.0) / (mx - mn))))
              .cast("long"))
            .otherwise(lit(0L))
        }).as("codes"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(aggregate(col("codes"), lit(0L), (a, c) => a + c)).as("sum_codes"),
        min(array_min(col("codes"))).as("min_code"),
        max(array_max(col("codes"))).as("max_code"))
      .orderBy(col("label"))
  }

  // ----------------------------------------------------------- text analysis

  /** Corpus statistics per (lang, source): doc counts, exact char sums,
    * token totals, distinct vocabulary. One shuffle on the group key;
    * countDistinct expands but the group space is tiny. */
  val textStats: Q = (s, d) => {
    val docs = T.documents(s, d)
    val docStats = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
    val tokStats = docs
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_vocab"))
    docStats.join(tokStats, Seq("lang", "source"))
      .orderBy(col("lang"), col("source"))
  }

  /** Marker-token language-ID heuristic: count hits from a tiny English
    * marker lexicon; ≥ 2 hits → 'en'. (Real pipelines use char-n-gram
    * models; the relational shape — per-doc score + argmax — is what
    * matters here.) */
  val textLang: Q = (s, d) => {
    val toks = split(col("text"), " ")
    T.documents(s, d)
      .withColumn("en_score",
        size(filter(toks, x => x.isin("the", "a", "data", "value")))
          .cast("long"))
      .withColumn("predicted",
        when(col("en_score") >= 2, "en").otherwise("und"))
      .select(col("doc_id"), col("lang"), col("predicted"), col("en_score"),
        (col("predicted") === col("lang")).as("agree"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc quality scoring: length, token, stopword and alpha-character
    * ratios folded into a [0,1] composite — the filter stage of a
    * training-data pipeline, fully codegen'd scalar math. */
  val textQuality: Q = (s, d) => {
    val toks = split(col("text"), " ")
    T.documents(s, d)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("stop_ratio",
        size(filter(toks, x => x.isin("the", "a", "value", "data")))
          .cast("double") / col("n_tok").cast("double"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")).cast("double"))
      .withColumn("score", round(
        lit(0.3) * least(lit(1.0), col("n_tok").cast("double") / 100.0) +
          lit(0.4) * (lit(1.0) - col("stop_ratio")) +
          lit(0.3) * col("alpha_ratio"), 6))
      .select(col("doc_id"), col("n_tok"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(col("alpha_ratio"), 6).as("alpha_ratio"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic TRAIN/VAL/TEST SPLIT manifest — the reproducibility
    * primitive every training run depends on: each doc's fate is a pure
    * row property (portable md5-48 of a salted key, mod 100 → bucket 0 =
    * val, 1 = test, else train — a 98/1/1 split), so the assignment is
    * identical across engines, partitionings, reruns and corpus
    * APPENDS (an existing doc never changes split when new docs arrive —
    * the property a random split lacks, and the leakage guard a
    * held-out set needs). Declared output = the split manifest (docs,
    * tokens, id range per split); the gate itself is a scan-fused
    * projection, the manifest one 3-group aggregate. */
  val sampleSplit: Q = (s, d) => {
    val bucket = h48(concat(lit("split:"), col("doc_id").cast("string"))) % 100L
    val fate = when(bucket === 0L, "val")
      .when(bucket === 1L, "test").otherwise("train")
    T.documents(s, d)
      .withColumn("split", fate)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"))
  }

  /** OOV-RATE audit against the frozen top-V vocabulary — the
    * tokenizer-coverage check between vocabulary induction
    * (`text_bpe_pairs`) and LM scoring (`text_unigram_lm`, which uses
    * the same bounded top-V recipe): vocab = top-256 corpus tokens
    * under the deterministic (count desc, token asc) total order; per
    * doc, the share of tokens outside it. High OOV = encoding blowup
    * at training time — the audit runs BEFORE the tokenizer is frozen.
    * The vocab is bounded → BROADCAST; the token stream left-joins it
    * map-side and re-aggregates on doc_id — the `dedup_contaminate`
    * broadcast-membership shape. */
  val textOovRate: Q = (s, d) => {
    val toks = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(256)
      .select(col("tok"), lit(1L).as("iv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** LINEAR QUALITY CLASSIFIER — the fasttext-style learned filter one
    * step up from [[textQuality]]'s hand-tuned score (the
    * CCNet/DCLM-shaped gate: engineer features, apply a FROZEN weight
    * vector, keep above the decision boundary): five per-doc features
    * (length saturation, stopword ratio, alpha ratio, mean word length,
    * digit ratio) each ROUND to 6 decimals — the portability firewall:
    * the linear form is then a fixed IEEE multiply-add sequence over
    * identical inputs in both engines — then z = w·x + b decides
    * keep/drop on the UNROUNDED margin (z > 0 ⟺ p > 0.5 exactly; no
    * threshold-on-rounded-value edge). The sigmoid probability is
    * reported rounded 6 (libm exp, the text_perplexity convention). Pure
    * per-row expressions fused into the scan — at 100 TB the classifier
    * costs a projection, nothing more. */
  val textQualityLr: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    def r6(c: Column): Column = round(c, 6)
    T.documents(s, d)
      .withColumn("x_len", r6(least(lit(1.0), nTok.cast("double") / 100.0)))
      .withColumn("x_stop", r6(
        size(filter(toks, x => x.isin("the", "a", "value", "data")))
          .cast("double") / nTok.cast("double")))
      .withColumn("x_alpha", r6(
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")).cast("double")))
      .withColumn("x_wlen", r6(
        length(regexp_replace(col("text"), " ", "")).cast("double") /
          nTok.cast("double")))
      .withColumn("x_digit", r6(
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
          length(col("text")).cast("double")))
      .withColumn("z",
        lit(-1.5) + lit(2.1) * col("x_len") - lit(3.0) * col("x_stop")
          + lit(1.8) * col("x_alpha") + lit(0.12) * col("x_wlen")
          - lit(2.5) * col("x_digit"))
      .select(col("doc_id"), col("x_len"), col("x_stop"), col("x_alpha"),
        col("x_wlen"), col("x_digit"), round(col("z"), 6).as("z"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p_keep"),
        (col("z") > 0.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** CURRICULUM sampling — the quality-weighted data-mix step between
    * scoring and training: docs tier by their [[textQuality]] score
    * (fixed thresholds — at 100 TB thresholds come from a one-off
    * quantile profile, then stay FROZEN so the mix is reproducible), each
    * tier keeps a deterministic hash-sampled fraction (high 100%, mid
    * 40%, low 10% — the same `md5_48` keep/drop fate as `sample_hash`,
    * stable under repartitioning and corpus growth), and every kept doc
    * carries its inverse-rate weight for loss reweighting. One pass, zero
    * shuffles before the declared sort: score, tier, rate and the hash
    * gate are all per-row codegen'd expressions fused into the scan. */
  /** Curriculum KEPT-set CTE chain (DuckDB dialect), ending at
    * `kept(doc_id, tier, rate)` — the oracle body of [[textCurriculum]],
    * reused by `sample_ess` ([[Frontier2]]) so the audited sample is BY
    * CONSTRUCTION the curriculum's own. */
  private[ops] val curriculumKeptSql: String =
    """scored AS (
      |  SELECT doc_id, round(
      |    0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
      |    + 0.4 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'a', 'value', 'data'))) AS DOUBLE)
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |    + 0.3 * CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
      |        / CAST(length(text) AS DOUBLE), 6) AS score
      |  FROM documents),
      |tiered AS (
      |  SELECT doc_id,
      |    CASE WHEN score >= 0.8 THEN 'high'
      |         WHEN score >= 0.7 THEN 'mid' ELSE 'low' END AS tier
      |  FROM scored),
      |rated AS (
      |  SELECT doc_id, tier,
      |    CASE tier WHEN 'high' THEN 100 WHEN 'mid' THEN 40 ELSE 10 END AS rate
      |  FROM tiered),
      |kept AS (
      |  SELECT doc_id, tier, rate FROM rated
      |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |          AS BIGINT) % 100 < rate)""".stripMargin

  val textCurriculum: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val score = round(
      lit(0.3) * least(lit(1.0), size(toks).cast("double") / 100.0) +
        lit(0.4) * (lit(1.0) -
          size(filter(toks, x => x.isin("the", "a", "value", "data")))
            .cast("double") / size(toks).cast("double")) +
        lit(0.3) * (length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast("double") / length(col("text")).cast("double")), 6)
    T.documents(s, d)
      .withColumn("score", score)
      .withColumn("tier",
        when(col("score") >= 0.8, "high")
          .when(col("score") >= 0.7, "mid").otherwise("low"))
      .withColumn("rate",
        when(col("tier") === "high", 100)
          .when(col("tier") === "mid", 40).otherwise(10))
      .filter(graft.expr.Md5Prefix48.md548(
        concat_ws("|", col("doc_id"))) % 100 < col("rate"))
      .select(col("doc_id"), col("tier"),
        (lit(100.0) / col("rate").cast("double")).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** Token counting two ways: whitespace split vs regex word extraction vs
    * a BPE-ish bounded-chunk split (≤ 4 chars per piece). */
  val textTokens: Q = (s, d) =>
    T.documents(s, d)
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("re_tokens",
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long"))
      .withColumn("bpe_ish",
        regexp_count(col("text"), lit("[a-z0-9]{1,4}")).cast("long"))
      .select(col("doc_id"), col("ws_tokens"), col("re_tokens"), col("bpe_ish"))
      .orderBy(col("doc_id"))

  /** Canonical text normalization — the first stage of every training-data
    * pipeline: lowercase, trim, collapse runs of whitespace, then drop
    * stopword tokens ('a'/'the') and empties via an array HOF. Pure per-row
    * codegen'd work (no shuffle at all until the declared ORDER BY); at
    * 100 TB this runs at scan speed. */
  val textNormalize: Q = (s, d) => {
    val toks = filter(
      split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "),
      t => !t.isin("a", "the") && t =!= "")
    T.documents(s, d)
      .withColumn("toks", toks)
      .select(col("doc_id"), array_join(col("toks"), " ").as("norm_text"),
        size(col("toks")).cast("long").as("n_tokens_norm"))
      .orderBy(col("doc_id"))
  }

  /** PII regexes — shared between the DataFrame path, the Spark-SQL text
    * and the DuckDB oracle. Restricted to syntax Java regex and RE2 parse
    * identically (char classes, bounded repeats, `\b`, no backrefs). */
  val PiiEmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PiiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhoneRe = "\\b555-\\d{3}-\\d{4}\\b"

  /** PII detection + redaction — the scrubbing stage every training-data
    * pipeline runs before anything else sees the text (emails, IPv4s,
    * phone numbers → typed placeholders). The harness corpus is synthetic
    * token soup with no PII, so the query PLANTS deterministic PII derived
    * from table values (doc_id%3 → an email, %4 → an IP, %5 → a phone —
    * built identically in the oracle SQL), then counts and redacts it
    * with engine-portable regexes. Redaction order matters and is fixed:
    * email → IP → phone (an email contains dots that the IP pattern must
    * never see first).
    *
    * 100 TB shape: pure per-row codegen'd regex work, zero shuffles before
    * the declared sort — runs at scan speed next to `text_normalize`. */
  val textPii: Q = (s, d) => {
    val idS = col("doc_id").cast("string")
    val pii = T.documents(s, d).select(col("doc_id"), col("source"), col("text"))
      .withColumn("ptext", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact "), col("source"), idS, lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit("."),
            ((col("doc_id") * 7) % 256).cast("string"), lit("."),
            ((col("doc_id") * 13) % 256).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"), (col("doc_id") % 900 + 100).cast("string"),
            lit("-"), (col("doc_id") % 9000 + 1000).cast("string")))
          .otherwise(lit(""))))
    pii
      .withColumn("n_emails", regexp_count(col("ptext"), lit(PiiEmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(col("ptext"), lit(PiiIpRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col("ptext"), lit(PiiPhoneRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("ptext"), PiiEmailRe, "<EMAIL>"),
            PiiIpRe, "<IP>"),
          PiiPhoneRe, "<PHONE>"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Repetition signals (the Gopher/C4-style quality gates): per-doc
    * type-token ratio and the frequency share of the most repeated word
    * bigram. Bigrams are built once per doc with a sequence/transform HOF,
    * then exploded; both aggregations key on doc_id, so every shuffle is
    * per-document — no cross-doc skew beyond document length. */
  val textRepetition: Q = (s, d) => {
    val docs = T.documents(s, d)
      .withColumn("l", split(col("text"), " "))
      .withColumn("n", size(col("l")).cast("long"))
    val stats = docs.select(col("doc_id"), col("n"),
      round(size(array_distinct(col("l"))).cast("double") /
        col("n").cast("double"), 4).as("ttr"))
    val bigrams = docs.select(col("doc_id"), col("n"),
      explode(transform(sequence(lit(1), size(col("l")) - 1),
        i => concat_ws(" ", element_at(col("l"), i),
          element_at(col("l"), i + 1)))).as("bg"))
    val mx = bigrams.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mc"))
    stats.join(mx, "doc_id")
      .select(col("doc_id"), col("n").as("n_tokens"), col("ttr"),
        round(col("mc").cast("double") /
          (col("n") - 1).cast("double"), 4).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top terms: per (doc, term) score tf * ln((N+1)/(df+1)), top-3
    * terms per doc (score desc, term asc — total order). Two shuffles:
    * term explode → (doc, term) counts, then df per term joined back;
    * the document-count N is a broadcast scalar. The ranking happens on
    * round(score, 6) so cross-engine libm ulp differences cannot flip
    * ranks. */
  val textTfidf: Q = (s, d) => {
    val docs = T.documents(s, d)
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        log((col("n_total") + 1).cast("double") / (col("df") + 1)), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Unigram language-model scoring — the perplexity-filter stage of a
    * training pipeline (the KenLM gate, reduced to its relational shape):
    * corpus unigram counts → a BOUNDED top-V vocabulary (V=24 of the
    * corpus's 31 token types here, standing in for top-1M at scale; ties
    * broken (count desc, token asc) so the vocab is deterministic) →
    * per-token Laplace-smoothed log-probs, OOV tokens scored by the
    * shared ln(1/(N+V+1)) floor → per-doc mean log-prob.
    *
    * Float discipline: each log-prob is rounded to 8 decimals BEFORE the
    * exact decimal sum (engine libm ulp differences vanish; the sum is
    * order-independent), and the mean divides once in double.
    *
    * 100 TB shape: token counts are one hash shuffle; the vocab is
    * top-V BOUNDED so it broadcasts (map-side join against the token
    * stream — the corpus never shuffles for scoring); the per-doc mean
    * keys on doc_id. */
  val textUnigramLm: Q = (s, d) => {
    val docs = T.documents(s, d)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("tok")).limit(24)
    val scal = counts.agg(sum(col("c")).as("n_total"),
      (least(count(lit(1)), lit(24L)) + 1L).as("v_size"))
    val logp = round(
      log((coalesce(col("c"), lit(0L)) + 1L).cast("double") /
        (col("n_total") + col("v_size")).cast("double")), 8)
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        when(col("c").isNull, 1L).otherwise(0L).as("oov"),
        logp.cast("decimal(20,8)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("oov")).as("n_oov"),
        // Σlp is an exact DECIMAL(·,8); ×1e8 is an exact integer. The
        // 6-decimal mean then rounds in INTEGER arithmetic (half-up away
        // from zero) — a double `round(Σ/n, 6)` can land on a decimal
        // half, where Spark's BigDecimal HALF_UP and an engine that
        // rounds `x*1e6` in binary disagree by 1 ulp (bit us at one sf).
        (sum(col("lp")) * 100000000L).cast("long").as("s8"))
      .withColumn("mean_micro", expr(
        """CASE WHEN s8 >= 0 THEN (s8 * 2 + n_tok * 100) DIV (n_tok * 200)
          |     ELSE -((-s8 * 2 + n_tok * 100) DIV (n_tok * 200)) END""".stripMargin))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        (col("mean_micro").cast("double") / 1e6).as("mean_logp"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model scoring — the conditional-probability
    * companion of [[textUnigramLm]]: corpus bigram counts give add-one
    * smoothed P(w2|w1), each doc scores the exact-integer mean log-prob of
    * its own bigrams. A low mean flags incoherent token soup the unigram
    * model can't see (every word common, transitions never attested).
    *
    * Scale: the bigram table is DATA-DEPENDENT (can be huge at 100 TB), so
    * counts join back by SHUFFLE on the bigram key — deliberately not a
    * forced broadcast; AQE may still choose one when the table is small.
    * The lead() window partitions by doc. Same integer-mean rounding
    * discipline as the unigram scorer (see comment there). */
  val textBigramLm: Q = (s, d) => {
    val toks = T.documents(s, d).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("w2", lead(col("tok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("w2"))
    val bg = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = bigrams.agg((countDistinct(col("w2")) + 1L).as("v"))
    val logp = round(
      log((col("c12") + 1L).cast("double") /
        (col("c1") + col("v")).cast("double")), 8)
    bigrams.join(bg, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), logp.cast("decimal(20,8)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")) * 100000000L).cast("long").as("s8"))
      .withColumn("mean_micro", expr(
        """CASE WHEN s8 >= 0 THEN (s8 * 2 + n_bigrams * 100) DIV (n_bigrams * 200)
          |     ELSE -((-s8 * 2 + n_bigrams * 100) DIV (n_bigrams * 200)) END""".stripMargin))
      .select(col("doc_id"), col("n_bigrams"),
        (col("mean_micro").cast("double") / 1e6).as("mean_logp"))
      .orderBy(col("doc_id"))
  }

  /** KNESER-NEY smoothed bigram scoring — the LM-quality upgrade over
    * [[textBigramLm]]'s add-one smoothing (absolute discounting with a
    * CONTINUATION-probability backoff: a word seen after many distinct
    * contexts backs off high even when rare overall — the standard
    * n-gram smoothing since Kneser & Ney 1995, the KenLM default):
    *   P(w2|w1) = (c12 − D)/c1 + (D·N₁₊(w1·)/c1) · (N₁₊(·w2)/B)
    * with discount D = 0.75, N₁₊(w1·) = distinct successors of w1,
    * N₁₊(·w2) = distinct predecessors of w2, B = distinct bigram types.
    * Tokens map to the [[textPerplexity]] bounded top-V vocabulary
    * (V=[[PplVocab]], `<unk>` tail) BEFORE counting, so every model
    * table is O(V²) and every scored bigram is attested (c12 ≥ 1 —
    * the discount never clamps). Per-doc observable: bigram count +
    * integer-micro mean log-prob + the 6-rounded KN perplexity.
    *
    * Float discipline: all counts exact; p evaluates in one fixed IEEE
    * expression shape, log-probs round to 8 before the exact decimal
    * sum, the mean rounds in integer micro-units ([[textUnigramLm]]).
    *
    * 100 TB shape: identical to the bounded perplexity gate — one
    * type-grain shuffle for vocab, one doc window, bigram/successor/
    * predecessor models all ≤ (V+1)² rows → broadcast probes; one
    * doc_id shuffle for the mean. */
  val textKneserNey: Q = (s, d) => {
    val toks = T.documents(s, d).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("tok")).limit(PplVocab)
      .select(col("tok"), lit(1L).as("inv"))
    val m = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("inv").isNull, lit("<unk>")).otherwise(col("tok")).as("mtok"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = m
      .withColumn("w2", lead(col("mtok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("mtok").as("w1"), col("w2"))
    // MATERIALIZE the bigram model once (round 13): bg is vocab-bounded
    // (≤ (V+1)² = 625 rows) but feeds FIVE consumers (c1/n1p/pcont/btypes
    // + the probe join) — composed lazily, each consumer re-derived the
    // corpus explode + doc window behind it (the formatted plan showed 8
    // corpus scans / 4 windows; the graph_louvain_multi lesson). One
    // model-sized checkpoint barrier cuts the corpus passes to 2 (model
    // build + probe scan) — measured 2.2 → 1.2 s settled at the driver
    // config.
    val bg = graft.api.CheckpointStrategy.Local.materialize(
      bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    val c1 = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val n1pFwd = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1p"))
    val pcont = bg.groupBy(col("w2")).agg(count(lit(1)).as("cw"))
    val btypes = bg.agg(count(lit(1)).as("b"))
    val p = (col("c12").cast("double") - lit(0.75)) / col("c1").cast("double") +
      (lit(0.75) * col("n1p").cast("double") / col("c1").cast("double")) *
        (col("cw").cast("double") / col("b").cast("double"))
    bigrams.join(broadcast(bg), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .join(broadcast(n1pFwd), Seq("w1"))
      .join(broadcast(pcont), Seq("w2"))
      .crossJoin(broadcast(btypes))
      .select(col("doc_id"), round(log(p), 8).cast("decimal(20,8)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")) * 100000000L).cast("long").as("s8"))
      .withColumn("mean_micro", expr(
        """CASE WHEN s8 >= 0 THEN (s8 * 2 + n_bigrams * 100) DIV (n_bigrams * 200)
          |     ELSE -((-s8 * 2 + n_bigrams * 100) DIV (n_bigrams * 200)) END""".stripMargin))
      .select(col("doc_id"), col("n_bigrams"),
        round(exp(-col("mean_micro").cast("double") / 1e6), 6).as("kn_ppl"))
      .orderBy(col("doc_id"))
  }

  /** ROUGE-2 OVERLAP scoring — the n-gram eval metric (summary/variant
    * fidelity) run as a relational op over ALIGNED pairs (each planted
    * near-dup variant vs its base document): clipped bigram-multiset
    * overlap Σ_g min(c_var, c_base), recall / precision / F1. All three
    * ratios stay INTEGER until one division (F1 uses the identity
    * 2·o/(n_b + n_v) — no float compounding through p·r).
    *
    * 100 TB shape: bigram counting is a per-doc explode + (doc, gram)
    * aggregate; the overlap join keys on (pair, gram) — pairs are GIVEN
    * (an alignment column), so this is an equi-join on the pairing key,
    * never a corpus self-join. The eval-set variant of `dedup_near`'s
    * candidate-verify stage. */
  val textRougeOverlap: Q = (s, d) => {
    val c = corpus(s, d)
      .filter(col("doc_id") % Bands.DocBand < 100000L
        || col("doc_id") % Bands.DocBand >= 200000L)
    val grams = c.select(col("doc_id"), split(col("text"), " ").as("l"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(l) - 1)," +
          " i -> concat(l[i-1], ' ', l[i]))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val v = grams.filter(col("doc_id") % Bands.DocBand >= 200000L)
      .select((col("doc_id") - 200000L).as("base_id"),
        col("doc_id").as("var_id"), col("g"), col("c").as("cv"))
    val b = grams.filter(col("doc_id") % Bands.DocBand < 100000L)
      .select(col("doc_id").as("base_id"), col("g"), col("c").as("cb"))
    val ov = v.join(b, Seq("base_id", "g"))
      .groupBy(col("var_id"), col("base_id"))
      .agg(sum(least(col("cv"), col("cb"))).as("overlap"))
    val tot = grams.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    ov
      .join(tot.select(col("doc_id").as("base_id"), col("n").as("n_base")),
        "base_id")
      .join(tot.select(col("doc_id").as("var_id"), col("n").as("n_var")),
        "var_id")
      .select(col("var_id"), col("base_id"), col("n_base"), col("n_var"),
        col("overlap"),
        round(col("overlap").cast("double") / col("n_base").cast("double"), 6)
          .as("rouge2_recall"),
        round(col("overlap").cast("double") / col("n_var").cast("double"), 6)
          .as("rouge2_precision"),
        round((lit(2L) * col("overlap")).cast("double")
          / (col("n_base") + col("n_var")).cast("double"), 6).as("rouge2_f1"))
      .orderBy(col("var_id"))
  }

  /** Document fingerprint: bottom-8 sketch of 3-gram shingle hashes (the
    * order-independent cousin of winnowing — a stable content signature
    * for sketch-based containment/overlap checks). Exploded to one row per
    * (doc, rank). */
  val textFingerprint: Q = (s, d) => {
    // shingle rows via the Generate-barrier path (tokenize once per doc —
    // see TextDedup.shingleRows); distinct on (doc, shingle string)
    // matches the oracle's list_distinct-before-hash semantics
    val hashed = graft.api.TextDedup.shingleRows(
        T.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", n = 3)
      .distinct()
      .withColumn("hv", h48(col("sh")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("hv"))
    hashed.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 8)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("hv"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): hash every
    * character k-gram (k=8), slide a window of w=16 consecutive hashes,
    * select each window's minimum — guarantees any match of length
    * >= w+k-1 between two documents shares a selected hash. The selected
    * distinct hashes are the document's fingerprint. All per-row HOFs
    * (no explode until the final output), fully parallel per document. */
  /** Dedup clustering: near-dup pairs (variants vs base, exact Jaccard ≥
    * 0.7 via prefix filtering) → connected components → every clustered
    * doc mapped to its canonical representative (component min id). The
    * final keep/drop step of the dedup pipeline. */
  val dedupCluster: Q = (s, d) => {
    val c = corpus(s, d)
    val pairs = graft.api.TextDedup.jaccardJoin(
      c.filter(col("doc_id") % Bands.DocBand >= 200000L),
        c.filter(col("doc_id") % Bands.DocBand < 200000L),
      "doc_id", "text", JaccThreshold)
    graft.api.TextDedup.connectedComponents(pairs, "left_id", "right_id")
      .select(col("id").as("doc_id"), col("component").as("cluster_root"))
      .orderBy(col("doc_id"))
  }

  /** SEMANTIC dedup — the embedding-space twin of [[dedupCluster]], and
    * the composition the two green halves were built for: the corpus-self
    * kNN graph ([[graft.api.VectorSearch.knnJoin]] — IVF-cell-blocked,
    * never |N|²) keeps edges with cosine ≥ 0.999, connected components
    * ([[graft.api.TextDedup.connectedComponents]] — pointer-doubling
    * min-label propagation) groups them, and each vector maps to its
    * cluster's canonical representative (component min id; `is_rep` marks
    * the keeper — the SemDeDup recipe: keep one doc per semantic
    * cluster). Runs on the planted-variant vector corpus, so every
    * base/variant pair (cosine ≈ 1 up to float32 rounding) must cluster.
    *
    * 100 TB shape: candidate edges come from one broadcast-centroid
    * argmin + one cell equi-join (the kNN-graph build); CC rounds are
    * two model-sized hash joins each with per-round lineage truncation —
    * [[graft.api.CheckpointStrategy]] threads through BOTH stages, so a
    * cluster run swaps Local → Reliable end to end with one argument. */
  def dedupSemantic(
      cp: graft.api.CheckpointStrategy = graft.api.CheckpointStrategy.Local): Q =
    (s, d) => {
    val vc = vecCorpus(s, d)
    val cents = T.embeddings(s, d).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))
    val knn = graft.api.VectorSearch.knnJoin(vc, cents, "vec_id", "embedding",
      k = 3, nprobe = 3, checkpoint = cp)
    val edges = knn.filter(col("cos") >= 0.999)
      .select(col("probe_id"), col("cand_id"))
    graft.api.TextDedup
      .connectedComponents(edges, "probe_id", "cand_id", checkpoint = cp)
      .select(col("id").as("vec_id"), col("component").as("cluster_root"),
        (col("id") === col("component")).as("is_rep"))
      .orderBy(col("vec_id"))
  }

  val textWinnow: Q = (s, d) =>
    graft.api.TextDedup.winnowFingerprints(
        T.documents(s, d), "doc_id", "text", k = 8, w = 16)
      .orderBy(col("doc_id"), col("hv"))

  /** Training-SEQUENCE PACKING — the batch-assembly step between a
    * filtered corpus and the trainer: docs are laid end-to-end per
    * language shard in doc_id order and cut into 2048-token sequences; a
    * doc's sequence is `floor(cum_tokens_before / 2048)` (offset-based
    * packing — deterministic, no greedy state). Output is one row per
    * (lang, seq): docs packed, token payload, fill ratio.
    *
    * 100 TB shape: ONE window partitioned by the shard key (lang) doing
    * a running token sum, then one hash aggregate — both shuffle on the
    * shard key; no per-sequence state, no driver loop. A production
    * packer shards finer (lang × hash bucket) for balance, which is the
    * same plan with a composite key. */
  val textPack: Q = (s, d) => {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    T.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq", floor(col("cum_before") / 2048.0).cast("long"))
      .groupBy(col("lang"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .select(col("lang"), col("seq"), col("n_docs"), col("n_tokens"),
        col("first_doc"), round(col("n_tokens") / 2048.0, 4).as("fill_ratio"))
      .orderBy(col("lang"), col("seq"))
  }

  /** Overlapping token-window chunking (64-token windows, stride 48) —
    * the context-window prep for RAG indexing and long-document
    * pretraining. The doc is tokenized ONCE behind the Generate barrier
    * (the same discipline as [[graft.api.TextDedup.shingleRows]]); the
    * window index explodes from a cheap integer sequence and each chunk
    * slices its tokens per-row. Zero shuffles before the declared ORDER
    * BY; output cardinality is bounded by corpus tokens / stride, so at
    * 100 TB this runs at scan speed. Chunk content is carried as an md5
    * fingerprint (portable across engines) rather than the token text. */
  val textChunk: Q = (s, d) => {
    val W = 64L
    val S = 48L
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .withColumn("n_tok", size(col("__toks")).cast("long"))
      .withColumn("__nc", greatest(lit(1L),
        (floor((col("n_tok") - lit(W - S + 1)) / S.toDouble) + lit(1))
          .cast("long")))
      .select(col("doc_id"), col("__toks"), col("n_tok"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
      .withColumn("chunk_start", col("chunk_idx") * S)
      .withColumn("chunk_len",
        least(lit(W), col("n_tok") - col("chunk_start")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        col("chunk_len"),
        md5(array_join(slice(col("__toks"),
          (col("chunk_start") + 1).cast("int"),
          col("chunk_len").cast("int")), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** One BPE-style statistics pass: count adjacent token pairs across the
    * corpus and keep the 20 most frequent — the merge-candidate selection
    * step of byte-pair-encoding vocabulary induction. Pairs are 2-gram
    * shingles ([[graft.api.TextDedup.shingleRows]] with n=2 — tokenize
    * once per doc, explode an index sequence), then ONE hash-shuffle
    * count and a TakeOrderedAndProject top-20. Total order (count desc,
    * pair asc) makes the cutoff deterministic. */
  val textBpePairs: Q = (s, d) =>
    graft.api.TextDedup.shingleRows(
        T.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", n = 2)
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("pair_count"))
      .select(col("sh").as("pair"), col("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(20)

  /** Data-driven mixture rebalancing: per-language counts → a
    * deterministic keep-rate (basis points, exact integer division) that
    * downsamples every language to the smallest language's share (uniform
    * target mixture) → membership by the portable 48-bit hash, a pure row
    * property reproducible across engines, partitionings and reruns. The
    * rate table is a tiny broadcast (≤ #languages rows); the corpus scan
    * never shuffles before the final per-language rollup. The same shape
    * generalizes to any target mixture vector (DoReMi-style weights). */
  val textMixture: Q = (s, d) => {
    val docs = T.documents(s, d)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("min_docs"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("lang"), col("n_docs"),
        graft.core.Numeric.idiv(col("min_docs") * lit(10000L),
          col("n_docs")).as("rate_bp"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(graft.expr.Md5Prefix48.md548(
        concat_ws("|", col("doc_id"))) % lit(10000L) < col("rate_bp"))
      .groupBy(col("lang"), col("n_docs"), col("rate_bp"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))
  }

  /** END-TO-END TRAINING-DATA PIPELINE — the composed operator a corpus
    * team actually runs, declared as ONE query so the oracle pins the
    * whole chain: normalize (lower/trim/whitespace-collapse) → quality
    * gate (≥ 15 tokens) → exact dedup (min doc_id per normalized hash,
    * payload carried atomically via min(struct)) → near-dedup of the
    * incoming variant batch against the base corpus (prefix-filtered
    * exact Jaccard ≥ 0.7 — [[graft.api.TextDedup.jaccardJoin]]) →
    * sequence packing of the survivors into 1024-token bins per language
    * shard. Output: one row per packed sequence.
    *
    * 100 TB shape: stages 0–2 are scan-fused projections plus ONE hash
    * shuffle (the dedup groupBy); stage 3 is the AllPairs equi-join
    * (never all-pairs); stage 4 is one window + one aggregate on the
    * shard key. Nothing in the chain collects, re-reads, or materializes
    * driver-side — composition stays lazy end to end, which is the point
    * of declaring the pipeline as a single plan. */
  val pipelineE2e: Q = (s, d) => {
    // stage 0+1: normalize + quality gate (pure per-row codegen)
    val norm = corpus(s, d).select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("ntext"))
      .withColumn("n_tok", size(split(col("ntext"), " ")).cast("long"))
      .filter(col("n_tok") >= 15)
    // stage 2: exact dedup — one hash shuffle; keep lowest id, carry the
    // normalized payload in the same struct so the row stays atomic
    val exact = norm
      .groupBy(md5(col("ntext")).as("__h"))
      .agg(min(struct(col("doc_id"), col("ntext"), col("n_tok"))).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.ntext").as("ntext"),
        col("keep.n_tok").as("n_tok"))
    // stage 3: near-dedup the incoming variant batch against the base
    // corpus (the exact-dup family is already gone — identical after
    // normalization — so only the +200000 truncated variants remain)
    val vars = exact.filter(col("doc_id") % Bands.DocBand >= 200000L)
    val bases = exact.filter(col("doc_id") % Bands.DocBand < 200000L)
    val drops = graft.api.TextDedup
      .jaccardJoin(vars, bases, "doc_id", "ntext", JaccThreshold)
      .select(col("left_id").as("doc_id")).distinct()
    val survivors = exact.join(drops, Seq("doc_id"), "left_anti")
    // stage 4: pack survivors into 1024-token sequences per language
    // shard (variants inherit their base document's language)
    val langs = T.documents(s, d).select(col("doc_id").as("orig_id"), col("lang"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("orig_id", Bands.docOrig(col("doc_id")))
      .join(langs, Seq("orig_id"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq", floor(col("cum_before") / 1024.0).cast("long"))
      .groupBy(col("lang"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .select(col("lang"), col("seq"), col("n_docs"), col("n_tokens"),
        col("first_doc"), round(col("n_tokens") / 1024.0, 4).as("fill_ratio"))
      .orderBy(col("lang"), col("seq"))
  }

  /** K-MEANS clustering of the embedding corpus (Lloyd's algorithm, k=4,
    * 2 unrolled iterations) — the grouping step behind semantic dedup,
    * topic balancing and IVF index builds. Everything runs in exact
    * integer micro-units so the declared result is bit-reproducible on
    * any engine/partitioning (no float-mean drift):
    * vectors quantize to `round(x * 1e6)` longs; a centroid component is
    * the half-up-rounded integer mean `floor((2*Σv + n) / (2n))`; the
    * assignment argmin uses exact integer squared-L2 with lowest-cluster
    * tie-break. Init = the k lowest vec_ids' vectors.
    *
    * 100 TB shape per iteration: centroids are a k×D fixed-size model —
    * they BROADCAST (`crossJoin(broadcast)`, k rows) against the corpus
    * for assignment (codegen'd integer HOF math, one argmin aggregate
    * keyed on vec_id), and the update is one (cluster, dim) hash
    * aggregate after a posexplode — the corpus shuffles on its own key
    * only. Iterations are data-independent plan layers (no driver-side
    * convergence read in the declared 2-step query); the open-iteration
    * variant would localCheckpoint between rounds like
    * [[graft.api.TextDedup.connectedComponents]]. */
  val clusterKmeans: Q = (s, d) =>
    graft.api.Clustering
      .fit(T.embeddings(s, d), "vec_id", "embedding", k = 4, iters = 2)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("rep_vec_id"))
      .orderBy(col("cluster"))

  /** Winnowing-overlap near-dup pairs over the planted-variant corpus
    * ([[graft.api.TextDedup.winnowPairs]], the MOSS shape): docs sharing
    * >= 2 winnowing fingerprints after dropping corpus-boilerplate
    * hashes (document frequency > 8). Catches the long-verbatim-span
    * duplicates that token-set Jaccard dilutes; the truncated near-dup
    * variants share nearly all fingerprints with their base docs, the
    * uppercased variants share none (byte-level grams). Candidates are
    * an equi-join on the fingerprint hash — never all-pairs. */
  val dedupWinnow: Q = (s, d) =>
    graft.api.TextDedup.winnowPairs(corpus(s, d), "doc_id", "text",
        k = 8, w = 16, minShared = 2, maxDf = 8)
      .orderBy(col("a"), col("b"))

  /** CONTENT-DEFINED CHUNKING dedup (the LBFS/rsync boundary family,
    * Muthitacharoen et al. SOSP'01): chunk boundaries open where a
    * content hash meets a modulus condition, so boundaries MOVE WITH THE
    * CONTENT — an edit near a doc's head shifts every fixed-offset chunk
    * (`text_chunk`) but only the ONE content-defined chunk it touches.
    * The missing primitive next to winnowing: winnowing SAMPLES
    * fingerprints for detection, CDC PARTITIONS the full text, so shared
    * chunks are recoverable spans — the unit that storage dedup and
    * WARC-level pipeline dedup actually deduplicate.
    *
    * Boundaries: position i opens a chunk iff i = 1 or the k=8 gram hash
    * h_i ≡ 0 (mod 64) (expected chunk ~64 chars; h is the native
    * [[graft.expr.GramHash48]] — the engine's portable md5_48
    * discipline, so the oracle reproduces every boundary). The planted
    * near-dup variants (last two tokens dropped) share every chunk but
    * the final one with their base docs — exactly the insertion/deletion
    * robustness fixed-offset chunking lacks.
    *
    * 100 TB shape: one native gram-hash pass per row; the mod filter
    * drops ~63/64 of positions IN THE SCAN STAGE before anything
    * shuffles; span assembly is one lead-window on doc_id; the dedup
    * aggregate shuffles (hash, doc) pairs only. */
  val dedupCdc: Q = (s, d) => {
    val c = corpus(s, d).filter(length(col("text")) >= 8)
    val cuts = c
      .select(col("doc_id"), col("text"),
        posexplode(expr("gram_hash48(text, 8)")).as(Seq("p0", "h")))
      .filter(col("p0") === 0 || col("h") % 64 === 0)
      .select(col("doc_id"), col("text"), (col("p0") + 1).as("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val chunks = cuts
      .withColumn("next", lead(col("pos"), 1).over(w))
      .select(col("doc_id"),
        expr("substring(text, pos, coalesce(next, length(text) + 1) - pos)")
          .as("chunk"))
    chunks
      .select(col("doc_id"), h48(col("chunk")).as("chunk_hash"),
        length(col("chunk")).cast("long").as("clen"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("rep_doc"),
        max(col("clen")).as("chunk_len"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("chunk_hash"))
  }

  // -------------------------------------------------------- multimodal join

  /** documents ⋈ embeddings by id with the vector carried through a
    * groupBy: per (lang, label) cohort — count, exact avg chars, mean
    * L2 norm (per-row norm rounded to 6, then exact decimal mean). Proves
    * nested array columns survive join + aggregation. */
  val multimodalJoin: Q = (s, d) => {
    def dot(x: Column): Column = dotp(x, x)
    val docs = T.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
    val embs = T.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    docs.join(embs, docs("doc_id") === embs("vec_id"))
      .withColumn("l2", round(sqrt(dot(col("embedding"))), 6))
      .groupBy(col("lang"), col("label"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        (sum(col("l2").cast("decimal(20,8)")).cast("double") / count(lit(1)))
          .as("avg_l2"))
      .select(col("lang"), col("label"), col("n"), col("avg_chars"),
        round(col("avg_l2"), 6).as("avg_l2"))
      .orderBy(col("lang"), col("label"))
  }

  // ---------------------------------------------------------- perplexity gate

  /** Perplexity cutoff for [[textPerplexity]]'s keep flag — chosen to
    * split the harness corpus near its ppl median (≈21.1 at sf0.01 under
    * the bounded top-V model); at scale this is the tunable the pipeline
    * owner sets from a held-out distribution. */
  private val PplCutoff = 21.1

  /** Top-V vocabulary size for [[textPerplexity]] — 24 of the harness
    * corpus's 31 token types (same bound as [[textUnigramLm]]), standing
    * in for top-1M at scale; the 7 out-of-vocabulary types exercise the
    * `<unk>` path. */
  private val PplVocab = 24

  /** Shared per-doc perplexity CTE chain (DuckDB dialect), ending at the
    * `ppl` CTE `(doc_id, n_tok, ppl)` — the oracle body of
    * [[textPerplexity]], reused verbatim by `text_ppl_bucket`
    * ([[Frontier2]]) so the bucketed scores are BY CONSTRUCTION the same
    * numbers the perplexity gate reports. */
  private[ops] val pplCoreSql: String =
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |raw AS (SELECT doc_id, i AS pos, l[i] AS tok
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
       |counts AS (SELECT tok, COUNT(*) AS c FROM raw GROUP BY tok),
       |vocab AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT $PplVocab),
       |t AS (SELECT doc_id, pos, mtok,
       |    lag(mtok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
       |  FROM (SELECT r.doc_id, r.pos,
       |      CASE WHEN v.tok IS NULL THEN '<unk>' ELSE r.tok END AS mtok
       |    FROM raw r LEFT JOIN vocab v ON r.tok = v.tok)),
       |uni AS (SELECT CASE WHEN v.tok IS NULL THEN '<unk>' ELSE c.tok END AS mtok,
       |    SUM(c.c) AS c
       |  FROM counts c LEFT JOIN vocab v ON c.tok = v.tok GROUP BY 1),
       |nt AS (SELECT SUM(c) AS nt FROM counts),
       |bg AS (SELECT w1, mtok, COUNT(*) AS c12 FROM t
       |       WHERE w1 IS NOT NULL GROUP BY w1, mtok),
       |c1t AS (SELECT w1, SUM(c12) AS c1 FROM bg GROUP BY w1),
       |scored AS (SELECT t.doc_id,
       |    round(ln(CASE WHEN t.w1 IS NULL
       |      THEN CAST(u.c AS DOUBLE) / CAST(nt.nt AS DOUBLE)
       |      ELSE 0.7 * (CAST(b.c12 AS DOUBLE) / CAST(c.c1 AS DOUBLE))
       |        + 0.3 * (CAST(u.c AS DOUBLE) / CAST(nt.nt AS DOUBLE)) END), 8)
       |      AS lp
       |  FROM t JOIN uni u ON t.mtok = u.mtok CROSS JOIN nt
       |  LEFT JOIN bg b ON t.w1 = b.w1 AND t.mtok = b.mtok
       |  LEFT JOIN c1t c ON t.w1 = c.w1),
       |agg AS (SELECT doc_id, COUNT(*) AS n_tok,
       |    CAST(SUM(CAST(lp AS DECIMAL(20,8))) * 100000000 AS BIGINT) AS s8
       |  FROM scored GROUP BY doc_id),
       |mm AS (SELECT doc_id, n_tok,
       |    CASE WHEN s8 >= 0 THEN (s8 * 2 + n_tok * 100) // (n_tok * 200)
       |         ELSE -((-s8 * 2 + n_tok * 100) // (n_tok * 200)) END AS micro
       |  FROM agg),
       |ppl AS (SELECT doc_id, n_tok,
       |    CAST(round(exp(-(CAST(micro AS DOUBLE)) / 1000000.0), 6) AS DOUBLE)
       |      AS ppl
       |  FROM mm)""".stripMargin

  /** Perplexity filter — the KenLM-style quality gate of a training
    * pipeline: per-doc perplexity under a Jelinek-Mercer INTERPOLATED
    * bigram model (λ·P_bigram + (1−λ)·P_unigram, λ=0.7) over a BOUNDED
    * top-V vocabulary: tokens outside the top-[[PplVocab]] unigrams
    * (ties broken count desc, token asc — deterministic in both
    * engines) map to a shared `<unk>` symbol BEFORE any counting, the
    * standard open-vocabulary LM contract. Counts are maximum-likelihood
    * over the mapped stream, so every event is attested and needs no
    * smoothing floor; a doc's first token scores by the unigram term
    * alone. Docs whose perplexity exceeds [[PplCutoff]] are FLAGGED for
    * drop, not dropped — the gate's decision is the observable a
    * pipeline audits.
    *
    * Float discipline: each probability is a fixed IEEE expression over
    * exact counts (identical in both engines), each log-prob rounds to
    * 8 decimals before the exact decimal sum, the mean rounds in
    * integer micro-units (see [[textUnigramLm]]), and exp() of the
    * bit-identical mean rounds to 6.
    *
    * 100 TB shape (the r7 VERDICT scale caveat, fixed): because the
    * token stream is vocab-mapped first, EVERY model table is bounded —
    * unigram ≤ V+1 rows, context ≤ V+1, bigram ≤ (V+1)² — so all three
    * BROADCAST and scoring is a map-side pass; the unbounded raw-token
    * tables of the previous shape never materialize past their
    * aggregates (unigram counts reduce to the mapped model with one
    * type-grain shuffle, the context table derives from the bigram
    * model, not the stream). The lag window partitions by doc; one
    * doc_id shuffle for the mean. */
  val textPerplexity: Q = (s, d) => {
    val toks = T.documents(s, d).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("tok")).limit(PplVocab)
      .select(col("tok"), lit(1L).as("inv"))
    def mapped(tok: Column, inv: Column): Column =
      when(inv.isNull, lit("<unk>")).otherwise(tok)
    val m = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        mapped(col("tok"), col("inv")).as("mtok"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val seq0 = m.withColumn("w1", lag(col("mtok"), 1).over(w))
    val uni = counts.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(mapped(col("tok"), col("inv")).as("mtok"))
      .agg(sum(col("c")).as("c"))
    val nTot = counts.agg(sum(col("c")).as("nt"))
    val bg = seq0.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("mtok")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val pUni = col("c").cast("double") / col("nt").cast("double")
    val p = when(col("w1").isNull, pUni)
      .otherwise(lit(0.7) * (col("c12").cast("double") / col("c1").cast("double"))
        + lit(0.3) * pUni)
    val perDoc = seq0.join(broadcast(uni), Seq("mtok"))
      .crossJoin(broadcast(nTot))
      .join(broadcast(bg), Seq("w1", "mtok"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .select(col("doc_id"), round(log(p), 8).cast("decimal(20,8)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        (sum(col("lp")) * 100000000L).cast("long").as("s8"))
      .withColumn("mean_micro", expr(
        """CASE WHEN s8 >= 0 THEN (s8 * 2 + n_tok * 100) DIV (n_tok * 200)
          |     ELSE -((-s8 * 2 + n_tok * 100) DIV (n_tok * 200)) END""".stripMargin))
    perDoc
      .select(col("doc_id"), col("n_tok"),
        round(exp(-col("mean_micro").cast("double") / 1e6), 6).as("ppl"))
      .withColumn("keep", col("ppl") <= lit(PplCutoff))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ paragraph dedup

  /** Tokens per [[dedupPara]] segment. */
  private val ParaLen = 10

  /** Paragraph-level dedup — SEGMENT granularity between document-exact
    * ([[dedupExact]]) and content-defined chunks ([[dedupCdc]]): each doc
    * is cut into consecutive 10-token segments (the "paragraphs" of the
    * single-line corpus) and a segment shared verbatim by ≥ 2 distinct
    * docs is duplicate material. Per doc the observable is its
    * duplicate-segment fraction — the boilerplate-contamination score a
    * pipeline gates on before training. The planted +200000 near-dup
    * variants share every surviving full segment with their base docs,
    * so they score dup_frac 1.0 and drag the bases up with them.
    *
    * The short-doc guard (`size >= 10`) is REQUIRED on the Spark side:
    * sequence(1, 0) DESCENDS to [1, 0] (step auto-negates) while the
    * oracle's generate_series returns empty — the same trap documented
    * at [[graft.ops.Advanced.matchFuzzy]].
    *
    * 100 TB shape: segmentation is per-row (no shuffle); the df count
    * shuffles (segment-hash, doc) pairs once; the per-doc score keys on
    * doc_id. Never all-pairs — doc pairs are never materialized at all. */
  val dedupPara: Q = (s, d) => {
    val segs = corpus(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= ParaLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(l) DIV $ParaLen)," +
          s" i -> array_join(slice(l, (i-1)*$ParaLen+1, $ParaLen), ' '))")).as("seg"))
    val hashed = segs.select(col("doc_id"), h48(col("seg")).as("sh"))
    val dfreq = hashed.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"))
    hashed.join(dfreq, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_seg"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_seg"))
      .select(col("doc_id"), col("n_seg"), col("n_dup_seg"),
        round(col("n_dup_seg").cast("double") / col("n_seg").cast("double"), 6)
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** PERSISTED-INDEX ANN — [[simTopkIvf]]'s routing made durable (the
    * vector twin of [[dedupIncremental]]'s index-probe pattern): the IVF
    * cell assignments write once as a CELL-PARTITIONED parquet layout
    * (`api.VectorSearch.ivfIndex` + `partitionBy("cell")` — a real
    * deployment's index table), and each probe batch joins the index on
    * the cell PARTITION column, so dynamic partition pruning drops every
    * unprobed cell at the reader: a probe batch reads nprobe/|cells| of
    * the index bytes instead of the corpus. Same parameters as
    * [[simTopkIvf]] — the result is pinned identical to the in-flight
    * routing by the shared oracle. */
  val simIndexPersist: Q = (s, d) => {
    val idxDir =
      s"${sys.props("java.io.tmpdir")}/graft_io/sim_ivf_index"
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") % 50 === 0)
    graft.api.VectorSearch.ivfIndex(e, cents, "vec_id", "embedding")
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    graft.api.VectorSearch.ivfProbeIndex(
        probes = e.filter(col("vec_id") < 10),
        index = s.read.parquet(idxDir), cents = cents,
        idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** INCREMENTAL INDEX REFRESH — [[simIndexPersist]]'s maintenance story
    * (the vector twin of [[dedupIncremental]]'s delta probe): the index
    * builds once on the BASE corpus, and a later ingest batch appends
    * ONLY its own cell assignments to the cell-partitioned layout —
    * refresh cost O(|delta|), never a rebuild. Because IVF assignment is
    * a pure per-row property of (vector, centroid model), base+delta
    * appends are byte-identical to a full rebuild, which is exactly what
    * the shared oracle (brute-force routing over the whole corpus)
    * proves. When the CENTROID MODEL revs, a rebuild is required — that
    * boundary is the documented contract. */
  val simIndexDelta: Q = (s, d) => {
    val idxDir =
      s"${sys.props("java.io.tmpdir")}/graft_io/sim_ivf_index_delta"
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") % 50 === 0)
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val delta = e.filter(col("vec_id") % 4 === 3)
    graft.api.VectorSearch.ivfIndex(base, cents, "vec_id", "embedding")
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    graft.api.VectorSearch.ivfIndex(delta, cents, "vec_id", "embedding")
      .write.mode("append").partitionBy("cell").parquet(idxDir)
    graft.api.VectorSearch.ivfProbeIndex(
        probes = e.filter(col("vec_id") < 10),
        index = s.read.parquet(idxDir), cents = cents,
        idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---------------------------------------------------- late interaction

  /** MAXSIM late-interaction scoring (the ColBERT retrieval shape,
    * Khattab & Zaharia SIGIR'20) — the multi-vector companion of
    * [[simTopk]]'s single-vector ranking: a QUERY is a SET of vectors
    * (here the 4 lowest-id embeddings), a candidate is a GROUP of
    * vectors (a label cohort), and the score is Σ_q max_v cos(q, v) —
    * each query vector finds its best match independently, so partial
    * matches accumulate instead of averaging away. Per-pair cosines
    * round to 6 BEFORE the max (engine-portable), and the final Σ is an
    * exact decimal sum of rounded maxima.
    *
    * 100 TB shape: the query set BROADCASTS (late interaction keeps the
    * corpus side untouched — that asymmetry is the point of the
    * architecture); cosines evaluate map-side via the codegen'd
    * [[graft.expr.FloatDotProduct]]; the max and sum shuffle (label,
    * query) grid rows only. */
  val simMaxsim: Q = (s, d) => {
    val e = T.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding"))
    val probes = e.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    e.crossJoin(broadcast(probes))
      .select(col("label"), col("qid"),
        round(cosine(col("qv"), col("embedding")), 6).as("cos"))
      .groupBy(col("label"), col("qid"))
      .agg(max(col("cos")).as("best"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_q"),
        sum(col("best").cast("decimal(10,6)")).cast("double").as("maxsim"))
      .orderBy(col("label"))
  }

  // -------------------------------------------------- product quantization

  /** PRODUCT QUANTIZATION encode (Jégou et al., PAMI'11) — the vector-
    * compression standard behind billion-scale ANN indexes, and the
    * third leg of the engine's vector family: [[embedQuantize]] is the
    * SCALAR (per-dim) compressor, IVF ([[simTopkIvf]]) the coarse
    * partitioner, PQ the fine sub-vector codebook: the 64-dim vector
    * splits into 4 subspaces of 16 dims, each encoded as the id of its
    * nearest codeword (k=4 per subspace, codebook = the 4 lowest-id
    * vectors' sub-vectors — the deterministic-seed discipline of
    * [[clusterKmeans]], which is also how a production PQ trains:
    * per-subspace k-means on a sample). 64 floats → 4 codes.
    *
    * All distances are exact integer micro-unit L2 (ties → lowest
    * codeword id); only the reported reconstruction RMSE divides/sqrts
    * in double, then rounds.
    *
    * 100 TB shape: the codebook is 4·4·16 numbers → BROADCAST; encoding
    * is one map-side pass over the exploded vector stream, and the
    * argmin + code assembly shuffle on vec_id only — the corpus never
    * joins itself. */
  val embedPq: Q = (s, d) => {
    val q = T.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(expr("transform(embedding," +
          " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"))
          .as(Seq("dim", "qd")))
      .withColumn("sub", col("dim") - pmod(col("dim"), lit(16)))
    val seeds = T.embeddings(s, d).select(col("vec_id"))
      .orderBy(col("vec_id")).limit(4)
    val cents = q.join(broadcast(seeds), Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("dim"), col("qd").as("cv"))
    val d2 = q.join(broadcast(cents), Seq("dim"))
      .groupBy(col("vec_id"), col("sub"), col("cid"))
      .agg(sum((col("qd") - col("cv")) * (col("qd") - col("cv"))).as("d2"))
    val wMin = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d2"), col("cid"))
    val assigned = d2.withColumn("rnk", row_number().over(wMin))
      .filter(col("rnk") === 1)
    assigned.groupBy(col("vec_id"))
      .agg(
        max(when(col("sub") === 0, col("cid"))).as("c0"),
        max(when(col("sub") === 16, col("cid"))).as("c1"),
        max(when(col("sub") === 32, col("cid"))).as("c2"),
        max(when(col("sub") === 48, col("cid"))).as("c3"),
        sum(col("d2")).as("err"))
      .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        round(sqrt(col("err").cast("double")) / 8000000.0, 6).as("rmse"))
      .orderBy(col("vec_id"))
  }

  // ------------------------------------------------------- collocations

  /** PMI COLLOCATION extraction — the phrase-mining step between the raw
    * bigram counts ([[textBigramLm]]) and tokenizer/vocab construction
    * ([[textBpePairs]] counts raw frequency; PMI finds pairs that
    * co-occur MORE than their marginals predict, i.e. real phrases, not
    * just common words): PMI(w1,w2) = ln(c12·N / (c1·c2)) over the
    * corpus bigram table with marginal counts as left/right slot sums,
    * support-filtered (c12 ≥ 5) and ranked top-15 (rounded-PMI desc,
    * then bigram — fully deterministic).
    *
    * 100 TB shape: marginals are groupBys ON the bigram table (already
    * reduced), joined back by shuffle on w1/w2 (vocab-sized but
    * data-dependent — not forced broadcast); N is a 1-row broadcast; the
    * top-15 is TakeOrderedAndProject, never a global sort. */
  val textCollocations: Q = (s, d) => {
    val toks = T.documents(s, d).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks.withColumn("w2", lead(col("tok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("tok").as("w1"), col("w2"))
    val bg = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val left = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val right = bg.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val nTot = bg.agg(sum(col("c12")).as("nn"))
    bg.filter(col("c12") >= 5)
      .join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(nTot))
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12").cast("double") * col("nn").cast("double"))
          / (col("c1").cast("double") * col("c2").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(15)
  }

  // ----------------------------------------------------- label centroids

  /** Per-label embedding centroids with outlier detection — the
    * class-cohesion audit of a labeled embedding table: per label, the
    * centroid's L2 norm and the member FARTHEST from its centroid (the
    * mislabeled-candidate surfaced for human inspection).
    *
    * Exact-arithmetic discipline (the [[clusterKmeans]] micro-unit
    * trick): each float quantizes to integer micro-units, per-(label,
    * dim) sums are exact BIGINTs, and the distance argmax ranks by the
    * exact integer Σ_d (n·q_d − S_d)² held in DECIMAL(38,0) — n·q ≈ 2e9
    * squared, summed over 64 dims, overflows BIGINT — so the ranking
    * never touches a float. Only the two REPORTED magnitudes divide /
    * sqrt in double, then round to 6.
    *
    * 100 TB shape: the per-(label, dim) sum table is model-sized
    * (|labels|·64 rows) → BROADCAST back to the member stream, so the
    * heavy data shuffles once on (label, dim) for the sums and once on
    * vec_id for the member distances; the final per-label pass moves
    * |labels| rows. */
  val embedCentroid: Q = (s, d) => {
    val q = T.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(expr("transform(embedding," +
          " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"))
          .as(Seq("dim", "qd")))
    val sums = q.groupBy(col("label"), col("dim"))
      .agg(sum(col("qd")).as("sd"), count(lit(1)).as("n"))
    val diff = col("n") * col("qd") - col("sd")
    val member = q.join(broadcast(sums), Seq("label", "dim"))
      .select(col("vec_id"), col("label"), col("n"),
        (diff.cast("decimal(18,0)") * diff.cast("decimal(18,0)")).as("dd"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("dd")).as("d2"), max(col("n")).as("n"))
    val wOut = Window.partitionBy(col("label"))
      .orderBy(col("d2").desc, col("vec_id"))
    val outl = member.withColumn("rnk", row_number().over(wOut))
      .filter(col("rnk") === 1)
      .select(col("label"), col("vec_id").as("outlier_vec_id"), col("d2"))
    val norm = sums
      .groupBy(col("label"))
      .agg(sum(col("sd").cast("decimal(18,0)") * col("sd").cast("decimal(18,0)"))
          .as("ss"),
        max(col("n")).as("n_vecs"))
    norm.join(outl, Seq("label"))
      .select(col("label"), col("n_vecs"),
        round(sqrt(col("ss").cast("double"))
          / (col("n_vecs") * 1000000L).cast("double"), 6).as("centroid_norm"),
        col("outlier_vec_id"),
        round(sqrt(col("d2").cast("double"))
          / (col("n_vecs") * 1000000L).cast("double"), 6).as("outlier_dist"))
      .orderBy(col("label"))
  }

  // ---------------------------------------------------------------- oracles

  private def minhashSigSql: String = {
    val mins = (0 until K).map(i =>
      s"min((${A(i)} * hv + ${B(i)}) % $P) AS mh_$i").mkString(",\n    ")
    s"""sh AS (SELECT doc_id, unnest($shinglesSql) s FROM tok WHERE len(l) >= 3),
       |hv AS (SELECT doc_id, ${h48Sql("s")} % $P AS hv FROM sh),
       |sig AS (SELECT doc_id,
       |    $mins
       |  FROM hv GROUP BY doc_id)""".stripMargin
  }

  private def bandsSql: String =
    (0 until NBands).map { b =>
      val key = (0 until R).map(r => s"CAST(mh_${b * R + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
    }.mkString("\nUNION ALL\n")

  private[ops] val jaccSql =
    """CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE)
      | / CAST(len(sa.sset) + len(sb.sset)
      |        - len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE)""".stripMargin

  private def simhashSigSql: String = {
    val bitSums = (0 until SimhashBits).map(j =>
      s"sum(((hv >> $j) & 1) * 2 - 1) AS s_$j").mkString(",\n    ")
    val value = (0 until SimhashBits).map(j =>
      s"CASE WHEN s_$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""sh AS (SELECT doc_id, unnest($shinglesSql) s FROM tok WHERE len(l) >= 3),
       |hv AS (SELECT doc_id, ${h48Sql("s")} AS hv FROM sh),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM hv GROUP BY doc_id),
       |sig AS (SELECT doc_id, $value AS simhash FROM bits)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // interpolated bigram/unigram perplexity: probabilities are exact count
    // ratios combined in the SAME IEEE expression shape as the Spark side,
    // log-probs round to 8 before the decimal sum, the mean rounds in
    // integer micro-units, exp of the bit-identical mean rounds to 6
    "text_perplexity" ->
      s"""WITH $pplCoreSql
         |SELECT doc_id, n_tok, ppl, ppl <= $PplCutoff AS keep
         |FROM ppl ORDER BY doc_id""".stripMargin,

    // ROUGE-2 over aligned variant/base pairs: integer clipped-multiset
    // overlap, one division per reported ratio (F1 = 2o/(nb+nv))
    "text_rouge_overlap" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |    array_to_string(list_slice(string_split(text, ' '), 1,
        |      len(string_split(text, ' ')) - 2), ' ')
        |  FROM documents WHERE doc_id % 7 = 0),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM corpus),
        |g AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) s),
        |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
        |v AS (SELECT doc_id - 200000 AS base_id, doc_id AS var_id, g, c AS cv
        |  FROM gc WHERE doc_id % 252000 >= 200000),
        |b AS (SELECT doc_id AS base_id, g, c AS cb FROM gc WHERE doc_id % 252000 < 100000),
        |ov AS (SELECT var_id, base_id, SUM(LEAST(cv, cb)) AS overlap
        |  FROM v JOIN b USING (base_id, g) GROUP BY var_id, base_id),
        |tot AS (SELECT doc_id, SUM(c) AS n FROM gc GROUP BY doc_id)
        |SELECT ov.var_id, ov.base_id,
        |  CAST(tb.n AS BIGINT) AS n_base, CAST(tv.n AS BIGINT) AS n_var,
        |  CAST(ov.overlap AS BIGINT) AS overlap,
        |  CAST(round(CAST(ov.overlap AS DOUBLE) / CAST(tb.n AS DOUBLE), 6)
        |    AS DOUBLE) AS rouge2_recall,
        |  CAST(round(CAST(ov.overlap AS DOUBLE) / CAST(tv.n AS DOUBLE), 6)
        |    AS DOUBLE) AS rouge2_precision,
        |  CAST(round(CAST(2 * ov.overlap AS DOUBLE)
        |    / CAST(tb.n + tv.n AS DOUBLE), 6) AS DOUBLE) AS rouge2_f1
        |FROM ov JOIN tot tb ON ov.base_id = tb.doc_id
        |JOIN tot tv ON ov.var_id = tv.doc_id
        |ORDER BY ov.var_id""".stripMargin,

    // Kneser-Ney bigram scoring over the same bounded top-V vocabulary as
    // text_perplexity: identical IEEE expression shape, log-probs round to
    // 8 before the decimal sum, integer-micro mean, exp rounds to 6
    "text_kneser_ney" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |raw AS (SELECT doc_id, i AS pos, l[i] AS tok
         |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
         |counts AS (SELECT tok, COUNT(*) AS c FROM raw GROUP BY tok),
         |vocab AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT $PplVocab),
         |m AS (SELECT r.doc_id, r.pos,
         |    CASE WHEN v.tok IS NULL THEN '<unk>' ELSE r.tok END AS mtok
         |  FROM raw r LEFT JOIN vocab v ON r.tok = v.tok),
         |big AS (SELECT doc_id, w1, w2 FROM (
         |    SELECT doc_id, mtok AS w1,
         |      lead(mtok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         |    FROM m)
         |  WHERE w2 IS NOT NULL),
         |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
         |c1t AS (SELECT w1, SUM(c12) AS c1 FROM bg GROUP BY w1),
         |n1p AS (SELECT w1, COUNT(*) AS n1p FROM bg GROUP BY w1),
         |pcont AS (SELECT w2, COUNT(*) AS cw FROM bg GROUP BY w2),
         |bt AS (SELECT COUNT(*) AS b FROM bg),
         |scored AS (SELECT big.doc_id,
         |    round(ln((CAST(g.c12 AS DOUBLE) - 0.75) / CAST(c.c1 AS DOUBLE)
         |      + ((0.75 * CAST(f.n1p AS DOUBLE)) / CAST(c.c1 AS DOUBLE))
         |        * (CAST(p.cw AS DOUBLE) / CAST(bt.b AS DOUBLE))), 8) AS lp
         |  FROM big JOIN bg g ON big.w1 = g.w1 AND big.w2 = g.w2
         |  JOIN c1t c ON big.w1 = c.w1
         |  JOIN n1p f ON big.w1 = f.w1
         |  JOIN pcont p ON big.w2 = p.w2
         |  CROSS JOIN bt),
         |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |    CAST(SUM(CAST(lp AS DECIMAL(20,8))) * 100000000 AS BIGINT) AS s8
         |  FROM scored GROUP BY doc_id),
         |mm AS (SELECT doc_id, n_bigrams,
         |    CASE WHEN s8 >= 0 THEN (s8 * 2 + n_bigrams * 100) // (n_bigrams * 200)
         |         ELSE -((-s8 * 2 + n_bigrams * 100) // (n_bigrams * 200)) END AS micro
         |  FROM agg)
         |SELECT doc_id, n_bigrams,
         |  CAST(round(exp(-(CAST(micro AS DOUBLE)) / 1000000.0), 6) AS DOUBLE)
         |    AS kn_ppl
         |FROM mm ORDER BY doc_id""".stripMargin,

    // incremental dedup: same sig/band algebra as dedup_minhash, but
    // candidates are STRICTLY delta-side x base-side (the index probe)
    "dedup_incremental" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000,
         |         array_to_string(list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 2), ' ')
         |  FROM documents WHERE doc_id % 7 = 0),
         |tok AS (SELECT doc_id, string_split(text, ' ') l FROM corpus),
         |$minhashSigSql,
         |bands AS (
         |$bandsSql),
         |cand AS (SELECT DISTINCT x.doc_id AS delta_id, y.doc_id AS base_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey
         |  WHERE x.doc_id % 252000 >= 200000 AND y.doc_id % 252000 < 200000),
         |ssets AS (SELECT doc_id, list_distinct($shinglesSql) sset FROM tok WHERE len(l) >= 3)
         |SELECT delta_id, base_id, round($jaccSql, 6) AS jacc
         |FROM cand
         |  JOIN ssets sa ON sa.doc_id = delta_id
         |  JOIN ssets sb ON sb.doc_id = base_id
         |WHERE $jaccSql >= $JaccThreshold
         |ORDER BY delta_id, base_id""".stripMargin,

    // MaxSim: per-pair cosines round to 6 BEFORE the max; the final sum
    // is exact decimal over the rounded maxima
    "sim_maxsim" ->
      s"""WITH probes AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |best AS (SELECT e.label, p.qid,
         |    MAX(round(${cosineSql("p.qv", "e.embedding")}, 6)) AS best
         |  FROM embeddings e CROSS JOIN probes p GROUP BY e.label, p.qid)
         |SELECT label, COUNT(*) AS n_q,
         |  CAST(SUM(CAST(best AS DECIMAL(10,6))) AS DOUBLE) AS maxsim
         |FROM best GROUP BY label ORDER BY label""".stripMargin,

    // PQ encode: micro-unit exact distances, lowest-cid ties, double only
    // for the reported RMSE (sum < 2^53 — the decimal cast is exact)
    "embed_pq" ->
      """WITH q AS (SELECT vec_id, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS qd,
        |    ((i - 1) // 16) * 16 AS sub
        |  FROM embeddings, LATERAL
        |    (SELECT unnest(generate_series(1, 64)) AS i) g),
        |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
        |cents AS (SELECT q.vec_id AS cid, dim, qd AS cv
        |          FROM q JOIN seeds USING (vec_id)),
        |d2 AS (SELECT q.vec_id, q.sub, c.cid,
        |    SUM((q.qd - c.cv) * (q.qd - c.cv)) AS d2
        |  FROM q JOIN cents c ON q.dim = c.dim
        |  GROUP BY q.vec_id, q.sub, c.cid),
        |asg AS (SELECT vec_id, sub, cid, d2 FROM (
        |    SELECT vec_id, sub, cid, d2, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id, sub ORDER BY d2, cid) AS rnk FROM d2)
        |  WHERE rnk = 1)
        |SELECT vec_id,
        |  MAX(CASE WHEN sub = 0 THEN cid END) AS c0,
        |  MAX(CASE WHEN sub = 16 THEN cid END) AS c1,
        |  MAX(CASE WHEN sub = 32 THEN cid END) AS c2,
        |  MAX(CASE WHEN sub = 48 THEN cid END) AS c3,
        |  CAST(round(sqrt(CAST(SUM(d2) AS DOUBLE)) / 8000000.0, 6) AS DOUBLE)
        |    AS rmse
        |FROM asg GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // PMI collocations: exact bigram counts + slot marginals; the log
    // ratio multiplies/divides exact-count doubles in one fixed IEEE
    // expression (all products < 2^53 — exact), rounds to 6, and the
    // top-15 ties break on the bigram itself
    "text_collocations" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l
        |             FROM documents),
        |big AS (SELECT l[i] AS w1, l[i+1] AS w2
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l)-1)) AS i) g),
        |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
        |lft AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        |rgt AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM bg GROUP BY w2),
        |nt AS (SELECT CAST(SUM(c12) AS BIGINT) AS nn FROM bg)
        |SELECT bg.w1, bg.w2, bg.c12,
        |  CAST(round(ln((CAST(bg.c12 AS DOUBLE) * CAST(nt.nn AS DOUBLE))
        |    / (CAST(lft.c1 AS DOUBLE) * CAST(rgt.c2 AS DOUBLE))), 6)
        |    AS DOUBLE) AS pmi
        |FROM bg JOIN lft ON bg.w1 = lft.w1 JOIN rgt ON bg.w2 = rgt.w2
        |CROSS JOIN nt
        |WHERE bg.c12 >= 5
        |ORDER BY pmi DESC, bg.w1, bg.w2 LIMIT 15""".stripMargin,

    // 10-token segment dedup: same md5_48 segment identity, df = distinct
    // docs per segment, per-doc duplicate-segment fraction
    "dedup_para" ->
      s"""WITH $corpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM corpus),
         |segs AS (SELECT doc_id,
         |    array_to_string(list_slice(l, (i-1)*$ParaLen+1, i*$ParaLen), ' ')
         |      AS seg
         |  FROM tok, LATERAL
         |    (SELECT unnest(generate_series(1, len(l) // $ParaLen)) AS i) g
         |  WHERE len(l) >= $ParaLen),
         |h AS (SELECT doc_id, ${h48Sql("seg")} AS sh FROM segs),
         |dft AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM h GROUP BY sh)
         |SELECT doc_id, COUNT(*) AS n_seg,
         |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_seg,
         |  CAST(round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS dup_frac
         |FROM h JOIN dft USING (sh) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // label centroids: micro-unit quantization, exact BIGINT per-dim sums,
    // exact DECIMAL distance ranking; only the reported magnitudes go
    // through double sqrt/divide, then round 6
    "embed_centroid" ->
      """WITH q AS (SELECT vec_id, label, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS qd
        |  FROM embeddings, LATERAL
        |    (SELECT unnest(generate_series(1, 64)) AS i) g),
        |sums AS (SELECT label, dim, CAST(SUM(qd) AS BIGINT) AS sd,
        |    COUNT(*) AS n
        |  FROM q GROUP BY label, dim),
        |member AS (SELECT q.vec_id, q.label,
        |    SUM(CAST(s.n * q.qd - s.sd AS DECIMAL(18,0))
        |      * CAST(s.n * q.qd - s.sd AS DECIMAL(18,0))) AS d2,
        |    MAX(s.n) AS n
        |  FROM q JOIN sums s ON q.label = s.label AND q.dim = s.dim
        |  GROUP BY q.vec_id, q.label),
        |norm AS (SELECT label,
        |    SUM(CAST(sd AS DECIMAL(18,0)) * CAST(sd AS DECIMAL(18,0))) AS ss,
        |    CAST(MAX(n) AS BIGINT) AS n_vecs
        |  FROM sums GROUP BY label),
        |outl AS (SELECT label, vec_id, d2 FROM (
        |    SELECT label, vec_id, d2, ROW_NUMBER() OVER (
        |      PARTITION BY label ORDER BY d2 DESC, vec_id) AS rnk FROM member)
        |  WHERE rnk = 1)
        |SELECT n.label, n.n_vecs,
        |  CAST(round(sqrt(CAST(n.ss AS DOUBLE))
        |    / CAST(n.n_vecs * 1000000 AS DOUBLE), 6) AS DOUBLE) AS centroid_norm,
        |  o.vec_id AS outlier_vec_id,
        |  CAST(round(sqrt(CAST(o.d2 AS DOUBLE))
        |    / CAST(n.n_vecs * 1000000 AS DOUBLE), 6) AS DOUBLE) AS outlier_dist
        |FROM norm n JOIN outl o ON n.label = o.label ORDER BY n.label""".stripMargin,

    // content-defined chunking: boundaries at i=1 or md5_48(gram) % 64 = 0,
    // spans via lead, chunk identity by md5_48 — every hash reproduced
    "dedup_cdc" ->
      s"""WITH $corpusSql,
         |c AS (SELECT doc_id, text FROM corpus WHERE length(text) >= 8),
         |cuts AS (
         |  SELECT doc_id, text, i AS pos
         |  FROM c,
         |    LATERAL (SELECT unnest(generate_series(1, length(text) - 7)) AS i) t
         |  WHERE i = 1 OR ${h48Sql("substr(text, i, 8)")} % 64 = 0),
         |spans AS (
         |  SELECT doc_id, text, pos,
         |    LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS next
         |  FROM cuts),
         |chunks AS (
         |  SELECT doc_id,
         |    substr(text, pos, coalesce(next, length(text) + 1) - pos) AS chunk
         |  FROM spans)
         |SELECT ${h48Sql("chunk")} AS chunk_hash,
         |  COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
         |  MIN(doc_id) AS rep_doc,
         |  CAST(MAX(length(chunk)) AS BIGINT) AS chunk_len
         |FROM chunks GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin,

    "dedup_exact" ->
      s"""WITH $corpusSql
         |SELECT min(doc_id) AS kept_id, count(*) AS n_copies
         |FROM corpus GROUP BY md5(lower(trim(text)))
         |ORDER BY kept_id""".stripMargin,

    "dedup_near" ->
      s"""WITH $corpusSql,
         |$shingleSetsSql
         |SELECT sa.doc_id AS var_id, sb.doc_id AS base_id,
         |  round($jaccSql, 6) AS jacc
         |FROM ssets sa JOIN ssets sb
         |  ON sa.doc_id % 252000 >= 200000 AND sb.doc_id % 252000 < 200000
         |WHERE $jaccSql >= $JaccThreshold
         |ORDER BY var_id, base_id""".stripMargin,

    // salting never changes the result, so the salted declared query is
    // checked against the UNSALTED oracle — the strongest form of the
    // "skew mitigation is semantics-free" claim
    "dedup_near_salted" ->
      s"""WITH $corpusSql,
         |$shingleSetsSql
         |SELECT sa.doc_id AS var_id, sb.doc_id AS base_id,
         |  round($jaccSql, 6) AS jacc
         |FROM ssets sa JOIN ssets sb
         |  ON sa.doc_id % 252000 >= 200000 AND sb.doc_id % 252000 < 200000
         |WHERE $jaccSql >= $JaccThreshold
         |ORDER BY var_id, base_id""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $corpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') l FROM corpus),
         |$minhashSigSql,
         |bands AS (
         |$bandsSql),
         |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |ssets AS (SELECT doc_id, list_distinct($shinglesSql) sset FROM tok WHERE len(l) >= 3)
         |SELECT ia AS a, ib AS b, round($jaccSql, 6) AS jacc
         |FROM cand
         |  JOIN ssets sa ON sa.doc_id = ia
         |  JOIN ssets sb ON sb.doc_id = ib
         |WHERE $jaccSql >= $JaccThreshold
         |ORDER BY a, b""".stripMargin,

    // shard manifest: hash assignment + order-independent checksums
    "text_shard_manifest" ->
      s"""WITH a AS (
         |  SELECT ${h48Sql("'shard:' || doc_id")} % 8 AS shard,
         |    len(string_split(text, ' ')) AS toks, n_chars,
         |    ${h48Sql("text")} AS ch
         |  FROM documents),
         |tot AS (SELECT COUNT(*) AS n_total FROM documents)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |  CAST(CAST(SUM(CAST(ch AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |    % 2305843009213693951 AS BIGINT) AS checksum,
         |  CAST(round(CAST(COUNT(*) AS DOUBLE)
         |    / CAST(tot.n_total AS DOUBLE), 6) AS DOUBLE) AS share
         |FROM a CROSS JOIN tot
         |GROUP BY shard, tot.n_total ORDER BY shard""".stripMargin,

    "dedup_minhash_audit" ->
      s"""WITH $corpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') l FROM corpus),
         |$minhashSigSql,
         |bands AS (
         |$bandsSql),
         |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |ssets AS (SELECT doc_id, list_distinct($shinglesSql) sset FROM tok WHERE len(l) >= 3),
         |scored AS (
         |  SELECT ia AS a, ib AS b,
         |    round(CAST(${(0 until K).map(i =>
              s"(CASE WHEN x.mh_$i = y.mh_$i THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS DOUBLE) / 32.0, 6) AS est_jacc,
         |    round($jaccSql, 6) AS exact_jacc
         |  FROM cand
         |    JOIN sig x ON x.doc_id = ia
         |    JOIN sig y ON y.doc_id = ib
         |    JOIN ssets sa ON sa.doc_id = ia
         |    JOIN ssets sb ON sb.doc_id = ib)
         |SELECT a, b, est_jacc, exact_jacc,
         |  round(abs(est_jacc - exact_jacc), 6) AS abs_err
         |FROM scored ORDER BY a, b""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $corpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') l FROM corpus),
         |$simhashSigSql
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= $HammingMax
         |ORDER BY a, b""".stripMargin,

    "dedup_embed" ->
      s"""WITH $vecCorpusSql,
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id % 50 = 0),
         |lcells AS (
         |  SELECT vec_id, pe, cell FROM (
         |    SELECT v.vec_id, v.embedding AS pe, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${cosineSql("v.embedding", "c.cent")}, 6) DESC, c.cent_id) AS crnk
         |    FROM vcorpus v CROSS JOIN cents c WHERE v.vec_id % 30000 >= 10000)
         |  WHERE crnk <= 3),
         |rcells AS (
         |  SELECT vec_id, be, cell FROM (
         |    SELECT b.vec_id, b.embedding AS be, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
         |        ORDER BY round(${cosineSql("b.embedding", "c.cent")}, 6) DESC, c.cent_id) AS crnk
         |    FROM vcorpus b CROSS JOIN cents c WHERE b.vec_id % 30000 < 10000)
         |  WHERE crnk = 1)
         |SELECT l.vec_id AS var_id, r.vec_id AS base_id,
         |  round(${cosineSql("l.pe", "r.be")}, 6) AS cos
         |FROM lcells l JOIN rcells r ON l.cell = r.cell
         |WHERE ${cosineSql("l.pe", "r.be")} >= 0.999
         |ORDER BY var_id, base_id""".stripMargin,

    // full sign-LSH mirror: plane ranks, rounded-dot sign bits, 3×4-bit
    // band keys, band equi-join, exact-cosine verify — all re-derived
    "dedup_embed_lsh" ->
      s"""WITH $vecCorpusSql,
         |planes AS (
         |  SELECT vec_id AS pid, embedding AS pvec
         |  FROM embeddings WHERE vec_id < 12),
         |lsig AS (
         |  SELECT v.vec_id, CAST(FLOOR(p.pid / 4) AS INT) AS band,
         |    SUM((CASE WHEN round(${dotSql("v.embedding", "p.pvec")}, 6) >= 0
         |           THEN 1 ELSE 0 END)
         |      * (CASE CAST(p.pid % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2
         |           WHEN 2 THEN 4 ELSE 8 END)) AS bkey
         |  FROM vcorpus v CROSS JOIN planes p WHERE v.vec_id % 30000 >= 10000
         |  GROUP BY v.vec_id, CAST(FLOOR(p.pid / 4) AS INT)),
         |rsig AS (
         |  SELECT v.vec_id, CAST(FLOOR(p.pid / 4) AS INT) AS band,
         |    SUM((CASE WHEN round(${dotSql("v.embedding", "p.pvec")}, 6) >= 0
         |           THEN 1 ELSE 0 END)
         |      * (CASE CAST(p.pid % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2
         |           WHEN 2 THEN 4 ELSE 8 END)) AS bkey
         |  FROM vcorpus v CROSS JOIN planes p WHERE v.vec_id % 30000 < 10000
         |  GROUP BY v.vec_id, CAST(FLOOR(p.pid / 4) AS INT)),
         |cands AS (
         |  SELECT DISTINCT l.vec_id AS var_id, r.vec_id AS base_id
         |  FROM lsig l JOIN rsig r ON l.band = r.band AND l.bkey = r.bkey)
         |SELECT c.var_id, c.base_id,
         |  round(${cosineSql("lv.embedding", "rv.embedding")}, 6) AS cos
         |FROM cands c
         |JOIN vcorpus lv ON lv.vec_id = c.var_id
         |JOIN vcorpus rv ON rv.vec_id = c.base_id
         |WHERE ${cosineSql("lv.embedding", "rv.embedding")} >= 0.999
         |ORDER BY var_id, base_id""".stripMargin,

    // exact MIPS over the planted-variant corpus: same round-6 ranking
    // discipline as sim_topk, dot product instead of cosine
    "sim_topk_mips" ->
      s"""WITH $vecCorpusSql,
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    round(${dotSql("p.embedding", "c.embedding")}, 6) AS dot
         |  FROM vcorpus p JOIN vcorpus c
         |    ON p.vec_id % 30000 >= 10000 AND c.vec_id % 30000 < 10000),
         |ranked AS (
         |  SELECT probe_id, cand_id, dot,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY dot DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, dot
         |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    "sim_topk" ->
      s"""WITH scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    round(${cosineSql("p.embedding", "c.embedding")}, 6) AS cos
         |  FROM embeddings p JOIN embeddings c ON p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |ranked AS (
         |  SELECT probe_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos
         |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // PQ-ADC search: integer micro-unit mirror of the Spark plan
    "sim_topk_pq" ->
      """WITH q AS (SELECT vec_id, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS qd,
        |    ((i - 1) // 16) * 16 AS sub
        |  FROM embeddings, LATERAL
        |    (SELECT unnest(generate_series(1, 64)) AS i) g),
        |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
        |cents AS (SELECT q.vec_id AS cid, dim, qd AS cv
        |          FROM q JOIN seeds USING (vec_id)),
        |d2c AS (SELECT q.vec_id, q.sub, c.cid,
        |    SUM((q.qd - c.cv) * (q.qd - c.cv)) AS cd2
        |  FROM q JOIN cents c ON q.dim = c.dim
        |  GROUP BY q.vec_id, q.sub, c.cid),
        |codes AS (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id, sub ORDER BY cd2, cid) AS rnk FROM d2c)
        |  WHERE rnk = 1),
        |probes AS (
        |  SELECT vec_id AS probe_id, dim, qd AS pd FROM q WHERE vec_id < 10),
        |adc AS (SELECT p.probe_id, c.cid, ((p.dim) // 16) * 16 AS sub,
        |    SUM((p.pd - c.cv) * (p.pd - c.cv)) AS pd2
        |  FROM probes p JOIN cents c ON p.dim = c.dim
        |  GROUP BY p.probe_id, c.cid, ((p.dim) // 16) * 16),
        |approx AS (
        |  SELECT probe_id, vec_id, SUM(pd2) AS adc_d2
        |  FROM codes JOIN adc USING (sub, cid)
        |  WHERE vec_id <> probe_id GROUP BY probe_id, vec_id),
        |cand AS (SELECT probe_id, vec_id, adc_d2 FROM (
        |    SELECT probe_id, vec_id, adc_d2, ROW_NUMBER() OVER (
        |      PARTITION BY probe_id ORDER BY adc_d2, vec_id) AS crk
        |    FROM approx) WHERE crk <= 12),
        |ex AS (
        |  SELECT cand.probe_id, cand.vec_id, cand.adc_d2,
        |    SUM((q.qd - p.pd) * (q.qd - p.pd)) AS d2
        |  FROM cand JOIN q ON cand.vec_id = q.vec_id
        |  JOIN probes p ON p.probe_id = cand.probe_id AND p.dim = q.dim
        |  GROUP BY cand.probe_id, cand.vec_id, cand.adc_d2)
        |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
        |  CAST(adc_d2 AS BIGINT) AS adc_d2, CAST(d2 AS BIGINT) AS d2
        |FROM (SELECT probe_id, vec_id, adc_d2, d2, ROW_NUMBER() OVER (
        |    PARTITION BY probe_id ORDER BY d2, vec_id) AS rnk FROM ex)
        |WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin,

    // the persisted-index probe must return exactly the in-flight IVF
    // routing's answer — one oracle text pins both
    "sim_index_persist" -> simTopkIvfSql,
    "sim_index_delta" -> simTopkIvfSql,
    "sim_topk_ivf" -> simTopkIvfSql,
  ) ++ oraclesRest

  /** Shared oracle for [[simTopkIvf]] and [[simIndexPersist]]. */
  private lazy val simTopkIvfSql: String =
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id % 50 = 0),
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosineSql("e.embedding", "c.cent")}, 6) DESC, c.cent_id) AS arnk
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE arnk = 1),
         |cells AS (
         |  SELECT e.vec_id AS cand_id, a.cell, e.embedding AS ce
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         |probe_cells AS (
         |  SELECT probe_id, pe, cell FROM (
         |    SELECT p.vec_id AS probe_id, p.embedding AS pe, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY round(${cosineSql("p.embedding", "c.cent")}, 6) DESC, c.cent_id) AS prnk
         |    FROM embeddings p CROSS JOIN cents c WHERE p.vec_id < 10)
         |  WHERE prnk <= 3),
         |scored AS (
         |  SELECT pc.probe_id, s.cand_id,
         |    round(${cosineSql("pc.pe", "s.ce")}, 6) AS cos
         |  FROM probe_cells pc JOIN cells s ON pc.cell = s.cell
         |  WHERE s.cand_id <> pc.probe_id),
         |ranked AS (
         |  SELECT probe_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos
         |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin

  private lazy val oraclesRest: Map[String, String] = Map(
    "sim_knn_join" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id % 50 = 0),
         |ranked_cells AS (
         |  SELECT vec_id, embedding, cell, crnk FROM (
         |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosineSql("e.embedding", "c.cent")}, 6) DESC, c.cent_id) AS crnk
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE crnk <= 3),
         |cells AS (SELECT vec_id AS cand_id, embedding AS ce, cell
         |          FROM ranked_cells WHERE crnk = 1),
         |probes AS (SELECT vec_id AS probe_id, embedding AS pe, cell FROM ranked_cells),
         |scored AS (
         |  SELECT p.probe_id, s.cand_id, round(${cosineSql("p.pe", "s.ce")}, 6) AS cos
         |  FROM probes p JOIN cells s ON p.cell = s.cell
         |  WHERE s.cand_id <> p.probe_id),
         |ranked AS (
         |  SELECT probe_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos
         |FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin,

    // split manifest: the same salted md5-48 gate re-derived
    "sample_split" ->
      s"""WITH g AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
         |    CASE ${h48Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
         |      WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split
         |  FROM documents)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM g GROUP BY split ORDER BY split""".stripMargin,

    // OOV audit: same deterministic top-256 vocab, left-join membership
    "text_oov_rate" ->
      """WITH tokr AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |vc AS (SELECT tok, COUNT(*) AS c FROM tokr GROUP BY tok),
        |vocab AS (SELECT tok FROM vc ORDER BY c DESC, tok LIMIT 256)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
        |FROM tokr t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // recall audit: brute + IVF chains composed, left-join hit counting
    "sim_recall_audit" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id % 50 = 0),
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosineSql("e.embedding", "c.cent")}, 6) DESC, c.cent_id) AS arnk
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE arnk = 1),
         |icells AS (
         |  SELECT e.vec_id AS cand_id, a.cell, e.embedding AS ce
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         |probe_cells AS (
         |  SELECT probe_id, pe, cell FROM (
         |    SELECT p.vec_id AS probe_id, p.embedding AS pe, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY round(${cosineSql("p.embedding", "c.cent")}, 6) DESC, c.cent_id) AS prnk
         |    FROM embeddings p CROSS JOIN cents c WHERE p.vec_id < 10)
         |  WHERE prnk <= 3),
         |iscored AS (
         |  SELECT pc.probe_id, s.cand_id,
         |    round(${cosineSql("pc.pe", "s.ce")}, 6) AS cos
         |  FROM probe_cells pc JOIN icells s ON pc.cell = s.cell
         |  WHERE s.cand_id <> pc.probe_id),
         |ivf AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |    FROM iscored) WHERE rnk <= 5),
         |bscored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    round(${cosineSql("p.embedding", "c.embedding")}, 6) AS cos
         |  FROM embeddings p JOIN embeddings c ON p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |brute AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |    FROM bscored) WHERE rnk <= 5)
         |SELECT b.probe_id, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  round(CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS recall
         |FROM brute b LEFT JOIN ivf i
         |  ON b.probe_id = i.probe_id AND b.cand_id = i.cand_id
         |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin,

    // savings report: the dedup_cluster closure + corpus byte sizes
    "dedup_report" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shingleSetsSql,
         |pairs AS (
         |  SELECT sa.doc_id AS a, sb.doc_id AS b
         |  FROM ssets sa JOIN ssets sb
         |    ON sa.doc_id % 252000 >= 200000 AND sb.doc_id % 252000 < 200000
         |  WHERE $jaccSql >= $JaccThreshold),
         |edges AS (SELECT a AS x, b AS y FROM pairs
         |          UNION SELECT b, a FROM pairs),
         |nodes AS (SELECT DISTINCT x AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.x AS id, reach.r FROM edges e JOIN reach ON e.y = reach.id),
         |comp AS (SELECT id AS doc_id, min(r) AS cluster_root
         |  FROM reach GROUP BY id),
         |csized AS (SELECT c.doc_id, c.cluster_root, length(co.text) AS n_chars
         |  FROM comp c JOIN corpus co ON c.doc_id = co.doc_id)
         |SELECT cluster_root, COUNT(*) AS n_docs,
         |  CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped,
         |  CAST(SUM(CASE WHEN doc_id <> cluster_root THEN n_chars ELSE 0 END)
         |    AS BIGINT) AS bytes_dropped,
         |  CAST(SUM(n_chars) AS BIGINT) AS bytes_total,
         |  round(CAST(SUM(CASE WHEN doc_id <> cluster_root THEN n_chars ELSE 0 END)
         |      AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE), 6) AS savings_pct
         |FROM csized GROUP BY cluster_root ORDER BY cluster_root""".stripMargin,

    // bloom-gated dedup: the oracle is the PLAIN hash join — the bloom
    // prefilter is a superset + exact verify, so it must change nothing
    "dedup_bloom" ->
      s"""WITH $corpusSql,
         |base AS (SELECT doc_id AS base_id,
         |    ${h48Sql("lower(trim(text))")} AS hv
         |  FROM corpus WHERE doc_id % 252000 < 100000),
         |batch AS (SELECT doc_id, ${h48Sql("lower(trim(text))")} AS hv
         |  FROM corpus WHERE doc_id % 252000 >= 100000)
         |SELECT b.doc_id, MIN(s.base_id) AS base_id, COUNT(*) AS n_base
         |FROM batch b JOIN base s ON b.hv = s.hv
         |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,

    // URL canonicalization: same regex chain, 'g' flags (Spark
    // regexp_replace is global by default)
    "dedup_url" ->
      raw"""WITH u AS (
           |  SELECT doc_id,
           |    (CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
           |    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
           |    source || '.Example.com' ||
           |    (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
           |    '/docs/' || CAST(doc_id % 100 AS VARCHAR) ||
           |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
           |    (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END) ||
           |    (CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END) AS url
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, url,
           |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |      regexp_replace(regexp_replace(regexp_replace(lower(url),
           |      '#.*$$', '', 'g'),
           |      '[?&]utm_[^&#]*', '', 'g'),
           |      '\?&', '?', 'g'),
           |      '\?$$', '', 'g'),
           |      '://www\.', '://', 'g'),
           |      ':443/', '/', 'g'),
           |      '/$$', '', 'g') AS curl
           |  FROM u)
           |SELECT curl, COUNT(*) AS n_docs,
           |  COUNT(DISTINCT url) AS n_variants, MIN(doc_id) AS rep_doc_id
           |FROM c GROUP BY curl ORDER BY curl""".stripMargin,

    // linear quality classifier: every feature rounds to 6 BEFORE the
    // linear form (fixed IEEE multiply-add order both engines); keep
    // decides on the unrounded margin
    "text_quality_lr" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    round(least(1.0,
        |      CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0), 6) AS x_len,
        |    round(CAST(len(list_filter(string_split(text, ' '),
        |        x -> x IN ('the', 'a', 'value', 'data'))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS x_stop,
        |    round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE), 6) AS x_alpha,
        |    round(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS x_wlen,
        |    round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE), 6) AS x_digit
        |  FROM documents),
        |z AS (
        |  SELECT doc_id, x_len, x_stop, x_alpha, x_wlen, x_digit,
        |    -1.5 + 2.1 * x_len - 3.0 * x_stop + 1.8 * x_alpha
        |      + 0.12 * x_wlen - 2.5 * x_digit AS zv
        |  FROM f)
        |SELECT doc_id, x_len, x_stop, x_alpha, x_wlen, x_digit,
        |  round(zv, 6) AS z,
        |  round(1.0 / (1.0 + exp(-zv)), 6) AS p_keep,
        |  zv > 0.0 AS keep
        |FROM z ORDER BY doc_id""".stripMargin,

    // matryoshka audit: prefix dots re-derived positionally; winners by
    // (rounded cos desc, cand asc) row_number — equals the engine's
    // lexicographic struct-max
    "embed_matryoshka" -> {
      def dotK(a: String, b: String, k: Int): String =
        s"(SELECT sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)) FROM range(1, ${k + 1}) r(i))"
      def cosK(k: Int): String =
        s"round(${dotK("p.pe", "e.embedding", k)} / (sqrt(${dotK("p.pe", "p.pe", k)}) * sqrt(${dotK("e.embedding", "e.embedding", k)})), 6)"
      s"""WITH probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 10),
         |pairs AS (
         |  SELECT p.probe_id, e.vec_id AS cand_id,
         |    ${cosK(16)} AS c16, ${cosK(32)} AS c32, ${cosK(64)} AS c64
         |  FROM embeddings e CROSS JOIN probes p WHERE e.vec_id <> p.probe_id),
         |r AS (
         |  SELECT probe_id, cand_id, c16, c32, c64,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY c16 DESC, cand_id) AS r16,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY c32 DESC, cand_id) AS r32,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY c64 DESC, cand_id) AS r64
         |  FROM pairs)
         |SELECT probe_id,
         |  MAX(CASE WHEN r16 = 1 THEN cand_id END) AS top1_16,
         |  MAX(CASE WHEN r16 = 1 THEN c16 END) AS cos_16,
         |  MAX(CASE WHEN r32 = 1 THEN cand_id END) AS top1_32,
         |  MAX(CASE WHEN r32 = 1 THEN c32 END) AS cos_32,
         |  MAX(CASE WHEN r64 = 1 THEN cand_id END) AS top1_64,
         |  MAX(CASE WHEN r64 = 1 THEN c64 END) AS cos_64,
         |  (MAX(CASE WHEN r16 = 1 THEN cand_id END)
         |    = MAX(CASE WHEN r64 = 1 THEN cand_id END)) AS agree_16,
         |  (MAX(CASE WHEN r32 = 1 THEN cand_id END)
         |    = MAX(CASE WHEN r64 = 1 THEN cand_id END)) AS agree_32
         |FROM r GROUP BY probe_id ORDER BY probe_id""".stripMargin
    },

    // semantic dedup: the sim_knn_join chain on the planted-variant
    // corpus, thresholded, then the dedup_cluster WITH RECURSIVE closure
    "dedup_semantic" ->
      s"""WITH RECURSIVE $vecCorpusSql,
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id % 50 = 0),
         |ranked_cells AS (
         |  SELECT vec_id, embedding, cell, crnk FROM (
         |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosineSql("e.embedding", "c.cent")}, 6) DESC, c.cent_id) AS crnk
         |    FROM vcorpus e CROSS JOIN cents c)
         |  WHERE crnk <= 3),
         |cells AS (SELECT vec_id AS cand_id, embedding AS ce, cell
         |          FROM ranked_cells WHERE crnk = 1),
         |probes AS (SELECT vec_id AS probe_id, embedding AS pe, cell FROM ranked_cells),
         |scored AS (
         |  SELECT p.probe_id, s.cand_id, round(${cosineSql("p.pe", "s.ce")}, 6) AS cos
         |  FROM probes p JOIN cells s ON p.cell = s.cell
         |  WHERE s.cand_id <> p.probe_id),
         |knn AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id, cos,
         |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
         |    FROM scored)
         |  WHERE rnk <= 3 AND cos >= 0.999),
         |edges AS (SELECT probe_id AS x, cand_id AS y FROM knn
         |          UNION SELECT cand_id, probe_id FROM knn),
         |nodes AS (SELECT DISTINCT x AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.x AS id, reach.r FROM edges e JOIN reach ON e.y = reach.id)
         |SELECT id AS vec_id, min(r) AS cluster_root,
         |  (id = min(r)) AS is_rep
         |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,

    // int8 min-max quantization: DuckDB zips parallel unnests, so
    // (value, dimension-index) pairs come from one pass; the arithmetic
    // is the same fixed IEEE sequence as the Spark HOF
    "embed_quantize" ->
      """WITH ex AS (
        |  SELECT vec_id, label,
        |    CAST(unnest(embedding) AS DOUBLE) AS x,
        |    unnest(range(len(embedding))) AS dim
        |  FROM embeddings),
        |stats AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim),
        |codes AS (
        |  SELECT vec_id, label,
        |    CASE WHEN mx > mn THEN
        |      CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
        |        floor((x - mn) * CAST(255 AS DOUBLE) / (mx - mn)))) AS BIGINT)
        |    ELSE 0 END AS code
        |  FROM ex JOIN stats USING (dim))
        |SELECT label, COUNT(DISTINCT vec_id) AS n_vecs,
        |  CAST(SUM(code) AS BIGINT) AS sum_codes,
        |  MIN(code) AS min_code, MAX(code) AS max_code
        |FROM codes GROUP BY label ORDER BY label""".stripMargin,

    "dedup_contaminate" ->
      s"""WITH $corpusSql,
         |shard AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS l
         |          FROM corpus WHERE doc_id % 252000 >= 100000),
         |bench AS (SELECT doc_id AS eval_id, string_split(lower(trim(text)), ' ') AS l
         |          FROM documents WHERE doc_id % 7 = 0 OR doc_id % 10 = 0),
         |sg AS (SELECT doc_id, ${h48Sql("g")} AS hv FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(l) - 11),
         |    i -> array_to_string(l[CAST(i AS INT):CAST(i AS INT) + 12], ' '))) AS g
         |  FROM shard WHERE len(l) >= 13)),
         |bg AS (SELECT DISTINCT eval_id, ${h48Sql("g")} AS hv FROM (
         |  SELECT eval_id, unnest(list_transform(range(1, len(l) - 11),
         |    i -> array_to_string(l[CAST(i AS INT):CAST(i AS INT) + 12], ' '))) AS g
         |  FROM bench WHERE len(l) >= 13))
         |SELECT s.doc_id,
         |  count(DISTINCT s.hv) AS n_gram_hits,
         |  count(DISTINCT b.eval_id) AS n_eval_docs
         |FROM sg s JOIN bg b ON s.hv = b.hv
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,

    "text_pii" ->
      raw"""WITH pii AS (
           |  SELECT doc_id,
           |    text ||
           |    CASE WHEN doc_id % 3 = 0 THEN ' contact ' || source ||
           |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
           |    CASE WHEN doc_id % 4 = 0 THEN ' from 10.' ||
           |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
           |      CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
           |      CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END ||
           |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-' ||
           |      CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
           |      CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END AS ptext
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(ptext, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(ptext, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           |  CAST(len(regexp_extract_all(ptext, '\b555-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
           |  regexp_replace(regexp_replace(regexp_replace(ptext,
           |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           |    '\b555-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
           |FROM pii ORDER BY doc_id""".stripMargin,

    "text_stats" ->
      """SELECT d.lang, d.source, n_docs, avg_chars, n_tokens, n_vocab
        |FROM (SELECT lang, source, count(*) AS n_docs,
        |        CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |      FROM documents GROUP BY lang, source) d
        |JOIN (SELECT lang, source, count(*) AS n_tokens,
        |        count(DISTINCT tok) AS n_vocab
        |      FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS tok
        |            FROM documents)
        |      GROUP BY lang, source) t
        |  ON d.lang = t.lang AND d.source = t.source
        |ORDER BY d.lang, d.source""".stripMargin,

    "text_lang" ->
      """SELECT doc_id, lang,
        |  CASE WHEN en_score >= 2 THEN 'en' ELSE 'und' END AS predicted,
        |  en_score,
        |  (CASE WHEN en_score >= 2 THEN 'en' ELSE 'und' END) = lang AS agree
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'data', 'value'))) AS BIGINT) AS en_score
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """SELECT doc_id, n_tok,
        |  round(stop_ratio, 6) AS stop_ratio,
        |  round(alpha_ratio, 6) AS alpha_ratio,
        |  round(0.3 * least(1.0, CAST(n_tok AS DOUBLE) / 100.0)
        |      + 0.4 * (1.0 - stop_ratio)
        |      + 0.3 * alpha_ratio, 6) AS score
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |        x -> x IN ('the', 'a', 'value', 'data'))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS alpha_ratio
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // same score formula as text_quality (bit-exact, proven by that
    // oracle), fixed tier thresholds, md5_48 hash gate, inverse-rate weight
    "text_curriculum" ->
      s"""WITH $curriculumKeptSql
         |SELECT doc_id, tier,
         |  CAST(100.0 AS DOUBLE) / CAST(rate AS DOUBLE) AS weight
         |FROM kept ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS BIGINT) AS bpe_ish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_unigram_lm" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
        |  CAST(LEAST(COUNT(*), 24) + 1 AS BIGINT) AS v_size FROM counts),
        |vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 24),
        |scored AS (SELECT t.doc_id,
        |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov,
        |    round(ln(CAST(coalesce(v.c, 0) + 1 AS DOUBLE)
        |      / (s.n_total + s.v_size)), 8) AS logp
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok CROSS JOIN scal s),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_tok, CAST(SUM(oov) AS BIGINT) AS n_oov,
        |    CAST(SUM(CAST(logp AS DECIMAL(20,8))) * 100000000 AS BIGINT) AS s8
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_tok, n_oov,
        |  CAST(CASE WHEN s8 >= 0 THEN (s8 * 2 + n_tok * 100) // (n_tok * 200)
        |       ELSE -((-s8 * 2 + n_tok * 100) // (n_tok * 200)) END AS DOUBLE)
        |    / 1000000.0 AS mean_logp
        |FROM agg ORDER BY doc_id""".stripMargin,

    "text_bigram_lm" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |big AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l)-1)) AS i) g),
        |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
        |c1t AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT w2) + 1 AS v FROM big),
        |scored AS (SELECT b.doc_id,
        |    round(ln(CAST(bg.c12 + 1 AS DOUBLE) / (c1t.c1 + v.v)), 8) AS logp
        |  FROM big b JOIN bg ON b.w1 = bg.w1 AND b.w2 = bg.w2
        |  JOIN c1t ON b.w1 = c1t.w1 CROSS JOIN v),
        |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(CAST(logp AS DECIMAL(20,8))) * 100000000 AS BIGINT) AS s8
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  CAST(CASE WHEN s8 >= 0 THEN (s8 * 2 + n_bigrams * 100) // (n_bigrams * 200)
        |       ELSE -((-s8 * 2 + n_bigrams * 100) // (n_bigrams * 200)) END AS DOUBLE)
        |    / 1000000.0 AS mean_logp
        |FROM agg ORDER BY doc_id""".stripMargin,

    "text_normalize" ->
      raw"""SELECT doc_id,
           |  array_to_string(list_filter(
           |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
           |    t -> t NOT IN ('a', 'the') AND t <> ''), ' ') AS norm_text,
           |  CAST(len(list_filter(
           |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
           |    t -> t NOT IN ('a', 'the') AND t <> '')) AS BIGINT) AS n_tokens_norm
           |FROM documents ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |stats AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n,
        |  round(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 4) AS ttr
        |  FROM tok),
        |big AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS bg
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l)-1)) AS i) g),
        |mx AS (SELECT doc_id, MAX(c) AS mc FROM
        |  (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg)
        |  GROUP BY doc_id)
        |SELECT s.doc_id, s.n AS n_tokens, s.ttr,
        |  round(CAST(m.mc AS DOUBLE) / (s.n - 1), 4) AS top_bigram_frac
        |FROM stats s JOIN mx m ON s.doc_id = m.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "dedup_cluster" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shingleSetsSql,
         |pairs AS (
         |  SELECT sa.doc_id AS a, sb.doc_id AS b
         |  FROM ssets sa JOIN ssets sb
         |    ON sa.doc_id % 252000 >= 200000 AND sb.doc_id % 252000 < 200000
         |  WHERE $jaccSql >= $JaccThreshold),
         |edges AS (SELECT a AS x, b AS y FROM pairs
         |          UNION SELECT b, a FROM pairs),
         |nodes AS (SELECT DISTINCT x AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.x AS id, reach.r FROM edges e JOIN reach ON e.y = reach.id)
         |SELECT id AS doc_id, min(r) AS cluster_root
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "text_winnow" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    list_transform(range(1, length(text) - 6),
         |      i -> ${h48Sql("substr(text, CAST(i AS INT), 8)")}) AS grams
         |  FROM documents WHERE length(text) >= 23),
         |w AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(grams) - 14),
         |      j -> list_min(grams[CAST(j AS INT):CAST(j AS INT)+15]))) AS fp
         |  FROM g)
         |SELECT doc_id, unnest(fp) AS hv FROM w ORDER BY doc_id, hv""".stripMargin,

    "dedup_winnow" ->
      s"""WITH $corpusSql,
         |g AS (
         |  SELECT doc_id,
         |    list_transform(range(1, length(text) - 6),
         |      i -> ${h48Sql("substr(text, CAST(i AS INT), 8)")}) AS grams
         |  FROM corpus WHERE length(text) >= 23),
         |w AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(grams) - 14),
         |      j -> list_min(grams[CAST(j AS INT):CAST(j AS INT)+15]))) AS fp
         |  FROM g),
         |f AS (SELECT doc_id, unnest(fp) AS hv FROM w),
         |rare AS (SELECT hv FROM f GROUP BY hv HAVING count(*) <= 8),
         |fk AS (SELECT f.doc_id, f.hv FROM f JOIN rare USING (hv))
         |SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
         |FROM fk x JOIN fk y ON x.hv = y.hv AND x.doc_id < y.doc_id
         |GROUP BY x.doc_id, y.doc_id
         |HAVING count(*) >= 2
         |ORDER BY a, b""".stripMargin,

    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_total FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    round(tf.tf * ln(CAST(n.n_total + 1 AS DOUBLE) / (df.df + 1)), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, score
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "text_fingerprint" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct($shinglesSql)) s
         |       FROM tok WHERE len(l) >= 3),
         |hv AS (SELECT doc_id, ${h48Sql("s")} AS hv FROM sh),
         |ranked AS (SELECT doc_id, hv,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hv) AS rnk
         |  FROM hv)
         |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, hv
         |FROM ranked WHERE rnk <= 8 ORDER BY doc_id, rnk""".stripMargin,

    "multimodal_join" ->
      s"""SELECT d.lang, e.label, count(*) AS n,
         |  CAST(sum(d.n_chars) AS DOUBLE) / count(*) AS avg_chars,
         |  round(CAST(sum(CAST(round(sqrt(${dotSql("e.embedding", "e.embedding")}), 6) AS DECIMAL(20,8))) AS DOUBLE) / count(*), 6) AS avg_l2
         |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         |GROUP BY d.lang, e.label ORDER BY d.lang, e.label""".stripMargin,

    "text_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t)
        |SELECT lang, CAST(floor(cum_before / 2048.0) AS BIGINT) AS seq,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc,
        |  round(CAST(SUM(n_tok) AS BIGINT) / 2048.0, 4) AS fill_ratio
        |FROM c GROUP BY lang, CAST(floor(cum_before / 2048.0) AS BIGINT)
        |ORDER BY lang, seq""".stripMargin,

    "text_chunk" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |c AS (
        |  SELECT doc_id, l, len(l) AS n_tok,
        |    unnest(range(0, greatest(1,
        |      CAST(floor((len(l) - 17) / 48.0) AS BIGINT) + 1))) AS chunk_idx
        |  FROM tok)
        |SELECT doc_id, chunk_idx, chunk_idx * 48 AS chunk_start,
        |  least(64, n_tok - chunk_idx * 48) AS chunk_len,
        |  md5(array_to_string(list_slice(l, chunk_idx * 48 + 1,
        |    chunk_idx * 48 + least(64, n_tok - chunk_idx * 48)), ' '))
        |    AS chunk_hash
        |FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "text_bpe_pairs" ->
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS l FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |p AS (
        |  SELECT unnest(list_transform(list_slice(list_zip(l, l[2:]),
        |    1, len(l) - 1), x -> x[1] || ' ' || x[2])) AS pair
        |  FROM tok)
        |SELECT pair, count(*) AS pair_count
        |FROM p GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,

    "text_mixture" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |rates AS (
        |  SELECT lang, n_docs,
        |    ((SELECT min(n_docs) FROM counts) * 10000) // n_docs AS rate_bp
        |  FROM counts)
        |SELECT lang, n_docs, rate_bp, count(*) AS n_kept
        |FROM documents JOIN rates USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
        |        AS BIGINT) % 10000 < rate_bp
        |GROUP BY lang, n_docs, rate_bp
        |ORDER BY lang""".stripMargin,

    // the whole pipeline as one CTE chain: the oracle re-derives every
    // stage (normalize → gate → exact dedup → NAIVE quadratic near-dedup
    // → pack) — the prefix filter provably changes nothing, so the rows
    // must match the lazy composed Spark plan exactly
    "pipeline_e2e" ->
      s"""WITH $corpusSql,
         |norm AS (SELECT doc_id,
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS ntext
         |  FROM corpus),
         |gated AS (SELECT doc_id, ntext,
         |    CAST(len(string_split(ntext, ' ')) AS BIGINT) AS n_tok
         |  FROM norm WHERE len(string_split(ntext, ' ')) >= 15),
         |exact AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(ntext)),
         |kept AS (SELECT g.doc_id, g.ntext, g.n_tok
         |  FROM gated g JOIN exact e USING (doc_id)),
         |ktok AS (SELECT doc_id, string_split(ntext, ' ') l FROM kept),
         |ksets AS (SELECT doc_id, list_distinct($shinglesSql) sset
         |  FROM ktok WHERE len(l) >= 3),
         |drops AS (SELECT DISTINCT sa.doc_id
         |  FROM ksets sa JOIN ksets sb
         |    ON sa.doc_id % 252000 >= 200000 AND sb.doc_id % 252000 < 200000
         |  WHERE $jaccSql >= 0.7),
         |surv AS (SELECT k.doc_id, k.n_tok FROM kept k
         |  LEFT JOIN drops dr ON k.doc_id = dr.doc_id WHERE dr.doc_id IS NULL),
         |packed AS (SELECT s.doc_id, s.n_tok, doc.lang,
         |    COALESCE(SUM(s.n_tok) OVER (PARTITION BY doc.lang ORDER BY s.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM surv s JOIN documents doc ON doc.doc_id = s.doc_id - 100000 * CAST(FLOOR(CAST(s.doc_id % 252000 AS DOUBLE) / 100000.0) AS BIGINT))
         |SELECT lang, CAST(floor(cum_before / 1024.0) AS BIGINT) AS seq,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_doc,
         |  round(CAST(SUM(n_tok) AS BIGINT) / 1024.0, 4) AS fill_ratio
         |FROM packed GROUP BY lang, CAST(floor(cum_before / 1024.0) AS BIGINT)
         |ORDER BY lang, seq""".stripMargin,

    // same exact integer micro-unit arithmetic as the Spark plan: quantize
    // → seed on the 4 lowest vec_ids → (assign → update) × 2 → cluster
    // sizes; every distance/mean is integer-exact so rows are bit-equal
    "cluster_kmeans" ->
      """WITH q AS (
        |  SELECT vec_id, i.i AS dim,
        |    CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
        |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
        |c0 AS (SELECT q.vec_id AS cluster, dim, v AS c
        |       FROM q JOIN seeds USING (vec_id)),
        |d1 AS (SELECT q.vec_id, c0.cluster,
        |         SUM((q.v - c0.c) * (q.v - c0.c)) AS d2
        |       FROM q JOIN c0 ON q.dim = c0.dim GROUP BY q.vec_id, c0.cluster),
        |a1 AS (SELECT vec_id, cluster FROM (
        |         SELECT vec_id, cluster, ROW_NUMBER() OVER (
        |           PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d1)
        |       WHERE rn = 1),
        |c1 AS (SELECT a1.cluster, q.dim,
        |         CAST(floor(CAST(2 * SUM(q.v) + COUNT(*) AS DOUBLE)
        |           / CAST(2 * COUNT(*) AS DOUBLE)) AS BIGINT) AS c
        |       FROM q JOIN a1 USING (vec_id) GROUP BY a1.cluster, q.dim),
        |d2_ AS (SELECT q.vec_id, c1.cluster,
        |          SUM((q.v - c1.c) * (q.v - c1.c)) AS d2
        |        FROM q JOIN c1 ON q.dim = c1.dim GROUP BY q.vec_id, c1.cluster),
        |a2 AS (SELECT vec_id, cluster FROM (
        |         SELECT vec_id, cluster, ROW_NUMBER() OVER (
        |           PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d2_)
        |       WHERE rn = 1)
        |SELECT cluster, COUNT(*) AS n_vecs, MIN(vec_id) AS rep_vec_id
        |FROM a2 GROUP BY cluster ORDER BY cluster""".stripMargin,
  )
}
