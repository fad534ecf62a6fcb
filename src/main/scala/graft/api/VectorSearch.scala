package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.FloatDotProduct.fdot

/** Similarity search over `array<float>` embedding columns — public API.
  *
  * All cosine math runs on the native codegen'd
  * [[graft.expr.FloatDotProduct]] with L2 norms precomputed once per
  * vector, so every candidate pair costs ONE fused dot-product loop.
  * Cosines are rounded (`roundTo`, default 6) BEFORE ranking so top-k
  * ties resolve identically on any engine; rank ties break by candidate
  * id — total order, deterministic at any partition count.
  */
object VectorSearch {

  /** (id, vec) → (id, vec, norm). */
  def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("norm", sqrt(fdot(col(vecCol), col(vecCol))))

  private def cos(pe: Column, ce: Column, pn: Column, cn: Column, roundTo: Int) =
    round(fdot(pe, ce) / (pn * cn), roundTo)

  /** Exact brute-force top-k: probes broadcast against the candidate scan;
    * per-probe top-k is a partitioned window (no global sort). Output:
    * (probe_id, rnk, cand_id, cos). */
  def topK(probes: DataFrame, cands: DataFrame, idCol: String, vecCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pe"), col("norm").as("pn"))
    val c = withNorm(cands, vecCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("ce"), col("norm").as("cn"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos", cos(col("pe"), col("ce"), col("pn"), col("cn"), roundTo))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), col("cos"))
  }

  /** Exact brute-force MAXIMUM-INNER-PRODUCT top-k (the retrieval order
    * for dot-product-trained embedding models — recommendation and
    * dual-encoder retrieval score by ⟨q, x⟩, where a large-norm item can
    * out-rank a better-aligned small one; [[topK]]'s cosine normalizes
    * that away, so the two orders genuinely differ): probes broadcast
    * against the candidate scan; rank on the round-`roundTo` dot product
    * (ties → cand_id) so the order is engine-reproducible. Output:
    * (probe_id, rnk, cand_id, dot). */
  def mipsTopK(probes: DataFrame, cands: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pe"))
    val c = cands.select(col(idCol).as("cand_id"), col(vecCol).as("ce"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot").desc, col("cand_id"))
    broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("dot", round(fdot(col("pe"), col("ce")), roundTo))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), col("dot"))
  }

  /** IVF approximate top-k — the 100 TB path: candidates shard into
    * centroid cells (broadcast argmin assignment); each probe searches its
    * `nprobe` nearest cells via an equi-join on cell id, never a full
    * cross join. */
  /** Persistable IVF index rows: (id, vec, norm, cell) with cell = the
    * argmax-cosine centroid id. Write with `partitionBy("cell")` and a
    * probe query reads ONLY its nprobe cells — partition pruning at the
    * reader, the storage form of the IVF routing [[ivfTopK]] computes
    * in-flight. Rebuild (or re-assign incrementally) when the centroid
    * model revs. */
  def ivfIndex(cands: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, roundTo: Int = 6): DataFrame = {
    val ct = broadcast(withNorm(cents, vecCol)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent"),
        col("norm").as("ctn")))
    val e = withNorm(cands, vecCol)
    val wAssign = Window.partitionBy(col(idCol))
      .orderBy(col("ccos").desc, col("cent_id"))
    e.crossJoin(ct)
      .withColumn("ccos",
        cos(col(vecCol), col("cent"), col("norm"), col("ctn"), roundTo))
      .withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") === 1)
      .select(col(idCol), col(vecCol), col("norm"),
        col("cent_id").as("cell"))
  }

  /** Top-k cosine search against a PERSISTED [[ivfIndex]] (read back from
    * its cell-partitioned layout): probes rank their nprobe cells against
    * the broadcast centroid model, and the index joins on the cell
    * PARTITION column — dynamic partition pruning drops every unprobed
    * cell at the reader, so a probe batch reads nprobe/|cells| of the
    * index bytes. Same output contract as [[ivfTopK]]. */
  def ivfProbeIndex(probes: DataFrame, index: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      roundTo: Int = 6): DataFrame = {
    val ct = broadcast(withNorm(cents, vecCol)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent"),
        col("norm").as("ctn")))
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pe"),
        col("norm").as("pn"))
    val wProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("pcos").desc, col("cent_id"))
    val probeCells = broadcast(p).crossJoin(ct)
      .withColumn("pcos", cos(col("pe"), col("cent"), col("pn"), col("ctn"), roundTo))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select(col("probe_id"), col("pe"), col("pn"),
        col("cent_id").as("cell"))
    val cells = index.select(col(idCol).as("cand_id"),
      col(vecCol).as("ce"), col("norm").as("cn"),
      col("cell").cast("long").as("cell"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    cells.join(broadcast(probeCells), "cell")
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos", cos(col("pe"), col("ce"), col("pn"), col("cn"), roundTo))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), col("cos"))
  }

  def ivfTopK(probes: DataFrame, cands: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      roundTo: Int = 6): DataFrame = {
    val ct = broadcast(withNorm(cents, vecCol)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent"), col("norm").as("ctn")))
    val e = withNorm(cands, vecCol)
    val wAssign = Window.partitionBy(col(idCol))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assign = e.crossJoin(ct)
      .withColumn("ccos", cos(col(vecCol), col("cent"), col("norm"), col("ctn"), roundTo))
      .withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") === 1)
      .select(col(idCol), col("cent_id").as("cell"))
    val cells = e.join(assign, idCol)
      .select(col(idCol).as("cand_id"), col("cell"),
        col(vecCol).as("ce"), col("norm").as("cn"))
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pe"), col("norm").as("pn"))
    val wProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("pcos").desc, col("cent_id"))
    val probeCells = broadcast(p).crossJoin(ct)
      .withColumn("pcos", cos(col("pe"), col("cent"), col("pn"), col("ctn"), roundTo))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select(col("probe_id"), col("pe"), col("pn"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    probeCells.join(cells, "cell")
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos", cos(col("pe"), col("ce"), col("pn"), col("cn"), roundTo))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), col("cos"))
  }

  /** Corpus-self k-NN JOIN through IVF cells — every vector of ONE corpus
    * finds its k approximate nearest neighbours among all the others (the
    * batch kNN-graph build behind embedding dedup clustering and kNN-graph
    * ANN indexes). Unlike [[ivfTopK]] (bounded probe batch vs corpus), the
    * probe side IS the corpus, so the cell assignment is computed ONCE:
    * a single broadcast-centroid argmin pass ranks each vector's `nprobe`
    * nearest cells; rank-1 rows shard the corpus into candidate cells,
    * rank ≤ nprobe rows are the probe replicas. Candidates meet probes via
    * a shuffled equi-join on cell id — never |N|², and the only cross
    * product is against the broadcast centroid model. Output:
    * (probe_id, rnk, cand_id, cos), k rows per vector. */
  def knnJoin(corpus: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 3, roundTo: Int = 6,
      checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val ct = broadcast(withNorm(cents, vecCol)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent"), col("norm").as("ctn")))
    val e = withNorm(corpus, vecCol)
      .select(col(idCol).as("__id"), col(vecCol).as("__e"), col("norm").as("__n"))
    val wCell = Window.partitionBy(col("__id"))
      .orderBy(col("__ccos").desc, col("cent_id"))
    // one argmin pass serves both sides of the join
    val ranked = e.crossJoin(ct)
      .withColumn("__ccos", cos(col("__e"), col("cent"), col("__n"), col("ctn"), roundTo))
      .withColumn("__crnk", row_number().over(wCell))
      .filter(col("__crnk") <= nprobe)
      .select(col("__id"), col("__e"), col("__n"), col("cent_id").as("cell"),
        col("__crnk"))
    // eager materialization, not persist(): computed once, lineage
    // truncated (Local frees blocks via the ContextCleaner on GC; Reliable
    // survives executor loss on a cluster — same dial as
    // TextDedup.connectedComponents)
    val rankedM = checkpoint.materialize(ranked)
    val cells = rankedM.filter(col("__crnk") === 1)
      .select(col("__id").as("cand_id"), col("__e").as("ce"), col("__n").as("cn"),
        col("cell"))
    val probes = rankedM
      .select(col("__id").as("probe_id"), col("__e").as("pe"), col("__n").as("pn"),
        col("cell"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    val out = probes.hint("shuffle_hash").join(cells, "cell")
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos", cos(col("pe"), col("ce"), col("pn"), col("cn"), roundTo))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), col("cos"))
    out
  }

  /** Bipartite cosine-threshold join: EXACT all-pairs verify — O(|L|·|R|),
    * valid only when one side is bounded (a probe batch, a planted-variant
    * slice). For unbounded corpora use [[blockedThresholdJoin]], which
    * blocks candidates through IVF cells first. Output:
    * (left_id, right_id, cos — unrounded comparison, rounded output).
    *
    * Because misuse is O(|L|·|R|), the bounded contract is ENFORCED, not
    * just documented: the left side is counted (via an early-stopping
    * `limit`, so the check never scans past the bound) and the call throws
    * if it exceeds `maxLeftRows`. Callers with a genuinely larger bounded
    * side opt in by raising the bound explicitly. */
  def thresholdJoin(left: DataFrame, right: DataFrame, idCol: String,
      vecCol: String, minCos: Double, roundTo: Int = 6,
      maxLeftRows: Long = 65536L): DataFrame = {
    val probeBound = math.min(maxLeftRows + 1, Int.MaxValue.toLong).toInt
    val nLeft = left.select(col(idCol)).limit(probeBound).count()
    require(nLeft <= maxLeftRows,
      s"thresholdJoin is an all-pairs verify: the left side has > " +
        s"$maxLeftRows rows, so the cross join would be O(|L|*|R|). Use " +
        s"blockedThresholdJoin (IVF-cell candidate blocking) for unbounded " +
        s"corpora, or raise maxLeftRows explicitly if the left side is " +
        s"genuinely a bounded probe batch.")
    val l = withNorm(left, vecCol)
      .select(col(idCol).as("left_id"), col(vecCol).as("le"), col("norm").as("ln"))
    val r = withNorm(right, vecCol)
      .select(col(idCol).as("right_id"), col(vecCol).as("re"), col("norm").as("rn"))
    l.crossJoin(r)
      .withColumn("c", fdot(col("le"), col("re")) / (col("ln") * col("rn")))
      .filter(col("c") >= minCos)
      .select(col("left_id"), col("right_id"), round(col("c"), roundTo).as("cos"))
  }

  /** Cosine-threshold join blocked through IVF cells — the 100 TB
    * "new batch vs corpus" dedup shape. Every right (corpus) vector is
    * assigned to its single nearest centroid cell; every left vector
    * probes its `nprobe` nearest cells; candidates are the cell-co-located
    * pairs (an equi-join on cell id — NEVER |L|·|R|), verified with the
    * exact cosine at >= minCos. The only cross product is against the
    * broadcast centroid set, which is a fixed-size model, not data.
    *
    * Approximate by construction (a qualifying pair whose sides fall in
    * disjoint probed cells is missed); near-identical vectors share a
    * nearest cell, so near-dup recall survives — asserted on planted
    * variants in the test suite. Output: (left_id, right_id, cos). */
  def blockedThresholdJoin(left: DataFrame, right: DataFrame,
      cents: DataFrame, idCol: String, vecCol: String, minCos: Double,
      nprobe: Int = 3, roundTo: Int = 6): DataFrame = {
    val ct = broadcast(withNorm(cents, vecCol)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent"), col("norm").as("ctn")))
    def topCells(df: DataFrame, np: Int): DataFrame = {
      val w = Window.partitionBy(col("__id")).orderBy(col("__ccos").desc, col("cent_id"))
      df.crossJoin(ct)
        .withColumn("__ccos", cos(col("__e"), col("cent"), col("__n"), col("ctn"), roundTo))
        .withColumn("__crnk", row_number().over(w))
        .filter(col("__crnk") <= np)
        .select(col("__id"), col("__e"), col("__n"), col("cent_id").as("cell"))
    }
    val l = topCells(withNorm(left, vecCol)
      .select(col(idCol).as("__id"), col(vecCol).as("__e"), col("norm").as("__n")), nprobe)
      .select(col("__id").as("left_id"), col("__e").as("le"), col("__n").as("ln"), col("cell"))
    val r = topCells(withNorm(right, vecCol)
      .select(col(idCol).as("__id"), col(vecCol).as("__e"), col("norm").as("__n")), 1)
      .select(col("__id").as("right_id"), col("__e").as("re"), col("__n").as("rn"), col("cell"))
    // each right vector lives in exactly one cell, so no pair can repeat
    l.hint("shuffle_hash").join(r, "cell")
      .withColumn("c", fdot(col("le"), col("re")) / (col("ln") * col("rn")))
      .filter(col("c") >= minCos)
      .select(col("left_id"), col("right_id"), round(col("c"), roundTo).as("cos"))
  }

  /** Sign-LSH (random-hyperplane, Charikar STOC'02) cosine threshold
    * join — the hyperplane-family alternative to
    * [[blockedThresholdJoin]]'s IVF cells. Each vector's signature is the
    * sign pattern of its dot products against a small FIXED plane set
    * (`planes`, broadcast; plane index = rank by id, deterministic);
    * signatures split into bands of `rowsPerBand` bits, candidates are the
    * band-key equi-join (two vectors collide iff some band agrees on all
    * its bits), and the exact cosine verifies. P(bit differs) = θ/π, so
    * near-duplicate vectors (θ ≈ 0) collide in every band while random
    * pairs must win a 2^rowsPerBand lottery per band — candidate volume is
    * governed by band width, never |L|·|R|. Sign bits compare the
    * ROUNDED dot against 0 (same `roundTo` discipline as the cosine
    * ranks), keeping the bucket assignment engine-portable. At 100 TB the
    * plane set stays O(bits) — wider signatures, not more data, control
    * precision; the shuffle keys on (band, bandKey) exactly like the text
    * side's MinHash bands. */
  def signLshThresholdJoin(left: DataFrame, right: DataFrame,
      planes: DataFrame, pidCol: String, idCol: String, vecCol: String,
      minCos: Double, rowsPerBand: Int = 4, roundTo: Int = 6): DataFrame = {
    // planes carry their own DENSE 0-based index (`pidCol`) — no global
    // rank window; the bounded plane set broadcasts whole
    val pl = broadcast(planes
      .select(col(pidCol).cast("int").as("pid"), col(vecCol).as("pvec")))
    def sigs(df: DataFrame, outId: String, outVec: String, outNorm: String) =
      withNorm(df, vecCol)
        .select(col(idCol).as(outId), col(vecCol).as(outVec),
          col("norm").as(outNorm))
        .crossJoin(pl)
        .withColumn("bit",
          (round(fdot(col(outVec), col("pvec")), roundTo) >= 0).cast("long"))
        .withColumn("band", floor(col("pid") / rowsPerBand).cast("int"))
        .groupBy(col(outId), col("band"))
        .agg(sum(expr(s"shiftleft(bit, pid % $rowsPerBand)")).as("bkey"),
          first(col(outVec)).as(outVec), first(col(outNorm)).as(outNorm))
    val l = sigs(left, "left_id", "le", "ln")
    val r = sigs(right, "right_id", "re", "rn")
    l.hint("shuffle_hash").join(r, Seq("band", "bkey"))
      .select(col("left_id"), col("right_id"), col("le"), col("ln"),
        col("re"), col("rn"))
      .dropDuplicates("left_id", "right_id") // multi-band collisions count once
      .withColumn("c", fdot(col("le"), col("re")) / (col("ln") * col("rn")))
      .filter(col("c") >= minCos)
      .select(col("left_id"), col("right_id"), round(col("c"), roundTo).as("cos"))
  }
}
