package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over an `Array[Float]` embedding column — Lloyd's
  * algorithm in EXACT integer micro-units, so the fitted model and the
  * assignment are bit-reproducible at any partitioning and on any engine
  * (no float-mean drift): vectors quantize to `round(x·1e6)` longs, a
  * centroid component is the half-up-rounded integer mean
  * `floor((2Σv + n) / 2n)`, and the argmin uses exact integer squared-L2
  * with lowest-label tie-break. Labels are the seed rows' ids (no global
  * row_number window — see the partition-less-window ban in PlanSpec).
  *
  * Scale shape per iteration (the only shapes this API plans):
  *   - assignment: the k×D centroid model is FIXED-SIZE, so it broadcasts
  *     (`crossJoin(broadcast)`) against the corpus — codegen'd integer
  *     HOF math plus one argmin aggregate keyed on the vector id;
  *   - update: one (cluster, dim) hash aggregate after a posexplode.
  *  The corpus itself never shuffle-joins. For deep iteration counts each
  *  round's assignment is `localCheckpoint`ed to truncate lineage (the
  *  [[TextDedup.connectedComponents]] recipe); shallow fits (iters ≤ 2,
  *  the declared-query shape) stay pure lazy plans so plan audits see the
  *  whole chain.
  *
  * Generalizes nothing in the reference (its only value types are uint32
  * and fixed char[], `/root/reference/db.cpp:41-46`); this is north-star
  * surface for embedding-corpus grouping (semantic dedup, topic
  * balancing, IVF index builds).
  */
object Clustering {

  /** µ-quantized integer vector: float → double is exact; ×1e6 and the
    * half-up round are the same IEEE ops in any engine. */
  private def quantize(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * 1e6, 0).cast("long"))

  /** Exact integer squared-L2 between two equal-length long-array columns. */
  private def dist2(v: Column, c: Column): Column =
    aggregate(zip_with(v, c, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Fit k-means and return the final assignment:
    * (<idCol>, cluster, v) — `cluster` is the seed row's id, `v` the
    * µ-quantized vector. Deterministic for any input partitioning.
    *
    * @param iters Lloyd iterations (assignment recomputed after the last
    *              update); `iters` assignments + `iters − 1` updates.
    * @param checkpoint truncate lineage between iterations — required for
    *              deep fits, off by default so shallow fits stay a single
    *              auditable plan.
    */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, checkpoint: Boolean = false): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val q = vecs.select(col(idCol), quantize(col(vecCol)).as("v"))
    // seeds: the k lowest ids; the seed id IS the cluster label
    var cents = q.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cluster"), col("v").as("c"))
    var assigned = assign(q, cents, idCol)
    for (_ <- 2 to iters) {
      cents = update(assigned)
      assigned = assign(q, cents, idCol)
      if (checkpoint)
        assigned = graft.api.CheckpointStrategy.Local.materialize(assigned)
    }
    assigned
  }

  /** One assignment pass: nearest centroid by exact integer squared-L2,
    * ties to the lowest cluster label. Centroids broadcast (k rows). */
  private def assign(q: DataFrame, cents: DataFrame, idCol: String): DataFrame =
    q.crossJoin(broadcast(cents))
      .withColumn("d2", dist2(col("v"), col("c")))
      .groupBy(col(idCol))
      .agg(min(struct(col("d2"), col("cluster"))).as("best"),
        first(col("v")).as("v"))
      .select(col(idCol), col("best.cluster").as("cluster"), col("v"))

  /** One update pass: per-(cluster, dim) half-up integer mean, arrays
    * rebuilt in dim order. The mean is exact while 2·|Σv| + n < 2^53 —
    * i.e. cluster size × max|component| below ~4.5e15 µ-units (unit-norm
    * embeddings: trillions of members) — because both operands of the
    * single IEEE division are then exactly representable doubles. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .withColumn("cmu", floor((col("s") * 2 + col("n")).cast("double")
        / (col("n") * 2).cast("double")).cast("long"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cmu")))).as("pc"))
      .select(col("cluster"), expr("transform(pc, x -> x.cmu)").as("c"))
}
