package graft.core

/** Replica-band strides for the planted-variant id scheme (round 13,
  * VERDICT r12 #3 — the scale-aware offset discipline).
  *
  * The synthetic corpus plants variants at FIXED id offsets (documents:
  * exact-dup at +100_000, near-dup at +200_000; embeddings: perturbed
  * twin at +10_000), and a dozen declared keys classify rows by id range
  * ("variant side" vs "base side"). Those absolute ranges only work
  * while base ids stay under the first offset — which caps the scale
  * axis: gen_sf3's 30-fold replication pushes doc ids past 100_000 and
  * base ids would collide with variant ids.
  *
  * The fix is a BAND interpretation: ids live in replica bands of a
  * fixed stride, and every range classifier reads the IN-BAND position
  * (`id % stride`) instead of the absolute id. Within each band the
  * planted offsets keep their meaning (base pos < first offset, exact
  * variant in [first, second), near variant >= second), so replicas are
  * self-contained — candidates, ground-truth pairs and gram statistics
  * never cross replicas, exactly the gen_sf1 discipline. At every
  * oracle-checked scale factor ids never leave band 0, so the banded
  * classifiers are the IDENTITY rewrite there — declared results are
  * bit-identical; only the >= sf3 replicated datasets exercise bands
  * past 0.
  *
  * Stride choices (both divisible by every %-slice modulus the variant
  * selections use, so each band carries the same slice densities):
  *   - documents: 252_000 = 210 · 1200 (lcm(2,3,5,7)-aligned, also
  *     % 10 == % 7 == 0). Holds base ids to 51_999 per band — sf1's
  *     dense packing tops out at 49_999 — plus both variant zones.
  *   - embeddings: 30_000 (divisible by the % 50 centroid and % 4
  *     index-base slices). Holds base vec ids to 9_999 (sf1's cap) and
  *     the +10_000 twin zone.
  */
object Bands {
  val DocBand: Long = 252000L
  val VecBand: Long = 30000L

  /** Base id a (possibly variant) doc id derives from: strip the planted
    * offset read off the IN-BAND position — `id - 100000·(pos div 1e5)`
    * with pos = id % DocBand. Band 0 (every oracle-checked SF) reduces to
    * the historical `id % 100000`. SQL texts spell the identical
    * dual-dialect form `x - 100000 * CAST(FLOOR(CAST(x % 252000 AS
    * DOUBLE) / 100000.0) AS BIGINT)` (operands < 2^53 — the double
    * round-trip is exact in both engines). */
  def docOrig(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c - org.apache.spark.sql.functions.lit(100000L) *
      Numeric.idiv(c % DocBand,
        org.apache.spark.sql.functions.lit(100000L))
}
