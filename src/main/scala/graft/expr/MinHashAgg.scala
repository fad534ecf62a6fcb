package graft.expr

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass MinHash sketch aggregator (SURVEY §4.3 custom-work item 2).
  *
  * Input: the 48-bit shingle hash (already reduced mod [[P]]); buffer: the
  * running K minima of the affine re-hashes `(a_k * h + b_k) mod P`;
  * output: the K-long signature. Replaces a 32-column `min(...)` aggregate
  * with a single typed buffer — one pass, map-side partial merge (`merge`
  * is element-wise min, associative + commutative), and a fixed 256-byte
  * state per group regardless of document length, which is what a 100 TB
  * shuffle needs.
  *
  * The (a_k, b_k) families and modulus are shared with the SQL oracle via
  * [[MinHashAgg.params]] — results are bit-identical to the column-wise
  * formulation.
  */
object MinHashAgg {
  val P: Long = 2147483647L
  val K: Int = 32
  val A: IndexedSeq[Long] = (0 until K).map(i => (((i + 1) * 2654435761L) % 16381L) | 1L)
  val B: IndexedSeq[Long] = (0 until K).map(i => ((i + 1) * 40503L + 7L) % 16381L)

  def params: (Long, Int, IndexedSeq[Long], IndexedSeq[Long]) = (P, K, A, B)

  private object Agg extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(K)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var k = 0
      while (k < K) {
        val v = (A(k) * h + B(k)) % P
        if (v < buf(k)) buf(k) = v
        k += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var k = 0
      while (k < K) { if (y(k) < x(k)) x(k) = y(k); k += 1 }
      x
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `minhash(hv)` aggregate column: array<bigint> of K signature mins. */
  def minhash(hv: Column): Column = udaf(Agg).apply(hv)
}
