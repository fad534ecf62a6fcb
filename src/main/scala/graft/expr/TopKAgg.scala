package graft.expr

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Grouped TOP-K as a bounded-state aggregate (SURVEY §4.3 custom-work).
  *
  * Spark has no native grouped top-k: the idiomatic
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` fully SORTS
  * every partition's rows just to discard all but k of them — at 100 TB
  * that is a total sort of the scored pair stream. This aggregator keeps
  * the best k rows per group in a fixed-size sorted buffer instead:
  * map-side partial aggregation bounds the shuffle to k rows per
  * (group × map task), `merge` is a sorted-array merge (associative and
  * commutative), and no sort of the full input ever happens.
  *
  * Ordering is the same total order every declared top-k query uses:
  * `ord` DESCENDING, ties broken by `id` ASCENDING — so the result is
  * bit-identical to the `row_number` window form (ApiSpec asserts
  * equality row-for-row).
  *
  * Output: `array<struct<_1: double, _2: bigint>>` of length ≤ k, best
  * first. `posexplode` turns position into the 1-based rank.
  */
object TopKAgg {

  /** Buffer: parallel arrays kept sorted best→worst, length ≤ k. */
  case class Buf(ord: Array[Double], id: Array[Long])

  private final class Agg(k: Int)
      extends Aggregator[(Double, Long), Buf, Seq[(Double, Long)]] {

    /** a strictly better than b under (ord desc, id asc). */
    @inline private def better(ao: Double, ai: Long, bo: Double, bi: Long): Boolean =
      ao > bo || (ao == bo && ai < bi)

    def zero: Buf = Buf(new Array[Double](0), new Array[Long](0))

    def reduce(b: Buf, in: (Double, Long)): Buf = {
      val n = b.ord.length
      val (o, i) = in
      if (n == k && !better(o, i, b.ord(n - 1), b.id(n - 1))) return b
      // find insertion point (n is small: linear scan)
      var p = 0
      while (p < n && better(b.ord(p), b.id(p), o, i)) p += 1
      val m = math.min(n + 1, k)
      val no = new Array[Double](m)
      val ni = new Array[Long](m)
      var j = 0
      while (j < p) { no(j) = b.ord(j); ni(j) = b.id(j); j += 1 }
      if (p < m) { no(p) = o; ni(p) = i }
      j = p + 1
      while (j < m) { no(j) = b.ord(j - 1); ni(j) = b.id(j - 1); j += 1 }
      Buf(no, ni)
    }

    def merge(x: Buf, y: Buf): Buf = {
      val m = math.min(x.ord.length + y.ord.length, k)
      val no = new Array[Double](m)
      val ni = new Array[Long](m)
      var ix = 0; var iy = 0; var j = 0
      while (j < m) {
        val takeX = iy >= y.ord.length || (ix < x.ord.length &&
          better(x.ord(ix), x.id(ix), y.ord(iy), y.id(iy)))
        if (takeX) { no(j) = x.ord(ix); ni(j) = x.id(ix); ix += 1 }
        else { no(j) = y.ord(iy); ni(j) = y.id(iy); iy += 1 }
        j += 1
      }
      Buf(no, ni)
    }

    def finish(b: Buf): Seq[(Double, Long)] =
      b.ord.indices.map(j => (b.ord(j), b.id(j)))

    def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** `topk(k)(ord, id)` aggregate column: best-k (ord desc, id asc) pairs,
    * best first, as `array<struct<_1, _2>>`. */
  def topk(k: Int)(ord: Column, id: Column): Column = {
    require(k >= 1, s"topk needs k >= 1, got $k")
    udaf(new Agg(k)).apply(ord, id)
  }
}
