package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass word-token boundary scan for the per-row signature
  * expressions. Tokens are `split(s, ' ')` with Spark's keep-empty
  * semantics (`limit = -1`): nTokens = #spaces + 1, and joining
  * consecutive tokens with single spaces reconstructs exactly the
  * original byte span from the first token's start to the last token's
  * end (see [[ShingleXx64]] for the byte-span identity argument). */
private[expr] object TokenBounds {
  /** Returns (starts, ends): token i spans bytes [starts(i), ends(i)). */
  def scan(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    var spaces = 0
    var b = 0
    while (b < bytes.length) {
      if (bytes(b) == ' ') spaces += 1
      b += 1
    }
    val nToks = spaces + 1
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    var t = 0
    starts(0) = 0
    b = 0
    while (b < bytes.length) {
      if (bytes(b) == ' ') {
        ends(t) = b
        t += 1
        starts(t) = b + 1
      }
      b += 1
    }
    ends(t) = bytes.length
    (starts, ends)
  }

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** md5_48 of the byte span [from, to) — the portable 48-bit shingle
    * hash ([[Md5Prefix48]]) without materializing the shingle string. */
  def md548Span(md: MessageDigest, bytes: Array[Byte], from: Int, to: Int): Long = {
    md.reset()
    md.update(bytes, from, to - from)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  def digest(): MessageDigest = localMd.get()
}

/** Native Catalyst expression: the K-long MinHash signature of a text's
  * word n-gram shingles, computed per ROW — `minhash_sig(s, n)[k] =
  * min over shingles of (A(k) * (md5_48(shingle) mod P) + B(k)) mod P`,
  * with (P, K, A, B) = [[MinHashAgg.params]].
  *
  * Bit-identical to the explode-shingles → `MinHashAgg` groupBy pipeline
  * (pinned in ExpressionSpec): min is idempotent, so per-occurrence vs
  * per-distinct-shingle evaluation cannot differ. The pipeline shape
  * generates one row per shingle occurrence, maintains an
  * ObjectHashAggregate table over every document in the partition, and
  * shuffles one signature row per document into a final aggregate; this
  * expression is a straight-line projection — one token-boundary walk,
  * one md5 per shingle span (no shingle string materialized), K affine
  * updates — that keeps signature computation inside the scan's
  * whole-stage codegen with NO shuffle and NO aggregation state. At
  * 100 TB the signature stage of MinHash dedup becomes embarrassingly
  * parallel; the only shuffles left in the pipeline are the LSH band
  * join and the verify join, which genuinely need them.
  *
  * Returns NULL when the text has fewer than n tokens (the pipeline form
  * drops such documents — no shingle rows, no group; callers filter
  * nulls to match). NULL input → NULL.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires (string, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(s: Any, n: Any): Any =
    MinHashSig.compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => s"""
      ${ev.value} = graft.expr.MinHashSig.compute($s, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private val P = MinHashAgg.P
  private val K = MinHashAgg.K
  private val A: Array[Long] = MinHashAgg.A.toArray
  private val B: Array[Long] = MinHashAgg.B.toArray

  /** Null when fewer than n tokens (document contributes no shingles). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    require(n > 0, s"minhash_sig n must be positive, got $n")
    val bytes = s.getBytes
    val (starts, ends) = TokenBounds.scan(bytes)
    val nToks = starts.length
    if (nToks < n) return null
    val md = TokenBounds.digest()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i <= nToks - n) {
      val hv = TokenBounds.md548Span(md, bytes, starts(i), ends(i + n - 1)) % P
      var k = 0
      while (k < K) {
        val v = (A(k) * hv + B(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-level entry point: `minhash_sig(s, n)`. */
  def minhashSig(c: Column, n: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), Literal(n)))
}

/** Native Catalyst expression: the SimHash signature of a text's word
  * n-gram shingles, computed per ROW — bit j of `simhash48(s, n, bits)`
  * is set iff the sum over shingle OCCURRENCES of
  * `(md5_48(shingle) >> j & 1) * 2 - 1` is positive.
  *
  * Bit-identical to the explode-shingles → 48-column bit-vote groupBy
  * pipeline (pinned in ExpressionSpec — occurrence multiplicity matters
  * for votes, and both forms count every shingle position). The pipeline
  * shape carries `bits` separate sum() aggregate buffers per document
  * through a hash aggregate and a shuffle; this expression accumulates
  * the vote counters in one local int array inside the scan stage — NO
  * shuffle, NO aggregation state, signature computation stays inside
  * whole-stage codegen. See [[MinHashSig]] for why this is the 100 TB
  * shape.
  *
  * Returns NULL when the text has fewer than n tokens (no shingles → the
  * pipeline form drops the document). NULL input → NULL.
  */
case class SimHash48(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"simhash48 requires (string, int, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash48"

  override protected def nullSafeEval(s: Any, n: Any, bits: Any): Any =
    SimHash48.compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Int],
      bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n, bits) => {
      val boxed = ctx.freshName("simhashBoxed")
      s"""
      java.lang.Long $boxed = graft.expr.SimHash48.compute($s, $n, $bits);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.longValue();
      }
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SimHash48 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SimHash48 {
  /** Null when fewer than n tokens; boxed so codegen can branch on it. */
  def compute(s: UTF8String, n: Int, bits: Int): java.lang.Long = {
    require(n > 0, s"simhash48 n must be positive, got $n")
    require(bits > 0 && bits <= 48, s"simhash48 bits must be in [1, 48], got $bits")
    val bytes = s.getBytes
    val (starts, ends) = TokenBounds.scan(bytes)
    val nToks = starts.length
    if (nToks < n) return null
    val md = TokenBounds.digest()
    val votes = new Array[Int](bits)
    var i = 0
    while (i <= nToks - n) {
      val hv = TokenBounds.md548Span(md, bytes, starts(i), ends(i + n - 1))
      var j = 0
      while (j < bits) {
        votes(j) += (((hv >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  /** Column-level entry point: `simhash48(s, n, bits)`. */
  def simhash48(c: Column, n: Int, bits: Int): Column =
    Bridge.column(SimHash48(Bridge.expression(c), Literal(n), Literal(bits)))
}
