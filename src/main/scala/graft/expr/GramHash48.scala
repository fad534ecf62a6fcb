package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 48-bit md5 hashes of every character
  * k-gram of a string — `gram_hash48(s, k)[i] = md5_48(substring(s, i+1, k))`
  * for i in 0..numChars-k, in one pass.
  *
  * Bit-identical to the HOF chain
  * `transform(sequence(1, length(s) - k + 1), i -> md5_48(substring(s, i, k)))`
  * (pinned in ExpressionSpec on corpus + multibyte inputs), but without its
  * two per-gram costs: `UTF8String.substring(i, ...)` rescans from the
  * string start to find the char boundary (O(chars²) per document on the
  * interpreted HOF path) and every lambda element evaluation boxes. Here
  * the UTF-8 char boundaries are walked ONCE into an offset table, and each
  * gram digests a byte slice of the original buffer through a thread-local
  * MessageDigest into a reused output buffer — no substring allocation, no
  * boxing. This is the gram stage of the winnowing fingerprint
  * ([[graft.api.TextDedup.winnowFingerprints]]), which hashes ~n grams per
  * n-char document across the whole corpus.
  *
  * Returns an EMPTY array when the string is shorter than k chars (the HOF
  * chain's `sequence(1, n-k+1)` would count DOWN for n < k — callers
  * filter short docs first, as winnowing's ≥ w+k-1 length guard already
  * does). NULL input → NULL. k must be a positive int.
  */
case class GramHash48(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gram_hash48 requires (string, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_hash48"

  override protected def nullSafeEval(s: Any, k: Any): Any =
    GramHash48.compute(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.expr.GramHash48.compute($s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHash48 =
    copy(left = newLeft, right = newRight)
}

object GramHash48 {
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val localBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  def compute(s: UTF8String, k: Int): ArrayData = {
    require(k > 0, s"gram_hash48 k must be positive, got $k")
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    // char-boundary byte offsets, walked once
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var b = 0
    while (b < bytes.length) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(nChars) = bytes.length
    val md = localMd.get()
    val buf = localBuf.get()
    val out = new Array[Long](nChars - k + 1)
    var j = 0
    while (j <= nChars - k) {
      md.reset()
      md.update(bytes, offs(j), offs(j + k) - offs(j))
      md.digest(buf, 0, 16)
      out(j) = ((buf(0) & 0xffL) << 40) | ((buf(1) & 0xffL) << 32) |
        ((buf(2) & 0xffL) << 24) | ((buf(3) & 0xffL) << 16) |
        ((buf(4) & 0xffL) << 8) | (buf(5) & 0xffL)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `gram_hash48(s, k)`. */
  def gramHash48(c: Column, k: Int): Column =
    Bridge.column(GramHash48(Bridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))
}
