package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the xxhash64 of every word n-gram shingle
  * of a string, in one pass — `shingle_xx64(s, n)[i] =
  * xxhash64(concat_ws(' ', tok[i], …, tok[i+n-1]))` where `tok` is
  * `split(s, ' ')` (split on every single space, empty tokens kept).
  *
  * Bit-identical to the explode/concat_ws/xxhash64 pipeline it replaces
  * (pinned in ExpressionSpec) because of a byte-span identity: joining
  * consecutive split-on-single-space tokens with single spaces
  * reconstructs EXACTLY the original byte span from the first token's
  * start to the last token's end (runs of spaces produce empty tokens
  * whose re-joining restores the run; 0x20 never occurs inside a UTF-8
  * multibyte sequence, so byte-level splitting is char-safe). So each
  * shingle hash is one `XXH64.hashUnsafeBytes` over a slice of the
  * original buffer — no token array, no string concat, no per-shingle
  * allocation, and crucially NO row explosion: shingle-SET construction
  * becomes a per-row projection instead of a Generate + groupBy
  * collect_list shuffle. At 100 TB that removes a full shuffle of one
  * row per shingle of the corpus from the near-dup pipeline
  * ([[graft.api.TextDedup.hashedShingleSets]]).
  *
  * Returns an EMPTY array when the string has fewer than n tokens (the
  * pipeline form filters such docs before exploding — callers filter
  * empty sets to match). NULL input → NULL. Seed is 42, the fixed seed of
  * Spark's `xxhash64` function.
  */
case class ShingleXx64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_xx64 requires (string, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_xx64"

  override protected def nullSafeEval(s: Any, n: Any): Any =
    ShingleXx64.compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.expr.ShingleXx64.compute($s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleXx64 =
    copy(left = newLeft, right = newRight)
}

object ShingleXx64 {
  private val Seed = 42L // Spark xxhash64's fixed seed

  def compute(s: UTF8String, n: Int): ArrayData = {
    require(n > 0, s"shingle_xx64 n must be positive, got $n")
    val bytes = s.getBytes
    val (starts, ends) = TokenBounds.scan(bytes)
    val nToks = starts.length
    if (nToks < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nToks - n + 1)
    var i = 0
    while (i <= nToks - n) {
      val from = starts(i)
      out(i) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, ends(i + n - 1) - from, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `shingle_xx64(s, n)`. */
  def shingleXx64(c: Column, n: Int): Column =
    Bridge.column(ShingleXx64(Bridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}
