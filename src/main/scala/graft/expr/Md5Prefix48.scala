package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 48 bits of `md5(s)` as a long —
  * the engine's portable hash ([[graft.api.TextDedup.h48]]), computed
  * without materializing the hex string.
  *
  * Bit-identical to `conv(substring(md5(s), 1, 12), 16, 10) :: long` (the
  * first 12 hex chars ARE the first 6 digest bytes, big-endian) and to the
  * DuckDB oracle's `CAST('0x' || substr(md5(e), 1, 12) AS BIGINT)`, so
  * swapping it into a declared query cannot change results. The built-in
  * chain hex-encodes 16 bytes, substrings, then string-parses base-16 per
  * call; this is one digest into a thread-local MessageDigest and six byte
  * shifts — the fingerprint/minhash/simhash passes hash millions of
  * shingles per pass, making this the scalar hot path of the whole text
  * pipeline. Result is in [0, 2^48): always non-negative, safe for the
  * affine re-hash arithmetic of [[MinHashAgg]].
  *
  * SURVEY §4.3 custom-work pattern (same extension point as
  * [[FloatDotProduct]]); registered in SQL as `md5_48` by
  * [[graft.GraftExtensions]].
  */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_48 requires a string input, got $t")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_48"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix48.hash48(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Md5Prefix48.hash48($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48 =
    copy(child = newChild)
}

object Md5Prefix48 {
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 digest bytes of the UTF-8 string, big-endian, as a long. */
  def hash48(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Column-level entry point: `md5_48(s)`. */
  def md548(c: Column): Column = Bridge.column(Md5Prefix48(Bridge.expression(c)))
}
