package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Mergeable quantile sketch with DETERMINISTIC compaction — the
  * KLL/MRL-family summary (Karnin-Lang-Liberty FOCS'16;
  * Manku-Rajagopalan-Lindsay SIGMOD'98), RNG-free on purpose.
  *
  * Structure: a ladder of levels; level h holds values of weight 2^h.
  * When a level exceeds k it SORTS and promotes every second survivor to
  * level h+1 (weight doubles, total weight preserved; an odd leftover —
  * the buffer max — stays put). Where KLL draws a random offset per
  * compaction, this sketch ALTERNATES the offset with a per-level parity
  * bit: successive compactions take the odd then the even positions, so
  * the ±2^{h-1} rank displacements cancel pairwise in expectation over
  * compaction COUNT rather than coin flips. Guarantee (worst case, no
  * probability): one compaction at level h displaces any rank by at most
  * 2^{h-1}·1, and level h compacts at most n/(k/2 · 2^h) times, so
  * normalized rank error ≤ H/k with H = number of levels ≈ log2(2n/k) —
  * for k=200 that is ≤ 5% up to n = 10⁹ and ≤ 7% at n = 10¹³ (100 TB
  * scale), with memory k·H ≈ 200·40·8B ≈ 64 KiB worst case.
  *
  * WHY deterministic instead of wrapping the Datasketches KLL already on
  * the classpath: its randomized compaction makes the aggregated BYTES
  * and the quantile estimates run-dependent, which breaks the engine's
  * statement-text contract (SqlEntrySpec pins SQL ≡ DataFrame
  * row-for-row — two executions must agree) and would make the driver's
  * per-round artifacts unreproducible. The alternating rule trades the
  * randomized √-factor in the error bound for exact replayability —
  * the deterministic discipline every other declared aggregate already
  * follows. The sketch-key discipline still applies (estimates are not
  * DuckDB-expressible): `agg_kll` is declared no-oracle; PropertySpec
  * pins the H/k rank-error bound at two scale factors and a 1/4/32
  * partition sweep, plus EXACTNESS while n ≤ k (no compaction ever
  * fires, the sketch IS the sorted sample).
  *
  * SQL surface (registered by [[graft.GraftExtensions]]):
  * `kll_sketch_agg(v)` (numeric → sketch; BINARY → sketch-merge — the
  * two-level rollup shape of `agg_sketch_rollup`), `kll_quantile(sk, q)`
  * (INCLUSIVE: smallest retained value whose cumulative weight reaches
  * ⌈q·n⌉), `kll_n(sk)` (exact stream length from the preamble).
  */
final class DetKllSketch(val k: Int) {
  var n: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer())
  val parity: ArrayBuffer[Boolean] = ArrayBuffer(false)

  private def ensure(h: Int): Unit =
    while (levels.size <= h) { levels += ArrayBuffer(); parity += false }

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1L
    compactCascade()
  }

  def merge(o: DetKllSketch): Unit = {
    require(o.k == k, s"cannot merge sketches with k=${o.k} into k=$k")
    n += o.n
    var h = 0
    while (h < o.levels.size) {
      if (o.levels(h).nonEmpty) { ensure(h); levels(h) ++= o.levels(h) }
      h += 1
    }
    compactCascade()
  }

  /** One ascending sweep: a compaction at h can only overfill h+1, which
    * the same sweep visits next — no fixpoint loop needed. */
  private def compactCascade(): Unit = {
    var h = 0
    while (h < levels.size) {
      if (levels(h).size > k) compact(h)
      h += 1
    }
  }

  private def compact(h: Int): Unit = {
    ensure(h + 1)
    val buf = levels(h).sortInPlace()
    val sz = buf.size
    val even = sz - (sz % 2)
    val off = if (parity(h)) 1 else 0
    parity(h) = !parity(h)
    var i = off
    while (i < even) { levels(h + 1) += buf(i); i += 2 }
    val leftover = if (sz % 2 == 1) Some(buf(sz - 1)) else None
    levels(h) = ArrayBuffer()
    leftover.foreach(levels(h) += _)
  }

  /** INCLUSIVE quantile: smallest retained value whose cumulative weight
    * reaches ⌈q·n⌉ (clamped to [1, n]). Null contract handled by the
    * expression (empty sketch → null). */
  def quantile(q: Double): Double = {
    val target = math.max(1L, math.min(n, math.ceil(q * n).toLong))
    val all = ArrayBuffer[(Double, Long)]()
    var h = 0
    while (h < levels.size) {
      val w = 1L << h
      levels(h).foreach(v => all += ((v, w)))
      h += 1
    }
    val sorted = all.sortBy(_._1)
    var cum = 0L
    var i = 0
    while (i < sorted.size) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def numLevels: Int = levels.size

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(n)
    out.writeInt(levels.size)
    var h = 0
    while (h < levels.size) {
      out.writeBoolean(parity(h))
      out.writeInt(levels(h).size)
      levels(h).foreach(out.writeDouble)
      h += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object DetKllSketch {
  val DefaultK = 200

  def fromBytes(bytes: Array[Byte]): DetKllSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new DetKllSketch(in.readInt())
    sk.n = in.readLong()
    val nl = in.readInt()
    sk.levels.clear(); sk.parity.clear()
    var h = 0
    while (h < nl) {
      sk.parity += in.readBoolean()
      val cnt = in.readInt()
      val buf = new ArrayBuffer[Double](cnt)
      var i = 0
      while (i < cnt) { buf += in.readDouble(); i += 1 }
      sk.levels += buf
      h += 1
    }
    if (sk.levels.isEmpty) { sk.levels += ArrayBuffer(); sk.parity += false }
    sk
  }
}

/** `kll_sketch_agg(v)`: numeric input builds the sketch; BINARY input is
  * the MERGE level (union of serialized sketches). */
case class KllDoublesAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DetKllSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType | FloatType | LongType | IntegerType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg takes a numeric value or a binary sketch, got $t")
    }

  override def createAggregationBuffer(): DetKllSketch =
    new DetKllSketch(DetKllSketch.DefaultK)

  override def update(buffer: DetKllSketch, input: InternalRow): DetKllSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case FloatType   => buffer.update(v.asInstanceOf[Float].toDouble)
      case LongType    => buffer.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case BinaryType  => buffer.merge(
        DetKllSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def merge(buffer: DetKllSketch, other: DetKllSketch): DetKllSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: DetKllSketch): Any = buffer.toBytes

  override def serialize(buffer: DetKllSketch): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): DetKllSketch =
    DetKllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** Quantile at normalized rank q ∈ [0,1] of a binary KLL sketch
  * (INCLUSIVE — returns an actual retained input value; exact while
  * n ≤ k). NULL for an empty sketch. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary sketch, double rank), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val s = DetKllSketch.fromBytes(sk.asInstanceOf[Array[Byte]])
    if (s.n == 0L) null else s.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Exact stream length carried in the sketch preamble. */
case class KllN(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kll_n requires a binary sketch, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"

  override protected def nullSafeEval(input: Any): Any =
    DetKllSketch.fromBytes(input.asInstanceOf[Array[Byte]]).n

  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}

object KllQuantiles {
  /** `kll_sketch_agg(v)` aggregate column: binary sketch. On a BINARY
    * input column this is the MERGE level (sketch union). */
  def sketchAgg(v: Column): Column =
    Bridge.column(KllDoublesAgg(Bridge.expression(v)).toAggregateExpression())

  /** Quantile of a sketch column at normalized rank q. */
  def quantile(sk: Column, q: Column): Column =
    Bridge.column(KllQuantile(Bridge.expression(sk), Bridge.expression(q)))

  /** Stream length of a sketch column. */
  def n(sk: Column): Column =
    Bridge.column(KllN(Bridge.expression(sk)))
}
