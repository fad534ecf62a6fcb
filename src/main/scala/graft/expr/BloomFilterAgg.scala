package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Mergeable BLOOM FILTER over long keys (Bloom, "Space/time trade-offs in
  * hash coding with allowable errors", CACM 1970) — the engine's runtime
  * join-pruning sketch, next to the cardinality ([[ThetaSketchAgg]]) and
  * frequency ([[CountMinAgg]]) members of the sketch family.
  *
  * The 100 TB role: a dimension's key set compressed to ~10 bits/key can be
  * broadcast where the dimension itself cannot (a 10⁹-row dim is hundreds
  * of GB; its 1% -FPR bloom is ~1.2 GB, its 5-hash 2¹⁷-bit demo shape here
  * is 16 KB). Fact rows that fail the membership probe are dropped
  * MAP-SIDE, before the join shuffle — the same shape as Spark's own
  * runtime row-level filtering and Trino's dynamic filtering, but available
  * as a first-class declared operator. Because a Bloom filter has NO false
  * negatives, pruning is semantically invisible: `fact ⋈ dim` is
  * byte-identical with or without the probe (false positives survive the
  * probe only to be dropped by the exact join), which is exactly what the
  * DuckDB oracle of `join_bloom` checks.
  *
  * State is a fixed-size bit array (plus one header byte carrying the hash
  * count, making the serialized value self-describing for
  * [[BloomMightContain]]); `update` sets k bits per key by double hashing
  * (Kirsch & Mitzenmacher, "Less hashing, same performance", ESA 2006 —
  * h_i = h1 + i·h2 over two splitmix64 halves); `merge` is bitwise OR, so
  * map-side partial aggregation works and the shuffled state is
  * `numBits/8 + 1` bytes per group regardless of input volume.
  *
  * Registered in SQL as `bloom_agg(key, numBits, numHashes)` by
  * [[graft.GraftExtensions]] (both shape params foldable; numBits a
  * positive multiple of 64, numHashes in [1,16]).
  */
case class BloomFilterAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with TernaryLike[Expression] {

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg(key, numBits, numHashes) takes a bigint key and two foldable int shape params, got ($a, $b, $c)")
    }

  private lazy val numBits: Int = {
    val v = second.eval(null).asInstanceOf[Int]
    require(v >= 64 && v % 64 == 0,
      s"bloom_agg numBits must be a positive multiple of 64, got $v")
    v
  }
  private lazy val numHashes: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 16, s"bloom_agg numHashes must be in [1,16], got $v")
    v
  }

  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](1 + numBits / 8)
    buf(0) = numHashes.toByte
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = first.eval(input)
    if (v != null) Bloom.put(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 1
    while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomFilterAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Membership probe against a serialized [[BloomFilterAgg]] value —
  * codegen'd (stays inside WholeStageCodegen on the fact-scan hot path,
  * where it runs once per fact row at 100 TB). True means "possibly
  * present"; false means "definitely absent" — the direction that makes
  * pre-join pruning lossless. Registered in SQL as
  * `bloom_contains(bf, key)`.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains(bf, key) takes (binary, bigint), got ($a, $b)")
    }

  override protected def nullSafeEval(bf: Any, key: Any): Any =
    Bloom.mightContain(bf.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) => s"graft.expr.Bloom.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object Bloom {
  /** splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
    * number generators", OOPSLA 2014) — the bit-mixing step only, applied
    * to the raw key. Deterministic and engine-local: the bloom is an
    * internal runtime artifact, never part of a declared result. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k double-hashed bits for `key` in a header-prefixed buffer. */
  def put(buf: Array[Byte], key: Long): Unit = {
    val k = buf(0) & 0xff
    val nBits = (buf.length - 1).toLong * 8L
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % nBits
      val idx = 1 + (bit >>> 3).toInt
      buf(idx) = (buf(idx) | (1 << (bit & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Probe: true iff all k bits for `key` are set (possibly present). */
  def mightContain(buf: Array[Byte], key: Long): Boolean = {
    val k = buf(0) & 0xff
    val nBits = (buf.length - 1).toLong * 8L
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % nBits
      if ((buf(1 + (bit >>> 3).toInt) & (1 << (bit & 7L).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  /** `bloom_agg(key, numBits, numHashes)` aggregate column. */
  def agg(key: Column, numBits: Int, numHashes: Int): Column = {
    require(numBits >= 64 && numBits % 64 == 0 && numHashes >= 1 && numHashes <= 16,
      s"bad bloom shape ($numBits, $numHashes)")
    Bridge.column(BloomFilterAgg(
      Bridge.expression(key), Literal(numBits), Literal(numHashes))
      .toAggregateExpression())
  }

  /** `bloom_contains(bf, key)` membership-probe column. */
  def mightContain(bf: Column, key: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(bf), Bridge.expression(key)))
}
