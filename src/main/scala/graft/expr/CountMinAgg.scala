package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable COUNT-MIN sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 2005) — the point-frequency member of the engine's sketch
  * family next to distinct counting ([[ThetaSketchAgg]]) and heavy
  * hitters ([[MisraGriesAgg]]).
  *
  * State is a fixed depth×width grid of counters; each input increments
  * one counter per row (row d uses the engine's portable 48-bit md5 hash
  * of `"d:item"` mod width). `merge` is element-wise addition, so
  * map-side partial aggregation works and the shuffled state is
  * depth×width longs per group REGARDLESS of input volume — while a
  * `GROUP BY item` materializes one row per distinct value.
  *
  * Two properties the other sketches lack, both load-bearing for the
  * correctness gate:
  *   - counters are SUMS, so the sketch is partition- and
  *     order-INVARIANT (Misra–Gries' surviving set is not);
  *   - the hash is `md5`, reproducible in any engine — so a DuckDB
  *     oracle can rebuild the exact grid from exact counts and the
  *     declared estimates hash-match INCLUDING collisions. This is the
  *     engine's only sketch with a full value-level oracle.
  *
  * Estimates overcount by at most εN with probability 1−δ
  * (ε = e/width, δ = e^−depth); never undercount. Output is the flat
  * row-major counter grid `array<bigint>` of length depth×width —
  * point lookups are then plain `element_at` + `least` over the rows,
  * composable in either the DataFrame or SQL dialect without a second
  * custom expression. Registered in SQL as
  * `count_min(item, depth, width)` by [[graft.GraftExtensions]] (depth
  * and width must be foldable positive ints).
  */
case class CountMinAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  override def prettyName: String = "count_min"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"count_min(item, depth, width) takes a string item and two foldable int shape params, got ($a, $b, $c)")
    }

  private lazy val depth: Int = {
    val v = second.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 16, s"count_min depth must be in [1,16], got $v")
    v
  }
  private lazy val width: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v >= 2, s"count_min width must be >= 2, got $v")
    v
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        val h = Md5Prefix48.hash48(UTF8String.fromString(d + ":" + item))
        buf(d * width + (h % width).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(l => l: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CountMinAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CountMin {
  /** `count_min(item, depth, width)` aggregate column: the flat row-major
    * depth×width counter grid. Estimate an item's count with
    * `least(element_at(sk, d*width + md5_48(concat(d,':',item)) % width + 1) ...)`
    * over d in [0, depth). */
  def agg(item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 2, s"bad count_min shape ($depth, $width)")
    Bridge.column(CountMinAgg(
      Bridge.expression(item),
      org.apache.spark.sql.catalyst.expressions.Literal(depth),
      org.apache.spark.sql.catalyst.expressions.Literal(width)).toAggregateExpression())
  }
}
