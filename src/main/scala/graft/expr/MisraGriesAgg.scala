package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HEAVY-HITTERS summary (Misra–Gries; SURVEY §4.3 custom-work).
  *
  * The frequent-items question ("which values dominate this column?") is
  * the third member of the mergeable-sketch family next to distinct
  * counting ([[ThetaSketchAgg]]) and quantiles (`approx_percentile`):
  * `GROUP BY value ORDER BY count DESC` materializes one aggregation row
  * PER DISTINCT VALUE — at 100 TB that is a shuffle the size of the
  * domain, paid to read back only the top handful. The Misra–Gries
  * summary instead keeps AT MOST k (item, count) slots per aggregation
  * buffer: a hit increments its slot, a miss with a full buffer
  * decrements ALL slots (dropping zeros) — the classic generalization of
  * Boyer–Moore majority voting (Misra & Gries, "Finding repeated
  * elements", Sci. Comp. Prog. 1982).
  *
  * Merging follows Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * sum counts slot-wise, and if more than k slots survive, subtract the
  * (k+1)-th largest count from every slot and drop the non-positive ones.
  * Both `update` and `merge` preserve the summary invariant, so map-side
  * partial aggregation works and the shuffled state is ≤ k slots per
  * group regardless of input volume — the same fixed-state shape as
  * [[MinHashAgg]].
  *
  * Guarantees (PropertySpec pins both against exact counts):
  *   - every reported count is an UNDERCOUNT by at most N/(k+1)
  *     (N = group row count);
  *   - every item with true frequency > N/(k+1) is present in the output.
  * When the group's distinct-value count is ≤ k no decrement ever fires
  * and the summary is EXACT and partition-invariant — the regime the
  * declared `agg_heavy_hitters` query runs in, which is what lets a
  * DuckDB `GROUP BY` oracle hash-check a sketch operator. In the
  * approximate regime (distinct > k) the surviving item SET can depend on
  * partitioning, like any Misra–Gries deployment; the two bounds above
  * hold regardless.
  *
  * Output: `array<struct<item string, est_count bigint>>`, sorted count
  * DESC then item ASC (a total order — deterministic whenever the counts
  * are). Registered in SQL as `misra_gries(item, k)` by
  * [[graft.GraftExtensions]] (k must be a foldable positive int).
  */
case class MisraGriesAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType | LongType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"misra_gries(item, k) takes a string item and a foldable int capacity, got ($l, $r)")
    }

  /** Slot capacity k: the summary never holds more than k items. */
  private lazy val k: Int = {
    val v = right.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"misra_gries capacity must be an int literal, got $other")
    }
    require(v >= 1, s"misra_gries needs capacity >= 1, got $v")
    v
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // miss with a full buffer: decrement every slot, drop zeros —
          // O(k) but amortized O(1) per row (each decrement pays back an
          // earlier increment)
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(
      x: mutable.HashMap[String, Long], y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    y.foreach { case (item, c) => x.update(item, x.getOrElse(item, 0L) + c) }
    if (x.size > k) {
      // subtract the (k+1)-th largest count from every slot: at most k
      // slots can exceed it, so the invariant |summary| <= k is restored
      val d = x.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      x.mapValuesInPlace((_, c) => c - d)
      x.filterInPlace((_, c) => c > 0)
    }
    x
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(left = newLeft, right = newRight)
}

object MisraGries {
  /** `misra_gries(item, k)` aggregate column: ≤ k (item, est_count)
    * structs, count DESC then item ASC. Exact when the group's distinct
    * count is ≤ k; otherwise counts undercount by ≤ N/(k+1). */
  def agg(item: Column, k: Int): Column = {
    require(k >= 1, s"misra_gries needs capacity >= 1, got $k")
    Bridge.column(MisraGriesAgg(
      Bridge.expression(item),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())
  }
}
