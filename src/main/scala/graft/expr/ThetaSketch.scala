package graft.expr

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Theta-sketch distinct counting with SET OPERATIONS (SURVEY §4.3
  * custom-work; Datasketches theta family, the library Spark itself ships
  * for its HLL functions).
  *
  * Spark's built-in sketch surface (`hll_sketch_agg`/`hll_union_agg`)
  * supports only UNION — "distinct users in A plus B". Audience/overlap
  * questions ("how many part keys do the A and R return flags SHARE?")
  * need INTERSECTION, which HLL cannot express but theta sketches can:
  * a theta sketch retains the k smallest value hashes, so union,
  * intersection and difference are all well-defined on the retained sets
  * with known error bounds.
  *
  * Determinism: the retained set is "the k smallest hashes of the input
  * SET", independent of input order and partitioning — the same
  * guarantee every declared aggregate needs at 100 TB (PropertySpec pins
  * repartition-invariance, and exactness below k entries).
  *
  * Aggregate state is a compact sketch (fixed ≤ ~32 KiB at the default
  * lgK=12) with map-side partial merge — the same shuffle shape as
  * `agg_hll_sketch`. [[ThetaSketchAgg]] accepts either raw values
  * (long/int/string — sketch construction) or BINARY (sketch-merge mode,
  * the second aggregation level); [[ThetaEstimate]] and
  * [[ThetaIntersect]] are scalar post-processing on the tiny aggregated
  * rows (CodegenFallback — never in a hot path). Registered in SQL as
  * `theta_sketch_agg` / `theta_estimate` / `theta_intersect` by
  * [[graft.GraftExtensions]].
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg takes a long/int/string value or a binary sketch, got $t")
    }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType  => buffer.update(v.toString)
      case BinaryType  => buffer.union(ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  // a union's entire state IS its compact result (theta + retained set),
  // and union-of-compacts is associative — the standard serialization
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Estimated distinct count of a binary theta sketch (double; exact while
  * the sketch holds fewer than k entries). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"theta_estimate requires a binary sketch, got $t")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(input: Any): Any =
    ThetaSketch.wrap(input.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Intersection of two binary theta sketches, as a binary sketch — the
  * operation HLL cannot do. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect requires two binary sketches, got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(ThetaSketch.wrap(l.asInstanceOf[Array[Byte]]))
    i.intersect(ThetaSketch.wrap(r.asInstanceOf[Array[Byte]]))
    i.getResult.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

object ThetaSketch {
  private[expr] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  /** `theta_sketch_agg(v)` aggregate column: binary compact sketch. On a
    * BINARY input column this is the MERGE level (union of sketches). */
  def sketchAgg(v: Column): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(v)).toAggregateExpression())

  /** Estimated distinct count of a sketch column. */
  def estimate(sk: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(sk)))

  /** Intersection sketch of two sketch columns. */
  def intersect(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersect(Bridge.expression(a), Bridge.expression(b)))
}
