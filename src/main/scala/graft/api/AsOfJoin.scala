package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (backward) join — public API.
  *
  * Spark SQL has no native ASOF JOIN; the scalable composite is a
  * union-sweep: tag both inputs, sort each key group by (time, side), and
  * carry the latest right-side payload forward with
  * `last(_, ignoreNulls)` over a running frame. One shuffle on the key,
  * one per-partition sort — never the join-then-rank pattern, which
  * explodes to |left| × |right-rows-per-key| intermediates at 100 TB.
  *
  * Ties: at equal time the right row sorts before the left row (as-of is
  * inclusive); ties among right rows resolve by the payload columns in
  * order.
  */
object AsOfJoin {

  /** For each left row, attach the latest right-side `payload` columns
    * (renamed `asof_<name>`) whose `rightTime` <= the row's `leftTime`,
    * within equal values of `keys`. Left rows with no prior right row get
    * nulls. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTime)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftRest.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_left")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t") +: col("__is_left") +: payload.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(keys.map(col) ++ Seq(col("__t"), col("__is_left")) ++
        leftRest.map(col) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__is_left") === 1)
      .drop("__is_left")
      .withColumnRenamed("__t", leftTime)
  }
}
