package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of (backward) join — public API.
  *
  * Spark SQL has no native ASOF JOIN; the scalable composite is a
  * union-sweep: tag both inputs, sort each key group by (time, side), and
  * carry the latest right-side payload forward with
  * `last(_, ignoreNulls)` over a running frame. One shuffle on the key,
  * one per-partition sort — never the join-then-rank pattern, which
  * explodes to |left| × |right-rows-per-key| intermediates at 100 TB.
  *
  * The payload columns are packed into a single struct and the struct is
  * carried atomically, so every output row's `asof_*` fields come from ONE
  * right row — genuine NULLs inside a right row's payload are preserved
  * (they are fields of a non-null struct, distinct from the left rows'
  * all-null marker struct, which `ignoreNulls` skips).
  *
  * Ties: at equal time the right row sorts before the left row (as-of is
  * inclusive); ties among right rows resolve by the payload values in
  * order (nulls first).
  */
object AsOfJoin {

  /** For each left row, attach the latest right-side `payload` columns
    * (renamed `asof_<name>`) whose `rightTime` <= the row's `leftTime`,
    * within equal values of `keys`. Left rows with no prior right row get
    * nulls. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTime)
    val payloadType = StructType(payload.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftRest.map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_left")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftRest.map(col) ++
        payload.map(c => col(s"__carry.$c").as(s"asof_$c")): _*)
  }

  /** Forward as-of: for each left row, attach the EARLIEST right-side
    * `payload` columns whose `rightTime` >= the row's `leftTime` (the
    * "next event after" direction — e.g. first fill after an order).
    * Same union-sweep shape as [[backward]] with the frame reversed:
    * `first(_, ignoreNulls)` over the FOLLOWING frame on the same sort.
    * Ties at equal time match (inclusive), right-row ties resolve by the
    * payload values in order. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTime)
    val payloadType = StructType(payload.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftRest.map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    // at equal __t the left row must sort BEFORE the right row so the
    // following frame still sees it (inclusive forward match)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(2).as("__is_left")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"), col("__p"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__carry", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftRest.map(col) ++
        payload.map(c => col(s"__carry.$c").as(s"asof_$c")): _*)
  }

  /** NEAREST-direction as-of: for each left row, attach the right row
    * whose time is CLOSEST in either direction (ties prefer the backward
    * match — the pandas `merge_asof(direction='nearest')` convention).
    * Still ONE key shuffle and one sort: both direction candidates come
    * from the same union-sweep — the backward carry (`last` over the
    * preceding frame) and the forward carry (`first` over the following
    * frame) ride the SAME window ordering, so the two WindowExecs share
    * one Exchange+Sort — then the winner is a per-row distance compare on
    * the match times carried inside the structs.
    *
    * Tie detail at equal left/right time: the right row sorts before the
    * left row, so an equal-time match surfaces through the BACKWARD carry
    * at distance zero (which also wins the tie rule) — the forward carry
    * being exclusive at equal time is therefore unobservable. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTime)
    val payloadType = StructType(
      org.apache.spark.sql.types.StructField("__mt", right.schema(rightTime).dataType) +:
        payload.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftRest.map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_left")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("__mt") +: payload.map(col): _*).as("__p"): _*)
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"), col("__p"))
    val best =
      when(col("__b").isNull, col("__f"))
        .when(col("__f").isNull, col("__b"))
        .when(col("__t") - col("__b.__mt") <= col("__f.__mt") - col("__t"),
          col("__b"))
        .otherwise(col("__f"))
    l.unionByName(r)
      .withColumn("__b", last(col("__p"), ignoreNulls = true)
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__f", first(col("__p"), ignoreNulls = true)
        .over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__is_left") === 1)
      .withColumn("__best", best)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftRest.map(col) ++
        payload.map(c => col(s"__best.$c").as(s"asof_$c")): _*)
  }

  /** [[backward]] with a STALENESS BOUND — the feature-store
    * point-in-time rule: a match older than `tolerance` (a Spark interval
    * string, e.g. `"30 MINUTE"`) before the left time is REJECTED
    * (nulls), never silently served stale. The match time rides as an
    * extra field of the carried struct, so the bound is a per-row
    * comparison after the same one-shuffle sweep — no extra join, and the
    * bound is exact: the carried match is the latest prior right row, and
    * if the latest is out of window every older one is too. Tie rules
    * match [[backward]]. */
  def backwardWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: String): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTime)
    val payloadType = StructType(
      org.apache.spark.sql.types.StructField("__mt", right.schema(rightTime).dataType) +:
        payload.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftRest.map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_left")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("__mt") +: payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .withColumn("__ok",
        col("__carry.__mt") >= col("__t") - expr(s"INTERVAL $tolerance"))
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftRest.map(col) ++
        payload.map(c =>
          when(col("__ok"), col(s"__carry.$c")).as(s"asof_$c")): _*)
  }
}
