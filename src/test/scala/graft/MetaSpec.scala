package graft

import org.apache.spark.sql.functions._

import graft.core.Meta

/** The reference REPL's meta-command surface, generalized
  * (`/root/reference/db.cpp:515-533`): `.constants` → layout config,
  * `.btree` → storage-order key ranges. The layout test doubles as the
  * PROOF of key_lookup_sorted's sort-on-write claim: the written files'
  * row-group [min, max] key ranges must be ordered and pairwise disjoint
  * (up to a shared boundary key), which is exactly what makes min/max
  * pruning behave like a B-tree level. */
class MetaSpec extends SparkSpecBase {

  test(".constants analogue reports layout-governing config") {
    val rows = Meta.constants(spark).collect()
    assert(rows.length >= 5)
    assert(rows.map(_.getString(0)).contains("spark.sql.shuffle.partitions"))
    assert(rows.forall(r => r.getString(1).nonEmpty))
  }

  test(".btree analogue: sorted layout has ordered, disjoint row-group key ranges") {
    // materialize the sorted-on-write layout, then read its footers
    graft.ops.Sources.keyLookupSorted(spark, sf0001).collect()
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/key_lookup_sorted"
    val lay = Meta.layout(spark, dir, "l_orderkey")
      .orderBy(col("min_key"), col("file"), col("row_group"))
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(lay.nonEmpty, "no row groups found in sorted layout")
    lay.foreach { case (lo, hi, n) =>
      assert(lo <= hi && n > 0)
    }
    // ordered + disjoint up to the boundary key a range split can share:
    // each range must start at or after the previous range's end
    lay.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(lo2 >= hi1 - 0, // ranges may touch at a split key, not overlap past it
          s"row-group ranges overlap: prev max $hi1 > next min $lo2")
      case _ =>
    }
    // and the ranges cover the real key domain of the table
    val (minK, maxK) = {
      val r = graft.core.Tables(spark, sf0001, "lineitem")
        .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(lay.head._1 == minK && lay.map(_._2).max == maxK)
    // row counts must sum to the table size (nothing lost by the layout)
    assert(lay.map(_._3).sum ==
      graft.core.Tables(spark, sf0001, "lineitem").count())
  }

  test("z-order layout bounds per-file spans in BOTH clustered dimensions") {
    // materialize the clustered write, then audit per-file min/max spans.
    // On a Morton layout files cover small RECTANGLES of the (user, day)
    // domain, so min/max footer stats prune on EITHER column. Individual
    // boundary files can legitimately span one full dimension (a z range
    // crossing a top-bit flip), so the pinned property is the AVERAGE
    // span per dimension: a single-column sort yields exactly 1.0 in the
    // secondary dimension, the z layout stays well below in BOTH.
    graft.ops.Sources.sinkZorder(spark, sf0001).collect()
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/sink_zorder"
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("user_id"),
        to_date(col("ts")).as("day"))
      .groupBy(col("f"))
      .agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
        min(col("day")).as("d0"), max(col("day")).as("d1"))
      .collect()
    assert(perFile.length >= 4, s"expected several files, got ${perFile.length}")
    val (users, days) = {
      val r = spark.read.parquet(dir)
        .agg(min(col("user_id")), max(col("user_id")),
          min(to_date(col("ts"))), max(to_date(col("ts")))).head
      (r.getLong(1) - r.getLong(0),
        r.getDate(3).toLocalDate.toEpochDay - r.getDate(2).toLocalDate.toEpochDay)
    }
    val spans = perFile.map { r =>
      ((r.getLong(2) - r.getLong(1)).toDouble / users,
        (r.getDate(4).toLocalDate.toEpochDay -
          r.getDate(3).toLocalDate.toEpochDay).toDouble / days)
    }
    val avgU = spans.map(_._1).sum / spans.length
    val avgD = spans.map(_._2).sum / spans.length
    assert(avgU <= 0.7, s"avg user-domain span $avgU — no locality in user_id")
    assert(avgD <= 0.7, s"avg day-domain span $avgD — no locality in day")
  }
}
