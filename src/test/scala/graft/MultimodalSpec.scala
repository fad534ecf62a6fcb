package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.ops.Multimodal

/** Multimodal plumbing invariants on sf0.001: the payload really is a
  * BinaryType column, both decode paths (codegen expressions vs typed
  * mapPartitions batches) agree byte-for-byte, and geometric transforms
  * preserve the decode stub's pixel algebra. */
class MultimodalSpec extends SparkSpecBase {

  test("expression decode == partition-batch decode (mapInPandas-analogue)") {
    val expr = Multimodal.mmPixels(spark, sf0001)
      .select("doc_id", "px_min", "px_max", "px_mean")
    val batch = Multimodal.mmBatchStats(spark, sf0001)
    assert(expr.exceptAll(batch).isEmpty && batch.exceptAll(expr).isEmpty)
  }

  test("media payload is a true binary column of the declared size") {
    val meta = Multimodal.mmMeta(spark, sf0001).collect()
    assert(meta.forall(r => r.getAs[Int]("n_bytes") == 16))
    assert(meta.forall(r =>
      r.getAs[Int]("width") * r.getAs[Int]("height") == r.getAs[Int]("n_px")))
  }

  test("resize keeps exactly the even-grid pixels") {
    // checksum of the 2×2 downsample must be <= sum of all 16 pixels and
    // consistent with the full decode
    val px = Multimodal.mmPixels(spark, sf0001)
      .select(col("doc_id"), (col("px_mean") * 16).as("total"))
    val rs = Multimodal.mmResize(spark, sf0001)
      .select(col("doc_id"), col("checksum"), col("n_bytes"))
    val joined = px.join(rs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("n_bytes") == 4)
      assert(r.getAs[Long]("checksum") <= math.round(r.getAs[Double]("total")))
    }
  }

  test("frame sampling emits frames 0 and 2 per doc") {
    val fr = Multimodal.mmFrames(spark, sf0001).collect()
    val byDoc = fr.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("frame_no")).sorted.sameElements(Array(0, 2)))
      rs.foreach(r => assert(r.getAs[Double]("frame_mean") >= 0.0 &&
        r.getAs[Double]("frame_mean") <= 255.0))
    }
  }
}
