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

  test("mm_sharpness: Laplacian variance matches a JVM recompute; flag exact") {
    val rows = Multimodal.mmSharpness(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val texts = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, lapVar, blurry) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(texts(id).getBytes("UTF-8")).map(_ & 0xff)
      def p(r: Int, c: Int) = md(r * 4 + c).toLong
      val ls = for { r <- Seq(1, 2); c <- Seq(1, 2) } yield
        4 * p(r, c) - p(r - 1, c) - p(r + 1, c) - p(r, c - 1) - p(r, c + 1)
      val v16 = 4 * ls.map(l => l * l).sum - ls.sum * ls.sum
      assert(math.abs(lapVar - v16 / 16.0) < 1e-6, s"doc $id variance mismatch")
      assert(blurry == (v16 < 320000L), s"doc $id flag mismatch")
    }
    assert(rows.exists(_._3) && rows.exists(!_._3),
      "blur threshold is inert (all or none flagged)")
  }

  test("dHash is brightness-shift invariant; aHash flips with the mean") {
    // the perceptual-hash CONTRACT: dHash compares neighboring pixels, so
    // adding a constant to every pixel must not change it; aHash compares
    // against the image mean, so a half-bright/half-dark split must yield
    // a nonzero signature that the shift also preserves
    import spark.implicits._
    val base = Seq.tabulate(16)(i => 10 + i * 3) // strictly increasing rows
    val shifted = base.map(_ + 40)
    val split = Seq.fill(8)(20) ++ Seq.fill(8)(200)
    val df = Seq((1L, base), (2L, shifted), (3L, split))
      .toDF("id", "px")
      .select(col("id"), Multimodal.dhashOf(col("px")).as("dh"),
        Multimodal.ahashOf(col("px")).as("ah"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(df(1)._1 == df(2)._1, "dHash changed under brightness shift")
    assert(df(1)._2 == df(2)._2, "aHash changed under uniform shift")
    // increasing base: every horizontal step is <, so all 12 dhash bits set
    assert(df(1)._1 == (1L << 12) - 1)
    // split image: exactly the bright half is above the mean
    assert(df(3)._2 == ((1L << 16) - 1) - ((1L << 8) - 1))
  }

  test("mm_shard manifest partitions each source into contiguous bounded shards") {
    val cap = 16384L
    val m = Multimodal.mmShard(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(m.nonEmpty)
    // per-source bookkeeping: doc counts and bytes must tie out to the table
    val totals = graft.core.Tables.documents(spark, sf0001)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars") + lit(16L)).as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // per-doc record sizes, for the exact boundary-crossing assertion
    val docBytes = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), (col("n_chars") + lit(16L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m.groupBy(_._1).foreach { case (src, shards) =>
      assert(shards.map(_._3).sum == totals(src)._1, s"$src doc count drifted")
      assert(shards.map(_._4).sum == totals(src)._2, s"$src byte total drifted")
      // shard ids are dense from 0 and doc ranges are contiguous in order
      val ordered = shards.sortBy(_._2)
      assert(ordered.map(_._2) sameElements Array.tabulate(ordered.length)(_.toLong),
        s"$src shard ids not dense")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$src shard ranges overlap")
        case _ =>
      }
      // capacity: each shard's cumulative end stays within its boundary
      // ((cum-1) div cap assigns a doc to the shard holding its END byte),
      // and every non-final shard is full-to-boundary in the exact sense
      // that adding the NEXT shard's first doc crosses (shard_id+1)*cap
      val prefixEnds = ordered.map(_._4).scanLeft(0L)(_ + _).drop(1)
      ordered.zip(prefixEnds).foreach { case (s, end) =>
        assert(end <= (s._2 + 1) * cap && end > s._2 * cap,
          s"$src shard ${s._2} cumulative end $end outside its boundary")
      }
      ordered.zip(prefixEnds).sliding(2).foreach {
        case Array((s, end), (next, _)) =>
          assert(end + docBytes(next._5) > (s._2 + 1) * cap,
            s"$src shard ${s._2} closed before reaching its boundary")
        case _ =>
      }
    }
  }
}
