package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Tables => T}

/** Multimodal (image/audio/video) column operators — SURVEY.md §2.2
  * north-star extensions.
  *
  * The reference has no binary/media notion at all (its only value types
  * are uint32 + fixed char[], `/root/reference/db.cpp:41-46`); a 100 TB
  * training-data pipeline, however, carries media as opaque `binary`
  * columns with typed metadata and runs decode → feature-extract →
  * resize/frame-sample stages over them. This module makes that plumbing
  * real on the harness corpus:
  *
  *   - **media table**: derived deterministically from `documents` — the
  *     payload is the 16 raw md5 bytes of the text, carried as a true
  *     `BinaryType` column with typed metadata (width/height/format), i.e.
  *     a 4×4 single-channel raster.
  *   - Two execution paths over the media column:
  *     expression-based over the raw raster (hex → 2-char chunks → int,
  *     fully codegen'd; [[mmPixels]]) and a REAL codec round trip in
  *     partition batches ([[mmBatchStats]]: gray8 → PNG encode → binary
  *     column → `javax.imageio` decode → features — the JVM analogue of
  *     `mapInPandas`, with actual image bytes; PNG is lossless so the
  *     pixel-math oracle still applies).
  *
  * Scale notes: payloads ride the same shuffles as any column; real media
  * (MBs/row) would raise `maxPartitionBytes` pressure — the stage layout
  * here (decode late, after joins/filters; project metadata early) is the
  * shape that keeps 100 TB of media off the wire.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Derived media table: (doc_id, payload BINARY, width, height, fmt).
    * unhex(md5) = 16 deterministic bytes — the fake "raster". */
  private def media(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      lit(4).as("width"), lit(4).as("height"), lit("gray8").as("fmt"))

  /** Decode stub, expression path: byte i of the payload → pixel value
    * 0..255, via hex + fixed-width chunking (codegen'd; no UDF). */
  private def pixels(payload: Column, nBytes: Int): Column =
    transform(sequence(lit(1), lit(nBytes)), i =>
      conv(substring(hex(payload), (i - 1) * 2 + 1, lit(2)), 16, 10).cast("int"))

  /** DuckDB mirror: pixels from the md5 hex string (the oracle never needs
    * the blob — same VALUES, independent representation). */
  private def pixelsSql(e: String): String =
    s"list_transform(range(1, 17), i -> CAST(('0x' || substr(md5($e), (i-1)*2 + 1, 2)) AS INT))"

  /** Metadata scan: the "cheap path" — size/shape checks that must NOT
    * decode. At scale this projection prunes the payload column entirely
    * out of the parquet read. */
  val mmMeta: Q = (s, d) =>
    media(s, d)
      .select(col("doc_id"), length(col("payload")).as("n_bytes"),
        col("width"), col("height"), col("fmt"),
        (col("width") * col("height")).as("n_px"))
      .orderBy(col("doc_id"))

  /** Decode + per-image feature extraction (expression path): pixel
    * min/max/mean and a 4-bin histogram — the feature stage of a vision
    * data pipeline, entirely inside whole-stage codegen. */
  val mmPixels: Q = (s, d) => {
    val px = pixels(col("payload"), 16)
    def bin(lo: Int, hi: Int): Column =
      size(filter(px, p => p >= lo && p < hi)).cast("long")
    media(s, d)
      .withColumn("px_min", array_min(px))
      .withColumn("px_max", array_max(px))
      .withColumn("px_mean",
        round(aggregate(px, lit(0L), (a, p) => a + p).cast("double") / 16.0, 6))
      .withColumn("h0", bin(0, 64)).withColumn("h1", bin(64, 128))
      .withColumn("h2", bin(128, 192)).withColumn("h3", bin(192, 256))
      .select(col("doc_id"), col("px_min"), col("px_max"), col("px_mean"),
        col("h0"), col("h1"), col("h2"), col("h3"))
      .orderBy(col("doc_id"))
  }

  /** Resize: 2× nearest-neighbor downsample of the 4×4 raster → 2×2 (keep
    * pixels at even (row, col)), emitting the resized payload as binary
    * again plus its checksum — decode → transform → re-encode, the full
    * media round trip. */
  val mmResize: Q = (s, d) => {
    val px = pixels(col("payload"), 16)
    // even rows/cols of the 4×4 grid: linear indices {0,2,8,10} (1-based +1)
    val kept = array(Seq(0, 2, 8, 10).map(i => element_at(px, i + 1)): _*)
    media(s, d)
      .withColumn("small", kept)
      .select(col("doc_id"),
        unhex(concat_ws("", transform(col("small"),
          p => lpad(conv(p.cast("string"), 10, 16), 2, "0")))).as("payload2"),
        lit(2).as("width"), lit(2).as("height"),
        aggregate(col("small"), lit(0L), (a, p) => a + p).as("checksum"))
      .select(col("doc_id"), length(col("payload2")).as("n_bytes"),
        col("width"), col("height"), col("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: treat the payload as a 4-frame "video" (4 bytes per
    * frame) and keep frames 0 and 2 — one output row per sampled frame
    * with its per-frame mean (posexplode keeps the frame index). */
  val mmFrames: Q = (s, d) => {
    val px = pixels(col("payload"), 16)
    val frames = transform(sequence(lit(0), lit(3)), f =>
      struct(f.as("frame_no"), slice(px, f * 4 + 1, lit(4)).as("fpx")))
    media(s, d)
      .select(col("doc_id"), explode(frames).as("fr"))
      .filter(col("fr.frame_no") % 2 === 0)
      .select(col("doc_id"), col("fr.frame_no").cast("int").as("frame_no"),
        round(aggregate(col("fr.fpx"), lit(0L), (a, p) => a + p)
          .cast("double") / 4.0, 6).as("frame_mean"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** BLUR / SHARPNESS screen — variance of the 3×3 Laplacian over the
    * raster's interior, the standard focus measure a vision data pipeline
    * thresholds to drop out-of-focus frames before training. On the 4×4
    * grid the interior is the 2×2 center; each response
    * 4p(r,c) − p(r±1,c) − p(r,c±1) is an exact integer, the variance
    * clears its denominator (16·var = 4·Σl² − (Σl)²), and the blur flag
    * compares INTEGERS — bit-portable, no float anywhere in the
    * decision. Entirely inside whole-stage codegen over the scan, like
    * [[mmPixels]]; at 100 TB it rides the decode stage for free. */
  val mmSharpness: Q = (s, d) => {
    // Generate barrier (the mmPhash rule): the Laplacian reads 20 pixel
    // positions; evaluate the decode array once per row
    def p(r: Int, c: Int): Column = element_at(col("px"), r * 4 + c + 1)
    val laps = for { r <- Seq(1, 2); c <- Seq(1, 2) } yield
      (p(r, c) * 4 - p(r - 1, c) - p(r + 1, c) - p(r, c - 1) - p(r, c + 1))
        .cast("long")
    val sl = laps.reduce(_ + _)
    val ssl = laps.map(l => l * l).reduce(_ + _)
    val scaled = ssl * 4 - sl * sl // 16 * variance, exact
    media(s, d)
      .select(col("doc_id"),
        explode(array(pixels(col("payload"), 16))).as("px"))
      .select(col("doc_id"), scaled.as("v16"))
      .select(col("doc_id"),
        round(col("v16").cast("double") / 16.0, 6).as("lap_var"),
        (col("v16") < 320000L).as("is_blurry")) // var < 20000, integer form
      .orderBy(col("doc_id"))
  }

  /** REAL image codec round trip via typed partition batches — the JVM
    * analogue of `mapInPandas`. Stage 1 encodes each 4×4 gray8 raster as
    * an actual PNG (`javax.imageio`, in the JDK — no external deps),
    * carried as a true binary column; stage 2 decodes the PNG back and
    * extracts pixel features. PNG gray8 is lossless, so the decoded
    * pixels ARE the md5 raster bytes and the declared output keeps its
    * pixel-math oracle. Output equals [[mmPixels]]'s expression path
    * byte-for-byte (asserted in MultimodalSpec).
    *
    * At scale both stages stream per partition (codec state initializes
    * once per partition, rows batch through it) — the exact shape of a
    * production decode stage, now with a real codec instead of a stub. */
  val mmBatchStats: Q = (s, d) => {
    val m = media(s, d).select(col("doc_id"), col("payload"))
    val pngSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("png", BinaryType, nullable = false)))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("px_min", IntegerType, nullable = false),
      StructField("px_max", IntegerType, nullable = false),
      StructField("px_mean", DoubleType, nullable = false)))
    val pngEnc = org.apache.spark.sql.Encoders.row(pngSchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val png = m.mapPartitions { rows =>
      // per-partition encoder init, hoisted OUT of the row loop:
      // ImageIO.write does a writer-SPI scan per call — per-row that
      // dominated the stage (2.4× regression in r4's bench). The explicit
      // MemoryCache image streams below never touch ImageIO's disk cache,
      // so no JVM-global setUseCache mutation is needed from tasks.
      java.awt.Toolkit.getDefaultToolkit // force lazy init once per task
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val img = new java.awt.image.BufferedImage(4, 4,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, 4, 4, bytes)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(img)
        ios.flush()
        Row(r.getAs[Long]("doc_id"), bos.toByteArray)
      }
    }(pngEnc)
    png.mapPartitions { rows =>
      // reader hoisted for the same reason as the writer above; the
      // MemoryCache input stream keeps decode off the disk cache
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      val px = new Array[Int](16) // per-partition decode buffer
      rows.map { r => // positional access: mapPartitions rows carry no schema
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        img.getRaster.getPixels(0, 0, 4, 4, px)
        Row(r.getLong(0), px.min, px.max,
          math.rint(px.map(_.toLong).sum.toDouble / px.length * 1e6) / 1e6)
      }
    }(outEnc).orderBy(col("doc_id"))
  }

  /** Perceptual-hash IMAGE DEDUP — the visual cousin of the text dedup
    * family: every raster folds to two tiny locality-sensitive signatures
    * (dHash: 12 bits of horizontal gradient signs — robust to brightness
    * shifts; aHash: 16 bits of above-mean pixels), then one hash-groupBy
    * on the dHash surfaces collision clusters (count + representative).
    * All integer compares on the decoded pixels — fully codegen'd, and
    * the signature math is engine-portable so the clusters are
    * oracle-checked end to end.
    *
    * 100 TB shape: identical to `dedup_exact` — per-row signature (no
    * shuffle), one hash-shuffle groupBy on a short key; near-dup banding
    * (split the hash into blocks, equi-join per block) would follow the
    * `dedup_simhash` pigeonhole recipe on the same signatures. */
  /** dHash of a 4×4 pixel array column: bit (r*3+c) set when
    * px[r][c] < px[r][c+1] — horizontal gradient signs, invariant under
    * any brightness shift (tested in MultimodalSpec). */
  private[graft] def dhashOf(px: Column): Column =
    (for { r <- 0 until 4; c <- 0 until 3 } yield
      when(element_at(px, r * 4 + c + 1) < element_at(px, r * 4 + c + 2),
        lit(1L << (r * 3 + c))).otherwise(0L)).reduce(_ + _)

  /** aHash of a 4×4 pixel array column: bit i set when 16·px[i] > Σpx
    * (integer-exact above-mean compare — no float mean). */
  private[graft] def ahashOf(px: Column): Column = {
    val psum = aggregate(px, lit(0L), (a, p) => a + p)
    (for { i <- 0 until 16 } yield
      when(element_at(px, i + 1).cast("long") * 16 > psum,
        lit(1L << i)).otherwise(0L)).reduce(_ + _)
  }

  val mmPhash: Q = (s, d) => {
    // Generate barrier: dhash/ahash reference ~40 pixel positions, and a
    // projected HOF array would be re-inlined into every reference by
    // CollapseProject (16 hex/conv evals per reference). explode(array(..))
    // pins ONE evaluation per row; the hashes then read the attribute.
    media(s, d)
      .select(col("doc_id"),
        explode(array(pixels(col("payload"), 16))).as("px"))
      .withColumn("dhash", dhashOf(col("px")))
      .withColumn("ahash", ahashOf(col("px")))
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_imgs"), min(col("doc_id")).as("rep_doc_id"),
        countDistinct(col("ahash")).as("n_ahash"))
      .filter(col("n_imgs") > 1)
      .orderBy(col("dhash"))
  }

  /** WebDataset-style SHARD PACKING manifest — the write-side layout step
    * of a training pipeline: media+text records are packed, in a
    * deterministic order, into ~capacity-byte shards, and the manifest
    * (per-shard doc count, byte total, key range) is what the training
    * reader consumes. Realized scalably as a running byte-sum window per
    * source group + integer division by capacity: one shuffle on the
    * group key, no sequential driver loop, and shard ids are stable under
    * re-partitioning (they depend only on the declared sort order).
    * Record size = text bytes + the 16-byte media payload. */
  val mmShard: Q = (s, d) => {
    val cap = 16384L // shard capacity in bytes
    val sized = T.documents(s, d).select(col("doc_id"), col("source"),
      (col("n_chars") + 16L).as("bytes"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    sized.withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("shard_id",
        graft.core.Numeric.idiv(col("cum") - 1L, lit(cap)))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard_id"))
  }

  /** AUDIO feature extraction — the third modality's plumbing (image:
    * [[mmPixels]], video: [[mmFrames]], audio: this): the payload read as
    * 16 unsigned 8-bit PCM samples (centered at 128), framed 4 samples per
    * frame; per frame the exact integer ENERGY Σx², RMS (one sqrt — IEEE
    * correctly-rounded, so cross-engine exact, unlike ln/exp), the
    * zero-crossing count (the classic cheap pitch/noisiness signal), and a
    * voice-activity flag at the uniform-noise mean-square threshold
    * (energy ≥ 4·5461) — the VAD gate an audio pipeline drops silence
    * with. All per-row codegen'd expressions; one Generate for the frame
    * explode; no shuffle before the declared sort. */
  val mmAudioFeats: Q = (s, d) => {
    val px = pixels(col("payload"), 16)
    val frames = transform(sequence(lit(0), lit(3)), f =>
      struct(f.as("frame_no"), slice(px, f * 4 + 1, lit(4)).as("sm")))
    media(s, d)
      .select(col("doc_id"), explode(frames).as("fr"))
      .select(col("doc_id"), col("fr.frame_no").cast("int").as("frame_no"),
        col("fr.sm").as("sm"))
      .withColumn("energy", aggregate(col("sm"), lit(0L), (a, p) =>
        a + (p - 128).cast("long") * (p - 128).cast("long")))
      .withColumn("zcr", size(filter(sequence(lit(1), lit(3)), i =>
        (element_at(col("sm"), i) >= 128) =!=
          (element_at(col("sm"), i + 1) >= 128))).cast("long"))
      .select(col("doc_id"), col("frame_no"), col("energy"),
        round(sqrt(col("energy").cast("double") / 4.0), 6).as("rms"),
        col("zcr"), (col("energy") >= 21844L).as("active"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** SCENE-CHANGE detection on the 4-frame "video" — the shot-boundary
    * pass a video curation pipeline runs before frame sampling (sample
    * per SCENE, not per fixed stride, or long static shots dominate):
    * consecutive frame brightness sums (exact integers) difference, a
    * boundary opens where |Δ| exceeds the threshold (200 ≈ one σ of the
    * 4-byte sum delta), scenes = boundaries + 1. `first_cut` = 0 means
    * "single scene" (frame 0 can never open a boundary) — no NULL in the
    * declared output. Integer math end to end; per-row expressions only. */
  val mmSceneDetect: Q = (s, d) => {
    val px = pixels(col("payload"), 16)
    def fsum(f: Int): Column =
      (1 to 4).map(i => element_at(px, f * 4 + i).cast("long")).reduce(_ + _)
    val deltas = (1 to 3).map(f => abs(fsum(f) - fsum(f - 1)))
    val cuts = (1 to 3).map(f =>
      when(deltas(f - 1) > 200L, lit(f.toLong)).otherwise(lit(0L)))
    media(s, d)
      .select(col("doc_id"),
        (cuts.map(c => when(c > 0L, 1L).otherwise(0L)).reduce(_ + _) + 1L)
          .as("n_scenes"),
        cuts.reduce((a, b) =>
          when(a > 0L, a).otherwise(b)).as("first_cut"),
        greatest(deltas: _*).as("max_delta"))
      .orderBy(col("doc_id"))
  }

  /** SHARD READER — the training loader's half of the WebDataset
    * contract [[mmShard]] writes: records (text bytes ‖ 16-byte media
    * raster) PACK into ≤16 KiB shard blobs with an offset-index sidecar
    * (the tar + .idx layout), both land on storage, and the reader gets
    * each record back by (shard, offset, length) alone — then proves the
    * round trip BYTE-LOSSLESS by re-deriving the media bytes from the
    * recovered text (`unhex(md5(text'))` must equal the recovered
    * raster) and matching the text against the source table. Output is
    * the read-side manifest: per shard, docs read, docs byte-verified
    * (== n_docs when lossless), byte total, key range.
    *
    * 100 TB shape: the pack is one window + one bounded aggregate per
    * shard (blob size ≤ capacity + one straddling record — the
    * collect_list is capacity-bounded, never corpus-bounded); the read
    * side is an index-to-shard equi-join where each task slices its own
    * records out of its own blobs — no driver funnel either way. The
    * offset index is exactly what lets a trainer fetch record i of
    * shard j with one ranged read. */
  val mmShardRead: Q = (s, d) => {
    val cap = 16384L
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/mm_shard_read"
    val recs = T.documents(s, d).select(col("doc_id"), col("source"),
      col("text"), (col("n_chars") + 16L).as("bytes"),
      concat(encode(col("text"), "UTF-8"), unhex(md5(col("text")))).as("rec"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val assigned = recs
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("shard_id",
        graft.core.Numeric.idiv(col("cum") - 1L, lit(cap)))
    val wS = Window.partitionBy(col("source"), col("shard_id"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val indexed = assigned
      .withColumn("offset", coalesce(sum(col("bytes")).over(wS), lit(0L)))
    indexed.select(col("doc_id"), col("source"), col("shard_id"),
        col("offset"), col("bytes"))
      .write.mode("overwrite").parquet(s"$dir/index")
    indexed
      .groupBy(col("source"), col("shard_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("offset"), col("rec")))),
        lit(Array.empty[Byte]),
        (acc, x) => concat(acc, x.getField("rec"))).as("blob"))
      .write.mode("overwrite").parquet(s"$dir/shards")
    val idx = s.read.parquet(s"$dir/index")
    val shards = s.read.parquet(s"$dir/shards")
    val back = idx.join(shards, Seq("source", "shard_id"))
      .withColumn("rec2", expr("substr(blob, CAST(offset + 1 AS INT), CAST(bytes AS INT))"))
      .withColumn("text2", expr("decode(substr(rec2, 1, CAST(bytes - 16 AS INT)), 'UTF-8')"))
      .withColumn("media2", expr("substr(rec2, CAST(bytes - 15 AS INT), 16)"))
    back.join(T.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
      .withColumn("ok",
        col("text2") === col("text") && col("media2") === unhex(md5(col("text"))))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_matched"),
        sum(col("bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard_id"))
  }

  /** IMAGE NEAR-DUP dedup — [[mmPhash]]'s exact-signature grouping
    * relaxed to a HAMMING ball, the way production image dedup works
    * (a re-encode/resize/crop perturbs a few signature bits; exact
    * grouping misses it): planted variants (every 9th image, last pixel
    * inverted — a compression artifact stand-in) perturb ≤ 1 dhash bit;
    * the pigeonhole band join (split the 12-bit dhash into two 6-bit
    * halves — Hamming ≤ 1 ⇒ at least one half matches exactly) yields
    * candidates from an EQUI-join, and `bit_count(xor)` verifies. The
    * SimHash discipline ([[graft.ops.LlmPipeline]] `dedup_simhash`)
    * applied to the vision signature — never all-pairs.
    *
    * 100 TB shape: signatures are per-row expressions; candidates
    * shuffle on the (half, value) band key only. A production 64-bit
    * pHash uses 4×16-bit blocks — block width grows with hash width,
    * holding bucket sizes flat. */
  val mmDedup: Q = (s, d) => {
    // Generate barrier (the mmPhash rule): evaluate the pixel array once
    // per row so dhashOf's 24 element references don't re-inline it
    val basePx = media(s, d)
      .select(col("doc_id"),
        explode(array(pixels(col("payload"), 16))).as("p"))
    val varPx = basePx.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        expr("transform(p, (x, i) -> IF(i = 15, 255 - x, x))").as("p"))
    val sigs = basePx.unionByName(varPx)
      .select(col("doc_id"), dhashOf(col("p")).as("h"))
    val bands = sigs.select(col("doc_id"), col("h"),
        explode(expr(
          "array(named_struct('b', 0, 'v', h & 63)," +
            " named_struct('b', 1, 'v', shiftright(h, 6) & 63))")).as("blk"))
      .select(col("doc_id"), col("h"),
        col("blk.b").as("b"), col("blk.v").as("v"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.h").as("ha"), col("y.h").as("hb"))
      .distinct()
    cand.filter(expr("bit_count(ha ^ hb) <= 1"))
      .select(col("a"), col("b"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"))
      .orderBy(col("a"), col("b"))
  }

  val queries: Map[String, Q] = Map(
    "mm_dedup" -> mmDedup,
    "mm_shard" -> mmShard,
    "mm_shard_read" -> mmShardRead,
    "mm_audio_feats" -> mmAudioFeats,
    "mm_scene_detect" -> mmSceneDetect,
    "mm_meta" -> mmMeta,
    "mm_pixels" -> mmPixels,
    "mm_resize" -> mmResize,
    "mm_frames" -> mmFrames,
    "mm_batch_stats" -> mmBatchStats,
    "mm_phash" -> mmPhash,
    "mm_sharpness" -> mmSharpness,
  )

  val oracles: Map[String, String] = Map(
    // Hamming near-dup: the oracle compares ALL pairs (banding is
    // result-invariant); variant pixel lists rebuild via slice+concat
    "mm_dedup" -> {
      val dhash = (for { r <- 0 until 4; c <- 0 until 3 } yield
        s"CASE WHEN p[${r * 4 + c + 1}] < p[${r * 4 + c + 2}] " +
          s"THEN CAST(${1L << (r * 3 + c)} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"""WITH px0 AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents),
         |pxv AS (SELECT doc_id + 500000 AS doc_id,
         |    p[1:15] || [255 - p[16]] AS p
         |  FROM px0 WHERE doc_id % 9 = 0),
         |px AS (SELECT * FROM px0 UNION ALL SELECT * FROM pxv),
         |sig AS (SELECT doc_id, $dhash AS h FROM px)
         |SELECT sa.doc_id AS a, sb.doc_id AS b,
         |  CAST(bit_count(xor(sa.h, sb.h)) AS BIGINT) AS hamming
         |FROM sig sa JOIN sig sb ON sa.doc_id < sb.doc_id
         |WHERE bit_count(xor(sa.h, sb.h)) <= 1
         |ORDER BY a, b""".stripMargin
    },

    // audio features re-derived from the md5 pixel math: exact integer
    // energy/zcr, one correctly-rounded sqrt for the rms
    "mm_audio_feats" -> {
      def en(base: String) = (1 to 4)
        .map(i => s"(p[$base + $i] - 128) * (p[$base + $i] - 128)")
        .mkString(" + ")
      def zc(base: String) = (1 to 3)
        .map(i => s"CASE WHEN (p[$base + $i] >= 128) <> (p[$base + $i + 1] >= 128) THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents),
         |fr AS (
         |  SELECT doc_id, f.f AS frame_no,
         |    ${en("f.f*4")} AS energy, ${zc("f.f*4")} AS zcr
         |  FROM px CROSS JOIN (VALUES (0), (1), (2), (3)) f(f))
         |SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
         |  CAST(energy AS BIGINT) AS energy,
         |  round(sqrt(CAST(energy AS DOUBLE) / 4.0), 6) AS rms,
         |  CAST(zcr AS BIGINT) AS zcr, energy >= 21844 AS active
         |FROM fr ORDER BY doc_id, frame_no""".stripMargin
    },

    // scene cuts re-derived from the same integer frame sums
    "mm_scene_detect" -> {
      def fs(f: Int) = (1 to 4).map(i => s"p[${f * 4 + i}]").mkString(" + ")
      val ds = (1 to 3).map(f => s"abs((${fs(f)}) - (${fs(f - 1)}))")
      val cuts = (1 to 3).map(f =>
        s"CASE WHEN ${ds(f - 1)} > 200 THEN $f ELSE 0 END")
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents)
         |SELECT doc_id,
         |  CAST(${cuts.map(c => s"CASE WHEN ($c) > 0 THEN 1 ELSE 0 END")
              .mkString(" + ")} + 1 AS BIGINT) AS n_scenes,
         |  CAST(CASE WHEN (${cuts(0)}) > 0 THEN ${1}
         |       WHEN (${cuts(1)}) > 0 THEN ${2}
         |       WHEN (${cuts(2)}) > 0 THEN ${3} ELSE 0 END AS BIGINT)
         |    AS first_cut,
         |  CAST(greatest(${ds.mkString(", ")}) AS BIGINT) AS max_delta
         |FROM px ORDER BY doc_id""".stripMargin
    },

    // read-side manifest re-derived declaratively: the oracle never sees
    // the shard blobs or the index, only the packing rule — and asserts
    // n_matched == n_docs, which the engine must EARN by slicing every
    // record back out of the written bytes and verifying it (the
    // source_binary oracle discipline: recompute the invariant, let the
    // filesystem round trip prove itself)
    "mm_shard_read" ->
      """WITH sized AS (
        |  SELECT doc_id, source, n_chars + 16 AS bytes FROM documents),
        |packed AS (
        |  SELECT source, doc_id, bytes,
        |    (SUM(bytes) OVER (PARTITION BY source ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |      // 16384 AS shard_id
        |  FROM sized)
        |SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_docs, COUNT(*) AS n_matched,
        |  CAST(SUM(bytes) AS BIGINT) AS shard_bytes,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM packed GROUP BY source, shard_id
        |ORDER BY source, shard_id""".stripMargin,

    // DuckDB dialect: `//` floors — operands are non-negative so it
    // matches Spark's DIV (see Numeric.idiv dialect note)
    "mm_shard" ->
      """WITH sized AS (
        |  SELECT doc_id, source, n_chars + 16 AS bytes FROM documents),
        |packed AS (
        |  SELECT source, doc_id, bytes,
        |    (SUM(bytes) OVER (PARTITION BY source ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |      // 16384 AS shard_id
        |  FROM sized)
        |SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_docs, CAST(SUM(bytes) AS BIGINT) AS shard_bytes,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM packed GROUP BY source, shard_id
        |ORDER BY source, shard_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id, CAST(len(md5(text)) / 2 AS INT) AS n_bytes,
        |  4 AS width, 4 AS height, 'gray8' AS fmt, 16 AS n_px
        |FROM documents ORDER BY doc_id""".stripMargin,

    // 2x2-interior Laplacian variance with cleared denominator; the blur
    // flag compares exact integers (var < 20000 <=> 16var < 320000)
    "mm_sharpness" -> {
      val lap = (for { r <- Seq(1, 2); c <- Seq(1, 2) } yield
        s"(4*p[${r * 4 + c + 1}] - p[${(r - 1) * 4 + c + 1}] - p[${(r + 1) * 4 + c + 1}]" +
          s" - p[${r * 4 + c}] - p[${r * 4 + c + 2}])").mkString(", ")
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents),
         |l AS (SELECT doc_id, [$lap] AS ls FROM px),
         |v AS (SELECT doc_id,
         |    4 * CAST(list_sum(list_transform(ls, x -> x * x)) AS BIGINT)
         |      - CAST(list_sum(ls) AS BIGINT) * CAST(list_sum(ls) AS BIGINT) AS v16
         |  FROM l)
         |SELECT doc_id,
         |  CAST(round(CAST(v16 AS DOUBLE) / 16.0, 6) AS DOUBLE) AS lap_var,
         |  v16 < 320000 AS is_blurry
         |FROM v ORDER BY doc_id""".stripMargin
    },

    "mm_pixels" ->
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents)
         |SELECT doc_id,
         |  list_min(p) AS px_min, list_max(p) AS px_max,
         |  round(CAST(list_sum(p) AS DOUBLE) / 16.0, 6) AS px_mean,
         |  CAST(len(list_filter(p, x -> x >= 0 AND x < 64)) AS BIGINT) AS h0,
         |  CAST(len(list_filter(p, x -> x >= 64 AND x < 128)) AS BIGINT) AS h1,
         |  CAST(len(list_filter(p, x -> x >= 128 AND x < 192)) AS BIGINT) AS h2,
         |  CAST(len(list_filter(p, x -> x >= 192 AND x < 256)) AS BIGINT) AS h3
         |FROM px ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents)
         |SELECT doc_id, 4 AS n_bytes, 2 AS width, 2 AS height,
         |  CAST(p[1] + p[3] + p[9] + p[11] AS BIGINT) AS checksum
         |FROM px ORDER BY doc_id""".stripMargin,

    "mm_frames" ->
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents),
         |fr AS (
         |  SELECT doc_id, f.f AS frame_no,
         |    round(CAST(p[f.f*4 + 1] + p[f.f*4 + 2] + p[f.f*4 + 3] + p[f.f*4 + 4]
         |      AS DOUBLE) / 4.0, 6) AS frame_mean
         |  FROM px CROSS JOIN (VALUES (0), (2)) f(f))
         |SELECT doc_id, CAST(frame_no AS INT) AS frame_no, frame_mean
         |FROM fr ORDER BY doc_id, frame_no""".stripMargin,

    "mm_batch_stats" ->
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents)
         |SELECT doc_id, list_min(p) AS px_min, list_max(p) AS px_max,
         |  round(CAST(list_sum(p) AS DOUBLE) / 16.0, 6) AS px_mean
         |FROM px ORDER BY doc_id""".stripMargin,

    "mm_phash" -> {
      val dhash = (for { r <- 0 until 4; c <- 0 until 3 } yield
        s"CASE WHEN p[${r * 4 + c + 1}] < p[${r * 4 + c + 2}] " +
          s"THEN CAST(${1L << (r * 3 + c)} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      val ahash = (0 until 16).map(i =>
        s"CASE WHEN CAST(p[${i + 1}] AS BIGINT) * 16 > CAST(list_sum(p) AS BIGINT) " +
          s"THEN CAST(${1L << i} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"""WITH px AS (SELECT doc_id, ${pixelsSql("text")} AS p FROM documents),
         |sig AS (SELECT doc_id, $dhash AS dhash, $ahash AS ahash FROM px)
         |SELECT dhash, COUNT(*) AS n_imgs, MIN(doc_id) AS rep_doc_id,
         |  COUNT(DISTINCT ahash) AS n_ahash
         |FROM sig GROUP BY dhash HAVING COUNT(*) > 1
         |ORDER BY dhash""".stripMargin
    },
  )
}
