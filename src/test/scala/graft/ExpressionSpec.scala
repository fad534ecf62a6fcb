package graft

import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.expr.{FloatDotProduct, MinHashAgg}

/** Native extension machinery: the codegen'd FloatDotProduct must be
  * bit-identical to the higher-order-function formulation (both eval
  * paths), and the one-pass MinHash aggregator must equal the K-column
  * min formulation it replaced. */
class ExpressionSpec extends SparkSpecBase {

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("FloatDotProduct == HOF chain, bit-exact, on all sf0.001 embeddings") {
    val e = T.embeddings(spark, sf0001)
    val both = e.select(
      FloatDotProduct.fdot(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // also under the interpreted path (codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(both.filter(col("native") =!= col("hof")).count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("FloatDotProduct null/shape semantics == HOF chain on degenerate inputs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(Option(1f), Option(2f), Option(3f))),
        Some(Seq(Option(4f), Option(5f), Option(6f)))),
      (None, Some(Seq(Option(1f), Option(1f)))),        // null input → NULL
      (Some(Seq(Option(2f))),
        Some(Seq(Option(3f), Option(9f)))),             // length mismatch → NULL
      (Some(Seq(Option(1f), None)),
        Some(Seq(Option(2f), Option(3f))))              // null element → NULL
    ).toDF("a", "b")
    val out = df.select(
      FloatDotProduct.fdot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(out(0).getDouble(0) == (4.0 + 10.0 + 18.0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
    // null-safe equality with the HOF chain on EVERY row, both eval paths
    val diff = df.filter(!(FloatDotProduct.fdot(col("a"), col("b")) <=>
      hofDot(col("a"), col("b"))))
    assert(diff.count() == 0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(diff.count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("Md5Prefix48 == conv(substring(md5)) chain, bit-exact, both eval paths") {
    val chain = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 12), 16, 10).cast("long")
    val native = (c: org.apache.spark.sql.Column) =>
      graft.expr.Md5Prefix48.md548(c)
    // real corpus text plus adversarial cases: empty string, multi-byte
    // UTF-8, digest bytes with the high bit set (sign-extension traps)
    val s = spark
    import s.implicits._
    val adhoc = Seq("", "a", "the quick brown fox", "naïve café 日本語",
      "\u0000control", "x" * 10000).toDF("t")
    val corpus = T.documents(spark, sf0001).select(col("text").as("t"))
    Seq(adhoc, corpus).foreach { df =>
      val both = df.select(native(col("t")).as("n"), chain(col("t")).as("c"))
      assert(both.filter(col("n") =!= col("c") || col("n") < 0).count() == 0)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try assert(both.filter(col("n") =!= col("c")).count() == 0)
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    // null in → null out, and SQL registration works
    val nulls = Seq[Option[String]](None).toDF("t")
    assert(nulls.select(native(col("t"))).head.isNullAt(0))
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT md5_48('abc') = " +
      "CAST(conv(substring(md5('abc'), 1, 12), 16, 10) AS BIGINT)")
      .head.getBoolean(0))
  }

  test("SlidingMin == slice/array_min formulation on corpus gram arrays") {
    val s = spark
    import s.implicits._
    val w = 16
    val grams = transform(
      sequence(lit(1), length(col("text")) - 7),
      i => graft.expr.Md5Prefix48.md548(substring(col("text"), i, lit(8))))
    val g = T.documents(spark, sf0001).filter(length(col("text")) >= 23)
      .select(col("doc_id"), grams.as("g"))
    val naive = g.select(col("doc_id"), col("g"),
        explode(sequence(lit(1), size(col("g")) - (w - 1))).as("j"))
      .select(col("doc_id"), array_min(slice(col("g"), col("j"), lit(w))).as("hv"))
    val native = g.select(col("doc_id"),
        explode(graft.expr.SlidingMin.slidingMin(col("g"), w)).as("hv"))
    assert(native.exceptAll(naive).count() == 0 &&
      naive.exceptAll(native).count() == 0)
    // short array → NULL; ad-hoc values exercise the deque edge cases
    val tiny = Seq((1L, Seq(5L, 3L, 4L, 3L, 1L))).toDF("id", "a")
    val out = tiny.select(graft.expr.SlidingMin.slidingMin(col("a"), 2))
      .head.getSeq[Long](0)
    assert(out == Seq(3L, 3L, 3L, 1L))
    assert(tiny.select(graft.expr.SlidingMin.slidingMin(col("a"), 6))
      .head.isNullAt(0))
  }

  test("GramHash48 == transform/substring/md5_48 chain on corpus + multibyte") {
    val s = spark
    import s.implicits._
    val k = 8
    def chain(c: org.apache.spark.sql.Column) = transform(
      sequence(lit(1), length(c) - (k - 1)),
      i => graft.expr.Md5Prefix48.md548(substring(c, i, lit(k))))
    val native = (c: org.apache.spark.sql.Column) =>
      graft.expr.GramHash48.gramHash48(c, k)
    // multibyte chars shift byte offsets off the char grid — the
    // boundary-walk must slice the same bytes the char substring would
    val adhoc = Seq("exactly8", "a bit longer ascii text here",
      "naïve café 日本語テスト mixed width", "ññññññññññ", "x" * 5000)
      .toDF("t").filter(length(col("t")) >= k)
    Seq(adhoc,
        T.documents(spark, sf0001).select(col("text").as("t"))).foreach { df =>
      val both = df.select(native(col("t")).as("n"), chain(col("t")).as("c"))
      assert(both.filter(not(col("n") <=> col("c"))).count() == 0)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try assert(both.filter(not(col("n") <=> col("c"))).count() == 0)
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    // short input → empty array; null → null; SQL registration works
    val edge = Seq(Some("short"), None).toDF("t")
      .select(native(col("t")).as("n")).collect()
    assert(edge(0).getSeq[Long](0).isEmpty && edge(1).isNullAt(0))
    GraftExtensions.install(spark)
    assert(spark.sql(
      "SELECT gram_hash48('abcdefghij', 8) = array(md5_48('abcdefgh'), " +
        "md5_48('bcdefghi'), md5_48('cdefghij'))").head.getBoolean(0))
  }

  test("ShingleXx64 == explode/concat_ws/xxhash64 pipeline, incl. space runs") {
    val s = spark
    import s.implicits._
    val n = 3
    // adversarial spacing: runs of spaces (empty tokens), leading/trailing
    // spaces, multibyte chars straddling token boundaries
    val adhoc = Seq(
      (1L, "plain three token shingles here ok"),
      (2L, "double  space   run"),
      (3L, " leading and trailing "),
      (4L, "exactly three tokens"),
      (5L, "two tokens"),            // < n → no shingles
      (6L, "naïve café 日本語 mixed width 文字")
    ).toDF("doc_id", "text")
    val corpus = T.documents(spark, sf0001).select(col("doc_id"), col("text"))
    Seq(adhoc, corpus).foreach { df =>
      // pipeline formulation (the shape hashedShingleSets used to run)
      val pipeline = graft.api.TextDedup.shingleRows(df, "doc_id", "text", n)
        .withColumn("hv", xxhash64(col("sh")))
        .groupBy(col("doc_id"))
        .agg(array_sort(array_distinct(collect_list(col("hv")))).as("sset"))
      val native = graft.api.TextDedup.hashedShingleSets(df, "doc_id", "text", n)
        .select(col("doc_id"), array_sort(col("sset")).as("sset"))
      assert(native.exceptAll(pipeline).count() == 0 &&
        pipeline.exceptAll(native).count() == 0,
        "native shingle sets differ from the pipeline formulation")
    }
    // SQL registration
    GraftExtensions.install(spark)
    assert(spark.sql(
      "SELECT shingle_xx64('a b c d', 3) = " +
        "array(xxhash64('a b c'), xxhash64('b c d'))").head.getBoolean(0))
  }

  private def shingleTestFrames = {
    val s = spark
    import s.implicits._
    val adhoc = Seq(
      (1L, "plain three token shingles here ok"),
      (2L, "double  space   run"),
      (3L, " leading and trailing "),
      (4L, "exactly three tokens"),
      (5L, "two tokens"),            // < n → no shingles → dropped
      (6L, "naïve café 日本語 mixed width 文字"),
      (7L, "dup dup dup dup dup")    // occurrence multiplicity matters
    ).toDF("doc_id", "text")
    Seq(adhoc, T.documents(spark, sf0001).select(col("doc_id"), col("text")))
  }

  test("MinHashSig == shingleRows + MinHashAgg pipeline, incl. doc drops") {
    val n = 3
    shingleTestFrames.foreach { df =>
      val pipeline = graft.api.TextDedup.sigsFromRows(
        graft.api.TextDedup.shingleRows(df, "doc_id", "text", n), "doc_id")
      val native = graft.api.TextDedup.minhashSignatures(df, "doc_id", "text", n)
      assert(native.exceptAll(pipeline).count() == 0 &&
        pipeline.exceptAll(native).count() == 0,
        "native MinHash signatures differ from the aggregate formulation")
    }
    GraftExtensions.install(spark)
    // SQL registration + K mins really are the affine mins of md5_48 % P
    val (p, _, a, b) = MinHashAgg.params
    assert(spark.sql(
      s"SELECT minhash_sig('x y z', 3)[0] = " +
        s"(${a(0)}L * (md5_48('x y z') % ${p}L) + ${b(0)}L) % ${p}L").head.getBoolean(0))
    assert(spark.sql("SELECT minhash_sig('only two', 3)").head.isNullAt(0))
  }

  test("SimHash48 == explode + bit-vote groupBy pipeline, occurrence-exact") {
    val n = 3
    val bits = 48
    shingleTestFrames.foreach { df =>
      val exploded = graft.api.TextDedup.shingleRows(df, "doc_id", "text", n)
        .withColumn("__hv", graft.api.TextDedup.h48(col("sh")))
      val bitSums = (0 until bits).map(j =>
        sum(shiftright(col("__hv"), j).bitwiseAND(1) * 2 - 1).as(s"__s_$j"))
      val pipeline = exploded.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash",
          (0 until bits).map(j =>
            when(col(s"__s_$j") > 0, lit(1L << j)).otherwise(lit(0L))
          ).reduce(_ + _))
        .select(col("doc_id"), col("simhash"))
      val native = graft.api.TextDedup.simhashSignatures(df, "doc_id", "text", bits, n)
      assert(native.exceptAll(pipeline).count() == 0 &&
        pipeline.exceptAll(native).count() == 0,
        "native SimHash signatures differ from the bit-vote formulation")
    }
    GraftExtensions.install(spark)
    // single-shingle doc: simhash == the shingle's own h48 (every vote +1
    // on set bits, -1 on clear bits)
    assert(spark.sql(
      "SELECT simhash48('exactly three tokens', 3, 48) = " +
        "md5_48('exactly three tokens')").head.getBoolean(0))
    assert(spark.sql("SELECT simhash48('only two', 3, 48)").head.isNullAt(0))
  }

  test("RewriteFloatDot rewrites the HOF idiom into the native expression") {
    val e = T.embeddings(spark, sf0001).limit(100)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.expr.RewriteFloatDot
    try {
      val df = e.select(col("vec_id"),
        hofDot(col("embedding"), col("embedding")).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("float_dot"),
        "HOF chain not rewritten to FloatDotProduct")
      // and the rewritten plan still computes the identical values
      val viaRule = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.expr.RewriteFloatDot)
      val plain = e.select(col("vec_id"),
        hofDot(col("embedding"), col("embedding")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaRule == plain)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.expr.RewriteFloatDot)
    }
  }

  test("Bloom: no false negatives, bounded FPR, partition-invariant merge") {
    import graft.expr.Bloom
    val keys = T.customer(spark, sf0001).select(col("c_custkey"))
    val bloom = keys.agg(Bloom.agg(col("c_custkey"), 1 << 14, 5).as("bf"))
    // no false negatives: every inserted key probes true (codegen path)
    val misses = keys.crossJoin(bloom)
      .filter(!Bloom.mightContain(col("bf"), col("c_custkey")))
      .count()
    assert(misses == 0, s"bloom dropped $misses present keys (false negatives)")
    // bounded false-positive rate on a disjoint probe set: n≈150 keys in
    // 2^14 bits with k=5 gives FPR ≈ (1-e^(-kn/m))^5 ≈ 1e-7; assert a
    // loose 2% so the test never flakes on hash accidents
    val probes = keys.select((col("c_custkey") + 1000000000L).as("k"))
    val fp = probes.crossJoin(bloom)
      .filter(Bloom.mightContain(col("bf"), col("k"))).count()
    val n = probes.count()
    assert(fp.toDouble / n < 0.02, s"FPR $fp/$n exceeds 2%")
    // merge is OR: the aggregated value is byte-identical regardless of
    // partitioning (1 partition vs 13 → different partial-merge trees)
    val one = keys.repartition(1)
      .agg(Bloom.agg(col("c_custkey"), 1 << 14, 5)).head.getAs[Array[Byte]](0)
    val many = keys.repartition(13)
      .agg(Bloom.agg(col("c_custkey"), 1 << 14, 5)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many), "bloom not partition-invariant")
    // interpreted path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val missesInterp = keys.crossJoin(bloom)
        .filter(!Bloom.mightContain(col("bf"), col("c_custkey"))).count()
      assert(missesInterp == 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("MinHashAgg == column-wise min formulation") {
    val s = spark
    import s.implicits._
    val (p, k, a, b) = MinHashAgg.params
    val hv = (1 to 500).map(i => (i % 7L, (i * 2654435761L) % p))
      .toDF("g", "hv")
    val native = hv.groupBy("g").agg(MinHashAgg.minhash(col("hv")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mins = (0 until k).map(i =>
      min((lit(a(i)) * col("hv") + lit(b(i))) % p).as(s"m_$i"))
    val colwise = hv.groupBy("g").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_))).toMap
    assert(native.keySet == colwise.keySet)
    native.foreach { case (g, sig) =>
      assert(sig == colwise(g), s"signature mismatch for group $g")
    }
  }
}
