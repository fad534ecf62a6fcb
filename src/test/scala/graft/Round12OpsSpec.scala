package graft

import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Round-12 operator tests: the graph_hits canonicalization guard lives in
  * PropertySpec (headroom sweep); this spec covers the new round-12 ops and
  * the ADVICE r11 data-assumption guards. */
class Round12OpsSpec extends SparkSpecBase {

  test("text_ppl_holdout: '<unk>' is an attested train unigram at both gate SFs (ADVICE r11)") {
    // The holdout scorer inner-joins val tokens against the train unigram
    // table after OOV mapping — if '<unk>' were ever absent from uni
    // (train vocab <= 24 types), OOV val tokens would silently drop from
    // n_tok instead of scoring. The docstring's "unigram term always
    // attested by construction" is a DATA assumption; this pins it.
    Seq(sf0001, "/root/testdata/sf0.01").foreach { d =>
      val train = T.documents(spark, d)
        .withColumn("bkt",
          graft.expr.Md5Prefix48.md548(
            concat(lit("split:"), col("doc_id").cast("string"))) % 100L)
        .filter(col("bkt") >= 2L)
      val nTypes = train
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(countDistinct(col("tok"))).collect()(0).getLong(0)
      assert(nTypes > 24L,
        s"$d: train vocab has only $nTypes types (<= 24) — '<unk>' would " +
          "be unattested and the holdout join would drop OOV tokens")
      // and the declared query itself scores every val token: per-doc
      // n_tok must equal the raw val token count (no silent drops)
      val scored = graft.ops.Frontier2.textPplHoldout(spark, d)
        .select(col("doc_id"), col("n_tok"))
      val raw = T.documents(spark, d)
        .withColumn("bkt",
          graft.expr.Md5Prefix48.md548(
            concat(lit("split:"), col("doc_id").cast("string"))) % 100L)
        .filter(col("bkt") === 0L)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_raw"))
      val bad = scored.join(raw, Seq("doc_id"))
        .filter(col("n_tok") =!= col("n_raw")).count()
      assert(bad == 0L,
        s"$d: $bad val docs scored fewer tokens than they contain — OOV drop")
    }
  }
}
