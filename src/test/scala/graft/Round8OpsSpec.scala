package graft

import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.ops.{Functions, LlmPipeline, Sources, Stats}

/** Semantic pins for the round-8 statistical / LM / ingest operators —
  * properties the DuckDB hash comparison can't see (monotonicity,
  * probability-mass closure, idempotency under re-apply). */
class Round8OpsSpec extends SparkSpecBase {

  test("events_survival: curve is non-increasing, in (0,1], per cohort") {
    val rows = Stats.eventsSurvival(spark, sf0001)
      .select(col("cohort"), col("dur"), col("survival"), col("n_risk"),
        col("d_events"))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (cohort, rs) =>
      val curve = rs.sortBy(_.getLong(1)).map(_.getDouble(2))
      curve.sliding(2).foreach {
        case Array(a, b) =>
          assert(b <= a + 1e-12, s"$cohort: survival increased $a -> $b")
        case _ => ()
      }
      assert(curve.forall(v => v >= 0.0 && v <= 1.0))
      // every at-risk count can cover its deaths
      rs.foreach(r => assert(r.getLong(3) >= r.getLong(4)))
    }
  }

  test("agg_mannwhitney: U bounds and cohort-count closure per status") {
    val byStatus = T.orders(spark, sf0001).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Stats.aggMannWhitney(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == byStatus.keySet)
    rows.foreach { r =>
      val (na, nb, uA) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(na + nb == byStatus(r.getString(0)), "cohorts must partition")
      assert(uA >= 0.0 && uA <= na.toDouble * nb,
        s"U=$uA outside [0, ${na.toDouble * nb}]")
      assert(!r.getDouble(4).isNaN)
    }
  }

  test("agg_chi2: contributions sum to the statistic; expected sums to N") {
    val rows = Stats.aggChi2(spark, sf0001)
      .select(col("observed"), col("expected"), col("contrib"), col("chi2"),
        col("dof"))
      .collect()
    val n = rows.map(_.getLong(0)).sum
    assert(math.abs(rows.map(_.getDouble(1)).sum - n) < 1e-3,
      "expected counts must sum to N")
    val chi2 = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == chi2), "chi2 must be one scalar")
    assert(math.abs(rows.map(_.getDouble(2)).sum - chi2) < 1e-5)
    assert(rows.head.getLong(4) == 6L, "(3-1)x(4-1) design => dof 6")
  }

  test("text_ks_drift: D in [0,1], one row per source pair, at an observed value") {
    val nSrc = T.documents(spark, sf0001).select(col("source")).distinct().count()
    val chars = T.documents(spark, sf0001).select(col("n_chars"))
      .distinct().collect().map(_.getLong(0)).toSet
    val rows = Stats.textKsDrift(spark, sf0001).collect()
    assert(rows.length == (nSrc * (nSrc - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(chars.contains(r.getLong(4)), "ks_at must be an observed value")
    }
  }

  test("text_kneser_ney: smoothed bigram mass sums to 1 per context") {
    // rebuild the model exactly as the op does and close the probability
    // mass over the FULL successor vocabulary — the defining KN property
    // (discount mass re-enters through the continuation term)
    val s = spark
    val toks = T.documents(s, sf0001).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("tok")).limit(24)
      .select(col("tok"), lit(1L).as("inv"))
    val m = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("inv").isNull, lit("<unk>")).otherwise(col("tok")).as("mtok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = m.withColumn("w2", lead(col("mtok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("mtok").as("w1"), col("w2"))
    val bg = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1 = bg.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val n1p = bg.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val pcontC = bg.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong }
    val b = bg.size.toDouble
    val allW2 = pcontC.keySet
    c1.keys.foreach { w1 =>
      val mass = allW2.toSeq.map { w2 =>
        val c12 = bg.getOrElse((w1, w2), 0L).toDouble
        val direct = if (c12 > 0) (c12 - 0.75) / c1(w1) else 0.0
        direct + (0.75 * n1p(w1) / c1(w1)) * (pcontC(w2) / b)
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9,
        s"context '$w1': KN mass $mass != 1")
    }
    // and the declared output is positive, finite perplexity per doc
    val out = LlmPipeline.textKneserNey(spark, sf0001)
      .select(col("kn_ppl")).collect()
    assert(out.nonEmpty && out.forall(r =>
      r.getDouble(0) > 0.0 && !r.getDouble(0).isInfinite))
  }

  test("embed_covariance: diagonal non-negative, full triangle per label") {
    val rows = Stats.embedCovariance(spark, sf0001)
      .select(col("label"), col("i"), col("j"), col("cov")).collect()
    val perLabel = rows.groupBy(_.getInt(0))
    perLabel.foreach { case (label, rs) =>
      assert(rs.length == 36, s"label $label: expected 8*9/2 entries")
      rs.filter(r => r.getLong(1) == r.getLong(2)).foreach { r =>
        assert(r.getDouble(3) >= -1e-12,
          s"label $label var(${r.getLong(1)}) negative: ${r.getDouble(3)}")
      }
    }
  }

  test("sample_systematic: audit keys sit on the stride") {
    val rows = Stats.sampleSystematic(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) % 40 == 7 && r.getLong(4) % 40 == 7)
      assert(r.getLong(1) > 0)
    }
  }

  test("fn_geo: distances bounded by half the great circle, flag consistent") {
    val rows = Functions.fnGeo(spark, sf0001)
      .select(col("dist_km"), col("near")).collect()
    assert(rows.length == 300, "25 nations -> 300 unordered pairs")
    rows.foreach { r =>
      val dkm = r.getDouble(0)
      assert(dkm >= 0.0 && dkm <= 6371.0 * math.Pi + 0.01)
      assert(r.getBoolean(1) == (dkm <= 5000.0))
    }
  }

  test("text_rouge_overlap: truncated variants score recall = (n-3)/(n-1)") {
    // a variant that drops the last 2 tokens loses exactly the last 2
    // bigrams of its base (when all base bigrams are distinct, overlap
    // = n_base - 2 and recall = (n-3)/(n-1) over n-1 base bigrams) —
    // so recall must sit in (0, 1) and F1 must exceed recall (var is a
    // strict subset: precision = 1 when variant bigrams are all shared)
    val rows = LlmPipeline.textRougeOverlap(spark, sf0001)
      .select(col("n_base"), col("n_var"), col("overlap"),
        col("rouge2_recall"), col("rouge2_precision")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 2, "variant drops 2 bigrams")
      assert(r.getLong(2) <= r.getLong(1), "overlap clipped by variant mass")
      // shortest corpus docs (~10 tokens) bottom out at 7/9
      assert(r.getDouble(3) > 0.6 && r.getDouble(3) < 1.0)
      assert(r.getDouble(4) >= r.getDouble(3), "subset => precision >= recall")
    }
  }

  test("embed_pca_power: unit component, dominant eigenvalue bound") {
    val rows = Stats.embedPcaPower()(spark, sf0001)
      .select(col("label"), col("dim"), col("component"), col("eigenvalue"))
      .collect()
    rows.groupBy(_.getInt(0)).foreach { case (label, rs) =>
      assert(rs.length == 8, s"label $label: 8 dims expected")
      val norm = math.sqrt(rs.map(r => math.pow(r.getDouble(2), 2)).sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"label $label: |v| = $norm != 1")
      val ev = rs.head.getDouble(3)
      assert(rs.forall(_.getDouble(3) == ev) && ev > 0.0)
      // the dominant eigenvalue is at least the largest diagonal variance
      // times a loose factor — sanity, not tightness
      assert(ev < 1e6, "eigenvalue blew up — normalization broken")
    }
  }

  test("graph_label_prop: labels are component representatives after 3 rounds") {
    val rows = graft.ops.Insights.graphLabelProp()(spark, sf0001)
      .select(col("lab"), col("n_members"), col("min_node"), col("max_node"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2),
        "min-label propagation: the label IS the smallest member")
      assert(r.getLong(1) >= 2 && r.getLong(3) >= r.getLong(2))
    }
  }

  test("meta_vacuum: rows survive, superseded files reclaimed") {
    val rows = Sources.metaVacuum(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2)
    val (before, after) = (rows(0), rows(1))
    assert(before._1 == "0_before" && after._1 == "1_after")
    assert(before._2 == 5 && after._2 == 1, "4+1 files -> 1 file")
    assert(before._3 == 2 * after._3, "before sees both versions")
  }

  test("events_markov_stationary: probability mass sums to 1, states valid") {
    val types = T.events(spark, sf0001).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).toSet
    val rows = Stats.eventsMarkovStationary()(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(types.contains(r.getString(0)))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"stationary mass $mass != 1")
  }

  test("embed_isotropy: anisotropy bounded by Cauchy-Schwarz") {
    val rows = Stats.embedIsotropy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (meanSq, centSq, ani) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ani >= 0.0 && ani <= 1.0 + 1e-9, s"anisotropy $ani out of [0,1]")
      assert(centSq <= meanSq + 1e-9, "||mu||^2 cannot exceed E||x||^2")
      assert(math.abs(ani - centSq / meanSq) < 1e-3)
    }
  }

  test("agg_hhi: index between uniform floor and monopoly ceiling") {
    val rows = Stats.aggHhi(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9,
        s"HHI $hhi outside [1/$n, 1]")
      assert(top > 0.0 && top <= 1.0)
      assert(hhi >= top * top - 1e-9, "HHI must dominate top share squared")
    }
  }

  test("dedup_minhash_audit: 32-hash estimate tracks exact Jaccard") {
    val rows = LlmPipeline.dedupMinhashAudit(spark, sf0001)
      .select(col("est_jacc"), col("exact_jacc"), col("abs_err")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(2) <= 0.6, s"estimator off by ${r.getDouble(2)}")
    }
    // unbiased estimator: the MEAN error over candidate pairs is far
    // tighter than any single pair's (sigma ~ sqrt(J(1-J)/32) ~ 0.09)
    val meanErr = rows.map(_.getDouble(2)).sum / rows.length
    assert(meanErr < 0.15, s"mean |est - exact| = $meanErr too loose")
  }

  test("text_shard_manifest: full coverage, hash-balanced shards") {
    val total = T.documents(spark, sf0001).count()
    val rows = LlmPipeline.textShardManifest(spark, sf0001)
      .select(col("shard"), col("n_docs"), col("share")).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).sum == total, "every doc lands in a shard")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    val counts = rows.map(_.getLong(1))
    assert(counts.max.toDouble / counts.min < 3.0,
      s"hash balance degenerate: ${counts.mkString(",")}")
  }

  test("corpus_card: language rows partition the corpus") {
    val total = T.documents(spark, sf0001).count()
    val nSources = T.documents(spark, sf0001).select(col("source"))
      .distinct().count()
    val rows = graft.ops.Curation.corpusCard(spark, sf0001).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, "distinct_frac")
      assert(r.getDouble(6) >= 1.0 / nSources - 1e-9,
        "dominant source must hold at least the uniform share")
    }
  }

  test("merge_idempotent: re-applying the batch changes nothing") {
    val once = Sources.mergeIdempotent(spark, sf0001).collect().map(_.toSeq)
    val twice = Sources.mergeIdempotent(spark, sf0001).collect().map(_.toSeq)
    assert(once.toSeq == twice.toSeq, "second apply must be a no-op")
    // idempotency closes the loop to the source table exactly
    val src = T.orders(spark, sf0001).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    once.foreach { r =>
      assert(r(1) == src(r(0).asInstanceOf[String]), "row count drifted")
    }
  }
}
