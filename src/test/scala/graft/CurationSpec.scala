package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Property-level assertions for the round-7c curation operators — the
  * invariants the DuckDB oracle's value equality does NOT directly state
  * (planted-variant coverage, monotonic upweighting, bound properties,
  * plan shape), on sf0.001. */
class CurationSpec extends SparkSpecBase {

  test("dedup_substring: planted prefix variants are fully covered; fracs bounded") {
    val rows = Curation.dedupSubstring(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSpans, covered, frac) =>
      assert(nSpans >= 1 && covered >= 8, "a span shorter than the gram width")
      assert(frac > 0.0 && frac <= 1.0)
    }
    // every >=8-token truncation variant's text is a substring of its base,
    // so ALL its positions sit in repeated grams: covered_frac == 1.0
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("doc_id") % 7 === 0 && col("n") >= 10)
      .collect().map(_.getLong(0) + 200000L).toSet
    val full = rows.filter(r => docs.contains(r._1)).map(_._4)
    assert(full.length == docs.size,
      s"${docs.size - full.length} truncation variants missing from the span report")
    assert(full.forall(_ == 1.0), "a truncation variant was not fully covered")
  }

  test("dedup_containment: each truncation variant contains in its base at 1.0") {
    val rows = Curation.dedupContainment(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, c) => assert(c >= 0.9 && c <= 1.0) }
    val eligible = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("doc_id") % 7 === 0 && col("n") >= 5)
      .collect().map(_.getLong(0)).toSet
    eligible.foreach { base =>
      val self = rows.find(r => r._1 == base + 200000L && r._2 == base)
      assert(self.exists(_._3 == 1.0),
        s"variant ${base + 200000L} does not contain in base $base at 1.0")
    }
  }

  test("dedup_containment: prefix-filtered join equals the naive quadratic") {
    val c = graft.ops.LlmPipeline.corpus(spark, sf0001)
    val left = c.filter(col("doc_id") >= 200000L)
    val right = c.filter(col("doc_id") < 200000L)
    val fast = graft.api.TextDedup.containmentJoin(
      left, right, "doc_id", "text", 0.9)
    val ls = graft.api.TextDedup.hashedShingleSets(left, "doc_id", "text")
      .select(col("doc_id").as("left_id"), col("sset").as("lset"))
    val rs = graft.api.TextDedup.hashedShingleSets(right, "doc_id", "text")
      .select(col("doc_id").as("right_id"), col("sset").as("rset"))
    val naive = ls.crossJoin(rs)
      .withColumn("cont",
        size(array_intersect(col("lset"), col("rset"))).cast("double") /
          size(col("lset")).cast("double"))
      .filter(col("cont") >= 0.9)
      .select(col("left_id"), col("right_id"), round(col("cont"), 6).as("cont"))
    val a = fast.collect().map(_.toSeq).toSet
    val b = naive.collect().map(_.toSeq).toSet
    assert(a == b, s"prefix filtering changed the result: ${a.size} vs ${b.size} pairs")
  }

  test("text_boilerplate: planted headers cross the df bar; rates bounded") {
    val rows = Curation.textBoilerplate(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSegs, nBoiler, rate) =>
      assert(nSegs > 0 && nBoiler <= nSegs)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // every planted variant contributes at least its header segment
    val nVariants = graft.core.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 5 === 0 &&
        size(split(col("text"), " ")) >= 8).count()
    assert(rows.map(_._3).sum >= nVariants,
      "fewer boilerplate segments than planted headers")
  }

  test("text_zipf: negative slope per language (frequency falls with rank)") {
    val rows = Curation.textZipf(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, slope, intercept) =>
      assert(n >= 2 && n <= 50, s"$lang: $n terms")
      assert(slope < 0.0, s"$lang: non-negative Zipf slope $slope")
      assert(intercept > 0.0, s"$lang: intercept $intercept")
    }
  }

  test("agg_winsorize: mean clipped into [p05, p95]; bounds ordered") {
    val rows = Curation.aggWinsorize(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length == 3)
    rows.foreach { case (st, n, p05, p95, wm) =>
      assert(n > 0)
      assert(p05 <= p95, s"$st: p05 $p05 > p95 $p95")
      assert(wm >= p05 && wm <= p95, s"$st: win_mean $wm outside [$p05, $p95]")
    }
  }

  test("agg_bucketize: equal-population quartile buckets; means ordered") {
    val rows = Curation.aggBucketize(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byStatus = rows.groupBy(_._1)
    byStatus.foreach { case (st, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L),
        s"$st: missing buckets ${bs.map(_._2).toSeq}")
      // equal-population: quartile buckets differ by at most ~2 rows
      // (interpolated boundaries sit between ranks)
      val counts = bs.sortBy(_._2).map(_._3)
      assert(counts.max - counts.min <= math.max(2L, counts.max / 4),
        s"$st: skewed quartiles $counts")
      // bucket means strictly increase with the bucket index
      val means = bs.sortBy(_._2).map(_._4)
      assert(means.zip(means.tail).forall { case (a, b) => a < b },
        s"$st: non-monotone bucket means $means")
    }
  }

  test("events_changepoint: the flagged day maximizes the integer CUSUM") {
    val rows = Curation.eventsChangepoint(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 2, "degenerate series")
      assert(r.getDouble(4) >= 0.0, "negative |CUSUM|")
    }
    // brute-force one type's series and confirm the argmax day
    val daily = graft.core.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .filter(col("event_type") === rows.head.getString(0))
      .orderBy(col("day"))
      .collect().map(r => (r.getDate(1), r.getLong(2)))
    val nd = daily.length.toLong
    val tot = daily.map(_._2).sum
    var prefix = 0L
    val scores = daily.zipWithIndex.map { case ((day, n), i) =>
      prefix += n
      (day, math.abs(nd * prefix - (i + 1).toLong * tot))
    }
    val best = scores.maxBy(s => (s._2, -s._1.getTime))
    assert(rows.head.getDate(1).toString == best._1.toString,
      s"changepoint ${rows.head.getDate(1)} != brute-force ${best._1}")
  }

  test("embed_drift: cohort split is total; distances are small nonnegatives") {
    val rows = Curation.embedDrift(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val totals = graft.core.Tables.embeddings(spark, sf0001)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (label, na, nb, dist) =>
      assert(na + nb == totals(label), s"label $label cohorts do not partition")
      assert(dist >= 0.0, s"label $label negative distance")
      // random halves of the same cluster: centroids stay near each other
      assert(dist < 1.0, s"label $label implausible drift $dist")
    }
  }

  test("text_code_detect: exactly the planted snippets flag; prose is silent") {
    val rows = Curation.textCodeDetect(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val planted = graft.core.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 6 === 0).collect().map(_.getLong(0) + 400000L).toSet
    assert(rows.map(_._1).toSet == planted,
      "flagged set != planted code docs (prose false-positive or a miss)")
    rows.foreach { case (_, dens, kw) =>
      assert(dens > 0.04 && kw >= 4, s"weak code signal dens=$dens kw=$kw")
    }
  }

  test("source_text: the text-sink roundtrip is lossless per source") {
    val audit = graft.ops.Sources.queries("source_text")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = graft.core.Tables.documents(spark, sf0001)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(audit.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq,
      "text readback audit differs from the original table")
  }

  test("sample_temperature: T<1 upweights low-resource langs; caps honored") {
    val kept = Curation.sampleTemperature(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    val perLang = kept.groupBy(_._2).map { case (l, rs) =>
      l -> (rs.length.toLong, rs.map(_._4).head)
    }
    perLang.foreach { case (l, (n, target)) =>
      assert(n <= target, s"$l kept $n above target $target")
    }
    assert(kept.length <= 200, "drew more than the 200-doc slice")
    // temperature property: sampled share vs raw share rises for the
    // smallest language and falls for the largest
    val totals = graft.core.Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTot = totals.values.sum.toDouble
    val nKept = kept.length.toDouble
    val smallest = totals.minBy(_._2)._1
    val largest = totals.maxBy(_._2)._1
    val keptShare = perLang.view.mapValues(_._1 / nKept).toMap
    assert(keptShare(smallest) > totals(smallest) / nTot,
      s"$smallest not upweighted")
    assert(keptShare(largest) < totals(largest) / nTot,
      s"$largest not downweighted")
    // the constant rank cap must plan as WindowGroupLimit (bounded heaps)
    val plan = Curation.sampleTemperature(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank<=200 pre-filter did not plan as WindowGroupLimit")
  }
}
