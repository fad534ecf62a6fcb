package graft

import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Round-13 operator tests: meta_analyze's stats-to-plan contract (the
  * CBO plan flip itself is pinned in PlanSpec; here the VALUE contract —
  * plan-invariance and exact persisted stats) plus the ADVICE r12
  * degenerate-data guards. */
class Round13OpsSpec extends SparkSpecBase {

  test("meta_analyze: persisted rowCount is exact and the readback is plan-invariant") {
    Seq(sf0001, "/root/testdata/sf0.01").foreach { d =>
      val rows = graft.ops.Frontier4.metaAnalyze(spark, d)
        .collect().sortBy(_.getString(0))
      // analyzed_rows = the catalog stat the optimizer consumed — ANALYZE
      // row counts are exact, so it must equal COUNT(*) of the source
      val nOrders = T.orders(spark, d).count()
      assert(rows.forall(_.getLong(3) == nOrders),
        s"$d: analyzed_rows ${rows.map(_.getLong(3)).toSeq.distinct} != " +
          s"source count $nOrders")
      // plan-invariance is THE point of the key: the CBO-planned readback
      // (what metaAnalyze declared) must match the stats-less plan of the
      // identical query row-for-row
      val without = graft.ops.Frontier4.analyzedReadback(spark)
        .orderBy(col("n_name")).collect()
      assert(rows.length == without.length && rows.length >= 3,
        s"$d: ${rows.length} rows with CBO vs ${without.length} without")
      rows.zip(without).foreach { case (a, b) =>
        assert(a.getString(0) == b.getString(0) &&
          a.getLong(1) == b.getLong(1) &&
          a.getDouble(2) == b.getDouble(2),
          s"$d: CBO plan changed the ANSWER: $a vs $b")
      }
      // per-nation counts are a real 3-way join result, not a degenerate
      // slice: every region-1 nation with customers holding orders appears
      assert(rows.map(_.getLong(1)).sum > 0, s"$d: empty join readback")
    }
  }

  test("agg_kruskal / agg_welch / agg_anova: degenerate-data guards inactive on real data (ADVICE r12)") {
    Seq(sf0001, "/root/testdata/sf0.01").foreach { d =>
      // h_adj guards to NULL only when ct=0 (every value in a priority
      // group tied) — on the harness data the correction is active and
      // finite, so no row may be NULL; a NULL here means the guard
      // misfires (or the data degenerated), both worth failing on
      val kw = graft.ops.Frontier3.aggKruskal(spark, d).collect()
      assert(kw.nonEmpty && kw.forall(r => !r.isNullAt(5)),
        s"$d: agg_kruskal h_adj NULL on non-degenerate data")
      assert(kw.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0),
        s"$d: tie correction outside (0,1]")
      // welch: both cohorts have n>1 at every status on harness data
      val w = graft.ops.Frontier3.aggWelch(spark, d).collect()
      assert(w.nonEmpty && w.forall(r => !r.isNullAt(5) && !r.isNullAt(6)),
        s"$d: agg_welch t/df NULL on non-degenerate data")
      assert(w.forall(r => r.getDouble(6) > 1.0),
        s"$d: Welch-Satterthwaite df must exceed 1")
      // anova terms now ride DECIMAL(30,6): SSW must be positive and
      // finite (a silent overflow-to-NULL would zero it out of the sum)
      val a = graft.ops.Frontier3.aggAnova(spark, d).collect()
      assert(a.length == 1 && a(0).getDouble(5) > 0.0,
        s"$d: agg_anova ss_within not positive — overflow NULL?")
    }
  }
}
