package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.ops.{Composite, RelationalOracles}

/** SQL-text front door — the modern analogue of the reference's statement
  * entry point (`/root/reference/db.cpp:428-441`, where every interaction
  * is a parsed statement string).
  *
  * [[registerViews]] publishes the harness tables into the session catalog
  * as temp views; [[queriesSql]] carries runnable `spark.sql` text for the
  * declared queries whose semantics are SQL-expressible; [[sql]] executes
  * one by name. A user porting SQL workloads can run them verbatim —
  * including the engine's native `float_dot` function, which
  * [[GraftExtensions]] registers in the SQL function registry.
  *
  * Dialect note: the relational/TPC-H entries reuse the oracle SQL
  * strings, which are deliberately dual-dialect ANSI (DuckDB for the
  * correctness gate, Spark for this catalog). Entries whose DuckDB oracle
  * uses list functions (`string_split`, `list_slice`, 1-based `p[i]`) get
  * a Spark-dialect equivalent here instead. SqlEntrySpec asserts each
  * entry's SQL result equals the DataFrame path row-for-row.
  */
object SqlCatalog {

  /** Register every harness table under its canonical name. Idempotent;
    * temp views are metadata only (the scans stay pushed-down parquet
    * reads — no materialization). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.All.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Declared-query keys whose DuckDB oracle text is dual-dialect ANSI and
    * runs unchanged under `spark.sql`. */
  private val sharedWithOracle: Seq[String] = Seq(
    "scan_full", "scan_project", "scan_ordered", "key_lookup",
    "insert_append", "filter_pred", "constraint_check",
    "join_inner", "join_broadcast", "join_left", "join_semi", "join_anti",
    "join_range", "join_asof",
    "agg_hash", "agg_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets",
    "window_rank", "window_running", "window_lag",
    "sort_limit_topk", "set_union", "set_intersect", "set_except")

  /** Spark-dialect SQL for keys whose oracle uses DuckDB list functions. */
  private val sparkDialect: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 2), ' ')
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT min(doc_id) AS kept_id, count(*) AS n_copies
        |FROM corpus GROUP BY md5(lower(trim(text)))
        |ORDER BY kept_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(regexp_count(text, '[a-z0-9]+') AS BIGINT) AS re_tokens,
        |  CAST(regexp_count(text, '[a-z0-9]{1,4}') AS BIGINT) AS bpe_ish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lang" ->
      """SELECT doc_id, lang,
        |  CASE WHEN en_score >= 2 THEN 'en' ELSE 'und' END AS predicted,
        |  en_score,
        |  (CASE WHEN en_score >= 2 THEN 'en' ELSE 'und' END) = lang AS agree
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(size(filter(split(text, ' '),
        |      x -> x IN ('the', 'a', 'data', 'value'))) AS BIGINT) AS en_score
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // exercises the engine-registered native float_dot in SQL text
    "sim_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(float_dot(embedding, embedding)) AS norm
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    round(float_dot(p.embedding, c.embedding) / (p.norm * c.norm), 6) AS cos
        |  FROM e p JOIN e c ON p.vec_id < 10 AND c.vec_id <> p.vec_id),
        |ranked AS (
        |  SELECT probe_id, cand_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rnk
        |  FROM scored)
        |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos
        |FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin)

  /** SQL text per declared query key, runnable via [[sql]]. */
  val queriesSql: Map[String, String] =
    sharedWithOracle.map(k => k -> RelationalOracles.sql(k)).toMap ++
      Composite.oracles ++ sparkDialect

  /** Run a declared query from SQL text against the catalog views. */
  def sql(name: String)(spark: SparkSession, sfDir: String): DataFrame = {
    require(queriesSql.contains(name), s"no SQL entry for query: $name")
    registerViews(spark, sfDir)
    spark.sql(queriesSql(name))
  }
}
