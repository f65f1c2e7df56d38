package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship recall query: hash-embed a query string, score
  * every document (exact ranking — semantically what the reference does,
  * memo_cli.py:291), take top-10. `queries`/`oracleSql` enumerate the
  * operator inventory from SURVEY.md §2, one entry per operator.
  */
object SparkEntry {

  /** Flagship: semantic recall over documents at sf0.001 (rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    graft.plans.GraftOptimizations.install(spark)
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val q = "fast table scan merge query"
    docs
      .filter(!isBlank(col("text")))
      .withColumn("embedding", embedText(col("text")))
      .withColumn("score",
        round(vecCosine(col("embedding"), embedText(lit(q))), 4))
      .orderBy(desc("score"), col("doc_id"))
      .limit(10)
      .select(col("doc_id").as("id"), col("score"), col("text").as("body"))
  }

  /** One entry per implemented operator from SURVEY.md §2. Every query
    * installs the graft optimizer rules into the caller's session first
    * (idempotent) so the normalized-cosine rewrite fires under the driver
    * harness too. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (RelationalQueries.defs ++ MemoQueries.defs ++ VectorQueries.defs ++
      DedupQueries.defs ++ TextQueries.defs ++ EventQueries.defs ++
      ScaleQueries.defs ++ CurationQueries.defs ++
      LexicalQueries.defs ++ LayoutQueries.defs).map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        graft.plans.GraftOptimizations.install(s)
        fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (hash
    * embeddings, LSH candidates, heuristic lang-id) → rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ MemoQueries.oracles ++ VectorQueries.oracles ++
      DedupQueries.oracles ++ TextQueries.oracles ++ EventQueries.oracles ++
      ScaleQueries.oracles ++ CurationQueries.oracles ++
      LexicalQueries.oracles ++ LayoutQueries.oracles
}
