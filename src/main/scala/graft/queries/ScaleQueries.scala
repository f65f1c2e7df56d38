package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.memo.MemoOps
import graft.ops.{IvfIndex, Multimodal}

/** Scale-path + remaining-inventory coverage: IVF ANN, multimodal decode
  * plumbing, date-range stats (A10), overwrite merge (M2). */
object ScaleQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** IVF ANN top-20 (rows-only: approximate; recall floor is spec-tested). */
  private val q36IvfAnn: Q = (s, dir) => {
    val emb = Tables(s, dir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    IvfIndex.search(IvfIndex.build(emb, "vec_id", "embedding", centroids),
      centroids, query, k = 20, nprobe = 4)
  }

  /** Multimodal decode + featurize over synthetic binary payloads
    * (rows-only: the stub codec is not SQL-expressible; schema/batch
    * contract is spec-tested). */
  private val q64Multimodal: Q = (s, dir) => {
    val media = Multimodal.syntheticMedia(
      Tables(s, dir, "documents"), "doc_id")
    Multimodal.decodeAndFeaturize(media)
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("mean_intensity"), col("n_sampled_frames"))
      .orderBy(col("media_id"))
  }

  /** Events as memo records with an ISO date metadata key → A10 date-range
    * stats (all values parse → min/max as yyyy-MM-dd). */
  def eventMemoRecords(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      col("event_id").as("id"),
      col("event_type").as("body"),
      map(lit("day"), date_format(col("ts"), "yyyy-MM-dd"),
        lit("etype"), col("event_type")).as("metadata"))

  private val q24StatsDates: Q = (s, dir) =>
    MemoOps.statsDates(eventMemoRecords(s, dir), "{etype: purchase}", "day")

  /** M2 overwrite merge: replace src3 documents' text, keep the rest. */
  private val q74Overwrite: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("body"))
    val replacements = docs.filter(col("id") % 11 === 0)
      .select(col("id"), concat(lit("UPDATED "), col("body")).as("body"))
    MemoOps.overwrite(docs, replacements)
      .select(col("id"), substring(col("body"), 1, 12).as("head"))
      .orderBy(col("id"))
  }

  val defs: Map[String, Q] = Map(
    "q36_ivf_ann" -> q36IvfAnn,
    "q64_multimodal" -> q64Multimodal,
    "q24_stats_dates" -> q24StatsDates,
    "q74_overwrite" -> q74Overwrite,
  )

  val oracles: Map[String, String] = Map(
    "q24_stats_dates" ->
      """SELECT strftime(min(ts), '%Y-%m-%d') AS dmin,
        | strftime(max(ts), '%Y-%m-%d') AS dmax
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q74_overwrite" ->
      """SELECT doc_id AS id,
        | substring(CASE WHEN doc_id % 11 = 0
        |   THEN 'UPDATED ' || text ELSE text END, 1, 12) AS head
        |FROM documents ORDER BY id""".stripMargin,
  )
}
