package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Occupancy caps for LSH-style bucket self-joins.
  *
  * A hot bucket — a MinHash band hash, SimHash chunk, winnowing fingerprint
  * or SRP signature shared by a huge row population (think boilerplate
  * headers stamped on millions of documents) — makes the within-bucket
  * self-join quadratic in that bucket's size: one 10M-row bucket is 10¹⁴
  * candidate pairs regardless of how well every other bucket behaves.
  * Capping occupancy bounds worst-case join fan-out at cap²/2 per bucket
  * while leaving all cold buckets intact — standard practice for LSH dedup
  * at corpus scale.
  *
  * Recall impact is limited by design: a genuine near-dup pair colocates in
  * MANY buckets (32 bands / 4 chunks / every shared fingerprint), so losing
  * its membership in one capped bucket rarely loses the pair; and the mass
  * inside a hot bucket is dominated by exact/near-exact duplication that
  * the O(n) exact-dedup pass already removes more cheaply.
  */
object BucketCap {

  /** Default per-bucket occupancy cap: bounds any bucket's join fan-out at
    * ~131k pairs — a few ms of verify work — while being far above the
    * occupancy any honest (non-degenerate) bucket reaches. */
  val DefaultCap = 512

  /** Keep at most `capN` rows per bucket, deterministically (smallest `ord`
    * first — reruns and resumed stages keep identical survivors).
    *
    * Cost shape: the row_number window hash-partitions on exactly the keys
    * the caller's subsequent bucket self-join uses, so its exchange output
    * SATISFIES the join's distribution requirement — the join adds no
    * further shuffle of these rows. Net vs an uncapped join: one per-bucket
    * sort bought, two join-side exchanges saved. (The count-then-isolate
    * alternative — aggregate hot keys, anti/semi-join around them — was
    * measured 1.7× slower here: three exchanges of the pre-join rows
    * instead of one.) Dropped mass is observable via [[oversized]] — at
    * cluster scale wire that into job metrics rather than the hot path. */
  /** Caps at or above this are treated as "uncapped": [[cap]] returns the
    * input unchanged instead of paying a per-bucket sort for a limit no
    * bucket reaches (Spark also stops rewriting rn<=N filters into
    * map-side WindowGroupLimit above its group-limit threshold, so a huge
    * cap would otherwise buy a full window sort for nothing). Used by the
    * completeness-exact oracle queries. */
  val Uncapped: Int = 1 << 20

  def cap(df: DataFrame, bucketCols: Seq[String], ord: String,
      capN: Int = DefaultCap): DataFrame = {
    if (capN >= Uncapped) return df
    val w = Window.partitionBy(bucketCols.map(col): _*).orderBy(col(ord))
    df.withColumn("__bc_rn", row_number().over(w))
      .filter(col("__bc_rn") <= capN)
      .drop("__bc_rn")
  }

  /** Dropped-mass report: buckets above `capN` with their occupancy and the
    * row count the cap drops. A narrow aggregation over the bucket keys —
    * run it when tuning caps or auditing a dedup pass. */
  def oversized(df: DataFrame, bucketCols: Seq[String],
      capN: Int = DefaultCap): DataFrame =
    df.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("occupancy"))
      .filter(col("occupancy") > capN)
      .withColumn("dropped", col("occupancy") - capN)
}
