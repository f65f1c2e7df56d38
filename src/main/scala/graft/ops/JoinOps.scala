package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for the shapes AQE alone doesn't give you.
  *
  * - Salted join: explicit skew-spreading when one key dominates (AQE's
  *   skew-join splits oversized partitions at runtime, but salting is the
  *   deterministic pre-plan form and works for aggregations too).
  * - Co-partitioned join: pre-repartition both sides once by the join key so
  *   repeated joins on the same key reuse the exchange (Spark's
  *   ReuseExchange + ENSURE_REQUIREMENTS skip the second shuffle). At rest
  *   this is table bucketing; in-flight it is repartition-then-join.
  */
object JoinOps {

  /** Equi-join with the left (large, possibly skewed) side salted: the
    * small right side is replicated `saltFactor` times so each (key, salt)
    * bucket joins independently. Right side must be broadcast-small OR the
    * replication cost accepted. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("__salt",
      (abs(xxhash64(monotonically_increasing_id())) % saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Repartition both sides by their join keys so the join itself adds no
    * exchange, and later joins on the same keys reuse the partitioning. */
  def coPartitioned(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      partitions: Int): (DataFrame, DataFrame) =
    (left.repartition(partitions, col(leftKey)),
      right.repartition(partitions, col(rightKey)))

  /** At-rest co-location: write a table bucketed (and sorted) on its join
    * key. Two tables bucketed with the SAME bucket count on their join keys
    * join with NO exchange and NO sort on either side — the scan itself
    * reports the hash partitioning/ordering. This is the storage-level form
    * of [[coPartitioned]]: at 100 TB you bucket the fact tables once at
    * ingest and every subsequent key join skips its shuffle. The table is
    * external (data at `path`); `buckets` must match across join partners. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Re-attach an existing [[writeBucketed]] layout to a NEW session's
    * catalog without touching the data — bucketing lives in table METADATA
    * (the files carry only the bucket-suffix naming), so a fresh session
    * must re-declare the bucket spec to get exchange-free joins. This is
    * the at-rest half of the bucket lifecycle: write once at ingest,
    * register per session, join shuffle-free forever. */
  def registerBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, schemaDdl: String, key: String,
      buckets: Int): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table ($schemaDdl) " +
      s"USING PARQUET CLUSTERED BY ($key) SORTED BY ($key) " +
      s"INTO $buckets BUCKETS LOCATION '$path'")

  /** Per-key running count of exchanges in a physical plan (test helper). */
  def countExchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => n += 1
      case _ => ()
    }
    n
  }
}
