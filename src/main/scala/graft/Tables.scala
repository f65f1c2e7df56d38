package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as LongType and convert to a microsecond
      // timestamp — lossless here (the generator emits whole microseconds).
      // A re-materialized copy (ScaleGen) carries ordinary µs timestamps,
      // which the flag leaves untouched — convert only the nanos case.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
