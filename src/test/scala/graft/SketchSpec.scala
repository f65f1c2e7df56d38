package graft

import org.apache.spark.sql.functions._

/** HLL sketch accuracy: approx_count_distinct within its configured rsd. */
class SketchSpec extends SparkTestBase {
  test("approx distinct is within 3x rsd of exact") {
    val r = Tables(spark, sfDir, "orders")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()(0)
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"approx=$approx exact=$exact")
  }
}
