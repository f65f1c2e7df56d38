package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke leg: run SparkEntry.entry on
  * sf0.001 and show the rows (driver checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosFlag, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"  $r"))
    require(rows.nonEmpty, "entry returned no rows")
    spark.stop()
  }
}
