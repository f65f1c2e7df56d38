package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): print the formatted physical plan of one or more
  * registered queries without running them.
  *
  * Usage: sbt 'Test/runMain graft.ExplainQuery q45_winnow_pairs [q17_...]'
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one or more query names from SparkEntry.queries")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosFlag, "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      println(s"==== $name ($sfDir) ====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
