package graft.ops

import org.apache.spark.sql.DataFrame

/** One-line stamp files beside persisted artifacts (IVF index, signature
  * table, gram snapshot): an underscore-prefixed file the parquet reader
  * ignores, read/written through the path's Hadoop filesystem so the
  * freshness checks work on HDFS/object stores, not just local disk. */
private[graft] object ArtifactMeta {

  private def locate(df: DataFrame, path: String, name: String) = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    (p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration), p)
  }

  /** First line of the stamp file, if present. */
  def read(df: DataFrame, path: String, name: String): Option[String] = {
    val (fs, p) = locate(df, path, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .nextOption().map(_.trim)
      finally in.close()
    }
  }

  def write(df: DataFrame, path: String, name: String, stamp: String): Unit = {
    val (fs, p) = locate(df, path, name)
    val out = fs.create(p, true)
    try out.write((stamp + "\n").getBytes("UTF-8")) finally out.close()
  }
}
