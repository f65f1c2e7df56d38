package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-leg data generator: materialize an N× copy of a driver testdata
  * directory so the bench can run at ~sf1 (the driver ships sf0.001/0.01/
  * 0.1 only). Every plan-shape claim in this repo ("would survive 100×")
  * is otherwise verified only at sf0.1 — this is the tool that turns the
  * argument into a measurement (BENCH_NOTES.md records the ratios).
  *
  * Replication contract — the workload must SCALE, not degenerate:
  *
  *  - fact/dim keys: replica k offsets every primary AND foreign key by
  *    k×cardinality, so each replica is a self-consistent star — join
  *    fan-outs and group cardinalities grow linearly, exactly how a
  *    bigger TPC-H sf behaves. region/nation stay fixed (they don't
  *    scale in TPC-H either).
  *  - documents: replica k ≥ 1 suffixes every token with `~k`. A verbatim
  *    copy would plant 10 EXACT near-duplicates of every doc, and the
  *    LSH/SemDeDup pair counts would grow ~quadratically in the copy
  *    count — a synthetic blow-up no real 10× corpus has. Suffixing
  *    drives cross-replica Jaccard to ~0 while preserving doc length,
  *    token counts, and the within-replica duplicate structure, and it
  *    grows the vocabulary with the corpus (what real data does).
  *  - embeddings: replica k ≥ 1 perturbs each component with a bounded
  *    deterministic term (same rationale — exact vector twins ×10 would
  *    turn SemDeDup/ANN into a degenerate duplicate-hunt); labels keep
  *    their cluster structure.
  *  - events: ids/users offset per replica, timestamps verbatim — 10×
  *    density in the same window, which is what a busier system emits;
  *    written as ordinary µs timestamps (Tables handles both layouts).
  *
  * Usage: `runMain graft.ScaleGen <srcDir> <destDir> [factor]`. */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/root/repo/scaledata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosFlag, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dest, factor)
    spark.stop()
  }

  /** Cross-join with the replica index and offset `keys` by k×their
    * table's cardinality. `base` must be the key domain size (keys are
    * dense 0-based in the driver's generator; max+1 would also do). */
  private def replicate(df: DataFrame, factor: Int,
      keys: Map[String, Long]): DataFrame = {
    val reps = df.sparkSession.range(factor).select(col("id").as("__k"))
    val out = df.crossJoin(broadcast(reps))
    keys.foldLeft(out) { case (d, (c, base)) =>
      d.withColumn(c, col(c) + col("__k") * base)
    }
  }

  def generate(spark: SparkSession, src: String, dest: String,
      factor: Int): Unit = {
    def write(df: DataFrame, name: String, files: Int): Unit =
      df.drop("__k").repartition(files)
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")

    // dimension constants: verbatim
    for (t <- Seq("region", "nation"))
      write(Tables(spark, src, t), t, 1)

    // true cardinalities off the source (keys are dense 0-based in the
    // driver's generator) — src may be any sf
    def card(name: String, key: String): Long =
      Tables(spark, src, name).agg(max(col(key))).head().getLong(0) + 1

    val nCust = card("customer", "c_custkey")
    val nSupp = card("supplier", "s_suppkey")
    val nPart = card("part", "p_partkey")
    val nOrd = card("orders", "o_orderkey")

    write(replicate(Tables(spark, src, "customer"), factor,
      Map("c_custkey" -> nCust)), "customer", 4)
    write(replicate(Tables(spark, src, "supplier"), factor,
      Map("s_suppkey" -> nSupp)), "supplier", 1)
    write(replicate(Tables(spark, src, "part"), factor,
      Map("p_partkey" -> nPart)), "part", 4)
    write(replicate(Tables(spark, src, "orders"), factor,
      Map("o_orderkey" -> nOrd, "o_custkey" -> nCust)), "orders", 8)
    write(replicate(Tables(spark, src, "lineitem"), factor,
      Map("l_orderkey" -> nOrd, "l_partkey" -> nPart,
        "l_suppkey" -> nSupp)), "lineitem", 16)

    val nEvent = card("events", "event_id")
    val nUser = Tables(spark, src, "events")
      .agg(max(col("user_id"))).head().getLong(0) + 1
    write(replicate(Tables(spark, src, "events"), factor,
      Map("event_id" -> nEvent, "user_id" -> nUser)), "events", 8)

    val nDoc = card("documents", "doc_id")
    val docs = replicate(Tables(spark, src, "documents"), factor,
      Map("doc_id" -> nDoc))
      .withColumn("text", when(col("__k") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("~"), col("__k"))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 4)

    val nVec = card("embeddings", "vec_id")
    val emb = replicate(Tables(spark, src, "embeddings"), factor,
      Map("vec_id" -> nVec))
      .withColumn("embedding",
        when(col("__k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x + lit(0.08f) * sin((i + lit(1)) * lit(2.3) +
              col("__k") * lit(1.7) + col("vec_id") * lit(0.131))
              .cast("float")).cast("float"))))
    write(emb, "embeddings", 2)

    println(s"[scalegen] wrote ${factor}x of $src to $dest")
  }
}
