package graft

import org.apache.spark.sql.functions._

import graft.ops.Lexical

/** Randomized differential for BM25: the artifact-served ranking must
  * match an INDEPENDENT in-memory Scala implementation of the scoring
  * contract (tokenize → tf/df/dl → 4-decimal idf → floor-6 contribution
  * → exact decimal sum → (score desc, id) order) over random corpora and
  * random query bags. One artifact build, many probes — the only part
  * that varies per trial is the probe, so the differential covers the
  * read path at probe cost. */
class LexicalDifferentialSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda_", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  /** Reference scorer — no Spark, no shared code with [[Lexical]]. */
  private def refBm25(docs: Seq[(Long, String)], terms: Seq[String],
      k: Int): Seq[(Long, Double)] = {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq
    val tokd = docs.map { case (id, t) => id -> toks(t) }
    val n = docs.size
    val sumDl = tokd.map(_._2.size.toLong).sum
    val avgDl = sumDl.toDouble / n.toDouble
    val qTerms = terms.distinct
    val dfs: Map[String, Double] = qTerms.map { term =>
      term -> tokd.count(_._2.contains(term)).toDouble
    }.toMap
    tokd.flatMap { case (id, ts) =>
      val dl = ts.size
      val contribs = qTerms.flatMap { term =>
        val tf = ts.count(_ == term)
        if (tf == 0) None
        else {
          val df = dfs(term)
          val idf = math.floor(math.log(1.0 +
            (n.toDouble - df + 0.5) / (df + 0.5)) * 10000.0 + 0.5) / 10000.0
          val c = idf * ((tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgDl))))
          Some(BigDecimal(math.floor(c * 1000000.0 + 0.5) / 1000000.0)
            .setScale(6))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> contribs.sum.toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("artifact-served BM25 matches the reference over random corpora") {
    val rnd = new scala.util.Random(20260813L)
    def randDoc(): String = {
      val len = rnd.nextInt(30) // includes zero-token docs
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (trial <- 0 until 4) {
      val docs = (0L until (40L + rnd.nextInt(40))).map(i => (i, randDoc()))
      val path = {
        val d = java.nio.file.Files.createTempDirectory(s"graft_lexdiff_$trial")
        d.toFile.deleteOnExit()
        d.resolve("idx").toString
      }
      Lexical.writeIndex(docs.toDF("doc_id", "text"), "doc_id", "text", path)
      for (_ <- 0 until 8) {
        // 1-5 terms, occasionally absent from the corpus entirely
        val terms = Seq.fill(1 + rnd.nextInt(5))(
          if (rnd.nextInt(8) == 0) "absentterm"
          else vocab(rnd.nextInt(vocab.size))).distinct
        val k = 1 + rnd.nextInt(25)
        val got = Lexical.searchBm25(spark, path, terms, k)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val want = refBm25(docs, terms, k)
        assert(got.map(_._1) == want.map(_._1),
          s"trial $trial terms=$terms k=$k: ranking ${got.map(_._1)} vs ${want.map(_._1)}")
        got.zip(want).foreach { case ((_, gs), (_, ws)) =>
          assert(math.abs(gs - ws) < 1e-9, s"trial $trial terms=$terms: $gs vs $ws")
        }
      }
    }
  }
}
