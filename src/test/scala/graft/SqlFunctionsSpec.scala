package graft

import graft.functions.GraftFunctions

/** The SQL registration path: every custom expression callable from
  * spark.sql text with correct results. */
class SqlFunctionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  token_count('Hello, World_42!') AS tc,
        |  size(hash_embed('spark engine')) AS dim,
        |  vec_norm(hash_embed('spark engine')) AS nrm,
        |  vec_dot(hash_embed('same text'), hash_embed('same text')) AS selfdot,
        |  vec_cosine(hash_embed('abc def'), hash_embed('abc def')) AS selfcos,
        |  simhash64('the quick brown fox') AS sh
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) == 2)
    assert(row.getInt(1) == 384)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-6)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-6)
    assert(math.abs(row.getDouble(4) - 1.0) < 1e-6)
    assert(row.getLong(5) != 0L)
  }

  test("SQL and Column APIs produce identical embeddings") {
    GraftFunctions.registerAll(spark)
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val viaSql = docs.selectExpr("doc_id", "hash_embed(text) AS e")
    val viaCol = docs.select(col("doc_id"),
      GraftFunctions.embedText(col("text")).as("e"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }
}
