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

  test("signature/fingerprint expressions are callable from SQL") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  size(minhash_sig('the quick brown fox jumps over the dog')) AS mh_default,
        |  size(minhash_sig('the quick brown fox jumps over the dog', 64, 3)) AS mh_64,
        |  srp_signature(hash_embed('a document')) AS srp,
        |  srp_signature(hash_embed('a document'), 8) AS srp8,
        |  size(winnow_fingerprint('some longer text to fingerprint here')) AS wf,
        |  size(winnow_fingerprint('some longer text to fingerprint here', 5, 4)) AS wf2,
        |  word_shingles('a b c d') AS ws,
        |  word_shingles('a b c d', 2) AS ws2
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) == 128)
    assert(row.getInt(1) == 64)
    assert(row.getLong(3) < 256L) // 8-bit signature fits a byte
    assert(row.getInt(4) > 0)
    assert(row.getInt(4) == row.getInt(5)) // explicit defaults match
    assert(row.getSeq[String](6) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](7) == Seq("a b", "b c", "c d"))
  }

  test("meta expressions are callable from SQL on typed encodings") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  meta_pystr('i7') AS p,
        |  meta_display('bTrue') AS d,
        |  meta_truthy('i0') AS t0,
        |  meta_truthy('sfalse') AS ts,
        |  meta_num('f2.5') AS n,
        |  meta_num('shello') AS nn,
        |  meta_yaml_scalar('007') AS q,
        |  meta_flow_yaml('i7') AS fy,
        |  body_deleted('deleted: true') AS bd,
        |  body_deleted('plain prose') AS bd2
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "7")
    assert(row.getString(1) == "True")
    assert(!row.getBoolean(2)) // Python bool(0) is False
    assert(row.getBoolean(3)) // non-empty string is truthy
    assert(row.getDouble(4) == 2.5)
    assert(row.isNullAt(5))
    assert(row.getString(6) == "'007'") // int-lookalike gets quoted
    assert(row.getString(7) == "7")
    assert(row.getBoolean(8))
    assert(!row.getBoolean(9))
  }

  test("wrong arity and non-literal tuning args are rejected") {
    GraftFunctions.registerAll(spark)
    val e1 = intercept[Exception](spark.sql("SELECT token_count('a', 'b')").collect())
    assert(e1.getMessage.contains("token_count expects 1"))
    val e2 = intercept[Exception](spark.sql("SELECT minhash_sig('a', 64)").collect())
    assert(e2.getMessage.contains("minhash_sig expects 1 or 3"))
    // a foldable arg (length('xy') → 2) is fine; a non-deterministic one
    // can't be a plan constant and must be rejected
    assert(spark.sql("SELECT size(hash_embed('a', length('xy'))) AS d")
      .collect()(0).getInt(0) == 2)
    val e3 = intercept[Exception](
      spark.sql("SELECT hash_embed('a', cast(rand() * 4 as int))").collect())
    assert(e3.getMessage.contains("dim must be a literal INT"))
    // a NULL literal is foldable but must NOT silently unbox to 0
    val e4 = intercept[Exception](
      spark.sql("SELECT minhash_sig('a', CAST(NULL AS INT), 3)").collect())
    assert(e4.getMessage.contains("num_hashes must be a literal INT"))
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
