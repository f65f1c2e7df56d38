package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShims

/** Public Column-level API over graft's custom Catalyst expressions, plus
  * composed helpers built from `org.apache.spark.sql.functions` only.
  */
object GraftFunctions {
  private def col2e(c: Column) = GraftShims.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftShims.column(e)

  /** Deterministic signed feature-hash embedding (reference: memo_cli.py:158-167). */
  def embedText(c: Column, dim: Int = VectorKernels.DefaultDim): Column =
    e2col(HashEmbed(col2e(c), dim))

  def tokenCount(c: Column): Column = e2col(TokenCount(col2e(c)))

  def vecDot(a: Column, b: Column): Column = e2col(DotProduct(col2e(a), col2e(b)))

  def vecCosine(a: Column, b: Column): Column =
    e2col(CosineSimilarity(col2e(a), col2e(b)))

  def vecNorm(c: Column): Column = e2col(L2Norm(col2e(c)))

  def vecNormalize(c: Column): Column = e2col(L2Normalize(col2e(c)))

  def simhash64(c: Column): Column = e2col(SimHash(col2e(c)))

  def srpSignature(c: Column, nBits: Int = 16): Column =
    e2col(SrpSignature(col2e(c), nBits))

  def minhashSig(c: Column, numHashes: Int = 128, shingleSize: Int = 3): Column =
    e2col(MinHashSig(col2e(c), numHashes, shingleSize))

  def winnowFingerprint(c: Column, k: Int = 5, w: Int = 4): Column =
    e2col(WinnowFingerprint(col2e(c), k, w))

  /** IVF cell assignment against a driver-trained centroid matrix. */
  def nearestCentroid(c: Column, centroids: Array[Array[Float]]): Column =
    e2col(NearestCentroid(col2e(c), centroids))

  /** Tokens per the embed tokenizer, as pure built-ins (codegen'd). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9_]+"), t => t =!= "")

  /** Whitespace-normalize: collapse runs, trim (memo_cli.py:138-139). */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Blank-body predicate (memo_cli.py:142-143): `\s`-aware — a body of
    * tabs/newlines-only is blank, matching the reference's
    * normalize_whitespace-then-empty check (Spark `trim` strips 0x20 only). */
  def isBlank(c: Column): Column = c.isNull || normalizeWhitespace(c) === ""

  // ---- typed-metadata expressions ([[MetaExpressions]], MetaCodec docs)

  /** Python str() of a typed metadata value. */
  def metaPyStr(c: Column): Column = e2col(MetaPyStr(col2e(c)))

  /** format_cell display of a typed metadata value. */
  def metaDisplay(c: Column): Column = e2col(MetaDisplay(col2e(c)))

  /** YAML flow rendering of a typed metadata value. */
  def metaFlowYaml(c: Column): Column = e2col(MetaFlowYaml(col2e(c)))

  /** YAML scalar quoting of a raw string (flow-map keys). */
  def metaYamlScalar(c: Column): Column = e2col(MetaYamlScalar(col2e(c)))

  /** Python bool() truthiness of a typed metadata value. */
  def metaTruthy(c: Column): Column = e2col(MetaTruthy(col2e(c)))

  /** Double for Python-numeric typed values (int/float/bool), else NULL. */
  def metaNum(c: Column): Column = e2col(MetaNum(col2e(c)))

  /** Body-YAML deleted probe (memo_cli.py:145-154). */
  def bodyDeleted(c: Column): Column = e2col(BodyDeleted(col2e(c)))

  /** Register SQL-callable names for the custom expressions. */
  def registerAll(spark: SparkSession): Unit = {
    GraftShims.registerFunction(spark, "hash_embed",
      es => HashEmbed(es.head, VectorKernels.DefaultDim))
    GraftShims.registerFunction(spark, "token_count", es => TokenCount(es.head))
    GraftShims.registerFunction(spark, "vec_dot", es => DotProduct(es(0), es(1)))
    GraftShims.registerFunction(spark, "vec_cosine",
      es => CosineSimilarity(es(0), es(1)))
    GraftShims.registerFunction(spark, "vec_norm", es => L2Norm(es.head))
    GraftShims.registerFunction(spark, "vec_normalize", es => L2Normalize(es.head))
    GraftShims.registerFunction(spark, "simhash64", es => SimHash(es.head))
  }
}
