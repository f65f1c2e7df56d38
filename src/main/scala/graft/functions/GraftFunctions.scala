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

  def distinctTokenCount(c: Column): Column = e2col(DistinctTokenCount(col2e(c)))

  def letterCount(c: Column): Column = e2col(LetterCount(col2e(c)))

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

  /** Distinct word n-gram shingles of the embed tokenizer's tokens. */
  def wordShingles(c: Column, n: Int = 3): Column =
    e2col(WordShingles(col2e(c), n))

  /** IVF cell assignment against a driver-trained centroid matrix. */
  def nearestCentroid(c: Column, centroids: Array[Array[Float]]): Column =
    e2col(NearestCentroid(col2e(c), centroids))

  /** Squared-L2 distance to the nearest centroid (quantization error). */
  def nearestCentroidDist(c: Column, centroids: Array[Array[Float]]): Column =
    e2col(NearestCentroidDist(col2e(c), centroids))

  def nearestCells(c: Column, centroids: Array[Array[Float]],
      nprobe: Int): Column = e2col(NearestCells(col2e(c), centroids, nprobe))

  /** Product-quantization encode against a driver-trained codebook. */
  def pqEncode(c: Column, codebooks: Array[Array[Array[Float]]]): Column =
    e2col(PqEncode(col2e(c), codebooks))

  /** ADC inner-product score of a PQ code column against a query LUT. */
  def pqAdcScore(c: Column, lut: Array[Array[Double]]): Column =
    e2col(PqAdcScore(col2e(c), lut))

  /** Reconstruct the quantized vector from a PQ code column. */
  def pqDecode(c: Column, codebooks: Array[Array[Array[Float]]]): Column =
    e2col(PqDecode(col2e(c), codebooks))

  /** ADC score of a PQ code column against a query COLUMN (batch serving) —
    * bit-identical to the [[pqAdcScore]] LUT path. */
  def pqAdcDot(codes: Column, query: Column,
      codebooks: Array[Array[Array[Float]]]): Column =
    e2col(PqAdcDot(col2e(codes), col2e(query), codebooks))

  /** Round to 2 decimals in floor form — `floor(x*100 + 0.5)/100` — the
    * cross-engine-exact rounding for oracle-compared money values:
    * `round(x, 2)` pits Spark's shortest-repr HALF_UP against DuckDB's
    * binary multiply-round, which disagree for doubles one ULP off a .xx5
    * boundary; the floor form is the same IEEE op sequence in both engines
    * (the matching DuckDB SQL is `floor(x*100.0 + 0.5)/100.0`). */
  def round2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0

  /** 4-decimal sibling of [[round2]], for oracle-compared RATIONAL values
    * (jaccard fractions, token ratios, averages of ints) — exact fractions
    * like 3/32 land precisely on a .xxxx5 boundary, where `round(x, 4)`
    * diverges between engines (DuckDB SQL: `floor(x*10000.0+0.5)/10000.0`). */
  def round4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Tokens per the embed tokenizer, as pure built-ins (codegen'd). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9_]+"), t => t =!= "")

  /** Kernel twin of [[tokens]] (regex-free, invocation-counted — lets a
    * spec pin "one tokenize pass"; identical output on ASCII text). */
  def tokensKernel(c: Column): Column = e2col(TokensArray(col2e(c)))

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

  /** Register SQL-callable names for ALL custom expressions, with arity
    * checks and literal-int tuning parameters where the Column API takes
    * them (`minhash_sig(text [, num_hashes, shingle_size])` etc.). */
  def registerAll(spark: SparkSession): Unit = {
    type E = org.apache.spark.sql.catalyst.expressions.Expression

    def intLit(name: String, arg: String, e: E): Int = e match {
      case l if l.foldable &&
          l.dataType == org.apache.spark.sql.types.IntegerType =>
        l.eval() match {
          case i: java.lang.Integer => i.intValue()
          case _ => throw new IllegalArgumentException( // NULL literal
            s"$name: $arg must be a literal INT")
        }
      case _ => throw new IllegalArgumentException(
        s"$name: $arg must be a literal INT")
    }
    def badArity(name: String, want: String, got: Int): Nothing =
      throw new IllegalArgumentException(
        s"$name expects $want argument(s), got $got")
    def reg(name: String, want: String)(b: PartialFunction[Seq[E], E]): Unit =
      GraftShims.registerFunction(spark, name,
        es => b.applyOrElse(es,
          (bad: Seq[E]) => badArity(name, want, bad.length)))

    reg("hash_embed", "1 or 2") {
      case Seq(t) => HashEmbed(t, VectorKernels.DefaultDim)
      case Seq(t, d) => HashEmbed(t, intLit("hash_embed", "dim", d))
    }
    reg("token_count", "1") { case Seq(t) => TokenCount(t) }
    reg("tokens_array", "1") { case Seq(t) => TokensArray(t) }
    reg("distinct_token_count", "1") { case Seq(t) => DistinctTokenCount(t) }
    reg("letter_count", "1") { case Seq(t) => LetterCount(t) }
    reg("vec_dot", "2") { case Seq(a, b) => DotProduct(a, b) }
    reg("vec_cosine", "2") { case Seq(a, b) => CosineSimilarity(a, b) }
    reg("vec_norm", "1") { case Seq(a) => L2Norm(a) }
    reg("vec_normalize", "1") { case Seq(a) => L2Normalize(a) }
    reg("simhash64", "1") { case Seq(t) => SimHash(t) }
    reg("srp_signature", "1 or 2") {
      case Seq(a) => SrpSignature(a, 16)
      case Seq(a, n) => SrpSignature(a, intLit("srp_signature", "n_bits", n))
    }
    reg("minhash_sig", "1 or 3") {
      case Seq(t) => MinHashSig(t, 128, 3)
      case Seq(t, n, s) => MinHashSig(t,
        intLit("minhash_sig", "num_hashes", n),
        intLit("minhash_sig", "shingle_size", s))
    }
    reg("winnow_fingerprint", "1 or 3") {
      case Seq(t) => WinnowFingerprint(t, 5, 4)
      case Seq(t, k, w) => WinnowFingerprint(t,
        intLit("winnow_fingerprint", "k", k),
        intLit("winnow_fingerprint", "w", w))
    }
    reg("word_shingles", "1 or 2") {
      case Seq(t) => WordShingles(t, 3)
      case Seq(t, n) => WordShingles(t, intLit("word_shingles", "n", n))
    }
    reg("meta_pystr", "1") { case Seq(v) => MetaPyStr(v) }
    reg("meta_display", "1") { case Seq(v) => MetaDisplay(v) }
    reg("meta_flow_yaml", "1") { case Seq(v) => MetaFlowYaml(v) }
    reg("meta_yaml_scalar", "1") { case Seq(v) => MetaYamlScalar(v) }
    reg("meta_truthy", "1") { case Seq(v) => MetaTruthy(v) }
    reg("meta_num", "1") { case Seq(v) => MetaNum(v) }
    reg("body_deleted", "1") { case Seq(v) => BodyDeleted(v) }
  }
}
