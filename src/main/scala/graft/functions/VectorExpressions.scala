package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the vector hot path. Each generates a
  * single static call into [[VectorKernels]] from `doGenCode`, so parent
  * operators stay inside whole-stage codegen (no UDF serialization, no
  * interpreter fallback in the per-row loop).
  *
  * Semantics derive from the reference engine (/root/reference/memo_cli.py):
  * embed_text_hash :158-167, normalize :131-135, scoring :288-298.
  */
private[graft] object VectorExprUtil {
  private val K = "graft.functions.VectorKernels"
  def kernels: String = K

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkArray(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$side must be ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
  }
}

/** Signed feature-hash embedding of a text column → ARRAY<FLOAT>(dim). */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hash_embed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_embed expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.hashEmbed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.hashEmbed($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

/** Token ARRAY of `[a-z0-9_]+` runs (the embed tokenizer) — the kernel
  * twin of the `split`-built [[GraftFunctions.tokens]] column: identical
  * output on ASCII corpora (the [[VectorKernels.tokenize]] contract), no
  * regex in the per-row loop, and an invocation counter so specs can pin
  * single-pass plans. */
case class TokensArray(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokens_array expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.tokensArray($c);")

  override protected def withNewChildInternal(newChild: Expression): TokensArray =
    copy(child = newChild)
}

/** Count of `[a-z0-9_]+` tokens in a string (the embed tokenizer). */
case class TokenCount(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_count expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.tokenCount($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Count of distinct `[a-z0-9_]+` tokens (embed tokenizer's set size). */
case class DistinctTokenCount(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "distinct_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_token_count expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.distinctTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.distinctTokenCount($c);")

  override protected def withNewChildInternal(newChild: Expression): DistinctTokenCount =
    copy(child = newChild)
}

/** Count of ASCII letters in a string (alpha-ratio numerator). */
case class LetterCount(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "letter_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"letter_count expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.letterCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.letterCount($c);")

  override protected def withNewChildInternal(newChild: Expression): LetterCount =
    copy(child = newChild)
}

/** Dot product of two float/double vectors, accumulated in double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val lf = VectorExprUtil.isFloatArray(left.dataType)
  private lazy val rf = VectorExprUtil.isFloatArray(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExprUtil.checkArray(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorExprUtil.checkArray(right.dataType, "right")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${VectorExprUtil.kernels}.dot($a, $b, $lf, $rf);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Cosine similarity; 0.0 when either norm is ~0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private lazy val lf = VectorExprUtil.isFloatArray(left.dataType)
  private lazy val rf = VectorExprUtil.isFloatArray(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExprUtil.checkArray(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorExprUtil.checkArray(right.dataType, "right")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${VectorExprUtil.kernels}.cosine($a, $b, $lf, $rf);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Euclidean (L2) norm of a vector. */
case class L2Norm(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.l2Norm(a.asInstanceOf[ArrayData], cf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.l2Norm($a, $cf);")

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** L2-normalize a vector → ARRAY<FLOAT>; zero vector if norm <= 1e-8. */
case class L2Normalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_normalize"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.l2Normalize(a.asInstanceOf[ArrayData], cf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.l2Normalize($a, $cf);")

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of a text column. */
case class SimHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Sign-random-projection LSH bucket (LONG bit-pattern) of a vector. */
case class SrpSignature(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_signature"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.srpSignature(a.asInstanceOf[ArrayData], cf, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.srpSignature($a, $cf, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

/** Winnowing rolling-hash fingerprint (ARRAY<BIGINT>) of a text column. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      VectorKernels.winnowing(input.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(${VectorExprUtil.kernels}.winnowing($c, $k, $w));")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** IVF coarse-quantizer assignment: index of the nearest centroid by
  * squared-L2. The centroid matrix is a plan constant (driver-trained, a few
  * KB) injected into generated code via `addReferenceObj` — the full-corpus
  * assignment pass stays inside whole-stage codegen with no UDF
  * serialization per row. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCentroid(a.asInstanceOf[ArrayData], cf, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.nearestCentroid($a, $cf, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Squared-L2 distance to the nearest centroid (DOUBLE) —
  * [[NearestCentroid]]'s distance twin, for the quantization-error
  * diagnostic ([[graft.ops.IvfIndex.quantizationError]]). */
case class NearestCentroidDist(child: Expression,
    centroids: Array[Array[Float]]) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "nearest_centroid_dist"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCentroidDist(a.asInstanceOf[ArrayData], cf, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.nearestCentroidDist($a, $cf, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDist =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid ids in rank order (ARRAY<INT>) — the
  * per-row probe-cell choice of an IVF search, as one narrow projection:
  * explode it to get (row, cell_id) probe pairs with NO centroid join and
  * NO per-query window/shuffle. Same squared-L2 + smaller-id tie contract
  * as [[NearestCentroid]] (probing 1 cell ≡ the assignment). */
case class NearestCells(child: Expression, centroids: Array[Array[Float]],
    nprobe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (nprobe < 1)
      TypeCheckResult.TypeCheckFailure(s"nprobe must be >= 1, got $nprobe")
    else VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCells(a.asInstanceOf[ArrayData], cf, centroids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.nearestCells($a, $cf, $ref, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Distinct word n-gram shingles (ARRAY<STRING>, space-joined) of a text
  * column — the candidate-key unit for n-gram Jaccard and decontamination.
  * One linear kernel pass per row; replaces a HOF pipeline whose lambda
  * re-evaluated the tokenizer per element. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${VectorExprUtil.kernels}.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** MinHash signature (ARRAY<BIGINT>) over word-shingles of a text column. */
case class MinHashSig(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      VectorKernels.minHashSignature(input.asInstanceOf[UTF8String], numHashes, shingleSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(${VectorExprUtil.kernels}.minHashSignature($c, $numHashes, $shingleSize));")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Product-quantization encode (BINARY, one byte per subspace): per-subspace
  * argmin against a driver-trained codebook riding into generated code as a
  * constant reference object — the full-corpus encode pass stays inside
  * whole-stage codegen, like [[NearestCentroid]]'s assignment. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  private lazy val cf = VectorExprUtil.isFloatArray(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkArray(child.dataType, "input")

  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqEncode(a.asInstanceOf[ArrayData], cf, codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.pqEncode($a, $cf, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** PQ decode (ARRAY<FLOAT>): reconstruct the quantized vector from its
  * codes — each subspace contributes its stored code's centroid. The
  * reconstruction utility (diagnostics, downstream consumers that want a
  * dense vector back); scoring paths use [[PqAdcScore]]/[[PqAdcDot]],
  * which skip materializing the decoded array. */
case class PqDecode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_decode expects BINARY codes, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqDecode(a.asInstanceOf[Array[Byte]], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.pqDecode($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}

/** ADC inner-product score (DOUBLE) of a PQ code column against a query's
  * lookup table (a plan constant — [[graft.ops.PqIndex.adcLut]]). Scoring
  * never touches the raw vector column: the scan underneath reads only
  * (id, code) — the I/O shape that makes PQ serving pay off at 100 TB. */
case class PqAdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects BINARY codes, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqAdc(a.asInstanceOf[Array[Byte]], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ${VectorExprUtil.kernels}.pqAdc($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

/** ADC inner-product score (DOUBLE) of a PQ code column against a query
  * COLUMN — the batch-serving twin of [[PqAdcScore]], for plans where the
  * query is a join-produced column and a per-query LUT can't be a plan
  * constant. Bit-identical arithmetic to the LUT path (per-subspace
  * partials summed in subspace order, [[VectorKernels.pqAdcDot]]), so flat
  * and batch serving round the same way at floor-form boundaries. */
case class PqAdcDot(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  private lazy val rf = VectorExprUtil.isFloatArray(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case BinaryType => VectorExprUtil.checkArray(right.dataType, "query")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dot expects BINARY codes, got ${other.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.pqAdcDot(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[ArrayData], rf, codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${VectorExprUtil.kernels}.pqAdcDot($a, $b, $rf, $ref);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDot =
    copy(left = l, right = r)
}
