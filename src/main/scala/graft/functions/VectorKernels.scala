package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop JVM kernels shared by interpreted eval AND generated code.
  *
  * The custom Catalyst expressions in [[VectorExpressions]] emit a single
  * static call to these from `doGenCode`, which keeps the surrounding
  * operators inside whole-stage codegen while the inner loop stays a
  * monomorphic, JIT-friendly scalar loop.
  *
  * Embedding spec (deterministic replacement for the reference's
  * process-seeded `hash()` — see /root/reference/memo_cli.py:158-167 and
  * SURVEY.md §1.4):
  *   - lowercase, tokenize on `[a-z0-9_]+` runs
  *   - h = MurmurHash3.stringHash(token, seed=42)  (stable across JVMs)
  *   - bucket = floorMod(h, dim); sign = +1 if bit 24 of h is 0 else -1
  *   - sum signed counts per bucket, then L2-normalize (zero vector if
  *     norm <= 1e-8, matching memo_cli.py:131-135)
  */
object VectorKernels {
  final val DefaultDim = 384
  final val HashSeed = 42

  /** Split lowercased text into `[a-z0-9_]+` tokens without regex.
    *
    * ASCII contract (shared by every kernel built on this tokenizer —
    * counts, embeds, minhash, shingles): only `A-Z` is lowercased and only
    * ASCII `[a-z0-9_]` continues a token. Exotic codepoints whose Unicode
    * lowercase IS ASCII (e.g. U+212A KELVIN SIGN → 'k') act as separators
    * here but not under engine `lower()`s — identical to how the SQL-side
    * `tokens()` regex and the DuckDB oracles behave on ASCII corpora, and
    * divergent off it. Non-Latin text tokenizes to the gaps BETWEEN
    * non-ASCII runs on every path alike. */
  def tokenize(text: String): Array[String] = {
    val s = text
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = s.length
    while (i < n) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      if (isTok) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Tokenize invocations in THIS JVM — the [[minhashCalls]] idiom: lets a
    * spec pin "one tokenize pass over the corpus" (q92's sketch feeds off
    * the aggregated counts, never a second token scan). Counts calls to
    * [[tokensArray]] only (the kernel array tokenizer), not the SQL
    * `split`-based [[graft.functions.GraftFunctions.tokens]]. */
  val tokenizeCalls = new java.util.concurrent.atomic.AtomicLong(0)

  /** Token ARRAY per [[tokenize]] — the regex-free kernel twin of the
    * built-in `tokens()` column (identical output on ASCII corpora; see
    * the ASCII contract above). */
  def tokensArray(text: UTF8String): ArrayData = {
    tokenizeCalls.incrementAndGet()
    if (text == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val toks = tokenize(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def tokenCount(text: UTF8String): Int = {
    if (text == null) return 0
    val s = text.toString
    var count = 0
    var inTok = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      if (isTok && !inTok) { count += 1; inTok = true }
      else if (!isTok) inTok = false
      i += 1
    }
    count
  }

  /** Embed invocations in THIS JVM — a test hook for pinning the write
    * path's incremental behavior (a 1-row save must not re-embed the
    * corpus). Single atomic add per call; negligible next to the
    * tokenize/hash work it counts. Only meaningful in local mode. */
  val embedCalls = new java.util.concurrent.atomic.AtomicLong(0)

  /** Signed feature-hash embedding; output length = dim, L2-normalized. */
  def hashEmbedFloats(text: String, dim: Int): Array[Float] = {
    embedCalls.incrementAndGet()
    val v = new Array[Float](dim)
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      val h = scala.util.hashing.MurmurHash3.stringHash(toks(i), HashSeed)
      val bucket = java.lang.Math.floorMod(h, dim)
      val sign = if (((h >>> 24) & 1) == 0) 1.0f else -1.0f
      v(bucket) += sign
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < dim) { ss += v(i).toDouble * v(i).toDouble; i += 1 }
    val norm = math.sqrt(ss)
    if (norm > 1e-8) {
      i = 0
      while (i < dim) { v(i) = (v(i) / norm).toFloat; i += 1 }
    } else {
      java.util.Arrays.fill(v, 0.0f)
    }
    v
  }

  def hashEmbed(text: UTF8String, dim: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(hashEmbedFloats(text.toString, dim))

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Dot product over float/double arrays; accumulates in double. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(a, i, aFloat) * get(b, i, bFloat); i += 1 }
    s
  }

  def l2Norm(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = get(a, i, aFloat); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** L2-normalize; zero vector when norm <= 1e-8 (memo_cli.py:131-135). */
  def l2Normalize(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = get(a, i, aFloat); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    if (norm > 1e-8) {
      i = 0
      while (i < n) { out(i) = (get(a, i, aFloat) / norm).toFloat; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Count of DISTINCT `[a-z0-9_]+` tokens (the embed tokenizer's token
    * set size) — one pass, no array materialization. */
  def distinctTokenCount(text: UTF8String): Int = {
    if (text == null) return 0
    val toks = tokenize(text.toString)
    val seen = new java.util.HashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    seen.size
  }

  /** Count of ASCII letters — the alpha-ratio numerator without building
    * a stripped copy of the string per row. */
  def letterCount(text: UTF8String): Int = {
    if (text == null) return 0
    val s = text.toString
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) n += 1
      i += 1
    }
    n
  }

  /** Index of the nearest centroid (squared-L2) — the IVF coarse-quantizer
    * assignment, shaped for codegen (the centroid matrix arrives as a
    * constant reference object, the vector as columnar ArrayData). */
  def nearestCentroid(a: ArrayData, aFloat: Boolean,
      centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      val n = math.min(ctr.length, a.numElements())
      var d = 0.0
      var i = 0
      while (i < n) { val t = get(a, i, aFloat) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Squared-L2 distance to the nearest centroid — [[nearestCentroid]]'s
    * distance twin (same loop, returns bestD): the per-row term of the
    * quantization-error diagnostic. */
  def nearestCentroidDist(a: ArrayData, aFloat: Boolean,
      centroids: Array[Array[Float]]): Double = {
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      val n = math.min(ctr.length, a.numElements())
      var d = 0.0
      var i = 0
      while (i < n) { val t = get(a, i, aFloat) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }

  /** The `nprobe` nearest centroids by squared-L2, in rank order (ties →
    * smaller cell id) — the per-row probe-cell choice of a batch IVF
    * search. Same distance arithmetic as [[nearestCentroid]]; a partial
    * selection over nlist distances (nlist is small by construction). */
  def nearestCells(a: ArrayData, aFloat: Boolean,
      centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val nlist = centroids.length
    val d = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val ctr = centroids(c)
      val n = math.min(ctr.length, a.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { val t = get(a, i, aFloat) - ctr(i); s += t * t; i += 1 }
      d(c) = s
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Any](k)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < k) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < nlist) {
        if (!taken(c) && d(c) < bestD) { bestD = d(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val na = l2Norm(a, aFloat)
    val nb = l2Norm(b, bFloat)
    if (na <= 1e-12 || nb <= 1e-12) 0.0
    else dot(a, b, aFloat, bFloat) / (na * nb)
  }

  /** SimHash over token murmur hashes → 64-bit fingerprint. */
  def simHash64(text: UTF8String): Long = {
    if (text == null) return 0L
    val toks = tokenize(text.toString)
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h32a = scala.util.hashing.MurmurHash3.stringHash(toks(i), HashSeed)
      val h32b = scala.util.hashing.MurmurHash3.stringHash(toks(i), 1337)
      val h = (h32a.toLong << 32) | (h32b.toLong & 0xffffffffL)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) fp |= (1L << bit); bit += 1 }
    fp
  }

  /** Sign-random-projection LSH bucket: bit b of the result is
    * sign(v · plane_b) where plane_b(i) = ±1 from murmur(productHash((b,i))).
    * Semantics identical to the Column-expression formulation it replaces
    * (deterministic, data-independent hyperplanes). */
  private val srpPlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  /** ±1 hyperplane signs, row-major [b*dim + i], memoized per (nBits, dim). */
  private def srpPlanes(nBits: Int, dim: Int): Array[Byte] =
    srpPlaneCache.computeIfAbsent((nBits, dim), { case (nb, d) =>
      val out = new Array[Byte](nb * d)
      var b = 0
      while (b < nb) {
        var i = 0
        while (i < d) {
          val h = scala.util.hashing.MurmurHash3.productHash((b, i))
          out(b * d + i) = if ((h & 1) == 0) 1 else -1
          i += 1
        }
        b += 1
      }
      out
    })

  def srpSignature(v: ArrayData, vFloat: Boolean, nBits: Int): Long = {
    val dim = v.numElements()
    val planes = srpPlanes(nBits, dim)
    var sigAcc = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += get(v, i, vFloat) * planes(b * dim + i)
        i += 1
      }
      if (dot >= 0) sigAcc |= (1L << b)
      b += 1
    }
    sigAcc
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003 — public
    * algorithm): rolling Rabin-Karp hashes over character k-grams of the
    * canonical text, then the minimum hash of each w-hash window (rightmost
    * tie-break). Returns the sorted distinct selected hashes — guarantees
    * any match of length >= w+k-1 shares a fingerprint. */
  def winnowing(text: UTF8String, k: Int, w: Int): Array[Long] = {
    if (text == null) return Array.empty
    val s = {
      val toks = tokenize(text.toString)
      if (toks.isEmpty) return Array.empty
      toks.mkString(" ")
    }
    val n = s.length
    if (n < k) return Array.empty
    val B = 257L
    val M = 0x7fffffffL // Mersenne-ish modulus keeps hashes positive
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = (pow * B) % M; i += 1 }
    val nHashes = n - k + 1
    val hashes = new Array[Long](nHashes)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + s.charAt(i)) % M; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nHashes) {
      h = ((h - (s.charAt(i - 1) * pow) % M + M * 257) % M * B +
        s.charAt(i + k - 1)) % M
      hashes(i) = h
      i += 1
    }
    if (nHashes <= w) return Array(hashes.min)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= nHashes) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      selected.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** MinHash signature over token n-gram shingles (word shingles).
    *
    * Each token is murmur-hashed ONCE; a shingle's two base hashes mix the
    * member token hashes (two independent mix streams) instead of building
    * and re-hashing a shingle string — ~2.5× faster on the per-row scan
    * stage with the same estimator quality (still a seeded double-hashing
    * family, k-th hash = a·(2k+1) + b·(k+1) + k).
    *
    * ESTIMATOR CAVEAT (the standard Kirsch–Mitzenmacher tradeoff): the
    * k-th hash is LINEAR in k, so for a fixed pair of shingles the
    * ordering g_k(x) < g_k(y) flips at most once across the whole k
    * range — per-k agreements are rank-correlated, not independent. For
    * real documents (tens of shingles) the estimate is fine, but for
    * TINY shingle sets a single SHARED shingle whose (a, b) slope
    * happens to be the smallest in both sets dominates the min for most
    * k and inflates est_jaccard toward 1.0 (measured: 6-shingle docs
    * sharing ONE shingle — true J = 1/11 — estimated ≥ 0.95 for ~5% of
    * pairs). Verification-stage consumers that need exactness on short
    * texts should use [[ngramJaccard]] (exact) instead; fixtures that
    * mint disjoint near-dup clusters must keep the clusters
    * shingle-disjoint (see q119). */
  /** MinHash invocations in THIS JVM — the [[embedCalls]] twin for pinning
    * that artifact-backed dedup never recomputes corpus signatures. */
  val minhashCalls = new java.util.concurrent.atomic.AtomicLong(0)

  def minHashSignature(text: UTF8String, numHashes: Int, shingleSize: Int): Array[Long] = {
    minhashCalls.incrementAndGet()
    val sig = Array.fill[Long](numHashes)(Long.MaxValue)
    if (text == null) return sig
    val toks = tokenize(text.toString)
    if (toks.length < shingleSize) return sig
    val th = new Array[Int](toks.length)
    var t = 0
    while (t < toks.length) {
      th(t) = scala.util.hashing.MurmurHash3.stringHash(toks(t), HashSeed)
      t += 1
    }
    var i = 0
    while (i <= toks.length - shingleSize) {
      var b1 = HashSeed
      var b2 = 7919
      var j = 0
      while (j < shingleSize) {
        val h = th(i + j)
        b1 = scala.util.hashing.MurmurHash3.mix(b1, h)
        b2 = scala.util.hashing.MurmurHash3.mix(b2, h * 0x85ebca6b)
        j += 1
      }
      val base = scala.util.hashing.MurmurHash3.finalizeHash(b1, shingleSize)
      val base2 = scala.util.hashing.MurmurHash3.finalizeHash(b2, shingleSize)
      var k = 0
      while (k < numHashes) {
        // (a*x + b*y + k) style double hashing — deterministic family
        val hk = (base.toLong * (2L * k + 1) + base2.toLong * (k + 1) + k) & 0x7fffffffffffffffL
        if (hk < sig(k)) sig(k) = hk
        k += 1
      }
      i += 1
    }
    sig
  }

  /** Distinct word n-gram shingles (space-joined, first-occurrence order) —
    * the kernel twin of the HOF pipeline
    * `array_distinct(transform(tokens, slice+concat_ws))`. The HOF form
    * re-evaluates `size(tokens(text))` inside the per-element lambda
    * (quadratic in token count) and bloats whole-stage codegen; this is one
    * linear pass. Set-equality with the HOF form is spec-asserted. */
  /** Shingle invocations in THIS JVM — pins that snapshot-backed
    * decontamination sweeps never re-shingle the train corpus. */
  val shingleCalls = new java.util.concurrent.atomic.AtomicLong(0)

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    shingleCalls.incrementAndGet()
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    if (text == null) return empty
    val toks = tokenize(text.toString)
    val m = toks.length - n + 1
    if (m <= 0) return empty
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Product-quantization encode: per-subspace argmin (squared-L2 in
    * double, subspace dims ascending, ties → smaller code) against a
    * driver-trained codebook `[subspace][code][subdim]`. One byte per
    * subspace (ksub <= 256 by construction). Same distance/tie contract as
    * [[nearestCentroid]], so a one-subspace codebook degenerates to it. */
  def pqEncode(a: ArrayData, aFloat: Boolean,
      codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val sub = cb(0).length
      val n = math.min(sub, math.max(0, a.numElements() - off))
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val ctr = cb(c)
        var d = 0.0
        var i = 0
        while (i < n) { val t = get(a, off + i, aFloat) - ctr(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      off += sub
      j += 1
    }
    out
  }

  /** PQ decode: reconstruct the quantized vector (each subspace's centroid
    * for the stored code) — the reconstruction utility; scoring goes
    * through [[pqAdc]]/[[pqAdcDot]], which never materialize the decoded
    * array. */
  def pqDecode(codes: Array[Byte],
      codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = math.min(codes.length, codebooks.length)
    var dim = 0
    var j = 0
    while (j < m) { dim += codebooks(j)(0).length; j += 1 }
    val out = new Array[Float](dim)
    var off = 0
    j = 0
    while (j < m) {
      val ctr = codebooks(j)(codes(j) & 0xff)
      System.arraycopy(ctr, 0, out, off, ctr.length)
      off += ctr.length
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC (asymmetric distance computation) inner-product score:
    * Σ_j lut(j)(code_j), accumulated in double in subspace order. The LUT
    * is the query's per-subspace dot products against every code centroid
    * ([[graft.ops.PqIndex.adcLut]]) — a plan constant, so scoring a row is
    * m table lookups + adds: no decode, no touching the raw vector. */
  def pqAdc(codes: Array[Byte], lut: Array[Array[Double]]): Double = {
    var s = 0.0
    val m = math.min(codes.length, lut.length)
    var j = 0
    while (j < m) { s += lut(j)(codes(j) & 0xff); j += 1 }
    s
  }

  /** ADC score straight from codes + a query COLUMN — the batch-serving
    * path, where per-query LUTs can't be plan constants. Arithmetic is
    * bit-identical to [[pqAdc]] over [[graft.ops.PqIndex.adcLut]]: each
    * subspace's partial is accumulated in double with subdims ascending,
    * then partials are summed in subspace order. A sequential full-dim dot
    * over the decoded vector groups the additions differently and can
    * round the other way at a floor-form boundary — this kernel exists so
    * the flat and batch paths (and their oracle replays) agree exactly. */
  def pqAdcDot(codes: Array[Byte], q: ArrayData, qFloat: Boolean,
      codebooks: Array[Array[Array[Float]]]): Double = {
    var total = 0.0
    var off = 0
    val m = math.min(codes.length, codebooks.length)
    var j = 0
    while (j < m) {
      val ctr = codebooks(j)(codes(j) & 0xff)
      val n = math.min(ctr.length, math.max(0, q.numElements() - off))
      var s = 0.0
      var i = 0
      while (i < n) { s += get(q, off + i, qFloat) * ctr(i); i += 1 }
      total += s
      off += ctr.length
      j += 1
    }
    total
  }
}
