package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorKernels

/** Kernel-level properties: deterministic embedding spec, norm invariants,
  * tokenizer parity with the reference regex `[a-zA-Z0-9_]+`
  * (memo_cli.py:158-167). */
class VectorKernelsSpec extends AnyFunSuite {

  /** Deterministic pseudo-random ASCII sample corpus for property checks. */
  private val samples: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val printable = (' ' to '~').mkString
    (1 to 200).map { _ =>
      val n = rnd.nextInt(80)
      (0 until n).map(_ => printable(rnd.nextInt(printable.length))).mkString
    }
  }

  private def forAllSamples(f: String => Unit): Unit = samples.foreach(f)

  test("tokenize matches the reference regex semantics") {
    assert(VectorKernels.tokenize("Hello, World_42!").toSeq ==
      Seq("hello", "world_42"))
    assert(VectorKernels.tokenize("  ").isEmpty)
    assert(VectorKernels.tokenize("a-b c").toSeq == Seq("a", "b", "c"))
  }

  test("tokenCount agrees with tokenize length") {
    forAllSamples { s =>
      assert(VectorKernels.tokenCount(UTF8String.fromString(s)) ==
        VectorKernels.tokenize(s).length)
    }
  }

  test("embedding is deterministic and L2-normalized (norm in {0,1})") {
    forAllSamples { s =>
      val v1 = VectorKernels.hashEmbedFloats(s, 384)
      val v2 = VectorKernels.hashEmbedFloats(s, 384)
      assert(v1.toSeq == v2.toSeq)
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      assert(math.abs(norm) < 1e-6 || math.abs(norm - 1.0) < 1e-4)
    }
  }

  test("embedding of blank text is the zero vector") {
    assert(VectorKernels.hashEmbedFloats("", 384).forall(_ == 0.0f))
    assert(VectorKernels.hashEmbedFloats("!!! ???", 384).forall(_ == 0.0f))
  }

  test("identical texts embed to cosine 1; disjoint vocab near-orthogonal") {
    val a = VectorKernels.hashEmbedFloats("spark scan merge join", 384)
    val b = VectorKernels.hashEmbedFloats("spark scan merge join", 384)
    val dotAB = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(dotAB - 1.0) < 1e-6)
  }

  test("simhash is deterministic; close texts have small hamming distance") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "the quick brown fox jumps over the lazy dog again and once"
    val f1 = VectorKernels.simHash64(UTF8String.fromString(t1))
    val f1b = VectorKernels.simHash64(UTF8String.fromString(t1))
    val f2 = VectorKernels.simHash64(UTF8String.fromString(t2))
    assert(f1 == f1b)
    val hamming = java.lang.Long.bitCount(f1 ^ f2)
    assert(hamming <= 16, s"hamming=$hamming")
  }

  test("winnowing fingerprints overlap heavily for near-identical docs") {
    def fp(s: String) = VectorKernels.winnowing(
      UTF8String.fromString(s), 5, 4).toSet
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base + " again"
    val other = "completely different content about spark query engines and parquet files"
    val (a, b, c) = (fp(base), fp(near), fp(other))
    assert(a == fp(base)) // deterministic
    val overlapNear = a.intersect(b).size.toDouble / a.size
    val overlapOther = a.intersect(c).size.toDouble / a.size
    assert(overlapNear > 0.7, s"near overlap $overlapNear")
    assert(overlapOther < 0.2, s"other overlap $overlapOther")
    // whitespace/case canonicalization: same fingerprint
    assert(fp("The  Quick   Brown fox!") == fp("the quick brown fox"))
    assert(fp("").isEmpty)
  }

  test("srp signature is deterministic and sign-sensitive") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def sig(v: Array[Float], bits: Int) = VectorKernels.srpSignature(
      UnsafeArrayData.fromPrimitiveArray(v), true, bits)
    val v = Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    assert(sig(v, 12) == sig(v, 12))
    // negating the vector flips every bucket bit
    val neg = v.map(x => -x)
    assert(sig(v, 12) != sig(neg, 12))
    // scaling doesn't change the bucket (sign-only)
    val scaled = v.map(_ * 7.5f)
    assert(sig(v, 12) == sig(scaled, 12))
  }

  test("minhash signature estimates Jaccard for near-identical texts") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val s1 = VectorKernels.minHashSignature(UTF8String.fromString(base), 128, 3)
    val s2 = VectorKernels.minHashSignature(UTF8String.fromString(nearDup), 128, 3)
    val agree = s1.zip(s2).count { case (a, b) => a == b }
    assert(agree.toDouble / 128 > 0.8, s"agreement=${agree / 128.0}")
    // disjoint texts: near-zero agreement
    val other = (100 to 160).map(i => s"tok$i").mkString(" ")
    val s3 = VectorKernels.minHashSignature(UTF8String.fromString(other), 128, 3)
    val agree13 = s1.zip(s3).count { case (a, b) => a == b }
    assert(agree13.toDouble / 128 < 0.2)
  }
}
