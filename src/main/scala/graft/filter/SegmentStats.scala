package graft.filter

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{metaNum, metaPyStr}
import graft.memo.MetaCodec

/** Per-key metadata statistics of ONE records segment, the basis of
  * segment-level data skipping for the filter algebra (the zone-map /
  * file-stats idea Delta and parquet row groups use, lifted to the
  * TYPED metadata domain of memo_cli.py:179-241).
  *
  * Every bound is computed with the SAME value views the compiled
  * predicate evaluates — [[graft.functions.GraftFunctions.metaPyStr]]
  * (Python str() coercion), [[graft.functions.GraftFunctions.metaNum]]
  * (numeric iff Python-number-typed), and the raw typed string's
  * 's'-prefix (exactly [[FilterAlgebra]]'s `$prefix` test) — so a
  * range test here prunes against precisely the ordering the predicate
  * would apply. String bounds compare by CODE POINT on the driver
  * (UTF-8 byte order, what Spark's UTF8String min/max produced);
  * Java's UTF-16 `compareTo` would mis-order supplementary characters
  * against U+E000..U+FFFF and break soundness.
  *
  *  - `n` rows carrying the key; a key absent from a complete key set
  *    can never satisfy ANY operator (missing key → false, P10)
  *  - `nList` list-typed values: bare equality and `$contains` match
  *    list ELEMENTS, which these stats do not range-index — any list
  *    presence disables value-range pruning for those operators
  *    (presence pruning still applies), and `nList == 0` alone prunes
  *    `$contains` (lists only, P6)
  *  - `nNum`/`numMin`/`numMax` over Python-number-typed values
  *    (int/float/bool) — the numeric side of `$gte`/`$lte` with a
  *    numeric operand (P3)
  *  - `nnsMin`/`nnsMax` — str() bounds of the NON-numeric values, the
  *    lexicographic side the same operators fall back to (P4)
  *  - `pysMin`/`pysMax` — str() bounds over ALL values, for bare
  *    equality and for string-operand compares
  *  - `nStr`/`strMin`/`strMax` — bounds of the payloads of
  *    string-TYPED scalars (raw value starts with 's', the exact
  *    isinstance(value, str) class `$prefix` accepts, P5)
  *  - `vals`/`elems` — EXACT capped dictionaries: the distinct str()
  *    renderings of the scalar values, and of the well-formed list
  *    values' ELEMENTS (the unit bare equality and `$contains` compare
  *    against, P1/P6). `Some(set)` means the set is complete for the
  *    segment, so equality prunes by membership even when value RANGES
  *    overlap across segments — the low-cardinality-dictionary case
  *    (tags, langs, sources) where min/max alone prunes nothing; `None`
  *    means the key's cardinality overflowed the cap — fall back to
  *    the range tests. A malformed list payload contributes no
  *    elements, which is exact: the compiled predicate can never match
  *    through it either.
  */
final case class KeyStats(
    n: Long, nList: Long, nNum: Long, nStr: Long,
    pysMin: String, pysMax: String,
    numMin: Option[Double], numMax: Option[Double],
    nnsMin: Option[String], nnsMax: Option[String],
    strMin: Option[String], strMax: Option[String],
    vals: Option[Set[String]] = None,
    elems: Option[Set[String]] = None)

/** Stats sidecar of one segment: row count, rows with non-empty
  * metadata (the P11 gate — a segment with none can never match any
  * filter), and per-key stats. `keysComplete = false` means the
  * segment had more distinct keys than the cap, so a key MISSING from
  * `keys` is unknown rather than provably absent — but stats for the
  * keys that ARE recorded remain exact (the aggregation saw every
  * row). */
final case class SegmentStats(rows: Long, nMeta: Long,
    keysComplete: Boolean, keys: Map[String, KeyStats])

object SegmentStats {

  /** Key-set cap DEFAULT. Metadata domains are small in practice; a
    * segment whose rows fan out past this many distinct keys keeps the
    * largest keys' stats and marks the set incomplete rather than
    * growing the sidecar without bound. [[compute]] takes the effective
    * cap per call (an engine option — `statsMaxKeys`); the DECODE side
    * is cap-agnostic, so segments written under different caps coexist
    * soundly in one chain (a smaller cap only drops dictionaries/keys,
    * both of which read as "can't prove — keep the segment"). */
  val MaxKeys = 64

  /** Per-key dictionary cap DEFAULT: up to this many distinct str()
    * renderings are recorded exactly (scalars and list elements
    * separately); past it the dictionary is dropped and the key falls
    * back to range pruning — which is also the right tool for the
    * high-cardinality keys that overflow it. Per-call like [[MaxKeys]]
    * (engine option `statsMaxVals`). */
  val MaxVals = 64

  // ------------------------------------------------------------- ordering

  /** Code-point comparison — identical to UTF-8 byte order, which is
    * what Spark's UTF8String comparisons (and therefore the min/max
    * bounds aggregated below AND the compiled predicate's string
    * compares) use. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
  private def cpLe(a: String, b: String): Boolean = cpCompare(a, b) <= 0
  private def cpGe(a: String, b: String): Boolean = cpCompare(a, b) >= 0

  /** The exclusive upper bound of the prefix interval: every string
    * with prefix `p` lies in [p, successor). Drops trailing maximal
    * code points then bumps the last one; None when no finite bound
    * exists (p empty or all-maximal — every tail is unbounded). */
  def prefixSuccessor(p: String): Option[String] = {
    val cps = p.codePoints().toArray
    var end = cps.length
    while (end > 0 && cps(end - 1) == Character.MAX_CODE_POINT) end -= 1
    if (end == 0) None
    else {
      val bumped = cps.take(end)
      bumped(end - 1) += 1
      Some(new String(bumped, 0, end))
    }
  }

  // -------------------------------------------------------------- compute

  /** One small aggregation pair over a just-written segment: the
    * header counts (+ the id range, so the caller can write both
    * sidecars from one read) and the per-key stats. Cost is
    * O(segment), column-pruned to (id, metadata) — the same class as
    * the `_idrange` scan it rides along with. The frame is CACHED for
    * the duration: the header, key-stats, and two dictionary passes
    * are four driver actions, and on the streaming-ingest path (one
    * compute per micro-batch commit) re-scanning the just-written
    * parquet four times was measurable — the r14 pairs leg
    * (BENCH_NOTES) priced the whole sidecar at ~14% of s94 before
    * this. */
  def compute(dfIn: DataFrame, maxKeys: Int = MaxKeys,
      maxVals: Int = MaxVals): (Option[(Long, Long)], SegmentStats) = {
    require(maxKeys >= 1 && maxVals >= 1,
      s"stats caps must be >= 1, got (maxKeys=$maxKeys, maxVals=$maxVals)")
    val df = dfIn.cache()
    try computeCached(df, maxKeys, maxVals) finally df.unpersist()
  }

  private def computeCached(df: DataFrame, maxKeys: Int, maxVals: Int)
      : (Option[(Long, Long)], SegmentStats) = {
    val header = df.agg(
      count(lit(1)), count(when(size(col("metadata")) > 0, 1)),
      min(col("id")), max(col("id"))).collect()(0)
    val rows = header.getLong(0)
    val nMeta = header.getLong(1)
    val idRange =
      if (header.isNullAt(2)) None
      else Some((header.getLong(2), header.getLong(3)))
    val kv = df.select(explode(col("metadata")).as(Seq("k", "v")))
    val v = col("v")
    val isList = v.startsWith("l")
    val numV = metaNum(v)
    val isNum = numV.isNotNull
    val isStr = v.startsWith("s") // the exact class $prefix accepts
    val pys = metaPyStr(v)
    val payload = v.substr(lit(2), length(v))
    val collected = kv.groupBy("k").agg(
      count(lit(1)).as("n"),
      count(when(isList, 1)).as("nList"),
      count(when(isNum, 1)).as("nNum"),
      count(when(isStr, 1)).as("nStr"),
      min(pys).as("pysMin"), max(pys).as("pysMax"),
      min(numV).as("numMin"), max(numV).as("numMax"),
      min(when(!isNum, pys)).as("nnsMin"),
      max(when(!isNum, pys)).as("nnsMax"),
      min(when(isStr, payload)).as("strMin"),
      max(when(isStr, payload)).as("strMax"))
      .orderBy(desc("n"), col("k")) // deterministic under the cap
      .limit(maxKeys + 1)
      .collect()
    val complete = collected.length <= maxKeys
    // only the KEPT keys get dictionaries — keys beyond the MaxKeys cap
    // are discarded from the sidecar anyway, so scoping the dictionary
    // aggregation to this (≤ MaxKeys, driver-known) set bounds its
    // driver collect to MaxKeys × (maxVals + 1) strings BY CONSTRUCTION,
    // whatever the segment's key cardinality
    val keptKeys = collected.take(maxKeys).map(_.getString(0)).toSeq
    // exact capped dictionaries: the distinct str() renderings per key,
    // of scalar VALUES and of well-formed list values' ELEMENTS. The
    // per-key cap is enforced BEFORE any per-key collection (distinct →
    // rank ≤ cap+1), so no aggregation state ever holds more than
    // cap+1 strings per key, whatever the segment's cardinality.
    // BOTH dictionary families (scalar values, list elements) in ONE
    // job: the two pair frames union under a side tag and share the
    // distinct → rank-cap → collect pass. On the streaming-ingest path
    // this runs once per micro-batch commit, where each extra driver
    // action is pure scheduler overhead (the segments are small) — the
    // r14 pairs leg priced the sidecar write at ~14% of s94.
    def capped(pairs: DataFrame): Map[(String, String), Option[Set[String]]] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("side", "k").orderBy("v")
      pairs.filter(col("k").isin(keptKeys: _*))
        .distinct()
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= maxVals + 1)
        .groupBy("side", "k").agg(collect_list(col("v")).as("vs"))
        .collect()
        .map { r =>
          val vs = r.getSeq[String](2)
          (r.getString(0), r.getString(1)) ->
            (if (vs.length > maxVals) None else Some(vs.toSet))
        }.toMap
    }
    val dicts = capped(
      kv.filter(!isList).select(lit("v").as("side"), col("k"), pys.as("v"))
        .unionByName(kv.filter(isList)
          .select(col("k"), explode(from_json(payload,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType))).as("e"))
          .select(lit("e").as("side"), col("k"),
            metaPyStr(col("e")).as("v"))))
    val valDicts = dicts.collect { case (("v", k), d) => k -> d }
    val elemDicts = dicts.collect { case (("e", k), d) => k -> d }
    val keys = collected.take(maxKeys).map { r =>
      def optS(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val k = r.getString(0)
      val nList = r.getLong(2)
      k -> KeyStats(
        r.getLong(1), nList, r.getLong(3), r.getLong(4),
        r.getString(5), r.getString(6),
        optD(7), optD(8), optS(9), optS(10), optS(11), optS(12),
        // a key with no scalar rows has a provably EMPTY scalar
        // dictionary (and symmetrically for elements of a list-free
        // key): membership tests on them prune every operand
        vals = valDicts.getOrElse(k, Some(Set.empty)),
        elems = elemDicts.getOrElse(k,
          if (nList == 0) Some(Set.empty) else None))
    }.toMap
    (idRange, SegmentStats(rows, nMeta, complete, keys))
  }

  // ------------------------------------------------------------- canMatch

  /** Sound over-approximation of "some row of a segment with these
    * stats satisfies the compiled filter": false ONLY when no row
    * possibly can (so dropping the segment is exact), true whenever in
    * doubt. Mirrors [[FilterAlgebra.compile]] clause by clause —
    * including the P11 metadata gate and the P12 malformed-operator
    * falses, which prune EVERY segment (the predicate is constant
    * false). */
  def canMatch(filterMap: Map[String, Any], st: SegmentStats): Boolean =
    st.nMeta > 0 && canMatchMap(filterMap, st)

  private def canMatchMap(m: Map[String, Any], st: SegmentStats): Boolean =
    m.forall {
      case ("$and", l: List[_]) => l.forall {
        case mm: Map[_, _] =>
          canMatchMap(mm.asInstanceOf[Map[String, Any]], st)
        case _ => false
      }
      case ("$or", l: List[_]) => l.exists {
        case mm: Map[_, _] =>
          canMatchMap(mm.asInstanceOf[Map[String, Any]], st)
        case _ => false
      }
      case ("$and" | "$or", _) => false // malformed combinator (P12)
      case (key, cond) => condCanMatch(st, key, cond)
    }

  private def condCanMatch(st: SegmentStats, key: String, cond: Any)
      : Boolean =
    st.keys.get(key) match {
      case None =>
        // complete key set: NO row carries the key → false for every
        // operator (P10); incomplete: unknown, cannot prune
        !st.keysComplete
      case Some(ks) => cond match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          if (mm.size != 1) false // malformed operator map (P12)
          else {
            val (op, operand) = mm.head
            op match {
              case "$ne" => neCanMatch(ks, operand)
              case "$gte" => cmpCanMatch(ks, operand, gte = true)
              case "$lte" => cmpCanMatch(ks, operand, gte = false)
              case "$prefix" => prefixCanMatch(ks, operand)
              case "$contains" => containsCanMatch(ks, operand)
              case _ => false // unknown operator (P12)
            }
          }
        case operand => eqCanMatch(ks, operand)
      }
    }

  /** Bare equality: scalars match by str() — EXACT membership when the
    * dictionary survived the cap, the str() range otherwise; a list
    * value matches on ANY element — exact membership in the element
    * dictionary when known, unprunable otherwise. */
  private def eqCanMatch(ks: KeyStats, operand: Any): Boolean = {
    val op = FilterAlgebra.operandStr(operand)
    val scalarSide = ks.n - ks.nList > 0 && (ks.vals match {
      case Some(vs) => vs.contains(op)
      case None => cpLe(ks.pysMin, op) && cpGe(ks.pysMax, op)
    })
    val listSide = ks.nList > 0 && ks.elems.forall(_.contains(op))
    scalarSide || listSide
  }

  /** $contains: lists only (P6), any element str()-equal — exact when
    * the element dictionary is known. */
  private def containsCanMatch(ks: KeyStats, operand: Any): Boolean = {
    val op = FilterAlgebra.operandStr(operand)
    ks.nList > 0 && ks.elems.forall(_.contains(op))
  }

  /** $ne matches any present value that is NOT str()-equal — prunable
    * only when every value provably equals the operand (all scalar,
    * degenerate str() range == str(op)). */
  private def neCanMatch(ks: KeyStats, operand: Any): Boolean = {
    val op = FilterAlgebra.operandStr(operand)
    ks.nList > 0 || !(ks.pysMin == op && ks.pysMax == op)
  }

  /** $gte/$lte: a numeric operand compares numerically against the
    * numeric values and lexicographically (str()) against the rest; a
    * non-numeric operand compares str() against everything. NaN floats
    * sort ABOVE every number in Spark (both in these bounds and in the
    * compiled compare), so a NaN segment BOUND is treated as +inf —
    * and symmetrically a NaN OPERAND is +inf in Spark's ordering:
    * `v <= NaN` matches every numeric value (numSide degenerates to
    * "any numeric row"), while `v >= NaN` matches only NaN values
    * (numMax.isNaN). Java double compares both sides false against
    * NaN, so without the explicit cases the mirror would prune
    * segments full of matching rows. */
  private def cmpCanMatch(ks: KeyStats, operand: Any, gte: Boolean)
      : Boolean = {
    val opStr = FilterAlgebra.operandStr(operand)
    val t = MetaCodec.encode(operand)
    if (MetaCodec.isNumeric(t)) {
      val d = MetaCodec.numValue(t)
      val numSide = ks.nNum > 0 && (
        if (gte) ks.numMax.exists(m => m.isNaN || m >= d)
        else d.isNaN || ks.numMin.exists(m => !m.isNaN && m <= d))
      val strSide = (ks.n - ks.nNum) > 0 && (
        if (gte) ks.nnsMax.exists(cpGe(_, opStr))
        else ks.nnsMin.exists(cpLe(_, opStr)))
      numSide || strSide
    } else {
      if (gte) cpGe(ks.pysMax, opStr) else cpLe(ks.pysMin, opStr)
    }
  }

  /** $prefix accepts only string-TYPED values; those with the prefix
    * form the interval [op, prefixSuccessor(op)) in code-point order. */
  private def prefixCanMatch(ks: KeyStats, operand: Any): Boolean = {
    val op = FilterAlgebra.operandStr(operand)
    ks.nStr > 0 && ks.strMax.exists(cpGe(_, op)) &&
      (prefixSuccessor(op) match {
        case Some(succ) => ks.strMin.exists(cpCompare(_, succ) < 0)
        case None => true
      })
  }

  // ---------------------------------------------------------------- codec

  // Sidecar text format (one segment = one `_metastats` file):
  //   meta2 <rows> <nMeta> <1|0 complete>
  //   <key> <n> <nList> <nNum> <nStr> <pysMin> <pysMax> <numMin>
  //         <numMax> <nnsMin> <nnsMax> <strMin> <strMax> <vals> <elems>
  // String fields are "b" + base64url(UTF-8) (so the empty string is
  // "b" and no delimiter can appear inside); absent optionals are ".".
  // Dictionary fields are "." (overflowed the cap) or "d" + the items'
  // b-encodings joined by "," ("d" alone = provably empty set).
  // meta1 (the pre-dictionary format) still decodes, with no
  // dictionaries; an unrecognized header version reads as "no sidecar"
  // so the format can keep evolving without breaking old readers.

  private def b64e(s: String): String =
    "b" + Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def b64d(s: String): String =
    new String(Base64.getUrlDecoder.decode(s.substring(1)),
      StandardCharsets.UTF_8)

  private def encOptS(o: Option[String]): String = o.fold(".")(b64e)
  private def encOptD(o: Option[Double]): String = o.fold(".")(_.toString)
  private def encDict(o: Option[Set[String]]): String =
    o.fold(".")(vs => "d" + vs.toSeq.sorted.map(b64e).mkString(","))
  private def decDict(s: String): Option[Set[String]] =
    if (s == ".") None
    else {
      require(s.startsWith("d"))
      val rest = s.substring(1)
      if (rest.isEmpty) Some(Set.empty)
      else Some(rest.split(",", -1).map(b64d).toSet)
    }

  def encode(st: SegmentStats): String = {
    val header =
      s"meta2 ${st.rows} ${st.nMeta} ${if (st.keysComplete) 1 else 0}"
    val lines = st.keys.toSeq.sortBy(_._1).map { case (k, s) =>
      Seq(b64e(k), s.n, s.nList, s.nNum, s.nStr,
        b64e(s.pysMin), b64e(s.pysMax),
        encOptD(s.numMin), encOptD(s.numMax),
        encOptS(s.nnsMin), encOptS(s.nnsMax),
        encOptS(s.strMin), encOptS(s.strMax),
        encDict(s.vals), encDict(s.elems)).mkString(" ")
    }
    (header +: lines).mkString("\n")
  }

  /** None on anything unparseable — the caller treats the segment as
    * unprunable, never fails a read over a stats sidecar. */
  def decode(text: String): Option[SegmentStats] =
    try {
      val lines = text.split("\n").toSeq.filter(_.nonEmpty)
      val h = lines.head.split(" ")
      if (h.length != 4 || (h(0) != "meta1" && h(0) != "meta2")) return None
      val nFields = if (h(0) == "meta1") 13 else 15
      val keys = lines.tail.map { line =>
        val f = line.split(" ")
        require(f.length == nFields)
        def optS(s: String) = if (s == ".") None else Some(b64d(s))
        def optD(s: String) = if (s == ".") None else Some(s.toDouble)
        b64d(f(0)) -> KeyStats(
          f(1).toLong, f(2).toLong, f(3).toLong, f(4).toLong,
          b64d(f(5)), b64d(f(6)),
          optD(f(7)), optD(f(8)), optS(f(9)), optS(f(10)),
          optS(f(11)), optS(f(12)),
          vals = if (nFields > 13) decDict(f(13)) else None,
          elems = if (nFields > 13) decDict(f(14)) else None)
      }.toMap
      Some(SegmentStats(h(1).toLong, h(2).toLong, h(3) == "1", keys))
    } catch { case scala.util.control.NonFatal(_) => None }
}
