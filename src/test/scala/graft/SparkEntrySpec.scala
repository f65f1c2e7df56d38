package graft

import graft.queries._

/** Driver-contract invariants: a broken mapping here silently WEAKENS the
  * correctness gate (an oracle without a query is never compared; a
  * duplicate query name shadows one implementation with another). */
class SparkEntrySpec extends SparkTestBase {

  test("every oracle key has a query; column aliases appear in the SQL") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("query names are unique across the defs maps (no ++ shadowing)") {
    val all = Seq(RelationalQueries.defs, MemoQueries.defs, VectorQueries.defs,
      DedupQueries.defs, TextQueries.defs, EventQueries.defs, ScaleQueries.defs)
    val dups = all.flatMap(_.keys).groupBy(identity)
      .collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    // same for the oracle maps
    val oAll = Seq(RelationalQueries.oracles, MemoQueries.oracles,
      VectorQueries.oracles, DedupQueries.oracles, TextQueries.oracles,
      EventQueries.oracles, ScaleQueries.oracles)
    val oDups = oAll.flatMap(_.keys).groupBy(identity)
      .collect { case (k, v) if v.size > 1 => k }
    assert(oDups.isEmpty, s"duplicate oracle names: $oDups")
  }
}
