package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench contract line out of the LAST 2000 chars of
  * captured output (round 5's line overflowed it and recorded parsed:null).
  * The line must fit together with sbt's ~70-char success trailer, so the
  * worst-case render over the registered query names is the budget — this
  * spec fails BEFORE a new query silently pushes the line over, and pins
  * the qNN-prefix keys as unique (two queries sharing a number would
  * silently merge in the contract JSON). */
class BenchContractSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("qNN contract keys are unique across all registered queries") {
    val dup = names.groupBy(Bench.contractKey).filter(_._2.length > 1)
    assert(dup.isEmpty, s"duplicate contract-key prefixes: $dup")
  }

  test("worst-case contract line fits the 2000-char tail with sbt trailer") {
    // model every per-query value at 7 chars (9999.99 — a >2.7h query),
    // the total at 8, and every streaming entry at a 7-digit eps: a
    // pathologically slow round must still emit a line the driver can
    // parse, not only a healthy sub-second one
    val streamKeys = Seq("s90", "s91", "s92", "s93", "s94", "s95")
    val line = """{"metric":"total","value":99999.99,"unit":"sec","queries":{""" +
      names.map(n => "\"" + Bench.contractKey(n) + "\":9999.99").mkString(",") +
      ""","errors":["q99"],"streams":{""" +
      streamKeys.map("\"" + _ + "\":9999999").mkString(",") +
      """},"sf":"sf0.1","load":9999.99,"runs":99}"""
    val budget = 2000 - 70
    assert(line.length <= budget,
      s"contract line worst case ${line.length} chars > $budget — " +
        "restructure Bench output before adding more queries")
  }
}
