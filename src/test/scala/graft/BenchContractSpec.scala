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
    // model every per-query value at 6 chars (999.99 — at 120 queries
    // that round already burned 33 hours, several times the entire
    // round's wall budget, so larger values mean the round is broken
    // long before its artifact is), the total at 9, every streaming
    // entry at a 7-digit eps, and the rerun tally at 3 digits: a
    // pathologically slow round must still emit a line the driver can
    // parse, not only a healthy sub-second one
    val streamKeys = Seq("s90", "s91", "s92", "s93", "s94", "s95", "s96")
    val line = """{"metric":"total","value":999999.99,"unit":"sec","queries":{""" +
      names.map(n => "\"" + Bench.contractKey(n) + "\":999.99").mkString(",") +
      ""","errors":["q99"],"streams":{""" +
      streamKeys.map("\"" + _ + "\":9999999").mkString(",") +
      """},"sf":"sf0.1","load":9999.99,"runs":99,"rrt":999}"""
    val budget = 2000 - 70
    assert(line.length <= budget,
      s"contract line worst case ${line.length} chars > $budget — " +
        "restructure Bench output before adding more queries")
  }

  test("worst-case loadsum line stays compact beside the contract line") {
    // the loadsum line rides DIRECTLY before the contract line and is
    // best-effort (a pathological round's tail keeps only the contract
    // line, which still carries `rrt`); its worst case — loads at 4
    // digits, the reruns map at its 8-entry cap — must stay small
    // enough that every realistic round keeps both lines inside the
    // driver's 2000-char tail capture
    val line = """{"metric":"loadsum","max_load":9999.99,""" +
      """"median_load":9999.99,"reruns_total":999,"reruns":{""" +
      (1 to 8).map(i => s""""q$i$i$i":9""").mkString(",") + "}}"
    assert(line.length <= 220, s"loadsum worst case ${line.length} > 220")
  }
}
