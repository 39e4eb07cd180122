package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the contention-retry guard (VERDICT r9 finding #1): the
  * round-9 bench_ref.json refresh re-serialized the file with spaced
  * colons and Bench's whitespace-intolerant regex parsed ZERO reference
  * entries, so no query could ever become a retry suspect — the
  * self-healing isolated-retry pass silently did nothing for a whole
  * round. This spec pushes the COMMITTED file through the exact
  * production pattern so any future serializer drift fails CI loudly
  * instead of disarming the guard.
  */
class BenchRefSpec extends AnyFunSuite {

  private def refText: Option[String] = {
    val p = java.nio.file.Paths.get("tools/bench_ref.json")
    if (java.nio.file.Files.isReadable(p))
      Some(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
    else None
  }

  test("committed bench_ref.json parses non-empty through the production regex") {
    val txt = refText.getOrElse(fail("tools/bench_ref.json missing — guard has no reference"))
    val parsed = Bench.benchRefPattern.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(parsed.nonEmpty,
      "bench_ref.json parsed to ZERO entries — the contention guard is disarmed")
    // sanity: entries are real durations, and most declared queries have one
    assert(parsed.values.forall(v => v > 0 && v < 3600))
    val declared = SparkEntry.queries.keySet
    val covered = declared.intersect(parsed.keySet)
    assert(covered.size >= declared.size / 2,
      s"reference covers only ${covered.size}/${declared.size} declared queries")
  }

  test("pattern tolerates both compact and spaced serializations") {
    for (txt <- Seq("""{"q01_project":0.25,"q13_agg_q1":1.5e-1}""",
                    """{"q01_project": 0.25, "q13_agg_q1": 1.5e-1}""")) {
      val parsed = Bench.benchRefPattern.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      assert(parsed == Map("q01_project" -> 0.25, "q13_agg_q1" -> 0.15))
    }
  }
}
