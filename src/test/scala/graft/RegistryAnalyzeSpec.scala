package graft

/** Registry-wide analyze smoke test (VERDICT r4 task 2).
  *
  * Every `SparkEntry.queries` entry must at least ANALYZE against every
  * scale-factor fixture directory. Round 4 proved why: the driver regenerated
  * `/root/testdata` with `events.ts` as TIMESTAMP(µs) instead of
  * TIMESTAMP(NANOS), the old reader broke at analysis, and 9 queries silently
  * vanished from the correctness gate (they simply errored out of Verify's
  * loop). This spec turns the next silent schema drift into a loud, NAMED
  * per-query failure — "qNN @ sfX: <error>" — without executing anything
  * (analysis only: schema resolution + type checking, no jobs).
  */
class RegistryAnalyzeSpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  for (dir <- sfDirs) {
    val sf = dir.split('/').last
    test(s"all registered queries analyze against $sf") {
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).queryExecution.analyzed; None }
          catch {
            case e: Exception =>
              Some(s"$name @ $sf: " +
                e.toString.linesIterator.take(2).mkString(" | "))
          }
      }
      assert(failures.isEmpty,
        s"analysis failed for ${failures.size} queries:\n" +
          failures.mkString("\n"))
    }
  }

  test("every query has an oracle or a documented spec-only waiver") {
    // Guard a second silent-shrink mode: a `queries` entry without an
    // `oracleSql` entry gets only a weak rows-only check from the driver.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
