package graft

/** Every `SparkEntry.queries` entry must RUN against the real testdata —
  * the driver's verification contract. Unit suites on synthetic frames
  * cannot catch an entry query that throws on its first read (schema
  * inference traps, bad table paths, oracle-only column names), so this
  * suite executes the whole entry surface at sf0.001: each query must
  * analyze, execute, and return rows without throwing.
  */
class EntrySurfaceSpec extends SparkTestBase {

  private val haveData = new java.io.File(sfDir).isDirectory

  test("entry flagship query returns rows") {
    assume(haveData, s"$sfDir missing")
    assert(SparkEntry.entry(spark).limit(1).count() === 1L)
  }

  test("every query has an oracle, and no oracle is orphaned") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without an oracle: $noOracle")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on $sfDir and returns rows") {
      assume(haveData, s"$sfDir missing")
      val df = fn(spark, sfDir)
      val n = df.count()
      // n > 0, not n >= 0: a zero-row result hash-matches a zero-row
      // oracle VACUOUSLY (the round-10 jn03 incident — a dim predicate
      // that selected nothing at every SF graded green for three
      // rounds). Every entry's interesting predicate must select rows
      // at the smallest SF or the grade proves nothing.
      assert(n > 0L, s"$name returned zero rows at $sfDir — vacuous oracle grade")
    }
  }
}
