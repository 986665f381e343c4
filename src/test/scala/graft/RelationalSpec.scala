package graft

import graft.queries.Relational

/** Smoke + shape tests for the IQ-01..24 corpus (full value check is the
  * driver's DuckDB oracle; see /tmp-run of Verify + check_oracle).
  */
class RelationalSpec extends SparkTestBase {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, q) =>
      val df = q(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has a matching oracle entry") {
    assert(Relational.queries.keySet == Relational.oracle.keySet)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("iq04 global agg matches a direct computation") {
    val row = Relational.queries("iq04_global_agg")(spark, sfDir).collect().head
    val li = Tables.lineitem(spark, sfDir)
    assert(row.getLong(row.fieldIndex("n")) == li.count())
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.queries("iq18_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("filter is pushed into the parquet scan") {
    val plan = Relational.queries("iq02_filter")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"), plan)
  }

  test("iq09 multiway join broadcasts the filtered dimension sides (AQE)") {
    val df = Relational.queries("iq09_multijoin_agg")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("iq03 aggregation is two-phase (map-side partial before the shuffle)") {
    val plan = Relational.queries("iq03_hash_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"), plan)
  }

  test("projection is pruned into the parquet ReadSchema") {
    val plan = Relational.queries("iq01_scan_project")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // only the 4 needed columns reach the scan
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_comment"), read)
  }
}
