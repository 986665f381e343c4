package graft

import graft.functions.exprs
import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** As-of join, banded interval join, and the KMV distinct sketch. */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def randomEvents(seed: Int, n: Int, keys: Int, tMax: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(tMax).toLong, rnd.nextDouble()))
      .toDF("id", "k", "t", "v")
  }

  test("asofJoin matches the brute-force definition on random data") {
    // duplicate times within keys are likely at tMax=50, exercising ties
    val left = randomEvents(1, 300, 5, 50)
    val right = randomEvents(2, 300, 5, 50)
    val got = Temporal.asofJoin(left, right, "k", "t", "k", "t", rightTiebreak = "id")
      .select($"id", $"asof.id".as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = left.collect().map { l =>
      val (lid, lk, lt) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val cands = rightRows.filter(r => r._2 == lk && r._3 <= lt)
      lid -> (if (cands.isEmpty) -1L
              else cands.maxBy(r => (r._3, r._1))._1) // greatest time, then tiebreak
    }.toMap
    assert(got == expected)
  }

  test("asofJoin never matches a null right time and yields null for null left times") {
    val left = Seq((1L, 1L, Some(10L)), (2L, 1L, None)).toDF("id", "k", "t")
    val right = Seq((7L, 1L, Some(5L)), (8L, 1L, None)).toDF("id", "k", "t")
    val rows = Temporal.asofJoin(left, right, "k", "t", "k", "t", rightTiebreak = "id")
      .select($"id", $"asof.id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(rows == Map(1L -> 7L, 2L -> -1L)) // null-t right row 8 matched nothing
  }

  test("asofJoin rejects mismatched key types and an occupied asof column") {
    val left = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val right = Seq((1L, 2L, 5L)).toDF("id", "k", "t")
    val e1 = intercept[IllegalArgumentException](
      Temporal.asofJoin(left, right, "k", "t", "k", "t", "id"))
    assert(e1.getMessage.contains("key columns"))
    val leftTaken = Seq((1L, 1L, 10L)).toDF("asof", "k", "t")
    val rightOk = Seq((1L, 1L, 5L)).toDF("id", "k", "t")
    val e2 = intercept[IllegalArgumentException](
      Temporal.asofJoin(leftTaken, rightOk, "k", "t", "k", "t", "id"))
    assert(e2.getMessage.contains("already exists"))
  }

  test("bandedIntervalSelfJoin matches brute force and rejects band <= 0") {
    val df = randomEvents(3, 400, 4, 1000).select($"k", $"t", $"id")
    val band = 37L
    val got = Temporal.bandedIntervalSelfJoin(df, "k", "t", "id", band)
      .select($"id_a", $"id_b", $"dt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (for {
      a <- rows; b <- rows
      if a._1 == b._1
      if b._2 <= a._2 + band
      if b._2 > a._2 || (b._2 == a._2 && b._3 > a._3)
    } yield (a._3, b._3, b._2 - a._2)).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // the fixture actually exercises the join
    intercept[IllegalArgumentException](
      Temporal.bandedIntervalSelfJoin(df, "k", "t", "id", 0L))
  }

  test("salted asofJoin equals the unsalted join on a hot key") {
    // 90% of left rows share key 7 — the documented skew shape the
    // saltBuckets mitigation exists for; results must be identical
    val rnd = new scala.util.Random(9)
    // includes null left times (match nothing) — the null path must keep
    // behaving identically under salting
    val left = (0 until 2000).map(i =>
      (i.toLong, if (i % 10 == 0) i % 5L else 7L,
        if (i % 17 == 0) None else Some(rnd.nextInt(100).toLong)))
      .toDF("id", "k", "t")
    val right = randomEvents(10, 300, 8, 100)
    def res(buckets: Int) =
      Temporal.asofJoin(left, right, "k", "t", "k", "t", rightTiebreak = "id",
          saltBuckets = buckets)
        .select($"id", $"asof.id".as("rid"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    val unsalted = res(1)
    assert(res(4) == unsalted)
    assert(unsalted.values.count(_ >= 0) > 0) // the fixture actually matches
    intercept[IllegalArgumentException](
      Temporal.asofJoin(left, right, "k", "t", "k", "t", "id", saltBuckets = 0))
    // salting widens the partitioning key, it must not add a shuffle
    val plan = Temporal.asofJoin(left, right, "k", "t", "k", "t",
        rightTiebreak = "id", saltBuckets = 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("asofJoin plans exactly one exchange (sort-merge shape, no per-row probe)") {
    val left = randomEvents(4, 200, 5, 50)
    val right = randomEvents(5, 200, 5, 50)
    val plan = Temporal.asofJoin(left, right, "k", "t", "k", "t", rightTiebreak = "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ohlcBars: hand-computed bars, tie-broken open/close, one exchange") {
    // key A, bucket 0: t=10 holds an equal-time tie (ids 1 vs 2 — open
    // must pick id 1's value); t=90 closes the bar. bucket 100 has one row.
    val ev = Seq(
      (1L, "A", 10L, 5.0), (2L, "A", 10L, 7.0), (3L, "A", 90L, 1.0),
      (4L, "A", 150L, 4.0),
      (5L, "B", 20L, 2.0)).toDF("id", "k", "t", "v")
    val bars = Temporal.ohlcBars(ev, "k", "t", "id", "v", 100L)
      .orderBy("k", "bucket")
      .select("k", "bucket", "open", "high", "low", "close", "n")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(bars == Seq(
      ("A", 0L, 5.0, 7.0, 1.0, 1.0, 3L),
      ("A", 100L, 4.0, 4.0, 4.0, 4.0, 1L),
      ("B", 0L, 2.0, 2.0, 2.0, 2.0, 1L)), bars.toString)

    // one map-side-combined aggregate: exactly one exchange, partials
    // before it, no window pass (struct-keyed min_by buffers aren't
    // hash-agg mutable, so Spark plans SortAggregate — the sorts are
    // per-partition on the tiny group key, not a global order)
    val plan = Temporal.ohlcBars(ev, "k", "t", "id", "v", 100L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(plan.contains("partial_min_by"), plan)
    assert(!plan.contains("Window"), plan)

    intercept[IllegalArgumentException] {
      Temporal.ohlcBars(ev, "k", "t", "id", "v", 0L)
    }

    // pre-1970 epochs bucket by FLOOR division: t=-10 belongs to bar
    // -100 (floor), not bar 0 (truncation) — and the bar that opens at
    // -100 must not swallow t=0's row
    val neg = Seq((1L, "A", -10L, 3.0), (2L, "A", -100L, 9.0), (3L, "A", 0L, 1.0))
      .toDF("id", "k", "t", "v")
    val negBars = Temporal.ohlcBars(neg, "k", "t", "id", "v", 100L)
      .orderBy("bucket").select("bucket", "open", "close", "n")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(negBars == Seq((-100L, 9.0, 3.0, 2L), (0L, 1.0, 1.0, 1L)),
      negBars.toString)
  }

  test("timeWeightedAvg matches the hand-computed step integral") {
    // key 1: v=10 holds 4 ticks, v=20 holds 6 ticks, v=30 ends the span
    //   twa = (10*4 + 20*6) / 10 = 16.0, span = 10, n = 3
    // key 2: one sample — no held interval, twa null
    val df = Seq(
      (1L, 1L, 0L, 10.0), (1L, 2L, 4L, 20.0), (1L, 3L, 10L, 30.0),
      (2L, 4L, 5L, 99.0)).toDF("k", "id", "t", "v")
    val rows = Temporal.timeWeightedAvg(df, "k", "t", "id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2), r.getLong(3))).toMap
    assert(rows(1L) == ((3L, 16.0, 10L)))
    assert(rows(2L) == ((1L, null, 0L)))
  }

  test("resampleLinear: hand-computed brackets, null head, LOCF tail, one exchange") {
    // user 1: obs (t=10, v=1.0), (t=20, v=3.0)
    //   grid 5 → null (before first), 10 → 1.0 (coincides), 15 → 2.0
    //   (midpoint), 25 → 3.0 (LOCF after last)
    val obs = Seq((1L, 10L, 1.0), (1L, 20L, 3.0)).toDF("k", "t", "v")
    val grid = Seq((1L, 5L), (1L, 10L), (1L, 15L), (1L, 25L)).toDF("k", "t")
    val out = Temporal.resampleLinear(obs, grid, "k", "t", "v")
    // the union-and-window formulation costs ONE exchange on the key
    // (plan read before execution — a finalized AQE string repeats the
    // tree under both Initial and Final sections)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    val got = out.collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(got == Map(5L -> null, 10L -> 1.0, 15L -> 2.0, 25L -> 3.0))
  }

  test("KMV distinct estimate tracks the exact count and is partition-invariant") {
    // 5000 rows, ~1200 distinct values: k=64 engages the estimator
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(_ => s"val_${rnd.nextInt(1200)}").toDF("s")
    def sketch(part: Int) = df.repartition(part)
      .agg(exprs.kmv_distinct(exprs.kmv_hash($"s"), 64).as("kmv"))
      .select($"kmv.kth", $"kmv.est").collect().head
    val one = sketch(1)
    val many = sketch(13)
    assert(one == many) // merge path = single-buffer path, bit for bit
    val exact = df.distinct().count().toDouble
    val est = one.getDouble(1)
    assert(math.abs(est - exact) / exact < 0.3, s"est=$est exact=$exact")
  }

  test("KMV is exact below k and the SQL surface resolves the functions") {
    val df = (0 until 10).map(i => s"v$i").toDF("s")
    val r = df.agg(exprs.kmv_distinct(exprs.kmv_hash($"s"), 64).as("kmv"))
      .select($"kmv.est").collect().head
    assert(r.getDouble(0) == 10.0)
    df.createOrReplaceTempView("kmv_probe")
    val sql = spark.sql(
      "SELECT graft_kmv_distinct(graft_kmv_hash(s), 64).est AS est FROM kmv_probe")
      .collect().head
    assert(sql.getDouble(0) == 10.0)
  }
}
