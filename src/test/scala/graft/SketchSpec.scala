package graft

import graft.ops.{Sketches, Temporal}
import org.apache.spark.sql.functions._

/** Gap sessionization, the count-min sketch, and the histogram quantile
  * sketch — each checked against its brute-force/exact definition and,
  * where the sketch state merges, for partition invariance. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private def randomEvents(seed: Int, n: Int, keys: Int, tMax: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(tMax).toLong))
      .toDF("id", "k", "t")
  }

  test("sessionize matches the brute-force session numbering") {
    val df = randomEvents(11, 500, 6, 2000)
    val gap = 40L
    val got = Temporal.sessionize(df, "k", "t", "id", gap)
      .select($"id", $"sess")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val ordered = rows.sortBy(r => (r._3, r._1))
        var sess = 0L
        var prev = Long.MinValue
        ordered.map { case (id, _, t) =>
          if (prev == Long.MinValue || t - prev > gap) sess += 1
          prev = t
          id -> sess
        }
      }.toMap
    assert(got == expected)
    assert(expected.values.max > 1) // the fixture produces multiple sessions
    intercept[IllegalArgumentException](Temporal.sessionize(df, "k", "t", "id", 0L))
  }

  test("sessionize + per-session aggregate plans exactly one exchange") {
    // the lag window, the running-sum window, and the (key, sess)
    // aggregate all reuse the hashpartitioning(key) exchange — the
    // subset-clustering property the operator's 100 TB cost rests on
    val df = randomEvents(17, 1000, 8, 5000)
    val plan = Temporal.sessionize(df, "k", "t", "id", 50L)
      .groupBy($"k", $"sess").agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("count-min counters are partition-invariant and estimates upper-bound exact counts") {
    val rnd = new scala.util.Random(23)
    // zipfish: token i appears ~1500/i times
    val toks = (1 to 40).flatMap(i => Seq.fill(1500 / i)(s"tok$i"))
    val df = rnd.shuffle(toks).toDF("tok")
    def counters(parts: Int) =
      Sketches.countMinBuild(df.repartition(parts), "tok", 4, 64).counters
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(counters(1) == counters(13)) // merge = single pass, exactly
    val exact = df.groupBy($"tok").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(
        Sketches.countMinBuild(df, "tok", 4, 64), exact, "tok")
      .join(exact, "tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    // CMS never under-counts; at 4x64 with 40 tokens it is usually exact
    est.foreach { case (tok, e, x) => assert(e >= x, s"$tok: est $e < exact $x") }
    val exactHits = est.count { case (_, e, x) => e == x }
    assert(exactHits >= est.length / 2)
  }

  test("bucket-pinned exact quantile equals the brute-force rank statistic") {
    val rnd = new scala.util.Random(41)
    // duplicates included: step 50 over a 0..500 range of ints
    val df = (0 until 5000).map(_ => (rnd.nextInt(500) * 1.0)).toDF("v")
    val got = Sketches.exactQuantilesViaHistogram(df, "v", 50.0, Seq(0.01, 0.5, 0.9, 0.99, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = df.collect().map(_.getDouble(0)).sorted
    Seq(0.01, 0.5, 0.9, 0.99, 1.0).foreach { q =>
      val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
      assert(got(q) == exact, s"q=$q got=${got(q)} exact=$exact")
    }
  }

  test("histogram quantile is within one bucket of the exact rank statistic") {
    val rnd = new scala.util.Random(31)
    val df = (0 until 20000).map(_ => rnd.nextDouble() * 5000).toDF("v")
    val step = 100.0
    val got = Sketches.histogramQuantiles(df, "v", step, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = df.collect().map(_.getDouble(0)).sorted
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
      val est = got(q)
      assert(est >= exact && est - exact <= step, s"q=$q est=$est exact=$exact")
    }
    intercept[IllegalArgumentException](
      Sketches.histogramQuantiles(df, "v", 0.0, Seq(0.5)))
  }

  test("kmv_sketch: the sketch value, its rollup, and duplicate-hash safety") {
    import graft.functions.exprs
    import org.apache.spark.sql.functions._
    // sketch of fewer than k distinct hashes IS the sorted distinct set
    val small = Seq(5L, 3L, 9L, 3L, 7L).toDF("h")
      .agg(exprs.kmv_sketch($"h", 16)).head().getSeq[Long](0)
    assert(small == Seq(3L, 5L, 7L, 9L))
    // more than k: the k smallest, ascending
    val big = (1L to 100L).toDF("h")
      .agg(exprs.kmv_sketch($"h", 8)).head().getSeq[Long](0)
    assert(big == (1L to 8L))
    // rollup property on the real corpus: per-source sketches exploded
    // into kmv_distinct give EXACTLY the single-pass (kth, est) — even
    // though the same text (hence hash) can appear in several sources
    val hashed = Tables.documents(spark, sfDir)
      .select($"source", exprs.kmv_hash($"text").as("h"))
    val direct = hashed.agg(exprs.kmv_distinct($"h", 64).as("kmv"))
      .select($"kmv.kth", $"kmv.est").head()
    val rolled = hashed.groupBy($"source")
      .agg(exprs.kmv_sketch($"h", 64).as("sk"))
      .select(explode($"sk").as("h"))
      .agg(exprs.kmv_distinct($"h", 64).as("kmv"))
      .select($"kmv.kth", $"kmv.est").head()
    assert(rolled == direct)
  }

  test("count-min shard merge equals the single-pass sketch counter for counter") {
    val toks = Tables.documents(spark, sfDir)
      .select($"source", explode(split($"text", " ")).as("tok"))
    val merged = graft.ops.Sketches.countMinMerge(
      graft.ops.Sketches.countMinBuildBy(toks, "source", "tok", 4, 128), 4, 128)
    val direct = graft.ops.Sketches.countMinBuild(toks, "tok", 4, 128)
    def cells(s: graft.ops.Sketches.CountMinSketch) = s.counters.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // counters are plain sums → the cell-wise shard merge is LOSSLESS
    assert(cells(merged) == cells(direct))
  }

  test("kmvOverlap: exact columns exact, estimator tracks known overlap, partition-invariant") {
    // A = k0..k1499, B = k1000..k2499: |A|=|B|=1500, |A∩B|=500, |A∪B|=2500
    val rows = ((0 until 1500).map(i => ("A", s"k$i")) ++
      (1000 until 2500).map(i => ("B", s"k$i"))).toDF("g", "key")
    val r = Sketches.kmvOverlap(rows, "g", "key", "A", "B", 64).collect().head
    assert(r.getAs[Long]("exact_a") == 1500L)
    assert(r.getAs[Long]("exact_b") == 1500L)
    assert(r.getAs[Long]("exact_union") == 2500L)
    assert(r.getAs[Long]("exact_inter") == 500L)
    // two passes over the input, not five: one scan feeds the combined
    // sketch aggregate (conditional inputs), one the exact baseline
    val plan = Sketches.kmvOverlap(rows, "g", "key", "A", "B", 64)
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllMatchIn(plan).length
    assert(scans == 2, s"expected 2 input scans, got $scans:\n$plan")
    // k=64 on 1.5k/2.5k sets: generous tolerances, deterministic values
    assert(math.abs(r.getAs[Double]("est_a") - 1500) / 1500 < 0.5, r.toString)
    assert(math.abs(r.getAs[Double]("est_union") - 2500) / 2500 < 0.5, r.toString)
    val j = r.getAs[Double]("jaccard")
    assert(j > 0.05 && j < 0.45, s"jaccard $j should track 0.2") // true J = 500/2500
    // hash order statistics: identical under any partitioning
    val r2 = Sketches.kmvOverlap(rows.repartition(7), "g", "key", "A", "B", 64)
      .collect().head
    assert(r.toSeq == r2.toSeq)

    // degenerate: neither group present → similarity columns are
    // explicit nulls (undefined, not "provably disjoint"), cardinality
    // estimates a true 0
    val e = Sketches.kmvOverlap(rows, "g", "key", "X", "Y", 64).collect().head
    assert(e.isNullAt(e.fieldIndex("jaccard")), e.toString)
    assert(e.isNullAt(e.fieldIndex("est_inter")), e.toString)
    assert(e.getAs[Double]("est_a") == 0.0 && e.getAs[Long]("exact_union") == 0L,
      e.toString)
    // every exact cardinality is a TRUE (non-null) 0 — a sum over the
    // empty groupBy would otherwise leak NULL into three of the four
    for (c <- Seq("exact_a", "exact_b", "exact_inter"))
      assert(!e.isNullAt(e.fieldIndex(c)) && e.getAs[Long](c) == 0L, c)
  }
}
