package graft

import java.nio.file.Files

import graft.ops.Joins
import graft.pointcloud.syntax
import graft.pointcloud.syntax._
import org.apache.spark.sql.functions._

/** Skew-join, approx-distinct, and per-source write helpers. */
class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals the plain join on skewed keys") {
    // 90% of fact rows share one key — the classic skew shape
    val fact = spark.range(20000).select(
      when($"id" % 10 =!= 0, lit(7)).otherwise($"id" % 100).as("k"),
      $"id".as("v"))
    val dim = spark.range(100).select($"id".as("k"), concat(lit("d"), $"id").as("name"))

    val plain = fact.join(dim, "k").agg(count(lit(1)), sum("v")).collect().head
    val salted = Joins.saltedJoin(fact, dim, "k", "k", 8)
      .agg(count(lit(1)), sum("v")).collect().head
    assert(plain == salted)
  }

  test("jn02 plan shape: one exchange per side, explode-×-salt on the dimension only") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force sort-merge so the salted shuffle layout is what's pinned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = Tables.lineitem(spark, sfDir).select(
        when($"l_orderkey" % 10 < 3, lit(0))
          .otherwise($"l_orderkey" % 25).cast("int").as("k"),
        $"l_quantity")
      val dim = Tables.nation(spark, sfDir).select(
        $"n_nationkey".cast("int").as("nk"), $"n_name")
      val salted = Joins.saltedJoin(facts, dim, "k", "nk", 8)
      val plan = salted.queryExecution.executedPlan.toString
      // exactly one shuffle per join side — the salt adds no extra pass
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
      // exactly one explode, and it replicates the DIMENSION side: its
      // Generate node carries the dim columns, never the fact columns
      val genLines = plan.linesIterator.filter(_.contains("Generate explode")).toSeq
      assert(genLines.size == 1, plan)
      assert(genLines.head.contains("n_name") && !genLines.head.contains("l_quantity"),
        genLines.head)
      // and salting never changes the answer (the graded query's oracle)
      val agg = (df: org.apache.spark.sql.DataFrame) => df
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("bigint")).as("qty"))
        .sort($"n_name").collect().toSeq
      assert(agg(salted) == agg(facts.join(dim, $"k" === $"nk")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed tables equi-join and aggregate with zero exchanges") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"lang")
    val embs = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("doc_id"), $"label")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so the bucket layout, not a broadcast,
    // must carry the co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Joins.writeBucketed(docs, "graft_docs_bkt", "doc_id", 4)
      Joins.writeBucketed(embs, "graft_embs_bkt", "doc_id", 4)
      val j = spark.table("graft_docs_bkt")
        .join(spark.table("graft_embs_bkt"), "doc_id")
      assert(j.count() === docs.join(embs, "doc_id").count())
      val joinPlan = j.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"), joinPlan)
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("graft_docs_bkt").groupBy($"doc_id").count()
      assert(agg.count() === docs.select($"doc_id").distinct().count())
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_docs_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_embs_bkt")
    }
  }

  test("jn01 entry query joins and aggregates with zero exchanges") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force sort-merge so the bucket layout, not a broadcast, carries
    // the co-location (the graded query leaves the default; either way
    // the group key is the streamed side's, so the agg never shuffles)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.queries.Relational.queries("jn01_bucketed_join")(spark, sfDir)
      assert(q.count() > 0)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("approx distinct is within the requested error of exact") {
    val docs = Tables.documents(spark, sfDir)
    val row = Joins.approxDistinct(docs, "text", 0.05).collect().head
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("bloom-pruned join equals the plain join and prunes BEFORE the exchange") {
    val fact = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice")
    val dim = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey")
    val pruned = Joins.bloomPrunedJoin(fact, dim, "l_orderkey", "o_orderkey")
    val plain = fact.join(dim, $"l_orderkey" === $"o_orderkey")
    // exactness: false positives are filtered by the equi-join behind.
    // Row-set comparison, not a float SUM — summation order differs
    // between the two physical plans
    val rowsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"l_orderkey", $"l_extendedprice")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(rowsOf(pruned) == rowsOf(plain))
    // the bit-test filter must sit on the fact side, UNDER the join —
    // pruning before the exchange is the whole point
    val plan = pruned.queryExecution.executedPlan.toString
    val planLines = plan.linesIterator.toSeq
    val filterIdx = planLines.indexWhere(l => l.contains("Filter") && l.contains("xxhash64"))
    val joinIdx = planLines.indexWhere(l => l.contains("Join"))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom filter must be below the join in the plan tree:\n$plan")
    // and it must actually prune: ~20% of orders pass the dim filter, so
    // a working bloom lets well under half of lineitem through (false
    // positives only; the bound guards against a pass-everything filter)
    val factRows = fact.count()
    val bloomPass = fact.filter(
      Joins.bloomPredicate(dim, "o_orderkey", $"l_orderkey")).count()
    assert(bloomPass < factRows / 2, s"bloom passed $bloomPass of $factRows")
    // the exact-join tail then recovers exactly the plain join's rows
    assert(pruned.count() == plain.count())
  }

  test("bloom predicate survives mixed int/bigint key types (no false negatives)") {
    // xxhash64 is type-sensitive; the predicate must normalize both hash
    // inputs or an int dim vs bigint fact prunes every true match
    val dim = spark.range(100).select($"id".cast("int").as("dk"))
    val fact = spark.range(1000).select(($"id" % 200).as("k"))
    val joined = Joins.bloomPrunedJoin(fact, dim, "k", "dk").count()
    assert(joined == 500) // 0..99 × 5 occurrences each
  }

  test("bloomBitsFor: ~12 bits per key, floored, capped, multiple of 64") {
    assert(Joins.bloomBitsFor(0) == (1 << 16))
    assert(Joins.bloomBitsFor(1000) == (1 << 16)) // under the floor
    val n = 300000L
    val m = Joins.bloomBitsFor(n)
    assert(m % 64 == 0 && m >= n * 12 && m < n * 12 + 64, m.toString)
    assert(Joins.bloomBitsFor(Long.MaxValue / 16) == (1 << 26)) // cap
    // nKeys*bitsPerKey would overflow Long: the cap must win, not the
    // floor (an overflowed-negative product used to select 2^16 — the
    // saturated filter the function exists to prevent)
    assert(Joins.bloomBitsFor(Long.MaxValue - 1) == (1 << 26))
    assert(Joins.bloomBitsFor(Long.MaxValue - 1, 24, Joins.ScreenMaxBits)
      == Joins.ScreenMaxBits)
    // a raised maxBits holds the full design sizing past the old cap
    assert(Joins.bloomBitsFor(10000000L, 24, Joins.ScreenMaxBits) == 240000000L)
    intercept[IllegalArgumentException](Joins.bloomBitsFor(-1))
  }

  test("bloomScreenFor: sizes at design fp past the 2^26 default cap; escalates beyond budget") {
    // n ≫ the default cap's ~2.8M-key capacity at 24 bits/key: under
    // the ScreenMaxBits budget the screen must still be SELECTIVE (the
    // done-criterion: dismiss the clean majority, not just stay sound)
    val n = 4000000L
    val dim = spark.range(n).select($"id".as("key"))
    val (measured, screen) = Joins.bloomScreenFor(dim, "key",
      bitsPerKey = 24, k = 8, maxBits = Joins.ScreenMaxBits)
    assert(measured == n && screen.isDefined)
    // disjoint probe keys (shifted far past the member range): at 24
    // bits/key + k=8 the per-probe fp is ~4e-5, so of 100k clean keys
    // at most a handful may pass
    val clean = spark.range(100000).select(($"id" + 1000000000L).as("k"))
    val falsePos = clean.filter(screen.get($"k")).count()
    assert(falsePos < 100, s"screen passed $falsePos of 100000 clean keys")
    // and members are never missed (no false negatives, spot slice)
    val members = spark.range(5000).select(($"id" * 800L).as("k"))
    assert(members.filter(screen.get($"k")).count() == 5000)
    // beyond the budget: escalate (None) instead of shipping a filter
    // whose degraded fp compounds to a pass-through
    val (m2, s2) = Joins.bloomScreenFor(dim, "key",
      bitsPerKey = 24, k = 8, maxBits = 1L << 16)
    assert(m2 == n && s2.isEmpty)
  }

  test("rangeLookupJoin equals the brute-force BETWEEN join and plans a hash join") {
    // random points + deliberately non-uniform intervals, incl. an empty
    // one (must match nothing) and boundary-exact points
    val rnd = new scala.util.Random(7)
    val pts = (0 until 500).map(i => (i.toLong, rnd.nextInt(1000).toDouble))
      .toDF("id", "p")
    val dim = Seq((0L, 100L, "a"), (100L, 450L, "b"), (450L, 451L, "c"),
      (500L, 500L, "empty"), (600L, 1000L, "d")).toDF("lo", "hi", "tier")
    val got = Joins.rangeLookupJoin(pts, dim, "p", "lo", "hi", 128L)
      .select($"id", $"tier").as[(Long, String)].collect().sorted.toSeq
    val brute = pts.join(dim, $"p" >= $"lo" && $"p" < $"hi")
      .select($"id", $"tier").as[(Long, String)].collect().sorted.toSeq
    assert(got == brute)
    // lo inclusive, hi exclusive at the exact boundary
    val edge = Seq((1L, 100.0), (2L, 449.9999), (3L, 450.0)).toDF("id", "p")
    val e = Joins.rangeLookupJoin(edge, dim, "p", "lo", "hi", 128L)
      .select($"id", $"tier").as[(Long, String)].collect().toMap
    assert(e == Map(1L -> "b", 2L -> "b", 3L -> "c"))
    // the whole point: a broadcast HASH join on the bin, never the
    // nested-loop scan-every-interval plan
    val plan = Joins.rangeLookupJoin(pts, dim, "p", "lo", "hi", 128L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // integral points keep exact integer binning: 2^60 + 95 is not
    // representable as a double (ulp = 256 there), so a double-division
    // bin would land one bin low and silently drop the match
    val bigBase = 1L << 60
    val bigPts = Seq((1L, bigBase + 95L)).toDF("id", "p")
    val bigDim = Seq((bigBase + 64L, bigBase + 128L, "hi_tier")).toDF("lo", "hi", "tier")
    assert(Joins.rangeLookupJoin(bigPts, bigDim, "p", "lo", "hi", 64L).count() == 1)
    intercept[IllegalArgumentException] {
      Joins.rangeLookupJoin(pts, dim, "p", "lo", "hi", 0L)
    }
    intercept[IllegalArgumentException] {
      Joins.rangeLookupJoin(pts, dim, "p", "lo", "hi", 128L, joinType = "full_outer")
    }
  }

  test("rangeLookupJoin: negative bounds bin by floor division; left_outer keeps unmatched") {
    // interval [-150, -50) spans bins {-2, -1} under floor division; a
    // truncating div would cover {-1, 0} and lose the point at -150.
    // Integral AND fractional fact paths must agree on the cover.
    val dim = Seq((-150L, -50L, "neg"), (50L, 150L, "pos")).toDF("lo", "hi", "tier")
    val ptsL = Seq((1L, -150L), (2L, -51L), (3L, -50L), (4L, 50L), (5L, 0L))
      .toDF("id", "p")
    val gotL = Joins.rangeLookupJoin(ptsL, dim, "p", "lo", "hi", 100L)
      .select($"id", $"tier").as[(Long, String)].collect().toMap
    assert(gotL == Map(1L -> "neg", 2L -> "neg", 4L -> "pos"), gotL.toString)
    val ptsD = Seq((1L, -150.0), (2L, -50.0001), (3L, -49.9999))
      .toDF("id", "p")
    val gotD = Joins.rangeLookupJoin(ptsD, dim, "p", "lo", "hi", 100L)
      .select($"id", $"tier").as[(Long, String)].collect().toMap
    assert(gotD == Map(1L -> "neg", 2L -> "neg"), gotD.toString)
    // brute-force equivalence across a dense negative/positive sweep
    val sweep = (-400 until 400).map(i => (i.toLong, i.toLong)).toDF("id", "p")
    val got = Joins.rangeLookupJoin(sweep, dim, "p", "lo", "hi", 64L)
      .select($"id", $"tier").as[(Long, String)].collect().sorted.toSeq
    val brute = sweep.join(dim, $"p" >= $"lo" && $"p" < $"hi")
      .select($"id", $"tier").as[(Long, String)].collect().sorted.toSeq
    assert(got == brute)
    // left_outer: every fact row survives; unmatched carry null dim cols
    val outer = Joins.rangeLookupJoin(ptsL, dim, "p", "lo", "hi", 100L,
        joinType = "left_outer")
      .select($"id", $"tier").as[(Long, Option[String])].collect().toMap
    assert(outer == Map(1L -> Some("neg"), 2L -> Some("neg"), 3L -> None,
      4L -> Some("pos"), 5L -> None), outer.toString)
  }

  test("writePerSource names outputs after their source files") {
    val a = Files.createTempDirectory("graft-srcA").toString
    val b = Files.createTempDirectory("graft-srcB").toString
    val out = Files.createTempDirectory("graft-persrc").toString
    def pts(n: Int) = spark.range(n).select(
      $"id".cast("int").as("x"), $"id".cast("int").as("y"),
      $"id".cast("int").as("z"), lit(0).cast("short").as("intensity"),
      lit(1).cast("byte").as("flags"), lit(0).cast("byte").as("classification"),
      lit(0).cast("byte").as("angle"), lit(0).cast("byte").as("user"),
      lit(0).cast("short").as("source"))
    pts(100).coalesce(1).writePly(a)
    pts(200).coalesce(1).writePly(b)
    val df = spark.read.ply(a, b)
    val dirs = syntax.writePerSource(df, out, "ply")
    assert(dirs.size == 2)
    // outputs are named after source basenames and carry the right rows
    val counts = dirs.map(d => spark.read.ply(d).count()).sorted
    assert(counts == Seq(100L, 200L))
    val names = new java.io.File(out).listFiles().map(_.getName).sorted.toSeq
    assert(names.forall(_.startsWith("part-")), names.toString)
  }
}
