package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * banded interval (range) join. Both are expressed as ONE declarative
  * plan — a single hash-partition shuffle plus a sort or equi-join — so
  * Catalyst/AQE keep optimizing them and they scale like a sort-merge
  * join, never like a nested loop.
  */
object Temporal {

  /** As-of join: for every left row, attach the single right row of the
    * same key with the greatest `rightTime <= leftTime` (ties broken by
    * the greatest `rightTiebreak`), as a nullable struct column `asof`.
    *
    * Implementation is the union-and-scan formulation: tag both sides,
    * union them, and run a running `last(right_struct, ignoreNulls)`
    * window ordered by (time, side, tiebreak) within each key — right
    * rows sort before left rows at equal times, so `<=` semantics fall
    * out of the ordering. Cost at 100 TB: ONE shuffle on the key and one
    * sort — exactly a sort-merge join's plan shape, with none of the
    * per-left-row probing a LATERAL/theta formulation would pay, and no
    * state blowup on keys with many right rows (the window carries one
    * struct). A hot key skews its sort partition; `saltBuckets > 1`
    * applies the pre-salting mitigation: every LEFT row gets a
    * deterministic content-hash salt in [0, saltBuckets) and the right
    * side replicates once per salt, so the window partitions on
    * (key, salt) and one hot key's left rows spread over `saltBuckets`
    * sort partitions instead of one. Each salted partition still holds
    * ALL right rows of its key, so the running `last` sees exactly the
    * same candidates — results are identical to the unsalted join
    * (parity-pinned by TemporalSpec). Cost: the right side shuffles
    * ×saltBuckets — use when left rows per hot key dwarf right rows
    * (the same trade as [[graft.ops.Joins.saltedJoin]], which applies it
    * to a plain equi-join). Caveat: the salt hashes (key, time) — kept
    * deterministic ACROSS attempts on purpose, since a row whose bucket
    * changed between stage retries could be lost or duplicated by the
    * exchange — so the spread is only as good as the hot key's distinct
    * time values. Coarse-truncated timestamps collapse toward fewer
    * buckets (all-null times to one), degrading the mitigation toward
    * the unsalted plan; correctness is unaffected. If a hot key's times
    * are that coarse, pre-disambiguate the left time (e.g. add a
    * per-row jitter column smaller than the comparison granularity)
    * rather than hashing a nondeterministic id.
    *
    * Both time columns must share one type (use exact integer epochs,
    * not timestamps, when sub-second precision matters). Null keys group
    * together (they never leave the operator incorrect for SQL `=`
    * semantics because a null-keyed left row can only pick up null-keyed
    * right rows; filter them beforehand if that is not wanted). Null
    * times follow SQL comparison semantics: a right row with a null time
    * is never a match (it is filtered before the union), and a left row
    * with a null time matches nothing (nulls-first ordering places it
    * ahead of every right row of its key, so the running `last` is null).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      rightTiebreak: String,
      asofCol: String = "asof",
      saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets >= 1, s"asofJoin needs saltBuckets >= 1, got $saltBuckets")
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == rt, s"asofJoin time columns must share a type ($leftTime: $lt, $rightTime: $rt)")
    val lk = left.schema(leftKey).dataType
    val rk = right.schema(rightKey).dataType
    require(lk == rk, s"asofJoin key columns must share a type ($leftKey: $lk, $rightKey: $rk)")
    require(!left.columns.contains(asofCol),
      s"asofJoin output column '$asofCol' already exists on the left side; pass a different asofCol")
    val tieType = right.schema(rightTiebreak).dataType
    val lStructType = left.schema
    val rStructType = right.schema

    // a null rightTime would sort to the head of its key partition and be
    // carried forward as a "match"; SQL `<=` never matches null, so drop
    val rightNonNull = right.where(col(rightTime).isNotNull)
    // left salt is a deterministic hash of (key, time): time varies
    // within a hot key so rows spread uniformly, equal-(key,time) rows
    // sharing a bucket is harmless (each bucket holds every right row of
    // the key), and primitive inputs avoid both full-row hashing cost and
    // xxhash64's MapType-column rejection on wide production schemas
    val lSalt =
      if (saltBuckets == 1) lit(0)
      else pmod(xxhash64(col(leftKey), col(leftTime)), lit(saltBuckets)).cast("int")
    val rSalt =
      if (saltBuckets == 1) lit(0)
      else explode(array((0 until saltBuckets).map(lit): _*))
    val r = rightNonNull.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTiebreak).as("__tie"),
      lit(null).cast(lStructType).as("__l"),
      struct(right.columns.toIndexedSeq.map(col): _*).as("__r"),
      rSalt.as("__salt"))
    val l = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"),
      lSalt.as("__salt"))

    val partCols = if (saltBuckets == 1) Seq(col("__k")) else Seq(col("__k"), col("__salt"))
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*") +: Seq(col(asofCol)): _*)
  }

  /** Gap-based sessionization in batch: appends a per-key session index
    * `sessCol` (1-based) that increments whenever the time since the
    * key's previous row exceeds `gap`. The batch twin of the streaming
    * session operators (st02/st03) — the shape a backfill or feature
    * pipeline runs over historical events.
    *
    * One shuffle: both windows (the lag and the running sum of
    * session-starts) share the same (key, time, id) partitioning and
    * ordering, so Catalyst plans a single exchange + sort and evaluates
    * both in one Window operator pass. `time` must be an integral epoch
    * column; `gap` shares its unit; `id` breaks equal-time ties so the
    * session numbering is deterministic.
    */
  def sessionize(
      df: DataFrame,
      key: String,
      time: String,
      id: String,
      gap: Long,
      sessCol: String = "sess"): DataFrame = {
    require(gap > 0, s"sessionize needs gap > 0, got $gap")
    require(!df.columns.contains(sessCol),
      s"sessionize output column '$sessCol' already exists; pass a different sessCol")
    // withColumn silently REPLACES an existing column, so an input column
    // named like the temporary would be consumed and dropped from the output
    require(!df.columns.contains("__prev"),
      "sessionize uses '__prev' as a temporary column; rename that input column")
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(id))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(time), 1).over(w))
      .withColumn(sessCol,
        sum(when(col("__prev").isNull || col(time) - col("__prev") > gap, 1L)
          .otherwise(0L)).over(run))
      .drop("__prev")
  }

  /** Per-key time-weighted average of an irregularly-sampled value — the
    * step-function integral feature (each sample holds until the next
    * one): twa = Σ value·dt / Σ dt with dt the gap to the key's next
    * sample; the final sample carries no dt and drops out of both sums
    * (SQL null-sum semantics), and single-sample keys yield a null twa.
    * Returns (key, n, twa, span) with span = last − first sample time.
    *
    * One exchange: the lead window partitions by key and the aggregate's
    * (key) grouping reuses that partitioning. `time` must be integral;
    * `id` breaks equal-time ties deterministically. */
  def timeWeightedAvg(
      df: DataFrame,
      key: String,
      time: String,
      id: String,
      valueCol: String): DataFrame = {
    // same collision hazard as sessionize's __prev: withColumn replaces
    require(!df.columns.contains("__nt") && !df.columns.contains("__dt"),
      "timeWeightedAvg uses '__nt'/'__dt' as temporary columns; rename those input columns")
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(id))
    df.withColumn("__nt", lead(col(time), 1).over(w))
      .withColumn("__dt", (col("__nt") - col(time)).cast("double"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        (sum(col(valueCol) * col("__dt")) / sum(col("__dt"))).as("twa"),
        (max(col(time)) - min(col(time))).as("span"))
  }

  /** Fixed-interval OHLC downsampling (open/high/low/close bars — the
    * canonical time-series compaction: per key and `barWidth`-sized time
    * bucket, the first and last observed value plus the extremes and
    * count). `open`/`close` are argmin/argmax picks under the total
    * (time, id) order — `min_by`/`max_by` over a STRUCT ordering key, so
    * equal-time ties are deterministic on any engine and any
    * partitioning.
    *
    * ONE exchange: a single aggregate on (key, bucket) with map-side
    * partial min_by/max_by/min/max/count — no window. (Struct-keyed
    * min_by buffers aren't hash-agg mutable, so Spark plans
    * SortAggregate; its sorts are per-partition on the small group key,
    * never a global order — pinned by TemporalSpec.) That is the 100 TB
    * shape: bars are constant-size state per group however many raw
    * rows a bucket holds, and the partial aggregation collapses each
    * map partition before the shuffle. `time` must be an integral epoch
    * column; `barWidth` shares its unit. Bucketing is FLOOR-division
    * (`t - pmod(t, w)` — exact integer arithmetic), so negative
    * (pre-1970) epochs land in their true bar, matching the oracle's
    * `//` semantics, instead of rounding toward zero. */
  def ohlcBars(
      df: DataFrame,
      key: String,
      time: String,
      id: String,
      valueCol: String,
      barWidth: Long): DataFrame = {
    require(barWidth > 0, s"ohlcBars needs barWidth > 0, got $barWidth")
    // same collision hazard as sessionize's __prev: withColumn replaces
    require(!df.columns.contains("__bucket"),
      "ohlcBars uses '__bucket' as a temporary column; rename that input column")
    val ord = struct(col(time), col(id))
    df.withColumn("__bucket", expr(s"`$time` - pmod(`$time`, $barWidth)"))
      .groupBy(col(key), col("__bucket").as("bucket"))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Linear-interpolation grid resampling — the smooth twin of the
    * LOCF resample (tp03): for every `(key, time)` grid point, the value
    * is interpolated between the key's bracketing observations:
    * `v = vp + (vn − vp)·(t − tp)/(tn − tp)`. Before a key's first
    * observation the value is null; after its last it holds (LOCF tail);
    * a grid point coinciding with an observation returns that
    * observation exactly (the `t == tp` branch also keeps the
    * denominator away from zero).
    *
    * `obs` must be `(key, time, value)` with one row per (key, time) —
    * pre-aggregate duplicates (e.g. `max_by(value, id)`) so the bracket
    * is well-defined. `grid` is `(key, time)`.
    *
    * Plan: tag + union both inputs, then TWO window passes over the SAME
    * (key) partitioning and (time, obs-first) ordering — a running
    * `last(…, ignoreNulls)` for the previous observation and a
    * `first(…, ignoreNulls)` over the following frame for the next — so
    * the whole operator costs ONE shuffle on the key, like asofJoin;
    * a LATERAL/theta formulation would probe per grid point. Returns
    * `(key, time, value)` for the grid rows. `time` must be integral.
    */
  def resampleLinear(
      obs: DataFrame,
      grid: DataFrame,
      key: String,
      time: String,
      valueCol: String): DataFrame = {
    val u = obs.select(col(key), col(time), lit(1).as("__obs"),
        col(valueCol).cast("double").as("__v"))
      .unionByName(grid.select(col(key), col(time), lit(0).as("__obs"),
        lit(null).cast("double").as("__v")))
    // obs rows sort BEFORE grid rows at equal times, so a coincident
    // observation is this grid point's "previous" and t == tp fires
    val order = Seq(col(time), col("__obs").desc)
    val wPrev = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsOnly = (c: org.apache.spark.sql.Column) =>
      when(col("__obs") === 1, c)
    u.withColumn("__vp", last(obsOnly(col("__v")), ignoreNulls = true).over(wPrev))
      .withColumn("__tp", last(obsOnly(col(time)), ignoreNulls = true).over(wPrev))
      .withColumn("__vn", first(obsOnly(col("__v")), ignoreNulls = true).over(wNext))
      .withColumn("__tn", first(obsOnly(col(time)), ignoreNulls = true).over(wNext))
      .filter(col("__obs") === 0)
      .select(col(key), col(time),
        when(col("__tp").isNull, lit(null).cast("double"))
          .when(col(time) === col("__tp"), col("__vp"))
          .when(col("__tn").isNull, col("__vp"))
          .otherwise(col("__vp") + (col("__vn") - col("__vp")) *
            (col(time) - col("__tp")).cast("double") /
            (col("__tn") - col("__tp")).cast("double"))
          .as("value"))
  }

  /** Banded interval self-join: all ordered pairs (a, b) of rows sharing
    * `key` with `b.time` in (a.time, a.time + band], plus equal-time
    * pairs ordered by `id` so each unordered pair appears exactly once.
    * Returns (key, id_a, id_b, dt) with dt = b.time - a.time.
    *
    * The naive formulation is a theta-join Spark can only execute as a
    * nested loop. Blocking by `band`-sized time buckets turns it into an
    * equi-join: b can only fall in a's bucket or the next one, so the
    * a-side explodes to those two bucket ids and the join key becomes
    * (key, bucket) with the exact range predicate left as a residual
    * filter. At 100 TB that is one 2×-exploded shuffle into a hash join —
    * candidate pairs are bounded by co-bucketed rows, never |A|×|B|.
    * Each true pair matches exactly once (b's bucket is unique).
    *
    * `time` must be an integral epoch column; `band` shares its unit.
    */
  def bandedIntervalSelfJoin(
      df: DataFrame,
      key: String,
      time: String,
      id: String,
      band: Long): DataFrame = {
    // band = 0 would make the bucket `div` yield NULL (non-ANSI mode) and
    // silently return an empty join; negative bands are silently wrong
    require(band > 0, s"bandedIntervalSelfJoin needs band > 0, got $band")
    val a = df.select(
      col(key).as("__ka"), col(time).as("__ta"), col(id).as("id_a"),
      explode(array(expr(s"$time div $band"), expr(s"$time div $band") + 1)).as("__blk"))
    val b = df.select(
      col(key).as("__kb"), col(time).as("__tb"), col(id).as("id_b"),
      expr(s"$time div $band").as("__blkb"))
    a.join(b,
        col("__ka") === col("__kb") && col("__blk") === col("__blkb") &&
          col("__tb") <= col("__ta") + band &&
          (col("__tb") > col("__ta") ||
            (col("__tb") === col("__ta") && col("id_b") > col("id_a"))))
      .select(col("__ka").as(key), col("id_a"), col("id_b"),
        (col("__tb") - col("__ta")).as("dt"))
  }
}
