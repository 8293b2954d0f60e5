package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Pipelines
import graft.streaming.Pipelines.Event

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling window counts over a memory stream") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Pipelines.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(10), 1L, "view", 2.0),
        Event(ts(61), 2L, "click", 3.0),
        // watermark pusher: 4h later closes earlier windows
        Event(ts(240), 3L, "view", 4.0))
      q.processAllAvailable()
      mem.addData(Event(ts(300), 3L, "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("tumbling")
        .orderBy("win_start", "event_type").collect()
      assert(out.length >= 2)
      val first = out(0)
      assert(first.getAs[Long]("n") === 2L) // two views in hour 10
      assert(first.getAs[Double]("sum_value") === 3.0)
    } finally q.stop()
  }

  test("per-window top-k ranks the streamed sink ≡ batch topkWindow") {
    // stream_topk_window's composition claim: the windowed count is
    // the streaming stage; the rank runs DOWNSTREAM of the sink. Drive
    // the same rows through tumblingCounts → memory sink, rank the
    // sink table with the identical window expression, and pin
    // equality with the batch rank over a one-shot aggregate.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rows = Seq(
      Event(ts(0), 1L, "view", 1.0), Event(ts(5), 2L, "view", 1.0),
      Event(ts(10), 1L, "click", 1.0), Event(ts(20), 3L, "click", 1.0),
      Event(ts(30), 4L, "click", 1.0), Event(ts(40), 5L, "buy", 1.0),
      Event(ts(50), 6L, "scroll", 1.0), // 5 types: one must miss top-3
      Event(ts(70), 1L, "view", 1.0),
      // watermark pusher closes both populated hours
      Event(ts(300), 9L, "view", 1.0))
    val mem = MemoryStream[Event]
    val q = Pipelines.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("topk_src")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      def rank3(df: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("win_start").orderBy(col("n").desc, col("event_type"))
        df.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("win_start", "rnk", "event_type", "n")
          .orderBy("win_start", "rnk")
      }
      val streamed = rank3(spark.table("topk_src")).collect()
      // the pusher's own window never finalizes in append mode (nothing
      // advances the watermark past it) — the batch twin covers the
      // CLOSED windows, so it aggregates everything except the pusher
      val batch = rank3(rows.dropRight(1).toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n")))
        .collect()
      assert(streamed.nonEmpty)
      assert(streamed.map(_.toString).toSeq === batch.map(_.toString).toSeq)
      // the 4-type hour must have been cut to 3 (top-k actually binds)
      val perWindow = streamed.groupBy(_.getAs[Timestamp]("win_start"))
      assert(perWindow.values.forall(_.length <= 3))
      assert(perWindow.values.exists(_.length == 3),
        "no window exercised the k cut")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Pipelines.sessionizeWithState(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart, then a 40-min gap → 2 sessions
      mem.addData(
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(5), 1L, "click", 2.0),
        Event(ts(45), 1L, "view", 3.0))
      // Poll the sink rather than processAllAvailable(): pending
      // processing-time timeouts keep scheduling batches, which can
      // starve processAllAvailable indefinitely.
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("sessions").count() < 1
          && System.currentTimeMillis() < deadline) Thread.sleep(250)
      val out = spark.table("sessions").collect()
      // first session (2 events) closed by the in-batch gap
      assert(out.length === 1)
      assert(out(0).getAs[Long]("n_events") === 2L)
      assert(out(0).getAs[Double]("sum_value") === 3.0)
    } finally q.stop()
  }

  test("typed flatMapGroups sessions ≡ native session_window rollup") {
    // two independent implementations of the same 30-min gap semantics:
    // the TYPED imperative path (groupByKey → flatMapGroups, the
    // batch-finalized sessionizeWithState) must agree row-for-row with
    // a rollup of the declarative session_window operator
    import org.apache.spark.sql.functions._
    val typed = graft.operators.StreamingBatch
      .statefulSessions(spark, sf0001).collect().map(_.toString)
    val declarative = graft.operators.StreamingBatch
      .sessionWindow(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_sess_events"),
        max(col("end_us") - col("start_us") - lit(1800000000L))
          .as("max_sess_span_us"),
        round(sum("sum_value"), 2).as("sum_value"))
      .orderBy("user_id").collect().map(_.toString)
    assert(typed.nonEmpty)
    assert(typed === declarative)
  }

  test("streaming dedup drops cross-batch duplicates, state is bounded") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(minute: Int) = new Timestamp(base + minute * 60000L)
    val mem = MemoryStream[Event]
    val q = Pipelines.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(at(0), 1L, "view", 1.0),
        Event(at(0), 1L, "view", 1.0), // in-batch duplicate
        Event(at(5), 2L, "click", 2.0))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark window → dropped
      mem.addData(
        Event(at(10), 1L, "view", 1.0),
        Event(at(15), 3L, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("dedupstream").count() === 3) // 1,2,3 once each
      // advance event time far past the watermark, then the ORIGINAL
      // key again: state was evicted, so it is re-admitted — dedup
      // holds within the horizon, state does not grow forever
      mem.addData(Event(at(24 * 60), 9L, "view", 9.0))
      q.processAllAvailable()
      mem.addData(Event(at(24 * 60 + 5), 1L, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedupstream").count() === 5)
      val st = q.lastProgress.stateOperators(0).numRowsTotal
      assert(st <= 4, s"dedup state not evicted: $st rows")
    } finally q.stop()
  }

  test("streaming near-dup catches planted pairs in-stream, evicts state") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(minute: Int) = new Timestamp(base + minute * 60000L)
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearA = words + " lambda"
    val farDoc = "one two three four five six seven eight nine ten eleven"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = Pipelines.nearDupStream(
        mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      mem.addData((at(0), 1L, words), (at(1), 3L, farDoc))
      q.processAllAvailable()
      // the near-dup arrives a BATCH LATER: bucket anchors must persist
      mem.addData((at(5), 2L, nearA))
      q.processAllAvailable()
      val pairs = spark.table("neardup")
        .select("a_id", "b_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"planted near-dup missed: $pairs")
      assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
        s"dissimilar doc flagged: $pairs")
      // event time jumps a day: watermark passes every bucket horizon,
      // state (64 band anchors per doc) must be evicted, and a re-sent
      // near-dup is re-admitted as a fresh anchor (no emission)
      mem.addData((at(24 * 60), 9L, farDoc + " twelve"))
      q.processAllAvailable()
      mem.addData((at(24 * 60 + 1), 10L, words))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators(0).numRowsTotal
      assert(st <= 130, s"near-dup state not evicted: $st buckets")
      assert(!spark.table("neardup").collect()
        .exists(r => r.getLong(1) === 10L),
        "doc 10 matched an anchor that should have been evicted")
    } finally q.stop()
  }

  test("streaming near-dup end-to-end: candidates → exact verify = batch LSH") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(minute: Int) = new Timestamp(base + minute * 60000L)
    // two true near-dup pairs (1,2) and (3,4), one moderate-similarity
    // pair (1,5): jaccard 5/15 ≈ 0.33 — enough signature agreement to
    // collide in some of the 64 bands (a FALSE candidate) but below the
    // 0.5 verify threshold, and one unrelated doc
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu",
      3L -> "one two three four five six seven eight nine ten eleven twelve",
      4L -> "one two three four five six seven eight nine ten eleven thirteen",
      5L -> "alpha beta gamma delta epsilon zeta eta other words entirely now here",
      6L -> "completely different vocabulary sharing nothing with any neighbour doc")
    // batch reference: the SAME corpus through dedup_minhash_lsh
    // (Scratch-rooted so the shutdown hook deletes it — no temp leak)
    val dir = graft.ops.Scratch.dir("neardup-e2e")
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.operators.Dedup.minhashLsh(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 2L), (3L, 4L)), s"unexpected batch result: $batch")
    // stream the corpus across two micro-batches (anchors must persist)
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = Pipelines.nearDupStream(mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_e2e")
      .outputMode("append").start()
    try {
      mem.addData(texts.take(3).map { case (id, t) => (at(id.toInt), id, t) }: _*)
      q.processAllAvailable()
      mem.addData(texts.drop(3).map { case (id, t) => (at(id.toInt), id, t) }: _*)
      q.processAllAvailable()
      val cands = spark.table("neardup_e2e").select("a_id", "b_id").distinct()
      val candSet = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(candSet.contains((1L, 5L)),
        s"moderate-similarity false candidate not emitted: $candSet")
      // downstream exact verification against the doc store: confirmed
      // pairs equal the batch operator's result; false candidates drop
      val confirmed = graft.operators.Dedup
        .verifyCandidates(cands, texts.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(confirmed === batch,
        s"stream-verified $confirmed != batch $batch")
    } finally q.stop()
  }

  test("sliding window stream equals the batch hopping-window agg") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Pipelines.slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    // events inside 10:00-11:30, split across two micro-batches, then a
    // +6h watermark pusher so every window over them finalizes
    // (watermark = 16:00 - 2h = 14:00 > last window end 12:30)
    val data = Seq(
      Event(ts(0), 1L, "view", 1.0), Event(ts(10), 2L, "view", 2.0),
      Event(ts(20), 1L, "click", 3.0), Event(ts(65), 3L, "view", 4.0),
      Event(ts(90), 2L, "click", 5.0))
    try {
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*)
      q.processAllAvailable()
      mem.addData(Event(ts(360), 9L, "pusher", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sliding")
        .filter(col("event_type") =!= "pusher")
        .select(col("win_start"), col("event_type"), col("n"),
          col("sum_value"))
      // batch twin: the SAME rows through the SAME window expression
      val batch = data.toDS().toDF()
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
      assert(streamed.exceptAll(batch).isEmpty
          && batch.exceptAll(streamed).isEmpty,
        "stream-finalized hopping windows != batch hopping windows")
      // sanity: each event really landed in 4 overlapping windows
      assert(batch.agg(sum("n")).head().getLong(0) === data.length * 4L)
    } finally q.stop()
  }

  test("sliding distinct-user stream ≡ batch sketch; sketch tracks exact") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Pipelines.slidingDistinctCounts(mem.toDF())
      .writeStream.format("memory").queryName("sliding_distinct")
      .outputMode("append").start()
    // user 1 repeats within a window (counts once); user 2 spans two
    // slide buckets of one window (still counts once)
    val data = Seq(
      Event(ts(0), 1L, "view", 1.0), Event(ts(5), 1L, "view", 2.0),
      Event(ts(10), 2L, "view", 3.0), Event(ts(25), 2L, "click", 4.0),
      Event(ts(70), 3L, "view", 5.0))
    try {
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*)
      q.processAllAvailable()
      mem.addData(Event(ts(360), 9L, "pusher", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sliding_distinct")
        .filter(col("win_start") < Timestamp.valueOf("2024-01-01 16:00:00"))
      // the stream must equal the batch SKETCH twin exactly: HLL
      // registers are merge-order-insensitive, so micro-batching
      // cannot change the estimate
      val batchSketch = data.toDS().toDF()
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(approx_count_distinct(col("user_id"), 0.01)
          .as("n_users_approx"), count(lit(1)).as("n_events"))
        .select(col("window.start").as("win_start"),
          col("n_users_approx"), col("n_events"))
      assert(streamed.exceptAll(batchSketch).isEmpty
          && batchSketch.exceptAll(streamed).isEmpty,
        "streamed sliding distinct != batch approx twin")
      // and the sketch must be EXACT at this cardinality (≤ 2 users
      // per window): equality against true distinct, not just ≈
      val exact = data.toDS().toDF()
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count_distinct(col("user_id")).as("n_users_approx"),
          count(lit(1)).as("n_events"))
        .select(col("window.start").as("win_start"),
          col("n_users_approx"), col("n_events"))
      assert(streamed.exceptAll(exact).isEmpty,
        "sketch diverged from exact at trivial cardinality")
    } finally q.stop()
  }

  test("windowed dedup stream ≡ batch distinct-pair counts per window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    // the stream_dedup_window pipeline: dropDuplicates on
    // (window, user, type) behind a watermark, then per-window counts
    val q = mem.toDF()
      .withWatermark("ts", "2 hours")
      .withColumn("win", window(col("ts"), "1 hour"))
      .dropDuplicates("win", "user_id", "event_type")
      .groupBy("win")
      .agg(count(lit(1)).as("n_unique"))
      .select(col("win.start").as("win_start"), col("n_unique"))
      .writeStream.format("memory").queryName("dedupwin")
      .outputMode("append").start()
    val data = Seq(
      Event(ts(0), 1L, "view", 1.0),
      Event(ts(5), 1L, "view", 2.0), // in-batch dup pair
      Event(ts(10), 2L, "view", 3.0),
      Event(ts(70), 1L, "view", 4.0), // same pair, NEXT window: counts
      Event(ts(80), 1L, "click", 5.0))
    try {
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*) // cross-batch dup of (1, view, w0)
      q.processAllAvailable()
      mem.addData(Event(ts(360), 9L, "pusher", 0.0)) // finalize windows
      q.processAllAvailable()
      val streamed = spark.table("dedupwin")
        .filter(col("n_unique") > 0 && col("win_start") < ts(360))
      val batch = data.toDS().toDF()
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id"), col("event_type"))
          .as("n_unique"))
        .select(col("window.start").as("win_start"), col("n_unique"))
      assert(streamed.exceptAll(batch).isEmpty
          && batch.exceptAll(streamed).isEmpty,
        "stream-deduped window counts != batch countDistinct")
      // the duplicated pair collapsed in w0 (2 uniques), re-counted in w1
      assert(batch.orderBy("win_start").collect().map(_.getLong(1)).toSeq
        === Seq(2L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join emits the batch join's pairs") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Pipelines.intervalJoinStream(mem.toDF())
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    val data = Seq(
      Event(ts(0), 1L, "view", 1.0),
      Event(ts(30), 1L, "view", 2.0),
      Event(ts(45), 2L, "view", 3.0), // other user: must not match u1
      Event(ts(50), 1L, "purchase", 10.0), // ← views @0,@30 in window
      Event(ts(65), 2L, "purchase", 20.0), // ← view @45 in window
      Event(ts(130), 1L, "purchase", 30.0)) // >1h after u1 views: none
    try {
      // views and purchase arrive in DIFFERENT micro-batches: the join
      // must buffer the view side in state across batches
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("ivjoin")
      val batch = {
        val df = data.toDS().toDF()
        val v = df.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        df.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("value"))
          .join(v, col("user_id") === col("v_user")
            && col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
            && col("v_ts") < col("p_ts"))
          .select(col("user_id"), col("p_ts"), col("v_ts"), col("value"))
      }
      assert(streamed.exceptAll(batch).isEmpty
          && batch.exceptAll(streamed).isEmpty,
        "stream-stream interval join pairs != batch interval join pairs")
      // exactly the 3 expected pairs, and the no-prior-view purchase
      // emitted nothing
      assert(batch.count() === 3L)
    } finally q.stop()
  }

  test("late data: beyond-watermark rows drop, in-watermark rows update") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Pipelines.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("latedata")
      .outputMode("append").start()
    try {
      // hour-10 window gets 2 events; pusher advances wm to 14:00
      mem.addData(
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(10), 2L, "view", 2.0),
        Event(ts(360), 9L, "pusher", 0.0))
      q.processAllAvailable()
      // (a) BEYOND the watermark: 10:30 < wm 14:00 → must be dropped
      mem.addData(Event(ts(30), 3L, "view", 100.0))
      q.processAllAvailable()
      // (b) WITHIN the watermark: the 15:00 window (end 16:00 > wm) is
      // still open; a second event arriving a batch later must merge
      // into it before it finalizes
      mem.addData(Event(ts(300), 4L, "view", 7.0))
      q.processAllAvailable()
      mem.addData(Event(ts(310), 5L, "view", 8.0))
      q.processAllAvailable()
      // advance wm past 16:00 so the 15:00 window finalizes
      mem.addData(Event(ts(600), 9L, "pusher", 0.0))
      q.processAllAvailable()
      val views = spark.table("latedata")
        .filter(col("event_type") === "view")
        .select(col("win_start"), col("n"), col("sum_value")).collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      val hour10 = views.filter(_._1 === ts(0))
      // exactly one finalized emission, WITHOUT the dropped late row
      assert(hour10.toSeq === Seq((ts(0), 2L, 3.0)),
        s"beyond-watermark row not dropped cleanly: ${hour10.toSeq}")
      val hour15 = views.filter(_._1 === ts(300))
      // both in-watermark arrivals merged into the one open window
      assert(hour15.toSeq === Seq((ts(300), 2L, 15.0)),
        s"in-watermark late row did not update its window: ${hour15.toSeq}")
    } finally q.stop()
  }

  test("soak: watermark evicts window state across a 24h multi-batch run") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(minute: Int) = new Timestamp(base + minute * 60000L)
    val mem = MemoryStream[Event]
    val q = Pipelines.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("soak")
      .outputMode("append").start()
    try {
      var maxSteadyState = 0L
      (0 until 24).foreach { h =>
        mem.addData(
          Event(at(h * 60), (h % 5).toLong, "view", 1.0),
          Event(at(h * 60 + 30), (h % 3).toLong, "click", 2.0))
        q.processAllAvailable()
        val p = q.lastProgress
        if (h >= 6 && p != null && p.stateOperators.nonEmpty)
          maxSteadyState =
            math.max(maxSteadyState, p.stateOperators(0).numRowsTotal)
      }
      // 48 window-states were created over the run; the 2h watermark
      // must keep only the recent tail alive — retained state bounded,
      // not proportional to stream length
      assert(maxSteadyState > 0, "no state metrics reported")
      assert(maxSteadyState <= 12,
        s"state not evicted: $maxSteadyState rows retained")
      // ...and evicted windows were FINALIZED into the append sink
      assert(spark.table("soak").count() >= 40)
    } finally q.stop()
  }

  test("batch session_window equals lag-based sessionization on testdata") {
    val a = graft.operators.StreamingBatch.sessionWindow(spark, sf0001)
      .select("user_id", "start_us", "n_events")
    val b = graft.operators.LogAnalytics.sessionStats(spark, sf0001)
      .select(col("user_id"), col("start_us"), col("n_events"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("streaming quality gate scores ≡ batch logit stage, incl. filter") {
    // the ingest-gate claim: quality_logit_score's scoring stage is
    // stateless, so streamed scores must equal the batch run row-for-row
    // — including the n_tokens=0 drop (doc 4: punctuation only)
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "spam spam spam spam spam"),
      (3L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (4L, "!!! ??? 123 ..."),
      (5L, ("the and of to in a is it for on " * 30).trim))
    val mem = MemoryStream[(Long, String)]
    val q = Pipelines.qualityGateStream(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("qgate").orderBy("doc_id").collect()
      val batch = graft.operators.TextAnalysis
        .logitScoreStage(rows.toDF("doc_id", "text"))
        .orderBy("doc_id").collect()
      assert(streamed.length === 4, "zero-token doc must be dropped")
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming contamination monitor ≡ batch stage (complete mode)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // benchmark doc 1 (< 20) leaks its 5-gram into corpus docs 21/23;
    // doc 22 is clean; doc 24 is too short to emit any gram
    val bench5 = "alpha beta gamma delta epsilon"
    val corpus = Seq(
      (21L, "src1", s"intro words then $bench5 and a tail of more words"),
      (22L, "src1", "completely clean text with six tokens here today"),
      (23L, "src2", s"$bench5 twice over $bench5 ok"),
      (24L, "src2", "too short"))
    val benchDocs = Seq((1L, "bench", bench5 + " extra trailing tokens"))
    val all = (benchDocs ++ corpus).toDF("doc_id", "source", "text")
    val benchFrame = graft.operators.StreamingBatch.benchGramHashes(all)
      .localCheckpoint() // static side must not be a streaming plan
    val mem = MemoryStream[(Long, String, String)]
    val q = Pipelines.contaminationMonitorStream(
        mem.toDF().toDF("doc_id", "source", "text"), benchFrame)
      .writeStream.format("memory").queryName("contam")
      .outputMode("complete").start()
    try {
      mem.addData(corpus.take(2): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("contam").orderBy("source").collect()
      val batch = graft.operators.StreamingBatch.contaminationHitsStage(
          corpus.toDF("doc_id", "source", "text"), benchFrame)
        .orderBy("source").collect()
      assert(streamed.toSeq === batch.toSeq)
      // the leak is visible per source and the clean grams stay clean
      val bySource = streamed.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
      assert(bySource("src1")._2 > 0L, "src1 leak not detected")
      assert(bySource("src2")._2 > 0L, "src2 leak not detected")
      assert(bySource("src1")._2 < bySource("src1")._1,
        "clean grams were flagged")
    } finally q.stop()
  }

  test("streaming PIT features ≡ batch join; final snapshots ≡ batch snapshot") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.Pipelines.PitEvent
    // the REAL sf0.001 event stream, fed in event-time order across
    // three micro-batches — the arrival order the pipeline documents
    val evs = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("ts_us", "event_id").collect()
      .map(r => PitEvent(r.getLong(0),
        new java.sql.Timestamp(r.getLong(1) / 1000L), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[PitEvent]
    val q = Pipelines.pitFeatureStream(mem.toDS())
      .writeStream.format("memory").queryName("pitfeat")
      .outputMode("append").start()
    try {
      val third = evs.length / 3
      mem.addData(evs.take(third): _*)
      q.processAllAvailable()
      mem.addData(evs.slice(third, 2 * third): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2 * third): _*)
      q.processAllAvailable()
      val streamed = spark.table("pitfeat").orderBy("event_id")
        .collect().map(_.toString).toSeq
      val batch = graft.operators.Training
        .featurePitJoin(spark, sf0001).collect().map(_.toString).toSeq
      assert(streamed === batch,
        "streamed purchase features != batch PIT join")
      // the per-user LAST emitted row is the serving snapshot
      val lastPerUser = spark.table("pitfeat")
        .withColumn("rn", org.apache.spark.sql.functions.row_number()
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("day").desc, col("event_id").desc)))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("user_id").collect().map(_.toString).toSeq
      val snap = graft.operators.StreamingBatch
        .featureSnapshot(spark, sf0001)
        .select("event_id", "user_id", "day", "n_events_prior",
          "n_purchases_prior", "value_centi_prior", "days_active_prior")
        .orderBy("user_id").collect().map(_.toString).toSeq
      assert(lastPerUser === snap,
        "streaming snapshot state != batch snapshot query")
    } finally q.stop()
  }

  test("streaming upsert-latest: final state ≡ batch pick under adversarial arrival order") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.Pipelines.PitEvent
    // REVERSE event-time arrival — every event is "late" relative to
    // the previous one; the latest-wins fold must not care
    val evs = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("ts_us").desc, col("event_id").desc).collect()
      .map { r =>
        val us = r.getLong(1)
        val t = new java.sql.Timestamp(us / 1000L)
        t.setNanos((us % 1000000L).toInt * 1000) // keep µs precision
        PitEvent(r.getLong(0), t, r.getLong(2), r.getString(3),
          r.getDouble(4))
      }
    val mem = MemoryStream[PitEvent]
    val q = Pipelines.upsertLatestStream(mem.toDS())
      .writeStream.format("memory").queryName("upsertlatest")
      .outputMode("update").start()
    try {
      val third = evs.length / 3
      mem.addData(evs.take(third): _*)
      q.processAllAvailable()
      mem.addData(evs.slice(third, 2 * third): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2 * third): _*)
      q.processAllAvailable()
      // emitted snapshots grow monotonically in (ts_us, event_id), so
      // the final state per user is the max emitted row
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val finals = spark.table("upsertlatest")
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val batchPick = graft.sources.Tables.events(spark, sf0001)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("value_centi"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .select("user_id", "ts_us", "event_id", "event_type", "value_centi")
      assert(finals.select("user_id", "ts_us", "event_id", "event_type",
          "value_centi").orderBy("user_id").collect().map(_.toString).toSeq ===
        batchPick.orderBy("user_id").collect().map(_.toString).toSeq,
        "streamed final state != batch latest-wins pick")
      // and the rollup of finals ≡ the oracle-checked batch query
      val rolled = finals.groupBy("event_type")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_users"),
          org.apache.spark.sql.functions.sum("value_centi")
            .as("value_centi_mass"),
          org.apache.spark.sql.functions.max("ts_us").as("latest_ts_us"))
        .orderBy("event_type").collect().map(_.toString).toSeq
      val batchQuery = graft.operators.StreamingBatch
        .upsertLatest(spark, sf0001).collect().map(_.toString).toSeq
      assert(rolled === batchQuery,
        "rollup of streamed finals != stream_upsert_latest")
    } finally q.stop()
  }

  test("streaming attribution: per-purchase touches ≡ batch window, " +
      "rollup ≡ log_attribution") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.Pipelines.TouchEvent
    val evs = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_id", "ts_us", "user_id", "event_type",
        "cast(round(value * 100) as bigint) as v_centi")
      .collect()
      .map(r => TouchEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
      .sortBy(e => (e.ts_us, e.event_id))
    val mem = MemoryStream[TouchEvent]
    val q = Pipelines.attributionStream(mem.toDS())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      val third = evs.length / 3
      mem.addData(evs.take(third): _*)
      q.processAllAvailable()
      mem.addData(evs.slice(third, 2 * third): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2 * third): _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib").collect()
        .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3),
          r.getLong(4)))).toMap
      val batch = graft.operators.LogAnalytics
        .attributionTouches(spark, sf0001).collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[String]("first_touch"),
            r.getAs[String]("last_touch"),
            r.getAs[Long]("v_centi")))).toMap
      assert(streamed.size === batch.size,
        "stream must emit exactly one row per purchase")
      assert(streamed === batch,
        "streamed attribution != batch window attribution")
      // rolled-up stream ≡ the published report
      val rolled = spark.table("attrib")
        .selectExpr("v_centi",
          "explode(array(struct('first' as model, first_touch as touch_type)," +
            " struct('last' as model, last_touch as touch_type))) as m")
        .groupBy("m.model", "m.touch_type")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_conversions"),
          org.apache.spark.sql.functions.sum("v_centi").as("value_centi"))
        .orderBy("model", "touch_type")
        .collect().map(_.toString).toSeq
      val report = SparkEntry.queries("log_attribution")(spark, sf0001)
        .collect().map(_.toString).toSeq
      assert(rolled === report,
        "stream rollup != log_attribution report")
    } finally q.stop()
  }

  test("streaming lateness gauge: per-event lateness ≡ batch window " +
      "across micro-batch boundaries") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.Pipelines.ArrEvent
    // the documented simulated arrival sequence, fed in ARRIVAL order
    val batch = graft.operators.LogAnalytics
      .latenessFrame(spark, sf0001)
      .select("user_id", "event_id", "ts_us", "arr", "late_us")
      .collect()
    val evs = batch.sortBy(r => (r.getLong(3), r.getLong(1))).map { r =>
      val us = r.getLong(2)
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      ArrEvent(r.getLong(1), r.getLong(3), t, r.getLong(0))
    }
    val mem = MemoryStream[ArrEvent]
    val q = Pipelines.latenessStream(mem.toDS())
      .writeStream.format("memory").queryName("lateness")
      .outputMode("append").start()
    try {
      val third = evs.length / 3
      mem.addData(evs.take(third): _*)
      q.processAllAvailable()
      mem.addData(evs.slice(third, 2 * third): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2 * third): _*)
      q.processAllAvailable()
      val streamed = spark.table("lateness")
        .select("event_id", "late_us").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = batch
        .map(r => r.getLong(1) -> r.getLong(4)).toMap
      assert(streamed.size === expected.size,
        "stream must emit exactly one lateness row per event")
      assert(streamed === expected,
        "streamed per-event lateness != batch running-max window")
      assert(streamed.values.exists(_ > 0L),
        "fixture must exercise nonzero lateness (delay rule dead?)")
    } finally q.stop()
  }

  test("doc refresh tick: stream-refreshed chains ≡ batch rebuild for " +
      "every family; serving confs point at the heads") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tickdoc").toString
    val root = s"$dir/chain"
    // table of record starts with the old half; near-dup structure
    // straddles the stream boundary (doc 3 near-dups doc 0)
    Seq(0L -> "alpha beta gamma delta epsilon zeta",
        1L -> "one two three four five six")
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val st = Pipelines.initDocRefresh(spark, dir, root)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.foreachBatch(Pipelines.docRefreshTick(st) _).start()
    try {
      mem.addData((2L, "seven eight nine ten eleven"))
      q.processAllAvailable()
      mem.addData((3L, "alpha beta gamma delta epsilon eta"),
        (4L, "twelve thirteen fourteen"))
      q.processAllAvailable()
    } finally q.stop()
    // the table of record absorbed every tick
    assert(graft.sources.Tables.documents(spark, dir).count() === 5L)
    // minhash chain serve ≡ the in-query pair set over the final
    // corpus (which must include the cross-boundary near-dup)
    val served = graft.operators.Dedup
      .minhashServe(spark, dir, st.head("minhash"))
      .collect().map(_.toString).toSeq
    val full = graft.operators.Dedup.minhashLsh(spark, dir)
      .collect().map(_.toString).toSeq
    assert(served === full, "tick minhash chain != batch pair set")
    assert(served.nonEmpty, "fixture must plant a cross-tick near-dup")
    // simhash chain ≡ rebuild (compare banded rows content)
    val chainBands = graft.ops.Materialize.chainRead(spark,
        st.head("simhash"), dir, "bands",
        Seq("doc_id", "sig", "k", "bh"))
      .collect().map(_.toString).sorted.toSeq
    val rebuilt = graft.operators.Dedup.simhashBanded(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(chainBands === rebuilt, "tick simhash chain != rebuild")
    // lexical: serving conf flipped to the head, and bm25_from_index
    // served off the refreshed chain equals the in-query BM25
    assert(spark.conf.get("graft.lex.indexPath") === st.head("lex"))
    try {
      val servedBm = graft.operators.Retrieval
        .queries("bm25_from_index")(spark, dir)
        .collect().map(_.toString).toSeq
      val fullBm = graft.operators.Retrieval
        .queries("bm25_topk")(spark, dir)
        .collect().map(_.toString).toSeq
      assert(servedBm === fullBm, "tick lexical chain != in-query BM25")
    } finally spark.conf.unset("graft.lex.indexPath")
    spark.conf.unset("graft.minhash.oldIndexPath")
    spark.conf.unset("graft.simhash.oldIndexPath")
  }

  test("event refresh tick: stream-refreshed feature store ≡ batch " +
      "PIT join; late events refuse") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tickev").toString
    val dayNs = 86400L * 1000000000L
    def ev(id: Long, day: Long, user: Long, typ: String, v: Double) =
      (id, day * dayNs + id * 1000000000L, user, typ, v, "{}")
    // seed days 0-1 in the table of record
    Seq(ev(1, 0, 1, "view", 1.0), ev(2, 0, 1, "purchase", 2.0),
        ev(3, 1, 1, "view", 3.0), ev(4, 1, 2, "purchase", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val st = Pipelines.initEventRefresh(spark, dir, s"$dir/chain")
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val q = mem.toDS()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .writeStream.foreachBatch(Pipelines.eventRefreshTick(st) _).start()
    try {
      mem.addData(ev(5, 2, 1, "purchase", 5.0))
      q.processAllAvailable()
      mem.addData(ev(6, 3, 2, "purchase", 6.0), ev(7, 3, 1, "view", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    // serving conf points at the head; the PIT join served off the
    // stream-refreshed chain equals the in-query windows over the
    // final events table (purchases from the stream included)
    assert(spark.conf.get("graft.features.storePath") ===
      st.head("features"))
    try {
      val servedF = graft.operators.Training
        .queries("feature_pit_from_index")(spark, dir)
        .collect().map(_.toString).toSeq
      val fullF = graft.operators.Training
        .queries("feature_pit_join")(spark, dir)
        .collect().map(_.toString).toSeq
      assert(servedF === fullF, "tick feature chain != in-query PIT")
      assert(servedF.length >= 4,
        "streamed purchases must appear in the served features")
    } finally spark.conf.unset("graft.features.storePath")
    // a LATE event (day ≤ stored max_day) refuses loudly
    val late = Seq(ev(8, 1, 2, "view", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[Exception] {
      Pipelines.eventRefreshTick(st)(late, 99L)
    }
    assert(e.getMessage.contains("max_day") ||
      e.getMessage.contains("checksum") || e.getMessage.contains("slice"),
      s"late tick must refuse via admission, got: ${e.getMessage}")
  }

  test("doc refresh tick is idempotent under at-least-once replay: " +
      "full replay no-ops, a torn generation sweeps, a marker-present " +
      "landing skips, a marker-less committed replay frontier-filters") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tickidem").toString
    val root = s"$dir/chain"
    Seq(0L -> "alpha beta gamma delta epsilon zeta",
        1L -> "one two three four five six")
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val st = Pipelines.initDocRefresh(spark, dir, root)
    try {
      def corpusN = graft.sources.Tables.documents(spark, dir).count()
      def heads = Seq("lex", "minhash", "simhash").map(st.head)
      def served = graft.operators.Dedup
        .minhashServe(spark, dir, st.head("minhash"))
        .collect().map(_.toString).toSeq
      val b0 = Seq(2L -> "seven eight nine ten eleven",
          3L -> "alpha beta gamma delta epsilon eta")
        .toDF("doc_id", "text")
      Pipelines.docRefreshTick(st)(b0, 0L)
      val (n1, h1, s1) = (corpusN, heads, served)
      // 1. FULL same-batchId replay (the advisor's failure scenario's
      // tail case): marker present → landing skipped; generations
      // committed → adopted. Nothing moves.
      Pipelines.docRefreshTick(st)(b0, 0L)
      assert(corpusN === n1, "full replay double-landed the batch")
      assert(heads === h1 && served === s1)
      // 2. marker-LESS replay of a fully committed batch (cross-run
      // shape): the frontier filter drops already-indexed ids.
      assert(new java.io.File(root, "landed-b0").delete())
      Pipelines.docRefreshTick(st)(b0, 0L)
      assert(corpusN === n1, "frontier filter failed: rows re-landed")
      assert(heads === h1 && served === s1)
      // 3. TORN generation left by a crashed attempt (dir without the
      // provenance sidecar) sweeps and rebuilds; 4. a marker-present
      // landing (crash AFTER landing+marker, before generations)
      // skips the append but still writes generations.
      val b1 = Seq(4L -> "twelve thirteen fourteen fifteen sixteen")
        .toDF("doc_id", "text")
      b1.write.mode("append").parquet(s"$dir/documents.parquet")
      new java.io.File(root, "landed-b1").createNewFile()
      val torn = new java.io.File(root, "minhash-g2")
      torn.mkdirs()
      new java.io.File(torn, "leftover").createNewFile()
      Pipelines.docRefreshTick(st)(b1, 1L)
      assert(corpusN === n1 + 1,
        "marker-present landing must skip the append, not duplicate")
      assert(graft.ops.ArtifactTag
        .readProps(spark, s"$root/minhash-g2").contains("prov_ver"),
        "torn generation was not swept and rebuilt")
      assert(!new java.io.File(torn, "leftover").exists(),
        "torn leftover survived the sweep")
      // the recovered chain still serves ≡ the batch rebuild
      val full = graft.operators.Dedup.minhashLsh(spark, dir)
        .collect().map(_.toString).toSeq
      assert(served === full, "recovered tick chain != batch pair set")
    } finally {
      spark.conf.unset("graft.lex.indexPath")
      spark.conf.unset("graft.minhash.oldIndexPath")
      spark.conf.unset("graft.simhash.oldIndexPath")
    }
  }

  test("tick landing is atomic-rename idempotent: re-landing the same " +
      "batchId without a marker is a no-op (the round-14 disclosed " +
      "append↔marker window, now closed), torn staging sweeps") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-land").toString
    Seq(1L -> "a").toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val st = Pipelines.refreshStateForTest(spark, dir, s"$dir/chain")
    val batch = Seq(2L -> "b", 3L -> "c").toDF("doc_id", "text")
    Pipelines.landIdempotent(st, batch, "documents.parquet",
      "ingest-b0.parquet")
    def n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(n === 3)
    // the previously-fatal window: landing done, crash BEFORE the
    // marker write, replay re-runs the landing with NO marker and NO
    // committed generation to frontier-filter on — the deterministic
    // target name alone must make it a no-op
    Pipelines.landIdempotent(st, batch, "documents.parquet",
      "ingest-b0.parquet")
    assert(n === 3, "marker-less re-landing double-landed the batch")
    // a torn staging directory from a crashed attempt sweeps and the
    // landing completes
    val torn = new java.io.File(s"$dir/chain/_land-ingest-b1.parquet")
    torn.mkdirs()
    new java.io.File(torn, "junk").createNewFile()
    Pipelines.landIdempotent(st, Seq(4L -> "d").toDF("doc_id", "text"),
      "documents.parquet", "ingest-b1.parquet")
    assert(n === 4, "torn staging blocked the landing")
    assert(!new java.io.File(torn, "junk").exists(),
      "torn staging leftover survived")
  }

  test("vec refresh tick: stream-refreshed IVF/PQ chains ≡ the batch " +
      "one-append chains (frozen assignment is per-vector, so tick " +
      "count cannot change content); full replay no-ops") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    graft.plans.GraftFunctions.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tickvec").toString
    val root = s"$dir/chain"
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
    val b = vecs.agg(min("vec_id"), max("vec_id")).head()
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    vecs.filter(col("vec_id") < cut)
      .write.parquet(s"$dir/embeddings.parquet")
    val st = Pipelines.initVecRefresh(spark, dir, root)
    val newHalf = vecs.filter(col("vec_id") >= cut)
    val newRows = newHalf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cut2 = (cut + b.getLong(1)) / 2
    val (nb0, nb1) = newRows.partition(_._1 < cut2)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDS()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
      .writeStream.foreachBatch(Pipelines.vecRefreshTick(st) _).start()
    try {
      mem.addData(nb0.toSeq: _*)
      q.processAllAvailable()
      mem.addData(nb1.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val n = vecs.count()
    // the table of record absorbed every tick
    assert(graft.sources.Tables.embeddings(spark, dir).count() === n)
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("vec_id").collect().map(_.toString).toSeq
    // IVF: chain covers every vector once; its (vec_id, cid) rows ≡
    // g0 build ∪ ONE frozen assignment of the whole new half — the
    // batch `ann_ivf_append_refresh` chain's content
    val ivfChain = graft.ops.Materialize.chainRead(spark,
      st.head("ivf"), dir, "index", Seq("vec_id", "cid"))
    assert(ivfChain.count() === n, "ivf chain must cover every vector")
    assert(ivfChain.select("vec_id").distinct().count() === n,
      "ivf chain double-covered a vector")
    val cents = spark.read.parquet(s"$root/ivf-g0/centroids")
    val ivfBatchExpected = spark.read
      .parquet(s"$root/ivf-g0/index").select("vec_id", "cid")
      .unionAll(graft.operators.Similarity
        .ivfAssignFrozen(newHalf, cents).select("vec_id", "cid"))
    assert(sorted(ivfChain) === sorted(ivfBatchExpected),
      "stream-refreshed ivf chain != batch one-append chain")
    // PQ: code chain ≡ g0 codes ∪ one frozen encode of the new half
    val pqChain = graft.ops.Materialize.chainRead(spark,
      st.head("pq"), dir, "codes", Seq("vec_id", "sub", "code"))
    assert(pqChain.count() === n * 8L, "pq chain: 8 codes per vector")
    val cb = spark.read.parquet(s"$root/pq-g0/codebooks")
    val pqBatchExpected = spark.read
      .parquet(s"$root/pq-g0/codes").select("vec_id", "sub", "code")
      .unionAll(graft.operators.Similarity
        .pqEncodeFrozen(newHalf, cb).select("vec_id", "sub", "code"))
    def codeSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("vec_id", "sub").collect().map(_.toString).toSeq
    assert(codeSorted(pqChain) === codeSorted(pqBatchExpected),
      "stream-refreshed pq chain != batch one-append chain")
    // idempotency: a FULL same-batchId replay of the HEAD tick
    // (marker present, generations committed → adopted) moves
    // nothing — the docRefreshTick discipline on the vector side
    val heads1 = Seq("ivf", "pq").map(st.head)
    Pipelines.vecRefreshTick(st)(
      nb1.toSeq.toDF("vec_id", "embedding"), 1L)
    assert(graft.sources.Tables.embeddings(spark, dir).count() === n,
      "full replay double-landed the batch")
    assert(Seq("ivf", "pq").map(st.head) === heads1,
      "full replay moved a chain head")
  }
}
