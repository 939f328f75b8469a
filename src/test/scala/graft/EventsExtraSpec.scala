package graft

import graft.operators.{Events, TrainingOps}
import org.apache.spark.sql.functions._

/** Value-level semantics for the qs10/qs11/qd20/qd21 declared
  * queries on crafted inputs — the cases the synthetic corpus only
  * sometimes discriminates (exact-gap boundary, out-of-order funnel
  * events, same-second ties, degenerate texts).
  */
class EventsExtraSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: (Long, String, String, Double)*) =
    rows.toDF("user_id", "ts_s", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))

  test("qs23: each event lands in exactly its two covering sliding windows") {
    val ev = eventsOf(
      (1L, "2024-01-01 10:00:00", "view", 1.0),   // windows 09:00, 10:00
      (1L, "2024-01-01 10:59:59", "view", 2.0),   // windows 09:00, 10:00
      (1L, "2024-01-01 11:00:00", "view", 4.0))   // windows 10:00, 11:00
    val got = Events.slidingHourlyOn(ev).collect()
      .map(r => r.getAs[String]("wstart") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total_value")))).toMap
    assert(got == Map(
      "2024-01-01 09:00:00" -> ((2L, 3.0)),
      "2024-01-01 10:00:00" -> ((3L, 7.0)),
      "2024-01-01 11:00:00" -> ((1L, 4.0))),
      s"2h/1h epoch-aligned windows: $got")
  }

  test("qs10: an event exactly gap after its predecessor MERGES (boundary is > gap)") {
    val base = eventsOf(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-01 10:30:00", "view", 1.0)) // diff == 1800s
    assert(Events.sessionWindowOn(base, 30).count() == 1,
      "exact-gap event must stay in-session")
    val split = eventsOf(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-01 10:30:01", "view", 1.0)) // diff == 1801s
    assert(Events.sessionWindowOn(split, 30).count() == 2,
      "gap+1s must start a new session")
  }

  test("qs10: session end is last event + gap; value sums exactly") {
    val out = Events.sessionWindowOn(eventsOf(
      (1L, "2024-01-01 10:00:00", "view", 0.10),
      (1L, "2024-01-01 10:10:00", "click", 0.20)), 30).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("session_start") == "2024-01-01 10:00:00")
    assert(r.getAs[String]("session_end") == "2024-01-01 10:40:00")
    assert(r.getAs[Long]("n_events") == 2L)
    assert(r.getAs[Double]("session_value") == 0.30)
  }

  private def funnelCounts(rows: (Long, String, String)*): Map[String, Long] =
    Events.funnelOn(eventsOf(rows.map(r => (r._1, r._2, r._3, 0.0)): _*))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_user_days"))
      .toMap

  test("qs11: a click BEFORE the day's first view does not convert") {
    val m = funnelCounts(
      (1L, "2024-01-01 09:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"))
    assert(m("1_view") == 1L && m("2_view_click") == 0L &&
      m("3_view_click_purchase") == 0L)
  }

  test("qs11: a LATER click still converts after an early stray click") {
    val m = funnelCounts(
      (1L, "2024-01-01 09:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"))
    assert(m("1_view") == 1L && m("2_view_click") == 1L &&
      m("3_view_click_purchase") == 1L)
  }

  test("qs11: same-second view+click counts as ordered (documented tie rule)") {
    val m = funnelCounts(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"))
    assert(m("2_view_click") == 1L)
  }

  test("qs11: purchase must follow the first QUALIFYING click, not any click") {
    // purchase lands between the stray pre-view click and the
    // qualifying one -> must not convert stage 3
    val m = funnelCounts(
      (1L, "2024-01-01 09:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "purchase"),
      (1L, "2024-01-01 11:00:00", "click"))
    assert(m("2_view_click") == 1L && m("3_view_click_purchase") == 0L)
  }

  test("qs11: days are independent grains") {
    val m = funnelCounts(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-02 11:00:00", "click"))
    assert(m("1_view") == 2L && m("2_view_click") == 1L)
  }

  test("qs12: streaming session_window drain equals the batch form exactly") {
    val sf = "/root/testdata/sf0.001"
    val batch = Events.sessionWindow(spark, sf).collect().toSeq
    val stream = graft.streaming.SessionStream
      .sessionWindowGate(spark, sf).collect().toSeq
    assert(stream == batch,
      s"stream ${stream.length} rows vs batch ${batch.length}")
  }

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("qd20: all-distinct tokens give ttr 1.0; full repetition 1/n") {
    val out = TrainingOps.lexicalDiversityOn(docsOf(
        (1L, "alpha beta gamma delta"),
        (2L, "spam spam spam spam"),
        (3L, "...")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          Option(r.getAs[java.lang.Double]("ttr")))).toMap
    assert(out(1L) == ((4L, 4L, Some(1.0))))
    assert(out(2L) == ((4L, 1L, Some(0.25))))
    assert(out(3L) == ((0L, 0L, None)), "token-free text keeps NULL ttr")
  }

  test("qd23: text made of corpus-frequent bigrams scores lower avg_nll") {
    // doc 1 is pure 'aa' transitions (dominant in this corpus); doc 2
    // ends in the rare 'ab' — its average NLL must be strictly higher
    val got = TrainingOps.bigramLmOn(docsOf(
        (1L, "aaaaaaaaaa"), (2L, "aaaaaaaaab")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    assert(got(1L)._1 == 9L && got(2L)._1 == 9L)
    assert(got(1L)._2 < got(2L)._2,
      s"frequent-bigram text must score lower: $got")
    assert(got(1L)._2 > 0.0, "NLL of a non-certain model is positive")
  }

  test("qd21: entropy matches a pure-Scala reference under micro-nat quantization") {
    val texts = Seq(1L -> "aaaaaaaa", 2L -> "abababab", 3L -> "abcdefgh",
      4L -> "hello world, hello graft!")
    val got = TrainingOps.charEntropyOn(docsOf(texts: _*))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_distinct_chars"), r.getAs[Double]("entropy"))).toMap
    texts.foreach { case (id, t) =>
      val counts = t.groupBy(identity).view.mapValues(_.length.toLong)
      val n = t.length.toDouble
      val micro = counts.values.map { c =>
        math.floor((c / n) * math.log(c / n) * 1e6 + 0.5).toLong
      }.sum
      val want = -micro / 1e6
      assert(got(id)._1 == counts.size.toLong, s"doc $id distinct chars")
      assert(got(id)._2 == want, s"doc $id entropy: got ${got(id)._2}, want $want")
    }
    assert(got(1L)._2 == 0.0, "single-char text has zero entropy")
    assert(got(2L)._2 < got(3L)._2, "entropy grows with alphabet size")
  }

  test("qs13: delta is vs the previous PRESENT hour; first hour stays NULL") {
    val out = Events.hourlyDeltaOn(eventsOf(
        (1L, "2024-01-01 10:10:00", "click", 1.50),
        (1L, "2024-01-01 10:50:00", "click", 2.50), // hour 10: 4.00
        (1L, "2024-01-01 11:05:00", "click", 1.00), // hour 11: 1.00
        // hour 12 empty — the next delta skips to hour 13
        (1L, "2024-01-01 13:00:00", "click", 5.00),
        (1L, "2024-01-01 10:00:00", "view", 9.00)))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("hour")) ->
        (r.getAs[Double]("total"),
          Option(r.getAs[java.lang.Double]("delta")))).toMap
    assert(out(("click", "2024-01-01 10:00:00")) == ((4.0, None)))
    assert(out(("click", "2024-01-01 11:00:00")) == ((1.0, Some(-3.0))))
    assert(out(("click", "2024-01-01 13:00:00")) == ((5.0, Some(4.0))),
      "delta must be against the previous present hour, not the empty one")
    assert(out(("view", "2024-01-01 10:00:00")) == ((9.0, None)),
      "each type's first hour restarts the lag")
  }

  test("qs17: gaps synthesize spine hours, forward-fill carries the last present total") {
    val out = Events.gapFillOn(eventsOf(
        (1L, "2024-01-01 10:10:00", "click", 1.50),
        (1L, "2024-01-01 10:50:00", "click", 2.50), // hour 10: 4.00
        // hours 11, 12 silent
        (1L, "2024-01-01 13:00:00", "click", 5.00),
        (1L, "2024-01-01 11:00:00", "view", 9.00))) // view spine: just hour 11
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("hour")) ->
        (Option(r.getAs[java.lang.Double]("total")),
          r.getAs[Double]("filled"), r.getAs[Boolean]("was_gap")))
      .toMap
    assert(out.size == 5, "click spine has 4 hours, view spine 1")
    assert(out(("click", "2024-01-01 10:00:00")) == ((Some(4.0), 4.0, false)))
    assert(out(("click", "2024-01-01 11:00:00")) == ((None, 4.0, true)),
      "silent hour keeps NULL total but carries 4.0 forward")
    assert(out(("click", "2024-01-01 12:00:00")) == ((None, 4.0, true)))
    assert(out(("click", "2024-01-01 13:00:00")) == ((Some(5.0), 5.0, false)),
      "a present hour resets the fill")
    assert(out(("view", "2024-01-01 11:00:00")) == ((Some(9.0), 9.0, false)),
      "each type gets its own spine bounds")
  }

  test("qs18: cohorts are per-user first weeks; offsets count from each cohort") {
    // 2024-01-01 is a Monday: W0=01-01, W1=01-08, W2=01-15, W3=01-22
    val out = Events.retentionOn(eventsOf(
        (1L, "2024-01-03 10:00:00", "view", 0.0), // u1: cohort W0
        (1L, "2024-01-09 10:00:00", "view", 0.0), // u1 active W1
        (1L, "2024-01-22 10:00:00", "view", 0.0), // u1 active W3
        (2L, "2024-01-01 00:00:00", "view", 0.0), // u2: cohort W0 only
        (3L, "2024-01-14 23:59:59", "view", 0.0), // u3: cohort W1 (Sunday of W1)
        (3L, "2024-01-15 00:00:00", "view", 0.0))) // u3 active W2
      .collect().map(r => (r.getAs[String]("cohort"),
        r.getAs[Int]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1)) == ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 3)) == ((1L, 2L, 0.5)),
      "a skipped week leaves no offset-2 row")
    assert(!out.contains(("2024-01-01", 2)))
    assert(out(("2024-01-08", 0)) == ((1L, 1L, 1.0)),
      "u3's Sunday event lands in the Monday-started W1")
    assert(out(("2024-01-08", 1)) == ((1L, 1L, 1.0)))
    assert(out.size == 5)
  }

  private def idEventsOf(rows: (Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), lit("view").as("event_type"),
        col("value"))

  test("qs19: RANGE frame includes the exact-3600s bound and all same-second peers") {
    val out = Events.trailingHourOn(idEventsOf(
        (1L, 7L, "2024-01-01 10:00:00", 1.0),
        (2L, 7L, "2024-01-01 10:30:00", 2.0),
        (3L, 7L, "2024-01-01 11:00:00", 4.0),  // exactly 3600s after #1
        (4L, 7L, "2024-01-01 11:00:01", 8.0),  // #1 ages out
        (5L, 7L, "2024-01-01 11:00:01", 16.0), // same-second peer of #4
        (6L, 9L, "2024-01-01 10:30:00", 99.0)))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Double]("trailing_1h")).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 3.0)
    assert(out(3L) == 7.0, "3600s-old event is still inside the frame")
    assert(out(4L) == 30.0, "frame drops #1 and includes BOTH same-second peers")
    assert(out(5L) == 30.0, "peers share one frame regardless of row order")
    assert(out(6L) == 99.0, "partitions are per user")
  }

  test("qx22: moment-sum corr agrees with Spark's corr() and nails a crafted slope") {
    val sf001 = "/root/testdata/sf0.001"
    val ours = graft.operators.Events.valueHourCorr(spark, sf001)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("corr")).toMap
    val ref = graft.core.Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(corr(col("value"), hour(col("ts")).cast("double")).as("c"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("c")).toMap
    ours.foreach { case (t, c) =>
      assert(math.abs(c - ref(t)) < 1e-9,
        s"$t: moment corr $c vs corr() ${ref(t)}")
    }
    // crafted: value = 1.00 * hour exactly -> corr 1, beta = 1 hour
    // per 100 cents = 0.01 hours/cent
    import spark.implicits._
    val crafted = Seq.tabulate(12)(h =>
        (h.toLong, f"2024-01-01 $h%02d:30:00", "view", h.toDouble))
      .toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), lit(7L).as("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
    // reuse the operator body through a temp parquet-free path: the
    // declared query reads Tables.events, so replicate its projection
    val e = crafted.select(col("event_type"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("xc"),
      hour(col("ts")).cast("long").as("y"))
    val m = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("xc").as("sx"), sum("y").as("sy"),
        sum(expr("xc * xc")).as("sxx"), sum(expr("xc * y")).as("sxy"),
        sum(expr("y * y")).as("syy"))
      .select(
        expr("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))").as("corr"),
        expr("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))").as("beta"))
      .head()
    assert(math.abs(m.getAs[Double]("corr") - 1.0) < 1e-12,
      "exact linear relation must give corr 1")
    assert(math.abs(m.getAs[Double]("beta") - 0.01) < 1e-12,
      "slope of hour on cents is 1/100")
  }

  test("qs21: earliest in-window click wins; boundaries are [p_ts - 30min, p_ts]") {
    import spark.implicits._
    val rows = Seq(
      (1L, 7L, "2024-01-01 10:00:00", "click"),    // exactly 30 min before -> in
      (2L, 7L, "2024-01-01 10:10:00", "click"),    // later -> loses to #1
      (3L, 7L, "2024-01-01 10:30:00", "purchase"),
      (4L, 7L, "2024-01-01 10:31:00", "click"),    // after purchase -> out
      (5L, 8L, "2024-01-01 09:59:59", "click"),    // 30min+1s before -> out
      (6L, 8L, "2024-01-01 10:30:00", "purchase"), // no candidate -> no row
      (7L, 9L, "2024-01-01 10:30:00", "click"),    // same second as purchase -> in
      (8L, 9L, "2024-01-01 10:30:00", "purchase"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("event_type"),
        lit(0.0).as("value"))
    // run the same pipeline as firstTouch but over the crafted frame
    val clicks = rows.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    val purchases = rows.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id").orderBy("c_ts", "click_id")
    val got = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("purchase_id") ->
        r.getAs[Long]("click_id")).toMap
    assert(got(3L) == 1L, "exactly-30-min-old click is in window and earliest")
    assert(!got.contains(6L), "a purchase with no in-window click gets no credit row")
    assert(got(8L) == 7L, "same-second click counts (inclusive upper bound)")
  }

  test("qs22: cumulative uniques equal running first-seen sums; returning users don't recount") {
    val out = Events.cumulativeUsersOn(eventsOf(
        (1L, "2024-01-01 10:00:00", "view", 0.0),
        (2L, "2024-01-01 11:00:00", "view", 0.0),
        (1L, "2024-01-02 10:00:00", "view", 0.0),  // returning, not new
        (3L, "2024-01-02 11:00:00", "view", 0.0),
        (1L, "2024-01-04 10:00:00", "view", 0.0))) // only returning users
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("cum_users")))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 2L)))
    assert(out("2024-01-02") == ((2L, 1L, 3L)),
      "user 1 is active but not new; cumulative grows by the new user only")
    assert(out("2024-01-04") == ((1L, 0L, 3L)),
      "a returning-only day leaves the cumulative count flat")
    assert(!out.contains("2024-01-03"), "silent days have no report row")
  }

  test("qs24: hand-computed z-scores; zero-variance type pins z = 0") {
    // typeA hours: counts 1, 1, 4 -> n=3, sx=6, sxx=18
    //   denom = sqrt(3*18 - 36) = sqrt(18); z(1) = (3-6)/sqrt(18),
    //   z(4) = (12-6)/sqrt(18) ~ 1.414 -> nothing flagged at |z|>=2
    // typeB: two hours of 1 each -> variance 0 -> z pinned 0.0
    val ev = Seq(
      (1L, 101L, "2024-01-01 10:05:00", "typeA", 0.0),
      (2L, 101L, "2024-01-01 11:05:00", "typeA", 0.0),
      (3L, 101L, "2024-01-01 12:01:00", "typeA", 0.0),
      (4L, 101L, "2024-01-01 12:02:00", "typeA", 0.0),
      (5L, 101L, "2024-01-01 12:03:00", "typeA", 0.0),
      (6L, 101L, "2024-01-01 12:04:00", "typeA", 0.0),
      (7L, 102L, "2024-01-01 10:30:00", "typeB", 0.0),
      (8L, 102L, "2024-01-01 11:30:00", "typeB", 0.0))
      .toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
    val got = Events.hourlyAnomalyOn(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("hour")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Double]("z"),
          r.getAs[Boolean]("is_anomaly")))).toMap
    val d = math.sqrt(18.0)
    assert(got(("typeA", "2024-01-01 10:00:00")) == ((1L, -3.0 / d, false)))
    assert(got(("typeA", "2024-01-01 12:00:00")) == ((4L, 6.0 / d, false)))
    assert(got(("typeB", "2024-01-01 10:00:00")) == ((1L, 0.0, false)),
      "zero-variance type pins z = 0, never NaN")
    assert(got.size == 5)
  }

  test("qs25: transition counts and probabilities; ties break on event_id") {
    // user 1: view -> click -> purchase; user 2: view -> view
    // user 3: two SAME-timestamp events -> event_id orders them
    //         (5 before 6: click -> view), plus a trailing error
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, 1L, "2024-01-01 10:01:00", "click", 0.0),
      (3L, 1L, "2024-01-01 10:02:00", "purchase", 0.0),
      (4L, 2L, "2024-01-01 09:00:00", "view", 0.0),
      (5L, 2L, "2024-01-01 09:30:00", "view", 0.0),
      (6L, 3L, "2024-01-01 08:00:00", "click", 0.0),
      (7L, 3L, "2024-01-01 08:00:00", "view", 0.0),
      (8L, 3L, "2024-01-01 08:10:00", "error", 0.0))
      .toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
    val got = Events.typeTransitionsOn(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    // view steps: view->click (u1), view->view (u2), view->error (u3)
    assert(got(("view", "click")) == ((1L, 1.0 / 3.0)))
    assert(got(("view", "view")) == ((1L, 1.0 / 3.0)))
    assert(got(("view", "error")) == ((1L, 1.0 / 3.0)))
    // click steps: click->purchase (u1), click->view (u3 tie by id)
    assert(got(("click", "purchase")) == ((1L, 0.5)))
    assert(got(("click", "view")) == ((1L, 0.5)))
    assert(got.size == 5, s"terminal events emit no row: $got")
  }

  test("qs26: winsorized mean clips at hand-computed quantized percentile bounds") {
    import spark.implicits._
    // cents 100, 200, 10000; pos = q*(n-1):
    //   p01 at 0.02 -> 100 + 0.02*(200-100) = 102 -> ceil 102
    //   p99 at 1.98 -> 200 + 0.98*(10000-200) = 9804 -> floor 9804
    //   clipped sum = 102 + 200 + 9804 = 10106
    val ev = Seq(("view", 1.00), ("view", 2.00), ("view", 100.00))
      .toDF("event_type", "value")
    val r = Events.winsorizedStatsOn(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n") == 3L)
    assert(row.getAs[Double]("p01") == 1.02)
    assert(row.getAs[Double]("p99") == 98.04)
    assert(row.getAs[Double]("winsorized_avg") == 10106.0 / 3.0 / 100.0)
  }

  test("qs27: burst is the densest anchored 60s window; 59 in, 60 out") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L), (1L, 10L), (1L, 59L),   // [0,59] holds all 3
      (2L, 0L), (2L, 60L),              // 60 is OUTSIDE [0,59] -> burst 1
      (3L, 0L), (3L, 59L), (3L, 60L))   // [0,59]={0,59}, [59,118]={59,60}
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val got = Events.burstDetectOn(ev, botFloor = 3).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Int]("burst"),
          r.getAs[Boolean]("is_bot")))).toMap
    assert(got(1L) == ((3L, 3, true)))
    assert(got(2L) == ((2L, 1, false)),
      "an event 60s later is outside the [t, t+59] window")
    assert(got(3L) == ((3L, 2, false)))
  }

  test("qs28: hand-computed even-n interpolated median and MAD") {
    import spark.implicits._
    // cents 100, 200, 300, 1000: med = 250 (interpolated);
    // |c - med| = 150, 50, 50, 750 -> sorted 50, 50, 150, 750 ->
    // mad = (50 + 150) / 2 = 100; robust_cv = 100 / 250 = 0.4
    val ev = Seq(("view", 1.00), ("view", 2.00), ("view", 3.00),
      ("view", 10.00)).toDF("event_type", "value")
    val r = Events.madStatsOn(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n") == 4L)
    assert(row.getAs[Double]("median") == 2.5)
    assert(row.getAs[Double]("mad") == 1.0)
    assert(row.getAs[Double]("robust_cv") == 0.4)
  }

  test("qs29: 7-day window includes day+6, drops day+7; gap days report zero") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-09 10:00:00"),
      (2L, "2024-01-01 12:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = Events.rollingActivesOn(ev).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau7")))).toMap
    assert(got.size == 9, "spine spans min..max day inclusive")
    assert(got("2024-01-01") == ((2L, 2L)))
    assert(got("2024-01-04") == ((0L, 2L)), "gap day: dau 0, window carries")
    assert(got("2024-01-07") == ((0L, 2L)), "day+6 still counts day-1 actives")
    assert(got("2024-01-08") == ((0L, 0L)), "day+7 drops them")
    assert(got("2024-01-09") == ((1L, 1L)))
  }

  test("qs30: bounces, interpolated p95 duration, exact events-per-session") {
    import spark.implicits._
    // u1: 2-event session (dur 10s) + a bounce 40min later;
    // u2: single-event bounce. durations {10, 0, 0}:
    //   med = 0, p95 at pos 1.9 -> 0 + 0.9*10 = 9.0; epr = 4/3
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "2024-01-01 10:00:10", 1.0),
      (3L, 1L, "2024-01-01 10:41:00", 1.0),
      (4L, 2L, "2024-01-01 09:00:00", 1.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("value"))
    val r = Events.sessionStatsOn(ev).collect().head
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("bounces") == 2L)
    assert(r.getAs[Double]("med_dur_sec") == 0.0)
    assert(r.getAs[Double]("p95_dur_sec") == 9.0)
    assert(r.getAs[Double]("events_per_session") == 4.0 / 3.0)
  }

  test("qs31: +3600 converts, +3601 does not; the clock re-anchors per stage") {
    import spark.implicits._
    val ev = Seq(
      // u1: click exactly at view+3600 (in), purchase at click+3600
      //     (in, though 2h after the view — stage clock re-anchors)
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2: click one second past the deadline -> chain stops
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 11:00:01", "click"),
      (2L, "2024-01-01 11:30:00", "purchase"))
      .toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"))
    val got = Events.timedFunnelOn(ev, windowSec = 3600L).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_user_days"))
      .toMap
    assert(got == Map("1_view" -> 2L, "2_click_1h" -> 1L,
      "3_purchase_1h" -> 1L), s"got $got")
  }

  test("qs32: exact shares and ranks from DECIMAL totals") {
    import spark.implicits._
    val ev = Seq(("view", 10.00), ("view", 0.50), ("click", 31.50))
      .toDF("event_type", "value")
    val got = Events.spendShareOn(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("total"), r.getAs[Double]("share"),
          r.getAs[Int]("rnk")))).toMap
    assert(got("view") == ((10.5, 0.25, 2)))
    assert(got("click") == ((31.5, 0.75, 1)))
  }

  test("qd25: repetition ratios match hand-computed signals") {
    val out = TrainingOps.repetitionOn(docsOf(
        (1L, "a a a b"),      // top a: 3/4; bigrams (a a)x2, (a b) -> 2/3
        (2L, "w x y z"),      // all distinct: 1/4; no repeated bigram
        (3L, "solo"),         // one token: no bigrams at all
        (4L, "")))            // no tokens: drops out
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("top_token_ratio"),
          Option(r.getAs[java.lang.Double]("dup_bigram_ratio")))).toMap
    assert(out(1L) == ((4L, 0.75, Some(2.0 / 3.0))))
    assert(out(2L) == ((4L, 0.25, Some(0.0))))
    assert(out(3L) == ((1L, 1.0, None)),
      "single-token doc keeps NULL bigram ratio")
    assert(!out.contains(4L), "token-free doc has no signal row")
  }

  test("qs33: 7-day boundary halves, integer truncation, anchor is max day") {
    val ev = eventsOf(
      (1L, "2024-03-15 12:00:00", "view", 3.33),  // age 0d  k=0 -> 333
      (1L, "2024-03-09 23:59:59", "view", 3.33),  // age 6d  k=0 -> 333
      (1L, "2024-03-08 00:00:01", "view", 3.33),  // age 7d  k=1 -> 166 (truncates)
      (2L, "2024-03-01 12:00:00", "view", 10.00), // age 14d k=2 -> 250
      (2L, "2024-02-24 12:00:00", "view", 0.01))  // age 20d k=2 -> 0
    val out = Events.decayedSpendOn(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("raw_spend"), r.getAs[Double]("decayed_spend"))))
      .toMap
    assert(out(1L) == ((9.99, 8.32)),
      s"u1: 333+333+166 cents decayed, got ${out(1L)}")
    assert(out(2L) == ((10.01, 2.50)),
      s"u2: 250+0 cents decayed (sub-cent contribution floors to 0), " +
        s"got ${out(2L)}")
  }

  test("qs34: trailing window is 7 calendar days inclusive; only active days report") {
    val ev = eventsOf(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-08 10:00:00", "view", 1.0),  // exactly 7 days later:
                                                 // 01-01 is OUTSIDE its window
      (2L, "2024-01-05 10:00:00", "view", 1.0))
    val out = Events.stickinessOn(ev).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Double]("stickiness")))).toMap
    assert(out.keySet == Set("2024-01-01", "2024-01-05", "2024-01-08"),
      s"only ACTIVE days report (no gap-day rows): ${out.keySet}")
    assert(out("2024-01-01") == ((1L, 1L, 1.0)))
    assert(out("2024-01-05") == ((1L, 2L, 0.5)),
      s"u1's 01-01 is inside [12-30, 01-05]: ${out("2024-01-05")}")
    assert(out("2024-01-08") == ((1L, 2L, 0.5)),
      s"u1's 01-01 must fall OFF the [01-02, 01-08] window: " +
        s"${out("2024-01-08")}")
  }
}
