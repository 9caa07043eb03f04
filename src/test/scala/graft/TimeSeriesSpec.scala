package graft

import graft.operators.TimeSeries

/** Hand-worked examples for the time-series diagnostics layer — the
  * fidelity check the cross-engine oracle gate can't provide (the
  * gate proves bit-reproducibility of the author's conventions; these
  * prove the conventions compute the intended statistics).
  */
class TimeSeriesSpec extends SparkSpec {

  import java.sql.Timestamp
  private def t(s: String) = Timestamp.valueOf(s)

  /** One tick per (user, day) at the given dollar values → the daily
    * close is the value itself (cents = value·100).
    */
  private def series(vals: (Long, Seq[Double])*) = {
    import spark.implicits._
    var id = 0L
    vals.flatMap { case (uid, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        id += 1
        (id, t(f"2024-01-${i + 1}%02d 10:00:00"), uid, v)
      }
    }.toDF("event_id", "ts", "user_id", "value")
  }

  test("acf: perfectly linear series autocorrelates at 1.0, constants drop") {
    // closes 100..500 cents: every overlapped window is linear in the
    // other → r = 1 exactly at lags 1..3; lag 4 has k=1 (<2) and lag 5
    // k=0 → both drop; the constant series has vx=0 → fully dropped
    val df = series(1L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0),
      2L -> Seq(7.0, 7.0, 7.0, 7.0, 7.0))
    val r = TimeSeries.acfLags(df).collect()
    assert(r.map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("lag"))).toSeq ===
      Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    assert(r.forall(_.getAs[Double]("acf") === 1.0))
  }

  test("acf: hand-worked lag-1 moments on a non-trivial series") {
    // closes (cents) 100, 300, 200, 400: lag 1 → x=[100,300,200],
    // y=[300,200,400]: k=3, sx=600, sy=900, sxx=140000, syy=290000,
    // sxy=100·300+300·200+200·400=170000
    // vx=3·140000−360000=60000, vy=3·290000−810000=60000,
    // num=3·170000−540000=−30000 → acf=−30000/60000=−0.5
    val df = series(1L -> Seq(1.0, 3.0, 2.0, 4.0))
    val r = TimeSeries.acfLags(df, maxLag = 1).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("acf") === -0.5)
  }

  test("kendall: concordance and tie-corrected tau against time") {
    // u1 closes [100,300,200]: pairs +1,+1,−1 → cd=1, ties=0, n0=3,
    //   tau = 1/(√3·√3) = 0.333333
    // u2 closes [100,100,200]: cd=2, ties=1 → tau = 2/(√3·√2) = 0.816497
    // u3 all-tied [100,100] → n0=ties → dropped
    val df = series(1L -> Seq(1.0, 3.0, 2.0),
      2L -> Seq(1.0, 1.0, 2.0), 3L -> Seq(1.0, 1.0))
    val r = TimeSeries.kendallTrend(df).collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq === Seq(1L, 2L))
    val byU = r.map(x => x.getAs[Long]("user_id") ->
      (x.getAs[Long]("n_days"), x.getAs[Long]("concordance"),
        x.getAs[Double]("tau"))).toMap
    assert(byU(1L) === ((3L, 1L, 0.333333)))
    assert(byU(2L) === ((3L, 2L, 0.816497)))
  }

  test("theil-sen: lower median of HALF_UP pairwise micro-slopes") {
    // u1 [100,200,400] cents: slopes 1e6, 1.5e6, 2e6 → median 1.5e6
    // u2 [300,200,100]: all −1e6
    // u3 [100,100,100,101]: slopes 0,0,0,3333,5000,10000 → LOWER
    //   median (rank 3 of 6) = 0 — no even-count averaging
    val df = series(1L -> Seq(1.0, 2.0, 4.0), 2L -> Seq(3.0, 2.0, 1.0),
      3L -> Seq(1.0, 1.0, 1.0, 1.01))
    val r = TimeSeries.theilSen(df).collect()
    val byU = r.map(x => x.getAs[Long]("user_id") ->
      (x.getAs[Long]("n_pairs"), x.getAs[Long]("slope_micro"),
        x.getAs[Double]("slope"))).toMap
    assert(byU(1L) === ((3L, 1500000L, 1.5)))
    assert(byU(2L) === ((3L, -1000000L, -1.0)))
    assert(byU(3L) === ((6L, 0L, 0.0)))
  }

  test("theil-sen: the trailing-bars cap bounds the pair set") {
    // maxBars=3 over 5 bars keeps only the last 3 closes [300,400,500]
    // → 3 pairs, all slope 1e6 (the early flat leg is out of window)
    val df = series(1L -> Seq(1.0, 1.0, 3.0, 4.0, 5.0))
    val r = TimeSeries.theilSen(df, maxBars = 3).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_pairs") === 3L)
    assert(r(0).getAs[Long]("slope_micro") === 1000000L)
  }

  test("cusum: flat-median series alarms on any deviation (mad=0)") {
    // closes [100,100,100,200,200]: mu=100 (lower median), mad=0,
    // k=0, h=0 → s_pos ramps 0,0,0,100,200; alarm from day 4
    val df = series(1L -> Seq(1.0, 1.0, 1.0, 2.0, 2.0))
    val r = TimeSeries.cusumChangepoint(df).collect()
    assert(r.map(_.getAs[Long]("s_pos")).toSeq === Seq(0L, 0L, 0L, 100L, 200L))
    assert(r.map(_.getAs[Long]("s_neg")).toSeq === Seq(0L, 0L, 0L, 0L, 0L))
    assert(r.map(_.getAs[Boolean]("alarm")).toSeq ===
      Seq(false, false, false, true, true))
    assert(r.forall(_.getAs[Double]("target") === 1.0))
  }

  test("cusum: self-calibrated slack absorbs in-band noise") {
    // closes [100,104,96,120,120]: mu=104, deviations sorted
    // [0,4,8,16,16] → mad=8, k=(16+2)//4=4, h=40
    // s_pos: 0,0,0,12,24 (never over 40); s_neg: 0,0,4,0,0 → no alarm
    val df = series(1L -> Seq(1.0, 1.04, 0.96, 1.20, 1.20))
    val r = TimeSeries.cusumChangepoint(df).collect()
    assert(r.map(_.getAs[Long]("s_pos")).toSeq === Seq(0L, 0L, 0L, 12L, 24L))
    assert(r.map(_.getAs[Long]("s_neg")).toSeq === Seq(0L, 0L, 4L, 0L, 0L))
    assert(r.forall(!_.getAs[Boolean]("alarm")))
    assert(r.forall(_.getAs[Double]("target") === 1.04))
  }

  test("holt: level/trend/forecast recursion at alpha=beta=1/2") {
    // closes [100,200,300] micro-cents 1e8-scaled emits:
    // d1 seed: l=1.0, b=0, f=1.0
    // d2: l=(2.0+1.0)/2=1.5, b=(0+(1.5−1.0))/2=0.25, f=1.75
    // d3: l=(3.0+1.75)/2=2.375, b=(0.25+0.875)/2=0.5625, f=2.9375
    val df = series(1L -> Seq(1.0, 2.0, 3.0))
    val r = TimeSeries.holtLinear(df).collect()
    assert(r.map(_.getAs[Double]("level")).toSeq === Seq(1.0, 1.5, 2.375))
    assert(r.map(_.getAs[Double]("trend")).toSeq === Seq(0.0, 0.25, 0.5625))
    assert(r.map(_.getAs[Double]("forecast")).toSeq === Seq(1.0, 1.75, 2.9375))
  }

  test("holt: a single-bar series emits its seed row") {
    val df = series(1L -> Seq(2.5))
    val r = TimeSeries.holtLinear(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("level") === 2.5)
    assert(r(0).getAs[Double]("trend") === 0.0)
    assert(r(0).getAs[Double]("forecast") === 2.5)
  }

  test("ljung-box: hand-worked Q over the live lags, constants drop") {
    // closes [100,300,200,400]: lag1 acf=−0.5 (the acf spec's moments),
    // lag2: x=[100,300] y=[200,400] → vx=vy=num=40000 → acf=1.0;
    // lags 3..5 have k<2 → drop; lags_used=2 and
    // Q = m(m+2)·(r1²/(m−1)+r2²/(m−2)) = 24·(0.25/3 + 1.0/2) = 14.0
    val df = series(1L -> Seq(1.0, 3.0, 2.0, 4.0),
      2L -> Seq(7.0, 7.0, 7.0, 7.0))
    val r = TimeSeries.ljungBox(df).collect()
    assert(r.length === 1) // the constant series has no live lag
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[Long]("n_days") === 4L)
    assert(r(0).getAs[Long]("lags_used") === 2L)
    assert(r(0).getAs[Double]("q_stat") === 14.0)
  }

  test("pacf: closed forms match Durbin-Levinson on the operator's own acf") {
    // fidelity: the lag-3 determinant ratio must equal the standard
    // Durbin-Levinson recursion run on the same rounded acf values
    val df = series(1L -> Seq(1.0, 2.0, 1.5, 3.0, 2.5, 4.0, 3.5, 5.0, 4.0, 6.0))
    val acf = TimeSeries.acfLags(df, maxLag = 3).collect()
      .map(x => x.getAs[Long]("lag") -> x.getAs[Double]("acf")).toMap
    val (r1, r2, r3) = (acf(1L), acf(2L), acf(3L))
    // Durbin-Levinson: phi11=r1; phi22=(r2-phi11*r1)/(1-phi11*r1);
    // phi21=phi11-phi22*phi11; phi33=(r3-phi21*r2-phi22*r1)/(1-phi21*r1-phi22*r2)
    val phi11 = r1
    val phi22 = (r2 - phi11 * r1) / (1 - phi11 * r1)
    val phi21 = phi11 - phi22 * phi11
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    val p = TimeSeries.pacf(df).collect()
      .map(x => x.getAs[Long]("lag") -> x.getAs[Double]("pacf")).toMap
    assert(p(1L) === r1)
    assert(math.abs(p(2L) - phi22) < 1e-6)
    assert(math.abs(p(3L) - phi33) < 1e-6)
  }

  test("pacf: singular Toeplitz denominators drop, short series truncate") {
    // the linear series has r1=r2=r3=1 → 1−r1² = 0 → lags 2,3 drop;
    // the 4-bar series has no lag-3 acf at all → only lags 1,2
    val df = series(1L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0),
      2L -> Seq(1.0, 3.0, 2.0, 4.0))
    val byU = TimeSeries.pacf(df).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.map(x =>
        x.getAs[Long]("lag") -> x.getAs[Double]("pacf")).toMap }
    assert(byU(1L) === Map(1L -> 1.0))
    // u2: r1=−0.5, r2=1.0 → pacf2 = (1−0.25)/(1−0.25) = 1.0
    assert(byU(2L) === Map(1L -> -0.5, 2L -> 1.0))
  }

  test("seasonal decompose: a pure weekly spike lands entirely in the seasonal") {
    // 14 days from Mon 2024-01-01, 10.00 flat with +0.70 spikes on
    // days 4 and 11 (both weekday 3): every full 7-frame holds exactly
    // one spike → trend = HALF_UP(7070/7) = 10.10 everywhere;
    // detrended = +60 on the spikes, −10 elsewhere; weekday-3 seasonal
    // = 60, all others −10 → remainder identically 0
    val vals = (1 to 14).map(i => if (i == 4 || i == 11) 10.70 else 10.00)
    val df = series(1L -> vals)
    val r = TimeSeries.seasonalDecompose(df).collect()
    assert(r.length === 8) // full frames: days 4..11
    assert(r.forall(_.getAs[Double]("trend") === 10.10))
    assert(r.forall(_.getAs[Double]("remainder") === 0.0))
    r.foreach { x =>
      val expected = if (x.getAs[Long]("weekday") == 3L) 0.6 else -0.1
      assert(x.getAs[Double]("seasonal") === expected, s"at $x")
    }
  }

  test("hampel: spike flagged and substituted, flat neighbors untouched") {
    // u1: constant 10.00 with a 20.00 spike on day 5 of 9. Full frames
    // are days 4..6; med=10.00 and mad=0 in each, so only the spike
    // (|Δ|=1000 > 0) flags — the > is strict, flat rows never flag
    val df = series(1L -> Seq(10.0, 10.0, 10.0, 10.0, 20.0, 10.0, 10.0, 10.0, 10.0))
    val r = TimeSeries.hampelFilter(df).collect()
    assert(r.length === 3)
    assert(r.map(_.getAs[Boolean]("outlier")).toSeq === Seq(false, true, false))
    assert(r.forall(_.getAs[Double]("cleaned") === 10.0))
    assert(r.forall(_.getAs[Double]("win_median") === 10.0))
    assert(r.forall(_.getAs[Double]("win_mad") === 0.0))
  }

  test("hampel: lower-median MAD on a drifting window") {
    // u1 closes [10.00,10.10,10.20,10.30,15.00,10.50,10.60,10.70,10.80],
    // day 5 frame (days 2..8) sorted [1010..1070,1500] → med=1050,
    // deviations sorted [0,10,20,20,30,40,450] → mad=20 (rank 4);
    // |1500−1050|=450 > 60 → flagged, cleaned = 10.50
    val df = series(1L -> Seq(10.0, 10.1, 10.2, 10.3, 15.0, 10.5, 10.6, 10.7, 10.8))
    val r = TimeSeries.hampelFilter(df).collect()
    val d5 = r.find(_.getAs[String]("day") == "2024-01-05").get
    assert(d5.getAs[Double]("win_median") === 10.50)
    assert(d5.getAs[Double]("win_mad") === 0.20)
    assert(d5.getAs[Boolean]("outlier"))
    assert(d5.getAs[Double]("cleaned") === 10.50)
    assert(r.count(_.getAs[Boolean]("outlier")) === 1)
  }

  test("interpolate: HALF_UP linear fill across calendar gaps, both slopes") {
    import spark.implicits._
    // bars on days 1, 4, 6: the 3-day gap fills k=1,2 with
    // 1000+HU(30k/3) = 1010, 1020; the down-gap 1030→1005 fills
    // HU(−25/2) = −13 → 1017
    val df = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, 10.00),
      (2L, t("2024-01-04 10:00:00"), 1L, 10.30),
      (3L, t("2024-01-06 10:00:00"), 1L, 10.05))
      .toDF("event_id", "ts", "user_id", "value")
    val r = TimeSeries.seriesInterpolate(df).collect()
    val got = r.map(x => (x.getAs[String]("day"), x.getAs[Double]("close"),
      x.getAs[Boolean]("interpolated"))).toSeq
    assert(got === Seq(
      ("2024-01-01", 10.00, false), ("2024-01-02", 10.10, true),
      ("2024-01-03", 10.20, true), ("2024-01-04", 10.30, false),
      ("2024-01-05", 10.17, true), ("2024-01-06", 10.05, false)))
  }

  test("ccf vs market: leave-one-out alignment at lag 0 and ±1") {
    // u1 dv=[10,−10,20], u2 dv=[20,−20,40] → market [30,−30,60];
    // leave-one-out y for u1 at lag 0 is exactly u2's dv → perfectly
    // correlated (1.0); at lag 1 (market leads) u1's [−10,20] pairs
    // with y=[20,−20] → −1.0
    val df = series(1L -> Seq(10.00, 10.10, 10.00, 10.20),
      2L -> Seq(20.00, 20.20, 20.00, 20.40))
    val r = TimeSeries.ccfMarket(df).collect()
    val byKey = r.map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("lag")) ->
      (x.getAs[Long]("n_pairs"), x.getAs[Double]("ccf"))).toMap
    assert(byKey((1L, 0L)) === ((3L, 1.0)))
    assert(byKey((2L, 0L)) === ((3L, 1.0)))
    assert(byKey((1L, 1L)) === ((2L, -1.0)))
  }

  test("forecast skill: perfect weekly pattern scores MASE 0") {
    // u1 repeats a 7-day ramp twice: every lag-7 error is 0 →
    // mae_snaive=0, mase_bp=0; naive MAE = HU(1800/13) = 138 cents.
    // u2 (constant) has zero naive error → dropped
    val ramp = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0)
    val df = series(1L -> (ramp ++ ramp), 2L -> Seq(5.0, 5.0, 5.0, 5.0,
      5.0, 5.0, 5.0, 5.0))
    val r = TimeSeries.forecastSkill(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_days") === 14L)
    assert(r(0).getAs[Double]("mae_naive") === 1.38)
    assert(r(0).getAs[Double]("mae_snaive") === 0.0)
    assert(r(0).getAs[Long]("mase_bp") === 0L)
  }

  test("forecast skill: hand-worked MASE basis points") {
    // closes [1000,1200,1100,1300,1000,1400,1100,1500,1200]:
    // sum1=2200 n1=8 → mae_naive=HU(275)=2.75; lag-7 pairs |1500−1000|,
    // |1200−1200| → sum7=500 n7=2 → mae_snaive=HU(250)=2.50;
    // mase = HU(10⁴·500·8/(2200·2)) = HU(9090.909) = 9091 bp
    val df = series(1L -> Seq(10.0, 12.0, 11.0, 13.0, 10.0, 14.0, 11.0, 15.0, 12.0))
    val r = TimeSeries.forecastSkill(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("mae_naive") === 2.75)
    assert(r(0).getAs[Double]("mae_snaive") === 2.50)
    assert(r(0).getAs[Long]("mase_bp") === 9091L)
  }

  test("diagnostics over the persisted bar table: parity + zero hash exchanges") {
    // the recurring-monitoring deployment: every diagnostic's FromBars
    // twin must (a) be value-identical to the tick-scan form (the
    // shared-oracle claim) and (b) ride the series bucket layout with
    // zero hash exchanges — except ccf, which re-keys by day past the
    // first projection by design (asserted separately below)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val table = "t_bars_diag_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.operators.Finance.writeBarsTable(ev, table)
    try {
      val bars = spark.table(table)
      val zeroExchange = Seq(
        ("acf", TimeSeries.acfLagsFromBars(bars), TimeSeries.acfLags(ev)),
        ("kendall", TimeSeries.kendallTrendFromBars(bars), TimeSeries.kendallTrend(ev)),
        ("theil_sen", TimeSeries.theilSenFromBars(bars), TimeSeries.theilSen(ev)),
        ("cusum", TimeSeries.cusumChangepointFromBars(bars), TimeSeries.cusumChangepoint(ev)),
        ("holt", TimeSeries.holtLinearFromBars(bars), TimeSeries.holtLinear(ev)),
        ("ljung_box", TimeSeries.ljungBoxFromBars(bars), TimeSeries.ljungBox(ev)),
        ("pacf", TimeSeries.pacfFromBars(bars), TimeSeries.pacf(ev)),
        ("seasonal", TimeSeries.seasonalDecomposeFromBars(bars), TimeSeries.seasonalDecompose(ev)),
        ("hampel", TimeSeries.hampelFilterFromBars(bars), TimeSeries.hampelFilter(ev)),
        ("interpolate", TimeSeries.seriesInterpolateFromBars(bars), TimeSeries.seriesInterpolate(ev)),
        ("forecast_skill", TimeSeries.forecastSkillFromBars(bars), TimeSeries.forecastSkill(ev)),
        ("variance_ratio", TimeSeries.varianceRatioFromBars(bars), TimeSeries.varianceRatio(ev)),
        ("runs_test", TimeSeries.runsTestFromBars(bars), TimeSeries.runsTest(ev)),
        ("holt_winters", TimeSeries.holtWintersFromBars(bars), TimeSeries.holtWinters(ev)))
      zeroExchange.foreach { case (name, indexed, direct) =>
        val plan = indexed.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bar-table $name must plan zero hash exchanges:\n$plan")
        assert(indexed.except(direct).isEmpty && direct.except(indexed).isEmpty,
          s"persisted-bars $name must be value-identical to the direct form")
      }
      val ccfIdx = TimeSeries.ccfMarketFromBars(bars)
      val ccfDir = TimeSeries.ccfMarket(ev)
      assert(ccfIdx.except(ccfDir).isEmpty && ccfDir.except(ccfIdx).isEmpty,
        "persisted-bars ccf must be value-identical to the direct form")
      // ccf's exchanges move BAR-grain rows only (the day-keyed market
      // aggregate and the (series, day) leave-one-out join) — the
      // per-series change window itself must ride the bucket layout,
      // so the plan's exchange count stays at the fixed re-key budget
      // rather than growing a tick-aggregate exchange per input leg
      val ccfPlan = ccfIdx.queryExecution.executedPlan.toString
      val nExchanges = "Exchange hashpartitioning".r
        .findAllMatchIn(ccfPlan).length
      assert(nExchanges <= 4,
        s"ccf FromBars must keep exchanges to the bar-grain re-keys (got $nExchanges):\n$ccfPlan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ccf: calendar-day lag axis — weekend gaps drop pairs, never slide") {
    // Two series over Thu Jan-04 .. Mon Jan-08 2024 with the weekend
    // absent (no Sat/Sun bar — the trading-calendar shape). Changes
    // exist on Fri (vs Thu) and Mon (vs Fri). At lag +1 (market moved
    // one CALENDAR day earlier), Mon looks for a Sunday market row —
    // which doesn't exist — so the only lag-+1 pair is Fri←Thu... but
    // Thu has no change row either (it's each series' first bar).
    // Hence lag +1 forms ZERO pairs and (k>=2 filter) emits nothing:
    // the gap DROPS, it does not slide to Friday. Lag 0 pairs exist on
    // both Fri and Mon (k=2) and do emit. A row-lag implementation
    // would instead pair Mon with Fri at lag 1 and emit k=2 there.
    import spark.implicits._
    val days = Seq("2024-01-04", "2024-01-05", "2024-01-08")
    val rows = for {
      (uid, vals) <- Seq(1L -> Seq(10.0, 12.0, 11.0), 2L -> Seq(20.0, 21.0, 23.0))
      ((d, v), i) <- days.zip(vals).zipWithIndex
    } yield ((uid - 1) * 3 + i + 1, t(s"$d 10:00:00"), uid, v)
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val r = TimeSeries.ccfMarket(df, maxLag = 1).collect()
    val lags = r.map(_.getAs[Long]("lag")).toSet
    assert(lags === Set(0L), s"only lag 0 must survive the weekend gap, got $lags")
    assert(r.forall(_.getAs[Long]("n_pairs") === 2L))
  }

  test("variance ratio: hand-worked moments; constant-diff series drop") {
    // u1 zigzag [100,200,100,200,100,200,100] cents: d1 = ±100
    // alternating → n1=6, s1=0, s11=60000, v1=360000; dq (q=5) on rows
    // 6,7: [+100,−100] → nq=2, sq=0, sqq=20000, vq=40000.
    // VR = (vq·n1²)/(5·v1·nq²) = 1440000/7200000 = 0.2 (mean reversion).
    // u2 linear [100..800]: every d1 = 100 → v1 = 0 → dropped.
    val df = series(
      1L -> Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0),
      2L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))
    val r = TimeSeries.varianceRatio(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[Long]("q") === 5L)
    assert(r(0).getAs[Long]("n_diffs") === 6L)
    assert(r(0).getAs[Double]("vr") === 0.2)
  }

  test("runs test: alternating signs, monotone and zero-variance drops") {
    // u1 [1,2,1,2,1,2,1]: signs +−+−+− → n=6, n⁺=n⁻=3, R=6;
    //   E=1+18/6=4, Var=18·12/(36·5)=1.2, z=2/√1.2=1.825742
    // u2 monotone [1,2,3,4]: n⁻=0 → dropped
    // u3 [1,2,2,1]: zero change drops → signs +− → n=2, 2n⁺n⁻=2=n →
    //   Var=0 → dropped
    val df = series(
      1L -> Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0),
      2L -> Seq(1.0, 2.0, 3.0, 4.0),
      3L -> Seq(1.0, 2.0, 2.0, 1.0))
    val r = TimeSeries.runsTest(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[Long]("n_obs") === 6L)
    assert(r(0).getAs[Long]("n_up") === 3L)
    assert(r(0).getAs[Long]("n_down") === 3L)
    assert(r(0).getAs[Long]("runs") === 6L)
    assert(r(0).getAs[Double]("z") === 1.825742)
  }

  test("holt-winters: seed arithmetic and the one-step seasonal forecast") {
    // Closes (cents) [100,200,100,100,100,100,100] then day 8 = 100.
    // l₀ = HALF_UP(Σ·1e6·2+7)/14 over the 7 seeds = 114285714 µ¢;
    // seeds s₁=−14285714, s₂=+85714286, s₃..₇=−14285714.
    // Day 8 (x=1e8, s_{t−7}=s₁): l₈ = HALF_UP((1e8+14285714+114285714)/2)
    // = 114285714, b₈ = 0, s₈ = HALF_UP((1e8−114285714−14285714)/2)
    // = −14285714, forecast = l+b+s₂ = 2e8 → the week-2 "high" weekday
    // is forecast at exactly 2.00.
    // u2 has 7 bars only (< 8) → dropped.
    val df = series(
      1L -> Seq(1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      2L -> Seq(1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    val r = TimeSeries.holtWinters(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[String]("day") === "2024-01-08")
    assert(r(0).getAs[Double]("level") === 1.14285714)
    assert(r(0).getAs[Double]("trend") === 0.0)
    assert(r(0).getAs[Double]("seasonal") === -0.14285714)
    assert(r(0).getAs[Double]("forecast") === 2.0)
  }

  test("holt-winters: constant series stays flat with zero trend/seasonal") {
    val df = series(1L -> Seq(5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0))
    val r = TimeSeries.holtWinters(df).collect()
    assert(r.length === 2)
    r.foreach { row =>
      assert(row.getAs[Double]("level") === 5.0)
      assert(row.getAs[Double]("trend") === 0.0)
      assert(row.getAs[Double]("seasonal") === 0.0)
      assert(row.getAs[Double]("forecast") === 5.0)
    }
  }
}
