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
}
