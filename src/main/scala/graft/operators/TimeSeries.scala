package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series statistics over the per-series daily close table —
  * the diagnostic layer ABOVE the indicator family: autocorrelation
  * structure, robust trend (Theil–Sen, Kendall), changepoint
  * detection (CUSUM), and linear exponential smoothing (Holt).
  *
  * Numeric policy (the library-wide rules): every sum/compare runs on
  * exact BIGINT cents; divisions are HALF_UP integer identities; the
  * only floats are (a) final divisions of identical integers — the
  * same IEEE op in any engine — and (b) correlation-type outputs
  * (quotients with sqrt denominators), which are decimal-generic
  * reals where a final round() is safe, emitted with the `+ 0.0`
  * signed-zero normalization.
  *
  * Scale shapes: everything here folds per series after ONE
  * series-keyed exchange of daily bars (|series|·|days| rows — the
  * compact artifact, never raw ticks). The O(days²) pair ops
  * (Kendall, Theil–Sen) are bounded by the bar count per series, not
  * by tick volume; at 100 TB the bar table is still tiny per series.
  *
  * Every diagnostic has TWO entry points sharing one core (and one
  * oracle): the direct form aggregates raw ticks per query, and the
  * `FromBars` twin reads the PERSISTED series-bucketed bar table
  * ([[Finance.writeBarsTable]]) — the recurring-monitoring
  * deployment, where the per-series folds ride the bucket layout
  * with zero hash exchanges (spec-pinned) and the job reads |days|
  * bars, never raw ticks (the [[Finance.rsiFromBars]] lifecycle).
  */
object TimeSeries {

  private def closes(events: DataFrame): DataFrame =
    Finance.dailyBars(events).select("user_id", "day", "c")

  /** The close leg of a persisted bar-table read — the `FromBars`
    * twins' shared input projection.
    */
  private def barCloses(bars: DataFrame): DataFrame =
    bars.select("user_id", "day", "c")

  private def closesArr(cl: DataFrame): DataFrame =
    cl.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("rows"))
      .withColumn("cs", expr("transform(rows, r -> r.c)"))
      .withColumn("m", size(col("cs")))

  /** Autocorrelation function of daily closes at lags 1..`maxLag` per
    * series: r_L = (k·Σxy − Σx·Σy)/(√vx·√vy) over the k = m−L
    * overlapped pairs — every moment an exact BIGINT sum, the
    * denominator the PINNED form √vx·√vy (NOT √(vx·vy): the product
    * can overflow BIGINT, and both engines evaluate the two-sqrt form
    * identically). Degenerate lags (either window constant, or k < 2)
    * drop in both engines. One exchange, five folds per series.
    */
  def acfLags(events: DataFrame, maxLag: Int = 5): DataFrame =
    acfLagsC(closes(events), maxLag)

  /** [[acfLags]] over the persisted bar table — zero hash exchanges. */
  def acfLagsFromBars(bars: DataFrame, maxLag: Int = 5): DataFrame =
    acfLagsC(barCloses(bars), maxLag)

  private def acfLagsC(cl: DataFrame, maxLag: Int): DataFrame =
    acfTable(cl, maxLag)
      .select(col("user_id"), col("lag"), col("acf"))
      .orderBy("user_id", "lag")

  /** The (user_id, m, lag, acf) table behind [[acfLags]], [[ljungBox]]
    * and [[pacf]] — the rounded per-lag autocorrelations plus the
    * series length the derived statistics need.
    */
  private def acfTable(cl: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    closesArr(cl)
      .select(col("user_id"), col("cs"), col("m"),
        explode(expr(s"sequence(1, $maxLag)")).as("lag"))
      .filter(col("m") - col("lag") >= 2)
      // the filter above can be COLLAPSED into the downstream vx/vy
      // predicate, whose common-subexpression slices then evaluate on
      // the k < 0 rows it was meant to prune (observed: m=4, lag=5 →
      // slice length −1 throws) — clamp instead of relying on
      // predicate order
      .withColumn("k", greatest(col("m") - col("lag"), lit(0)))
      .withColumn("sx", expr("aggregate(slice(cs, 1, k), 0L, (a, x) -> a + x)"))
      .withColumn("sy", expr("aggregate(slice(cs, lag + 1, k), 0L, (a, x) -> a + x)"))
      .withColumn("sxx", expr("aggregate(slice(cs, 1, k), 0L, (a, x) -> a + x * x)"))
      .withColumn("syy", expr("aggregate(slice(cs, lag + 1, k), 0L, (a, x) -> a + x * x)"))
      .withColumn("sxy", expr(
        "aggregate(zip_with(slice(cs, 1, k), slice(cs, lag + 1, k), (a, b) -> a * b), " +
          "0L, (a, x) -> a + x)"))
      .withColumn("vx", col("k") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("k") * col("syy") - col("sy") * col("sy"))
      .filter(col("vx") > 0 && col("vy") > 0)
      .select(col("user_id"), col("m"), col("lag").cast("long").as("lag"),
        (round((col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(col("vx").cast("double")) * sqrt(col("vy").cast("double"))), 6)
          + lit(0.0)).as("acf"))
  }

  /** Kendall's tau-b of daily closes AGAINST TIME per series — the
    * robust monotone-trend test (is this series drifting, ignoring
    * magnitude): C−D = Σ_{i<j} sign(c_j − c_i) exact over all bar
    * pairs (time has no ties, so t_x = 0), tie correction from equal
    * closes, tau = (C−D)/(√n₀·√(n₀−t_y)). The pair statistics are one
    * compiled O(m log m) pass per series
    * ([[graft.plans.KendallStatsExpr]] — rank compression + Fenwick
    * tree), so a decade-deep bar history costs ~m log m, not m²/2,
    * integer ops. All-tied series drop (undefined tau) in both
    * engines.
    */
  def kendallTrend(events: DataFrame): DataFrame =
    kendallTrendC(closes(events))

  /** [[kendallTrend]] over the persisted bar table — zero hash
    * exchanges. */
  def kendallTrendFromBars(bars: DataFrame): DataFrame =
    kendallTrendC(barCloses(bars))

  private def kendallTrendC(cl: DataFrame): DataFrame = {
    closesArr(cl)
      .filter(col("m") >= 2)
      // (C−D, ties) in one compiled O(m log m) pass (rank compression
      // + Fenwick tree) — value-identical to the O(m²) nested-fold
      // pair scan it replaced (round-11 audit: 8.07× at 10× bars), so
      // the shared oracle is untouched
      .withColumn("p", graft.plans.HashExprs.kendallStats(col("cs")))
      .withColumn("n0", (col("m").cast("long") * (col("m") - 1)) / 2)
      .filter(col("n0") > col("p.ties"))
      .select(col("user_id"), col("m").cast("long").as("n_days"),
        col("p.cd").as("concordance"),
        (round(col("p.cd").cast("double") /
          (sqrt(col("n0").cast("double")) * sqrt((col("n0") - col("p.ties")).cast("double"))), 6)
          + lit(0.0)).as("tau"))
      .orderBy("user_id")
  }

  /** Theil–Sen robust trend per series: the LOWER MEDIAN (rank
    * ⌈P/2⌉ — no even-count averaging, so the selected value is one of
    * the exact integers) of all pairwise slopes over the TRAILING
    * `maxBars` bars, each slope the signed HALF_UP integer
    * (c_j − c_i)·10⁴/(j − i) in micro-price units per bar (the pair
    * gap j − i is a bar-position difference, so windowing the tail
    * changes no individual slope). The cap is the scale bound: the
    * materialized slope array is ≤ maxBars²/2 longs per series
    * (default 504 bars = two trading years → ≤ 127k longs ≈ 1 MB),
    * never bars² over an unbounded history — the estimator reads
    * "the recent robust trend", which is also the honest statistic
    * (a decade-old price regime has no business voting on today's
    * slope). Median is an in-row array sort, no second shuffle.
    * Emitted micro value + the /10⁶ double (same IEEE division of
    * the same integer).
    */
  def theilSen(events: DataFrame, maxBars: Int = 504): DataFrame =
    theilSenC(closes(events), maxBars)

  /** [[theilSen]] over the persisted bar table — zero hash exchanges. */
  def theilSenFromBars(bars: DataFrame, maxBars: Int = 504): DataFrame =
    theilSenC(barCloses(bars), maxBars)

  private def theilSenC(cl: DataFrame, maxBars: Int): DataFrame = {
    require(maxBars >= 2, s"maxBars must be >= 2, got $maxBars")
    closesArr(cl)
      .filter(col("m") >= 2)
      .withColumn("w", least(col("m"), lit(maxBars)))
      .withColumn("tcs", expr("slice(cs, m - w + 1, w)"))
      .withColumn("slopes", expr(
        "flatten(transform(sequence(1, w - 1), i -> " +
          "transform(sequence(i + 1, w), j -> " +
          "CASE WHEN element_at(tcs, j) - element_at(tcs, i) >= 0L " +
          "THEN (2 * (element_at(tcs, j) - element_at(tcs, i)) * 10000 + (j - i)) div (2 * (j - i)) " +
          "ELSE -((2 * (element_at(tcs, i) - element_at(tcs, j)) * 10000 + (j - i)) div (2 * (j - i))) " +
          "END)))"))
      .withColumn("sorted", sort_array(col("slopes")))
      .withColumn("p", size(col("sorted")).cast("long"))
      .select(col("user_id"), col("p").as("n_pairs"),
        expr("element_at(sorted, CAST((p + 1) div 2 AS INT))").as("slope_micro"))
      .withColumn("slope", col("slope_micro").cast("double") / 1000000.0)
      .orderBy("user_id")
  }

  /** Two-sided CUSUM changepoint monitor per series, self-calibrated
    * and ALL-INTEGER: target μ = lower-median close, slack k =
    * HALF_UP(MAD/2) (MAD = lower-median absolute deviation), alarm
    * threshold h = 5·MAD; then the classic recursions S⁺ = max(0,
    * S⁺+(c−μ−k)), S⁻ = max(0, S⁻+(μ−c−k)) folded per series with
    * integer state, alarm when either side exceeds h. Flat series
    * (MAD = 0) still emit — any deviation alarms immediately, which
    * is the right reading for a constant signal. Recursive-CTE
    * oracle; lower medians keep every statistic an exact element of
    * the data.
    */
  def cusumChangepoint(events: DataFrame): DataFrame =
    cusumChangepointC(closes(events))

  /** [[cusumChangepoint]] over the persisted bar table — zero hash
    * exchanges. */
  def cusumChangepointFromBars(bars: DataFrame): DataFrame =
    cusumChangepointC(barCloses(bars))

  private def cusumChangepointC(cl: DataFrame): DataFrame = {
    closesArr(cl)
      .filter(col("m") >= 2)
      .withColumn("mu", expr(
        "element_at(sort_array(cs), CAST((m + 1) div 2 AS INT))"))
      .withColumn("mad", expr(
        "element_at(sort_array(transform(cs, x -> abs(x - mu))), CAST((m + 1) div 2 AS INT))"))
      .withColumn("st", graft.plans.ScanExprs.arrayScanSql(
        // scan state (sp, sn); k = HALF_UP(mad/2) = (2·mad+2) div 4
        col("cs"), expr("named_struct('sp', 0L, 'sn', 0L)"),
        "acc_s", "x_s",
        "named_struct(" +
          "'sp', greatest(0L, acc_s.sp + (x_s - mu - ((2 * mad + 2) div 4))), " +
          "'sn', greatest(0L, acc_s.sn + (mu - x_s - ((2 * mad + 2) div 4))))"))
      .withColumn("days", expr("transform(rows, r -> r.day)"))
      .select(col("user_id"), col("mu"), col("mad"),
        posexplode(arrays_zip(col("days"), expr("slice(st, 2, m)").as("s"))))
      .select(col("user_id"), col("col.days").as("day"),
        (col("mu").cast("double") / 100.0).as("target"),
        col("col.s.sp").as("s_pos"),
        col("col.s.sn").as("s_neg"),
        (col("col.s.sp") > col("mad") * 5 || col("col.s.sn") > col("mad") * 5)
          .as("alarm"))
      .orderBy("user_id", "day")
  }

  /** The CUSUM calibration artifact — per-series (μ, MAD, the HALF_UP
    * slack k and the 5·MAD alarm threshold h) exactly as
    * [[cusumChangepoint]] self-calibrates them. This is the bounded
    * (|series| rows) static table the STREAMING monitor
    * ([[graft.streaming.StreamingRollups.cusumStream]]) joins against:
    * batch calibrates offline, the stream replays the identical
    * integer recursion live.
    */
  def cusumCalibration(events: DataFrame): DataFrame =
    closesArr(closes(events))
      .filter(col("m") >= 2)
      .withColumn("mu", expr(
        "element_at(sort_array(cs), CAST((m + 1) div 2 AS INT))"))
      .withColumn("mad", expr(
        "element_at(sort_array(transform(cs, x -> abs(x - mu))), CAST((m + 1) div 2 AS INT))"))
      .select(col("user_id"), col("mu"), col("mad"),
        expr("(2 * mad + 2) div 4").as("k"),
        (col("mad") * 5).as("h"))

  /** Holt linear (double) exponential smoothing per series with
    * α = β = 1/2 — the halving coefficients keep every step ONE
    * positive/signed HALF_UP integer op in micro-cents: level l_t =
    * HALF_UP((x_t + l_{t−1} + b_{t−1})/2), trend b_t =
    * HALF_UP((b_{t−1} + (l_t − l_{t−1}))/2), seeded l₁ = x₁, b₁ = 0.
    * Emits level/trend and the one-step-ahead forecast l+b per day —
    * the streaming-friendly forecaster ([[Finance.macd]]'s fold
    * shape; recursive-CTE oracle).
    */
  def holtLinear(events: DataFrame): DataFrame =
    holtLinearC(closes(events))

  /** [[holtLinear]] over the persisted bar table — zero hash
    * exchanges. */
  def holtLinearFromBars(bars: DataFrame): DataFrame =
    holtLinearC(barCloses(bars))

  private def holtLinearC(cl: DataFrame): DataFrame = {
    // signed HALF_UP halving as a composable fragment
    def half(num: String) =
      s"(CASE WHEN ($num) >= 0L THEN (($num) + 1) div 2 " +
        s"ELSE -((-($num) + 1) div 2) END)"
    // state carries (l, f = l + b): l_t = HALF_UP((x + f)/2),
    // b_t = HALF_UP((f + l_t − 2l)/2), f_t = l_t + b_t
    val f0 = "acc_s.f"
    val l0 = "acc_s.l"
    val lt = half(s"x_s + $f0")
    val bt = half(s"$f0 + $lt - 2 * $l0")
    closesArr(cl)
      .withColumn("xs", expr("transform(cs, x -> x * 1000000L)"))
      .withColumn("st", graft.plans.ScanExprs.arrayScanSql(
        expr("slice(xs, 2, m - 1)"),
        expr("named_struct('l', element_at(xs, 1), 'f', element_at(xs, 1))"),
        "acc_s", "x_s",
        s"named_struct('l', $lt, 'f', $lt + $bt)"))
      .withColumn("days", expr("transform(rows, r -> r.day)"))
      .select(col("user_id"), posexplode(arrays_zip(col("days"), col("st"))))
      .select(col("user_id"), col("col.days").as("day"),
        (col("col.st.l").cast("double") / 100000000.0).as("level"),
        ((col("col.st.f") - col("col.st.l")).cast("double") / 100000000.0).as("trend"),
        (col("col.st.f").cast("double") / 100000000.0).as("forecast"))
      .orderBy("user_id", "day")
  }

  /** The per-series pivot of [[acfTable]] rows at lags 1..3 —
    * (user_id, m, r1, r2, r3), each r possibly NULL where the lag was
    * degenerate. Feeds [[pacf]].
    */
  private def acfPivot3(cl: DataFrame): DataFrame =
    acfTable(cl, 3)
      .groupBy("user_id")
      .agg(first(col("m")).as("m"),
        max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"),
        max(when(col("lag") === 3, col("acf"))).as("r3"))

  /** Ljung–Box portmanteau statistic per series over lags 1..5:
    * Q = m(m+2)·Σ r_L²/(m−L) from the SAME 6dp-rounded ACF values the
    * [[acfLags]] gate pins — identical inputs, and the sum is written
    * out lag by lag in one fixed left-to-right expression (never a
    * SQL aggregate, whose merge order floats), so both engines run
    * the identical IEEE chain. Degenerate lags contribute 0 and
    * `lags_used` counts the live ones; a series with no live lag
    * (constant closes) drops. Same one-exchange shape as the ACF.
    */
  def ljungBox(events: DataFrame): DataFrame =
    ljungBoxC(closes(events))

  /** [[ljungBox]] over the persisted bar table — zero hash
    * exchanges. */
  def ljungBoxFromBars(bars: DataFrame): DataFrame =
    ljungBoxC(barCloses(bars))

  private def ljungBoxC(cl: DataFrame): DataFrame = {
    def term(i: Int) = coalesce(
      col(s"r$i") * col(s"r$i") / (col("m") - i).cast("double"), lit(0.0))
    acfTable(cl, 5)
      .groupBy("user_id")
      .agg(first(col("m")).as("m"),
        max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"),
        max(when(col("lag") === 3, col("acf"))).as("r3"),
        max(when(col("lag") === 4, col("acf"))).as("r4"),
        max(when(col("lag") === 5, col("acf"))).as("r5"),
        count(lit(1)).as("lags_used"))
      .select(col("user_id"), col("m").cast("long").as("n_days"),
        col("lags_used"),
        (round((col("m") * (col("m") + 2)).cast("double") *
          (term(1) + term(2) + term(3) + term(4) + term(5)), 6)
          + lit(0.0)).as("q_stat"))
      .orderBy("user_id")
  }

  /** Partial autocorrelation at lags 1..3 per series, in CLOSED FORM
    * off the same rounded ACF values (Cramer on the Toeplitz
    * correlation matrix — for fixed small lags the determinant ratio
    * beats replaying Durbin–Levinson's vector state in two engines):
    * φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₃₃ = (r₃ − r₁r₂ − r₁²r₃ +
    * r₁r₂² + r₁³ − r₁r₂)/(1 − 2r₁² + 2r₁²r₂ − r₂²). Each polynomial
    * is written with the identical token sequence on both sides, so
    * the IEEE chain matches; lags whose inputs are missing or whose
    * denominator is within 1e−12 of singular drop in both engines.
    */
  def pacf(events: DataFrame): DataFrame =
    pacfC(closes(events))

  /** [[pacf]] over the persisted bar table — zero hash exchanges. */
  def pacfFromBars(bars: DataFrame): DataFrame =
    pacfC(barCloses(bars))

  private def pacfC(cl: DataFrame): DataFrame = {
    val p = acfPivot3(cl)
    val l1 = p.filter(col("r1").isNotNull)
      .select(col("user_id"), lit(1L).as("lag"), col("r1").as("pacf"))
    val l2 = p.filter(col("r1").isNotNull && col("r2").isNotNull)
      .filter(expr("abs(1 - r1*r1) > 1e-12"))
      .select(col("user_id"), lit(2L).as("lag"),
        (expr("round((r2 - r1*r1) / (1 - r1*r1), 6)") + lit(0.0)).as("pacf"))
    val l3 = p.filter(col("r1").isNotNull && col("r2").isNotNull && col("r3").isNotNull)
      .filter(expr("abs(1 - 2*r1*r1 + 2*r1*r1*r2 - r2*r2) > 1e-12"))
      .select(col("user_id"), lit(3L).as("lag"),
        (expr("round((r3 - r1*r2 - r1*r1*r3 + r1*r2*r2 + r1*r1*r1 - r1*r2) / " +
          "(1 - 2*r1*r1 + 2*r1*r1*r2 - r2*r2), 6)") + lit(0.0)).as("pacf"))
    l1.unionByName(l2).unionByName(l3).orderBy("user_id", "lag")
  }

  /** Classical additive seasonal decomposition of daily closes by
    * weekday: trend = centered 7-bar moving average (full frames
    * only, positive HALF_UP (2Σ+7) div 14), detrended = c − trend
    * (exact cents), seasonal index = signed HALF_UP mean of the
    * detrended values per weekday (computed over exactly the rows
    * where the trend exists), remainder = detrended − seasonal. The
    * seasonal indices are NOT re-centered — the convention is pinned
    * by the gate and documented here. Weekday is the engine-neutral
    * (day − 1970-01-05) mod 7 (Monday = 0), never a bare DOW
    * builtin (Spark and DuckDB disagree on week start). Two windows
    * over the same series-keyed exchange, no join.
    */
  def seasonalDecompose(events: DataFrame): DataFrame =
    seasonalDecomposeC(closes(events))

  /** [[seasonalDecompose]] over the persisted bar table — zero hash
    * exchanges (the (user_id, wd) window's clustered distribution is
    * satisfied by the user_id bucket layout). */
  def seasonalDecomposeFromBars(bars: DataFrame): DataFrame =
    seasonalDecomposeC(barCloses(bars))

  private def seasonalDecomposeC(cl: DataFrame): DataFrame = {
    val w7 = Window.partitionBy("user_id").orderBy("day").rowsBetween(-3, 3)
    val wd = Window.partitionBy("user_id", "wd")
    cl
      .withColumn("s7", sum(col("c")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("trend_c", when(col("n7") === 7, expr("(2 * s7 + 7) div 14")))
      .withColumn("detr", col("c") - col("trend_c"))
      .withColumn("wd", expr("datediff(to_date(day), DATE '1970-01-05') % 7"))
      .withColumn("sd", sum(col("detr")).over(wd))
      .withColumn("ct", count(col("detr")).over(wd))
      .filter(col("detr").isNotNull)
      .withColumn("seas_c", expr(
        "CASE WHEN sd >= 0 THEN (2 * sd + ct) div (2 * ct) " +
          "ELSE -((2 * (-sd) + ct) div (2 * ct)) END"))
      .select(col("user_id"), col("day"), col("wd").cast("long").as("weekday"),
        (col("trend_c").cast("double") / 100.0).as("trend"),
        (col("seas_c").cast("double") / 100.0).as("seasonal"),
        ((col("detr") - col("seas_c")).cast("double") / 100.0).as("remainder"))
      .orderBy("user_id", "day")
  }

  /** Hampel outlier filter over daily closes: rolling ±3-bar window
    * (full frames only), center = LOWER MEDIAN (rank 4 of 7 — an
    * exact element, no averaging), spread = lower-median absolute
    * deviation from that center, flag when |c − med| > 3·MAD, and
    * the cleaned series substitutes the window median for flagged
    * points — the standard despiking pass in front of any indicator.
    * All integer compares; one window, in-row array sorts.
    */
  def hampelFilter(events: DataFrame): DataFrame =
    hampelFilterC(closes(events))

  /** [[hampelFilter]] over the persisted bar table — zero hash
    * exchanges. */
  def hampelFilterFromBars(bars: DataFrame): DataFrame =
    hampelFilterC(barCloses(bars))

  private def hampelFilterC(cl: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-3, 3)
    cl
      .withColumn("vals", collect_list(col("c")).over(w))
      .filter(size(col("vals")) === 7)
      .withColumn("med", expr("element_at(array_sort(vals), 4)"))
      .withColumn("mad", expr(
        "element_at(array_sort(transform(vals, x -> abs(x - med))), 4)"))
      .withColumn("outlier", expr("abs(c - med) > 3 * mad"))
      .select(col("user_id"), col("day"),
        (col("c").cast("double") / 100.0).as("close"),
        (col("med").cast("double") / 100.0).as("win_median"),
        (col("mad").cast("double") / 100.0).as("win_mad"),
        col("outlier"),
        (when(col("outlier"), col("med")).otherwise(col("c"))
          .cast("double") / 100.0).as("cleaned"))
      .orderBy("user_id", "day")
  }

  /** Calendar-gap interpolation of daily closes: for each pair of
    * consecutive bars more than one day apart, emit the interior
    * days with the linearly interpolated close — c_prev + signed
    * HALF_UP((c_next − c_prev)·k / gap) in exact cents — flagged
    * `interpolated`, unioned with the original bars. The missing-data
    * companion to forward fill (series_fill_forward) when the
    * consumer wants a trend-preserving fill. Per-series lead + a
    * gap-bounded explode; no extra exchange.
    */
  def seriesInterpolate(events: DataFrame): DataFrame =
    seriesInterpolateC(closes(events))

  /** [[seriesInterpolate]] over the persisted bar table — zero hash
    * exchanges. */
  def seriesInterpolateFromBars(bars: DataFrame): DataFrame =
    seriesInterpolateC(barCloses(bars))

  private def seriesInterpolateC(cl: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val t = cl
      .withColumn("nd", lead(col("day"), 1).over(w))
      .withColumn("nc", lead(col("c"), 1).over(w))
      .withColumn("gap", expr("datediff(to_date(nd), to_date(day))"))
    val orig = t.select(col("user_id"), col("day"),
      (col("c").cast("double") / 100.0).as("close"),
      lit(false).as("interpolated"))
    val interp = t.filter(col("gap") > 1)
      .select(col("user_id"), col("day"), col("c"), col("nc"),
        col("gap").cast("long").as("gap"),
        explode(expr("sequence(1, CAST(gap - 1 AS INT))")).as("k"))
      .withColumn("iday", expr(
        "date_format(date_add(to_date(day), k), 'yyyy-MM-dd')"))
      .withColumn("ic", expr(
        "c + (CASE WHEN nc >= c THEN (2 * (nc - c) * k + gap) div (2 * gap) " +
          "ELSE -((2 * (c - nc) * k + gap) div (2 * gap)) END)"))
      .select(col("user_id"), col("iday").as("day"),
        (col("ic").cast("double") / 100.0).as("close"),
        lit(true).as("interpolated"))
    orig.unionByName(interp).orderBy("user_id", "day")
  }

  /** Lead-lag cross-correlation of each series' daily close CHANGES
    * against the LEAVE-ONE-OUT market change at lags −3..+3 (positive
    * lag = the market moved first): x_t = c_t − c_{t−1} per series,
    * market M_d = Σ over all series of that day's change, y = M_{t−lag}
    * minus the series' own change that day (else every series
    * "correlates" with itself through the sum). Pearson over the
    * matched calendar days with exact BIGINT moments and the pinned
    * √vx·√vy denominator; degenerate cells drop.
    *
    * LAG-AXIS CONVENTION (pinned here and by a spec): lags are
    * CALENDAR-day shifts (date_add), NOT row shifts — a Monday's
    * lag-1 market day is Sunday, and if that calendar day has no bar
    * the pair simply doesn't form (inner join), it does NOT slide to
    * Friday. The deliberate contrast is [[forecastSkill]], whose
    * seasonal-naive lag is a ROW shift: a forecast benchmark wants
    * "7 bars ago" whatever the calendar did, while a lead-lag
    * cross-correlogram is meaningless unless both sides moved over
    * the SAME interval — mixing weekend-gapped pairs into lag k
    * would smear lag k+2's signal into it.
    *
    * Shapes: the market table is |days| rows → broadcast; the
    * leave-one-out join shuffles on (series, day) — the
    * co-partitioned key.
    */
  def ccfMarket(events: DataFrame, maxLag: Int = 3): DataFrame =
    ccfMarketC(closes(events), maxLag)

  /** [[ccfMarket]] over the persisted bar table. NOT zero-exchange by
    * design: the market aggregate re-keys bars by DAY (a different
    * key than the bucket layout), and the leave-one-out join keys on
    * (series, day) — but everything past the first projection is
    * |series|·|days| bar rows, never ticks, so the exchanges move the
    * compact artifact only. */
  def ccfMarketFromBars(bars: DataFrame, maxLag: Int = 3): DataFrame =
    ccfMarketC(barCloses(bars), maxLag)

  private def ccfMarketC(cl: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy("user_id").orderBy("day")
    val d = cl
      .withColumn("pv", lag(col("c"), 1).over(w))
      .filter(col("pv").isNotNull)
      .withColumn("dv", col("c") - col("pv"))
      .select("user_id", "day", "dv")
    val mk = d.groupBy("day").agg(sum(col("dv")).as("mv"))
      .withColumnRenamed("day", "mday")
    d.select(col("user_id"), col("day"), col("dv"),
        explode(expr(s"sequence(${-maxLag}, $maxLag)")).as("lag"))
      .withColumn("mday", expr(
        "date_format(date_add(to_date(day), -lag), 'yyyy-MM-dd')"))
      .join(broadcast(mk), Seq("mday"))
      .join(d.select(col("user_id"), col("day").as("mday"),
        col("dv").as("sv")), Seq("user_id", "mday"), "left")
      .withColumn("y", col("mv") - coalesce(col("sv"), lit(0L)))
      .groupBy(col("user_id"), col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("k"),
        sum(col("dv")).as("sx"), sum(col("y")).as("sy"),
        sum(col("dv") * col("dv")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("dv") * col("y")).as("sxy"))
      .withColumn("vx", col("k") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("k") * col("syy") - col("sy") * col("sy"))
      .filter(col("k") >= 2 && col("vx") > 0 && col("vy") > 0)
      .select(col("user_id"), col("lag"), col("k").as("n_pairs"),
        (round((col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(col("vx").cast("double")) * sqrt(col("vy").cast("double"))), 6)
          + lit(0.0)).as("ccf"))
      .orderBy("user_id", "lag")
  }

  /** Forecast-skill report per series: MAE of the naive (lag-1) and
    * seasonal-naive (lag-7 BARS — row lag, not calendar, the
    * convention pinned here) forecasts in HALF_UP cents, plus MASE
    * as HALF_UP basis points of exact integers —
    * (10⁴·Σ|e₇|·n₁)/(Σ|e₁|·n₇). MASE < 10000 bp means weekly
    * seasonality beats yesterday's value — the one-line answer to
    * "is there a weekly pattern worth modeling". Series whose naive
    * error is zero (constant) drop. One exchange, two lags, one
    * aggregate.
    */
  def forecastSkill(events: DataFrame): DataFrame =
    forecastSkillC(closes(events))

  /** [[forecastSkill]] over the persisted bar table — zero hash
    * exchanges. */
  def forecastSkillFromBars(bars: DataFrame): DataFrame =
    forecastSkillC(barCloses(bars))

  private def forecastSkillC(cl: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    cl
      .withColumn("p1", lag(col("c"), 1).over(w))
      .withColumn("p7", lag(col("c"), 7).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("m"),
        sum(abs(col("c") - col("p1"))).as("sum1"), count(col("p1")).as("n1"),
        sum(abs(col("c") - col("p7"))).as("sum7"), count(col("p7")).as("n7"))
      .filter(col("n7") >= 1 && col("sum1") > 0)
      .select(col("user_id"), col("m").cast("long").as("n_days"),
        (expr("(2 * sum1 + n1) div (2 * n1)").cast("double") / 100.0).as("mae_naive"),
        (expr("(2 * sum7 + n7) div (2 * n7)").cast("double") / 100.0).as("mae_snaive"),
        expr("(2 * sum7 * n1 * 10000 + (sum1 * n7)) div (2 * (sum1 * n7))")
          .as("mase_bp"))
      .orderBy("user_id")
  }

  /** Lo–MacKinlay variance-ratio test per series at horizon `q`:
    * VR(q) = Var(c_t − c_{t−q}) / (q · Var(c_t − c_{t−1})) over
    * overlapping q-bar differences — the random-walk diagnostic
    * (VR ≈ 1 random walk, > 1 momentum, < 1 mean reversion). Both
    * variances enter as the EXACT integer identity n·Σd² − (Σd)²
    * (biased variance × n², so the n² factors carry into the ratio:
    * VR = (vq·n1²)/(q·v1·nq²)); the ratio is ONE pinned float chain —
    * left-associated multiplies of exact integers then a single
    * division, the identical IEEE sequence in both engines, 6dp
    * round. Constant series (v1 = 0) drop. One exchange, two lags,
    * one aggregate — forecastSkill's shape.
    */
  def varianceRatio(events: DataFrame, q: Int = 5): DataFrame =
    varianceRatioC(closes(events), q)

  /** [[varianceRatio]] over the persisted bar table — zero hash
    * exchanges. */
  def varianceRatioFromBars(bars: DataFrame, q: Int = 5): DataFrame =
    varianceRatioC(barCloses(bars), q)

  private def varianceRatioC(cl: DataFrame, q: Int): DataFrame = {
    require(q >= 2, s"q must be >= 2, got $q")
    val w = Window.partitionBy("user_id").orderBy("day")
    cl
      .withColumn("d1", col("c") - lag(col("c"), 1).over(w))
      .withColumn("dq", col("c") - lag(col("c"), q).over(w))
      .groupBy("user_id")
      .agg(count(col("d1")).as("n1"), sum(col("d1")).as("s1"),
        sum(col("d1") * col("d1")).as("s11"),
        count(col("dq")).as("nq"), sum(col("dq")).as("sq"),
        sum(col("dq") * col("dq")).as("sqq"))
      .withColumn("v1", col("n1") * col("s11") - col("s1") * col("s1"))
      .withColumn("vq", col("nq") * col("sqq") - col("sq") * col("sq"))
      .filter(col("nq") >= 2 && col("v1") > 0)
      .select(col("user_id"), lit(q.toLong).as("q"),
        col("n1").as("n_diffs"),
        (round((col("vq").cast("double") * col("n1") * col("n1")) /
          (lit(q.toDouble) * col("v1").cast("double") * col("nq") * col("nq")), 6)
          + lit(0.0)).as("vr"))
      .orderBy("user_id")
  }

  /** Wald–Wolfowitz runs test on the SIGNS of daily close changes per
    * series — the non-parametric randomness check next to the ACF's
    * linear one: zero changes drop (the standard convention), R =
    * 1 + (sign flips) over the remaining sequence, and with n⁺ ups /
    * n⁻ downs (n = n⁺+n⁻) the z-score compares R against E[R] =
    * 1 + 2n⁺n⁻/n with Var[R] = 2n⁺n⁻(2n⁺n⁻−n)/(n²(n−1)). Counts and
    * R are exact integers; E and Var are written as ONE fixed
    * left-to-right float chain (`2.0·n⁺·n⁻/n` etc.) evaluated
    * identically in both engines, 6dp round. Series with a zero
    * variance (all-same-sign, or n⁺n⁻ too small: 2n⁺n⁻ ≤ n) drop.
    * One exchange, one lag over the sign sequence, one aggregate.
    */
  def runsTest(events: DataFrame): DataFrame =
    runsTestC(closes(events))

  /** [[runsTest]] over the persisted bar table — zero hash
    * exchanges. */
  def runsTestFromBars(bars: DataFrame): DataFrame =
    runsTestC(barCloses(bars))

  private def runsTestC(cl: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    cl
      .withColumn("pv", lag(col("c"), 1).over(w))
      .filter(col("pv").isNotNull && col("c") =!= col("pv"))
      .withColumn("sgn", when(col("c") > col("pv"), 1L).otherwise(-1L))
      .withColumn("psgn", lag(col("sgn"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("np"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("nm"),
        (sum(when(col("psgn").isNotNull && col("sgn") =!= col("psgn"), 1L)
          .otherwise(0L)) + 1L).as("runs"))
      .filter(col("np") >= 1 && col("nm") >= 1 &&
        col("np") * col("nm") * 2 > col("n"))
      .select(col("user_id"), col("n").as("n_obs"), col("np").as("n_up"),
        col("nm").as("n_down"), col("runs"),
        // CAST(… AS DOUBLE), never bare decimal literals: Spark parses
        // `2.0` in SQL text as DECIMAL(2,1) and the whole chain silently
        // becomes decimal arithmetic that differs from DuckDB's double
        // math in the 6th decimal (caught by the gate on first run)
        (expr("round((runs - (CAST(1 AS DOUBLE) + CAST(2 AS DOUBLE) * np * nm / n)) / " +
          "sqrt((CAST(2 AS DOUBLE) * np * nm * (CAST(2 AS DOUBLE) * np * nm - n)) / " +
          "(CAST(n AS DOUBLE) * n * (n - 1))), 6)")
          + lit(0.0)).as("z"))
      .orderBy("user_id")
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per series with weekly
    * period m = 7 and α = β = γ = 1/2 — the halving coefficients keep
    * every recursion step ONE signed HALF_UP integer op in
    * micro-cents (the [[holtLinear]] discipline, extended with the
    * seasonal leg):
    *
    *   l_t = HALF_UP((x_t − s_{t−7} + l_{t−1} + b_{t−1}) / 2)
    *   b_t = HALF_UP((b_{t−1} + l_t − l_{t−1}) / 2)
    *   s_t = HALF_UP((x_t − l_t + s_{t−7}) / 2)
    *
    * seeded over the first 7 bars: l₇ = positive-HALF_UP mean of
    * x₁..x₇, b₇ = 0, s_i = x_i − l₇ for i = 1..7; emissions start at
    * bar 8 (series shorter than 8 bars drop). The one-step forecast
    * is l_t + b_t + s_{t−6} (next bar's seasonal index). The
    * recursion runs as an O(m) `array_scan` whose state carries the
    * 7-element seasonal ring — the same list the oracle's recursive
    * CTE carries. Completes the exponential-smoothing ladder
    * (SES → [[holtLinear]] → seasonal) with the same one-exchange
    * per-series fold shape.
    */
  def holtWinters(events: DataFrame): DataFrame =
    holtWintersC(closes(events))

  /** [[holtWinters]] over the persisted bar table — zero hash
    * exchanges. */
  def holtWintersFromBars(bars: DataFrame): DataFrame =
    holtWintersC(barCloses(bars))

  private def holtWintersC(cl: DataFrame): DataFrame = {
    def half(num: String) =
      s"(CASE WHEN ($num) >= 0L THEN (($num) + 1) div 2 " +
        s"ELSE -((-($num) + 1) div 2) END)"
    // the scan state carries the 7-element seasonal ring alongside
    // (l, b): ring head = s_{t−7} (this step's seasonal input), ring
    // position 2 = s_{t−6} (the one-step forecast's seasonal) — the
    // same list the oracle's recursive CTE carries
    val sm = "element_at(acc_s.seas, 1)"
    val l0p = "acc_s.l"
    val b0p = "acc_s.b"
    val lt = half(s"x_s - $sm + $l0p + $b0p")
    val bt = half(s"$b0p + $lt - $l0p")
    val st = half(s"x_s - $lt + $sm")
    closesArr(cl)
      .filter(col("m") >= 8)
      .withColumn("xs", expr("transform(cs, x -> x * 1000000L)"))
      .withColumn("l0", expr(
        "(2 * aggregate(slice(xs, 1, 7), 0L, (a, x) -> a + x) + 7) div 14"))
      .withColumn("stt", graft.plans.ScanExprs.arrayScanSql(
        expr("slice(xs, 8, m - 7)"),
        expr("named_struct('l', l0, 'b', 0L, 's', 0L, 'f', 0L, " +
          "'seas', transform(slice(xs, 1, 7), x -> x - l0))"),
        "acc_s", "x_s",
        s"named_struct('l', $lt, 'b', $bt, 's', $st, " +
          s"'f', $lt + $bt + element_at(acc_s.seas, 2), " +
          s"'seas', concat(slice(acc_s.seas, 2, 6), array($st)))"))
      .withColumn("days", expr("transform(rows, r -> r.day)"))
      .select(col("user_id"),
        posexplode(arrays_zip(expr("slice(days, 8, m - 7)").as("day"),
          expr("slice(stt, 2, m - 7)").as("hw"))))
      .select(col("user_id"), col("col.day").as("day"),
        (col("col.hw.l").cast("double") / 100000000.0).as("level"),
        (col("col.hw.b").cast("double") / 100000000.0).as("trend"),
        (col("col.hw.s").cast("double") / 100000000.0).as("seasonal"),
        (col("col.hw.f").cast("double") / 100000000.0).as("forecast"))
      .orderBy("user_id", "day")
  }
}
