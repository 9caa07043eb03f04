package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object TimeSeries {

  private def closes(events: DataFrame): DataFrame =
    Finance.dailyBars(events).select("user_id", "day", "c")

  private def closesArr(events: DataFrame): DataFrame =
    closes(events)
      .groupBy("user_id")
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
  def acfLags(events: DataFrame, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    closesArr(events)
      .select(col("user_id"), col("cs"), col("m"),
        explode(expr(s"sequence(1, $maxLag)")).as("lag"))
      .filter(col("m") - col("lag") >= 2)
      .withColumn("k", col("m") - col("lag"))
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
      .select(col("user_id"), col("lag").cast("long").as("lag"),
        (round((col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(col("vx").cast("double")) * sqrt(col("vy").cast("double"))), 6)
          + lit(0.0)).as("acf"))
      .orderBy("user_id", "lag")
  }

  /** Kendall's tau-b of daily closes AGAINST TIME per series — the
    * robust monotone-trend test (is this series drifting, ignoring
    * magnitude): C−D = Σ_{i<j} sign(c_j − c_i) exact over all bar
    * pairs (time has no ties, so t_x = 0), tie correction from equal
    * closes, tau = (C−D)/(√n₀·√(n₀−t_y)). The pair scan is one
    * nested fold per series (O(bars²), bounded by the bar count).
    * All-tied series drop (undefined tau) in both engines.
    */
  def kendallTrend(events: DataFrame): DataFrame = {
    closesArr(events)
      .filter(col("m") >= 2)
      // one nested fold carries (C−D, ties) together
      .withColumn("p", expr(
        "aggregate(sequence(1, m - 1), named_struct('cd', 0L, 'ties', 0L), " +
          "(a, i) -> named_struct(" +
          "'cd', a.cd + aggregate(slice(cs, i + 1, m - i), 0L, (b, y) -> b + " +
          "CASE WHEN y > element_at(cs, i) THEN 1L WHEN y < element_at(cs, i) THEN -1L ELSE 0L END), " +
          "'ties', a.ties + aggregate(slice(cs, i + 1, m - i), 0L, (b, y) -> b + " +
          "CASE WHEN y = element_at(cs, i) THEN 1L ELSE 0L END)))"))
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
  def theilSen(events: DataFrame, maxBars: Int = 504): DataFrame = {
    require(maxBars >= 2, s"maxBars must be >= 2, got $maxBars")
    closesArr(events)
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
  def cusumChangepoint(events: DataFrame): DataFrame = {
    closesArr(events)
      .filter(col("m") >= 2)
      .withColumn("mu", expr(
        "element_at(sort_array(cs), CAST((m + 1) div 2 AS INT))"))
      .withColumn("mad", expr(
        "element_at(sort_array(transform(cs, x -> abs(x - mu))), CAST((m + 1) div 2 AS INT))"))
      .withColumn("st", expr(
        // fold state (sp, sn); k = HALF_UP(mad/2) = (2·mad+2) div 4
        "aggregate(cs, array(named_struct('sp', 0L, 'sn', 0L)), " +
          "(acc, x) -> concat(acc, array(named_struct(" +
          "'sp', greatest(0L, element_at(acc, -1).sp + (x - mu - ((2 * mad + 2) div 4))), " +
          "'sn', greatest(0L, element_at(acc, -1).sn + (mu - x - ((2 * mad + 2) div 4)))))))"))
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

  /** Holt linear (double) exponential smoothing per series with
    * α = β = 1/2 — the halving coefficients keep every step ONE
    * positive/signed HALF_UP integer op in micro-cents: level l_t =
    * HALF_UP((x_t + l_{t−1} + b_{t−1})/2), trend b_t =
    * HALF_UP((b_{t−1} + (l_t − l_{t−1}))/2), seeded l₁ = x₁, b₁ = 0.
    * Emits level/trend and the one-step-ahead forecast l+b per day —
    * the streaming-friendly forecaster ([[Finance.macd]]'s fold
    * shape; recursive-CTE oracle).
    */
  def holtLinear(events: DataFrame): DataFrame = {
    // signed HALF_UP halving as a composable fragment
    def half(num: String) =
      s"(CASE WHEN ($num) >= 0L THEN (($num) + 1) div 2 " +
        s"ELSE -((-($num) + 1) div 2) END)"
    // state carries (l, f = l + b): l_t = HALF_UP((x + f)/2),
    // b_t = HALF_UP((f + l_t − 2l)/2), f_t = l_t + b_t
    val f0 = "element_at(acc, -1).f"
    val l0 = "element_at(acc, -1).l"
    val lt = half(s"x + $f0")
    val bt = half(s"$f0 + $lt - 2 * $l0")
    closesArr(events)
      .withColumn("xs", expr("transform(cs, x -> x * 1000000L)"))
      .withColumn("st", expr(
        "aggregate(slice(xs, 2, m - 1), " +
          "array(named_struct('l', element_at(xs, 1), 'f', element_at(xs, 1))), " +
          s"(acc, x) -> concat(acc, array(named_struct('l', $lt, 'f', $lt + $bt))))"))
      .withColumn("days", expr("transform(rows, r -> r.day)"))
      .select(col("user_id"), posexplode(arrays_zip(col("days"), col("st"))))
      .select(col("user_id"), col("col.days").as("day"),
        (col("col.st.l").cast("double") / 100000000.0).as("level"),
        ((col("col.st.f") - col("col.st.l")).cast("double") / 100000000.0).as("trend"),
        (col("col.st.f").cast("double") / 100000000.0).as("forecast"))
      .orderBy("user_id", "day")
  }
}
