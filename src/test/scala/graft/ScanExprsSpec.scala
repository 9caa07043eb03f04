package graft

import graft.plans.ScanExprs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** array_scan — the O(m) prefix fold. The load-bearing claim is
  * EXACT parity with the `aggregate(xs, array(seed), (acc, x) ->
  * concat(acc, array(step)))` idiom it replaces: same lambda tree,
  * same values, only the trajectory buffering differs.
  */
class ScanExprsSpec extends SparkSpec {

  import spark.implicits._

  test("scan equals the aggregate-concat idiom on a long-state fold") {
    // running sum with a HALF_UP halving — representative of the
    // integer indicator recursions
    val df = Seq((1L, Seq(3L, 9L, 2L, 7L, 5L)), (2L, Seq(10L)),
      (3L, Seq.empty[Long])).toDF("id", "xs")
    val step = "(CASE WHEN (acc_s + x_s) >= 0L THEN ((acc_s + x_s) + 1) div 2 " +
      "ELSE -((-(acc_s + x_s) + 1) div 2) END)"
    val viaScan = df.withColumn("st",
      ScanExprs.arrayScanSql(col("xs"), lit(0L), "acc_s", "x_s", step))
    val viaAgg = df.withColumn("st", expr(
      "aggregate(xs, array(0L), (acc_s2, x_s) -> concat(acc_s2, array(" +
        step.replace("acc_s", "element_at(acc_s2, -1)") + ")))"))
    assert(viaScan.select("id", "st").collect().toSeq ===
      viaAgg.select("id", "st").collect().toSeq)
    // trajectory includes the zero and one state per element
    val r = viaScan.filter($"id" === 1L).select("st").head.getSeq[Long](0)
    assert(r.length === 6 && r.head === 0L)
    // empty input → just the zero
    val e = viaScan.filter($"id" === 3L).select("st").head.getSeq[Long](0)
    assert(e === Seq(0L))
  }

  test("scan carries struct state and deep-copies each step") {
    // two-field state like the CUSUM/Holt folds; if the expression
    // failed to copy the lambda's result buffer, every trajectory
    // entry would alias the LAST state
    val df = Seq((1L, Seq(5L, -3L, 8L))).toDF("id", "xs")
    val out = df.withColumn("st",
      ScanExprs.arrayScanSql(col("xs"),
        expr("named_struct('s', 0L, 'mx', -999L)"), "a_s", "x_s",
        "named_struct('s', a_s.s + x_s, 'mx', greatest(a_s.mx, x_s))"))
      .select(explode(col("st")).as("s"))
      .select("s.s", "s.mx").collect().toSeq
    assert(out === Seq(Row(0L, -999L), Row(5L, 5L), Row(2L, 5L), Row(10L, 8L)))
  }

  test("scan of a null array is null; functional builder agrees") {
    val df = Seq((1L, Option(Seq(1L, 2L))), (2L, Option.empty[Seq[Long]]))
      .toDF("id", "xs")
    val out = df.withColumn("st",
      ScanExprs.arrayScan(col("xs"), lit(100L))((acc, x) => acc + x))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](2) === Seq(100L, 101L, 103L))
    assert(out(1).isNullAt(2))
  }

  test("scan step sees outer columns alongside the lambda variables") {
    val df = Seq((1L, Seq(1L, 2L, 3L), 10L)).toDF("id", "xs", "k")
    val r = df.withColumn("st",
      ScanExprs.arrayScanSql(col("xs"), lit(0L), "a_s", "x_s", "a_s + x_s * k"))
      .select("st").head.getSeq[Long](0)
    assert(r === Seq(0L, 10L, 30L, 60L))
  }
}
