package graft

/** Global plan guard over EVERY registered gate query: scale-shape
  * rules that must hold for the whole surface, not per-operator.
  * Catches a regression (an accidental cartesian, an unbounded
  * global single-partition stage) the moment it lands in ANY query,
  * including future ones — new queries are guarded by default.
  */
class PlanGuardSpec extends SparkSpec {

  // Queries whose plan legitimately contains an Exchange
  // SinglePartition, each with a bounded-size argument:
  //  - hll_cardinality / quantile_sketch: global one-row sketch merge
  //    (kilobytes into the final reduce)
  //  - api_paginate / api_report_list: page-bounded rn assignment
  //    (≤ page·limit rows on the single partition, by construction)
  //  - sample_target_mix: window over the L-row language-count frame
  //  - tfidf_top_terms: the one-row global doc count (idf numerator),
  //    broadcast back — the final reduce of a count is one row
  private val singlePartitionOk = Set(
    "hll_cardinality", "quantile_sketch",
    "api_paginate", "api_report_list",
    "sample_target_mix", "tfidf_top_terms")

  test("no gate query plans a cartesian product or an unbounded single partition") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("Exchange SinglePartition") && !singlePartitionOk(name))
        offenders += s"$name: Exchange SinglePartition"
    }
    assert(offenders.isEmpty, s"scale-shape violations:\n${offenders.mkString("\n")}")
  }
}
