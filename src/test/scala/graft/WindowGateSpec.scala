package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** The r6 verdict's plan gate, machine-checked: NO query may run an
  * unpartitioned window (`WindowExec` "No Partition Defined" — the
  * whole input through one task) over an SF-scaling input. Queries
  * whose unpartitioned windows are genuinely DOMAIN-bounded (a
  * post-limit seed set, a k-bounded sketch row set, a time grid) are
  * whitelisted EXPLICITLY with the bounding argument, so the claim
  * "everything else is partitioned" is asserted, not narrated.
  *
  * The check walks the analyzed logical plan (incl. subqueries) of
  * every SparkEntry query: a logical Window with an empty
  * partitionSpec is exactly what becomes the single-task WindowExec.
  */
class WindowGateSpec extends SparkSpec {

  /** name -> why its unpartitioned window input is NOT SF-scaling. */
  private val whitelist: Map[String, String] = Map(
    "q_agg_kmv_intersect" ->
      "windows run over the k-bounded KMV synopses (<= 2K hash rows, post row_number<=K filter)",
    "q_agg_log_histogram" ->
      "cumulative over the bit-length bucket domain (<= 64 rows)",
    "q_agg_skyline" ->
      "global staircase pass runs only over the 32-bucket LOCAL skyline survivors (local-then-global reduction)",
    "q_eval_lift" ->
      "cumulative over distinct score values (n_chars domain) + the 10-row decile grid, not per-document rows",
    "q_eval_pr_curve" ->
      "cumulative over distinct score values (n_chars domain), not per-document rows",
    "q_sample_time_split" ->
      "cumulative over the distinct-seconds TIME grid (bounded by the time span, not data volume)",
    "q_ts_hazard" ->
      "cumulative over the hourly time-to-event grid (TIME-domain-bounded)",
    "q_ts_rolling_corr" ->
      "14-tap rolling frame over the DAILY grid (TIME-domain-bounded)",
    "q_vec_binary" ->
      "rank window over post-LIMIT top-10 rows",
    "q_vec_matryoshka" ->
      "rank window over post-LIMIT top-10 rows",
    "q_vec_sq8" ->
      "rank window over post-LIMIT top-10 rows")

  test("no unpartitioned window over an SF-scaling input") {
    val offenders = scala.collection.mutable.SortedMap[String, Int]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        val global = df.queryExecution.analyzed.collectWithSubqueries {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) offenders(name) = global.size
      } catch {
        case e: Throwable =>
          fail(s"$name: builder failed during gate: ${e.getMessage}")
      }
    }
    val unexplained = offenders.keySet -- whitelist.keySet
    val stale = whitelist.keySet -- offenders.keySet
    assert(unexplained.isEmpty,
      s"unpartitioned global windows without a bounding argument: " +
        s"${unexplained.map(n => s"$n(${offenders(n)})").mkString(", ")}")
    assert(stale.isEmpty,
      s"whitelist entries with no remaining global window " +
        s"(remove them): ${stale.mkString(", ")}")
  }
}
