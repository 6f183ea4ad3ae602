package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation & audit operators — the checks a training-data /
  * analytics platform runs over its own outputs: classifier-eval
  * metrics (exact ROC AUC), privacy audits (k-anonymity /
  * l-diversity), categorical-association profiling (chi-square /
  * Cramér's V), and a declarative data-quality expectations report
  * (the Great-Expectations shape: one scan, one verdict row per
  * declared check).
  *
  * All scores are integer-exact (micro units, floor-div) so the
  * DuckDB oracle is bit-stable.
  */
object Audit extends QueryModule {

  /** Exact ROC AUC per source, WITHOUT a global sort: AUC is the
    * Mann-Whitney statistic P(score_pos > score_neg) + ties/2. Group
    * once by (source, score) to per-value (pos, neg) cells, then a
    * window ordered by score over the DISTINCT VALUE DOMAIN ONLY
    * (cardinality = distinct scores, thousands — never corpus rows)
    * gives the cumulative negatives below each value:
    * num2 = Σ pos_s · (2·cum_neg_below + neg_s), AUC = num2 / (2PN).
    * Score = n_chars, positive class = lang 'en' — the doc-length
    * signal an acquisition gate would sanity-check.
    *
    * 100 TB posture: one (source,score) partial-agg shuffle; the
    * window runs over the collapsed value domain, like the skyline's
    * running pass. Sources with a degenerate class (P=0 or N=0)
    * report NULL, not a crash. */
  private val aucQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, dir)
      .select(col("source"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"))
      .groupBy(col("source"), col("score"))
      .agg(sum(col("is_pos")).as("p"),
        sum(lit(1L) - col("is_pos")).as("g"))
    val w = Window.partitionBy(col("source")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cg", coalesce(sum(col("g")).over(w), lit(0L)))
      .groupBy(col("source"))
      .agg(sum(col("p")).as("pos_n"), sum(col("g")).as("neg_n"),
        sum(col("p") * (lit(2L) * col("cg") + col("g"))).as("num2"))
      .withColumn("auc_micro",
        when(col("pos_n") > 0L && col("neg_n") > 0L,
          expr("(1000000 * num2) div (2 * pos_n * neg_n)")))
  }

  private val aucSql =
    """WITH b AS (
      |  SELECT source, n_chars AS score,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS p,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
      |      AS g
      |  FROM documents GROUP BY 1, 2),
      |w AS (
      |  SELECT source, p, g,
      |    COALESCE(SUM(g) OVER (PARTITION BY source ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cg
      |  FROM b)
      |SELECT source, CAST(SUM(p) AS BIGINT) AS pos_n,
      |  CAST(SUM(g) AS BIGINT) AS neg_n,
      |  CAST(SUM(p * (2 * cg + g)) AS BIGINT) AS num2,
      |  CAST(CASE WHEN SUM(p) > 0 AND SUM(g) > 0 THEN
      |    (1000000 * CAST(SUM(p * (2 * cg + g)) AS BIGINT))
      |      // (2 * CAST(SUM(p) AS BIGINT) * CAST(SUM(g) AS BIGINT))
      |  END AS BIGINT) AS auc_micro
      |FROM w GROUP BY 1""".stripMargin

  /** k-anonymity / l-diversity audit on customer: quasi-identifier =
    * (nation, account-balance band of width 2000); sensitive
    * attribute = market segment. Each QI equivalence class reports
    * its size k (re-identification resistance), its sensitive-value
    * diversity l, and the k<5 / l<2 violation flags — the table a
    * release-gate reads before publishing "anonymized" data.
    *
    * 100 TB posture: ONE groupBy shuffle on the QI key; l is a
    * count-distinct inside each class (Spark's partial-distinct
    * expansion keeps it map-combined). */
  private val kanonQ = (s: SparkSession, dir: String) => {
    Tables.customer(s, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 2000d).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("k_size"),
        countDistinct(col("c_mktsegment")).as("l_div"))
      .withColumn("viol_k", col("k_size") < 5L)
      .withColumn("viol_l", col("l_div") < 2L)
  }

  private val kanonSql =
    """SELECT c_nationkey,
      |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
      |  COUNT(*) AS k_size,
      |  COUNT(DISTINCT c_mktsegment) AS l_div,
      |  COUNT(*) < 5 AS viol_k,
      |  COUNT(DISTINCT c_mktsegment) < 2 AS viol_l
      |FROM customer
      |GROUP BY 1, 2""".stripMargin

  /** Categorical-association profile: chi-square + Cramér's V between
    * market segment and nation. Exact rational form: with row total r,
    * column total c, grand total n, the cell contribution
    * (obs − rc/n)²/(rc/n) = (n·obs − rc)²/(n·r·c); each cell is
    * floor-div'd in micro units THEN summed (the contract both engines
    * mirror). Zero cells contribute — the observed-category cross is
    * completed before scoring. V² = χ²/(n·min(R−1,C−1)).
    *
    * Magnitude: the cell numerator 10⁶·(n·obs − rc)² is computed in
    * DECIMAL(38) (Spark) / HUGEINT (DuckDB) with exact integral
    * division — the r8 sf1 screen caught the original plain-BIGINT
    * spelling overflowing exactly at its own documented bound
    * (|n·obs| ≈ 1.8·10⁸ at 150k customers; the square is 3·10²²).
    * Both engines spell the identical arithmetic, so the contract
    * stays hash-exact; numerator ≥ 0 so floor = truncate.
    *
    * 100 TB posture: three partial aggs over the same scan (cells, row
    * totals, column totals — all collapse to the category domain) and
    * broadcast-only joins after; nothing row-scale is shuffled. */
  private val contingencyQ = (s: SparkSession, dir: String) => {
    val cust = Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_nationkey"))
    val obs = cust.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("obs"))
    val rt = cust.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("r"))
    val ct = cust.groupBy(col("c_nationkey")).agg(count(lit(1)).as("c"))
    val n = cust.agg(count(lit(1)).as("n"))
    rt.crossJoin(broadcast(ct))
      .join(broadcast(obs), Seq("c_mktsegment", "c_nationkey"), "left")
      .na.fill(0L, Seq("obs"))
      .crossJoin(broadcast(n))
      .withColumn("cell_micro", expr(
        "CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * obs - CAST(r AS DECIMAL(38,0)) * c)" +
          " * (CAST(n AS DECIMAL(38,0)) * obs - CAST(r AS DECIMAL(38,0)) * c))" +
          " div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"))
      .agg(max(col("n")).as("n"),
        countDistinct(col("c_mktsegment")).as("r_cats"),
        countDistinct(col("c_nationkey")).as("c_cats"),
        sum(col("cell_micro")).as("chi2_micro"))
      .withColumn("dof", (col("r_cats") - 1L) * (col("c_cats") - 1L))
      .withColumn("v2_micro", expr(
        "chi2_micro div (n * least(r_cats - 1, c_cats - 1))"))
  }

  private val contingencySql =
    """WITH src AS (SELECT c_mktsegment, c_nationkey FROM customer),
      |o AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS obs
      |      FROM src GROUP BY 1, 2),
      |rt AS (SELECT c_mktsegment, COUNT(*) AS r FROM src GROUP BY 1),
      |ct AS (SELECT c_nationkey, COUNT(*) AS c FROM src GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n FROM src),
      |cells AS (
      |  SELECT rt.c_mktsegment, ct.c_nationkey, rt.r, ct.c, tot.n,
      |    COALESCE(o.obs, 0) AS obs
      |  FROM rt CROSS JOIN ct CROSS JOIN tot
      |  LEFT JOIN o ON o.c_mktsegment = rt.c_mktsegment
      |    AND o.c_nationkey = ct.c_nationkey),
      |scored AS (
      |  SELECT n, c_mktsegment, c_nationkey,
      |    CAST((1000000
      |        * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c)
      |        * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c))
      |      // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS cell_micro
      |  FROM cells)
      |SELECT MAX(n) AS n,
      |  COUNT(DISTINCT c_mktsegment) AS r_cats,
      |  COUNT(DISTINCT c_nationkey) AS c_cats,
      |  CAST(SUM(cell_micro) AS BIGINT) AS chi2_micro,
      |  (COUNT(DISTINCT c_mktsegment) - 1)
      |    * (COUNT(DISTINCT c_nationkey) - 1) AS dof,
      |  CAST(SUM(cell_micro) AS BIGINT)
      |    // (MAX(n) * least(COUNT(DISTINCT c_mktsegment) - 1,
      |                       COUNT(DISTINCT c_nationkey) - 1)) AS v2_micro
      |FROM scored""".stripMargin

  /** Declarative data-quality expectations over orders — the
    * Great-Expectations report shape: one verdict row per declared
    * check (not-null, positive domain, enum domain, key uniqueness,
    * referential integrity), each with its violation count, the scan
    * total, and a pass flag.
    *
    * 100 TB posture: the four column-level checks are CONDITIONAL
    * AGGREGATES IN ONE SCAN (stack()ed into rows after — never one
    * pass per check); the referential check is a broadcast anti-join
    * against the dim key set. */
  /** Functional-dependency audit — "does A determine B?" for candidate
    * FDs a schema review proposes: per candidate, the number of
    * determinant keys, how many keys VIOLATE (carry >1 distinct
    * dependent), the worst key's distinct count, and whether the FD
    * holds. One true FD (orderkey → custkey, a real key constraint)
    * rides along as the control. Exactly the dependency-discovery
    * primitive profilers (and normalization reviews) run first.
    *
    * 100 TB posture: each candidate is ONE determinant-keyed
    * partial-agg (count distinct per key collapses map-side), then a
    * 1-row rollup; candidates evaluate independently and union. */
  private val fdAuditQ = (s: SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    def audit(name: String, df: DataFrame, a: String, b: String) =
      df.groupBy(col(a)).agg(countDistinct(col(b)).as("nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("nd")).as("max_distinct"))
        .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
          col("max_distinct"),
          (col("n_violating") === 0L).as("holds"))
    audit("o_orderkey->o_custkey", o, "o_orderkey", "o_custkey")
      .unionByName(audit("o_custkey->o_orderpriority", o,
        "o_custkey", "o_orderpriority"))
      .unionByName(audit("l_orderkey->l_suppkey", li,
        "l_orderkey", "l_suppkey"))
      .unionByName(audit("l_partkey->l_returnflag", li,
        "l_partkey", "l_returnflag"))
  }

  private val fdAuditSql = {
    def one(name: String, t: String, a: String, b: String) =
      s"""SELECT '$name' AS fd, COUNT(*) AS n_keys,
         |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(MAX(nd) AS BIGINT) AS max_distinct,
         |  SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
         |FROM (SELECT $a, COUNT(DISTINCT $b) AS nd FROM $t GROUP BY 1)"""
        .stripMargin
    Seq(
      one("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
      one("o_custkey->o_orderpriority", "orders",
        "o_custkey", "o_orderpriority"),
      one("l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
      one("l_partkey->l_returnflag", "lineitem",
        "l_partkey", "l_returnflag")).mkString("\nUNION ALL\n")
  }

  private val dqQ = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
    val colChecks = o.agg(
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("v1"),
        sum(when(col("o_totalprice").isNull
          || col("o_totalprice") <= 0d, 1L).otherwise(0L)).as("v2"),
        sum(when(col("o_orderstatus").isNull
          || !col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("v3"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v4"),
        count(lit(1)).as("total"))
      .selectExpr(
        """stack(4,
          |  'orderdate_not_null', v1,
          |  'totalprice_positive', v2,
          |  'orderstatus_in_domain', v3,
          |  'orderkey_unique', v4) AS (expectation, violations)"""
          .stripMargin,
        "total")
    val refCheck = o
      .join(Tables.customer(s, dir).select(col("c_custkey")),
        o("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(o.agg(count(lit(1)).as("total"))))
      .select(lit("custkey_references_customer").as("expectation"),
        col("violations"), col("total"))
    colChecks.unionByName(refCheck)
      .withColumn("passed", col("violations") === 0L)
  }

  private val dqSql =
    """WITH base AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v1,
      |    CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |    CAST(SUM(CASE WHEN o_orderstatus IS NULL
      |      OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v3,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v4,
      |    COUNT(*) AS total
      |  FROM orders),
      |ref AS (
      |  SELECT COUNT(*) AS v5, (SELECT total FROM base) AS total
      |  FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)),
      |rows_ AS (
      |  SELECT 'orderdate_not_null' AS expectation, v1 AS violations,
      |    total FROM base
      |  UNION ALL SELECT 'totalprice_positive', v2, total FROM base
      |  UNION ALL SELECT 'orderstatus_in_domain', v3, total FROM base
      |  UNION ALL SELECT 'orderkey_unique', v4, total FROM base
      |  UNION ALL SELECT 'custkey_references_customer', v5, total
      |    FROM ref)
      |SELECT expectation, violations, total,
      |  violations = 0 AS passed
      |FROM rows_""".stripMargin

  /** Differentially-private count release via the GEOMETRIC MECHANISM
    * — the standard integer DP primitive (Ghosh-Roughgarden-Sundararajan
    * 2009): noise k drawn with P(k) ∝ α^|k|, here α=1/2 (ε=ln 2),
    * truncated at |k|≤8 (tail mass 2⁻⁸). The draw is DERANDOMIZED the
    * way every sampling op here is: u = md5(seed‖lang) mod the weight
    * total indexes an integer inverse-CDF table (weights 2^(8−|k|),
    * total 766) — bit-stable in both engines, release-stable across
    * reruns. Released count clamps at 0.
    *
    * 100 TB posture: one group-key shuffle for the true counts; the
    * 17-row CDF table is a broadcast theta-join. */
  private val dpReleaseQ = (s: SparkSession, dir: String) => {
    val cdf = {
      val weights = (-8 to 8).map(k => k -> (1L << (8 - math.abs(k))))
      val cum = weights.scanLeft(0L)(_ + _._2).init
      weights.zip(cum).map { case ((k, w), lo) => (k.toLong, lo, lo + w) }
    }
    val spark = s
    import spark.implicits._
    val cdfDf = cdf.toDF("noise", "lo", "hi")
    Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_true"))
      .withColumn("u",
        conv(substring(md5(concat(lit("dp-v1:"), col("lang"))), 1, 6),
          16, 10).cast("long") % 766L)
      .join(broadcast(cdfDf),
        col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("lang"), col("n_true"), col("noise"),
        greatest(col("n_true") + col("noise"), lit(0L))
          .as("n_released"))
  }

  private val dpReleaseSql = {
    val rows = {
      val weights = (-8 to 8).map(k => k -> (1L << (8 - math.abs(k))))
      val cum = weights.scanLeft(0L)(_ + _._2).init
      weights.zip(cum).map { case ((k, w), lo) => s"($k, $lo, ${lo + w})" }
    }.mkString(", ")
    s"""WITH cdf(noise, lo, hi) AS (VALUES $rows),
       |t AS (SELECT lang, COUNT(*) AS n_true FROM documents GROUP BY 1),
       |u AS (SELECT lang, n_true,
       |  CAST(concat('0x', substr(md5('dp-v1:' || lang), 1, 6))
       |    AS BIGINT) % 766 AS u
       |  FROM t)
       |SELECT u.lang, u.n_true, CAST(cdf.noise AS BIGINT) AS noise,
       |  greatest(u.n_true + cdf.noise, 0) AS n_released
       |FROM u JOIN cdf ON u.u >= cdf.lo AND u.u < cdf.hi""".stripMargin
  }

  /** A/B experiment read-out: deterministic 50/50 assignment
    * (user_id parity — the hash-bucket assignment every experiment
    * platform uses), per-metric Welch t² in a FIXED-POINT CONTRACT:
    * values in centi, means floor-div'd to centi, sample variances in
    * centi² via the (n·Σx² − (Σx)²)/(n(n−1)) form, t² in micro with
    * the χ²₁ 95% cut (3.841459) as the significance flag. Sub-centi
    * mean differences round to 0 by design — the documented
    * resolution of the contract.
    *
    * Magnitude bound: n·Σvc² needs Σvc² < 9·10¹⁴ ⇒ safe to ~10⁸ rows
    * per arm at |value| ≤ 500; switch vc to deci above that.
    *
    * 100 TB posture: ONE conditional-aggregate pass over events keyed
    * by event_type — assignment and both arms' moments never leave
    * the map side until the final |types|-row rollup. */
  private val abTestQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        (col("user_id") % 2L === 0L).as("is_a"),
        floor(col("value") * 100d).cast("long").as("vc"))
    def armAgg(arm: Boolean, name: String) = Seq(
      sum(when(col("is_a") === arm, 1L).otherwise(0L)).as(s"n_$name"),
      sum(when(col("is_a") === arm, col("vc")).otherwise(0L))
        .as(s"s1_$name"),
      sum(when(col("is_a") === arm, col("vc") * col("vc")).otherwise(0L))
        .as(s"s2_$name"))
    val aggs = armAgg(arm = true, "a") ++ armAgg(arm = false, "b")
    ev.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_a_centi", expr("s1_a div n_a"))
      .withColumn("mean_b_centi", expr("s1_b div n_b"))
      .withColumn("var_a", expr(
        "(n_a * s2_a - s1_a * s1_a) div (n_a * (n_a - 1))"))
      .withColumn("var_b", expr(
        "(n_b * s2_b - s1_b * s1_b) div (n_b * (n_b - 1))"))
      .withColumn("se2", expr("var_a div n_a + var_b div n_b"))
      .withColumn("t2_micro", expr(
        """CASE WHEN se2 > 0 THEN
          |  (1000000 * (mean_a_centi - mean_b_centi)
          |    * (mean_a_centi - mean_b_centi)) div se2
          |END""".stripMargin))
      .withColumn("significant",
        coalesce(col("t2_micro") > 3841459L, lit(false)))
      .select("event_type", "n_a", "n_b", "mean_a_centi", "mean_b_centi",
        "var_a", "var_b", "t2_micro", "significant")
  }

  private val abTestSql =
    """WITH ev AS (
      |  SELECT event_type, user_id % 2 = 0 AS is_a,
      |    CAST(floor(value * 100) AS BIGINT) AS vc
      |  FROM events),
      |m AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN is_a THEN vc ELSE 0 END) AS BIGINT) AS s1_a,
      |    CAST(SUM(CASE WHEN is_a THEN vc * vc ELSE 0 END) AS BIGINT)
      |      AS s2_a,
      |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE vc END) AS BIGINT) AS s1_b,
      |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE vc * vc END) AS BIGINT)
      |      AS s2_b
      |  FROM ev GROUP BY 1),
      |d AS (
      |  SELECT event_type, n_a, n_b,
      |    s1_a // n_a AS mean_a_centi, s1_b // n_b AS mean_b_centi,
      |    (n_a * s2_a - s1_a * s1_a) // (n_a * (n_a - 1)) AS var_a,
      |    (n_b * s2_b - s1_b * s1_b) // (n_b * (n_b - 1)) AS var_b
      |  FROM m),
      |e AS (
      |  SELECT *, var_a // n_a + var_b // n_b AS se2 FROM d)
      |SELECT event_type, n_a, n_b, mean_a_centi, mean_b_centi,
      |  var_a, var_b,
      |  CAST(CASE WHEN se2 > 0 THEN
      |    (1000000 * (mean_a_centi - mean_b_centi)
      |      * (mean_a_centi - mean_b_centi)) // se2
      |  END AS BIGINT) AS t2_micro,
      |  COALESCE(CASE WHEN se2 > 0 THEN
      |    (1000000 * (mean_a_centi - mean_b_centi)
      |      * (mean_a_centi - mean_b_centi)) // se2 > 3841459
      |  END, false) AS significant
      |FROM e""".stripMargin

  /** NDCG@5 — the ranking-eval staple: a (deliberately noisy)
    * md5-ordered retrieval per source is scored against graded
    * relevance rel = min(4, n_chars/250) with the standard
    * 1/log₂(rank+1) discounts as SHARED MICRO LITERALS (1000000,
    * 630929, 500000, 430676, 386852 — precomputed once, identical in
    * both engines; no runtime logs). IDCG ranks by relevance itself;
    * ndcg = DCG/IDCG in micro floor-div.
    *
    * 100 TB posture: both rank windows partition by source over the
    * per-source doc domain; one |sources|-row rollup. */
  private val ndcgQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val disc = array(lit(1000000L), lit(630929L), lit(500000L),
      lit(430676L), lit(386852L))
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        least(lit(4L), expr("n_chars div 250")).as("rel"),
        md5(concat(lit("rank-v1:"), col("doc_id").cast("string")))
          .as("h"))
    val rW = Window.partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val iW = Window.partitionBy(col("source"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    d.withColumn("rr", row_number().over(rW))
      .withColumn("ir", row_number().over(iW))
      .groupBy(col("source"))
      .agg(
        sum(when(col("rr") <= 5, col("rel") * element_at(disc, col("rr")))
          .otherwise(0L)).as("dcg_micro"),
        sum(when(col("ir") <= 5, col("rel") * element_at(disc, col("ir")))
          .otherwise(0L)).as("idcg_micro"))
      .withColumn("ndcg_micro",
        when(col("idcg_micro") > 0L,
          expr("(1000000 * dcg_micro) div idcg_micro")))
  }

  private val ndcgSql =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    least(4, n_chars // 250) AS rel,
      |    md5('rank-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, rel,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY h ASC, doc_id ASC) AS rr,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY rel DESC, doc_id ASC) AS ir
      |  FROM d),
      |g AS (
      |  SELECT source,
      |    CAST(SUM(CASE WHEN rr <= 5 THEN rel *
      |      ([1000000, 630929, 500000, 430676, 386852])[rr]
      |      ELSE 0 END) AS BIGINT) AS dcg_micro,
      |    CAST(SUM(CASE WHEN ir <= 5 THEN rel *
      |      ([1000000, 630929, 500000, 430676, 386852])[ir]
      |      ELSE 0 END) AS BIGINT) AS idcg_micro
      |  FROM r GROUP BY 1)
      |SELECT source, dcg_micro, idcg_micro,
      |  CAST(CASE WHEN idcg_micro > 0 THEN
      |    (1000000 * dcg_micro) // idcg_micro END AS BIGINT)
      |    AS ndcg_micro
      |FROM g""".stripMargin

  /** Clustering agreement — Rand index + purity of a 4-bucket
    * random-hyperplane LSH assignment (sign of dims 1 and 2) against
    * the embedding labels, entirely in pair-count arithmetic:
    * agreements = 2a + C(n,2) − b1 − b2 with a/b1/b2 the
    * C(·,2)-sums of the contingency cells/rows/columns — exact
    * integers, no floats anywhere.
    *
    * 100 TB posture: one (label,bucket) partial-agg shuffle; the
    * contingency table (|labels|×4) is the only thing reduced. */
  private val randIndexQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        (when(element_at(col("embedding"), 1) >= 0f, 2L).otherwise(0L)
          + when(element_at(col("embedding"), 2) >= 0f, 1L)
            .otherwise(0L)).as("bucket"))
    // materialize the |labels|×4 contingency table once — the four
    // rollup branches below must not each re-scan the corpus
    val cells = e.groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("nij")).localCheckpoint()
    cells.agg(
        sum(col("nij")).as("n"),
        countDistinct(col("label")).as("n_classes"),
        countDistinct(col("bucket")).as("n_buckets"),
        sum(expr("(nij * (nij - 1)) div 2")).as("a_pairs"))
      .crossJoin(broadcast(cells.groupBy(col("label"))
        .agg(sum(col("nij")).as("ni"))
        .agg(sum(expr("(ni * (ni - 1)) div 2")).as("b1"))))
      .crossJoin(broadcast(cells.groupBy(col("bucket"))
        .agg(sum(col("nij")).as("nj"))
        .agg(sum(expr("(nj * (nj - 1)) div 2")).as("b2"))))
      .crossJoin(broadcast(cells.groupBy(col("bucket"))
        .agg(max(col("nij")).as("mx"))
        .agg(sum(col("mx")).as("pure"))))
      .withColumn("total_pairs", expr("(n * (n - 1)) div 2"))
      .withColumn("rand_micro", expr(
        "(1000000 * (2 * a_pairs + total_pairs - b1 - b2)) div total_pairs"))
      .withColumn("purity_micro", expr("(1000000 * pure) div n"))
      .select("n", "n_classes", "n_buckets", "a_pairs", "b1", "b2",
        "total_pairs", "rand_micro", "purity_micro")
  }

  private val randIndexSql =
    """WITH e AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    (CASE WHEN embedding[1] >= 0 THEN 2 ELSE 0 END
      |     + CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END) AS bucket
      |  FROM embeddings),
      |c AS (SELECT label, bucket, COUNT(*) AS nij FROM e GROUP BY 1, 2),
      |t AS (
      |  SELECT CAST(SUM(nij) AS BIGINT) AS n,
      |    COUNT(DISTINCT label) AS n_classes,
      |    COUNT(DISTINCT bucket) AS n_buckets,
      |    CAST(SUM((nij * (nij - 1)) // 2) AS BIGINT) AS a_pairs
      |  FROM c),
      |r1 AS (SELECT CAST(SUM((ni * (ni - 1)) // 2) AS BIGINT) AS b1
      |       FROM (SELECT CAST(SUM(nij) AS BIGINT) AS ni FROM c
      |             GROUP BY label)),
      |r2 AS (SELECT CAST(SUM((nj * (nj - 1)) // 2) AS BIGINT) AS b2
      |       FROM (SELECT CAST(SUM(nij) AS BIGINT) AS nj FROM c
      |             GROUP BY bucket)),
      |p AS (SELECT CAST(SUM(mx) AS BIGINT) AS pure
      |      FROM (SELECT MAX(nij) AS mx FROM c GROUP BY bucket))
      |SELECT n, n_classes, n_buckets, a_pairs, b1, b2,
      |  (n * (n - 1)) // 2 AS total_pairs,
      |  (1000000 * (2 * a_pairs + (n * (n - 1)) // 2 - b1 - b2))
      |    // ((n * (n - 1)) // 2) AS rand_micro,
      |  (1000000 * pure) // n AS purity_micro
      |FROM t, r1, r2, p""".stripMargin

  /** MRR@10 — reciprocal rank of the first RELEVANT hit (rel ≥ 3)
    * in the [[ndcgQ]] retrieval order, rr = 10⁶ div rank (exact
    * integer reciprocals — no float division); sources with no
    * relevant doc in the top 10 score 0 by the standard convention.
    *
    * 100 TB posture: same source-partitioned rank window as NDCG;
    * the first-hit reduction is a conditional min. */
  private val mrrQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        least(lit(4L), expr("n_chars div 250")).as("rel"),
        md5(concat(lit("rank-v1:"), col("doc_id").cast("string")))
          .as("h"))
    val rW = Window.partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    d.withColumn("rr", row_number().over(rW))
      .groupBy(col("source"))
      .agg(min(when(col("rel") >= 3L && col("rr") <= 10,
        col("rr").cast("long"))).as("first_rel_rank"))
      .withColumn("rr_micro",
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)))
  }

  private val mrrSql =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    least(4, n_chars // 250) AS rel,
      |    md5('rank-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, rel,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY h ASC, doc_id ASC) AS rr
      |  FROM d),
      |g AS (
      |  SELECT source,
      |    MIN(CASE WHEN rel >= 3 AND rr <= 10 THEN rr END)
      |      AS first_rel_rank
      |  FROM r GROUP BY 1)
      |SELECT source, CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
      |  COALESCE(1000000 // first_rel_rank, 0) AS rr_micro
      |FROM g""".stripMargin

  /** Precision / recall / F1 per source for a threshold classifier
    * (predict `en` when n_chars ≥ 500) against the lang label — the
    * confusion counts in ONE conditional-aggregate pass, and the
    * ratios in exact micro: F1 = 2tp/(2tp+fp+fn) needs no separate
    * P/R division, so no compounding floors. Degenerate denominators
    * report NULL. */
  private val f1Q = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("source"),
        (col("n_chars") >= 500L).as("pred"),
        (col("lang") === "en").as("truth"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("pred") && col("truth"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("truth"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("truth"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("truth"), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_micro",
        when(col("tp") + col("fp") > 0L,
          expr("(1000000 * tp) div (tp + fp)")))
      .withColumn("recall_micro",
        when(col("tp") + col("fn") > 0L,
          expr("(1000000 * tp) div (tp + fn)")))
      .withColumn("f1_micro",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          expr("(2000000 * tp) div (2 * tp + fp + fn)")))
  }

  private val f1Sql =
    """WITH d AS (
      |  SELECT source, n_chars >= 500 AS pred, lang = 'en' AS truth
      |  FROM documents),
      |c AS (
      |  SELECT source,
      |    CAST(SUM(CASE WHEN pred AND truth THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END)
      |      AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END)
      |      AS BIGINT) AS fn,
      |    CAST(SUM(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tn
      |  FROM d GROUP BY 1)
      |SELECT source, tp, fp, fn, tn,
      |  CAST(CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp)
      |    END AS BIGINT) AS precision_micro,
      |  CAST(CASE WHEN tp + fn > 0 THEN (1000000 * tp) // (tp + fn)
      |    END AS BIGINT) AS recall_micro,
      |  CAST(CASE WHEN 2 * tp + fp + fn > 0 THEN
      |    (2000000 * tp) // (2 * tp + fp + fn) END AS BIGINT)
      |    AS f1_micro
      |FROM c""".stripMargin

  /** Calibration / reliability table — the eval that catches a
    * classifier whose scores don't mean what they say: a
    * deterministic pseudo-probability (n_chars/1000 capped at 1, in
    * micro) is bucketed into 10 equal bins; each bin reports its
    * count, mean claimed score, empirical positive rate (lang='en'),
    * and the signed gap — all floor-div micro.
    *
    * 100 TB posture: one 10-key conditional rollup; the bin id is a
    * map-side expression. */
  private val calibrationQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(
        least(lit(1000000L), expr("(1000000 * n_chars) div 1000"))
          .as("score_micro"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .withColumn("bin", least(lit(9L), expr("score_micro div 100000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("score_micro")).as("ssum"),
        sum(col("pos")).as("npos"))
      .select(col("bin"), col("n"),
        expr("ssum div n").as("mean_score_micro"),
        expr("(1000000 * npos) div n").as("pos_rate_micro"),
        expr("ssum div n - (1000000 * npos) div n").as("gap_micro"))
  }

  private val calibrationSql =
    """WITH d AS (
      |  SELECT least(1000000, (1000000 * n_chars) // 1000)
      |      AS score_micro,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |b AS (
      |  SELECT least(9, score_micro // 100000) AS bin, score_micro, pos
      |  FROM d)
      |SELECT bin, COUNT(*) AS n,
      |  CAST(SUM(score_micro) AS BIGINT) // COUNT(*)
      |    AS mean_score_micro,
      |  (1000000 * CAST(SUM(pos) AS BIGINT)) // COUNT(*)
      |    AS pos_rate_micro,
      |  CAST(SUM(score_micro) AS BIGINT) // COUNT(*)
      |    - (1000000 * CAST(SUM(pos) AS BIGINT)) // COUNT(*)
      |    AS gap_micro
      |FROM b GROUP BY 1""".stripMargin

  /** Sample-ratio mismatch (SRM) — the A/B sanity check that must run
    * BEFORE reading [[abTestQ]]: under a 50/50 split the assignment
    * counts follow a binomial, and χ² = (n_a−n_b)²/(n_a+n_b); a value
    * past the χ²₁ 95% cut means the assignment itself is broken and
    * the experiment is invalid regardless of its metrics. Exact
    * integer micro.
    *
    * 100 TB posture: one conditional-aggregate pass per type. */
  private val srmQ = (s: SparkSession, dir: String) => {
    Tables.events(s, dir)
      .select(col("event_type"),
        (col("user_id") % 2L === 0L).as("is_a"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
      .withColumn("srm_chi2_micro", expr(
        "(1000000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)"))
      .withColumn("srm_flag", col("srm_chi2_micro") > 3841459L)
  }

  private val srmSql =
    """SELECT event_type,
      |  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_a,
      |  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
      |    AS BIGINT) AS n_b,
      |  (1000000
      |    * (CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |        AS BIGINT)
      |       - CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
      |        AS BIGINT))
      |    * (CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |        AS BIGINT)
      |       - CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
      |        AS BIGINT)))
      |    // COUNT(*) AS srm_chi2_micro,
      |  (1000000
      |    * (CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |        AS BIGINT)
      |       - CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
      |        AS BIGINT))
      |    * (CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |        AS BIGINT)
      |       - CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
      |        AS BIGINT)))
      |    // COUNT(*) > 3841459 AS srm_flag
      |FROM events GROUP BY 1""".stripMargin

  /** Data-drift gate — the MLOps check before a new data source joins
    * a training mix: the candidate source's document-length
    * distribution (10 fixed 200-char bins) is tested against the
    * reference source's with the same exact χ² form as
    * [[contingencyQ]] (expected = reference share × candidate total,
    * cell = (n_ref·obs − n_cand_bin·?)… spelled in the cross-product
    * form (a·d − b·c)²-free: per bin, exp·n_ref = ref_bin·n_cand, so
    * cell_micro = 10⁶·(n_ref·obs − ref_bin·n_cand)² div
    * (n_ref·ref_bin·n_cand) — zero-ref bins get the documented +1
    * smoothing). Reference = the lexicographically first source.
    *
    * 100 TB posture: one (source, bin) partial agg; drift arithmetic
    * runs on the 10-bin tables with reference totals broadcast. */
  private val driftQ = (s: SparkSession, dir: String) => {
    val binned = Tables.documents(s, dir)
      .select(col("source"),
        least(lit(9L), expr("n_chars div 200")).as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val ref = binned
      .crossJoin(broadcast(binned.agg(min(col("source")).as("rs"))))
      .filter(col("source") === col("rs"))
      .select(col("bin"), col("n").as("ref_n"))
    val refTot = ref.agg(sum(col("ref_n")).as("n_ref"))
    val cand = binned
      .crossJoin(broadcast(binned.agg(min(col("source")).as("rs"))))
      .filter(col("source") =!= col("rs"))
    val candTot = cand.groupBy(col("source"))
      .agg(sum(col("n")).as("n_cand"))
    cand.join(broadcast(ref), Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n"))
      .withColumn("ref_s", col("ref_n") + 1L) // +1 smoothing, documented
      .join(broadcast(candTot), "source")
      .crossJoin(broadcast(refTot))
      .withColumn("cell_micro", expr(
        """(1000000 * (n_ref * n - ref_s * n_cand)
          |  * (n_ref * n - ref_s * n_cand))
          |div (n_ref * ref_s * n_cand)""".stripMargin))
      .groupBy(col("source"))
      .agg(max(col("n_cand")).as("n_cand"),
        sum(col("cell_micro")).as("chi2_micro"))
      .withColumn("drift_flag", col("chi2_micro") > 16919000L) // χ²₉ 95%
  }

  private val driftSql =
    """WITH binned AS (
      |  SELECT source, least(9, n_chars // 200) AS bin, COUNT(*) AS n
      |  FROM documents GROUP BY 1, 2),
      |rs AS (SELECT MIN(source) AS rs FROM binned),
      |ref AS (SELECT bin, n AS ref_n FROM binned, rs
      |        WHERE source = rs),
      |rt AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS n_ref FROM ref),
      |cand AS (SELECT source, bin, n FROM binned, rs
      |         WHERE source <> rs),
      |ct AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_cand
      |       FROM cand GROUP BY 1),
      |cells AS (
      |  SELECT c.source, c.n, ct.n_cand, rt.n_ref,
      |    COALESCE(ref.ref_n, 0) + 1 AS ref_s
      |  FROM cand c
      |  LEFT JOIN ref ON ref.bin = c.bin
      |  JOIN ct ON ct.source = c.source
      |  CROSS JOIN rt),
      |sc AS (
      |  SELECT source, n_cand,
      |    (1000000 * (n_ref * n - ref_s * n_cand)
      |      * (n_ref * n - ref_s * n_cand))
      |      // (n_ref * ref_s * n_cand) AS cell_micro
      |  FROM cells)
      |SELECT source, MAX(n_cand) AS n_cand,
      |  CAST(SUM(cell_micro) AS BIGINT) AS chi2_micro,
      |  CAST(SUM(cell_micro) AS BIGINT) > 16919000 AS drift_flag
      |FROM sc GROUP BY 1""".stripMargin

  /** Minimum k-anonymity generalization — the FIXER for what
    * [[kanonQ]] audits: per nation, the SMALLEST balance-band width
    * in {2000, 4000, 8000, 16000} under which every equivalence class
    * reaches k = 5 ('suppress' when even the widest fails) — the
    * k-anonymity lattice walked bottom-up, reported as the minimal
    * generalization a release needs.
    *
    * 100 TB posture: ONE scan computes all four candidate widths'
    * class counts (explode over 4 literals, one (nation, width, band)
    * rollup); the per-nation min-class and width argmin run on the
    * class table. */
  private val generalizeQ = (s: SparkSession, dir: String) => {
    val widths = array(lit(2000), lit(4000), lit(8000), lit(16000))
    val classes = Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_acctbal"),
        explode(widths).as("width"))
      .withColumn("band",
        floor(col("c_acctbal") / col("width")).cast("long"))
      .groupBy(col("c_nationkey"), col("width"), col("band"))
      .agg(count(lit(1)).as("k_size"))
    val perWidth = classes.groupBy(col("c_nationkey"), col("width"))
      .agg(min(col("k_size")).as("min_class"),
        count(lit(1)).as("n_classes"))
    perWidth
      .withColumn("ok", col("min_class") >= 5L)
      .groupBy(col("c_nationkey"))
      .agg(min(when(col("ok"), col("width"))).as("min_ok_width"),
        max(when(col("ok"), lit(1L)).otherwise(0L)).as("any_ok"))
      .select(col("c_nationkey"),
        when(col("any_ok") === 1L,
          col("min_ok_width").cast("string"))
          .otherwise(lit("suppress")).as("generalization"))
  }

  private val generalizeSql =
    """WITH widths(width) AS (VALUES (2000), (4000), (8000), (16000)),
      |classes AS (
      |  SELECT c_nationkey, w.width,
      |    CAST(floor(c_acctbal / w.width) AS BIGINT) AS band,
      |    COUNT(*) AS k_size
      |  FROM customer CROSS JOIN widths w
      |  GROUP BY 1, 2, 3),
      |pw AS (
      |  SELECT c_nationkey, width, MIN(k_size) AS min_class
      |  FROM classes GROUP BY 1, 2)
      |SELECT c_nationkey,
      |  CASE WHEN MAX(CASE WHEN min_class >= 5 THEN 1 ELSE 0 END) = 1
      |    THEN CAST(MIN(CASE WHEN min_class >= 5 THEN width END)
      |      AS VARCHAR)
      |    ELSE 'suppress' END AS generalization
      |FROM pw GROUP BY 1""".stripMargin

  /** Kendall tau rank agreement between two rankers (the third leg of
    * the ranking-eval family beside NDCG and MRR): per source, every
    * doc pair is concordant or discordant between the length ranking
    * and the md5 ranking — both made STRICT total orders by the
    * doc_id tie-break, so there are no ties and τ = (2C − P)/P. The
    * micro form is computed as (2·10⁶·C) div P − 10⁶ — the first term
    * is non-negative, so Spark's truncating `div` and DuckDB's
    * flooring `//` agree (a direct (C−D) numerator would diverge on
    * negatives).
    *
    * 100 TB posture: the pair join is per-source (docs² within a
    * source, the documented bound); per-source sampling is the swap
    * when a source outgrows it. */
  private val kendallQ = (s: SparkSession, dir: String) => {
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        md5(concat(lit("rank-v1:"), col("doc_id").cast("string")))
          .as("h"))
    val a = d.select(col("source"), col("doc_id").as("id1"),
      col("n_chars").as("a1"), col("h").as("h1"))
    val b = d.select(col("source"), col("doc_id").as("id2"),
      col("n_chars").as("a2"), col("h").as("h2"))
    a.join(b, "source").filter(col("id1") < col("id2"))
      .withColumn("gtA", col("a1") > col("a2")
        || (col("a1") === col("a2") && col("id1") > col("id2")))
      .withColumn("gtB", col("h1") > col("h2")
        || (col("h1") === col("h2") && col("id1") > col("id2")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("gtA") === col("gtB"), 1L).otherwise(0L))
          .as("concordant"))
      .withColumn("tau_micro",
        expr("(2000000 * concordant) div n_pairs - 1000000"))
  }

  private val kendallSql =
    """WITH d AS (
      |  SELECT source, doc_id, n_chars,
      |    md5('rank-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |p AS (
      |  SELECT a.source,
      |    (a.n_chars > b.n_chars OR (a.n_chars = b.n_chars
      |      AND a.doc_id > b.doc_id)) AS gtA,
      |    (a.h > b.h OR (a.h = b.h AND a.doc_id > b.doc_id)) AS gtB
      |  FROM d a JOIN d b
      |    ON a.source = b.source AND a.doc_id < b.doc_id)
      |SELECT source, COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN gtA = gtB THEN 1 ELSE 0 END) AS BIGINT)
      |    AS concordant,
      |  (2000000 * CAST(SUM(CASE WHEN gtA = gtB THEN 1 ELSE 0 END)
      |    AS BIGINT)) // COUNT(*) - 1000000 AS tau_micro
      |FROM p GROUP BY 1""".stripMargin

  /** Consistent pseudonymization — the privacy transform that keeps
    * JOINS working: user ids become md5-derived tokens (a pure keyed
    * function, so the same user maps to the same token everywhere,
    * with no mapping table to leak). The query proves the two
    * contract properties per event type: cardinality is preserved
    * (distinct users == distinct tokens — md5 collisions at this
    * scale would break it loudly) and the mapping is
    * deterministic across rows (one token per user). */
  private val pseudonymizeQ = (s: SparkSession, dir: String) => {
    val tok = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        substring(md5(concat(lit("pseudo-v1:"),
          col("user_id").cast("string"))), 1, 16).as("token"))
    tok.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("token")).as("n_tokens"),
        countDistinct(col("user_id"), col("token")).as("n_mappings"))
      .withColumn("cardinality_preserved",
        col("n_users") === col("n_tokens"))
      .withColumn("mapping_deterministic",
        col("n_mappings") === col("n_users"))
  }

  private val pseudonymizeSql =
    """WITH t AS (
      |  SELECT event_type, user_id,
      |    substr(md5('pseudo-v1:' || CAST(user_id AS VARCHAR)), 1, 16)
      |      AS token
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT token) AS n_tokens,
      |  COUNT(DISTINCT (user_id, token)) AS n_mappings,
      |  COUNT(DISTINCT user_id) = COUNT(DISTINCT token)
      |    AS cardinality_preserved,
      |  COUNT(DISTINCT (user_id, token)) = COUNT(DISTINCT user_id)
      |    AS mapping_deterministic
      |FROM t GROUP BY 1""".stripMargin

  /** Brier score — the proper scoring rule for the calibration
    * story's pseudo-probability: mean (p − y)² per source, all in
    * micro² arithmetic floor-div'd once at the mean. Decomposes the
    * eval family: AUC ranks, calibration bins, Brier scores the
    * probabilities themselves. */
  private val brierQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("source"),
        least(lit(1000000L), expr("(1000000 * n_chars) div 1000"))
          .as("p"),
        when(col("lang") === "en", 1000000L).otherwise(0L).as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("se"))
      .withColumn("brier_micro", expr("se div (n * 1000000)"))
      .drop("se")
  }

  private val brierSql =
    """WITH d AS (
      |  SELECT source,
      |    least(1000000, (1000000 * n_chars) // 1000) AS p,
      |    CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y
      |  FROM documents)
      |SELECT source, COUNT(*) AS n,
      |  CAST(SUM((p - y) * (p - y)) AS BIGINT)
      |    // (COUNT(*) * 1000000) AS brier_micro
      |FROM d GROUP BY 1""".stripMargin

  /** Average precision (AP — the area under the precision/recall
    * curve in its rank-sum form) per source: rank documents by the
    * score (n_chars, descending; doc_id breaks ties so the order is
    * TOTAL and engine-stable), and at every relevant hit take
    * precision@k = cum_pos/k; AP = mean over hits. Integer contract:
    * each hit contributes floor((10⁶·cum_pos)/k), the mean floors
    * once more — both engines mirror the same double floor, so the
    * result is bit-stable. Sources with zero positives drop out (the
    * WHERE runs before the GROUP BY in both engines).
    *
    * 100 TB posture: one source-keyed sort window (ranking is
    * inherently order-dependent — same cost class as MRR/NDCG); the
    * aggregation after the filter touches positive rows only. */
  private val apQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val ranked = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"))
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum_pos", sum(col("is_pos")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.filter(col("is_pos") === 1L)
      .withColumn("term", expr("(1000000 * cum_pos) div k"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("pos_n"), sum(col("term")).as("term_sum"))
      .withColumn("ap_micro", expr("term_sum div pos_n"))
  }

  private val apSql =
    """WITH r AS (
      |  SELECT source, doc_id,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS k,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_pos
      |  FROM documents)
      |SELECT source, COUNT(*) AS pos_n,
      |  CAST(SUM((1000000 * cum_pos) // k) AS BIGINT) AS term_sum,
      |  CAST(SUM((1000000 * cum_pos) // k) AS BIGINT) // COUNT(*)
      |    AS ap_micro
      |FROM r WHERE is_pos = 1 GROUP BY 1""".stripMargin

  /** Cohen's kappa per source — chance-corrected agreement between
    * two binary labelers over the same documents: rater A = the
    * length heuristic (n_chars ≥ 250), rater B = lang = 'en'. With
    * confusion counts a/b/c/d and n = a+b+c+d,
    * po = (a+d)/n, pe = ((a+b)(a+c)+(c+d)(b+d))/n², and
    * κ = (po−pe)/(1−pe). Negative-safe floor-div form (the Kendall
    * discipline): κ+1 = (n(a+d) + n² − 2·pe_num)/(n² − pe_num) has a
    * provably nonnegative numerator (κ ≥ −1 always), so
    * kappa_micro = (10⁶·num) div den − 10⁶ floors identically in
    * both engines for any sign of κ. Degenerate marginals
    * (n² = pe_num, i.e. a constant rater) report NULL.
    *
    * Magnitude bound: 10⁶·n² must stay inside BIGINT ⇒ n < 3·10⁶
    * rows per source; beyond that, switch the scale to centi or
    * compute on the per-source sample. Fixture n ≤ 100 per source
    * at sf0.1 — safe by 10⁴×.
    *
    * 100 TB posture: ONE conditional-aggregate pass (partial→final
    * on the source key); the kappa arithmetic runs on the collapsed
    * per-source row. */
  private val kappaQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("source"),
        (col("n_chars") >= 250L).cast("long").as("ra"),
        (col("lang") === "en").cast("long").as("rb"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra") * col("rb")).as("a"),
        sum(col("ra") * (lit(1L) - col("rb"))).as("b"),
        sum((lit(1L) - col("ra")) * col("rb")).as("c"),
        sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("d"))
      .withColumn("pe_num", expr("(a+b)*(a+c) + (c+d)*(b+d)"))
      .withColumn("kappa_micro",
        when(expr("n*n - pe_num") > 0L,
          expr("(1000000 * (n*(a+d) + n*n - 2*pe_num))" +
            " div (n*n - pe_num) - 1000000")))
  }

  private val kappaSql =
    """WITH t AS (
      |  SELECT source,
      |    CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS ra,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rb
      |  FROM documents),
      |g AS (
      |  SELECT source, COUNT(*) AS n,
      |    CAST(SUM(ra * rb) AS BIGINT) AS a,
      |    CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
      |    CAST(SUM((1 - ra) * rb) AS BIGINT) AS c,
      |    CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS d
      |  FROM t GROUP BY 1)
      |SELECT source, n, a, b, c, d,
      |  (a+b)*(a+c) + (c+d)*(b+d) AS pe_num,
      |  CASE WHEN n*n - ((a+b)*(a+c) + (c+d)*(b+d)) > 0 THEN
      |    (1000000 * (n*(a+d) + n*n
      |        - 2*((a+b)*(a+c) + (c+d)*(b+d))))
      |      // (n*n - ((a+b)*(a+c) + (c+d)*(b+d))) - 1000000
      |  END AS kappa_micro
      |FROM g""".stripMargin

  /** Decile lift / gains table — the campaign-targeting read-out:
    * rank the corpus by score (n_chars), cut into 10 score deciles,
    * and report per-decile and cumulative positive capture vs the
    * random baseline (lift). NO row-level sort: scores collapse to
    * their VALUE DOMAIN first (the AUC/skyline discipline), the
    * decile of a score value is (cum_rows_before·10) div n_total —
    * every row of a tied value lands in ONE decile, so the cut is
    * deterministic in both engines (ntile would split ties
    * arbitrarily). Heavy ties can merge adjacent deciles — the
    * honest behavior, documented.
    *
    * Magnitude bound: lift's 10⁶·cum_pos·n_tot needs n < 3·10⁶; at
    * scale divide the shares first (gain stays exact, lift moves to
    * centi on share integers).
    *
    * 100 TB posture: one (score) partial-agg shuffle; both windows
    * run over collapsed domains (distinct scores, then ≤10 decile
    * rows) — never corpus rows. */
  private val liftQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, dir)
      .groupBy(col("n_chars").as("score"))
      .agg(count(lit(1)).as("g"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("p"))
    val tot = cells.agg(sum(col("g")).as("n_tot"), sum(col("p")).as("p_tot"))
    val wv = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wd = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_before", coalesce(sum(col("g")).over(wv), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("(cum_before * 10) div n_tot"))
      .groupBy(col("decile"), col("n_tot"), col("p_tot"))
      .agg(sum(col("g")).as("n_d"), sum(col("p")).as("pos_d"))
      .withColumn("cum_n", sum(col("n_d")).over(wd))
      .withColumn("cum_pos", sum(col("pos_d")).over(wd))
      .withColumn("lift_micro",
        expr("(1000000 * cum_pos * n_tot) div (cum_n * p_tot)"))
      .withColumn("gain_micro", expr("(1000000 * cum_pos) div p_tot"))
      .select(col("decile"), col("n_d"), col("pos_d"), col("cum_n"),
        col("cum_pos"), col("lift_micro"), col("gain_micro"))
  }

  private val liftSql =
    """WITH cells AS (
      |  SELECT n_chars AS score, COUNT(*) AS g,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS p
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(g) AS BIGINT) AS n_tot,
      |    CAST(SUM(p) AS BIGINT) AS p_tot FROM cells),
      |dec AS (
      |  SELECT score, g, p,
      |    CAST(COALESCE(SUM(g) OVER (ORDER BY score DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_before
      |  FROM cells),
      |d AS (
      |  SELECT (cum_before * 10) // n_tot AS decile, g, p, n_tot, p_tot
      |  FROM dec, tot),
      |agg AS (
      |  SELECT decile, n_tot, p_tot, CAST(SUM(g) AS BIGINT) AS n_d,
      |    CAST(SUM(p) AS BIGINT) AS pos_d
      |  FROM d GROUP BY 1, 2, 3)
      |SELECT decile, n_d, pos_d,
      |  CAST(SUM(n_d) OVER w AS BIGINT) AS cum_n,
      |  CAST(SUM(pos_d) OVER w AS BIGINT) AS cum_pos,
      |  (1000000 * CAST(SUM(pos_d) OVER w AS BIGINT) * n_tot)
      |    // (CAST(SUM(n_d) OVER w AS BIGINT) * p_tot) AS lift_micro,
      |  (1000000 * CAST(SUM(pos_d) OVER w AS BIGINT)) // p_tot
      |    AS gain_micro
      |FROM agg
      |WINDOW w AS (ORDER BY decile
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** t-closeness audit — the release gate k-anonymity/l-diversity
    * (q_priv_kanon) cannot express: a QI class can be large AND
    * diverse yet still leak if its sensitive-value DISTRIBUTION
    * differs from the table's. For the categorical sensitive
    * attribute (market segment) the EMD is the variational distance
    * t = ½·Σᵢ|pᵢ − qᵢ|, which is EXACTLY rational in counts:
    * t_micro = (10⁶·Σᵢ|nᵢ·N − Nᵢ·n|) div (2·n·N). Zero cells are
    * completed (a class MISSING a segment is exactly the leak this
    * audit exists to find) via the contingency cross-completion.
    *
    * Magnitude bound: the summand |nᵢ·N| ≤ n·N needs 10⁶·n·N inside
    * BIGINT ⇒ n·N < 9·10¹² (N = table rows, n = class size) — safe
    * to ~3·10⁶ rows even with one giant class; switch to centi
    * above. Fixture N ≤ 1.5·10⁴: safe by 10⁴×.
    *
    * 100 TB posture: one (QI, segment) partial-agg collapse; the
    * cross-completion and scoring run on the category domain. */
  private val tclosenessQ = (s: SparkSession, dir: String) => {
    val base = Tables.customer(s, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 2000d).cast("long").as("bal_band"),
        col("c_mktsegment"))
    val cells = base.groupBy(col("c_nationkey"), col("bal_band"),
      col("c_mktsegment")).agg(count(lit(1)).as("ni"))
    val classes = base.groupBy(col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
    val global = base.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("gi"))
    val total = base.agg(count(lit(1)).as("nn"))
    classes.crossJoin(broadcast(global)).crossJoin(broadcast(total))
      .join(cells, Seq("c_nationkey", "bal_band", "c_mktsegment"), "left")
      .withColumn("ni0", coalesce(col("ni"), lit(0L)))
      .groupBy(col("c_nationkey"), col("bal_band"), col("n"), col("nn"))
      .agg(sum(abs(col("ni0") * col("nn") - col("gi") * col("n")))
        .as("emd_num"))
      .withColumn("t_micro",
        expr("(1000000 * emd_num) div (2 * n * nn)"))
      .withColumn("viol_t", col("t_micro") > 300000L)
      .select(col("c_nationkey"), col("bal_band"), col("n"),
        col("emd_num"), col("t_micro"), col("viol_t"))
  }

  private val tclosenessSql =
    """WITH base AS (
      |  SELECT c_nationkey,
      |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
      |    c_mktsegment
      |  FROM customer),
      |cells AS (
      |  SELECT c_nationkey, bal_band, c_mktsegment, COUNT(*) AS ni
      |  FROM base GROUP BY 1, 2, 3),
      |cls AS (
      |  SELECT c_nationkey, bal_band, COUNT(*) AS n
      |  FROM base GROUP BY 1, 2),
      |gl AS (SELECT c_mktsegment, COUNT(*) AS gi FROM base GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS nn FROM base),
      |sc AS (
      |  SELECT cls.c_nationkey, cls.bal_band, cls.n, tot.nn,
      |    CAST(SUM(abs(COALESCE(cells.ni, 0) * tot.nn
      |      - gl.gi * cls.n)) AS BIGINT) AS emd_num
      |  FROM cls CROSS JOIN gl CROSS JOIN tot
      |  LEFT JOIN cells ON cells.c_nationkey = cls.c_nationkey
      |    AND cells.bal_band = cls.bal_band
      |    AND cells.c_mktsegment = gl.c_mktsegment
      |  GROUP BY 1, 2, 3, 4)
      |SELECT c_nationkey, bal_band, n, emd_num,
      |  (1000000 * emd_num) // (2 * n * nn) AS t_micro,
      |  (1000000 * emd_num) // (2 * n * nn) > 300000 AS viol_t
      |FROM sc""".stripMargin

  /** Cohen's d effect size for the A/B read-out — the companion to
    * q_eval_ab_test's significance flag: HOW BIG is the difference,
    * in pooled-standard-deviation units (the number a launch
    * decision actually reads; significance alone saturates at scale).
    * Arms are the same deterministic user-parity assignment. Moments
    * are exact DECIMAL(38) power sums in cents; d is a STAGED double
    * expression (per-arm sample variance, pooled variance, mean
    * difference) mirrored token-for-token in the oracle — the
    * skew/kurtosis discipline, so the result is bit-stable.
    *
    * 100 TB posture: ONE conditional-aggregate pass on the type key;
    * everything after runs on the per-type moment row. */
  private val cohensDQ = (s: SparkSession, dir: String) => {
    def m(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        (col("user_id") % 2L === 0L).cast("long").as("ia"),
        round(col("value") * 100).cast("long").as("vc"))
    val mo = ev.groupBy(col("event_type"))
      .agg(sum(col("ia")).as("na"),
        sum(lit(1L) - col("ia")).as("nb"),
        m(col("ia") * col("vc")).as("sa"),
        m((lit(1L) - col("ia")) * col("vc")).as("sb"),
        m(col("ia") * col("vc") * col("vc")).as("qa"),
        m((lit(1L) - col("ia")) * col("vc") * col("vc")).as("qb"))
    mo.filter(col("na") >= 2L && col("nb") >= 2L)
      .withColumn("va",
        (col("na") * col("qa") - col("sa") * col("sa")).cast("double") /
          (col("na") * (col("na") - 1L)).cast("double"))
      .withColumn("vb",
        (col("nb") * col("qb") - col("sb") * col("sb")).cast("double") /
          (col("nb") * (col("nb") - 1L)).cast("double"))
      .withColumn("pooled",
        ((col("na") - 1L).cast("double") * col("va") +
          (col("nb") - 1L).cast("double") * col("vb")) /
          (col("na") + col("nb") - 2L).cast("double"))
      .withColumn("cohens_d",
        (col("sa").cast("double") / col("na").cast("double") -
          col("sb").cast("double") / col("nb").cast("double")) /
          sqrt(col("pooled")))
      .select(col("event_type"), col("na"), col("nb"), col("cohens_d"))
  }

  private val cohensDSql =
    """WITH ev AS (
      |  SELECT event_type,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
      |    CAST(round(value * 100) AS BIGINT) AS vc
      |  FROM events),
      |mo AS (
      |  SELECT event_type,
      |    CAST(SUM(ia) AS BIGINT) AS na,
      |    CAST(SUM(1 - ia) AS BIGINT) AS nb,
      |    SUM(CAST(ia * vc AS DECIMAL(38,0))) AS sa,
      |    SUM(CAST((1 - ia) * vc AS DECIMAL(38,0))) AS sb,
      |    SUM(CAST(ia * vc * vc AS DECIMAL(38,0))) AS qa,
      |    SUM(CAST((1 - ia) * vc * vc AS DECIMAL(38,0))) AS qb
      |  FROM ev GROUP BY 1),
      |st AS (
      |  SELECT event_type, na, nb,
      |    CAST(na * qa - sa * sa AS DOUBLE)
      |      / CAST(na * (na - 1) AS DOUBLE) AS va,
      |    CAST(nb * qb - sb * sb AS DOUBLE)
      |      / CAST(nb * (nb - 1) AS DOUBLE) AS vb,
      |    sa, sb
      |  FROM mo WHERE na >= 2 AND nb >= 2)
      |SELECT event_type, na, nb,
      |  (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
      |    - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
      |  / sqrt((CAST(na - 1 AS DOUBLE) * va
      |      + CAST(nb - 1 AS DOUBLE) * vb)
      |    / CAST(na + nb - 2 AS DOUBLE)) AS cohens_d
      |FROM st""".stripMargin

  /** Precision/recall curve table — the operating points between
    * AUC's single number and a deployed threshold: at the score's own
    * QUINTILE cuts (value-domain disc — data-relative thresholds, the
    * same discipline as the lift deciles), classify score ≥ cut as
    * positive and report the exact confusion counts with micro
    * precision / recall / F1 (2tp/(2tp+fp+fn) — one floor, the
    * q_eval_f1 form). Score = n_chars, truth = lang 'en'.
    *
    * 100 TB posture: one (score) collapse; cuts come from the
    * cumulative window over the value domain; the 5 thresholds
    * broadcast back onto the CELLS (not the corpus) for counting. */
  private val prCurveQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, dir)
      .select(col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("g"), sum(col("pos")).as("p"))
    val wv = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("g")).as("n"), sum(col("p")).as("np"))
    val cum = cells.withColumn("cum", sum(col("g")).over(wv))
      .crossJoin(broadcast(tot))
    val cuts = cum
      .withColumn("j", explode(array((1 to 5).map(lit(_)): _*)))
      .filter(expr("cum * 5 >= (5 - j) * n"))
      .groupBy(col("j")).agg(min(col("score")).as("cut"))
    cells.crossJoin(broadcast(cuts)).crossJoin(broadcast(tot))
      .groupBy(col("j"), col("cut"), col("np"))
      .agg(sum(when(col("score") >= col("cut"), col("p"))
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("cut"), col("g") - col("p"))
          .otherwise(0L)).as("fp"))
      .withColumn("fn", col("np") - col("tp"))
      .withColumn("precision_micro",
        when(col("tp") + col("fp") > 0L,
          expr("(1000000 * tp) div (tp + fp)")))
      .withColumn("recall_micro",
        when(col("np") > 0L, expr("(1000000 * tp) div np")))
      .withColumn("f1_micro",
        when(expr("2 * tp + fp + fn") > 0L,
          expr("(1000000 * 2 * tp) div (2 * tp + fp + fn)")))
      .select(col("j"), col("cut"), col("tp"), col("fp"), col("fn"),
        col("precision_micro"), col("recall_micro"), col("f1_micro"))
  }

  private val prCurveSql =
    """WITH cells AS (
      |  SELECT n_chars AS score, COUNT(*) AS g,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS p
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(g) AS BIGINT) AS n,
      |    CAST(SUM(p) AS BIGINT) AS np FROM cells),
      |cum AS (
      |  SELECT score, CAST(SUM(g) OVER (ORDER BY score
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum
      |  FROM cells),
      |cuts AS (
      |  SELECT j, MIN(score) AS cut
      |  FROM cum, tot,
      |    (SELECT unnest([1,2,3,4,5]) AS j) js
      |  WHERE cum * 5 >= (5 - j) * n
      |  GROUP BY 1),
      |sc AS (
      |  SELECT j, cut, np,
      |    CAST(SUM(CASE WHEN score >= cut THEN p ELSE 0 END)
      |      AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN score >= cut THEN g - p ELSE 0 END)
      |      AS BIGINT) AS fp
      |  FROM cells, cuts, tot GROUP BY 1, 2, 3)
      |SELECT j, cut, tp, fp, np - tp AS fn,
      |  CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp)
      |    END AS precision_micro,
      |  CASE WHEN np > 0 THEN (1000000 * tp) // np END AS recall_micro,
      |  CASE WHEN 2 * tp + fp + (np - tp) > 0 THEN
      |    (1000000 * 2 * tp) // (2 * tp + fp + (np - tp))
      |  END AS f1_micro
      |FROM sc""".stripMargin

  /** Expected calibration error (ECE) — the single number on top of
    * q_eval_calibration's reliability table: the bin-size-weighted
    * mean |confidence − accuracy|, here entirely in integer micro:
    * per bin, |n·ssum_rate − n·pos_rate| collapses to
    * |ssum − npos·... | — computed as n·|mean gap| with the per-bin
    * floor-div means shared with the calibration table, then ONE
    * final floor over N. Also reports max_gap (the worst bin) —
    * the two numbers a model card quotes.
    *
    * 100 TB posture: one map-side bin pass + a 10-row rollup. */
  private val eceQ = (s: SparkSession, dir: String) => {
    val bins = Tables.documents(s, dir)
      .select(
        least(lit(1000000L), expr("(1000000 * n_chars) div 1000"))
          .as("score_micro"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .withColumn("bin", least(lit(9L), expr("score_micro div 100000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("score_micro")).as("ssum"),
        sum(col("pos")).as("npos"))
      .withColumn("gap_micro",
        abs(expr("ssum div n - (1000000 * npos) div n")))
    bins.agg(sum(col("n")).as("n_total"),
        count(lit(1)).as("n_bins"),
        sum(col("n") * col("gap_micro")).as("wsum"),
        max(col("gap_micro")).as("max_gap_micro"))
      .withColumn("ece_micro", expr("wsum div n_total"))
      .select(col("n_total"), col("n_bins"), col("ece_micro"),
        col("max_gap_micro"))
  }

  private val eceSql =
    """WITH d AS (
      |  SELECT least(1000000, (1000000 * n_chars) // 1000)
      |      AS score_micro,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |b AS (
      |  SELECT least(9, score_micro // 100000) AS bin,
      |    COUNT(*) AS n,
      |    CAST(SUM(score_micro) AS BIGINT) AS ssum,
      |    CAST(SUM(pos) AS BIGINT) AS npos
      |  FROM d GROUP BY 1),
      |g AS (
      |  SELECT n, abs(ssum // n - (1000000 * npos) // n) AS gap
      |  FROM b)
      |SELECT CAST(SUM(n) AS BIGINT) AS n_total,
      |  COUNT(*) AS n_bins,
      |  CAST(SUM(n * gap) AS BIGINT) // CAST(SUM(n) AS BIGINT)
      |    AS ece_micro,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap_micro
      |FROM g""".stripMargin

  /** Referential-integrity audit across the WHOLE schema — one row
    * per declared foreign-key relationship (lineitem→orders,
    * lineitem→part, lineitem→supplier, orders→customer,
    * customer→nation, supplier→nation, nation→region): child rows,
    * DISTINCT child keys, orphan keys (no parent), orphan rows, and
    * the orphan-rate in micro. Each relationship is a
    * distinct-collapse + left-anti probe against the parent key set —
    * never a row-level join — so the audit costs one distinct per
    * child table even at fact scale. The healthy fixture reports
    * zeros; the point of the table is that a broken ingest CAN'T
    * hide (the spec breaks one FK and watches exactly that row).
    *
    * 100 TB posture: per relationship, one child distinct collapse +
    * a broadcast anti-join against the parent keys (dims broadcast;
    * for a fact-fact FK the anti-join shuffles the collapsed KEY
    * domain only). */
  private val fkAuditQ = (s: SparkSession, dir: String) => {
    def rel(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val keys = child.select(col(key).cast("long").as("k"))
      val rows = keys.agg(count(lit(1)).as("n_child_rows"))
      val dk = keys.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      val orphans = dk.join(
        parent.select(col(pkey).cast("long").as("k")), Seq("k"),
        "left_anti")
      val oagg = orphans.agg(
        count(lit(1)).as("n_orphan_keys"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_rows"))
      val dkc = dk.agg(count(lit(1)).as("n_child_keys"))
      rows.crossJoin(dkc).crossJoin(oagg)
        .select(lit(name).as("relationship"), col("n_child_rows"),
          col("n_child_keys"), col("n_orphan_keys"),
          col("n_orphan_rows"))
        .withColumn("orphan_micro",
          expr("(1000000 * n_orphan_rows) div n_child_rows"))
    }
    import graft.Tables._
    rel("lineitem->orders", lineitem(s, dir), "l_orderkey",
        orders(s, dir), "o_orderkey")
      .unionByName(rel("lineitem->part", lineitem(s, dir), "l_partkey",
        part(s, dir), "p_partkey"))
      .unionByName(rel("lineitem->supplier", lineitem(s, dir),
        "l_suppkey", supplier(s, dir), "s_suppkey"))
      .unionByName(rel("orders->customer", orders(s, dir), "o_custkey",
        customer(s, dir), "c_custkey"))
      .unionByName(rel("customer->nation", customer(s, dir),
        "c_nationkey", nation(s, dir), "n_nationkey"))
      .unionByName(rel("supplier->nation", supplier(s, dir),
        "s_nationkey", nation(s, dir), "n_nationkey"))
      .unionByName(rel("nation->region", nation(s, dir), "n_regionkey",
        region(s, dir), "r_regionkey"))
  }

  private val fkAuditSql = {
    def rel(name: String, child: String, key: String,
        parent: String, pkey: String): String =
      s"""SELECT '$name' AS relationship,
         |  (SELECT COUNT(*) FROM $child) AS n_child_rows,
         |  (SELECT COUNT(DISTINCT $key) FROM $child) AS n_child_keys,
         |  (SELECT COUNT(*) FROM
         |     (SELECT $key FROM $child GROUP BY 1) c
         |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |     WHERE p.$pkey = c.$key)) AS n_orphan_keys,
         |  (SELECT COALESCE(CAST(SUM(cnt) AS BIGINT), 0) FROM
         |     (SELECT $key, COUNT(*) AS cnt FROM $child GROUP BY 1) c
         |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |     WHERE p.$pkey = c.$key)) AS n_orphan_rows,
         |  (1000000 * (SELECT COALESCE(CAST(SUM(cnt) AS BIGINT), 0)
         |     FROM (SELECT $key, COUNT(*) AS cnt FROM $child
         |           GROUP BY 1) c
         |     WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |       WHERE p.$pkey = c.$key)))
         |    // (SELECT COUNT(*) FROM $child) AS orphan_micro"""
        .stripMargin
    Seq(
      rel("lineitem->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      rel("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      rel("lineitem->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      rel("orders->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      rel("customer->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      rel("supplier->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      rel("nation->region", "nation", "n_regionkey",
        "region", "r_regionkey")).mkString("\nUNION ALL\n")
  }

  override val queries: Map[String, Q] = Map(
    "q_dq_fk_audit" -> Q(fkAuditQ, Some(fkAuditSql),
      "referential-integrity audit: orphan keys/rows per FK, distinct-collapsed"),
    "q_eval_ece" -> Q(eceQ, Some(eceSql),
      "expected calibration error: bin-weighted mean |conf - acc| in micro"),
    "q_eval_pr_curve" -> Q(prCurveQ, Some(prCurveSql),
      "PR curve at score-quintile thresholds: exact confusion counts per cut"),
    "q_eval_cohens_d" -> Q(cohensDQ, Some(cohensDSql),
      "Cohen's d effect size: exact decimal moments, mirrored staged double"),
    "q_priv_tcloseness" -> Q(tclosenessQ, Some(tclosenessSql),
      "t-closeness audit: exact rational EMD of class vs global segment shares"),
    "q_eval_ap" -> Q(apQ, Some(apSql),
      "average precision per source: total-order ranking, exact micro rank-sum"),
    "q_eval_kappa" -> Q(kappaQ, Some(kappaSql),
      "Cohen's kappa per source, negative-safe floor-div form, one pass"),
    "q_eval_lift" -> Q(liftQ, Some(liftSql),
      "decile lift/gains table over the score value domain, deterministic tie cut"),
    "q_eval_brier" -> Q(brierQ, Some(brierSql),
      "Brier score of the pseudo-probability per source, exact micro"),
    "q_priv_pseudonymize" -> Q(pseudonymizeQ, Some(pseudonymizeSql),
      "keyed md5 pseudonymization: cardinality preserved, mapping deterministic"),
    "q_eval_kendall" -> Q(kendallQ, Some(kendallSql),
      "Kendall tau between two strict rankings per source, negative-safe micro form"),
    "q_priv_generalize" -> Q(generalizeQ, Some(generalizeSql),
      "minimum k-anonymity generalization: smallest band width reaching k=5 per nation"),
    "q_dq_drift" -> Q(driftQ, Some(driftSql),
      "source drift gate: exact chi-square of length bins vs the reference source"),
    "q_eval_srm" -> Q(srmQ, Some(srmSql),
      "A/B sample-ratio-mismatch chi-square per type, exact micro"),
    "q_eval_calibration" -> Q(calibrationQ, Some(calibrationSql),
      "reliability table: 10 score bins, claimed vs empirical positive rate, micro"),
    "q_eval_f1" -> Q(f1Q, Some(f1Sql),
      "precision/recall/F1 per source: one-pass confusion counts, exact micro ratios"),
    "q_eval_mrr" -> Q(mrrQ, Some(mrrSql),
      "MRR@10: exact integer reciprocal of the first relevant rank per source"),
    "q_eval_ndcg" -> Q(ndcgQ, Some(ndcgSql),
      "NDCG@5 per source with shared micro discount literals, no runtime logs"),
    "q_eval_rand_index" -> Q(randIndexQ, Some(randIndexSql),
      "Rand index + purity of hyperplane-LSH buckets vs labels, pair-count arithmetic"),
    "q_priv_dp_release" -> Q(dpReleaseQ, Some(dpReleaseSql),
      "DP count release: geometric mechanism, derandomized integer inverse-CDF"),
    "q_eval_ab_test" -> Q(abTestQ, Some(abTestSql),
      "A/B read-out: parity assignment, Welch t-squared in fixed point, one pass"),
    "q_eval_auc" -> Q(aucQ, Some(aucSql),
      "exact ROC AUC per source (Mann-Whitney over the value domain, no global sort)"),
    "q_priv_kanon" -> Q(kanonQ, Some(kanonSql),
      "k-anonymity class sizes + l-diversity per quasi-identifier class"),
    "q_agg_contingency" -> Q(contingencyQ, Some(contingencySql),
      "chi-square + Cramer's V for segment x nation, integer micro, zero cells included"),
    "q_dq_fd_audit" -> Q(fdAuditQ, Some(fdAuditSql),
      "functional-dependency audit: violating keys and worst fan-out per candidate FD"),
    "q_dq_expectations" -> Q(dqQ, Some(dqSql),
      "declarative DQ expectations report: 5 checks, one scan + one broadcast anti-join"))
}
