package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — aggregation surface.
  *
  * The reference pushes MIN/MAX/SUM/COUNT partials into the storage node
  * and merges per-object partials on the client ([pub:
  * src/cls/tabular/cls_tabular_utils.h — SOT_min/max/sum/cnt], SURVEY
  * §2.4). Spark's partial→final HashAggregate around one Exchange IS
  * that architecture natively; everything below compiles to it. GROUP BY
  * (present in later SkyhookDM processing), DISTINCT, rollup/cube and
  * runstats-style column statistics extend the surface per §2.4.
  *
  * 100 TB posture: grouping keys are low-cardinality, so map-side
  * partial agg collapses each input split to a few rows before the only
  * shuffle. Exact count-distinct shuffles the distinct pairs first
  * (Spark expands to two-phase agg); the approx variant (HLL++ sketch,
  * `approx_count_distinct`) is the 100 TB-safe form — sketches merge in
  * the partial/final tree exactly like the reference's object partials.
  */
object Aggregates extends QueryModule {

  // Multi-aggregate GROUP BY incl. timestamp min/max + exact distinct.
  private val groupMulti = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty"),
        Ora.davg(Ora.money(col("l_extendedprice"))).as("avg_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("cnt"))

  private val groupMultiSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |  COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  private val distinctRows = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()

  private val distinctRowsSql =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  private val countDistinctGlobal = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .agg(countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("cnt"))

  private val countDistinctGlobalSql =
    """SELECT COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS cnt
      |FROM lineitem""".stripMargin

  // HLL++ sketch — the 100 TB form of count-distinct (sketches merge in
  // O(sketch), unlike the exact expand). Sketch ESTIMATES are
  // engine-specific, so the oracle-checked surface is an ENVELOPE: the
  // exact count plus a boolean asserting the estimate landed within 5%
  // of it. rsd=0.01 puts the 5% bound at 5 standard errors — the
  // boolean is deterministically TRUE unless the sketch is broken,
  // which is exactly what the oracle's literal TRUE checks.
  private val approxCd = (s: SparkSession, dir: String) => {
    val exact = countDistinct(col("l_partkey"))
    val approx = approx_count_distinct(col("l_partkey"), rsd = 0.01)
    Tables.lineitem(s, dir)
      .agg(exact.as("n_part_exact"),
        (abs(approx - exact) <= exact * lit(0.05)).as("approx_ok"))
  }

  private val approxCdSql =
    """SELECT COUNT(DISTINCT l_partkey) AS n_part_exact, TRUE AS approx_ok
      |FROM lineitem""".stripMargin

  /** MERGEABLE sketches — the systems story beyond one-shot
    * approx_count_distinct: per-group HLL sketches are built once
    * (Datasketches binary blobs), then UNIONED to answer a coarser
    * rollup WITHOUT re-touching the data — at 100 TB this is how
    * per-partition/day sketches roll up to monthly/global cardinality
    * in metadata only. Envelope oracle: each tier's estimate must
    * land within 5% of its exact distinct count; the exact counts and
    * booleans are the compared output. */
  private val hllUnionQ = (s: SparkSession, dir: String) => {
    val perFlag = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"),
        countDistinct(col("l_partkey")).as("n_exact"))
    val global = Tables.lineitem(s, dir)
      .agg(countDistinct(col("l_partkey")).as("n_exact_g"))
    perFlag
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_g"),
        sum(when(
          abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
            col("n_exact") * lit(0.05), 0L).otherwise(1L))
          .as("n_tier_violations"))
      .crossJoin(global)
      .select(col("n_exact_g"),
        (abs(col("est_g") - col("n_exact_g")) <=
          col("n_exact_g") * lit(0.05)).as("union_ok"),
        (col("n_tier_violations") === 0L).as("tiers_ok"))
  }

  private val hllUnionSql =
    """SELECT COUNT(DISTINCT l_partkey) AS n_exact_g,
      |  TRUE AS union_ok, TRUE AS tiers_ok
      |FROM lineitem""".stripMargin

  // Approx percentile (Greenwald–Khanna summary) under the same
  // envelope discipline: accuracy=10000 guarantees rank error ≤ n/10⁴,
  // so the estimate provably lies within the exact p45..p55 band — the
  // boolean is TRUE by the algorithm's hard (non-probabilistic) bound.
  private val approxPctlQ = (s: SparkSession, dir: String) => {
    val ap = approx_percentile(col("l_quantity"), lit(0.5), lit(10000))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50_exact"),
        (ap >= percentile(col("l_quantity"), lit(0.45)) &&
          ap <= percentile(col("l_quantity"), lit(0.55))).as("approx_ok"))
  }

  private val approxPctlSql =
    """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50_exact,
      |  TRUE AS approx_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  private val rollupQ = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("cnt"))

  private val rollupSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  private val cubeQ = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))

  private val cubeSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  // HAVING analog: post-aggregation filter on the aggregate value.
  private val havingQ = (s: SparkSession, dir: String) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(Ora.davg(Ora.money(col("c_acctbal"))).as("avg_bal"),
        count(lit(1)).as("n_cust"))
      .filter(col("avg_bal") > 0 && col("n_cust") >= 2)

  private val havingSql =
    """SELECT c_nationkey,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
      |  COUNT(*) AS n_cust
      |FROM customer GROUP BY c_nationkey
      |HAVING CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal) > 0
      |  AND COUNT(*) >= 2""".stripMargin

  /** Runstats analog (reference per-object stats, SURVEY §2.4): exact
    * count / mean / sample variance per column, computed from exact
    * decimal sums so both engines produce the identical double —
    * var = (Σx² − (Σx)²/n) / (n−1), all Σ in DECIMAL.
    */
  private val statsQ = (s: SparkSession, dir: String) => {
    val q = Ora.money(col("l_quantity"))
    val sx = sum(q)
    val sxx = sum((q * q).cast("decimal(24,4)"))
    val n = count(col("l_quantity"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(n.as("n"),
        (sx.cast("double") / n).as("mean_qty"),
        ((sxx.cast("double") - sx.cast("double") * sx.cast("double") / n)
          / (n - lit(1))).as("var_qty"))
  }

  private val statsSql =
    """SELECT l_linestatus, COUNT(l_quantity) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS mean_qty,
      |  (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS DOUBLE)
      |   - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity))
      |  / (COUNT(l_quantity) - 1) AS var_qty
      |FROM lineitem GROUP BY l_linestatus""".stripMargin

  /** Percentiles (exact, linear interpolation): Spark `percentile` and
    * DuckDB `quantile_cont` share the definition (index p·(n−1), linear
    * interp between neighbors); inputs are 2-decimal money values so
    * the interpolation arithmetic is exact in double on both engines.
    * The 100 TB form is `approx_percentile` (t-digest-style sketch,
    * merge-friendly like the HLL row above); the exact form shown here
    * is the oracle-checkable one. */
  private val percentileQ = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"),
        count(lit(1)).as("cnt"))

  private val percentileSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Covariance/correlation from exact DECIMAL sums (same discipline as
    * statsQ): cov = (Σxy − ΣxΣy/n)/(n−1), corr = cov/(sx·sy), every Σ
    * exact, so both engines produce the identical double. */
  private val covarQ = (s: SparkSession, dir: String) => {
    val x = Ora.money(col("l_quantity"))
    val y = Ora.money(col("l_extendedprice"))
    val sx = sum(x).cast("double")
    val sy = sum(y).cast("double")
    val sxx = sum((x * x).cast("decimal(24,4)")).cast("double")
    val syy = sum((y * y).cast("decimal(24,4)")).cast("double")
    val sxy = sum((x * y).cast("decimal(24,4)")).cast("double")
    val n = count(lit(1))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(n.as("n"),
        ((sxy - sx * sy / n) / (n - lit(1))).as("cov_qty_price"),
        round(((sxy - sx * sy / n) /
          (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))), 6)
          .as("corr_qty_price"))
  }

  private val covarSql = {
    val sx = "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    val sy = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
    val sxx = "CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS DOUBLE)"
    val syy = "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS DOUBLE)"
    val sxy = "CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS DOUBLE)"
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ($sxy - $sx * $sy / COUNT(*)) / (COUNT(*) - 1) AS cov_qty_price,
       |  round(($sxy - $sx * $sy / COUNT(*)) /
       |    (sqrt($sxx - $sx * $sx / COUNT(*)) * sqrt($syy - $sy * $sy / COUNT(*))), 6)
       |    AS corr_qty_price
       |FROM lineitem GROUP BY l_returnflag""".stripMargin
  }

  /** PIVOT: row-values → columns. Spark computes the inner
    * groupBy(flag, status) aggregate first, then pivots the (few)
    * status values — so the shuffle is the ordinary two-key agg, never
    * width-dependent. Explicit pivot values keep the plan static (no
    * distinct-values pre-query). Missing (flag,status) combos are NULL
    * (not 0) in both the pivot and the CASE-sum oracle.
    */
  private val pivotQ = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))

  private val pivotSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // GROUPING SETS with grouping() markers, via the SQL surface (the
  // same text runs verbatim on DuckDB).
  private val groupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  private val groupingSetsQ = (s: SparkSession, dir: String) => {
    graft.Tables.registerAll(s, dir)
    s.sql(groupingSetsSql)
  }

  /** Co-purchase pair mining — the market-basket co-occurrence shape
    * (the support count of the apriori/FP-growth first pass): part
    * pairs that appear together in ≥2 orders, top-20 by support. The
    * pairing self-join is keyed on the ORDER — fan-out is bounded by
    * order size squared (≤13² here; basket-bounded at any scale),
    * never by part popularity — and the distinct pre-pass collapses
    * repeated lines of the same part first. Exchanges carry
    * (order, part) then pair partials; the final top-20 is a
    * TakeOrdered with full deterministic tiebreaks. */
  private val copurchaseQ = (s: SparkSession, dir: String) => {
    // ONE basket shuffle (collect_set dedups parts within the order —
    // no distinct pre-pass), then the C(basket,2) pair fan-out is
    // MAP-SIDE (explode², a<b) into the pair aggregate. Re-planned
    // from the original distinct+self-join form: one fewer exchange,
    // and the fan-out is explicitly basket-bounded (TPC-H baskets ≤ 7;
    // a pathological mega-basket would cap via the same width-bucket
    // trick the clustered layout uses).
    // (r9 note: a combination-generating rewrite via transform/flatten
    // lambdas was tried and measured WORSE in interleaved A/B — HOF
    // lambdas are interpreted per element, the q_sim_knn_graph lesson;
    // the double explode below is whole-stage-codegen end to end and
    // the half it filters away costs less than lambda dispatch.)
    val baskets = graft.Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
      .groupBy(col("okey")).agg(collect_set(col("pk")).as("ps"))
    baskets
      .select(explode(col("ps")).as("part_a"), col("ps"))
      .select(col("part_a"), explode(col("ps")).as("part_b"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
  }

  private val copurchaseSql =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem)
      |SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_orders
      |FROM li a JOIN li b ON a.okey = b.okey AND a.pk < b.pk
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 2
      |ORDER BY n_orders DESC, part_a ASC, part_b ASC LIMIT 20""".stripMargin

  /** KMV (k-minimum-values) audience-overlap sketch — the distinct-set
    * INTERSECTION estimate HLL cannot produce (HLL unions; KMV
    * composes): how many users both clicked AND purchased, estimated
    * from two 64-hash sketches, reported beside the exact answer so
    * the estimate is auditable. The hash is an explicit LCG in BIGINT
    * arithmetic ((u·1103515245 + 12345) mod 2²¹) — bit-identical in
    * both engines, no engine hash function involved — and every
    * estimate is one integer floor-division, so the whole query is
    * integer-exact. Standard KMV algebra: per-set sketch = k smallest
    * distinct hashes; union sketch = k smallest of the merged
    * sketches; est_union = (k−1)·H / kth(M); intersection via the
    * Jaccard fraction |M∩KA∩KB|/k of est_union. Sets smaller than k
    * are carried exactly (the sketch IS the set). Plan: the only
    * corpus-scale exchange is the distinct (type, user) collapse; the
    * sketches are k-row tables from a per-type rank (at production
    * scale a bounded k-min partial aggregate, the sampling-heap twin's
    * shape); everything after is k-sized joins. */
  private val KmvK = 64
  private val KmvH = 2097152L // 2^21 hash space
  private val kmvIntersectQ = (s: SparkSession, dir: String) => {
    val users = graft.Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
      .withColumn("h", (col("u") * 1103515245L + 12345L) % KmvH)
    val exact = users.groupBy(col("t")).agg(countDistinct(col("u")).as("n"))
    val exactBoth = users.filter(col("t") === "click").select(col("u"))
      .intersect(users.filter(col("t") === "purchase").select(col("u")))
      .agg(count(lit(1)).as("exact_both"))
    val hashes = users.select(col("t"), col("h")).distinct()
    val rk = Window.partitionBy(col("t")).orderBy(col("h").asc)
    val sk = hashes.withColumn("r", row_number().over(rk))
      .filter(col("r") <= KmvK)
    val ka = sk.filter(col("t") === "click").select(col("h"))
    val kb = sk.filter(col("t") === "purchase").select(col("h"))
    val m = ka.union(kb).distinct()
      .withColumn("r", row_number().over(Window.orderBy(col("h").asc)))
      .filter(col("r") <= KmvK).select(col("h"))
    def kth(df: DataFrame) = df.agg(max(col("h")).as("kth"),
      count(lit(1)).as("cnt"))
    // all estimates are single BIGINT floor-divisions (`div` here,
    // `//` in the oracle) — double `/` would round differently across
    // engines at the cast
    val numer = (KmvK - 1).toLong * KmvH
    def est(kthName: String, cntName: String, exactN: Column): Column =
      when(col(cntName) < KmvK, exactN)
        .otherwise(expr(s"$numer div $kthName")).cast("long")
    val interCnt = m.join(ka, "h").join(kb, "h").agg(count(lit(1)).as("mi"))
    val na = exact.filter(col("t") === "click")
      .select(col("n").as("exact_click"))
    val nb = exact.filter(col("t") === "purchase")
      .select(col("n").as("exact_purchase"))
    kth(ka).select(col("kth").as("ka_kth"), col("cnt").as("ka_cnt"))
      .crossJoin(kth(kb).select(col("kth").as("kb_kth"), col("cnt").as("kb_cnt")))
      .crossJoin(kth(m).select(col("kth").as("m_kth"), col("cnt").as("m_cnt")))
      .crossJoin(interCnt).crossJoin(na).crossJoin(nb).crossJoin(exactBoth)
      .select(
        lit(KmvK.toLong).as("k"),
        col("exact_click"), col("exact_purchase"), col("exact_both"),
        est("ka_kth", "ka_cnt", col("exact_click")).as("est_click"),
        est("kb_kth", "kb_cnt", col("exact_purchase")).as("est_purchase"),
        est("m_kth", "m_cnt",
          col("exact_click") + col("exact_purchase") - col("exact_both"))
          .as("est_union"),
        col("mi"))
      .withColumn("est_both",
        expr(s"(mi * est_union) div $KmvK").cast("long"))
      .drop("mi")
  }

  private val kmvIntersectSql = {
    val k = KmvK; val h = KmvH
    s"""WITH users AS (
       |  SELECT DISTINCT event_type AS t, user_id AS u FROM events
       |  WHERE event_type IN ('click', 'purchase')),
       |hu AS (SELECT t, u, (u * 1103515245 + 12345) % $h AS hh FROM users),
       |exact AS (SELECT t, COUNT(DISTINCT u) AS n FROM hu GROUP BY 1),
       |eboth AS (
       |  SELECT COUNT(*) AS exact_both FROM (
       |    SELECT u FROM hu WHERE t = 'click'
       |    INTERSECT SELECT u FROM hu WHERE t = 'purchase')),
       |hashes AS (SELECT DISTINCT t, hh FROM hu),
       |sk AS (
       |  SELECT t, hh FROM (
       |    SELECT t, hh, row_number() OVER (
       |      PARTITION BY t ORDER BY hh ASC) AS r FROM hashes)
       |  WHERE r <= $k),
       |ka AS (SELECT hh FROM sk WHERE t = 'click'),
       |kb AS (SELECT hh FROM sk WHERE t = 'purchase'),
       |m AS (
       |  SELECT hh FROM (
       |    SELECT hh, row_number() OVER (ORDER BY hh ASC) AS r FROM (
       |      SELECT DISTINCT hh FROM (
       |        SELECT hh FROM ka UNION ALL SELECT hh FROM kb)))
       |  WHERE r <= $k),
       |sa AS (SELECT MAX(hh) AS kth, COUNT(*) AS cnt FROM ka),
       |sb AS (SELECT MAX(hh) AS kth, COUNT(*) AS cnt FROM kb),
       |sm AS (SELECT MAX(hh) AS kth, COUNT(*) AS cnt FROM m),
       |mi AS (
       |  SELECT COUNT(*) AS mi FROM m
       |  JOIN ka ON m.hh = ka.hh JOIN kb ON m.hh = kb.hh),
       |na AS (SELECT n AS exact_click FROM exact WHERE t = 'click'),
       |nb AS (SELECT n AS exact_purchase FROM exact WHERE t = 'purchase')
       |SELECT CAST($k AS BIGINT) AS k,
       |  exact_click, exact_purchase, exact_both,
       |  CAST(CASE WHEN sa.cnt < $k THEN exact_click
       |    ELSE (${k - 1} * $h) // sa.kth END AS BIGINT) AS est_click,
       |  CAST(CASE WHEN sb.cnt < $k THEN exact_purchase
       |    ELSE (${k - 1} * $h) // sb.kth END AS BIGINT) AS est_purchase,
       |  CAST(CASE WHEN sm.cnt < $k THEN
       |      exact_click + exact_purchase - exact_both
       |    ELSE (${k - 1} * $h) // sm.kth END AS BIGINT) AS est_union,
       |  CAST((mi * (CASE WHEN sm.cnt < $k THEN
       |      exact_click + exact_purchase - exact_both
       |    ELSE (${k - 1} * $h) // sm.kth END)) // $k AS BIGINT) AS est_both
       |FROM sa, sb, sm, mi, na, nb, eboth""".stripMargin
  }

  // ---- Pearson correlation matrix (integer-exact moments) --------
  //
  // Pairwise correlation of (quantity, price-cents, discount-points)
  // over lineitem. The built-in corr() accumulates doubles, whose
  // partial/final order differs between engines — so this computes the
  // FIVE raw moments exactly instead (Σx, Σy, Σxy, Σx², Σy² on scaled
  // integers, decimal-cast before summing so no width ever wraps) and
  // assembles r = (n·Σxy − ΣxΣy) / √(n·Σx²−(Σx)²) / √(n·Σy²−(Σy)²)
  // in ONE final double expression — bit-identical in both engines.
  // One partial-agg pass over the fact table produces a single moment
  // row; the 3×3 matrix is a stack over that row. At 100 TB: same one
  // pass (map-side partials), no extra shuffle.
  //
  // MAGNITUDE BOUND: widest exact term is n·Σy² (price cents ≤ ~10⁷,
  // so Σy² ≤ rows·10¹⁴) — decimal(38) holds past 10²³ rows; the
  // per-row products stay in BIGINT (y² ≤ 10¹⁴).
  private val corrMatrixQ = (s: SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"),
      round(col("l_discount") * 100).cast("long").as("z"))
    def m(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val sums = li.agg(
      count(lit(1)).as("n"),
      m(col("x")).as("sx"), m(col("y")).as("sy"), m(col("z")).as("sz"),
      m(col("x") * col("x")).as("sxx"), m(col("y") * col("y")).as("syy"),
      m(col("z") * col("z")).as("szz"),
      m(col("x") * col("y")).as("sxy"), m(col("x") * col("z")).as("sxz"),
      m(col("y") * col("z")).as("syz"))
    def r(sa: String, sb: String, sab: String, saa: String, sbb: String) =
      round(
        (col("n") * col(sab) - col(sa) * col(sb)).cast("double") /
          (sqrt((col("n") * col(saa) - col(sa) * col(sa)).cast("double")) *
           sqrt((col("n") * col(sbb) - col(sb) * col(sb)).cast("double"))), 6)
    sums
      .withColumn("r_qty_price", r("sx", "sy", "sxy", "sxx", "syy"))
      .withColumn("r_qty_disc", r("sx", "sz", "sxz", "sxx", "szz"))
      .withColumn("r_price_disc", r("sy", "sz", "syz", "syy", "szz"))
      .select(expr(
        """stack(3,
          |  'quantity', 'price', r_qty_price,
          |  'quantity', 'discount', r_qty_disc,
          |  'price', 'discount', r_price_disc) AS (var_a, var_b, corr_r)"""
          .stripMargin))
  }

  // DuckDB decimal multiply requires p1+p2+1 <= 38, so the oracle
  // declares tight per-moment precisions (values bounded far below
  // them at any fixture SF) and casts each exact product to double
  // before the subtraction — the same final-expression shape as the
  // Spark side.
  private val corrMatrixSql =
    """WITH li AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
      |    CAST(round(l_discount * 100) AS BIGINT) AS z
      |  FROM lineitem),
      |mo AS (
      |  SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
      |    SUM(CAST(x AS DECIMAL(18,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(18,0))) AS sy,
      |    SUM(CAST(z AS DECIMAL(18,0))) AS sz,
      |    SUM(CAST(x*x AS DECIMAL(27,0))) AS sxx,
      |    SUM(CAST(y*y AS DECIMAL(27,0))) AS syy,
      |    SUM(CAST(z*z AS DECIMAL(27,0))) AS szz,
      |    SUM(CAST(x*y AS DECIMAL(27,0))) AS sxy,
      |    SUM(CAST(x*z AS DECIMAL(27,0))) AS sxz,
      |    SUM(CAST(y*z AS DECIMAL(27,0))) AS syz
      |  FROM li),
      |r AS (
      |  SELECT
      |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS r_qty_price,
      |    round(CAST(n * sxz - sx * sz AS DOUBLE) /
      |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |       sqrt(CAST(n * szz - sz * sz AS DOUBLE))), 6) AS r_qty_disc,
      |    round(CAST(n * syz - sy * sz AS DOUBLE) /
      |      (sqrt(CAST(n * syy - sy * sy AS DOUBLE)) *
      |       sqrt(CAST(n * szz - sz * sz AS DOUBLE))), 6) AS r_price_disc
      |  FROM mo)
      |SELECT 'quantity' AS var_a, 'price' AS var_b, r_qty_price AS corr_r FROM r
      |UNION ALL
      |SELECT 'quantity', 'discount', r_qty_disc FROM r
      |UNION ALL
      |SELECT 'price', 'discount', r_price_disc FROM r""".stripMargin

  // ---- recency-decayed engagement score --------------------------
  //
  // Per user: Σ value · 2^(−⌊age_weeks⌋) against the corpus max
  // timestamp — the half-life-per-week feature recommender pipelines
  // compute. INTEGER-EXACT throughout: cents × 2^(20−k) in BIGINT
  // (k capped at 20 — beyond 20 half-lives the weight underflows the
  // display rounding anyway), one final division by 100·2²⁰. The
  // anchor (max ts) rides along as a broadcast scalar; the aggregate
  // is one partial-agg shuffle on user_id.
  private val decayScoreQ = (s: SparkSession, dir: String) => {
    val anchor = Tables.events(s, dir).agg(max(col("ts")).as("mx"))
    Tables.events(s, dir)
      .crossJoin(broadcast(anchor))
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("c"),
        least(
          expr("(unix_micros(mx) - unix_micros(ts)) div 604800000000"),
          lit(20L)).as("k"))
      .select(col("user_id"), col("c"),
        (col("c") * pow(lit(2.0), lit(20L) - col("k")).cast("long")).as("t"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("t")).as("decay_score_u"),
        // no round(): the exact integer score divided by the dyadic
        // constant is ONE deterministic double in both engines, while
        // round() at a fixed scale can land exactly on a half boundary
        // (denominator 100·2^20 admits x.xxxx5 rationals) where engine
        // rounding conventions differ.
        (sum(col("t")) / 1048576.0 / 100.0).as("decay_score"))
  }

  private val decayScoreSql =
    """WITH a AS (SELECT max(ts) AS mx FROM events),
      |t AS (
      |  SELECT user_id,
      |    CAST(round(value * 100) AS BIGINT) *
      |      CAST(power(2, 20 - least(
      |        (epoch_us(mx) - epoch_us(ts)) // 604800000000, 20))
      |       AS BIGINT) AS t
      |  FROM events, a)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(t AS DECIMAL(18,0))) AS BIGINT) AS decay_score_u,
      |  CAST(SUM(CAST(t AS DECIMAL(18,0))) AS DOUBLE)
      |    / 1048576.0 / 100.0 AS decay_score
      |FROM t GROUP BY 1""".stripMargin

  // ---- Gini diversity index (rational, no logs) ------------------
  //
  // Per user: Gini impurity of the event-type mix, 1 − Σ(cᵢ/n)² =
  // (n² − Σcᵢ²)/n² — the diversity feature entropy would give, but
  // RATIONAL: numerator and denominator are exact integers, one double
  // division at the end, so both engines agree to the bit (ln/log2
  // differ across libms in the last ulp; Gini needs no transcendental
  // call). Two stacked aggregations, both on the same user key — the
  // per-(user,type) counts and the per-user fold reuse one partitioning.
  private val giniQ = (s: SparkSession, dir: String) => {
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sc2"))
      .select(col("user_id"), col("n"), col("n_types"),
        ((col("n") * col("n") - col("sc2")) /
          (col("n") * col("n"))).as("gini"))
  }

  private val giniSql =
    """WITH tc AS (
      |  SELECT user_id, event_type, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) AS n,
      |    COUNT(*) AS n_types,
      |    CAST(SUM(CAST(c * c AS DECIMAL(18,0))) AS BIGINT) AS sc2
      |  FROM tc GROUP BY 1)
      |SELECT user_id, n, n_types,
      |  (n * n - sc2) / (n * n) AS gini
      |FROM u""".stripMargin

  // ---- native heavy-hitters sketch (Space-Saving) -----------------
  //
  // The catalog-registered TypedImperativeAggregate
  // (functions.FreqItemsSketch): per-partition Space-Saving summaries,
  // merged as cap-bounded sketches — the partial/final shape where
  // only ≤cap entries per partition ever cross the wire, which is the
  // whole point at 100 TB (exact top-k by count needs a full groupBy
  // shuffle of every distinct key; the sketch exchanges KBs). Run here
  // in the EXACT regime — cap (64) ≥ the event-type vocabulary — where
  // the sketch provably degenerates to the exact count map with zero
  // error, so the DuckDB GROUP BY oracle checks it bit-for-bit. The
  // approximate regime's est−err ≤ true ≤ est invariant is
  // FreqItemsSpec territory (planted skew, tiny cap).
  private val freqItemsQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, dir)
      .agg(expr("freq_items_sketch(event_type, 64)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("event_type"), col("e.est").as("n"),
        col("e.err").as("err"))
  }

  /** Shared with the streaming twin (StreamOps.q_stream_freq_items). */
  private[graft] val freqItemsSql =
    """SELECT event_type, COUNT(*) AS n, CAST(0 AS BIGINT) AS err
      |FROM events WHERE event_type IS NOT NULL
      |GROUP BY event_type""".stripMargin

  /** Native mergeable quantile sketch (§4.2 family beside Space-Saving
    * and KMV): per-event-type P25/P50/P75/P90 of floor(value) through
    * `quantile_sketch` — a KLL-style compactor stack whose cap-bounded
    * partials cross the exchange instead of rows. Probabilities ride
    * as MICRO integers so the rank ceil is integer-exact in both
    * engines; at fixture scale the cap exceeds every group (the
    * exact-below-cap regime the oracle checks — QuantileSketchSpec
    * separately proves the bounded-error collapse regime and merge-
    * order invariance). Output explodes to (event_type, pos, q) so
    * the driver hashes scalars, never arrays. */
  private val quantileSketchQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, dir)
      // mirrors the oracle's WHERE value IS NOT NULL: an all-NULL
      // group must emit NO row, not a q=0 row (update() skipping
      // nulls alone would keep the group)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(floor(value) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(expr(
        "quantile_sketch(v, 100000, '250000,500000,750000,900000')")
        .as("qs"))
      .select(col("event_type"), posexplode(col("qs")))
      .select(col("event_type"), col("pos"), col("col").as("q"))
  }

  /** Shared with the streaming twin (StreamOps.q_stream_quantile). */
  private[graft] val quantileSketchSql =
    """WITH g AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |a AS (SELECT event_type, list_sort(list(v)) AS sv,
      |        COUNT(*) AS n
      |      FROM g GROUP BY 1),
      |p AS (SELECT * FROM (VALUES (0, 250000), (1, 500000),
      |        (2, 750000), (3, 900000)) t(pos, pm))
      |SELECT a.event_type, p.pos,
      |  sv[CAST(GREATEST(1, (p.pm * n + 999999) // 1000000)
      |     AS BIGINT)] AS q
      |FROM a CROSS JOIN p""".stripMargin

  /** Equi-depth feature bucketization — the sketch composed into the
    * ML-pipeline's binning pass: per event type, quartile boundaries
    * come from `quantile_sketch` (exact below cap), broadcast as the
    * |types|-bounded side, and every event maps to its bin with a
    * map-side comparison chain (v ≤ q1 → 0, ≤ q2 → 1, ≤ q3 → 2,
    * else 3). Equi-DEPTH (not equi-width): each bin carries ~25% of
    * the mass regardless of the value distribution — what a feature
    * discretizer actually wants. Reported per (type, bin): count and
    * the bin's observed [min, max].
    *
    * 100 TB posture: sketch partials + one broadcast + one map-side
    * classification + one (type, bin) partial-agg. */
  private val quantileBinsQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(floor(value) AS BIGINT)").as("v"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("quantile_sketch(v, 100000, '250000,500000,750000')")
        .as("qs"))
      .select(col("event_type").as("bt"), col("qs").getItem(0).as("q1"),
        col("qs").getItem(1).as("q2"), col("qs").getItem(2).as("q3"))
    ev.join(broadcast(bounds), col("event_type") === col("bt"))
      .withColumn("bin",
        when(col("v") <= col("q1"), 0L)
          .when(col("v") <= col("q2"), 1L)
          .when(col("v") <= col("q3"), 2L).otherwise(3L))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("bin_min"), max(col("v")).as("bin_max"))
  }

  private val quantileBinsSql =
    """WITH g AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v
      |  FROM events),
      |b AS (
      |  SELECT event_type,
      |    sv[CAST(GREATEST(1, (250000 * n + 999999) // 1000000)
      |       AS BIGINT)] AS q1,
      |    sv[CAST(GREATEST(1, (500000 * n + 999999) // 1000000)
      |       AS BIGINT)] AS q2,
      |    sv[CAST(GREATEST(1, (750000 * n + 999999) // 1000000)
      |       AS BIGINT)] AS q3
      |  FROM (SELECT event_type, list_sort(list(v)) AS sv, COUNT(*) AS n
      |        FROM g GROUP BY 1))
      |SELECT g.event_type,
      |  CAST(CASE WHEN g.v <= b.q1 THEN 0 WHEN g.v <= b.q2 THEN 1
      |       WHEN g.v <= b.q3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
      |  COUNT(*) AS n, MIN(g.v) AS bin_min, MAX(g.v) AS bin_max
      |FROM g JOIN b ON g.event_type = b.event_type
      |GROUP BY 1, 2""".stripMargin

  /** Quantile-band outlier gate — the sketch composed INTO an
    * operator: per event type the [P05, P95] band comes from
    * `quantile_sketch` (exact below cap, so the gate is exact at
    * fixture scale and honestly approximate at 100 TB, where the band
    * is the point), then one broadcast-band map pass classifies every
    * event. The band side is |types|-bounded — a legitimate
    * broadcast, unlike the SF-scaling ones round 6 removed.
    *
    * 100 TB posture: sketch partials cross the exchange (cap-bounded),
    * the gate is map-only against the broadcast band. */
  private val quantileGateQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(floor(value) AS BIGINT)").as("v"))
    val band = ev.groupBy(col("event_type"))
      .agg(expr("quantile_sketch(v, 100000, '50000,950000')").as("qs"))
      .select(col("event_type").as("bt"),
        col("qs").getItem(0).as("lo"), col("qs").getItem(1).as("hi"))
    ev.join(broadcast(band), col("event_type") === col("bt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_above"),
        max(col("lo")).as("p05"), max(col("hi")).as("p95"))
      .withColumn("inlier_micro",
        expr("(1000000 * (n_events - n_below - n_above)) div n_events"))
  }

  private val quantileGateSql =
    """WITH g AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v
      |  FROM events),
      |band AS (
      |  SELECT event_type,
      |    sv[CAST(GREATEST(1, (50000 * n + 999999) // 1000000)
      |       AS BIGINT)] AS lo,
      |    sv[CAST(GREATEST(1, (950000 * n + 999999) // 1000000)
      |       AS BIGINT)] AS hi
      |  FROM (SELECT event_type, list_sort(list(v)) AS sv, COUNT(*) AS n
      |        FROM g GROUP BY 1))
      |SELECT g.event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN g.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_below,
      |  CAST(SUM(CASE WHEN g.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above,
      |  MAX(b.lo) AS p05, MAX(b.hi) AS p95,
      |  (1000000 * (COUNT(*)
      |    - CAST(SUM(CASE WHEN g.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
      |    - CAST(SUM(CASE WHEN g.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)))
      |    // COUNT(*) AS inlier_micro
      |FROM g JOIN band b ON g.event_type = b.event_type
      |GROUP BY 1""".stripMargin

  // ---- per-group OLS fit (integer moments, like the corr matrix) --
  //
  // slope/intercept of extendedprice-cents vs quantity per returnflag:
  // slope = (n·Σxy − ΣxΣy)/(n·Σxx − Σx²), intercept = (Σy − m·Σx)/n —
  // the same exact-integer-moments-then-one-double-expression
  // discipline as q_agg_corr_matrix, grouped. One partial-agg pass.
  private val olsFitQ = (s: SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    def m(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        m(col("x")).as("sx"), m(col("y")).as("sy"),
        m(col("x") * col("x")).as("sxx"), m(col("x") * col("y")).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope_cents"),
        ((col("sy").cast("double") -
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            col("sx").cast("double")) / col("n")).as("intercept_cents"))
  }

  private val olsFitSql =
    """WITH li AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |mo AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
      |    SUM(CAST(x AS DECIMAL(18,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(18,0))) AS sy,
      |    SUM(CAST(x*x AS DECIMAL(27,0))) AS sxx,
      |    SUM(CAST(x*y AS DECIMAL(27,0))) AS sxy
      |  FROM li GROUP BY 1)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents,
      |  (CAST(sy AS DOUBLE) -
      |   CAST(n * sxy - sx * sy AS DOUBLE) /
      |     CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS intercept_cents
      |FROM mo""".stripMargin

  // ---- lag-1 autocorrelation per series ---------------------------
  //
  // Pearson r between consecutive observations of each user's value
  // series — the "is this series momentum or noise" feature. The lag
  // pairs come from one window pass; the five pair-moments are exact
  // integers; one double expression at the end. Decimal(27) pair
  // products: cents² ≤ 10⁹ per row, safe past 10¹⁸ pair rows.
  private val autocorrQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("y"))
      .withColumn("x", lag(col("y"), 1).over(w))
      .filter(col("x").isNotNull)
    def m(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(27,0)"))
    pairs.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        m(col("x")).as("sx"), m(col("y")).as("sy"),
        m(col("x") * col("x")).as("sxx"), m(col("y") * col("y")).as("syy"),
        m(col("x") * col("y")).as("sxy"))
      .filter(col("n") >= 3)
      .select(col("user_id"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("r_lag1"))
  }

  private val autocorrSql =
    """WITH c AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |p AS (
      |  SELECT user_id, y,
      |    lag(y) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS x
      |  FROM c),
      |mo AS (
      |  SELECT user_id, CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
      |    SUM(CAST(x AS DECIMAL(18,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(18,0))) AS sy,
      |    SUM(CAST(x*x AS DECIMAL(27,0))) AS sxx,
      |    SUM(CAST(y*y AS DECIMAL(27,0))) AS syy,
      |    SUM(CAST(x*y AS DECIMAL(27,0))) AS sxy
      |  FROM p WHERE x IS NOT NULL GROUP BY 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r_lag1
      |FROM mo WHERE n >= 3""".stripMargin

  // ---- skewness / excess kurtosis per group -----------------------
  //
  // Third and fourth standardized moments from exact integer power
  // sums (x ≤ 50 ⇒ x⁴ ≤ 6.25·10⁶; DECIMAL(38) sums are exact past
  // 10³⁰ rows), then ONE double expression whose tree is mirrored
  // token-for-token in the oracle — the OLS/corr-matrix discipline.
  // One partial-agg pass; nothing but the |groups|-row moment table
  // ever crosses the exchange.
  private val skewKurtQ = (s: SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("x"))
    def m(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val mo = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        m(col("x")).as("s1"),
        m(col("x") * col("x")).as("s2"),
        m(col("x") * col("x") * col("x")).as("s3"),
        m(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val ms = mo.select(col("l_returnflag"), col("n"),
      (col("s1").cast("double") / col("n").cast("double")).as("m1"),
      (col("s2").cast("double") / col("n").cast("double")).as("e2"),
      (col("s3").cast("double") / col("n").cast("double")).as("e3"),
      (col("s4").cast("double") / col("n").cast("double")).as("e4"))
    ms.withColumn("v", col("e2") - col("m1") * col("m1"))
      .select(col("l_returnflag"), col("n"),
        col("m1").as("mean"), col("v").as("variance"),
        ((col("e3") - lit(3.0d) * col("m1") * col("e2")
          + lit(2.0d) * col("m1") * col("m1") * col("m1"))
          / (col("v") * sqrt(col("v")))).as("skewness"),
        ((col("e4") - lit(4.0d) * col("m1") * col("e3")
          + lit(6.0d) * col("m1") * col("m1") * col("e2")
          - lit(3.0d) * col("m1") * col("m1") * col("m1") * col("m1"))
          / (col("v") * col("v")) - lit(3.0d)).as("kurtosis_excess"))
  }

  private val skewKurtSql =
    """WITH li AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
      |  FROM lineitem),
      |mo AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(x AS DECIMAL(38,0))) AS s1,
      |    SUM(CAST(x*x AS DECIMAL(38,0))) AS s2,
      |    SUM(CAST(x*x*x AS DECIMAL(38,0))) AS s3,
      |    SUM(CAST(x*x*x*x AS DECIMAL(38,0))) AS s4
      |  FROM li GROUP BY 1),
      |ms AS (
      |  SELECT l_returnflag, n,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
      |  FROM mo),
      |vs AS (SELECT *, e2 - m1 * m1 AS v FROM ms)
      |SELECT l_returnflag, n, m1 AS mean, v AS variance,
      |  (e3 - 3.0 * m1 * e2 + 2.0 * m1 * m1 * m1)
      |    / (v * sqrt(v)) AS skewness,
      |  (e4 - 4.0 * m1 * e3 + 6.0 * m1 * m1 * e2
      |   - 3.0 * m1 * m1 * m1 * m1)
      |    / (v * v) - 3.0 AS kurtosis_excess
      |FROM vs""".stripMargin

  // ---- weighted median ---------------------------------------------
  //
  // Value-weighted 50th percentile: the median quantity where each row
  // counts its extendedprice CENTS of weight — the "half the revenue
  // sits below this size" statistic. Integer-exact: weights are cent
  // longs, the distinct-value weight profile comes from ONE partial-agg
  // pass (|groups|·|distinct x| rows — 50 per flag here — cross the
  // exchange, never the corpus), the cumulative profile is a window
  // over that bounded table, and the answer is the first x where
  // 2·cum ≥ total. Ties in x are pre-merged by the groupBy, so the
  // scan order is total.
  private val weightedMedianQ = (s: SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("w"))
    val prof = li.groupBy(col("l_returnflag"), col("x"))
      .agg(sum(col("w")).as("wx"))
    val cw = Window.partitionBy(col("l_returnflag")).orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(col("l_returnflag"))
    val marked = prof
      .withColumn("cum", sum(col("wx")).over(cw))
      .withColumn("tot", sum(col("wx")).over(tw))
      .filter(lit(2L) * col("cum") >= col("tot"))
    val pick = Window.partitionBy(col("l_returnflag")).orderBy(col("x").asc)
    marked.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("x").as("wmedian_qty"),
        col("tot").as("total_weight_cents"))
  }

  private val weightedMedianSql =
    """WITH li AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS w
      |  FROM lineitem),
      |prof AS (
      |  SELECT l_returnflag, x, CAST(SUM(w) AS BIGINT) AS wx
      |  FROM li GROUP BY 1, 2),
      |cumed AS (
      |  SELECT l_returnflag, x,
      |    CAST(SUM(wx) OVER (PARTITION BY l_returnflag ORDER BY x ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(SUM(wx) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      |  FROM prof),
      |marked AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY x ASC) AS rn
      |  FROM cumed WHERE 2 * cum >= tot)
      |SELECT l_returnflag, x AS wmedian_qty, tot AS total_weight_cents
      |FROM marked WHERE rn = 1""".stripMargin

  // ---- robust outliers via median absolute deviation ---------------
  //
  // The robust twin of q_ts_anomaly's z-score: per event type, the
  // exact median (2× scaled: med2 = the sum of the two middle order
  // statistics — one doubled row when n is odd — so interpolation
  // never leaves the integers) and the MAD (4× scaled the same way,
  // over dev2 = |2x − med2|), then the standard |x − med| >
  // 3·1.4826·MAD cut as the pure-integer test 10000·dev2 > 22239·mad4.
  // Two rank windows keyed on the group + two broadcast joins of the
  // |groups|-row medians; nothing float anywhere.
  private val madOutliersQ = (s: SparkSession, dir: String) => {
    val base = Tables.events(s, dir).select(col("event_type"),
      round(col("value") * 100).cast("long").as("x"))
    def med2Of(df: DataFrame, c: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(c).asc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("event_type"))))
        .withColumn("lo", expr("(n + 1) div 2"))
        .withColumn("hi", expr("(n + 2) div 2"))
        .groupBy(col("event_type"))
        .agg((sum(when(col("rn") === col("lo"), col(c)).otherwise(0L))
          + sum(when(col("rn") === col("hi"), col(c)).otherwise(0L)))
          .as(s"${c}_med2"),
          max(col("n")).as("n"))
    }
    val med = med2Of(base, "x")
    val dev = base.join(broadcast(med), "event_type")
      .withColumn("dev2", abs(lit(2L) * col("x") - col("x_med2")))
    val mad = med2Of(dev.select(col("event_type"), col("dev2")), "dev2")
      .select(col("event_type"), col("dev2_med2").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("x_med2")).as("med2"),
        max(col("mad4")).as("mad4"),
        sum(when(lit(10000L) * col("dev2") > lit(22239L) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  private val madOutliersSql =
    """WITH base AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events),
      |r1 AS (
      |  SELECT event_type, x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY x ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM base),
      |med AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END)
      |       + SUM(CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
      |      AS BIGINT) AS x_med2,
      |    MAX(n) AS n
      |  FROM r1 GROUP BY 1),
      |dev AS (
      |  SELECT b.event_type, m.n, m.x_med2,
      |    abs(2 * b.x - m.x_med2) AS dev2
      |  FROM base b JOIN med m ON b.event_type = m.event_type),
      |r2 AS (
      |  SELECT event_type, dev2,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev2 ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev2 ELSE 0 END)
      |       + SUM(CASE WHEN rn = (n + 2) // 2 THEN dev2 ELSE 0 END)
      |      AS BIGINT) AS mad4
      |  FROM r2 GROUP BY 1)
      |SELECT d.event_type, MAX(d.n) AS n, MAX(d.x_med2) AS med2,
      |  MAX(ma.mad4) AS mad4,
      |  CAST(SUM(CASE WHEN 10000 * d.dev2 > 22239 * ma.mad4
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad ma ON d.event_type = ma.event_type
      |GROUP BY 1""".stripMargin

  // ---- Pareto / ABC cut --------------------------------------------
  //
  // "How concentrated is revenue?": per returnflag, the minimal set of
  // suppliers covering ≥80% of revenue — ranked by revenue (cents,
  // exact), the 80% line tested as the pure-integer `5·cum ≥ 4·tot`.
  // One partial-agg pass collapses the corpus to |groups|·|suppliers|
  // rows; the rank/cumulative windows run on that bounded profile.
  private val paretoCutQ = (s: SparkSession, dir: String) => {
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("w"))
    val cw = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("w").desc, col("l_suppkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(col("l_returnflag"))
    rev
      .withColumn("cum", sum(col("w")).over(cw))
      .withColumn("tot", sum(col("w")).over(tw))
      .withColumn("nsup", count(lit(1)).over(tw))
      // the minimal 80% prefix: every strict-prefix row below the line,
      // plus the crossing row
      .filter(lit(5L) * (col("cum") - col("w")) < lit(4L) * col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("nsup")).as("n_total"),
        count(lit(1)).as("n_top80"),
        max(col("cum")).as("cut_revenue_cents"),
        max(col("tot")).as("total_cents"))
  }

  private val paretoCutSql =
    """WITH rev AS (
      |  SELECT l_returnflag, l_suppkey,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, l_suppkey, w,
      |    CAST(SUM(w) OVER (PARTITION BY l_returnflag
      |      ORDER BY w DESC, l_suppkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS nsup
      |  FROM rev)
      |SELECT l_returnflag, MAX(nsup) AS n_total,
      |  COUNT(*) AS n_top80,
      |  MAX(cum) AS cut_revenue_cents, MAX(tot) AS total_cents
      |FROM c WHERE 5 * (cum - w) < 4 * tot
      |GROUP BY 1""".stripMargin

  /** Skyline (Pareto-frontier) query: the parts no other part beats on
    * BOTH axes — lower price AND bigger size (with at least one strict).
    * The classic multi-objective "best tradeoffs" operator ([pub:
    * Börzsönyi/Kossmann/Stocker, "The Skyline Operator", ICDE 2001]).
    *
    * Plan (divide-and-conquer skyline): (1) the corpus collapses to
    * DISTINCT (price_cents, size) pairs via one partial-agg shuffle —
    * the value domain, not the row count, bounds everything after;
    * (2) a content-hash-bucketed LOCAL skyline pass prunes each bucket
    * to its own staircase (for ANY partition of the points, the union
    * of local skylines is a superset of the global skyline); (3) the
    * global single-partition staircase window runs over survivors
    * only. On distinct pairs ordered (price asc, size desc), a point
    * is dominated iff ANY preceding point has size >= its own — one
    * running max replaces the quadratic NOT-EXISTS the oracle spells.
    * Prices are exact integer cents end-to-end; the display division
    * by 100.0 is one correctly-rounded IEEE op, identical in both
    * engines. */
  private val skylineQ = (s: SparkSession, dir: String) => {
    val pts = Tables.part(s, dir)
      .groupBy(round(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("witness"))
    def staircase(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      df.withColumn("pmax", max(col("size")).over(
          w.orderBy(col("price_c").asc, col("size").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("pmax").isNull || col("pmax") < col("size"))
        .drop("pmax")
    val local = staircase(pts,
      Window.partitionBy(pmod(hash(col("price_c"), col("size")), lit(32))))
    staircase(local, Window.partitionBy())
      .select((col("price_c") / 100.0).as("price"), col("size"),
        col("n_parts"), col("witness"))
  }

  private val skylineSql =
    """WITH pts AS (
      |  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
      |    p_size AS size, COUNT(*) AS n_parts, MIN(p_partkey) AS witness
      |  FROM part GROUP BY 1, 2)
      |SELECT a.price_c / 100.0 AS price, a.size, a.n_parts, a.witness
      |FROM pts a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts b
      |  WHERE b.price_c <= a.price_c AND b.size >= a.size
      |    AND (b.price_c < a.price_c OR b.size > a.size))""".stripMargin

  /** Ordered string aggregation (LISTAGG / string_agg ... ORDER BY) —
    * the §2.8/§2.4 surface DuckDB spells natively and Spark does not:
    * `collect_list` is partial-merge-order nondeterministic, so the
    * deterministic form collects (sort-key, value) structs and sorts
    * AFTER the aggregate — `array_sort` on structs orders by fields
    * left-to-right, so (-cust, name) gives count-desc name-asc without
    * any window. Both orderings per region: alphabetical, and by
    * customer population. */
  private val listaggQ = (s: SparkSession, dir: String) => {
    val pop = Tables.customer(s, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cust"))
    val nat = Tables.nation(s, dir)
      .join(pop, col("n_nationkey") === col("c_nationkey"), "left")
      .join(Tables.region(s, dir),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        coalesce(col("cust"), lit(0L)).as("cust"))
    nat.groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations_alpha"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              (-col("cust")).as("negc"), col("n_name").as("nm")))),
            x => x.getField("nm")),
          ",").as("nations_by_pop"))
  }

  private val listaggSql =
    """SELECT r.r_name, COUNT(*) AS n_nations,
      |  string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_alpha,
      |  string_agg(n.n_name, ','
      |    ORDER BY COALESCE(p.cust, 0) DESC, n.n_name) AS nations_by_pop
      |FROM nation n
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cust
      |           FROM customer GROUP BY 1) p
      |  ON n.n_nationkey = p.c_nationkey
      |GROUP BY 1""".stripMargin

  /** Benford first-digit audit — the fraud/data-quality screen over a
    * money column: the leading significant digit of l_extendedprice is
    * the leading digit of its integer cents (×100 never changes the
    * first digit), extracted as substr(cast, 1, 1) — pure integer/
    * string ops, no log10 at query time. Each digit's observed
    * frequency (floor-div micro) sits beside the Benford expectation
    * log10(1+1/d) as shared micro-unit LITERALS (both engines compare
    * against the same constants) and the absolute deviation.
    *
    * 100 TB posture: map-side digit extraction, one 9-row partial-agg
    * shuffle, one 1-row total broadcast. */
  private val benfordQ = (s: SparkSession, dir: String) => {
    val d = Tables.lineitem(s, dir)
      .select(substring(round(col("l_extendedprice") * 100)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = d.agg(sum(col("n")).as("tot"))
    d.crossJoin(broadcast(tot))
      .withColumn("freq_micro", expr("(1000000 * n) div tot"))
      .withColumn("benford_micro", expr(
        "element_at(array(301030, 176091, 124939, 96910, 79181, " +
          "66947, 57992, 51153, 45757), digit)"))
      .withColumn("dev_micro",
        abs(col("freq_micro") - col("benford_micro")))
      .select(col("digit"), col("n"), col("freq_micro"),
        col("benford_micro"), col("dev_micro"))
  }

  private val benfordSql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
      |    AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |    COUNT(*) AS n
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM d)
      |SELECT digit, n, (1000000 * n) // tot AS freq_micro,
      |  ([301030, 176091, 124939, 96910, 79181,
      |    66947, 57992, 51153, 45757])[digit] AS benford_micro,
      |  abs((1000000 * n) // tot
      |    - ([301030, 176091, 124939, 96910, 79181,
      |        66947, 57992, 51153, 45757])[digit]) AS dev_micro
      |FROM d, t""".stripMargin

  /** DAU/MAU stickiness — the product-analytics engagement ratio:
    * daily active users over the containing month's monthly actives,
    * in micro. Two distinct-aggregates over the same scan (day grain,
    * month grain) joined back on the month; the month table is
    * months-tiny, so the join is broadcast.
    *
    * 100 TB posture: both rollups partial-aggregate the (grain, user)
    * distinct before any exchange; no day ever sees another day's
    * users. */
  private val dauMauQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).as("day"),
        date_trunc("month", col("ts")).as("month"), col("user_id"))
    val dau = ev.groupBy(col("day"), col("month"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val mau = ev.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(broadcast(mau), "month")
      .select(col("day"), col("dau"), col("mau"),
        expr("(1000000 * dau) div mau").as("stickiness_micro"))
  }

  private val dauMauSql =
    """WITH ev AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, user_id
      |  FROM events),
      |d AS (SELECT day, month, COUNT(DISTINCT user_id) AS dau
      |      FROM ev GROUP BY 1, 2),
      |m AS (SELECT month, COUNT(DISTINCT user_id) AS mau
      |      FROM ev GROUP BY 1)
      |SELECT d.day, d.dau, m.mau,
      |  (1000000 * d.dau) // m.mau AS stickiness_micro
      |FROM d JOIN m ON d.month = m.month""".stripMargin

  /** Herfindahl-Hirschman concentration index — the antitrust/market
    * metric: per market segment, supplier-nation revenue shares in
    * BASIS POINTS (floor-div), HHI = Σ share_bp² scaled back to the
    * standard 0–10000 range. Exact-cents money discipline; shares
    * floor to bp BEFORE squaring (the documented contract — squares
    * of exact rationals would overflow).
    *
    * 100 TB posture: the fact collapses to (segment, nation) revenue
    * cells in one partial-agg shuffle; shares and HHI are computed on
    * the ≤5×25-cell table with segment totals broadcast back. */
  private val hhiQ = (s: SparkSession, dir: String) => {
    val cells = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_mktsegment"), col("s_nationkey"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .as("cents"))
    val segTot = cells.groupBy(col("c_mktsegment"))
      .agg(sum(col("cents")).as("seg_cents"))
    cells.join(broadcast(segTot), "c_mktsegment")
      .withColumn("share_bp", expr("(10000 * cents) div seg_cents"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_supplier_nations"),
        max(col("seg_cents")).as("seg_cents"),
        max(col("share_bp")).as("max_share_bp"),
        sum(col("share_bp") * col("share_bp")).as("sum_bp2"))
      .withColumn("hhi", expr("sum_bp2 div 10000"))
  }

  private val hhiSql =
    """WITH cells AS (
      |  SELECT c.c_mktsegment, su.s_nationkey,
      |    CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier su ON l.l_suppkey = su.s_suppkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT c_mktsegment, CAST(SUM(cents) AS BIGINT)
      |          AS seg_cents
      |        FROM cells GROUP BY 1),
      |sh AS (
      |  SELECT cells.c_mktsegment, tot.seg_cents,
      |    (10000 * cells.cents) // tot.seg_cents AS share_bp
      |  FROM cells JOIN tot ON cells.c_mktsegment = tot.c_mktsegment)
      |SELECT c_mktsegment, COUNT(*) AS n_supplier_nations,
      |  MAX(seg_cents) AS seg_cents,
      |  MAX(share_bp) AS max_share_bp,
      |  CAST(SUM(share_bp * share_bp) AS BIGINT) AS sum_bp2,
      |  CAST(SUM(share_bp * share_bp) AS BIGINT) // 10000 AS hhi
      |FROM sh GROUP BY 1""".stripMargin

  /** Exponential (powers-of-two) histogram of event values — the
    * latency-distribution shape observability systems standardize on
    * (HdrHistogram/OTel): bucket b holds values with
    * floor(v) ∈ [2^(b−1), 2^b), computed EXACTLY as the bit length of
    * the integer part via `length(bin(x))` — no float log2 anywhere.
    * Complements the equi-width q_agg_histogram.
    *
    * 100 TB posture: map-side bucket id, one ≤64-key rollup; the
    * cumulative share is a window over the bucket domain. */
  private val logHistQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val b = Tables.events(s, dir)
      .select(floor(col("value")).cast("long").as("u"))
      .withColumn("bucket",
        when(col("u") === 0L, 0L)
          .otherwise(length(bin(col("u"))).cast("long")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("u")).as("min_u"),
        max(col("u")).as("max_u"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_share_micro",
        expr("(1000000 * cum_n) div sum(n) over ()"))
  }

  private val logHistSql =
    """WITH u AS (
      |  SELECT CAST(floor(value) AS BIGINT) AS u FROM events),
      |b AS (
      |  SELECT CASE WHEN u = 0 THEN 0
      |    ELSE CAST(length(bin(u)) AS BIGINT) END AS bucket,
      |    u
      |  FROM u),
      |g AS (
      |  SELECT bucket, COUNT(*) AS n, MIN(u) AS min_u, MAX(u) AS max_u
      |  FROM b GROUP BY 1)
      |SELECT bucket, n, min_u, max_u,
      |  CAST(SUM(n) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_n,
      |  (1000000 * CAST(SUM(n) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
      |    // CAST(SUM(n) OVER () AS BIGINT) AS cum_share_micro
      |FROM g""".stripMargin

  /** UNPIVOT / melt — the inverse of [[q_agg_pivot]]'s wide form: the
    * per-segment metrics table goes long as (segment, metric, value)
    * rows via stack() (codegen'd, no UDTF), the shape every
    * metrics-warehouse sink wants. Oracle is the honest UNION ALL
    * spelling.
    *
    * 100 TB posture: melt is a map-side generate over the already-
    * aggregated wide table — no new exchange. */
  private val unpivotQ = (s: SparkSession, dir: String) => {
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
          .as("cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .selectExpr("c_mktsegment",
        """stack(3,
          |  'n_orders', n_orders,
          |  'cents', cents,
          |  'n_customers', n_customers) AS (metric, value)"""
          .stripMargin)
  }

  private val unpivotSql =
    """WITH wide AS (
      |  SELECT c.c_mktsegment, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents,
      |    COUNT(DISTINCT o.o_custkey) AS n_customers
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1)
      |SELECT c_mktsegment, 'n_orders' AS metric, n_orders AS value
      |FROM wide
      |UNION ALL
      |SELECT c_mktsegment, 'cents', cents FROM wide
      |UNION ALL
      |SELECT c_mktsegment, 'n_customers', n_customers FROM wide"""
      .stripMargin

  /** Cohort LTV curve — the growth-analytics money twin of the
    * retention matrix: users cohorted by signup week; for each cohort
    * age (weeks since signup, 0..3), the CUMULATIVE purchase value in
    * centi and the per-user LTV (floor-div by cohort size). Purchases
    * before signup are excluded (the hazard query's discipline).
    *
    * 100 TB posture: one user collapse, one (cohort, age) rollup;
    * the cumulative window runs over the 4-age domain per cohort. */
  private val ltvQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("ts").cast("long")).as("su"))
      .withColumn("cohort", expr("su div 604800"))
    val sizes = signup.groupBy(col("cohort"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("long").as("pt"),
        floor(col("value") * 100d).cast("long").as("centi"))
      .join(signup, "user_id")
      .filter(col("pt") >= col("su"))
      .withColumn("age", expr("(pt - su) div 604800"))
      .filter(col("age") <= 3L)
      .groupBy(col("cohort"), col("age"))
      .agg(sum(col("centi")).as("rev_centi"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purch
      .withColumn("cum_centi", sum(col("rev_centi")).over(w))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("age"), col("n_users"),
        col("rev_centi"), col("cum_centi"),
        expr("cum_centi div n_users").as("ltv_centi_per_user"))
  }

  private val ltvSql =
    """WITH su AS (
      |  SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS su,
      |    MIN(CAST(floor(epoch(ts)) AS BIGINT)) // 604800 AS cohort
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |sizes AS (SELECT cohort, COUNT(DISTINCT user_id) AS n_users
      |          FROM su GROUP BY 1),
      |p AS (
      |  SELECT su.cohort,
      |    (CAST(floor(epoch(e.ts)) AS BIGINT) - su.su) // 604800 AS age,
      |    CAST(SUM(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_centi
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= su.su
      |    AND (CAST(floor(epoch(e.ts)) AS BIGINT) - su.su) // 604800 <= 3
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT cohort, age, rev_centi,
      |    CAST(SUM(rev_centi) OVER (PARTITION BY cohort ORDER BY age
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_centi
      |  FROM p)
      |SELECT c.cohort, c.age, s.n_users, c.rev_centi, c.cum_centi,
      |  c.cum_centi // s.n_users AS ltv_centi_per_user
      |FROM c JOIN sizes s ON c.cohort = s.cohort""".stripMargin

  /** Simpson diversity index per nation over customer market
    * segments — the ecology/catalog-diversity measure that, unlike
    * Shannon entropy, is EXACTLY rational: with class counts nᵢ and
    * N = Σnᵢ, D = Σnᵢ(nᵢ−1) / (N(N−1)) is the probability two
    * customers drawn without replacement share a segment, and
    * 1 − D is the diversity. simpson_micro floors once; nations with
    * N < 2 report NULL (the index is undefined).
    *
    * 100 TB posture: two stacked partial aggs ((nation, segment)
    * cells, then nation) — the cells domain is |nations|·|segments|,
    * so the second agg is free. */
  private val simpsonQ = (s: SparkSession, dir: String) => {
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("ni"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cats"), sum(col("ni")).as("n"),
        sum(col("ni") * (col("ni") - 1L)).as("dnum"))
      .withColumn("simpson_micro", when(col("n") >= 2L,
        lit(1000000L) - expr("(1000000 * dnum) div (n * (n - 1))")))
  }

  private val simpsonSql =
    """WITH cells AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS ni
      |  FROM customer GROUP BY 1, 2),
      |g AS (
      |  SELECT c_nationkey, COUNT(*) AS n_cats,
      |    CAST(SUM(ni) AS BIGINT) AS n,
      |    CAST(SUM(ni * (ni - 1)) AS BIGINT) AS dnum
      |  FROM cells GROUP BY 1)
      |SELECT c_nationkey, n_cats, n, dnum,
      |  CASE WHEN n >= 2 THEN
      |    1000000 - (1000000 * dnum) // (n * (n - 1))
      |  END AS simpson_micro
      |FROM g""".stripMargin

  /** Winsorized mean per event type — the robust-stats cleaning op:
    * clip values at the type's own exact P5/P95 (value-domain
    * percentile-disc: the smallest cent value whose cumulative count
    * reaches ⌈q·n⌉ — no interpolation, no floats), then the clipped
    * mean in exact cents. Reported beside the raw mean so the
    * outlier pull is visible. The value-domain discipline keeps both
    * the bounds and the clip deterministic: ties never split.
    *
    * 100 TB posture: one (type, cent-value) partial-agg collapse;
    * the cumulative window runs over the distinct value domain; the
    * bounds broadcast back onto the cells for the clipped rollup —
    * the corpus is scanned once. */
  private val winsorQ = (s: SparkSession, dir: String) => {
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"))))
    val bounds = cum.groupBy(col("event_type").as("bt"), col("n"))
      .agg(min(when(expr("cum * 20 >= n"), col("vc"))).as("p5"),
        min(when(expr("cum * 20 >= 19 * n"), col("vc"))).as("p95"))
    cells.join(broadcast(bounds), col("event_type") === col("bt"))
      .withColumn("cv", greatest(least(col("vc"), col("p95")), col("p5")))
      .groupBy(col("event_type"), col("n"), col("p5"), col("p95"))
      .agg(sum(col("vc") * col("cnt")).as("raw_sum"),
        sum(col("cv") * col("cnt")).as("wins_sum"))
      .select(col("event_type"), col("n"),
        col("p5").as("p5_cents"), col("p95").as("p95_cents"),
        expr("raw_sum div n").as("raw_mean_cents"),
        expr("wins_sum div n").as("wins_mean_cents"))
  }

  private val winsorSql =
    """WITH cells AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, vc, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM cells),
      |bounds AS (
      |  SELECT event_type AS bt, n,
      |    MIN(CASE WHEN cum * 20 >= n THEN vc END) AS p5,
      |    MIN(CASE WHEN cum * 20 >= 19 * n THEN vc END) AS p95
      |  FROM cum GROUP BY 1, 2),
      |cl AS (
      |  SELECT c.event_type, b.n, b.p5, b.p95,
      |    greatest(least(c.vc, b.p95), b.p5) AS cv, c.vc, c.cnt
      |  FROM cells c JOIN bounds b ON c.event_type = b.bt)
      |SELECT event_type, n, p5 AS p5_cents, p95 AS p95_cents,
      |  CAST(SUM(vc * cnt) AS BIGINT) // n AS raw_mean_cents,
      |  CAST(SUM(cv * cnt) AS BIGINT) // n AS wins_mean_cents
      |FROM cl GROUP BY 1, 2, 3, 4""".stripMargin

  /** 10%-trimmed mean per event type — the winsorized mean's sibling
    * that EXCLUDES the tails instead of clipping them (the robust
    * location estimate olympic scoring uses). Same value-domain
    * machinery: rank the distinct cent values cumulatively, keep the
    * mass strictly inside (P10, P90] rank bounds, where a BOUNDARY
    * value's kept multiplicity is computed exactly from the rank
    * overlap (lo/hi cut INSIDE a tied value splits that value's
    * copies — count arithmetic, no row sort).
    *
    * 100 TB posture: identical to winsorized — one (type, cent)
    * collapse, value-domain windows, one broadcast-back rollup. */
  private val trimmedQ = (s: SparkSession, dir: String) => {
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"))))
      // trim bounds as ROW RANKS: drop ranks <= lo and > hi
      .withColumn("lo", expr("n div 10"))
      .withColumn("hi", expr("n - n div 10"))
      // kept copies of this value = overlap of (cum-cnt, cum] with (lo, hi]
      .withColumn("kept", greatest(lit(0L),
        least(col("cum"), col("hi")) -
          greatest(col("cum") - col("cnt"), col("lo"))))
    cum.groupBy(col("event_type"), col("n"))
      .agg(sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("vc")).as("kept_sum"),
        sum(col("cnt") * col("vc")).as("raw_sum"))
      .select(col("event_type"), col("n"), col("n_kept"),
        expr("raw_sum div n").as("raw_mean_cents"),
        expr("kept_sum div n_kept").as("trimmed_mean_cents"))
  }

  private val trimmedSql =
    """WITH cells AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, vc, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM cells),
      |k AS (
      |  SELECT event_type, vc, cnt, cum, n,
      |    greatest(0, least(cum, n - n // 10)
      |      - greatest(cum - cnt, n // 10)) AS kept
      |  FROM cum)
      |SELECT event_type, n,
      |  CAST(SUM(kept) AS BIGINT) AS n_kept,
      |  CAST(SUM(cnt * vc) AS BIGINT) // n AS raw_mean_cents,
      |  CAST(SUM(kept * vc) AS BIGINT)
      |    // CAST(SUM(kept) AS BIGINT) AS trimmed_mean_cents
      |FROM k GROUP BY 1, 2""".stripMargin

  /** Revenue-concentration Gini per market segment — the inequality
    * measure over CUSTOMER revenue (is the segment carried by a few
    * whales?), complementing HHI (share-of-squares) and the per-user
    * event Gini. Exact rank form: with per-customer revenues x₍ᵢ₎
    * sorted ascending (custkey tiebreak — deterministic under ties,
    * documented), G = Σ(2i−n−1)x₍ᵢ₎ / (n·Σx). Reported in BASIS
    * POINTS via exact DECIMAL(38)/HUGEINT integral division (the r8
    * sf1 screen caught the plain-BIGINT 10⁴·num overflowing). The
    * SUMMED numerator is DECIMAL(38,0)/HUGEINT too (r8 advice: num ∝
    * n·Σx ∝ n² crosses 2⁶³ near sf5's ~10⁵-customer segments — Spark
    * sum(long) would wrap silently while DuckDB widens to HUGEINT, so
    * the engines would diverge exactly at the tier this query
    * targets); only the per-term product (≤ ~10¹⁵ at sf10) stays in
    * BIGINT. num is internal-only — every OUTPUT column is
    * BIGINT-representable at every tier.
    *
    * 100 TB posture: fact collapses to one row per customer first;
    * the rank window and rollup run on the customer domain. */
  private val revenueGiniQ = (s: SparkSession, dir: String) => {
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("x").asc, col("c_custkey").asc)
    rev
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("c_mktsegment"))))
      .groupBy(col("c_mktsegment"))
      .agg(max(col("n")).as("n"), sum(col("x")).as("sx"),
        // sum in DECIMAL(38,0): per-term (2i−n−1)x fits BIGINT
        // (≤ ~10¹⁵ at sf10) but the segment SUM ∝ n² wraps past 2⁶³
        // near sf5 (r8 advice) — and sum(long) wraps SILENTLY.
        sum(((lit(2L) * col("rn") - col("n") - 1L) * col("x"))
          .cast("decimal(38,0)")).as("num"))
      // div on decimals is exact integral division in both engines;
      // num ≥ 0 so floor = truncate. num itself is dropped from the
      // output: it is not BIGINT-representable at sf10.
      .withColumn("gini_bp", expr(
        "CAST((10000 * num)" +
          " div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)"))
      .drop("num")
  }

  private val revenueGiniSql =
    """WITH rev AS (
      |  SELECT c.c_mktsegment, c.c_custkey,
      |    CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT c_mktsegment, x,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY x ASC, c_custkey ASC) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT)
      |      AS n
      |  FROM rev)
      |SELECT c_mktsegment, MAX(n) AS n,
      |  CAST(SUM(x) AS BIGINT) AS sx,
      |  CAST((10000 * SUM(CAST((2 * rn - n - 1) * x AS HUGEINT)))
      |    // (CAST(MAX(n) AS HUGEINT) * CAST(SUM(x) AS HUGEINT))
      |    AS BIGINT) AS gini_bp
      |FROM rk GROUP BY 1""".stripMargin

  /** Boxplot (five-number summary + Tukey fences) per event type —
    * min / Q1 / median / Q3 / max on the exact cent value domain
    * (percentile-disc rank form, no interpolation), IQR, the
    * 1.5·IQR fences as exact HALF-CENTS (3·IQR/2 needs no division),
    * and the outlier counts outside them. The summary every
    * dashboard draws, with every number bit-stable.
    *
    * 100 TB posture: one (type, cent) collapse; the cumulative
    * window runs over the distinct value domain; fences broadcast
    * back onto the CELLS for outlier counting. */
  private val boxplotQ = (s: SparkSession, dir: String) => {
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"))))
    val summary = cum.groupBy(col("event_type").as("bt"), col("n"))
      .agg(min(col("vc")).as("v_min"), max(col("vc")).as("v_max"),
        min(when(expr("cum * 4 >= n"), col("vc"))).as("q1"),
        min(when(expr("cum * 2 >= n"), col("vc"))).as("med"),
        min(when(expr("cum * 4 >= 3 * n"), col("vc"))).as("q3"))
      // fences in HALF-CENTS: lo2 = 2*q1 - 3*iqr, hi2 = 2*q3 + 3*iqr
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo2", lit(2L) * col("q1") - lit(3L) * col("iqr"))
      .withColumn("hi2", lit(2L) * col("q3") + lit(3L) * col("iqr"))
    cells.join(broadcast(summary), col("event_type") === col("bt"))
      .groupBy(col("event_type"), col("n"), col("v_min"), col("q1"),
        col("med"), col("q3"), col("v_max"), col("iqr"))
      .agg(sum(when(expr("2 * vc < lo2"), col("cnt")).otherwise(0L))
          .as("n_low_outliers"),
        sum(when(expr("2 * vc > hi2"), col("cnt")).otherwise(0L))
          .as("n_high_outliers"))
  }

  private val boxplotSql =
    """WITH cells AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, vc, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM cells),
      |sm AS (
      |  SELECT event_type AS bt, n,
      |    MIN(vc) AS v_min, MAX(vc) AS v_max,
      |    MIN(CASE WHEN cum * 4 >= n THEN vc END) AS q1,
      |    MIN(CASE WHEN cum * 2 >= n THEN vc END) AS med,
      |    MIN(CASE WHEN cum * 4 >= 3 * n THEN vc END) AS q3
      |  FROM cum GROUP BY 1, 2),
      |f AS (
      |  SELECT *, q3 - q1 AS iqr,
      |    2 * q1 - 3 * (q3 - q1) AS lo2,
      |    2 * q3 + 3 * (q3 - q1) AS hi2
      |  FROM sm)
      |SELECT c.event_type, f.n, f.v_min, f.q1, f.med, f.q3, f.v_max,
      |  f.iqr,
      |  CAST(SUM(CASE WHEN 2 * c.vc < f.lo2 THEN c.cnt ELSE 0 END)
      |    AS BIGINT) AS n_low_outliers,
      |  CAST(SUM(CASE WHEN 2 * c.vc > f.hi2 THEN c.cnt ELSE 0 END)
      |    AS BIGINT) AS n_high_outliers
      |FROM cells c JOIN f ON c.event_type = f.bt
      |GROUP BY 1, 2, 3, 4, 5, 6, 7, 8""".stripMargin

  /** Mix-shift (price/volume) decomposition — the BI kernel behind
    * every "why did revenue move" review: between 1999 and 2000, per
    * market segment, Δrevenue splits into the VOLUME effect
    * ((n₁−n₀)·avg₀) and the RATE effect (n₁·(avg₁−avg₀)), all in
    * exact cents with floor-div averages; the flooring residual
    * Δ − volume − rate is REPORTED rather than hidden (it is < n₁+n₀
    * cents by construction — the honest remainder of an integer
    * decomposition).
    *
    * 100 TB posture: one conditional-aggregate pass on (segment);
    * the decomposition runs on the |segments|-row table. */
  private val mixShiftQ = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .withColumn("yr", year(col("o_orderdate").cast("timestamp")))
      .filter(col("yr").isin(1999, 2000))
      .select(col("c_mktsegment"), col("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    o.groupBy(col("c_mktsegment"))
      .agg(sum(when(col("yr") === 1999, 1L).otherwise(0L)).as("n0"),
        sum(when(col("yr") === 2000, 1L).otherwise(0L)).as("n1"),
        sum(when(col("yr") === 1999, col("cents")).otherwise(0L))
          .as("rev0"),
        sum(when(col("yr") === 2000, col("cents")).otherwise(0L))
          .as("rev1"))
      .filter(col("n0") > 0L && col("n1") > 0L)
      .withColumn("avg0", expr("rev0 div n0"))
      .withColumn("avg1", expr("rev1 div n1"))
      .withColumn("delta", col("rev1") - col("rev0"))
      .withColumn("volume_effect", (col("n1") - col("n0")) * col("avg0"))
      .withColumn("rate_effect", col("n1") * (col("avg1") - col("avg0")))
      .withColumn("floor_residual",
        col("delta") - col("volume_effect") - col("rate_effect"))
  }

  private val mixShiftSql =
    """WITH o AS (
      |  SELECT c.c_mktsegment,
      |    date_part('year', o.o_orderdate) AS yr,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE date_part('year', o.o_orderdate) IN (1999, 2000)),
      |g AS (
      |  SELECT c_mktsegment,
      |    CAST(SUM(CASE WHEN yr = 1999 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n0,
      |    CAST(SUM(CASE WHEN yr = 2000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n1,
      |    CAST(SUM(CASE WHEN yr = 1999 THEN cents ELSE 0 END)
      |      AS BIGINT) AS rev0,
      |    CAST(SUM(CASE WHEN yr = 2000 THEN cents ELSE 0 END)
      |      AS BIGINT) AS rev1
      |  FROM o GROUP BY 1)
      |SELECT c_mktsegment, n0, n1, rev0, rev1,
      |  rev0 // n0 AS avg0, rev1 // n1 AS avg1,
      |  rev1 - rev0 AS delta,
      |  (n1 - n0) * (rev0 // n0) AS volume_effect,
      |  n1 * (rev1 // n1 - rev0 // n0) AS rate_effect,
      |  (rev1 - rev0) - (n1 - n0) * (rev0 // n0)
      |    - n1 * (rev1 // n1 - rev0 // n0) AS floor_residual
      |FROM g WHERE n0 > 0 AND n1 > 0""".stripMargin

  /** Segment × brand affinity lift — the category-level
    * market-basket signal (q_agg_copurchase works at item-pair
    * grain): for every (market segment, part brand) cell,
    * lift = P(cell)/(P(segment)·P(brand)) over lineitem purchases,
    * exact rational micro = (n_cell·N·10⁶) div (n_seg·n_brand).
    * Lift > 1 marks over-indexed categories — the merchandising
    * readout. Zero cells are completed through the margin cross
    * (the contingency discipline): an affinity VOID is a finding.
    *
    * 100 TB posture: one (segment, brand) partial-agg collapse +
    * two margin collapses of the same scan shape; the cross and
    * lift arithmetic run on the category domain. */
  private val affinityQ = (s: SparkSession, dir: String) => {
    val base = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select(col("c_mktsegment"), col("p_brand"))
    val cells = base.groupBy(col("c_mktsegment"), col("p_brand"))
      .agg(count(lit(1)).as("n_cell"))
    val segs = base.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_seg"))
    val brands = base.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_brand"))
    val tot = base.agg(count(lit(1)).as("n_tot"))
    segs.crossJoin(broadcast(brands)).crossJoin(broadcast(tot))
      .join(cells, Seq("c_mktsegment", "p_brand"), "left")
      .withColumn("n_cell", coalesce(col("n_cell"), lit(0L)))
      .withColumn("lift_micro",
        expr("(n_cell * n_tot * 1000000) div (n_seg * n_brand)"))
      .select(col("c_mktsegment"), col("p_brand"), col("n_cell"),
        col("n_seg"), col("n_brand"), col("lift_micro"))
  }

  private val affinitySql =
    """WITH base AS (
      |  SELECT c.c_mktsegment, p.p_brand
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN part p ON l.l_partkey = p.p_partkey),
      |cells AS (
      |  SELECT c_mktsegment, p_brand, COUNT(*) AS n_cell
      |  FROM base GROUP BY 1, 2),
      |segs AS (SELECT c_mktsegment, COUNT(*) AS n_seg
      |         FROM base GROUP BY 1),
      |brands AS (SELECT p_brand, COUNT(*) AS n_brand
      |           FROM base GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_tot FROM base)
      |SELECT s.c_mktsegment, b.p_brand,
      |  COALESCE(cells.n_cell, 0) AS n_cell, s.n_seg, b.n_brand,
      |  (COALESCE(cells.n_cell, 0) * tot.n_tot * 1000000)
      |    // (s.n_seg * b.n_brand) AS lift_micro
      |FROM segs s CROSS JOIN brands b CROSS JOIN tot
      |LEFT JOIN cells ON cells.c_mktsegment = s.c_mktsegment
      |  AND cells.p_brand = b.p_brand""".stripMargin

  /** New-vs-returning revenue split per year — the acquisition-vs-
    * retention lens every revenue review opens with: an order is
    * "new" revenue iff it lands in its customer's FIRST active year
    * (first purchase ever, the cohort discipline), else "returning".
    * Exact cents; shares in micro floor once.
    *
    * 100 TB posture: first-year discovery is a window min over ONE
    * customer-keyed shuffle — per-customer cardinality scales with SF,
    * so it must never be broadcast (a broadcast-back of a per-customer
    * aggregate is a driver OOM at 100× customers); then one (year)
    * rollup. */
  private val newReturningQ = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("timestamp")).cast("long").as("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val wc = Window.partitionBy(col("o_custkey"))
    o.withColumn("first_yr", min(col("yr")).over(wc))
      .withColumn("is_new", (col("yr") === col("first_yr")).cast("long"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("is_new") * col("cents")).as("new_cents"),
        sum((lit(1L) - col("is_new")) * col("cents"))
          .as("returning_cents"))
      .withColumn("new_share_micro",
        // DECIMAL-widened numerator: a year's cents sum x 10^6 leaves
        // BIGINT beyond ~sf1 (the sf1 oracle sweep's catch); DECIMAL
        // div pairs exactly with the oracle's HUGEINT //
        expr("(CAST(new_cents AS DECIMAL(38,0)) * 1000000)" +
          " div (new_cents + returning_cents)"))
  }

  private val newReturningSql =
    """WITH o AS (
      |  SELECT o_custkey,
      |    date_part('year', o_orderdate) AS yr,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey AS fc, MIN(yr) AS first_yr
      |      FROM o GROUP BY 1)
      |SELECT yr, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN yr = first_yr THEN cents ELSE 0 END)
      |    AS BIGINT) AS new_cents,
      |  CAST(SUM(CASE WHEN yr = first_yr THEN 0 ELSE cents END)
      |    AS BIGINT) AS returning_cents,
      |  CAST((CAST(SUM(CASE WHEN yr = first_yr THEN cents
      |      ELSE 0 END) AS HUGEINT) * 1000000)
      |    // (CAST(SUM(cents) AS BIGINT)) AS BIGINT) AS new_share_micro
      |FROM o JOIN f ON o.o_custkey = f.fc
      |GROUP BY 1""".stripMargin

  /** ABC inventory classification — the completion of the Pareto cut
    * (q_agg_pareto_cut extracts the A set; this classifies EVERY
    * part): parts ranked by revenue (value-domain cumulative,
    * partkey tiebreak), class A while cumulative share ≤ 80%, B to
    * 95%, C after, reported as the 3-row class summary (counts,
    * revenue, exact micro shares) a supply-chain review reads.
    *
    * 100 TB posture: fact → one row per part; the cumulative then
    * runs DISTRIBUTED over the part domain (GlobalOrder: range
    * partition on (cents desc, partkey), per-partition running sums,
    * broadcast prefix offsets — the two-pass bucketed cumulative the
    * r6 verdict asked for); the summary is a 3-key rollup. */
  private val abcQ = (s: SparkSession, dir: String) => {
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("cents"))
    // grand total comes from the offset pass's driver fold — the old
    // form re-aggregated `rev` a second time and broadcast-joined the
    // 1-row result (r7 verdict #5: GlobalOrder-swap constants)
    val (cum, sums) = GlobalOrder.runningTotalsWithSums(rev,
      Seq(col("cents").desc, col("l_partkey").asc),
      Seq("cum" -> col("cents")))
    val tc = sums(0)
    cum
      .withColumn("cls",
        when(expr(s"cum * 100 <= 80 * ${tc}L"), lit("A"))
          .when(expr(s"cum * 100 <= 95 * ${tc}L"), lit("B"))
          .otherwise(lit("C")))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("revenue"))
      .withColumn("tc", lit(tc))
      // DECIMAL-widened: total-revenue cents x 10^6 overflows BIGINT
      // at sf1 (caught by the sf1 oracle sweep, both engines threw)
      .withColumn("share_micro",
        expr("(CAST(revenue AS DECIMAL(38,0)) * 1000000) div tc"))
      .select(col("cls"), col("n_parts"), col("revenue"),
        col("share_micro"))
  }

  private val abcSql =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc FROM rev),
      |cum AS (
      |  SELECT cents,
      |    CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum
      |  FROM rev),
      |cl AS (
      |  SELECT cents,
      |    CASE WHEN cum * 100 <= 80 * tc THEN 'A'
      |         WHEN cum * 100 <= 95 * tc THEN 'B'
      |         ELSE 'C' END AS cls, tc
      |  FROM cum, tot)
      |SELECT cls, COUNT(*) AS n_parts,
      |  CAST(SUM(cents) AS BIGINT) AS revenue,
      |  CAST((CAST(SUM(cents) AS HUGEINT) * 1000000) // MAX(tc)
      |    AS BIGINT) AS share_micro
      |FROM cl GROUP BY 1""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_agg_abc" -> Q(abcQ, Some(abcSql),
      "ABC classification: A<=80%, B<=95% cumulative revenue, exact micro shares"),
    "q_agg_new_returning" -> Q(newReturningQ, Some(newReturningSql),
      "new-vs-returning revenue per year: first-active-year cohort split"),
    "q_agg_affinity" -> Q(affinityQ, Some(affinitySql),
      "segment x brand affinity lift with zero-cell completion, exact micro"),
    "q_agg_mix_shift" -> Q(mixShiftQ, Some(mixShiftSql),
      "price/volume mix-shift decomposition 1999->2000, exact cents + residual"),
    "q_agg_boxplot" -> Q(boxplotQ, Some(boxplotSql),
      "boxplot five-number summary + Tukey fences in exact half-cents"),
    "q_agg_revenue_gini" -> Q(revenueGiniQ, Some(revenueGiniSql),
      "revenue-concentration Gini per segment: exact rank form, basis points"),
    "q_agg_trimmed_mean" -> Q(trimmedQ, Some(trimmedSql),
      "10%-trimmed mean: value-domain rank-overlap trim, exact tie splitting"),
    "q_agg_winsorized" -> Q(winsorQ, Some(winsorSql),
      "winsorized mean: exact value-domain P5/P95 clip, no interpolation"),
    "q_agg_simpson" -> Q(simpsonQ, Some(simpsonSql),
      "Simpson diversity per nation: exact rational pair-collision index"),
    "q_agg_cohort_ltv" -> Q(ltvQ, Some(ltvSql),
      "cohort LTV curve: cumulative purchase centi per signup-week cohort by age"),
    "q_agg_unpivot" -> Q(unpivotQ, Some(unpivotSql),
      "melt the wide per-segment metrics to (segment, metric, value) via stack()"),
    "q_agg_log_histogram" -> Q(logHistQ, Some(logHistSql),
      "powers-of-two histogram via integer bit length, cumulative shares"),
    "q_agg_hhi" -> Q(hhiQ, Some(hhiSql),
      "Herfindahl-Hirschman concentration per segment: basis-point shares, exact cents"),
    "q_agg_dau_mau" -> Q(dauMauQ, Some(dauMauSql),
      "DAU/MAU stickiness per day: two-grain distinct rollups, broadcast month join"),
    "q_agg_benford" -> Q(benfordQ, Some(benfordSql),
      "Benford first-digit audit over money cents: integer-exact deviations"),
    "q_agg_skyline" -> Q(skylineQ, Some(skylineSql),
      "Pareto-frontier skyline: staircase window vs the quadratic NOT-EXISTS oracle"),
    "q_agg_listagg" -> Q(listaggQ, Some(listaggSql),
      "deterministic ordered LISTAGG via post-aggregate struct sort"),
    "q_agg_pareto_cut" -> Q(paretoCutQ, Some(paretoCutSql),
      "minimal 80%-revenue supplier set per group: integer-exact cumulative cut"),
    "q_agg_mad_outliers" -> Q(madOutliersQ, Some(madOutliersSql),
      "median-absolute-deviation robust outlier counts, integer-exact interpolated medians"),
    "q_agg_weighted_median" -> Q(weightedMedianQ, Some(weightedMedianSql),
      "extendedprice-weighted median quantity per group, integer-exact cumulative scan"),
    "q_agg_skew_kurt" -> Q(skewKurtQ, Some(skewKurtSql),
      "per-group skewness/excess kurtosis from exact integer power sums"),
    "q_agg_ols_fit" -> Q(olsFitQ, Some(olsFitSql),
      "per-group OLS slope/intercept from integer moments, one pass"),
    "q_ts_autocorr" -> Q(autocorrQ, Some(autocorrSql),
      "lag-1 autocorrelation per series: window pairs + exact pair moments"),
    "q_agg_quantile_bins" -> Q(quantileBinsQ, Some(quantileBinsSql),
      "equi-depth feature bucketization: sketch quartile boundaries, map-side binning"),
    "q_agg_quantile_gate" -> Q(quantileGateQ, Some(quantileGateSql),
      "sketch-band outlier gate: [P05,P95] from quantile_sketch, map-only classification"),
    "q_agg_quantile_sketch" -> Q(quantileSketchQ, Some(quantileSketchSql),
      "native mergeable KLL-style quantile sketch, exact below cap, micro-int ranks"),
    "q_agg_freq_items" -> Q(freqItemsQ, Some(freqItemsSql),
      "native Space-Saving heavy-hitters aggregate, exact-regime oracle"),
    "q_agg_gini" -> Q(giniQ, Some(giniSql),
      "per-user Gini diversity of the event-type mix: exact integer ratio, no logs"),
    "q_agg_corr_matrix" -> Q(corrMatrixQ, Some(corrMatrixSql),
      "pairwise Pearson matrix from integer-exact raw moments, one pass"),
    "q_agg_decay_score" -> Q(decayScoreQ, Some(decayScoreSql),
      "half-life-per-week recency-weighted engagement score, integer-exact"),
    "q_agg_kmv_intersect" -> Q(kmvIntersectQ, Some(kmvIntersectSql),
      "KMV sketch set algebra: audience-overlap estimate beside the exact answer"),
    "q_agg_copurchase" -> Q(copurchaseQ, Some(copurchaseSql),
      "market-basket pair support: order-keyed pairing, basket-bounded fan-out"),
    "q_agg_grouping_sets" -> Q(groupingSetsQ, Some(groupingSetsSql),
      "GROUPING SETS + grouping() markers (portable SQL text)"),
    "q_agg_group_multi" -> Q(groupMulti, Some(groupMultiSql),
      "multi-agg GROUP BY incl. timestamp min/max + exact distinct"),
    "q_agg_distinct" -> Q(distinctRows, Some(distinctRowsSql),
      "SELECT DISTINCT (dedup by all columns)"),
    "q_agg_count_distinct" -> Q(countDistinctGlobal, Some(countDistinctGlobalSql),
      "global exact count-distinct"),
    "q_agg_approx_cd" -> Q(approxCd, Some(approxCdSql),
      "HLL++ count-distinct sketch, oracle-checked via exact-count envelope"),
    "q_agg_hll_union" -> Q(hllUnionQ, Some(hllUnionSql),
      "mergeable HLL sketches: per-group build + union rollup, envelope oracle"),
    "q_agg_approx_pctl" -> Q(approxPctlQ, Some(approxPctlSql),
      "GK approx percentile, oracle-checked via exact-band envelope"),
    "q_agg_rollup" -> Q(rollupQ, Some(rollupSql), "GROUP BY ROLLUP"),
    "q_agg_pivot" -> Q(pivotQ, Some(pivotSql),
      "PIVOT status values to columns over a two-key agg"),
    "q_agg_cube" -> Q(cubeQ, Some(cubeSql), "GROUP BY CUBE"),
    "q_agg_having" -> Q(havingQ, Some(havingSql),
      "post-aggregation filter (HAVING)"),
    "q_agg_stats" -> Q(statsQ, Some(statsSql),
      "runstats analog: exact count/mean/variance per column"),
    "q_agg_percentile" -> Q(percentileQ, Some(percentileSql),
      "exact interpolated percentiles (p50/p90) per group"),
    "q_agg_covar" -> Q(covarQ, Some(covarSql),
      "covariance/correlation from exact decimal sums"))
}
