package graft

import org.apache.spark.sql.functions._

class WindowsScalarsSpec extends SparkSpec {

  test("rank window: rn dense within each segment, rn<=5, rk>=rn consistency") {
    val rows = run("q_win_rank").collect()
    assert(rows.nonEmpty)
    val bySeg = rows.groupBy(_.getString(1))
    bySeg.foreach { case (_, rs) =>
      val rns = rs.map(_.getInt(3)).sorted
      assert(rns.sameElements(1 to rns.length))
    }
    rows.foreach(r => assert(r.getInt(4) <= r.getInt(3))) // rk <= rn
  }

  test("lag/lead: every event present; prev/next null only at partition edges") {
    val df = run("q_win_lag_lead")
    assert(df.count() == Tables.events(spark, sf).count())
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    // exactly one null prev (first event) and one null lead per user
    assert(df.filter(col("prev_value").isNull).count() == users)
    assert(df.filter(col("next_value").isNull).count() == users)
  }

  test("running sum is monotone per customer (positive totals)") {
    val rows = run("q_win_running_sum")
      .orderBy("o_custkey", "o_orderkey").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getDouble(2)).forall(_ > 0))
    }
  }

  test("topk per group: <=3 rows per brand, each is a brand maximum prefix") {
    val rows = run("q_win_topk_per_group").collect()
    val byBrand = rows.groupBy(_.getString(1))
    byBrand.foreach { case (b, rs) => assert(rs.length <= 3, b) }
  }

  test("funnel: stage joins carry no broadcast hint (user-cardinality build sides)") {
    val df = run("q_win_funnel")
    // the logical plan must contain no hint nodes: the stage build sides
    // are per-user aggregates, so a forced broadcast would OOM at 100x
    // users — broadcast-vs-shuffle is the planner's call from size stats
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.contains("ResolvedHint") && !logical.contains("UnresolvedHint"),
      s"funnel carries a join-strategy hint:\n$logical")
    val r = df.collect()
    assert(r.length == 1)
    val (nv, nc, np) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(nv >= nc && nc >= np && np > 0, s"funnel not monotone: $nv/$nc/$np")
  }

  test("scalar strings: derived cols consistent with inputs") {
    val rows = run("q_scalar_strings").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("up_name")) ==
        r.getString(r.fieldIndex("up_name")).toUpperCase)
      assert(r.getString(r.fieldIndex("key_padded")).length == 8)
    }
  }

  test("scalar json: typed and path extraction agree") {
    val rows = run("q_scalar_json").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2))
      assert(r.getInt(2) > 50)
    }
  }

  test("no UDFs: scalar plans stay in WholeStageCodegen") {
    for (q <- Seq("q_scalar_strings", "q_scalar_math", "q_scalar_dates")) {
      val plan = run(q).queryExecution.executedPlan.toString
      // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan
      assert(plan.contains("*(1)"), s"$q plan:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), q)
    }
  }

  test("scalar surface without a DuckDB twin: soundex, months_between, map_values") {
    import org.apache.spark.sql.functions._
    // soundex: classic fixed points (no DuckDB equivalent to oracle)
    val sx = spark.range(1).select(
      soundex(lit("Robert")).as("r"), soundex(lit("Rupert")).as("r2"),
      soundex(lit("Ashcraft")).as("a")).head()
    assert(sx.getString(0) == "R163" && sx.getString(1) == "R163")
    assert(sx.getString(2) == "A261")
    // months_between: whole-month and fractional behavior
    val mb = spark.range(1).select(
      months_between(lit("1996-03-01").cast("timestamp"),
        lit("1996-01-01").cast("timestamp")).as("whole"),
      months_between(lit("1996-01-16").cast("timestamp"),
        lit("1996-01-01").cast("timestamp")).as("frac")).head()
    assert(mb.getDouble(0) == 2.0)
    assert(mb.getDouble(1) > 0.0 && mb.getDouble(1) < 1.0)
    // map_values over parsed events.props
    val mv = Tables.events(spark, sf)
      .select(map_values(from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))).as("vs"))
      .limit(5).collect()
    assert(mv.forall(_.getSeq[Int](0).length == 1))
  }

  test("map surface: lookup and concat behave, keys render sorted") {
    val rows = run("q_scalar_maps").collect()
    assert(rows.length == Tables.nation(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("x_v")) == 99L)
      assert(r.getLong(r.fieldIndex("m_size")) == 3L)
      assert(r.getString(r.fieldIndex("m_keys")) == "nat,reg,x")
    }
  }

  test("sessionize: sessions partition each user's events, ids contiguous") {
    val rows = run("q_win_sessionize").collect()
    val total = rows.map(r => r.getLong(r.fieldIndex("n_events"))).sum
    assert(total == Tables.events(spark, sf).count())
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      val ids = rs.map(_.getLong(rs.head.fieldIndex("session_id"))).sorted
      assert(ids.head == 0L && ids.toSet == (0L to ids.last).toSet,
        s"user $user: non-contiguous sessions ${ids.mkString(",")}")
    }
    rows.foreach { r =>
      assert(!r.getTimestamp(r.fieldIndex("sess_start"))
        .after(r.getTimestamp(r.fieldIndex("sess_end"))))
    }
  }
}
