package graft

import org.apache.spark.sql.functions._

/** Round-5 sixteenth wave: n-gram novelty, class-balanced
  * downsampling, seasonal-naive forecast backtest. */
class Round5WaveSixteenSpec extends SparkSpec {

  test("novelty: first document is all-novel, totals account every gram") {
    val rows = run("q_text_ngram_novelty").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
      r.getLong(3))).toMap
    val firstDoc = byDoc.keys.min
    assert(byDoc(firstDoc)._3 == 1000000L,
      "the earliest document's grams are all corpus-first")
    byDoc.values.foreach { case (grams, novel, micro) =>
      assert(novel >= 0 && novel <= grams)
      assert(micro == 1000000L * novel / grams)
    }
    // every distinct gram has exactly one first occurrence
    val totalGrams = Tables.documents(spark, sf)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("sh", expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"))
      .select(explode(col("sh")).as("g")).distinct().count()
    assert(byDoc.values.map(_._2).sum == totalGrams)
  }

  test("class balance: every class capped at the min, picks hash-deterministic") {
    val rows = run("q_sample_class_balance").collect()
    val kept = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(kept.size >= 2)
    val caps = kept.values.map(_._1).toSet
    assert(caps.size == 1, "all classes keep the same count")
    // independent recomputation with java MD5
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cap = docs.groupBy(_._2).values.map(_.length).min
    assert(caps.head == cap.toLong)
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val picked = ds.map(_._1)
        .sortBy(id => (md5hex(id.toString), id)).take(cap)
      assert(kept(lang)._2 == picked.sum, s"selection checksum for $lang")
    }
  }

  test("snaive: matches an independent reference backtest") {
    val rows = run("q_ts_forecast_snaive").collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        hour(col("ts")).cast("long").as("hod"),
        floor(col("value") * 1000000L).cast("long").as("vm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cut = ev.map(_._2).max - 7L * 24 * 3600 * 1000000L
    val train = ev.filter(_._2 < cut)
    val test = ev.filter(_._2 >= cut)
    assert(train.nonEmpty && test.nonEmpty, "both split sides populated")
    val prof = train.groupBy(e => (e._1, e._3))
      .map { case (k, xs) => k -> xs.map(_._4).sum / xs.length }
    val ref = test.flatMap { case (t, _, h, vm) =>
      prof.get((t, h)).map(fc => (t, math.abs(vm - fc)))
    }.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.length.toLong, xs.map(_._2).sum / xs.length, xs.map(_._2).max)
    }
    assert(got == ref, "per-type (n_test, mae, max_err) match")
  }
}
