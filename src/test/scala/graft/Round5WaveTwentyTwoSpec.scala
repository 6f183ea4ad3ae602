package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-second wave: per-dimension embedding profile and
  * boilerplate detection. */
class Round5WaveTwentyTwoSpec extends SparkSpec {

  test("dim profile: one row per dimension, moments match a recount") {
    val rows = run("q_vec_dim_profile").collect()
    assert(rows.length == 64, "one row per embedding dimension")
    val vecs = Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val n = vecs.length.toLong
    rows.foreach { r =>
      val pos = r.getInt(r.fieldIndex("pos"))
      val col = vecs.map(_(pos))
      val vm = col.map(x => math.floor(x.toDouble * 1000000L).toLong)
      val vc = col.map(x => math.floor(x.toDouble * 100L).toLong)
      assert(r.getLong(r.fieldIndex("n")) == n)
      assert(r.getLong(r.fieldIndex("s1_micro")) == vm.sum)
      assert(r.getLong(r.fieldIndex("s2_centi")) == vc.map(c => c * c).sum)
      assert(r.getLong(r.fieldIndex("min_micro")) == vm.min)
      assert(r.getLong(r.fieldIndex("max_micro")) == vm.max)
      assert(r.getLong(r.fieldIndex("sabs_micro")) == vm.map(math.abs).sum)
      val meanC = vm.sum / (n * 10000L)
      assert(r.getBoolean(r.fieldIndex("dead")) ==
        (vc.map(c => c * c).sum / n - meanC * meanC < 1))
      assert(r.getBoolean(r.fieldIndex("dominant")) ==
        (2L * vm.map(math.abs).sum > n * 1000000L))
    }
  }

  test("keyset pagination: page 3 equals the OFFSET 40 LIMIT 20 spelling") {
    val page = run("q_sort_pagination").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val offset = Tables.lineitem(spark, sf)
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(60).collect()
      .map(r => (r.getLong(r.fieldIndex("l_orderkey")),
        r.getInt(r.fieldIndex("l_linenumber")),
        r.getDouble(r.fieldIndex("l_extendedprice"))))
      .drop(40)
    assert(page.length == 20)
    assert(page.toSeq == offset.toSeq)
  }

  test("boilerplate: fractions match an independent df recount") {
    val rows = run("q_text_boilerplate").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def gramsOf(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val byDoc = docs.map { case (id, t) => id -> gramsOf(t) }.toMap
    val gdf = byDoc.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (g, xs) => g -> xs.length }
    rows.foreach { r =>
      val id = r.getLong(0)
      val gs = byDoc(id)
      val boiler = gs.count(g => gdf(g) >= 3).toLong
      assert(r.getLong(r.fieldIndex("n_grams")) == gs.size.toLong)
      assert(r.getLong(r.fieldIndex("n_boiler")) == boiler)
      assert(r.getLong(r.fieldIndex("boiler_micro")) ==
        1000000L * boiler / gs.size)
      assert(r.getBoolean(r.fieldIndex("is_template")) ==
        (5L * boiler > 4L * gs.size))
    }
    // the corpus exercises both boilerplate-heavy and light docs
    val micros = rows.map(_.getLong(rows.head.fieldIndex("boiler_micro")))
    assert(micros.max > micros.min)
  }
}
