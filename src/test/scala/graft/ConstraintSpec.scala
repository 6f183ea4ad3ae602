package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** CHECK constraints (GraftChecks): write-path data-quality gates
  * stored as `check.<name>` table properties and enforced per-row
  * inside every DSv2 writer task. Claims proven here:
  *  - a violating append FAILS naming the constraint and commits
  *    NOTHING (staged-rename atomicity);
  *  - SQL-standard semantics: NULL predicate passes, only FALSE
  *    rejects;
  *  - ALTER TABLE SET TBLPROPERTIES validates existing rows before
  *    accepting a new constraint, and UNSET lifts enforcement;
  *  - the row-level rewrite path (UPDATE) enforces the same gates;
  *  - the direct (non-catalog) path enforces `check.*` write options.
  */
class ConstraintSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-constraints").toString
    spark.conf.set("spark.sql.catalog.graftck", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftck.root", r)
    r
  }

  private def failureOf(body: => Unit): String =
    try { body; "" }
    catch { case e: Throwable =>
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    }

  test("violating append fails naming the constraint and commits nothing") {
    root
    spark.sql(
      """CREATE TABLE graftck.main.gated (id BIGINT, qty DOUBLE)
        |TBLPROPERTIES ('check.qty_range' = 'qty BETWEEN 0 AND 25')"""
        .stripMargin)
    val msg = failureOf(spark.sql(
      "INSERT INTO graftck.main.gated VALUES (1, 10.0), (2, 99.0)"))
    assert(msg.contains("qty_range"), s"wrong failure: $msg")
    assert(spark.table("graftck.main.gated").count() === 0,
      "failed write must leave no partial data")
    spark.sql("INSERT INTO graftck.main.gated VALUES (1, 10.0), (2, 25.0)")
    assert(spark.table("graftck.main.gated").count() === 2)
  }

  test("NULL predicate passes (SQL-standard CHECK), FALSE rejects") {
    root
    spark.sql(
      """CREATE TABLE graftck.main.nullable (id BIGINT, qty DOUBLE)
        |TBLPROPERTIES ('check.pos' = 'qty > 0')""".stripMargin)
    // NULL qty → predicate UNKNOWN → row passes
    spark.sql("INSERT INTO graftck.main.nullable VALUES (1, CAST(NULL AS DOUBLE))")
    assert(spark.table("graftck.main.nullable").count() === 1)
    assert(failureOf(spark.sql(
      "INSERT INTO graftck.main.nullable VALUES (2, -1.0)")).contains("pos"))
  }

  test("CREATE compiles check.* and rejects unknown properties, like ALTER") {
    root
    // malformed predicate fails the CREATE itself, not the first write
    val bad = failureOf(spark.sql(
      """CREATE TABLE graftck.main.badck (id BIGINT, qty DOUBLE)
        |TBLPROPERTIES ('check.broken' = 'no_such_col > 0')""".stripMargin))
    assert(bad.nonEmpty, "malformed CHECK must fail at CREATE")
    assert(!new java.io.File(s"$root/main/badck").isDirectory,
      "failed CREATE must leave no table dir")
    // unknown user property throws at CREATE exactly as alterTable SET
    val unk = failureOf(spark.sql(
      """CREATE TABLE graftck.main.badprop (id BIGINT)
        |TBLPROPERTIES ('chekc.typo' = 'id > 0')""".stripMargin))
    assert(unk.contains("unsupported table property"),
      s"typo'd property must not silently vanish: $unk")
  }

  test("ALTER SET validates existing rows; UNSET lifts enforcement") {
    root
    spark.sql("CREATE TABLE graftck.main.evolve (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftck.main.evolve VALUES (1, 5), (2, 50)")
    // existing row 50 violates → refused
    val msg = failureOf(spark.sql(
      """ALTER TABLE graftck.main.evolve
        |SET TBLPROPERTIES ('check.small' = 'v < 10')""".stripMargin))
    assert(msg.contains("existing rows violate"), s"wrong failure: $msg")
    // a constraint the data satisfies is accepted and then enforces
    spark.sql(
      """ALTER TABLE graftck.main.evolve
        |SET TBLPROPERTIES ('check.small' = 'v < 100')""".stripMargin)
    assert(failureOf(spark.sql(
      "INSERT INTO graftck.main.evolve VALUES (3, 500)")).contains("small"))
    spark.sql(
      "ALTER TABLE graftck.main.evolve UNSET TBLPROPERTIES ('check.small')")
    spark.sql("INSERT INTO graftck.main.evolve VALUES (3, 500)")
    assert(spark.table("graftck.main.evolve").count() === 3)
  }

  test("UPDATE cannot rewrite rows into violation") {
    root
    spark.sql(
      """CREATE TABLE graftck.main.upd (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('check.cap' = 'v <= 100')""".stripMargin)
    spark.sql("INSERT INTO graftck.main.upd VALUES (1, 5), (2, 50)")
    val msg = failureOf(spark.sql(
      "UPDATE graftck.main.upd SET v = v * 10 WHERE id = 2"))
    assert(msg.contains("cap"), s"wrong failure: $msg")
    // table unchanged by the failed rewrite
    assert(spark.table("graftck.main.upd")
      .agg(sum(col("v"))).head.getLong(0) === 55)
    spark.sql("UPDATE graftck.main.upd SET v = v + 50 WHERE id = 2")
    assert(spark.table("graftck.main.upd")
      .agg(max(col("v"))).head.getLong(0) === 100)
  }

  test("streaming writes enforce checks; failed epoch commits nothing") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("graft-ck-stream-src").toString
    val dst = Files.createTempDirectory("graft-ck-stream").toString + "/t"
    Tables.nation(spark, sf).write.mode("overwrite").parquet(src)
    def run(pred: String): String = failureOf {
      val q = spark.readStream
        .schema(Tables.nation(spark, sf).schema).parquet(src)
        .writeStream.format("graft-objects")
        .option("path", dst)
        .option("check.gate", pred)
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ck-stream-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // violating epoch fails naming the constraint, no objects land
    assert(run("n_nationkey < 10").contains("gate"))
    assert(graft.sources.GraftObjectTable.listObjects(dst).isEmpty,
      "aborted epoch must leave no committed objects")
    // satisfied constraint streams through
    assert(run("n_nationkey < 1000") === "")
    assert(spark.read.format("graft-objects").load(dst).count() ===
      Tables.nation(spark, sf).count())
  }

  test("SHOW TBLPROPERTIES surfaces stored constraints") {
    root
    spark.sql(
      """CREATE TABLE graftck.main.shown (id BIGINT)
        |TBLPROPERTIES ('check.id_pos' = 'id > 0')""".stripMargin)
    val props = spark.sql("SHOW TBLPROPERTIES graftck.main.shown")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("check.id_pos").contains("id > 0"))
  }

  test("direct-path writes enforce check.* options; malformed SQL refused") {
    val dir = Files.createTempDirectory("graft-ck-direct").toString + "/t"
    val df = Tables.nation(spark, sf)
    val msg = failureOf(
      df.write.format("graft-objects")
        .option("check.key_range", "n_nationkey < 10")
        .mode("overwrite").save(dir))
    assert(msg.contains("key_range"), s"wrong failure: $msg")
    assert(failureOf(
      df.write.format("graft-objects")
        .option("check.bad", "no_such_column > 0")
        .mode("overwrite").save(dir)).nonEmpty)
    df.write.format("graft-objects")
      .option("check.key_range", "n_nationkey < 1000")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graft-objects").load(dir).count() === df.count())
  }
}
