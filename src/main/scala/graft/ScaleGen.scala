package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-tier generator (round-6 verdict #4): synthesizes a 10×
  * fixture from sf0.1 by unioning key-shifted copies, so the
  * scale-posture family can record measured sf0.1→sf1 wall-time
  * ratios instead of arguing from plan shape alone.
  *
  * The copies are STATISTICALLY similar, not byte-identical:
  *  - every key column shifts by copy·10⁷ (FK relationships intact:
  *    orders.o_custkey shifts with customer.c_custkey, lineitem's
  *    three FKs with their parents);
  *  - nation/region stay fixed (domain tables — the 100 TB contract);
  *  - document text word-salts per copy (`w → w_k`), so copies are
  *    NOT near-dups of each other — the dedup family's pair counts
  *    scale like a real corpus, not like a pathological 10-clone one;
  *  - embeddings rotate by k dimensions per copy (norms and pairwise
  *    geometry within a copy preserved; across copies decorrelated);
  *  - timestamps keep their range: 10× the events in the same window
  *    (time is a domain axis, not an SF axis).
  *
  * Usage: ScaleGen <srcSfDir> <outDir> [factor=10]
  */
object ScaleGen {
  private val KeyShift = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    def copies(t: String)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => mk(rd(t), k)).reduce(_ unionByName _)
    def shift(k: Int, cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(k * KeyShift)))

    // domain tables: unchanged
    write("region", rd("region"))
    write("nation", rd("nation"))

    write("customer", copies("customer")((d, k) =>
      shift(k, "c_custkey")(d)
        .withColumn("c_name", concat(col("c_name"), lit(s"#$k")))))
    write("supplier", copies("supplier")((d, k) =>
      shift(k, "s_suppkey")(d)
        .withColumn("s_name", concat(col("s_name"), lit(s"#$k")))))
    write("part", copies("part")((d, k) => shift(k, "p_partkey")(d)))
    write("orders", copies("orders")((d, k) =>
      shift(k, "o_orderkey", "o_custkey")(d)))
    write("lineitem", copies("lineitem")((d, k) =>
      shift(k, "l_orderkey", "l_partkey", "l_suppkey")(d)))
    write("events", copies("events")((d, k) =>
      shift(k, "event_id", "user_id")(d)))
    write("documents", copies("documents")((d, k) =>
      shift(k, "doc_id")(
        if (k == 0) d
        else d.withColumn("text", expr(
          s"array_join(transform(split(text, ' '), w -> concat(w, '_$k')), ' ')"))
          .withColumn("n_chars", length(col("text")).cast("long")))))
    write("embeddings", copies("embeddings")((d, k) =>
      shift(k, "vec_id")(
        if (k == 0) d
        else d.withColumn("embedding", expr(
          // rotation is k MOD dim: factors above the embedding
          // dimension (the sf10 tier's factor 100 vs dim 64) must
          // wrap, not ask slice() for a negative length
          s"""concat(
             |  slice(embedding, ($k % size(embedding)) + 1,
             |        size(embedding) - ($k % size(embedding))),
             |  slice(embedding, 1, $k % size(embedding)))""".stripMargin)))))
    spark.stop()
  }
}
