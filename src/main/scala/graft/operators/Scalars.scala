package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** SURVEY.md §2.8 — scalar function surface.
  *
  * The reference's scalar layer is thin (regex match, predicate
  * arithmetic, date-vs-literal comparison — SURVEY §2.8); the rest is
  * PARITY/NS via `org.apache.spark.sql.functions._`, all codegen'd
  * (no UDFs anywhere in this module — every expression stays inside
  * WholeStageCodegen, which is the 100 TB requirement: scalar work is
  * pure map-side compute and must never break the codegen span).
  *
  * Float-sensitive functions (exp/log/pow) are surfaced through
  * `round(x, 6)` on BOTH engines: libm last-bit differences between
  * JVM and C are real, and the oracle is a hash compare.
  */
object Scalars extends QueryModule {

  // String functions over part names/brands.
  private val stringsQ = (s: SparkSession, dir: String) =>
    Tables.part(s, dir)
      .filter(col("p_partkey") % 10 === 0)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_name"), 1, 4).as("name4"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        levenshtein(col("p_name"), col("p_type")).as("lev_dist"),
        reverse(col("p_type")).as("rev_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"))

  private val stringsSql =
    """SELECT p_partkey,
      |  upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
      |  substring(p_name, 1, 4) AS name4, length(p_name) AS name_len,
      |  p_brand || ':' || p_type AS brand_type,
      |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  levenshtein(p_name, p_type) AS lev_dist,
      |  reverse(p_type) AS rev_type,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      |  trim('  ' || p_brand || '  ') AS trimmed
      |FROM part WHERE p_partkey % 10 = 0""".stripMargin

  // Date/time functions over order dates.
  private val datesQ = (s: SparkSession, dir: String) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 25 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate"))
          .as("days_to_2002"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        to_date(col("o_orderdate")).as("odate"),
        date_add(col("o_orderdate"), 30).as("due_30d"))

  private val datesSql =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dom,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(date_part('epoch', o_orderdate) AS BIGINT) AS epoch_s,
      |  date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
      |  o_orderdate + INTERVAL 30 DAY AS due_date,
      |  CAST(o_orderdate AS DATE) AS odate,
      |  CAST(o_orderdate AS DATE) + 30 AS due_30d
      |FROM orders WHERE o_orderkey % 25 = 0""".stripMargin

  // Math functions; transcendental ones rounded on both engines.
  private val mathQ = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 100 === 0 && col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        abs(col("l_extendedprice") * -1).as("abs_price"),
        round(col("l_extendedprice"), -2).as("round_100"),
        floor(col("l_discount") * 100).as("disc_pct_floor"),
        ceil(col("l_tax") * 100).as("tax_pct_ceil"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(pow(col("l_quantity"), 2), 4).as("qty_pow"),
        pmod(col("l_orderkey"), lit(7)).as("okey_mod7"))

  private val mathSql =
    """SELECT l_orderkey,
      |  abs(l_extendedprice * -1) AS abs_price,
      |  round(l_extendedprice, -2) AS round_100,
      |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct_floor,
      |  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
      |  sqrt(l_quantity) AS sqrt_qty,
      |  l_quantity * l_quantity AS qty_sq,
      |  round(exp(l_discount), 6) AS exp_disc,
      |  round(ln(l_extendedprice), 6) AS ln_price,
      |  round(pow(l_quantity, 2), 4) AS qty_pow,
      |  l_orderkey % 7 AS okey_mod7
      |FROM lineitem WHERE l_orderkey % 100 = 0 AND l_linenumber = 1""".stripMargin

  // Array functions over embedding vectors (north-star §2.8 Array).
  // List-typed OUTPUT columns crash the driver's pandas comparator
  // (unhashable ndarray), so array results are emitted in a sortable
  // string encoding: elements scaled to exact integers
  // (floor(double*1000) — float→double widening and floor are
  // bit-identical across engines) and array_join'd. The array surface
  // (slice / transform / sort_array / min / max) is still exercised.
  private val arraysQ = (s: SparkSession, dir: String) =>
    Tables.embeddings(s, dir)
      .filter(col("vec_id") % 20 === 0)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("e1"),
        array_join(transform(slice(col("embedding"), 1, 4),
          x => floor(x.cast("double") * 1000).cast("long")), ",").as("head4"),
        array_min(col("embedding")).as("vmin"),
        array_max(col("embedding")).as("vmax"),
        array_contains(col("embedding"), element_at(col("embedding"), 1))
          .as("has_e1"),
        array_join(sort_array(transform(slice(col("embedding"), 1, 4),
          x => floor(x.cast("double") * 1000).cast("long"))), ",")
          .as("head4_sorted"))

  private val arraysSql =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  embedding[1] AS e1,
      |  array_to_string(list_transform(embedding[1:4],
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)), ',') AS head4,
      |  list_min(embedding) AS vmin,
      |  list_max(embedding) AS vmax,
      |  list_contains(embedding, embedding[1]) AS has_e1,
      |  array_to_string(list_sort(list_transform(embedding[1:4],
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))), ',') AS head4_sorted
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  // JSON extraction from events.props (north-star §2.8 Map/JSON).
  private val jsonQ = (s: SparkSession, dir: String) => {
    val kSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", IntegerType)))
    Tables.events(s, dir)
      // json_tuple is a generator: it must be a top-level select item,
      // so the cast happens in the following projection
      .select(col("event_id"), col("props"),
        json_tuple(col("props"), "k").as("k_jt_s"))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_str_path"),
        from_json(col("props"), kSchema).getField("k").as("k_typed"),
        col("k_jt_s").cast(IntegerType).as("k_jt"),
        array_join(sort_array(map_keys(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))),
          ",").as("keys"))
      .filter(col("k_typed") > 50)
  }

  private val jsonSql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_str_path,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_jt,
      |  array_to_string(list_sort(json_keys(props)), ',') AS keys
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50""".stripMargin

  /** Map-typed scalar surface (§2.8): construct, look up, concat,
    * enumerate keys — the one Spark complex-type family not otherwise
    * oracled (arrays/structs/JSON are). Keys emitted as a sorted joined
    * string: map iteration order is engine-specific, the sorted
    * rendering is not. */
  private val mapsQ = (s: SparkSession, dir: String) => {
    val m = map_from_arrays(
      array(lit("nat"), lit("reg")),
      array(col("n_nationkey"), col("n_regionkey")))
    val m2 = map_concat(m, org.apache.spark.sql.functions.map(lit("x"), lit(99L)))
    Tables.nation(s, dir)
      .select(col("n_name"),
        element_at(m, "nat").as("nat_v"),
        element_at(m2, "x").as("x_v"),
        size(m2).cast("long").as("m_size"),
        array_join(sort_array(map_keys(m2)), ",").as("m_keys"))
  }

  private val mapsSql =
    """WITH b AS (
      |  SELECT n_name,
      |    map(['nat', 'reg'], [n_nationkey, n_regionkey]) AS m
      |  FROM nation),
      |c AS (SELECT n_name, m, map_concat(m, map(['x'], [99])) AS m2 FROM b)
      |SELECT n_name,
      |  map_extract(m, 'nat')[1] AS nat_v,
      |  map_extract(m2, 'x')[1] AS x_v,
      |  CAST(cardinality(m2) AS BIGINT) AS m_size,
      |  array_to_string(list_sort(map_keys(m2)), ',') AS m_keys
      |FROM c""".stripMargin

  // Bitwise surface (§2.8 completeness): popcount, AND/OR/XOR, shifts,
  // NOT — the ops bitmap indexes, bloom probes and hash-partitioners
  // are made of. All integer-exact by construction; DuckDB's xor is a
  // FUNCTION (its `^` is power) and its bit_count returns TINYINT, so
  // the oracle spells both explicitly.
  private val bitwiseQ = (s: SparkSession, dir: String) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        expr("bit_count(o_orderkey)").as("pc"),
        expr("o_orderkey & 255").as("band"),
        expr("o_orderkey | 4096").as("bor"),
        expr("o_orderkey ^ 1365").as("bxor"),
        expr("shiftleft(o_orderkey, 3)").as("shl"),
        expr("shiftright(o_orderkey, 2)").as("shr"),
        expr("~o_orderkey").as("bnot"))

  private val bitwiseSql =
    """SELECT o_orderkey,
      |  CAST(bit_count(o_orderkey) AS INTEGER) AS pc,
      |  o_orderkey & 255 AS band,
      |  o_orderkey | 4096 AS bor,
      |  xor(o_orderkey, 1365) AS bxor,
      |  o_orderkey << 3 AS shl,
      |  o_orderkey >> 2 AS shr,
      |  ~o_orderkey AS bnot
      |FROM orders WHERE o_orderkey < 200""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_scalar_bitwise" -> Q(bitwiseQ, Some(bitwiseSql),
      "bitwise surface: popcount/AND/OR/XOR/shifts/NOT on order keys"),
    "q_scalar_maps" -> Q(mapsQ, Some(mapsSql),
      "map surface: construct/lookup/concat/keys (sorted rendering)"),
    "q_scalar_strings" -> Q(stringsQ, Some(stringsSql),
      "string surface: case/substr/concat/regex/levenshtein/pad"),
    "q_scalar_dates" -> Q(datesQ, Some(datesSql),
      "date surface: extract/trunc/epoch/diff/interval add"),
    "q_scalar_math" -> Q(mathQ, Some(mathSql),
      "math surface (transcendentals rounded both engines)"),
    "q_scalar_arrays" -> Q(arraysQ, Some(arraysSql),
      "array surface over embedding vectors"),
    "q_scalar_json" -> Q(jsonQ, Some(jsonSql),
      "JSON extraction from events.props (typed + path)"))
}
