package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import dsl._

/** Scalar function coverage: string / date / math / array HOF / json / map.
  * All expressions are built-ins (whole-stage codegen'd, no UDFs). Where a
  * function's result type differs between engines (year/size/floor widths),
  * the Spark side casts to long so values hash identically.
  *
  * libm functions (pow/ln) are not bit-identical across engines, so those
  * outputs are rounded; derived money values go through exact DECIMAL
  * instead (their true values have <= 6 decimal places).
  */
object Scalars {

  val queries: Map[String, Q] = Map(

    "q_scalar_string" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        substring(col("p_type"), 1, 5).as("t5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
        element_at(split(col("p_name"), " "), 1).as("w0"))
      .orderBy("p_partkey")),

    // String-similarity scalar: edit distance between the first and last
    // word of p_name plus a normalized similarity ratio. Integer distance
    // is engine-exact; the ratio is one int/int division (identical ieee).
    "q_scalar_levenshtein" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("wa"),
        element_at(split(col("p_name"), " "), -1).as("wb"))
      .select(col("p_partkey"), col("wa"), col("wb"),
        levenshtein(col("wa"), col("wb")).cast("long").as("lev"))
      .withColumn("sim",
        round(lit(1.0) - col("lev") / greatest(length(col("wa")), length(col("wb"))), 4))
      .orderBy("p_partkey")),

    // Bitwise scalars over integral keys — identical two's-complement
    // semantics in both engines.
    "q_scalar_bitwise" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"),
        expr("p_partkey & 255").as("band"),
        expr("p_partkey | 4096").as("bor"),
        expr("p_partkey ^ 21845").as("bxor"),
        expr("shiftleft(p_partkey, 3)").as("shl"),
        expr("shiftright(p_partkey, 2)").as("shr"),
        expr("CAST(bit_count(p_partkey) AS BIGINT)").as("popcnt"))
      .orderBy("p_partkey")),

    "q_scalar_date" -> ((s, d) => Tables(s, d, "orders")
      .select(col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("plus30"))
      .orderBy("o_orderkey")),

    "q_scalar_math" -> ((s, d) => Tables(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("decimal(22,6)").cast("double").as("charge"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_gap"),
        round(pow(col("l_quantity"), 2), 4).as("qty2"),
        round(sqrt(col("l_quantity")), 4).as("sqty"),
        floor(col("l_extendedprice")).as("price_floor"),
        round(log(col("l_extendedprice")), 4).as("ln_price"))
      .orderBy("l_orderkey", "l_linenumber")),

    "q_scalar_array" -> ((s, d) => Tables(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(100)),

    "q_scalar_array_hof" -> ((s, d) => Tables(s, d, "embeddings")
      .select(col("vec_id"),
        expr("CAST(size(filter(embedding, x -> x > 0)) AS LONG)").as("n_pos"),
        expr("ROUND(aggregate(embedding, 0.0D, (acc, x) -> acc + abs(CAST(x AS DOUBLE))), 4)").as("l1"))
      .orderBy("vec_id")),

    "q_scalar_json" -> ((s, d) => Tables(s, d, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"))
      .orderBy("event_type")),

    // Regex scalar coverage: extract-all (joined to one string so both
    // engines hash a scalar), occurrence counting via extract-all length
    // (identical RE2-safe patterns), boolean match cast to long, and
    // global replace. All plain codegen'd expressions over the scan.
    "q_scalar_regex" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"),
        expr("array_join(regexp_extract_all(p_name, '[a-z]{4,}', 0), ' ')").as("long_words"),
        expr("CAST(size(regexp_extract_all(p_name, '[aeiou]', 0)) AS LONG)").as("n_vowels"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_type").rlike("^STANDARD|^LARGE").cast("long").as("is_std_or_large"))
      .orderBy("p_partkey")),

    "q_scalar_map" -> ((s, d) => Tables(s, d, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("event_type"), col("cnt")))),
          x => concat(x.getField("event_type"), lit(":"), x.getField("cnt").cast("string"))),
        ",").as("type_counts"))
      .orderBy("user_id")),

    // Struct build / field access / positional equality — the nested-type
    // scalar surface. All map-side expression work; outputs stay primitive
    // so the hash compare is type-stable across engines.
    "q_scalar_struct" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"),
        struct(col("p_brand").as("brand"), col("p_size").as("size")).as("s"))
      .select(col("p_partkey"),
        col("s.brand").as("brand"),
        (col("s.size") + 1).cast("long").as("size1"),
        (col("s") === struct(lit("Brand#13").as("brand"), col("s.size").as("size")))
          .cast("long").as("is_b13"))
      .orderBy("p_partkey")),

    // Cast semantics matrix: TRY_CAST null-on-failure, digit-string
    // round-trips, and explicit floor-before-int (Spark truncates
    // double->int, DuckDB rounds — floor() first pins ONE semantics
    // instead of hiding the engine difference).
    "q_scalar_cast" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"),
        expr("try_cast(element_at(split(p_name, ' '), 1) AS BIGINT)").as("word_as_int"),
        expr("try_cast(cast(p_size AS string) AS BIGINT)").as("size_roundtrip"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        expr("try_cast(concat('20', cast(p_size AS string)) AS BIGINT)").as("prefixed"),
        expr("try_cast(p_brand AS date)").isNull.cast("long").as("bad_date"))
      .orderBy("p_partkey")),
  )

  val oracles: Map[String, String] = Map(
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lname,
        |  upper(p_brand) AS ubrand,
        |  substring(p_type, 1, 5) AS t5,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '#' || p_type AS brand_type,
        |  regexp_extract(p_type, '^(\w+)', 1) AS first_word,
        |  string_split(p_name, ' ')[1] AS w0
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_scalar_levenshtein" ->
      """SELECT p_partkey, wa, wb, lev,
        |  ROUND(1.0 - CAST(lev AS DOUBLE) / greatest(length(wa), length(wb)), 4) AS sim
        |FROM (
        |  SELECT p_partkey,
        |    string_split(p_name, ' ')[1] AS wa,
        |    string_split(p_name, ' ')[-1] AS wb,
        |    CAST(levenshtein(string_split(p_name, ' ')[1], string_split(p_name, ' ')[-1]) AS BIGINT) AS lev
        |  FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q_scalar_bitwise" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS band,
        |  p_partkey | 4096 AS bor,
        |  xor(p_partkey, 21845) AS bxor,
        |  p_partkey << 3 AS shl,
        |  p_partkey >> 2 AS shr,
        |  CAST(bit_count(p_partkey) AS BIGINT) AS popcnt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(22,6)) AS DOUBLE) AS charge,
        |  ROUND(abs(l_discount - 0.05), 4) AS disc_gap,
        |  ROUND(pow(l_quantity, 2), 4) AS qty2,
        |  ROUND(sqrt(l_quantity), 4) AS sqty,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  ROUND(ln(l_extendedprice), 4) AS ln_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scalar_array" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) GROUP BY 1 ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "q_scalar_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  ROUND(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS l1
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_scalar_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*), 4) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scalar_regex" ->
      """SELECT p_partkey,
        |  COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]{4,}'), ' '), '') AS long_words,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(regexp_matches(p_type, '^STANDARD|^LARGE') AS BIGINT) AS is_std_or_large
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_scalar_map" ->
      """SELECT user_id,
        |  string_agg(event_type || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY event_type) AS type_counts
        |FROM (
        |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_scalar_struct" ->
      """SELECT p_partkey,
        |  s.brand AS brand,
        |  CAST(s.size + 1 AS BIGINT) AS size1,
        |  CAST(s = {'brand': 'Brand#13', 'size': s.size} AS BIGINT) AS is_b13
        |FROM (SELECT p_partkey, {'brand': p_brand, 'size': p_size} AS s FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q_scalar_cast" ->
      """SELECT p_partkey,
        |  TRY_CAST(string_split(p_name, ' ')[1] AS BIGINT) AS word_as_int,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS BIGINT) AS size_roundtrip,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  TRY_CAST('20' || CAST(p_size AS VARCHAR) AS BIGINT) AS prefixed,
        |  CAST(TRY_CAST(p_brand AS DATE) IS NULL AS BIGINT) AS bad_date
        |FROM part ORDER BY p_partkey""".stripMargin,
  )
}
