package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/**
 * Scalar-function surface (SURVEY.md §2.12 — the reference has no scalar
 * library; payloads are opaque): string/date/math/array/json functions as
 * one oracle-checked showcase per family, all codegen'd built-ins.
 */
object ScalarQueries {

  private val strings = QueryDef(
    (s, dir) => Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        lower(col("c_mktsegment")).as("lower_seg"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 4).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
      |  UPPER(c_name) AS upper_name, LOWER(c_mktsegment) AS lower_seg,
      |  CAST(LENGTH(c_name) AS INT) AS name_len,
      |  SUBSTR(c_name, 1, 4) AS name_prefix,
      |  concat_ws('|', c_mktsegment, c_name) AS seg_name,
      |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
      |  TRIM('  pad  ') AS trimmed
      |FROM customer ORDER BY c_custkey""".stripMargin))

  private val datesMath = QueryDef(
    (s, dir) => Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        abs(col("o_totalprice") * -1).as("abs_price"),
        ceil(col("o_totalprice")).as("ceil_price"),
        floor(col("o_totalprice")).as("floor_price"),
        (col("o_orderkey") % 7).as("mod7"),
        greatest(col("o_totalprice"), lit(1000.0)).as("floor1000"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  ABS(o_totalprice * -1) AS abs_price,
      |  CAST(CEIL(o_totalprice) AS BIGINT) AS ceil_price,
      |  CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_price,
      |  o_orderkey % 7 AS mod7,
      |  GREATEST(o_totalprice, 1000.0) AS floor1000
      |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val arraysJson = QueryDef(
    (s, dir) => Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(col("toks"), -1).as("last_tok"),
        array_contains(col("toks"), "spark").as("has_spark"),
        // stringified (array_join) so the oracle comparator hashes a scalar,
        // not an unhashable list cell
        array_join(expr("sort_array(slice(toks, 1, 3))"), ",").as("first3_sorted"),
        to_json(struct(col("doc_id"), col("lang"))).as("as_json"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS INT) AS n,
      |  toks[1] AS first_tok,
      |  toks[-1] AS last_tok,
      |  list_contains(toks, 'spark') AS has_spark,
      |  array_to_string(list_sort(toks[1:3]), ',') AS first3_sorted,
      |  '{"doc_id":' || doc_id || ',"lang":"' || lang || '"}' AS as_json
      |FROM t ORDER BY doc_id""".stripMargin))

  /** Map functions: str_to_map construction, size/lookup/keys/values.
    * Map-typed outputs are projected to scalars (joined keys/values) so
    * the oracle comparator hashes strings; the DuckDB side reproduces the
    * VALUES with plain string ops — value equivalence is the gate, the
    * Spark side is what exercises the map operators. */
  private val maps = QueryDef(
    (s, dir) => Tables.customer(s, dir)
      .withColumn("m", expr(
        "str_to_map(concat('seg:', c_mktsegment, ',nat:', c_nationkey), ',', ':')"))
      .select(
        col("c_custkey"),
        size(col("m")).as("m_size"),
        element_at(col("m"), "seg").as("seg"),
        array_join(map_keys(col("m")), ",").as("m_keys"),
        array_join(map_values(col("m")), ",").as("m_vals"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
      |  2 AS m_size,
      |  c_mktsegment AS seg,
      |  'seg,nat' AS m_keys,
      |  c_mktsegment || ',' || CAST(c_nationkey AS VARCHAR) AS m_vals
      |FROM customer ORDER BY c_custkey""".stripMargin))

  /** Regexp family: extract (group), extract_all, count, boolean match —
    * over the TPC-H name format 'Customer#000000001' (the driver's
    * customer table carries no phone column). */
  private val regex = QueryDef(
    (s, dir) => Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#([0-9]+)$", 1).as("cust_num"),
        array_join(regexp_extract_all(col("c_name"), lit("[A-Za-z]+|[0-9]+"), lit(0)), "/")
          .as("name_parts"),
        regexp_count(col("c_name"), lit("[0-9]")).as("digit_count"),
        col("c_name").rlike("0{3}").as("has_triple_zero"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
      |  regexp_extract(c_name, '#([0-9]+)$', 1) AS cust_num,
      |  array_to_string(regexp_extract_all(c_name, '[A-Za-z]+|[0-9]+'), '/') AS name_parts,
      |  CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS digit_count,
      |  regexp_matches(c_name, '0{3}') AS has_triple_zero
      |FROM customer ORDER BY c_custkey""".stripMargin))

  /** VARIANT semi-structured handling (Spark 4 `parse_json` /
    * `variant_get`) — the modern replacement for stringly JSON columns:
    * parse once to the shredded binary encoding, extract typed paths in
    * the scan projection (the plan's `PushedVariantExtractions` slot is
    * where V2 scans shred at the source at scale). The twin extracts
    * the same path with DuckDB's JSON operators — same values, so the
    * representation is proven interchangeable. */
  private lazy val scalarVariant = QueryDef(
    (s, dir) => Tables.events(s, dir)
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'int')"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type"),
    // json_extract_string (->> semantics) then a plain VARCHAR→number
    // cast: JSON-typed casts changed behavior across DuckDB releases
    // (the r9 driver-vs-local divergence), string casts did not.
    Some("""SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "scalar_variant" -> scalarVariant,
    "scalar_strings" -> strings,
    "scalar_dates_math" -> datesMath,
    "scalar_arrays_json" -> arraysJson,
    "scalar_maps" -> maps,
    "scalar_regex" -> regex)
}
