package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar-function surface: string / math / date / array / map / JSON
  * (SURVEY §2.8), including the reference's own scalar transforms —
  * type normalization (F1, `/root/reference/src/from-ground-up.js:202`),
  * KML color byte-pair reversal (F2, `:685-694`), string interpolation
  * (F12, `:673-678`), JSON stringify/parse (F4/F5, `:188`, `:263`).
  *
  * Everything here is `org.apache.spark.sql.functions` built-ins — fully
  * codegen'd, no UDFs — so each query stays inside one WholeStageCodegen
  * span over the scan.
  */
object Functions extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  override def defs: Map[String, Q] = Map(
    // String kernel: substr/upper/lower/lpad/replace/length/concat/trim.
    "q_str_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") < 200)
        .select(
          col("c_custkey"),
          substring(col("c_name"), 1, 8).as("prefix"),
          upper(col("c_mktsegment")).as("seg_upper"),
          lower(col("c_name")).as("name_lower"),
          lpad(col("c_nationkey").cast("string"), 4, "0").as("nat_padded"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("name_short"),
          length(col("c_name")).as("name_len"),
          concat_ws("/", col("c_mktsegment"), col("c_nationkey").cast("string"))
            .as("seg_path"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy(col("c_custkey"))),

    // F1: the reference's presentation-type normalization
    // lower + ' '→'-' (all occurrences; see SURVEY §2.8 F1 on the
    // first-occurrence-only JS quirk, which we deliberately do not copy).
    "q_type_norm" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          lower(regexp_replace(col("p_name"), " ", "-")).as("type_slug"))
        .orderBy(col("p_partkey"))),

    // F2: KML color conversion rrggbbaa→aabbggrr as byte-pair reversal —
    // the *intended* semantics of the reference's char-wise reverse
    // (/root/reference/src/from-ground-up.js:685-694); applied to a
    // deterministic hex source (md5 prefix) since the corpus has no colors.
    "q_color_reverse" -> ((s, dir) => {
      val hex8 = substring(md5(col("p_name")), 1, 8)
      t(s, dir, "part")
        .select(col("p_partkey"), hex8.as("rgba"),
          concat(
            substring(hex8, 7, 2), substring(hex8, 5, 2),
            substring(hex8, 3, 2), substring(hex8, 1, 2)).as("abgr"))
        .orderBy(col("p_partkey"))
    }),

    // Math kernel: abs/round/floor/ceil/pow/sqrt/ln/mod.
    "q_math_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 50)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_disc"),
          round(col("l_extendedprice"), 1).as("rounded"),
          floor(col("l_quantity")).as("qty_floor"),
          ceil(col("l_quantity") / 2.0).as("half_ceil"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
          round(log(col("l_extendedprice") + 1.0), 6).as("price_ln"),
          (col("l_orderkey") % 7).as("key_mod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Date/time kernel: year/month/quarter/day/date_trunc/datediff/date_add.
    "q_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          quarter(col("o_orderdate")).as("q"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_1999"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"))
        .orderBy(col("o_orderkey"))),

    // P5: whitelist-with-default membership validation — the engine form of
    // returnIfIn (/root/reference/src/from-ground-up.js:934, :962-963).
    "q_case_when" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"),
            col("c_mktsegment")).otherwise(lit("other")).as("seg_class"),
          when(col("c_acctbal") < 0, lit("debt"))
            .when(col("c_acctbal") < 5000, lit("low"))
            .otherwise(lit("high")).as("bal_band"))
        .orderBy(col("c_custkey"))),

    // Array kernel incl. higher-order functions: split/size/sort/contains/
    // transform/filter/aggregate (F14). All codegen-friendly built-ins.
    "q_array_funcs" -> ((s, dir) => {
      val words = split(col("p_name"), " ")
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          size(words).as("n_words"),
          array_join(array_sort(words), "|").as("sorted_words"),
          array_contains(words, "red").as("has_red"),
          array_join(transform(words, w => upper(w)), "|").as("upper_words"),
          size(filter(words, w => length(w) > 4)).as("n_long_words"),
          aggregate(words, lit(0), (acc, w) => acc + length(w)).as("total_chars"))
        .orderBy(col("p_partkey"))
    }),

    // HOF tier 2: exists / forall / array_position / sequence / zip_with.
    "q_array_funcs2" -> ((s, dir) => {
      val words = split(col("p_name"), " ")
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          exists(words, w => w.startsWith("a")).as("any_a"),
          forall(words, w => length(w) >= 3).as("all_ge3"),
          array_position(words, "red").as("red_pos"),
          array_join(transform(sequence(lit(1), lit(3)), i => i * 2), ",")
            .as("evens"),
          array_join(zip_with(words, reverse(words),
            (a, b) => concat_ws("-", a, b)), "|").as("zipped"))
        .orderBy(col("p_partkey"))
    }),

    // date_trunc tiers (week/quarter/hour) + day-of-week over event
    // timestamps — the time-bucketing family windowed aggregation sits on.
    "q_date_trunc" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"),
          date_trunc("quarter", col("ts")).cast("date").as("qt"),
          date_trunc("hour", col("ts")).cast("long").as("hr_epoch"),
          dayofweek(col("ts")).as("dow"))
        .orderBy(col("event_id"))),

    // UDTF surface: explode → word frequency (SURVEY §2.9 table-generating).
    "q_explode" -> ((s, dir) =>
      t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("word"))),

    // JSON kernel (F4/F5): struct→JSON string and JSON-path extraction back.
    "q_json_funcs" -> ((s, dir) => {
      val j = to_json(struct(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nation")))
      t(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"), j.as("doc"),
          get_json_object(j, "$.name").as("name_from_json"))
        .orderBy(col("c_custkey"))
    }),

    // Map construction + JSON render: the warnify warnings-map shape
    // (MapType(String, Array[String]) → JSON, /root/reference/src/
    // from-ground-up.js:238-243, :262-264) exercised on corpus columns.
    "q_map_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          to_json(map(
            lit("status"), col("o_orderstatus"),
            lit("priority"), col("o_orderpriority"))).as("props_json"))
        .orderBy(col("o_orderkey"))),

    // Map-typed column ops (map_keys/map_values/map_concat/element access) —
    // the F13 property-bag surface on a real MapType column.
    "q_map_ops" -> ((s, dir) => {
      val m = map_concat(
        map(lit("status"), col("o_orderstatus")),
        map(lit("priority"), col("o_orderpriority")))
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          array_join(sort_array(map_keys(m)), ",").as("keys"),
          array_join(sort_array(map_values(m)), ",").as("vals"),
          element_at(m, "priority").as("prio"),
          size(m).as("n_entries"))
        .orderBy(col("o_orderkey"))
    }),

    // Null-handling kernel: coalesce / nullif / nvl2-style / nan checks.
    "q_null_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_or_open"),
          when(nullif(col("o_orderpriority"), lit("1-URGENT")).isNull,
            lit("hot")).otherwise(lit("cold")).as("urgency"),
          // NaN propagation through arithmetic (Spark's 0/0 yields NULL in
          // non-ANSI mode, so a division can never produce NaN — a literal
          // NaN source exercises isnan portably)
          isnan(lit(Double.NaN) + col("o_totalprice")).as("nan_plus_price"),
          isnan(col("o_totalprice")).as("price_is_nan"),
          (col("o_totalprice") === 0.0).as("zero_price"))
        .orderBy(col("o_orderkey"))),

    // The warnify aggregation itself (SURVEY §2.4 A1) under the oracle gate,
    // emulated on corpus columns: lineitem lines bucket into per-order
    // warning lists by return flag, serialized as the JSON warnings map.
    "q_warnify_shape" -> ((s, dir) => {
      val mr = sort_array(collect_list(
        when(col("l_returnflag") === "R", col("l_partkey").cast("string"))))
      val cn = sort_array(collect_list(
        when(col("l_returnflag") === "A", col("l_partkey").cast("string"))))
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .groupBy(col("l_orderkey"))
        .agg(mr.as("__mr"), cn.as("__cn"))
        .select(col("l_orderkey"),
          to_json(map(
            lit("managing-risk"), col("__mr"),
            lit("concern"), col("__cn"))).as("warnings"))
        .orderBy(col("l_orderkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT c_custkey,
        |  substr(c_name, 1, 8) AS prefix,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_padded,
        |  replace(c_name, 'Customer', 'Cust') AS name_short,
        |  length(c_name) AS name_len,
        |  concat_ws('/', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_path,
        |  trim('  x  ') AS trimmed
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin,

    "q_type_norm" ->
      """SELECT p_partkey, lower(replace(p_name, ' ', '-')) AS type_slug
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_color_reverse" ->
      """SELECT p_partkey,
        |  substr(md5(p_name), 1, 8) AS rgba,
        |  substr(md5(p_name), 7, 2) || substr(md5(p_name), 5, 2) ||
        |  substr(md5(p_name), 3, 2) || substr(md5(p_name), 1, 2) AS abgr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_disc,
        |  round(l_extendedprice, 1) AS rounded,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(ceil(l_quantity / 2.0) AS BIGINT) AS half_ceil,
        |  power(l_quantity, 2) AS qty_sq,
        |  round(sqrt(l_extendedprice), 6) AS price_sqrt,
        |  round(ln(l_extendedprice + 1.0), 6) AS price_ln,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_orderkey < 50
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
        |    AS days_to_1999,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin,

    "q_array_funcs2" ->
      """SELECT p_partkey,
        |  len(list_filter(string_split(p_name, ' '), w -> w LIKE 'a%')) > 0
        |    AS any_a,
        |  len(list_filter(string_split(p_name, ' '), w -> length(w) >= 3))
        |    = len(string_split(p_name, ' ')) AS all_ge3,
        |  CAST(list_position(string_split(p_name, ' '), 'red') AS BIGINT)
        |    AS red_pos,
        |  array_to_string(list_transform(generate_series(1, 3), i -> i * 2), ',')
        |    AS evens,
        |  array_to_string(list_transform(
        |    list_zip(string_split(p_name, ' '),
        |             list_reverse(string_split(p_name, ' '))),
        |    s -> s[1] || '-' || s[2]), '|') AS zipped
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_trunc" ->
      """SELECT event_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS wk,
        |  CAST(date_trunc('quarter', ts) AS DATE) AS qt,
        |  epoch_us(date_trunc('hour', ts)) // 1000000 AS hr_epoch,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_case_when" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
        |    THEN c_mktsegment ELSE 'other' END AS seg_class,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS bal_band
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
        |  list_contains(string_split(p_name, ' '), 'red') AS has_red,
        |  array_to_string(list_transform(string_split(p_name, ' '), w -> upper(w)), '|')
        |    AS upper_words,
        |  CAST(len(list_filter(string_split(p_name, ' '), w -> length(w) > 4)) AS INT)
        |    AS n_long_words,
        |  CAST(list_sum(list_transform(string_split(p_name, ' '), w -> length(w))) AS INT)
        |    AS total_chars
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_explode" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,

    "q_json_funcs" ->
      """SELECT c_custkey,
        |  to_json(struct_pack(id := c_custkey, name := c_name,
        |    nation := c_nationkey))::VARCHAR AS doc,
        |  c_name AS name_from_json
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,

    "q_map_funcs" ->
      """SELECT o_orderkey,
        |  to_json(struct_pack(status := o_orderstatus,
        |    priority := o_orderpriority))::VARCHAR AS props_json
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,

    "q_map_ops" ->
      """SELECT o_orderkey,
        |  array_to_string(list_sort(map_keys(
        |    map(['status','priority'], [o_orderstatus, o_orderpriority]))), ',') AS keys,
        |  array_to_string(list_sort(map_values(
        |    map(['status','priority'], [o_orderstatus, o_orderpriority]))), ',') AS vals,
        |  o_orderpriority AS prio,
        |  CAST(2 AS INT) AS n_entries
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL
        |    THEN 'hot' ELSE 'cold' END AS urgency,
        |  isnan('NaN'::DOUBLE + o_totalprice) AS nan_plus_price,
        |  isnan(o_totalprice) AS price_is_nan,
        |  o_totalprice = 0.0 AS zero_price
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin,

    "q_warnify_shape" ->
      """SELECT l_orderkey,
        |  to_json(struct_pack(
        |    "managing-risk" := COALESCE(list_sort(list(CAST(l_partkey AS VARCHAR))
        |      FILTER (l_returnflag = 'R')), []),
        |    concern := COALESCE(list_sort(list(CAST(l_partkey AS VARCHAR))
        |      FILTER (l_returnflag = 'A')), [])))::VARCHAR AS warnings
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin
  )
}
