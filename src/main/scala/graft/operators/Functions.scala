package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Group H (scalar functions: string/date/math/array/json) — SURVEY.md §2.H.
  *
  * All of these are per-row codegen'd expressions (whole-stage codegen,
  * no UDFs), so they pipeline inside the scan stage at scale. Math
  * outputs that cross libm implementations (ln, pow) are rounded to
  * absorb last-ulp differences on magnitudes where round-4/6 is safely
  * above one ulp (SURVEY.md §5.3, §7.3.4).
  */
object Functions extends QueryGroup {

  def queries = Map(
    "fn_string" -> { (spark, dir) =>
      Tables.table(spark, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_up"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          col("p_type").like("PROMO%").as("is_promo"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"))
        .orderBy("p_partkey")
    },

    "fn_datetime" -> { (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          Canon.moneySum(col("o_totalprice")).as("sum_price"),
          // cast to long: DuckDB date_part/date_diff return BIGINT
          min(year(col("o_orderdate"))).cast("long").as("yr"),
          min(month(col("o_orderdate"))).cast("long").as("mo"),
          min(dayofmonth(col("o_orderdate"))).cast("long").as("first_dom"),
          max(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
            .cast("long").as("max_days_since_epoch"))
        .orderBy("month")
    },

    "fn_math" -> { (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .select(col("o_orderkey"),
          abs(col("o_totalprice") - 250000).as("abs_dev"),
          // cast to double: DuckDB ceil/floor return DOUBLE, Spark LONG
          ceil(col("o_totalprice")).cast("double").as("ceil_p"),
          floor(col("o_totalprice")).cast("double").as("floor_p"),
          Canon.round2(col("o_totalprice")).as("round_p"),
          // sqrt is IEEE-correctly-rounded: identical bits cross-engine
          sqrt(col("o_totalprice")).as("sqrt_p"),
          // ln/pow differ in the last ulp across libm impls → round6 on
          // small magnitudes (ln≈12, pow≈125) where 1e-6 ≫ 1 ulp
          Canon.round6(log(col("o_totalprice"))).as("ln_p"),
          Canon.round6(pow(col("o_totalprice") / 100000d, 3)).as("pow_p"))
        .orderBy("o_orderkey")
    },

    "fn_array" -> { (spark, dir) =>
      Tables.table(spark, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          col("embedding").getItem(0).as("e1"),
          // scalar, not the raw slice: list-typed output columns crash
          // the driver's pandas row-sort (r01), so the slice is reduced
          // through a sequential-fold aggregate — same HOF surface
          Canon.round6(aggregate(slice(col("embedding"), 1, 4),
            lit(0.0), (acc, x) => acc + x.cast("double"))).as("head4_sum"),
          Canon.round6(sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x))).as("l2_norm"))
        .orderBy("vec_id")
    },

    "fn_map" -> { (spark, dir) =>
      // MapType construction + lookup + introspection (group H "map")
      Tables.table(spark, dir, "orders")
        .withColumn("m", map(
          lit("status"), col("o_orderstatus"),
          lit("priority"), col("o_orderpriority")))
        .select(col("o_orderkey"),
          element_at(col("m"), "status").as("status_v"),
          element_at(col("m"), "priority").as("priority_v"),
          size(col("m")).cast("long").as("n_entries"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"))
        .orderBy("o_orderkey")
    },

    "fn_null" -> { (spark, dir) =>
      // NULL-semantics surface (group H): coalesce fallback chains,
      // nullif sentinel erasure, null-skipping least/greatest (both
      // engines skip NULLs — the non-standard but universal behavior),
      // and IS NULL flags. Nulls are injected deterministically so the
      // fixture (which carries none) exercises every branch. Pure value
      // selection/copying — no arithmetic — so the doubles that come
      // out are bit-copies of the doubles that went in.
      val t = Tables.table(spark, dir, "lineitem")
        .withColumn("d",
          when(col("l_linenumber") % 3 === 0, lit(null)).otherwise(col("l_discount")))
        .withColumn("x",
          when(col("l_linenumber") % 4 === 0, lit(null)).otherwise(col("l_tax")))
      t.select((Scans.lineitemKey.map(col) ++ Seq(
          coalesce(col("d"), col("x"), lit(0.5)).as("c_fallback"),
          nullif(col("d"), lit(0.02)).as("d_no02"),
          least(col("d"), col("x")).as("lo"),
          greatest(col("d"), col("x")).as("hi"),
          (col("d").isNull && col("x").isNull).as("both_null"))): _*)
        .orderBy(Scans.lineitemKey.map(col): _*)
    },

    "fn_json" -> { (spark, dir) =>
      // from_json with an explicit schema (typed, codegen-friendly) —
      // get_json_object would re-parse per extraction; the struct parses
      // once and serves any number of field accesses
      Tables.events(spark, dir)
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("p.k").as("k"))
        // floor-div, not cast-of-ratio: DuckDB CAST rounds, Spark truncates
        .withColumn("k_decile", floor(col("k") / 10).cast("long"))
        .groupBy("k_decile")
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        // explicit null placement: Spark defaults NULLS FIRST, DuckDB LAST
        .orderBy(col("k_decile").asc_nulls_first)
    },

    "fn_bitwise" -> { (spark, dir) =>
      // bitwise surface: and/or/xor, shifts, popcount — per-row codegen
      // on the long id column (bit tricks are the bread and butter of
      // the hash/bucket layers above; this query pins the scalar API).
      Tables.table(spark, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(0xFFL)).as("low_byte"),
          col("o_orderkey").bitwiseOR(lit(0x100L)).as("or_bit8"),
          col("o_orderkey").bitwiseXOR(lit(0x5555L)).as("xor_alt"),
          shiftleft(col("o_orderkey"), 3).as("shl3"),
          shiftright(col("o_orderkey"), 2).as("shr2"),
          bit_count(col("o_orderkey")).cast("long").as("popcount"))
        .orderBy("o_orderkey")
    },

    "fn_regex" -> { (spark, dir) =>
      // the full regex surface in one query: extract / extract-all-count
      // / match-test / replace-all. Patterns stay in the common
      // RE2 ∩ java.util.regex dialect (no backrefs, no lookaround) so
      // the oracle runs the same pattern text. Per-row codegen, zero
      // shuffle before the output sort.
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]{7,})", 1).as("first_long"),
          size(regexp_extract_all(col("text"), lit("([a-z]{7,})"), lit(1)))
            .cast("long").as("n_long"),
          col("text").rlike("join [a-z ]*group").as("has_join_group"),
          regexp_replace(substring(col("text"), 1, 60), "[aeiou]", "_")
            .as("devoweled_prefix"))
        .orderBy("doc_id")
    },

    "fn_struct" -> { (spark, dir) =>
      // The STRUCT surface: build nested structs (order line inside an
      // order wrapper plus an array of per-charge structs), then read
      // fields back through dotted access and element_at().field —
      // proving construction, nesting, arrays-of-structs, and field
      // extraction all stay inside codegen (GetStructField is a zero-
      // cost projection at the columnar level; at 100 TB nested parquet
      // columns prune exactly like flat ones). Output is scalar facets
      // only — the driver's row compare can't sort struct columns.
      val line = Tables.table(spark, dir, "lineitem")
        .withColumn("item", struct(
          col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          col("l_partkey").as("part"), col("l_suppkey").as("supp"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price")))
        .withColumn("wrapped", struct(
          col("item").as("inner"), col("l_returnflag").as("flag")))
        .withColumn("charges", array(
          struct(lit("base").as("kind"), col("l_extendedprice").as("amt")),
          struct(lit("disc").as("kind"),
            (-col("l_extendedprice") * col("l_discount")).as("amt")),
          struct(lit("tax").as("kind"),
            (col("l_extendedprice") * col("l_tax")).as("amt"))))
      line.select(
          col("wrapped.inner.okey").as("l_orderkey"),
          col("wrapped.inner.line").as("l_linenumber"),
          col("item.part").as("l_partkey"),
          col("item.supp").as("l_suppkey"),
          col("item.qty").as("l_quantity"),
          col("item.price").as("l_extendedprice"),
          col("wrapped.flag").as("flag"),
          element_at(col("charges"), 2).getField("kind").as("charge2_kind"),
          element_at(col("charges"), 2).getField("amt").as("charge2_amt"),
          element_at(col("charges"), 3).getField("amt").as("charge3_amt"))
        .orderBy(Scans.lineitemKey.map(col): _*)
    },

    "fn_hash" -> { (spark, dir) =>
      // The content-addressing surface: md5 + sha256 digests (lowercase
      // hex in both engines), base64 of a fixed-width prefix, and
      // integer→hex. These are the primitives every dedup/lineage/cache
      // layer keys on (dedup_exact already GROUPS on sha2 — this query
      // pins the raw function outputs themselves). All four are per-row
      // codegen expressions; digesting 100 TB is embarrassingly
      // parallel and the 16/32-byte digests are what actually shuffles
      // downstream, never the documents.
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"),
          sha2(col("text").cast("binary"), 256).as("text_sha256"),
          base64(substring(col("text"), 1, 12).cast("binary")).as("pfx_b64"),
          hex(col("n_chars")).as("len_hex"))
        .orderBy("doc_id")
    }
  )

  def oracle = Map(
    "fn_hash" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  sha256(text) AS text_sha256,
        |  base64(substr(text, 1, 12)::BLOB) AS pfx_b64,
        |  hex(n_chars) AS len_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_struct" ->
      s"""WITH s AS (SELECT *,
         |    struct_pack(okey := l_orderkey, line := l_linenumber,
         |      part := l_partkey, supp := l_suppkey,
         |      qty := l_quantity, price := l_extendedprice) AS item,
         |    [struct_pack(kind := 'base', amt := l_extendedprice),
         |     struct_pack(kind := 'disc', amt := -l_extendedprice * l_discount),
         |     struct_pack(kind := 'tax', amt := l_extendedprice * l_tax)]
         |      AS charges
         |  FROM lineitem),
         |w AS (SELECT *, struct_pack(inner_ := item, flag := l_returnflag)
         |    AS wrapped FROM s)
         |SELECT (wrapped.inner_).okey AS l_orderkey,
         |  (wrapped.inner_).line AS l_linenumber,
         |  (item).part AS l_partkey, (item).supp AS l_suppkey,
         |  (item).qty AS l_quantity, (item).price AS l_extendedprice,
         |  (wrapped).flag AS flag,
         |  (charges[2]).kind AS charge2_kind,
         |  (charges[2]).amt AS charge2_amt,
         |  (charges[3]).amt AS charge3_amt
         |FROM w ORDER BY ${Scans.lineitemKeySql}""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_up,
        |  substring(p_type, 1, 5) AS type_pfx,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  p_type LIKE 'PROMO%' AS is_promo,
        |  coalesce(regexp_extract(p_type, '^([A-Z]+)', 1), '') AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_datetime" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_price,
        |  min(date_part('year', o_orderdate)) AS yr,
        |  min(date_part('month', o_orderdate)) AS mo,
        |  min(date_part('day', o_orderdate)) AS first_dom,
        |  max(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)))
        |    AS max_days_since_epoch
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "fn_math" ->
      """SELECT o_orderkey,
        |  abs(o_totalprice - 250000) AS abs_dev,
        |  ceil(o_totalprice) AS ceil_p,
        |  floor(o_totalprice) AS floor_p,
        |  round(o_totalprice, 2) AS round_p,
        |  sqrt(o_totalprice) AS sqrt_p,
        |  CAST(round(ln(o_totalprice), 6) AS DOUBLE) AS ln_p,
        |  CAST(round(pow(o_totalprice / 100000, 3), 6) AS DOUBLE) AS pow_p
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS e1,
        |  CAST(round(list_sum(list_transform(list_slice(embedding, 1, 4),
        |    x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS head4_sum,
        |  CAST(round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS DOUBLE) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // NOTE: MAP(...)['k'] returns a single-element LIST on DuckDB 1.0
    // (the installed oracle engine, SURVEY.md §5.2.1) — the [1] unwraps
    // it. DuckDB >= 1.2 changed map subscript to return the value
    // directly; if the oracle engine is ever upgraded, drop the [1].
    "fn_null" ->
      s"""WITH t AS (SELECT *,
         |    CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_discount END AS d,
         |    CASE WHEN l_linenumber % 4 = 0 THEN NULL ELSE l_tax END AS x
         |  FROM lineitem)
         |SELECT ${Scans.lineitemKeySql},
         |  coalesce(d, x, 0.5) AS c_fallback,
         |  nullif(d, 0.02) AS d_no02,
         |  least(d, x) AS lo,
         |  greatest(d, x) AS hi,
         |  (d IS NULL AND x IS NULL) AS both_null
         |FROM t ORDER BY ${Scans.lineitemKeySql}""".stripMargin,

    "fn_map" ->
      """SELECT o_orderkey,
        |  MAP(['status','priority'], [o_orderstatus, o_orderpriority])['status'][1] AS status_v,
        |  MAP(['status','priority'], [o_orderstatus, o_orderpriority])['priority'][1] AS priority_v,
        |  CAST(cardinality(MAP(['status','priority'], [o_orderstatus, o_orderpriority])) AS BIGINT) AS n_entries,
        |  array_to_string(list_sort(map_keys(MAP(['status','priority'], [o_orderstatus, o_orderpriority]))), ',') AS keys_sorted
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_json" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10) AS BIGINT) AS k_decile,
        |  count(*) AS n, min(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
        |FROM events GROUP BY 1 ORDER BY k_decile NULLS FIRST""".stripMargin,

    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 256 AS or_bit8,
        |  xor(o_orderkey, 21845) AS xor_alt,
        |  o_orderkey << 3 AS shl3,
        |  o_orderkey >> 2 AS shr2,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_regex" ->
      """SELECT doc_id,
        |  coalesce(regexp_extract(text, '([a-z]{7,})', 1), '') AS first_long,
        |  CAST(len(regexp_extract_all(text, '([a-z]{7,})', 1)) AS BIGINT) AS n_long,
        |  regexp_matches(text, 'join [a-z ]*group') AS has_join_group,
        |  regexp_replace(substring(text, 1, 60), '[aeiou]', '_', 'g')
        |    AS devoweled_prefix
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
