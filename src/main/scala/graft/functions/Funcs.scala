package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2g — scalar-function families. One query per family, each
  * exercising several functions so the oracle hash pins all of them.
  * Dialect parity notes (verified against DuckDB 1.0.0 this session):
  *  - `round` on DOUBLE is HALF_UP (away from zero) in BOTH engines for
  *    positive values — safe to compare rounded doubles.
  *  - DuckDB `dayofweek` is Sunday=0; Spark is Sunday=1 → oracle adds 1.
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all default.
  *  - `ln`/`pow` are libm-dependent (±1 ulp across JVM vs C) → always
  *    rounded to 4 decimals before comparison.
  * All functions here are Catalyst built-ins → whole-stage codegen, no UDF
  * overhead, and at 100 TB they pipeline inside the scan stage (no shuffle).
  */
object Funcs {

  val qs: Seq[(String, Q)] = Seq(

    // Column normalization: the reference's spreadsheet-cleaning surface.
    "fn_string" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lname"),
          upper(col("c_mktsegment")).as("useg"),
          substring(col("c_name"), 10, 9).as("cnum"),
          length(col("c_name")).as("name_len"),
          concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_nat"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), lit("Customer#"), lit("C")).as("short_name"),
          element_at(split(col("c_name"), "#"), 2).as("num_part"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                     lower(c_name) AS lname,
                     upper(c_mktsegment) AS useg,
                     substring(c_name, 10, 9) AS cnum,
                     length(c_name) AS name_len,
                     concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
                     lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
                     replace(c_name, 'Customer#', 'C') AS short_name,
                     string_split(c_name, '#')[2] AS num_part,
                     trim('  ' || c_mktsegment || '  ') AS trimmed
              FROM customer
              ORDER BY c_custkey""")),

    // ID parsing — the reference regex-parses consortium IDs; same shapes.
    "fn_regex" -> Q(
      (s, dir) => Tables.part(s, dir)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 2).as("noun"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
          col("p_name").rlike("^(red|blue|green)").as("is_color"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
                     regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS noun,
                     regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
                     regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
                     regexp_matches(p_name, '^(red|blue|green)') AS is_color
              FROM part
              ORDER BY p_partkey""")),

    // Near-dup name gate via edit distance.
    "fn_fuzzy" -> Q(
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"), col("p_name"),
                levenshtein(col("p_name"), lit("red widget")).as("dist"))
        .filter(col("dist") <= 6)
        .orderBy(col("dist"), col("p_partkey")),
      Some("""SELECT p_partkey, p_name, levenshtein(p_name, 'red widget') AS dist
              FROM part
              WHERE levenshtein(p_name, 'red widget') <= 6
              ORDER BY dist, p_partkey""")),

    // Date parsing/arithmetic — ad-hoc string dates are the reference's norm.
    "fn_date" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("omonth"),
          year(col("o_orderdate")).as("oyear"),
          month(col("o_orderdate")).as("omon"),
          dayofweek(col("o_orderdate")).as("odow"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_s"),
          expr("CAST(to_timestamp(date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss'), " +
               "'yyyy-MM-dd HH:mm:ss') AS TIMESTAMP_NTZ)").as("reparsed"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                     date_trunc('month', o_orderdate) AS omonth,
                     year(o_orderdate) AS oyear,
                     month(o_orderdate) AS omon,
                     dayofweek(o_orderdate) + 1 AS odow,
                     date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
                     CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
                     strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                              '%Y-%m-%d %H:%M:%S') AS reparsed
              FROM orders
              ORDER BY o_orderkey""")),

    // Lenient casting: try_cast yields NULL where CAST would throw under
    // ANSI semantics — the malformed-value cell-level companion to
    // src_csv_malformed's row-level handling.
    "fn_trycast" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .withColumn("first_tok", expr("element_at(split(trim(text), ' '), 1)"))
        .select(
          col("doc_id"),
          expr("try_cast(first_tok AS INT)").as("tok_as_int"),
          expr("try_cast(substr(text, 1, 10) AS DOUBLE)").as("prefix_as_dbl"),
          expr("try_cast(CAST(n_chars AS STRING) AS INT)").as("roundtrip_int"),
          // null dates/timestamps must never reach a declared output (the
          // two read paths spell them NULL vs NaT) — sentinel-fill them
          expr("""coalesce(try_cast(CASE WHEN doc_id % 3 = 0 THEN '2024-01-15'
                                         ELSE first_tok END AS DATE),
                           DATE'1900-01-01')""").as("date_or_default"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     TRY_CAST(string_split(trim(text), ' ')[1] AS INT) AS tok_as_int,
                     TRY_CAST(substr(text, 1, 10) AS DOUBLE) AS prefix_as_dbl,
                     TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS roundtrip_int,
                     COALESCE(TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN '2024-01-15'
                                            ELSE string_split(trim(text), ' ')[1]
                                       END AS DATE),
                              DATE '1900-01-01') AS date_or_default
              FROM documents
              ORDER BY doc_id""")),

    // Bitwise kernel over integer keys (mask/shift/xor/popcount — the id
    // packing/unpacking and bloom/bitset primitives). DuckDB's `^` is
    // POWER, so the oracle spells xor(); everything is exact int64 math.
    "fn_bitwise" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          expr("o_orderkey & 255").as("low_byte"),
          expr("o_orderkey | 1024").as("with_flag"),
          expr("o_orderkey ^ o_custkey").as("mixed"),
          expr("shiftleft(o_orderkey, 3)").as("shl3"),
          expr("shiftright(o_orderkey, 2)").as("shr2"),
          expr("CAST(bit_count(o_orderkey) AS INT)").as("popcount"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                     o_orderkey & 255 AS low_byte,
                     o_orderkey | 1024 AS with_flag,
                     xor(o_orderkey, o_custkey) AS mixed,
                     o_orderkey << 3 AS shl3,
                     o_orderkey >> 2 AS shr2,
                     CAST(bit_count(o_orderkey) AS INT) AS popcount
              FROM orders
              ORDER BY o_orderkey""")),

    // Price arithmetic; ln/pow rounded to 4 decimals (libm ulp hazard).
    "fn_math" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // round at scale 3 = the product's exact semantic decimal count:
          // rounding 2-decimal prices ×1.1 at scale 2 lands exactly on .xx5
          // boundaries where Spark (shortest-string HALF_UP) and DuckDB
          // (binary) disagree — at scale 3 no boundary is ever hit.
          round(col("l_extendedprice") * 1.1, 3).as("price_up"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          floor(col("l_quantity") / 7.0).as("qty_floor"),
          ceil(col("l_quantity") / 7.0).as("qty_ceil"),
          round(pow(col("l_tax") + lit(1.0), 2), 4).as("tax_sq"),
          round(log(col("l_extendedprice")), 4).as("ln_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
                     round(l_extendedprice * 1.1, 3) AS price_up,
                     abs(l_discount - 0.05) AS disc_dev,
                     CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor,
                     CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
                     round(pow(l_tax + 1.0, 2), 4) AS tax_sq,
                     round(ln(l_extendedprice), 4) AS ln_price
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber""")),

    // Array kernel over token arrays incl. higher-order transform/filter/
    // aggregate — all codegen'd built-ins, no UDFs (100 TB hot path).
    // Array-valued results are DECLARED as comma-joined strings: the
    // driver's pandas comparator can't sort/hash ndarray cells (round-1
    // `err` class); the array logic itself is unchanged.
    "fn_array" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          concat_ws(",", slice(col("toks"), 1, 3)).as("first3"),
          array_contains(col("toks"), "the").as("has_the"),
          size(expr("filter(toks, t -> length(t) > 4)")).as("n_long"),
          expr("concat_ws(',', transform(slice(toks, 1, 5), t -> CAST(length(t) AS STRING)))")
            .as("tok_lens"),
          expr("aggregate(toks, 0, (a, t) -> a + length(t))").as("total_chars"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     len(string_split(text, ' ')) AS n_toks,
                     array_to_string(string_split(text, ' ')[1:3], ',') AS first3,
                     list_contains(string_split(text, ' '), 'the') AS has_the,
                     len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long,
                     array_to_string(list_transform(string_split(text, ' ')[1:5],
                                       t -> CAST(length(t) AS VARCHAR)), ',') AS tok_lens,
                     CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS INTEGER) AS total_chars
              FROM documents
              ORDER BY doc_id""")),

    // Map build + explode to sorted entry rows (struct/map parity across
    // engines is fragile → compare as rows, SURVEY §2g fn_map note).
    "fn_map" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
                map_from_arrays(
                  array(lit("type"), lit("uid")),
                  array(col("event_type"), col("user_id").cast("string"))).as("m"))
        .select(col("event_id"), explode(col("m")).as(Seq("k", "v")))
        .orderBy(col("event_id"), col("k")),
      Some("""SELECT event_id, k, v FROM (
                SELECT event_id, 'type' AS k, event_type AS v FROM events
                UNION ALL
                SELECT event_id, 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events)
              ORDER BY event_id, k""")),

    // JSON payload handling: path extraction + schema-full from_json.
    "fn_json" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(
          col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k_path"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_typed"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
              FROM events
              ORDER BY event_id""")),

    // Spark 4 VARIANT — the engine-native semi-structured type (binary
    // encoded, shredded access) vs fn_json's string re-parse per path:
    // at 100 TB a metadata column parsed once into VARIANT is read with
    // typed O(fields) access per row instead of a JSON tokenizer per
    // extraction, and predicates on extracted fields stay codegen'd.
    // The fixture JSON is built in-query (format_string — identical
    // spelling in DuckDB's printf) so the oracle extracts from the SAME
    // bytes with its JSON functions: nested-path access, array
    // subscripts, and the try_variant_get miscast→NULL contract all
    // hash-gated. The variant column itself stays out of the compared
    // output (binary encoding is engine-specific by design).
    "fn_variant" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("j", format_string(
          """{"id":%d,"cust":{"key":%d},"tags":["%s","%s"]}""",
          col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority")))
        .withColumn("v", parse_json(col("j")))
        .select(
          col("o_orderkey").as("id"),
          variant_get(col("v"), "$.cust.key", "bigint").as("cust_key"),
          variant_get(col("v"), "$.tags[1]", "string").as("tag2"),
          try_variant_get(col("v"), "$.tags[0]", "bigint").as("bad_long"))
        .orderBy(col("id")),
      Some("""SELECT o_orderkey AS id,
                     CAST(json_extract_string(j, '$.cust.key') AS BIGINT) AS cust_key,
                     json_extract_string(j, '$.tags[1]') AS tag2,
                     TRY_CAST(json_extract_string(j, '$.tags[0]') AS BIGINT) AS bad_long
              FROM (SELECT o_orderkey,
                           printf('{"id":%d,"cust":{"key":%d},"tags":["%s","%s"]}',
                                  o_orderkey, o_custkey,
                                  o_orderstatus, o_orderpriority) AS j
                    FROM orders)
              ORDER BY id""")),

    // Content hashing for checksums / dedup keys. xxhash64 is kept out of
    // the compared columns (Spark-specific seed, SURVEY §2g).
    "fn_hash" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
                sha2(col("text"), 256).as("sha"),
                md5(col("text")).as("md5h"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, sha256(text) AS sha, md5(text) AS md5h
              FROM documents
              ORDER BY doc_id""")),

    // URL analysis — the web-corpus curation staple (host-level dedup /
    // source attribution / per-domain mixing all key on these pieces).
    // URLs are built deterministically from fixture columns, then parsed
    // back with Spark's parse_url builtin (HOST / PATH / single QUERY
    // param); DuckDB has no parse_url, so the oracle pins the same
    // pieces with anchored regexes. Stateless projection — pipelines
    // into the scan at any scale.
    "fn_url" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .withColumn("url", concat(
          lit("https://"), col("source"), lit(".example.com/"), col("lang"),
          lit("/doc/"), col("doc_id"), lit("?id="), col("doc_id"),
          lit("&lang="), col("lang")))
        .select(col("doc_id"), col("url"),
                expr("parse_url(url, 'HOST')").as("host"),
                expr("parse_url(url, 'PATH')").as("path"),
                expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
        .orderBy(col("doc_id")),
      Some("""WITH u AS (
                SELECT doc_id,
                       'https://' || source || '.example.com/' || lang
                         || '/doc/' || doc_id || '?id=' || doc_id
                         || '&lang=' || lang AS url
                FROM documents)
              SELECT doc_id, url,
                     regexp_extract(url, '^https://([^/]+)/', 1) AS host,
                     regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
                     regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang
              FROM u ORDER BY doc_id""")),

    // XML extraction functions — the scalar companions to src_xml for
    // XML that arrives IN a column (API payloads, embedded metadata
    // blobs): from_xml with an explicit schema (attribute + child
    // element + typed leaf) and the xpath_* family for point lookups
    // without a schema. The XML is built deterministically from order
    // columns, so the oracle recomputes every extracted value from the
    // base table directly — a mis-bound attribute or a total that
    // doesn't survive the string round trip breaks the hash (doubles
    // ride Spark's shortest-repr cast, bit-faithful both ways).
    // Stateless projections; pipeline into the scan at any scale.
    "fn_xml" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("x", concat(
          lit("<order id=\""), col("o_orderkey"), lit("\"><status>"),
          col("o_orderstatus"), lit("</status><total>"),
          col("o_totalprice").cast("string"), lit("</total></order>")))
        .withColumn("r", from_xml(col("x"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "_id BIGINT, status STRING, total DOUBLE")))
        .select(
          col("o_orderkey").as("id"),
          col("r._id").as("fx_id"),
          col("r.status").as("fx_status"),
          col("r.total").as("fx_total"),
          expr("xpath_string(x, '/order/status')").as("xp_status"),
          expr("xpath_long(x, '/order/@id')").as("xp_id"))
        .orderBy(col("id")),
      Some("""SELECT o_orderkey AS id, o_orderkey AS fx_id,
                     o_orderstatus AS fx_status, o_totalprice AS fx_total,
                     o_orderstatus AS xp_status, o_orderkey AS xp_id
              FROM orders
              ORDER BY id""")),

    // Deterministic namespaced ID minting + validation — the
    // registration-flow pair: mint a name-based UUID (v3 layout: md5 of
    // namespace‖name with version/variant bits patched into the hex)
    // and validate it against the canonical UUID regex. Name-based
    // minting is what makes re-registration idempotent at any scale —
    // the same entity always mints the same ID with no coordination,
    // no sequence, no driver state. The variant nibble maps the hash
    // nibble through strpos arithmetic identically in both engines.
    "fn_uuid" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("h", md5(concat(lit("graft-entity:"), col("doc_id"))))
          .withColumn("vn", expr(
            """substr('89ab',
                      cast((instr('0123456789abcdef', substr(h, 17, 1)) - 1) % 4
                           as int) + 1, 1)"""))
          .select(
            col("doc_id"),
            concat_ws("-",
              substring(col("h"), 1, 8), substring(col("h"), 9, 4),
              concat(lit("3"), substring(col("h"), 14, 3)),
              concat(col("vn"), substring(col("h"), 18, 3)),
              substring(col("h"), 21, 12)).as("uuid"))
          .withColumn("valid", col("uuid").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT doc_id, md5('graft-entity:' || doc_id) AS h
                         FROM documents),
                   u AS (SELECT doc_id,
                                substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
                                '3' || substr(h, 14, 3) || '-' ||
                                substr('89ab',
                                       CAST((strpos('0123456789abcdef',
                                                    substr(h, 17, 1)) - 1) % 4
                                            AS INTEGER) + 1, 1)
                                  || substr(h, 18, 3) || '-' ||
                                substr(h, 21, 12) AS uuid
                         FROM m)
              SELECT doc_id, uuid,
                     regexp_matches(uuid,
                       '^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$')
                       AS valid
              FROM u ORDER BY doc_id""")),

    // Data-protection functions — the release-side companions to
    // llm_pii_scrub: mask() for format-preserving redaction (case/digit
    // classes survive, values don't — logs and samples stay debuggable)
    // and aes_encrypt/aes_decrypt for column-level encryption at rest.
    // ECB keeps the ciphertext deterministic so the ROUND TRIP is
    // hash-gated end-to-end; the ciphertext itself can't cross engines,
    // so its block-padded LENGTH is the compared surface (PKCS#7:
    // (len div 16 + 1) · 16 — a wrong mode or key would break both the
    // round trip and the length). Key handling: a literal here; a real
    // deployment injects it per-session, the plan shape is identical.
    "fn_protect" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .withColumn("ct", expr(
          "aes_encrypt(c_name, '0123456789abcdef', 'ECB')"))
        .select(
          col("c_custkey"),
          expr("mask(c_name)").as("masked"),
          expr("cast(aes_decrypt(ct, '0123456789abcdef', 'ECB') as string)")
            .as("roundtrip"),
          length(col("ct")).as("ct_len"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                     regexp_replace(regexp_replace(regexp_replace(c_name,
                       '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                       AS masked,
                     c_name AS roundtrip,
                     (length(c_name) // 16 + 1) * 16 AS ct_len
              FROM customer
              ORDER BY c_custkey""")),

    // SQL-defined scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`,
    // SPARK-44837): the business-logic packaging the warehouse teams
    // actually use — the function body is SQL, so Catalyst INLINES it
    // into the caller's plan (codegen'd, pushdown-transparent), unlike a
    // JVM closure UDF which is an optimization barrier. Declared as a
    // net-price function applied across lineitem; per-row double
    // arithmetic only (no aggregate), so raw doubles are deterministic
    // and bit-identical to the oracle's inline spelling.
    "fn_sql_udf" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION net_price(
                   p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE
                 RETURN p * (1.0 - d) * (1.0 + t)""")
        s.sql("""SELECT l_orderkey, l_linenumber,
                        net_price(l_extendedprice, l_discount, l_tax) AS net
                 FROM lineitem_v
                 WHERE net_price(l_extendedprice, l_discount, l_tax) > 90000.0
                 ORDER BY l_orderkey, l_linenumber""")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net
              FROM lineitem
              WHERE l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) > 90000.0
              ORDER BY l_orderkey, l_linenumber"""))
  )
}
