package graft.functions

import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.8: scalar-function coverage, written in the ANSI subset
  * Spark and DuckDB share (per-function dialect notes inline). Everything
  * here is a codegen'd built-in — no UDFs on any of these paths.
  */
object Scalars {

  val all: Seq[Q] = Seq(

    Q("fn_string", Some(
      "SELECT p_partkey, UPPER(p_name) AS up_name, LOWER(p_type) AS lo_type, " +
        "SUBSTR(p_name, 1, 8) AS name8, TRIM(p_brand) AS brand_t, " +
        "LPAD(p_brand, 12, '*') AS brand_pad, REPLACE(p_type, ' ', '_') AS type_u, " +
        "CAST(LENGTH(p_name) AS INT) AS name_len, " +
        "CONCAT_WS('-', p_brand, p_type) AS brand_type, " +
        "SPLIT_PART(p_type, ' ', 2) AS type_word2 " +
        "FROM part ORDER BY p_partkey"),
      (s, d) =>
        T.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up_name"),
            lower(col("p_type")).as("lo_type"),
            substring(col("p_name"), 1, 8).as("name8"),
            trim(col("p_brand")).as("brand_t"),
            lpad(col("p_brand"), 12, "*").as("brand_pad"),
            regexp_replace(col("p_type"), " ", "_").as("type_u"),
            length(col("p_name")).as("name_len"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            // 1-based like DuckDB split_part, which yields '' past the end
            coalesce(try_element_at(split(col("p_type"), " "), lit(2)), lit(""))
              .as("type_word2"))
          .orderBy("p_partkey")),

    // POSIX-simple patterns only; DuckDB regexp_replace needs the 'g' flag
    // to match Spark's replace-all semantics.
    Q("fn_regex", Some(
      "SELECT p_partkey, REGEXP_EXTRACT(p_type, '(\\w+)$', 1) AS last_word, " +
        "REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS consonants " +
        "FROM part ORDER BY p_partkey"),
      (s, d) =>
        T.part(s, d)
          .select(
            col("p_partkey"),
            regexp_extract(col("p_type"), "(\\w+)$", 1).as("last_word"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"))
          .orderBy("p_partkey")),

    // printf-style formatting (round 10, fifth wave): Spark's
    // format_string (java.util.Formatter) vs DuckDB's printf ({fmt}) —
    // independent implementations of the same C conversion grammar, so
    // the overlap IS the graded claim: zero-pad/width/left-justify on
    // %d, lowercase %x hex, %s, and the %% literal agree byte-for-byte.
    // Floats stay out (Java and fmt round halfway cases differently) and
    // %x only sees nonnegative values (two's-complement width differs).
    // The id-formatting shape of every export/filename/key-generation
    // pipeline; map-only, codegen'd, zero shuffles before the sort.
    Q("fn_printf", Some(
      "SELECT p_partkey, " +
        "printf('%08d', p_partkey) AS id_pad, " +
        "printf('%x', p_partkey * 2654435761) AS id_hex, " +
        "printf('[%-12s]', p_brand) AS brand_just, " +
        "printf('%3d%%', p_size) AS size_pct " +
        "FROM part ORDER BY p_partkey"),
      (s, d) =>
        T.part(s, d)
          .select(
            col("p_partkey"),
            format_string("%08d", col("p_partkey")).as("id_pad"),
            format_string("%x", col("p_partkey") * lit(2654435761L)).as("id_hex"),
            format_string("[%-12s]", col("p_brand")).as("brand_just"),
            format_string("%3d%%", col("p_size")).as("size_pct"))
          .orderBy("p_partkey")),

    // Error-tolerant parsing (round 10, fifth wave): TRY_CAST over
    // deliberately messy synthesized strings — the first operation every
    // ingest of hand-typed/scraped data runs. Graded on the subset where
    // the two engines' grammars provably agree: integral strings (±,
    // surrounding whitespace) for the int lane, decimal/exponent forms
    // for the double lane, junk ('n/a', '', 'oops') → NULL in both.
    // Deliberately EXCLUDED: fractional→int ('123.75'), which DuckDB
    // rounds to 124 and Spark's ANSI try_cast rejects to NULL — a real
    // cross-engine semantics cliff, documented here so nobody grades it.
    // COUNT(col) counts parse successes; sums are over parsed values
    // (cents-scaled in the double lane). Map-only, codegen'd.
    Q("fn_trycast", Some(
      "WITH m AS (SELECT o_orderkey AS k, " +
        "CASE k % 5 WHEN 0 THEN CAST(k AS VARCHAR) " +
        "WHEN 1 THEN CONCAT(' ', CAST(k AS VARCHAR), ' ') " +
        "WHEN 2 THEN 'n/a' WHEN 3 THEN '' " +
        "ELSE CONCAT('-', CAST(k AS VARCHAR)) END AS si, " +
        "CASE k % 4 WHEN 0 THEN CONCAT(CAST(k AS VARCHAR), '.75') " +
        "WHEN 1 THEN CONCAT(CAST(k % 9 AS VARCHAR), 'e3') " +
        "WHEN 2 THEN CONCAT(' ', CAST(k AS VARCHAR), '.5 ') " +
        "ELSE 'oops' END AS sd FROM orders), " +
        "p AS (SELECT k, TRY_CAST(si AS BIGINT) AS pi, TRY_CAST(sd AS DOUBLE) AS pd FROM m) " +
        "SELECT k % 7 AS bucket, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(pi) AS BIGINT) AS n_int_ok, CAST(SUM(pi) AS BIGINT) AS sum_int, " +
        "CAST(COUNT(pd) AS BIGINT) AS n_dbl_ok, " +
        "CAST(SUM(CAST(FLOOR(pd * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_dbl_cents " +
        "FROM p GROUP BY bucket ORDER BY bucket"),
      (s, d) => {
        val k = col("o_orderkey")
        val si = when(k % 5 === 0, k.cast("string"))
          .when(k % 5 === 1, concat(lit(" "), k.cast("string"), lit(" ")))
          .when(k % 5 === 2, lit("n/a"))
          .when(k % 5 === 3, lit(""))
          .otherwise(concat(lit("-"), k.cast("string")))
        val sd = when(k % 4 === 0, concat(k.cast("string"), lit(".75")))
          .when(k % 4 === 1, concat((k % 9).cast("string"), lit("e3")))
          .when(k % 4 === 2, concat(lit(" "), k.cast("string"), lit(".5 ")))
          .otherwise(lit("oops"))
        T.orders(s, d)
          .select(k.as("k"), si.as("si"), sd.as("sd"))
          .select(col("k"), expr("TRY_CAST(si AS BIGINT)").as("pi"),
            expr("TRY_CAST(sd AS DOUBLE)").as("pd"))
          .groupBy((col("k") % 7).as("bucket"))
          .agg(count(lit(1)).as("n"),
            count(col("pi")).as("n_int_ok"), sum(col("pi")).as("sum_int"),
            count(col("pd")).as("n_dbl_ok"),
            sum(s2(col("pd"))).as("sum_dbl_cents"))
          .orderBy("bucket")
      }),

    // URL parsing (round 8): Spark's parse_url (HOST / PATH / QUERY-key
    // extraction) over synthesized URLs; DuckDB has no parse_url, so the
    // oracle spells the SAME component grammar as anchored regexes —
    // which is itself the graded claim: parse_url's component split on
    // well-formed URLs equals the RFC-shaped regex. Provenance/source
    // URLs are a standard column of web-scale training corpora, and the
    // host extract is the key for per-domain dedup/quality grouping.
    Q("fn_url", Some(
      "WITH u AS (SELECT event_id, 'https://' || event_type || '.example.com/u/' || " +
        "CAST(user_id AS VARCHAR) || '?v=' || CAST(event_id % 97 AS VARCHAR) || '&x=1' AS url FROM events) " +
        "SELECT event_id, REGEXP_EXTRACT(url, '^[a-z]+://([^/?#]+)', 1) AS host, " +
        "REGEXP_EXTRACT(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path, " +
        "REGEXP_EXTRACT(url, '[?&]v=([^&#]*)', 1) AS v_param " +
        "FROM u ORDER BY event_id"),
      (s, d) =>
        T.events(s, d)
          .select(col("event_id"), concat(
            lit("https://"), col("event_type"), lit(".example.com/u/"),
            col("user_id").cast("string"), lit("?v="),
            (col("event_id") % 97).cast("string"), lit("&x=1")).as("url"))
          .select(
            col("event_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("v")).as("v_param"))
          .orderBy("event_id")),

    // dayofweek is deliberately absent (numbering differs across engines);
    // datediff(end, start) maps to DuckDB date_diff('day', start, end).
    Q("fn_datetime", Some(
      "SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INT) AS y, " +
        "CAST(QUARTER(o_orderdate) AS INT) AS q, CAST(MONTH(o_orderdate) AS INT) AS m, " +
        "CAST(DAY(o_orderdate) AS INT) AS dom, " +
        "CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start, " +
        "CAST(o_orderdate + INTERVAL 5 DAY AS DATE) AS plus5, " +
        "CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since, " +
        "CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s " +
        "FROM orders ORDER BY o_orderkey"),
      (s, d) =>
        T.orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            to_date(col("o_orderdate") + expr("INTERVAL 5 DAY")).as("plus5"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"))
          .orderBy("o_orderkey")),

    // Scaled-long projections throughout (Det rule 1): abs/sqrt/ceil/floor
    // are IEEE-exact or correctly rounded. Since round 10 NO libm call
    // remains in the graded surface: ln/log10 go through Det.lnRatio
    // (2-dp money = cents/100, so ln(price) = lnInt(cents) − lnInt(100),
    // every op a fixed IEEE sequence) and POWER(x,2) is one exact
    // multiply — the r9 "1 ulp between libm builds" residual risk is
    // engineered away rather than accepted.
    Q("fn_math", Some(
      "WITH b AS (SELECT l_orderkey, l_linenumber, l_extendedprice, " +
        "l_quantity, l_discount, " + sqlS2("l_extendedprice") + " AS cents " +
        "FROM lineitem) " +
        "SELECT l_orderkey, l_linenumber, " +
        "cents AS price_r2, " +
        sqlS6("ABS(l_extendedprice - 50000)") + " AS abs_diff, " +
        "CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS ceil_k, " +
        "CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS floor_k, " +
        sqlS6("l_quantity * l_quantity") + " AS qty_sq, " +
        sqlS6("SQRT(l_extendedprice)") + " AS price_sqrt, " +
        sqlS6(sqlLnRatio("cents", "100")) + " AS price_ln, " +
        sqlS6(sqlLnRatio("cents", "100") + " * 0.4342944819032518") +
        " AS price_log10, " +
        "l_orderkey % 7 AS key_mod, " +
        "CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign " +
        "FROM b ORDER BY l_orderkey, l_linenumber, price_r2, qty_sq, disc_sign"),
      (s, d) =>
        T.lineitem(s, d)
          .withColumn("cents", s2(col("l_extendedprice")))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("cents").as("price_r2"),
            s6(abs(col("l_extendedprice") - 50000)).as("abs_diff"),
            ceil(col("l_extendedprice") / 1000).as("ceil_k"),
            floor(col("l_extendedprice") / 1000).as("floor_k"),
            s6(col("l_quantity") * col("l_quantity")).as("qty_sq"),
            s6(sqrt(col("l_extendedprice"))).as("price_sqrt"),
            s6(lnRatio(col("cents"), lit(100L))).as("price_ln"),
            s6(lnRatio(col("cents"), lit(100L)) * lit(0.4342944819032518))
              .as("price_log10"),
            (col("l_orderkey") % 7).as("key_mod"),
            signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
          .orderBy("l_orderkey", "l_linenumber", "price_r2", "qty_sq", "disc_sign")),

    // Round-10 sentinel for the portable-transcendental claim (Det.scala
    // "portable transcendentals"): grades lnInt and expP at FULL double
    // precision — ln(key) on the 1e-12 grid and exp(−ln(key)/4) on the
    // 1e-15 grid — over every order key. Any cross-build divergence in
    // the fixed-IEEE-op-sequence argument surfaces HERE as one red key
    // instead of silently inside the ~20 migrated ln/exp consumers. The
    // tight grids are the point: a single ulp anywhere fails the hash.
    Q("fn_lnp", Some {
      val lnk = sqlLnInt("o_orderkey")
      "WITH b AS (SELECT o_orderkey, " +
        s"CAST(FLOOR($lnk * 1e12 + 0.5) AS BIGINT) AS ln12, " +
        s"(-($lnk) / 4.0) AS negq FROM orders), " +
        "e AS (SELECT o_orderkey, ln12, " +
        s"CAST(FLOOR(${sqlExpP("negq")} * 1e15 + 0.5) AS BIGINT) AS exp15 FROM b) " +
        "SELECT o_orderkey, ln12, exp15 FROM e ORDER BY o_orderkey"
    },
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey"),
            floor(lnInt(col("o_orderkey")) * lit(1e12) + lit(0.5)).cast("long")
              .as("ln12"),
            (-lnInt(col("o_orderkey")) / lit(4.0)).as("negq"))
          .select(col("o_orderkey"), col("ln12"),
            floor(expP(col("negq")) * lit(1e15) + lit(0.5)).cast("long")
              .as("exp15"))
          .orderBy("o_orderkey")),

    Q("fn_cond", Some(
      "SELECT o_orderkey, " +
        "CASE WHEN o_totalprice > 300000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' " +
        "ELSE 'low' END AS bucket, " +
        "COALESCE(NULLIF(o_orderstatus, 'P'), 'X') AS st_or_x, " +
        sqlS6("GREATEST(o_totalprice, 100000)") + " AS hi, " +
        sqlS6("LEAST(o_totalprice, 100000)") + " AS lo " +
        "FROM orders ORDER BY o_orderkey"),
      (s, d) =>
        T.orders(s, d)
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") > 300000, "high")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("low").as("bucket"),
            coalesce(expr("NULLIF(o_orderstatus, 'P')"), lit("X")).as("st_or_x"),
            s6(greatest(col("o_totalprice"), lit(100000))).as("hi"),
            s6(least(col("o_totalprice"), lit(100000))).as("lo"))
          .orderBy("o_orderkey")),

    Q("fn_cast", Some(
      "SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_str, " +
        "CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS INTEGER) AS price_cents_i, " +
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str, " +
        "CAST(SUBSTR(CAST(o_orderkey AS VARCHAR), 1, 1) AS INT) AS first_digit " +
        "FROM orders ORDER BY o_orderkey"),
      (s, d) =>
        T.orders(s, d)
          .select(
            col("o_orderkey"),
            col("o_orderkey").cast("string").as("key_str"),
            s2(col("o_totalprice")).cast("int").as("price_cents_i"),
            to_date(col("o_orderdate")).cast("string").as("date_str"),
            substring(col("o_orderkey").cast("string"), 1, 1).cast("int").as("first_digit"))
          .orderBy("o_orderkey")),

    // Higher-order array functions over the 64-dim float embeddings; float
    // elements are cast to double before arithmetic on both engines, and
    // the element-sum stays double (64 unit-scale terms: fold-order error
    // ~1e-15 against a 1e-6 rounding grid).
    Q("fn_array", Some(
      "SELECT vec_id, CAST(LEN(embedding) AS INT) AS n, " +
        sqlS6("CAST(embedding[3] AS DOUBLE)") + " AS e3, " +
        "CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_pos, " +
        sqlS6("LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)), 'sum')") + " AS el_sum, " +
        sqlS6("CAST(LIST_SORT(embedding, 'DESC')[1] AS DOUBLE)") + " AS top1, " +
        sqlS6("CAST(LIST_SORT(embedding, 'DESC')[2] AS DOUBLE)") + " AS top2, " +
        sqlS6("CAST(LIST_SORT(embedding, 'DESC')[3] AS DOUBLE)") + " AS top3 " +
        "FROM embeddings ORDER BY vec_id"),
      (s, d) =>
        T.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("n"),
            s6(element_at(col("embedding"), 3).cast("double")).as("e3"),
            size(filter(col("embedding"), x => x > 0f)).as("n_pos"),
            // sequential left fold on both engines: same op order, same bits
            s6(aggregate(
              transform(col("embedding"), x => x.cast("double")),
              lit(0d), (acc, x) => acc + x)).as("el_sum"),
            s6(element_at(sort_array(col("embedding"), asc = false), 1).cast("double")).as("top1"),
            s6(element_at(sort_array(col("embedding"), asc = false), 2).cast("double")).as("top2"),
            s6(element_at(sort_array(col("embedding"), asc = false), 3).cast("double")).as("top3"))
          .orderBy("vec_id")),

    Q("fn_explode", Some(
      "SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM " +
        "(SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) " +
        "GROUP BY tok ORDER BY tok"),
      (s, d) =>
        T.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("tok")),

    // MAP columns have no portable DuckDB comparison surface (SURVEY §3.8 ✘);
    // rows-only check here, content equivalence covered by fn_explode.
    // MapType construction + lookup; the PROJECTED output is scalar, so a
    // DuckDB oracle applies (the map itself never crosses the engine
    // boundary — element_at on a missing key and SUM(CASE…) both yield
    // NULL, so the absent-'the' rows agree).
    Q("fn_map", Some(
      "WITH t AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) " +
        "SELECT doc_id, CAST(COUNT(DISTINCT tok) AS INT) AS n_distinct, " +
        "CAST(SUM(CASE WHEN tok = 'the' THEN 1 END) AS BIGINT) AS the_cnt " +
        "FROM t GROUP BY doc_id ORDER BY doc_id"),
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(map_from_entries(
            array_sort(collect_list(struct(col("tok"), col("cnt"))))).as("tok_counts"))
          .select(
            col("doc_id"),
            size(col("tok_counts")).as("n_distinct"),
            element_at(col("tok_counts"), "the").as("the_cnt"))
          .orderBy("doc_id")),

    // avg over ints derived exactly: SUM/COUNT of non-null k are exact
    // integers, then one IEEE divide (Det rule 3; AVG ignores NULLs, so the
    // divisor is COUNT(k), not COUNT(*)).
    Q("fn_json", Some(
      "SELECT event_type, " +
        "CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k, " +
        "CAST(FLOOR(CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS DOUBLE) * 1e6 " +
        "/ COUNT(JSON_EXTRACT_STRING(props, '$.k')) + 0.5) AS BIGINT) AS avg_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
      (s, d) =>
        T.events(s, d)
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("event_type")
          .agg(
            sum(col("k")).cast("bigint").as("sum_k"),
            floor(sum(col("k")).cast("double") * lit(1e6)
              / count(col("k")) + lit(0.5)).cast("long").as("avg_k"))
          .orderBy("event_type")),

    // from_json with a declared schema (the job-spec parsing path, typed —
    // vs scan_json_props' get_json_object string extraction).
    Q("fn_from_json", Some(
      "SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k, " +
        "CASE WHEN CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) >= 50 " +
        "THEN 'high' ELSE 'low' END AS k_bucket " +
        "FROM events ORDER BY event_id"),
      (s, d) =>
        T.events(s, d)
          .withColumn("j", from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType)))))
          .select(
            col("event_id"),
            col("j.k").as("k"),
            when(col("j.k") >= 50, "high").otherwise("low").as("k_bucket"))
          .orderBy("event_id")),

    // Calendar scaffolding (round 10, fifth wave): sequence(start, stop,
    // interval 1 day) — the generator every gap-fill / resample /
    // as-of-calendar join starts from (win_resample_ffill consumes this
    // shape; here the generator ITSELF is graded). Per user: the
    // inclusive daily calendar between first and last event day, graded
    // on its length and an exploded epoch-day checksum so a missing or
    // duplicated element breaks the hash. Oracle = DuckDB
    // generate_series over the same date bounds. The explode is bounded
    // by the calendar span (days, not events) — domain-sized fan-out.
    Q("fn_sequence", Some(
      "WITH b AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 " +
        "FROM events GROUP BY user_id), " +
        "cal AS (SELECT user_id, d0, d1, UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS day FROM b) " +
        "SELECT user_id, d0 AS first_day, d1 AS last_day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_days, " +
        "CAST(SUM((CAST(day AS DATE) - DATE '1970-01-01') % 97) AS BIGINT) AS cksum " +
        "FROM cal GROUP BY user_id, d0, d1 ORDER BY user_id"),
      (s, d) =>
        T.events(s, d)
          .groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
          .select(col("user_id"), col("d0"), col("d1"),
            explode(sequence(col("d0"), col("d1"),
              expr("INTERVAL 1 DAY"))).as("day"))
          .groupBy(col("user_id"), col("d0").as("first_day"), col("d1").as("last_day"))
          .agg(count(lit(1)).as("n_days"),
            sum(datediff(col("day"), lit("1970-01-01")) % 97).cast("long").as("cksum"))
          .orderBy("user_id")),

    // VARIANT semi-structured access (round 10, fifth wave) — Spark 4's
    // open-schema type graded end-to-end: synthesized nested JSON
    // (object + array + a MISSING field in every 5th row) goes through
    // parse_json → the binary VARIANT encoding → typed variant_get path
    // extraction, vs DuckDB's JSON path grammar on the same strings.
    // This is the schema-on-read column every telemetry/attribute table
    // grows; typed extraction (not string round-trips) is what keeps it
    // pushdown/codegen-friendly. Missing path → NULL on both engines.
    // Map-only before the presentation sort.
    Q("fn_variant", Some(
      "WITH j AS (SELECT event_id, CONCAT('{\"id\":', CAST(event_id AS VARCHAR), " +
        "',\"tags\":[\"t', CAST(event_id % 3 AS VARCHAR), '\",\"', event_type, '\"],\"meta\":{', " +
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE CONCAT('\"score\":', CAST(event_id % 97 AS VARCHAR), ',') END, " +
        "'\"flag\":', CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END, '}}') AS js FROM events) " +
        "SELECT event_id, CAST(JSON_EXTRACT_STRING(js, '$.meta.score') AS INTEGER) AS score, " +
        "JSON_EXTRACT_STRING(js, '$.tags[1]') AS tag2, " +
        "CAST(JSON_EXTRACT_STRING(js, '$.meta.flag') AS BOOLEAN) AS flag " +
        "FROM j ORDER BY event_id"),
      (s, d) => {
        val eid = col("event_id")
        val js = concat(lit("{\"id\":"), eid.cast("string"),
          lit(",\"tags\":[\"t"), (eid % 3).cast("string"), lit("\",\""),
          col("event_type"), lit("\"],\"meta\":{"),
          when(eid % 5 === 0, lit(""))
            .otherwise(concat(lit("\"score\":"), (eid % 97).cast("string"), lit(","))),
          lit("\"flag\":"), when(eid % 2 === 0, lit("true")).otherwise(lit("false")),
          lit("}}"))
        T.events(s, d)
          .select(eid, parse_json(js).as("v"))
          .select(col("event_id"),
            variant_get(col("v"), "$.meta.score", "int").as("score"),
            variant_get(col("v"), "$.tags[1]", "string").as("tag2"),
            variant_get(col("v"), "$.meta.flag", "boolean").as("flag"))
          .orderBy("event_id")
      }),

    // Bitwise battery (QA-flag manipulation beyond eo_bitmask's read path);
    // Spark's ^ operator is DuckDB's XOR() function, same semantics.
    Q("fn_bitops", Some(
      "SELECT o_orderkey, o_orderkey & 255 AS band, o_orderkey | 15 AS bor, " +
        "XOR(o_orderkey, 85) AS bxor, o_orderkey << 2 AS shl, o_orderkey >> 3 AS shr, " +
        "~o_orderkey AS bnot FROM orders ORDER BY o_orderkey"),
      (s, d) =>
        T.orders(s, d)
          .select(
            col("o_orderkey"),
            col("o_orderkey").bitwiseAND(255).as("band"),
            col("o_orderkey").bitwiseOR(15).as("bor"),
            col("o_orderkey").bitwiseXOR(85).as("bxor"),
            expr("shiftleft(o_orderkey, 2)").as("shl"),
            expr("shiftright(o_orderkey, 3)").as("shr"),
            expr("~o_orderkey").as("bnot"))
          .orderBy("o_orderkey")),

    // Edit distance (dedup/fuzzy-match primitive; same DP definition in
    // both engines). Bounded operands: 30-char prefixes.
    Q("fn_editdist", Some(
      "SELECT doc_id, CAST(LEVENSHTEIN(SUBSTR(text, 1, 30), 'the fast key order sort table') AS INT) AS dist " +
        "FROM documents ORDER BY doc_id"),
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            levenshtein(substring(col("text"), 1, 30),
              lit("the fast key order sort table")).as("dist"))
          .orderBy("doc_id")),

    Q("fn_hash", Some(
      "SELECT doc_id, MD5(text) AS text_md5 FROM documents ORDER BY doc_id"),
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")),

    // Higher-order array lambdas — filter / transform / aggregate (fold)
    // stay whole-stage-codegen'd; DuckDB's LIST_FILTER/LIST_TRANSFORM/
    // LIST_REDUCE are the portable twins. Integer outputs only (Det).
    Q("fn_lambda", Some(
      "SELECT doc_id, " +
        "CAST(LEN(LIST_FILTER(tk, t -> LENGTH(t) > 5)) AS BIGINT) AS n_long, " +
        "CAST(LIST_REDUCE(LIST_TRANSFORM(tk, t -> LENGTH(t)), (a, b) -> a + b) AS BIGINT) AS total_len " +
        "FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents) " +
        "ORDER BY doc_id"),
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
          .select(
            col("doc_id"),
            size(filter(col("tk"), t => length(t) > 5)).cast("bigint").as("n_long"),
            aggregate(col("tk"), lit(0L), (acc, t) => acc + length(t)).as("total_len"))
          .orderBy("doc_id")),

    // Haversine great-circle distance (round 9, sixth wave) — the geo
    // scalar behind every nearest-scene / coverage-radius catalog query.
    // Trig is allowed here under the eo_reproject coarse-grid rule,
    // strengthened: the output floors to INTEGER METERS, and a 1-ulp
    // trig/asin library difference perturbs the distance by ~1e-9 m —
    // nine orders below the grid. Synthetic station coordinates derive
    // from the nation key; all 25×24/2 pairs via the canonical a < b
    // self-join (dimension-sized, broadcast). The formula is the
    // textbook 2R·asin(√h); R = 6371000 m, one shared IEEE sequence.
    Q("fn_haversine", Some {
      val rad = "(PI() / 180.0)" // parenthesized: both engines multiply by the SAME precomputed constant
      def lat(t: String) = s"CAST($t.n_nationkey % 90 - 45 AS DOUBLE) * $rad"
      def lon(t: String) = s"CAST(($t.n_nationkey * 7) % 360 - 180 AS DOUBLE) * $rad"
      val h = s"SIN((${lat("b")} - ${lat("a")}) / 2.0) * SIN((${lat("b")} - ${lat("a")}) / 2.0) + " +
        s"COS(${lat("a")}) * COS(${lat("b")}) * " +
        s"SIN((${lon("b")} - ${lon("a")}) / 2.0) * SIN((${lon("b")} - ${lon("a")}) / 2.0)"
      "SELECT a.n_nationkey AS id1, b.n_nationkey AS id2, " +
        s"CAST(FLOOR(2.0 * 6371000.0 * ASIN(SQRT($h)) + 0.5) AS BIGINT) AS dist_m " +
        "FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey " +
        "ORDER BY id1, id2"
    },
      (s, d) => {
        val rad = math.Pi / 180.0
        def lat(c: org.apache.spark.sql.Column) =
          (c % 90 - 45).cast("double") * rad
        def lon(c: org.apache.spark.sql.Column) =
          ((c * 7) % 360 - 180).cast("double") * rad
        val a = T.nation(s, d).select(col("n_nationkey").as("id1"))
        val b = T.nation(s, d).select(col("n_nationkey").as("id2"))
        val la1 = lat(col("id1")); val la2 = lat(col("id2"))
        val lo1 = lon(col("id1")); val lo2 = lon(col("id2"))
        val h = sin((la2 - la1) / 2.0) * sin((la2 - la1) / 2.0) +
          cos(la1) * cos(la2) * sin((lo2 - lo1) / 2.0) * sin((lo2 - lo1) / 2.0)
        a.join(broadcast(b), col("id1") < col("id2"))
          .select(col("id1"), col("id2"),
            floor(lit(2.0) * lit(6371000.0) * asin(sqrt(h)) + 0.5)
              .cast("long").as("dist_m"))
          .orderBy("id1", "id2")
      }),

    // Deterministic namespace UUID (round 9, seventh wave) — RFC 4122
    // version 3 (md5-based): the STABLE row identity every cross-system
    // dedup/lineage join wants, derived from content alone (no RNG, no
    // monotonic generator). The digest formats into 8-4-4-4-12 with the
    // version nibble forced to '3' and the variant nibble folded into
    // {8,9,a,b} by a 16-way CASE — pure string slicing over the shared
    // md5, so both engines emit identical UUIDs character for character.
    Q("fn_uuid3", Some {
      val vmap = "CASE WHEN SUBSTRING(m, 17, 1) IN ('0','4','8','c') THEN '8' " +
        "WHEN SUBSTRING(m, 17, 1) IN ('1','5','9','d') THEN '9' " +
        "WHEN SUBSTRING(m, 17, 1) IN ('2','6','a','e') THEN 'a' ELSE 'b' END"
      "WITH h AS (SELECT doc_id, MD5(CONCAT('urn:doc:', CAST(doc_id AS VARCHAR))) AS m FROM documents) " +
        "SELECT doc_id, CONCAT(SUBSTRING(m, 1, 8), '-', SUBSTRING(m, 9, 4), '-', " +
        s"'3', SUBSTRING(m, 14, 3), '-', $vmap, SUBSTRING(m, 18, 3), '-', " +
        "SUBSTRING(m, 21, 12)) AS uuid3 " +
        "FROM h ORDER BY doc_id"
    },
      (s, d) => {
        val m = col("m")
        val v16 = substring(m, 17, 1)
        val vmap = when(v16.isin("0", "4", "8", "c"), "8")
          .when(v16.isin("1", "5", "9", "d"), "9")
          .when(v16.isin("2", "6", "a", "e"), "a").otherwise("b")
        T.documents(s, d)
          .select(col("doc_id"),
            md5(concat(lit("urn:doc:"), col("doc_id").cast("string"))).as("m"))
          .select(col("doc_id"), concat(
            substring(m, 1, 8), lit("-"), substring(m, 9, 4), lit("-"),
            lit("3"), substring(m, 14, 3), lit("-"), vmap, substring(m, 18, 3),
            lit("-"), substring(m, 21, 12)).as("uuid3"))
          .orderBy("doc_id")
      }),

    // Business-day arithmetic (round 9, seventh wave) — the SLA clock
    // every fulfillment/finance report runs on: weekdays of order-to-ship
    // lead time per lineitem, in CLOSED FORM (no calendar explode):
    // shift epoch days so Monday ≡ 0, then weekdays-before-d is
    // 5·(e div 7) + least(e mod 7, 5) and the interval count is one
    // subtraction — pure integer ops, identical div/mod on positive
    // epochs in both engines. Output = the bizdays histogram with the
    // calendar-day bounds per bucket (weekend compression visible as
    // cal range > biz value).
    Q("fn_bizdays", Some {
      def cum(d: String) =
        s"(5 * (($d + 3) // 7) + LEAST(($d + 3) % 7, 5))"
      val od = "(CAST(FLOOR(EPOCH(o.o_orderdate)) AS BIGINT) // 86400)"
      val sd2 = "(CAST(FLOOR(EPOCH(l.l_shipdate)) AS BIGINT) // 86400)"
      "WITH b AS (SELECT " + cum(sd2) + " - " + cum(od) + " AS bizdays, " +
        s"$sd2 - $od AS caldays FROM lineitem l " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey) " +
        "SELECT bizdays, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(MIN(caldays) AS BIGINT) AS cal_min, " +
        "CAST(MAX(caldays) AS BIGINT) AS cal_max " +
        "FROM b GROUP BY bizdays ORDER BY bizdays"
    },
      (s, d) => {
        def cum(day: String): String =
          s"(5 * (($day + 3) div 7) + least(($day + 3) % 7, 5))"
        T.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
          .join(T.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(expr("unix_timestamp(o_orderdate) div 86400").as("od"),
            expr("unix_timestamp(l_shipdate) div 86400").as("sd"))
          .select(expr(cum("sd") + " - " + cum("od")).as("bizdays"),
            (col("sd") - col("od")).as("caldays"))
          .groupBy("bizdays")
          .agg(count(lit(1)).as("n"), min("caldays").as("cal_min"),
            max("caldays").as("cal_max"))
          .orderBy("bizdays")
      }),

    // Luhn check digits (round 9, seventh wave) — the mod-10 checksum
    // behind card/IMEI/identifier validation, the classic ingest-time
    // integrity scalar: an 11-digit account number synthesizes from the
    // order key, the Luhn sum doubles every second digit from the right
    // (d*2 > 9 → d*2 − 9), and the check digit closes the sum to 0 mod
    // 10. Pure integer digit arithmetic generated textually for both
    // engines — no string padding semantics in the graded math. Output =
    // check digit histogram plus a digit-sum checksum per bucket.
    Q("fn_luhn", Some {
      // digits d0 (least significant) .. d10 of the 11-digit id
      def digit(i: Int) = s"((id // ${"1" + "0" * i}) % 10)"
      // from the RIGHT of the 11-digit payload, positions 0,2,4,... keep,
      // 1,3,5,... double (check digit appended after, so payload parity
      // counts from position 1 of the final number)
      val terms = (0 until 11).map { i =>
        val d = digit(i)
        if (i % 2 == 0) s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
        else d
      }.mkString(" + ")
      "WITH b AS (SELECT (o_orderkey * 7919 + 12345) % 100000000000 AS id FROM orders), " +
        s"l AS (SELECT id, $terms AS lsum FROM b), " +
        "c AS (SELECT id, lsum, (10 - lsum % 10) % 10 AS check_digit FROM l) " +
        "SELECT check_digit, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(lsum) AS BIGINT) AS sum_lsum, " +
        "CAST(MIN(id) AS BIGINT) AS min_id " +
        "FROM c GROUP BY check_digit ORDER BY check_digit"
    },
      (s, d) => {
        def digit(i: Int) = s"((id div ${"1" + "0" * i}) % 10)"
        val terms = (0 until 11).map { i =>
          val dd = digit(i)
          if (i % 2 == 0) s"(CASE WHEN $dd * 2 > 9 THEN $dd * 2 - 9 ELSE $dd * 2 END)"
          else dd
        }.mkString(" + ")
        T.orders(s, d)
          .select(((col("o_orderkey") * 7919 + 12345) % 100000000000L).as("id"))
          .withColumn("lsum", expr(terms))
          .withColumn("check_digit", (lit(10) - col("lsum") % 10) % 10)
          .groupBy("check_digit")
          .agg(count(lit(1)).as("n"), sum("lsum").as("sum_lsum"),
            min("id").as("min_id"))
          .orderBy("check_digit")
      }),

    // CIDR subnet matching (round 9, seventh wave) — the IP-allowlist /
    // geo-fence predicate every security and ops pipeline evaluates per
    // row: a uint32 address (synthesized by the Knuth multiplicative
    // hash of the event id) tested against a broadcast prefix table by
    // pure integer shifts — ip >> (32−p) = net >> (32−p) — never string
    // octets. The prefix dimension is tiny and broadcast; the match is
    // map-side, so the plan is one scan + one domain-sized aggregate at
    // any event volume.
    Q("fn_cidr_match", Some(
      "WITH ip AS (SELECT (event_id * 2654435761) % 4294967296 AS a FROM events), " +
        "nets AS (SELECT * FROM (VALUES ('10.0.0.0/8', 167772160, 8), " +
        "('172.16.0.0/12', 2886729728, 12), ('192.168.0.0/16', 3232235520, 16)) " +
        "AS v(cidr, net, p)), " +
        "m AS (SELECT n.cidr, ip.a FROM ip JOIN nets n " +
        "ON ip.a >> (32 - n.p) = n.net >> (32 - n.p)) " +
        "SELECT cidr, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(MIN(a) AS BIGINT) AS ip_min, CAST(MAX(a) AS BIGINT) AS ip_max " +
        "FROM m GROUP BY cidr ORDER BY cidr"),
      (s, d) => {
        import s.implicits._
        val nets = Seq(("10.0.0.0/8", 167772160L, 8),
          ("172.16.0.0/12", 2886729728L, 12),
          ("192.168.0.0/16", 3232235520L, 16)).toDF("cidr", "net", "p")
        T.events(s, d)
          .select(((col("event_id") * 2654435761L) % 4294967296L).as("a"))
          .crossJoin(broadcast(nets))
          .where(expr("a >> (32 - p) = net >> (32 - p)"))
          .groupBy("cidr")
          .agg(count(lit(1)).as("n"), min("a").as("ip_min"), max("a").as("ip_max"))
          .orderBy("cidr")
      }),

    // Soundex phonetic bucketing (round 10) — the classic
    // fuzzy-name-matching blocking key [Russell 1918; the standard SQL
    // SOUNDEX], in its SIMPLE variant (vowels and H/W/Y all act as
    // separators) spelled as ONE SHARED textual pipeline both engines
    // evaluate verbatim: uppercase → TRANSLATE to digit classes → runs
    // collapsed by a GENERATED 35-deep REPLACE chain (5 halving passes
    // per digit cover runs ≤ 32; DuckDB's RE2 regex has no
    // backreferences, so '(.)\\1+' is not portable — measured, not
    // assumed) → zeros dropped → the first letter's own digit dropped →
    // RPAD to the letter+3 code. Neither engine's BUILT-IN soundex is
    // used: builtins disagree on the H/W rule across implementations,
    // the generated pipeline cannot. Grouping parts by the code of
    // their first name-word is the record-linkage blocking step; one
    // hash aggregate, string work all map-side.
    Q("fn_soundex", Some(
      "WITH w AS (SELECT SPLIT_PART(p_name, ' ', 1) AS word FROM part), " +
        "c AS (SELECT word, " + soundexSqlOf("word") + " AS code FROM w) " +
        "SELECT code, CAST(COUNT(*) AS BIGINT) AS n_parts, " +
        "CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words, " +
        "MIN(word) AS word_min FROM c GROUP BY code ORDER BY code"),
      (s, d) =>
        T.part(s, d)
          .select(split(col("p_name"), " ").getItem(0).as("word"))
          .withColumn("code", expr(soundexSqlOf("word")))
          .groupBy("code")
          .agg(count(lit(1)).as("n_parts"),
            countDistinct(col("word")).as("n_words"),
            min(col("word")).as("word_min"))
          .orderBy("code")),

    // Binary↔text codecs (round 11) — base64 (RFC 4648 with padding)
    // and uppercase hex, the two encodings every interchange boundary
    // (webhooks, manifests, keys-in-JSON) round-trips through. Graded
    // BYTE-FOR-BYTE on the encoded strings (both engines implement the
    // same RFC alphabet, so equality is the conformance claim) plus a
    // decode-roundtrip flag proving unbase64∘base64 = id on this
    // corpus. Map-only; one partial agg would fold it at any scale.
    // Fiscal calendar mapping (round 12, third wave) [PK: the
    // April-start fiscal year of UK/India/Japan government reporting —
    // the calendar join every BI layer hand-rolls]: fiscal year = the
    // year containing the period start (FY labeled by START year),
    // quarter = ⌊(month−4 mod 12)/3⌋+1, plus the fiscal half and the
    // month-of-fiscal-year — all pure integer month arithmetic over
    // EXTRACT, no date library beyond year/month on either engine.
    // Graded per order date; map-only, scan-fused.
    Q("fn_fiscal", Some(
      "WITH b AS (SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y, " +
        "CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m FROM orders) " +
        "SELECT o_orderkey, y, m, " +
        "CASE WHEN m >= 4 THEN y ELSE y - 1 END AS fy, " +
        "(m + 8) % 12 // 3 + 1 AS fq, " +
        "CASE WHEN (m + 8) % 12 < 6 THEN 1 ELSE 2 END AS fh, " +
        "(m + 8) % 12 + 1 AS fm " +
        "FROM b ORDER BY o_orderkey"),
      (s, d) => {
        val b = T.orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        b.select(col("o_orderkey"), col("y"), col("m"),
            when(col("m") >= 4, col("y")).otherwise(col("y") - 1).as("fy"),
            (expr("(m + 8) % 12 div 3") + 1).as("fq"),
            when((col("m") + 8) % 12 < 6, 1L).otherwise(2L).as("fh"),
            ((col("m") + 8) % 12 + 1).as("fm"))
          .orderBy("o_orderkey")
      }),

    // Snowflake-id codec (round 12, third wave) [PK: the Twitter
    // Snowflake layout every event pipeline mints — 41-bit ms
    // timestamp | 10-bit machine | 12-bit sequence]: ids are MINTED
    // from the event fields (ms = te·1000 + id%1000, shard =
    // user%1024, seq = id%4096 — sid ≈ 7.2e18 stays inside int64) and
    // DECODED back by pure floor-div/mod, with the roundtrip flag
    // graded — the encode and decode halves must be exact inverses on
    // both engines or the flag lane breaks. The decode is the op log
    // pipelines actually run (extract event time + shard from an id
    // column without a timestamp column); map-only, scan-fused.
    Q("fn_snowflake", Some(
      "WITH b AS (SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS te FROM events), " +
        "e AS (SELECT event_id, te * 1000 + event_id % 1000 AS ms, " +
        "user_id % 1024 AS shard, event_id % 4096 AS seq FROM b), " +
        "sid AS (SELECT event_id, ms, shard, seq, " +
        "ms * 4194304 + shard * 4096 + seq AS id FROM e) " +
        "SELECT event_id, id, id // 4194304 AS ms2, " +
        "(id // 4096) % 1024 AS shard2, id % 4096 AS seq2, " +
        "CAST(CASE WHEN id // 4194304 = ms AND (id // 4096) % 1024 = shard " +
        "AND id % 4096 = seq THEN 1 ELSE 0 END AS INT) AS roundtrip_ok " +
        "FROM sid ORDER BY event_id"),
      (s, d) => {
        val e = T.events(s, d).select(col("event_id"), col("user_id"),
            epochS(col("ts")).as("te"))
          .select(col("event_id"),
            (col("te") * 1000 + col("event_id") % 1000).as("ms"),
            (col("user_id") % 1024).as("shard"),
            (col("event_id") % 4096).as("seq"))
          .withColumn("id",
            col("ms") * 4194304L + col("shard") * 4096L + col("seq"))
        e.select(col("event_id"), col("id"),
            expr("id div 4194304").as("ms2"),
            (expr("id div 4096") % 1024).as("shard2"),
            (col("id") % 4096).as("seq2"),
            when(expr("id div 4194304") === col("ms") &&
              (expr("id div 4096") % 1024) === col("shard") &&
              (col("id") % 4096) === col("seq"), 1).otherwise(0)
              .cast("int").as("roundtrip_ok"))
          .orderBy("event_id")
      }),

    Q("fn_base64", Some(
      "WITH r AS (SELECT o_orderkey AS k, " +
        "o_orderpriority || '|' || o_orderstatus || '|' || CAST(o_custkey AS VARCHAR) AS s " +
        "FROM orders WHERE o_orderkey % 7 = 0), " +
        "e AS (SELECT k, s, to_base64(CAST(s AS BLOB)) AS b64, " +
        "hex(CAST(s AS BLOB)) AS hx FROM r) " +
        "SELECT k, b64, hx, " +
        "CAST(CASE WHEN CAST(from_base64(b64) AS VARCHAR) = s THEN 1 ELSE 0 END AS BIGINT) AS roundtrip_ok " +
        "FROM e ORDER BY k"),
      (s, d) =>
        T.orders(s, d).where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("k"),
            concat_ws("|", col("o_orderpriority"), col("o_orderstatus"),
              col("o_custkey").cast("string")).as("s"))
          .select(col("k"),
            base64(col("s").cast("binary")).as("b64"),
            hex(col("s").cast("binary")).as("hx"),
            when(unbase64(base64(col("s").cast("binary"))).cast("string")
              === col("s"), 1L).otherwise(0L).as("roundtrip_ok"),
            col("s"))
          .select("k", "b64", "hx", "roundtrip_ok")
          .orderBy("k")))

  /** The shared soundex pipeline over a column reference — ONE string
    * both engines parse (Spark SQL and DuckDB agree on TRANSLATE /
    * REPLACE / SUBSTR / RPAD / CASE / ||), so the arithmetic cannot
    * diverge. See fn_soundex. */
  private def soundexSqlOf(c: String): String = {
    val digits = "01230120022455012623010202" // A..Z -> class
    val tr = s"TRANSLATE(UPPER($c), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '$digits')"
    // collapse runs: 5 halving REPLACE passes per digit class
    val collapsed = (0 to 6).foldLeft(tr) { (e, dg) =>
      (1 to 5).foldLeft(e)((e2, _) => s"REPLACE($e2, '$dg$dg', '$dg')")
    }
    val dg = s"REPLACE($collapsed, '0', '')"
    val fd = s"TRANSLATE(SUBSTR(UPPER($c), 1, 1), " +
      s"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '$digits')"
    s"(SUBSTR(UPPER($c), 1, 1) || SUBSTR(RPAD(CASE WHEN $fd <> '0' " +
      s"THEN SUBSTR($dg, 2) ELSE $dg END, 3, '0'), 1, 3))"
  }
}
