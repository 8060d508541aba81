package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{CategoryPath, CleanFns, MultiValue}

/** Core operator queries — the reference's analytic operators (SURVEY.md §2)
  * re-expressed over the driver's TPC-H-ish testdata, each with a DuckDB
  * oracle. Bridging scheme per SURVEY.md §7 step 2.
  *
  * Determinism rules: monetary sums go through DECIMAL(18,2) so the result
  * is independent of partition-level addition order, then back to DOUBLE so
  * both engines emit the identical value; every query ORDER BYs its key.
  */
object CoreQueries {

  /** Spark double sums are order-dependent; decimal sums are exact. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val all: Seq[Q] = Seq(

    // ----- A1/F3: multi-value collect + dedup (main.py:87-95, 134-139) -----
    Q("q01_multivalue_dedup",
      "A1/F3 `///`-joined distinct multi-value cell per group",
      Some("""SELECT o_custkey,
             |       string_agg(DISTINCT o_orderpriority, '///' ORDER BY o_orderpriority) AS priorities
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(MultiValue.collectDistinctSorted(col("o_orderpriority")).as("priorities"))
          .orderBy("o_custkey")
      }),

    // ----- J1/J2: category dimension + hierarchical path (main.py:1477-1507) -----
    Q("q02_category_path",
      "J1/J2 parent-pointer graph -> materialized ///-path, broadcast-joined to facts",
      Some("""WITH RECURSIVE edges AS (
             |  SELECT 'R' || r_regionkey AS id, CAST(NULL AS VARCHAR) AS parent, r_name AS name FROM region
             |  UNION ALL
             |  SELECT 'N' || n_nationkey, 'R' || n_regionkey, n_name FROM nation
             |), walk AS (
             |  SELECT id, parent AS anc, name AS path FROM edges
             |  UNION ALL
             |  SELECT w.id, e.parent, e.name || '///' || w.path
             |  FROM walk w JOIN edges e ON w.anc = e.id
             |)
             |SELECT c_custkey, coalesce(p.path, 'Undefined') AS category_path
             |FROM customer
             |LEFT JOIN (SELECT id, path FROM walk WHERE anc IS NULL) p
             |  ON p.id = 'N' || c_nationkey
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val region = Tables(s, dir, "region").select(
          concat(lit("R"), $"r_regionkey").as("id"),
          lit(null).cast("string").as("parentId"),
          $"r_name".as("name"))
        val nation = Tables(s, dir, "nation").select(
          concat(lit("N"), $"n_nationkey").as("id"),
          concat(lit("R"), $"n_regionkey").as("parentId"),
          $"n_name".as("name"))
        val paths = CategoryPath.resolvePaths(region.unionByName(nation))
        val facts = Tables(s, dir, "customer")
          .select($"c_custkey", concat(lit("N"), $"c_nationkey").as("catkey"))
        CategoryPath.attach(facts, "catkey", paths)
          .select($"c_custkey", $"category_path")
          .orderBy("c_custkey")
      }),

    // ----- P3/A9: data-driven emptiness scan (main.py:1554-1560) -----
    Q("q03_prune_stats",
      "P3/A9 single-pass per-column non-empty counts (the prune decision input)",
      Some("""SELECT CAST(sum(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_custkey_n,
             |       CAST(sum(CASE WHEN c_name IS NOT NULL AND trim(c_name) <> '' AND c_name <> 'Undefined' THEN 1 ELSE 0 END) AS BIGINT) AS c_name_n,
             |       CAST(sum(CASE WHEN c_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nationkey_n,
             |       CAST(sum(CASE WHEN c_acctbal IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_n,
             |       CAST(sum(CASE WHEN c_mktsegment IS NOT NULL AND trim(c_mktsegment) <> '' AND c_mktsegment <> 'Undefined' THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_n
             |FROM customer""".stripMargin),
      (s, dir) => {
        import s.implicits._
        def strN(c: String) = sum(
          when(col(c).isNotNull && trim(col(c)) =!= "" && col(c) =!= "Undefined", 1)
            .otherwise(0)).as(c + "_n")
        def anyN(c: String) =
          sum(when(col(c).isNotNull, 1).otherwise(0)).as(c + "_n")
        Tables(s, dir, "customer").agg(
          anyN("c_custkey"), strN("c_name"), anyN("c_nationkey"),
          anyN("c_acctbal"), strN("c_mktsegment"))
      }),

    // ----- A4: stock sum + availability + detail strings (main.py:348-365) -----
    Q("q04_stock_flag",
      "A4 per-order stock total, availability flag, ///-joined detail strings",
      Some("""SELECT l_orderkey,
             |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_stock,
             |       CASE WHEN sum(l_quantity) > 0 THEN '1' ELSE '0' END AS available,
             |       string_agg(l_linenumber || ': ' || CAST(l_quantity AS INT), '///'
             |                  ORDER BY l_linenumber || ': ' || CAST(l_quantity AS INT)) AS stock_details
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(
            sum($"l_quantity".cast("long")).as("total_stock"),
            MultiValue.availableFlag(sum($"l_quantity")).as("available"),
            MultiValue.stockDetails(
              $"l_linenumber".cast("string"),
              $"l_quantity".cast("int").cast("string")).as("stock_details"))
          .orderBy("l_orderkey")
      }),

    // ----- A5: price resolution (main.py:367-376) -----
    Q("q05_price_resolution",
      "A5 conditional-aggregate price/oldprice resolution per user",
      Some("""SELECT user_id,
             |       coalesce(discount_price, base_price) AS price,
             |       CASE WHEN discount_price IS NOT NULL THEN base_price END AS oldprice
             |FROM (SELECT user_id,
             |             max(CASE WHEN event_type = 'purchase' THEN value END) AS base_price,
             |             max(CASE WHEN event_type = 'click' AND value <> 0 THEN value END) AS discount_price
             |      FROM events GROUP BY user_id) t
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(
            MultiValue.basePrice($"event_type", $"value", "purchase").as("base_price"),
            MultiValue.discountPrice($"event_type", $"value", "click").as("discount_price"))
          .select(
            $"user_id",
            MultiValue.resolvedPrice($"base_price", $"discount_price").as("price"),
            MultiValue.resolvedOldPrice($"base_price", $"discount_price").as("oldprice"))
          .orderBy("user_id")
      }),

    // ----- F2: sanitize_name (main.py:79-85) -----
    Q("q06_sanitize_name",
      "F2 allowlist scrub + whitespace collapse + paren trim",
      Some("""SELECT p_partkey,
             |       trim(regexp_replace(regexp_replace(regexp_replace(
             |         '{' || p_name || '}™   (' || p_brand || ' )©',
             |         '[^\w\s\-\(\)\[\]/\\,\.;:!?''"«»„“”`~@#$%^&*+=<>|№°]', '', 'g'),
             |         '\s+', ' ', 'g'),
             |         '\(\s*([^)]+)\s*\)', '(\1)', 'g')) AS clean_name
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val dirty = concat(lit("{"), $"p_name", lit("}™   ("), $"p_brand", lit(" )©"))
        Tables(s, dir, "part")
          .select($"p_partkey", CleanFns.sanitizeNameAscii(dirty).as("clean_name"))
          .orderBy("p_partkey")
      }),

    // ----- F1: clean_description (main.py:57-76) -----
    Q("q07_clean_description",
      "F1 keep-only-p/br tag scrub + bare-text <p> wrap",
      Some("""SELECT p_partkey,
             |       CASE WHEN t = '' THEN ''
             |            WHEN t LIKE '<p>%' THEN t
             |            ELSE '<p>' || t || '</p>' END AS description
             |FROM (
             |  SELECT p_partkey,
             |         trim(replace(replace(replace(
             |           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |             '<div><b>' || p_name || '</b><br/>specs: ' || p_type || '</div>',
             |             '(?i)<br\s*/?>', chr(1), 'g'),
             |             '(?i)<p(\s[^>]*)?>', chr(2), 'g'),
             |             '(?i)</p>', chr(3), 'g'),
             |             '<[^>]*>', '', 'g'),
             |           chr(1), '<br>'), chr(2), '<p>'), chr(3), '</p>')) AS t
             |  FROM part) x
             |ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val html = concat(lit("<div><b>"), $"p_name",
                          lit("</b><br/>specs: "), $"p_type", lit("</div>"))
        Tables(s, dir, "part")
          .select($"p_partkey", CleanFns.cleanDescription(html).as("description"))
          .orderBy("p_partkey")
      }),

    // ----- F4/F5/F7: scalar cleanups -----
    Q("q08_string_cleanup",
      "F4 decimal comma, F5 '?' strip, F7 re-delimit",
      Some("""SELECT p_partkey,
             |       replace(CAST(p_retailprice AS VARCHAR), '.', ',') AS price_comma,
             |       trim(replace(p_size || '? cm', '?', '')) AS size_clean,
             |       replace(p_brand || ', ' || p_type, ', ', '///') AS type_redelim
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "part")
          .select(
            $"p_partkey",
            CleanFns.decimalComma($"p_retailprice".cast("string")).as("price_comma"),
            CleanFns.stripQuestion(concat($"p_size".cast("string"), lit("? cm"))).as("size_clean"),
            CleanFns.redelimit(concat($"p_brand", lit(", "), $"p_type")).as("type_redelim"))
          .orderBy("p_partkey")
      }),

    // ----- T5/T6: windowed top-k (assets TF-IDF top-10 / argmax) -----
    Q("q09_topk_window",
      "T5/T6 per-group top-3 by aggregate with deterministic tie-break",
      Some("""SELECT event_type, user_id, spend, rn FROM (
             |  SELECT event_type, user_id,
             |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend,
             |         CAST(row_number() OVER (
             |           PARTITION BY event_type
             |           ORDER BY CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) DESC, user_id) AS INT) AS rn
             |  FROM events GROUP BY event_type, user_id) t
             |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val spend = Tables(s, dir, "events")
          .groupBy("event_type", "user_id")
          .agg(dsum($"value").as("spend"))
        val w = Window.partitionBy($"event_type").orderBy($"spend".desc, $"user_id")
        spend.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .orderBy("event_type", "rn")
      }),

    // ----- J3/A7/T7: distinct dictionary + dense ids + re-join (main.py:535-547) -----
    Q("q10_dense_ids",
      "J3/T7 dense dictionary ids assigned on a tiny distinct dim, broadcast back",
      Some("""SELECT p_partkey, p_brand,
             |       CAST(dense_rank() OVER (ORDER BY p_brand) AS INT) AS brand_id
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val part = Tables(s, dir, "part")
        val dict = part.select($"p_brand").distinct()
          .withColumn("brand_id", row_number().over(Window.orderBy($"p_brand")))
        part.join(broadcast(dict), Seq("p_brand"))
          .select($"p_partkey", $"p_brand", $"brand_id")
          .orderBy("p_partkey")
      }),

    // ----- U2: ragged union (main.py:960) -----
    Q("q11_union_ragged",
      "U2 unionByName with missing columns (ragged schemas)",
      Some("""SELECT * FROM (
             |  SELECT c_custkey AS ukey, c_name AS uname, c_acctbal AS acctbal,
             |         c_mktsegment AS mktsegment, 'customer' AS src FROM customer
             |  UNION ALL BY NAME
             |  SELECT s_suppkey AS ukey, s_name AS uname, s_acctbal AS acctbal,
             |         'supplier' AS src FROM supplier) t
             |ORDER BY src, ukey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val c = Tables(s, dir, "customer").select(
          $"c_custkey".as("ukey"), $"c_name".as("uname"),
          $"c_acctbal".as("acctbal"), $"c_mktsegment".as("mktsegment"),
          lit("customer").as("src"))
        val sup = Tables(s, dir, "supplier").select(
          $"s_suppkey".as("ukey"), $"s_name".as("uname"),
          $"s_acctbal".as("acctbal"), lit("supplier").as("src"))
        c.unionByName(sup, allowMissingColumns = true).orderBy("src", "ukey")
      }),

    // ----- A11/K7: Excel column autosize (main.py:704-714) -----
    Q("q12_col_widths",
      "A11 max-length-per-column + autosize cap",
      Some("""SELECT CAST(least(max(length(c_name)) + 2, 50) AS BIGINT) AS w_name,
             |       CAST(least(max(length(c_mktsegment)) + 2, 50) AS BIGINT) AS w_mktsegment,
             |       CAST(least(max(length(CAST(c_custkey AS VARCHAR))) + 2, 50) AS BIGINT) AS w_custkey
             |FROM customer""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer").agg(
          least(max(length($"c_name")) + 2, lit(50)).cast("long").as("w_name"),
          least(max(length($"c_mktsegment")) + 2, lit(50)).cast("long").as("w_mktsegment"),
          least(max(length($"c_custkey".cast("string"))) + 2, lit(50)).cast("long").as("w_custkey"))
      }),

    // ----- A10/K8: summary stats (main.py:1120-1124) -----
    Q("q13_summary_stats",
      "A10 dataset summary card: row count, distinct customers/statuses, " +
        "min/max price — the one-aggregate overview panel the reference " +
        "renders for every processed feed; map-side partials, one row out",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             |       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
             |       min(o_totalprice) AS min_total,
             |       max(o_totalprice) AS max_total
             |FROM orders""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders").agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"o_custkey").as("n_customers"),
          countDistinct($"o_orderstatus").as("n_statuses"),
          min($"o_totalprice").as("min_total"),
          max($"o_totalprice").as("max_total"))
      }),

    // ----- F13: md5 short id (main.py:1767-1768) -----
    Q("q14_md5_id",
      "F13 short stable row id: upper(md5(name)[:8]) — the reference's " +
        "8-hex-char document id derivation, deterministic so re-runs " +
        "assign identical ids; pure map-side column expression",
      Some("""SELECT c_custkey, upper(substr(md5(c_name), 1, 8)) AS uid
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .select($"c_custkey", CleanFns.shortMd5($"c_name").as("uid"))
          .orderBy("c_custkey")
      }),

    // ----- extension: tumbling time window over events (SURVEY.md §2.8) -----
    Q("q15_hourly_events",
      "tumbling 1h window aggregation over the events table",
      Some("""SELECT date_trunc('hour', ts) AS hour,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy(date_trunc("hour", $"ts").as("hour"))
          .agg(
            count(lit(1)).as("n_events"),
            dsum($"value").as("total_value"),
            countDistinct($"user_id").as("n_users"))
          .orderBy("hour")
      }),

    // ----- extension: sliding time window (SURVEY.md §2.8) -----
    Q("q16_sliding_window",
      "sliding 2h-window/1h-hop aggregation over events",
      Some("""SELECT window_start,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM (
             |  SELECT date_trunc('hour', ts) AS window_start, value FROM events
             |  UNION ALL
             |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events) t
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy(window($"ts", "2 hours", "1 hour"))
          .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
          .select($"window.start".as("window_start"), $"n_events", $"total_value")
          .orderBy("window_start")
      })
  )
}
