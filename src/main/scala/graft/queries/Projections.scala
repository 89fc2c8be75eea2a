package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B P1–P11 — projection / filter / scalar expression surface.
  *
  * Everything here is a narrow (shuffle-free) map over one parquet scan:
  * at 100 TB these queries are bounded purely by scan bandwidth, so the
  * only thing that matters is that the filter and the column list reach
  * the parquet reader (PushedFilters / ReadSchema — asserted in
  * PlanSpec). All expressions are built-in `functions._` (whole-stage
  * codegen; no UDFs).
  *
  * Reference anchors: column pruning = R3 (kafka-database-import.go:160-163),
  * IN-list filter = scalar form of R4 (:170), envelope = R7 (:199),
  * to_json = R8 (:200).
  */
object Projections {

  val decls: Seq[Decl] = Seq(

    Decl(
      "p1_prune",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Decl(
      "p2_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "lineitem")
        .filter($"l_quantity" > 30 && $"l_discount".between(0.02, 0.06))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Decl(
      "p3_inlist",
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "customer")
        .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    Decl(
      "p4_strings",
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  substr(p_type, 1, 4) AS type4,
        |  p_brand || '#' || p_type AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_replace(p_name, ' ', '_') AS snake_name,
        |  trim(' ' || p_name || ' ') AS trimmed,
        |  string_split(p_name, ' ')[2] AS second_word
        |FROM part
        |WHERE p_name LIKE '%widget%'
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "part")
        .filter($"p_name".like("%widget%"))
        .select(
          $"p_partkey",
          upper($"p_name").as("up_name"),
          substring($"p_type", 1, 4).as("type4"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
          length($"p_name").cast("bigint").as("name_len"),
          lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
          regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
          regexp_replace($"p_name", " ", "_").as("snake_name"),
          trim(concat(lit(" "), $"p_name", lit(" "))).as("trimmed"),
          split($"p_name", " ").getItem(1).as("second_word"))
        .orderBy("p_partkey")
    },

    Decl(
      "p5_datetime",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate AS DATE) + 90 AS due_date
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ts = Qh.tsUs($"o_orderdate")
      Qh.t(s, dir, "orders")
        .select(
          $"o_orderkey",
          year(ts).cast("bigint").as("o_year"),
          month(ts).cast("bigint").as("o_month"),
          date_trunc("month", ts).cast(DateType).as("month_start"),
          datediff(ts.cast(DateType), lit("1997-01-01").cast(DateType))
            .as("days_since"),
          ts.cast(DateType).as("o_date"),
          unix_timestamp(ts).as("epoch_s"),
          date_add(ts.cast(DateType), 90).as("due_date"))
        .orderBy("o_orderkey")
    },

    Decl(
      "p6_math",
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice) * 100 + 0.5) / 100.0 AS price_r2,
        |  abs(l_discount - 0.03) AS disc_abs,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  l_quantity * l_quantity AS qty_sq,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_orderkey % 7 AS key_mod,
        |  floor((ln(l_extendedprice)) * 1000000 + 0.5) / 1000000.0 AS price_ln
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "lineitem")
        .select(
          $"l_orderkey", $"l_linenumber",
          Qh.r2($"l_extendedprice").as("price_r2"),
          abs($"l_discount" - 0.03).as("disc_abs"),
          ceil($"l_extendedprice").as("price_ceil"),
          floor($"l_extendedprice").as("price_floor"),
          ($"l_quantity" * $"l_quantity").as("qty_sq"),
          sqrt($"l_extendedprice").as("price_sqrt"),
          ($"l_orderkey" % 7).as("key_mod"),
          Qh.r6(log($"l_extendedprice")).as("price_ln"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    Decl(
      "p7_conditional",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(masked)') AS seg_masked,
        |  CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nk_parity
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "customer")
        .select(
          $"c_custkey",
          when($"c_acctbal" < 0, "neg")
            .when($"c_acctbal" < 5000, "mid")
            .otherwise("high").as("bal_band"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(masked)"))
            .as("seg_masked"),
          when($"c_nationkey" % 2 === 0, "even").otherwise("odd")
            .as("nk_parity"))
        .orderBy("c_custkey")
    },

    Decl(
      "p8_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS BIGINT)))::VARCHAR AS rebuilt
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .select(
          $"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          get_json_object($"props", "$.k").cast("bigint").as("k_int"),
          // ignoreNullFields=false: DuckDB's to_json always emits null
          // fields, Spark omits them by default — a row whose props lacks
          // '$.k' must serialize as {"k":null} on both sides.
          to_json(struct(
            get_json_object($"props", "$.k").cast("bigint").as("k")),
            Map("ignoreNullFields" -> "false"))
            .as("rebuilt"))
        .orderBy("event_id")
    },

    // P9d: posexplode — ordinality-preserving flatten (the position is
    // data, e.g. embedding dimension index). DuckDB zips two unnests
    // positionally for the same relation.
    Decl(
      "p9_posexplode",
      """SELECT vec_id,
        |  unnest(range(len(embedding))) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings
        |WHERE vec_id < 20
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "embeddings")
        .filter($"vec_id" < 20)
        .select($"vec_id", posexplode($"embedding"))
        .select($"vec_id", $"pos".cast(LongType).as("pos"),
          $"col".cast(DoubleType).as("val"))
        .orderBy("vec_id", "pos")
    },

    // P8b: the §1.2 dynamic-document model beyond flat string maps —
    // a NESTED payload (struct-in-array + DecimalType field) carried as
    // an opaque JSON string and lazily typed back with from_json. The
    // engine side round-trips orders through to_json → from_json with an
    // explicit nested schema (any loss/corruption of the Decimal or the
    // array-of-structs breaks the hash); the oracle states the same
    // relation directly over the parquet — the reference's
    // BSON-document shape (kafka-database-import.go:192, full type
    // system incl. Decimal128) expressed Spark-natively.
    Decl(
      "p8_json_nested",
      """WITH parts AS (
        |  SELECT o_orderstatus AS status, 'total' AS tag,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS amt FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, 'key', CAST(o_orderkey AS DECIMAL(18,2)) FROM orders)
        |SELECT status, tag,
        |  CAST(sum(amt) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM parts
        |GROUP BY status, tag
        |ORDER BY status, tag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloadSchema = new StructType()
        .add("id", LongType)
        .add("meta", new StructType().add("st", StringType).add("pr", StringType))
        .add("parts", ArrayType(new StructType()
          .add("tag", StringType)
          .add("amt", DecimalType(18, 2))))
      // tSpread: the to_json→from_json round trip is the whole cost and
      // would otherwise run on the single-row-group scan task (r16)
      Qh.tSpread(s, dir, "orders")
        .select(to_json(struct(
          $"o_orderkey".as("id"),
          struct($"o_orderstatus".as("st"), $"o_orderpriority".as("pr")).as("meta"),
          array(
            struct(lit("total").as("tag"),
              $"o_totalprice".cast(DecimalType(18, 2)).as("amt")),
            struct(lit("key").as("tag"),
              $"o_orderkey".cast(DecimalType(18, 2)).as("amt"))).as("parts")))
          .as("payload"))
        .select(from_json($"payload", payloadSchema).as("d"))
        .select($"d.meta.st".as("status"), explode($"d.parts").as("p"))
        .groupBy($"status", $"p.tag".as("tag"))
        .agg(
          sum($"p.amt").cast(DoubleType).as("total"),
          count(lit(1)).as("n"))
        .orderBy("status", "tag")
    },

    Decl(
      "p9_arrays",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_el,
        |  floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000.0 AS el_sum,
        |  list_aggregate(embedding, 'min') AS el_min,
        |  list_aggregate(embedding, 'max') AS el_max,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "embeddings")
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          $"embedding".getItem(0).as("first_el"),
          Qh.r4(aggregate($"embedding", lit(0.0),
            (acc, x) => acc + x.cast("double"))).as("el_sum"),
          array_min($"embedding").as("el_min"),
          array_max($"embedding").as("el_max"),
          size(filter($"embedding", x => x > 0)).as("n_pos"))
        .orderBy("vec_id")
    },

    // Higher-order / positional array functions not exercised by
    // p9_arrays: transform, sort_array, slice, array_contains.
    Decl(
      "p9_array_fns",
      """SELECT vec_id,
        |  list_transform(list_sort(embedding), x -> CAST(x AS DOUBLE) * 2.0)[1] AS min_x2,
        |  len(embedding[1:4]) AS slice_len,
        |  list_contains(list_transform(embedding, x -> x > 0), TRUE) AS has_pos
        |FROM embeddings
        |WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "embeddings")
        .filter($"vec_id" < 50)
        .select(
          $"vec_id",
          transform(sort_array($"embedding"), x => x.cast(DoubleType) * 2.0)
            .getItem(0).as("min_x2"),
          size(slice($"embedding", 1, 4)).as("slice_len"),
          array_contains(transform($"embedding", x => x > 0), true).as("has_pos"))
        .orderBy("vec_id")
    },

    Decl(
      "p9_explode",
      """SELECT vec_id, unnest(embedding) AS el
        |FROM embeddings
        |WHERE vec_id < 5
        |ORDER BY vec_id, el""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "embeddings")
        .filter($"vec_id" < 5)
        .select($"vec_id", explode($"embedding").as("el"))
        .orderBy("vec_id", "el")
    },

    Decl(
      "p10_maps",
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  array_to_string(list_sort(list_transform(json_keys(props),
        |    k -> json_extract_string(props, concat('$.', k)))), ',') AS vals_csv
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Parse values as STRING so key extraction can't be poisoned by a
      // non-long value anywhere in the map (from_json with LongType values
      // nulls the WHOLE map on first mismatch); only k_val casts. The map
      // is hoisted to its own projection so the JSON parses ONCE per row
      // instead of once per referencing column (from_json is expensive;
      // CollapseProject keeps multiply-referenced expensive exprs hoisted).
      Qh.t(s, dir, "events")
        .withColumn("m", from_json($"props", MapType(StringType, StringType)))
        .select(
          $"event_id",
          array_join(sort_array(map_keys($"m")), ",").as("keys_csv"),
          size(map_keys($"m")).as("n_keys"),
          element_at($"m", "k").cast("bigint").as("k_val"),
          array_join(sort_array(map_values($"m")), ",").as("vals_csv"))
        .orderBy("event_id")
    },

    // P10b: map higher-order functions over the dynamic payload —
    // map_filter / transform_values / map_zip_with (the map-shaped
    // counterparts of the P9 array HOFs). Outputs are sorted CSVs so
    // map iteration order can't leak into the hash; the oracle states
    // the same relations via json_keys + list_transform.
    Decl(
      "p10_map_hof",
      """SELECT event_id,
        |  CAST(len(list_filter(json_keys(props), k -> k <> 'k')) AS INT) AS n_nonk_keys,
        |  array_to_string(list_sort(list_transform(json_keys(props),
        |    k -> concat(k, '=', CAST(length(json_extract_string(props, concat('$.', k))) AS VARCHAR)))), ',') AS kv_len_csv,
        |  array_to_string(list_sort(list_transform(json_keys(props),
        |    k -> concat(json_extract_string(props, concat('$.', k)), '|',
        |                upper(json_extract_string(props, concat('$.', k)))))), ',') AS zipped_csv
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .withColumn("m", from_json($"props", MapType(StringType, StringType)))
        .select(
          $"event_id",
          // count, not CSV: the filtered map can be empty, and DuckDB's
          // array_to_string([]) is NULL while Spark's array_join is ''
          size(map_filter($"m", (k, _) => k =!= "k")).as("n_nonk_keys"),
          array_join(sort_array(map_values(
            transform_values($"m", (k, v) =>
              concat(k, lit("="), length(v).cast(StringType))))), ",").as("kv_len_csv"),
          array_join(sort_array(map_values(
            map_zip_with($"m", transform_values($"m", (_, v) => upper(v)),
              (_, v1, v2) => concat(v1, lit("|"), v2)))), ",").as("zipped_csv"))
        .orderBy("event_id")
    },

    // R7+R8 exactly: the reference's envelope {"data": <doc>, "source": "database"}
    // (kafka-database-import.go:199-200), restricted to integer/string
    // fields so the JSON text is byte-identical across engines.
    Decl(
      "p11_envelope",
      """SELECT event_id,
        |  to_json(struct_pack(
        |    data := struct_pack(event_id := event_id, event_type := event_type, user_id := user_id),
        |    source := 'database'))::VARCHAR AS value
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .select(
          $"event_id",
          to_json(struct(
            struct($"event_id", $"event_type", $"user_id").as("data"),
            lit("database").as("source")),
            Map("ignoreNullFields" -> "false")).as("value"))
        .orderBy("event_id")
    },

    // P12: UNPIVOT (wide → long) — the inverse of a8_pivot, the melt
    // every feature store needs. Spark's native unpivot is a narrow
    // 3×-row generator (no shuffle, no UDF); the oracle states the
    // equivalent UNION ALL.
    Decl(
      "p12_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        |  FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 100)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "lineitem")
        .filter($"l_orderkey" < 100)
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount"),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    // P13: CORRELATED SUBQUERIES — the SQL surface users actually write
    // (EXISTS + a correlated scalar subquery). The engine point is what
    // Catalyst DOES with them: RewritePredicateSubquery turns the EXISTS
    // into a semi-join and RewriteCorrelatedScalarSubquery turns the
    // scalar into an aggregate + outer join, so per-row re-execution —
    // the 100-TB killer of naive subquery evaluation — never exists in
    // the physical plan (PlanSpec: LeftSemi join present, no BNLJ). The
    // oracle runs the very same SQL text in DuckDB, which decorrelates
    // the same way.
    Decl(
      "p13_subqueries",
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "customer").createOrReplaceTempView("p13_customer")
      Qh.t(s, dir, "orders").createOrReplaceTempView("p13_orders")
      s.sql(
        """SELECT c_custkey, c_name,
          |  (SELECT max(o_totalprice) FROM p13_orders o
          |   WHERE o.o_custkey = c.c_custkey) AS max_price
          |FROM p13_customer c
          |WHERE EXISTS (
          |  SELECT 1 FROM p13_orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    },

    // P14: VARIANT — Spark 4's semi-structured type (the open-format
    // answer to schema-on-read JSON columns): parse once to the binary
    // variant encoding, then typed path extraction WITHOUT re-parsing
    // the text per field — at 100 TB the parse-per-access of raw JSON
    // strings is the dominant cost this type exists to remove. Paths
    // cover a top-level atom, a string field, and an array index. The
    // oracle recomputes the same VALUES relationally (the variant round
    // trip is semantically the identity on them).
    Decl(
      "p14_variant",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  event_type AS vtype,
        |  CAST(user_id * 2 AS BIGINT) AS id2
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payload = to_json(
        struct(
          $"event_type",
          array($"user_id", $"user_id" * 2).as("ids")))
      Qh.t(s, dir, "events")
        .select(
          $"event_id",
          parse_json($"props").as("vp"),
          parse_json(payload).as("v"))
        .select(
          $"event_id",
          variant_get($"vp", "$.k", "bigint").as("k_int"),
          variant_get($"v", "$.event_type", "string").as("vtype"),
          variant_get($"v", "$.ids[1]", "bigint").as("id2"))
        .orderBy("event_id")
    },

    // P16: ANSI-safe TRY_* arithmetic — the error-handling surface a
    // 100 TB batch job depends on: under ANSI SQL semantics (Spark 4's
    // default) a single bad row — divide by zero, overflow, malformed
    // cast — kills the whole multi-hour job; the try_* family turns
    // those rows into NULLs the pipeline can quarantine instead. One
    // row per order exercises all three: try_divide (zero denominator
    // on every 7th key), try_add (LONG overflow provoked near
    // Long.MaxValue), try_cast (non-numeric string). The oracle states
    // the identical semantics with explicit CASE guards, so the
    // null-instead-of-error contract is hash-checked row by row.
    Decl(
      "p16_try_functions",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |       ELSE CAST(o_totalprice / (o_orderkey % 7) AS DOUBLE) END AS safe_div,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |       ELSE o_orderkey + 1 END AS safe_add,
        |  TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
        |  TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS good_cast
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      // tSpread: the try_* projection is evaluated by BOTH the range
      // sampler and the sort shuffle; on the single-row-group scan task
      // that serialized the whole query twice over (r16)
      Qh.tSpread(s, dir, "orders")
        .select(
          $"o_orderkey",
          expr("try_divide(o_totalprice, o_orderkey % 7)").as("safe_div"),
          // overflow path: shift keys to the LONG ceiling for every 3rd
          // key, then undo — try_add nulls exactly those rows
          expr("""try_add(CASE WHEN o_orderkey % 3 = 0
                 |  THEN 9223372036854775807 ELSE o_orderkey END, 1)""".stripMargin)
            .as("safe_add"),
          expr("try_cast(o_orderpriority AS BIGINT)").as("bad_cast"),
          expr("try_cast(CAST(o_orderkey AS STRING) AS BIGINT)").as("good_cast"))
        .orderBy("o_orderkey")
    },

    // P15: LATERAL correlated subquery — the "top-N per outer row" SQL
    // surface (here: each nation's two richest customers). The engine
    // point is what Catalyst DOES with it: the correlated LIMIT
    // subquery decorrelates into one window-ranked semi-structured
    // join — executed ONCE over all nations, never re-run per outer
    // row (PlanSpec pins no nested-loop re-execution shape). At 100 TB
    // the per-row re-execution a naive engine does here is the
    // difference between one pass and |outer| passes over the fact.
    // Ties broken by c_custkey, so the selected rows are total-order
    // deterministic. The oracle runs the identical LATERAL text.
    Decl(
      "p15_lateral",
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |  LATERAL (
        |    SELECT c_custkey, c_acctbal FROM customer c
        |    WHERE c.c_nationkey = n.n_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey
        |    LIMIT 2) t
        |ORDER BY n_name, c_custkey""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "nation").createOrReplaceTempView("p15_nation")
      Qh.t(s, dir, "customer").createOrReplaceTempView("p15_customer")
      s.sql(
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM p15_nation n,
          |  LATERAL (
          |    SELECT c_custkey, c_acctbal FROM p15_customer c
          |    WHERE c.c_nationkey = n.n_nationkey
          |    ORDER BY c_acctbal DESC, c_custkey
          |    LIMIT 2) t
          |ORDER BY n_name, c_custkey""".stripMargin)
    }
  )
}
