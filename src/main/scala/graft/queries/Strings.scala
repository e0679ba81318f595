package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2.9 string functions (Series.str accessor).
  *
  * Reference surface: `sdc/datatypes/hpat_pandas_stringmethods_functions.py`
  * (center/contains/endswith/find/len/ljust/rjust/startswith/zfill/
  * lower/upper/strip family/is* classifiers) and scalar string ops in
  * `sdc/str_ext.py` (replace, re.sub, split, join, int(str)).
  *
  * All of these compile to codegen'd built-ins (`length/lpad/rpad/instr/
  * regexp functions/split`) — no UDFs, so they stay inside whole-stage codegen
  * and vectorize over the parquet scan.
  */
object Strings {

  val queries: Map[String, Q] = Map(
    // len / upper / lower / title-case / substring / concat
    "q_str_basic" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          length(col("p_name")).as("name_len"),
          upper(col("p_brand")).as("brand_up"),
          lower(col("p_type")).as("type_lo"),
          substring(col("p_name"), 1, 8).as("name_pre"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // contains / startswith / endswith / find(locate)
    "q_str_predicates" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          col("p_type").contains("BRUSHED").as("has_brushed"),
          col("p_type").startsWith("STANDARD").as("is_standard"),
          col("p_type").endsWith("STEEL").as("is_steel"),
          (instr(col("p_name"), "a") - 1).as("find_a"))
        .orderBy(col("p_partkey"))
    }),

    // ljust / rjust / zfill / center (pandas pad semantics: extra on right)
    "q_str_pad" -> ((s, dir) => {
      val w = 30
      val len = length(col("p_brand"))
      val padTotal = greatest(lit(w) - len, lit(0))
      // pandas ljust/rjust/zfill/center NEVER truncate a string already
      // at/over the width (Spark's lpad/rpad DO) — hence the len guards.
      // Unexercised on p_brand (<= 10 chars), pinned by the pad property
      // suite on generated strings.
      def noTrunc(w2: Int, padded: org.apache.spark.sql.Column) =
        when(len >= w2, col("p_brand")).otherwise(padded)
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          noTrunc(w, rpad(col("p_brand"), w, " ")).as("ljust"),
          noTrunc(w, lpad(col("p_brand"), w, " ")).as("rjust"),
          noTrunc(12, lpad(col("p_brand"), 12, "0")).as("zfill"),
          noTrunc(w, rpad(lpad(col("p_brand"),
            (len + floor(padTotal / 2)).cast("int"), lit(" ")), lit(w), lit(" ")))
            .as("centered"))
        .orderBy(col("p_partkey"))
    }),

    // split + element access; replace via regexp
    "q_str_split_replace" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          split(col("p_type"), " ").getItem(0).as("type_word1"),
          regexp_replace(col("p_name"), "a", "@").as("name_sub"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_novowel"))
        .orderBy(col("p_partkey"))
    }),

    // S.str.cat(sep) as a grouped aggregate: group members sorted then
    // joined — the sort makes the concatenation order-deterministic
    // (DuckDB mirrors with string_agg(... ORDER BY ...))
    "q_str_cat" -> ((s, dir) => {
      // sort_array, not array_sort: same ascending order on the null-free
      // collect_list, but array_sort's default comparator is an
      // interpreted LambdaFunction while sort_array is lambda-free
      Tables(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name"))))
          .as("names"))
        .orderBy(col("n_regionkey"))
    }),

    // str.extract: regex capture groups as new columns (reference regex
    // surface `sdc/str_ext.py:164-173` re.compile/Pattern.sub); both
    // engines return "" for a non-matching row, and the pattern below
    // totally matches the priority domain anyway
    "q_str_extract" -> ((s, dir) => {
      val re = "^([0-9])-(.+)$"
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), re, 1).as("prio_num"),
          regexp_extract(col("o_orderpriority"), re, 2).as("prio_word"))
        .orderBy(col("o_orderkey"))
    }),

    // is* classifiers via anchored regexes + strip family + capitalize
    "q_str_classify" -> ((s, dir) => {
      val word1 = split(col("p_name"), " ").getItem(0)
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          word1.rlike("^[A-Za-z]+$").as("isalpha"),
          word1.rlike("^[0-9]+$").as("isdigit"),
          word1.rlike("^[a-z]+$").as("islower"),
          word1.rlike("^[A-Z]+$").as("isupper"),
          regexp_replace(col("p_name"), "^\\s+|\\s+$", "").as("stripped"),
          concat(upper(substring(word1, 1, 1)),
            lower(substring(word1, 2, 1000))).as("capitalized"))
        .orderBy(col("p_partkey"))
    }),

    // remaining is* classifiers (`hpat_pandas_stringmethods_functions
    // .py:727-844`): isalnum/isnumeric/isdecimal/isspace/istitle — all
    // anchored regexes, codegen'd, ASCII domain (the reference's
    // StringArray kernels are ASCII-table-driven too)
    "q_str_classify_full" -> ((s, dir) => {
      val word1 = split(col("p_name"), " ").getItem(0)
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          word1.rlike("^[A-Za-z0-9]+$").as("isalnum"),
          word1.rlike("^[0-9]+$").as("isnumeric"),
          word1.rlike("^[0-9]+$").as("isdecimal"),
          word1.rlike("^\\s+$").as("isspace"),
          col("p_name").rlike("^([A-Z][a-z]*)( [A-Z][a-z]*)*$").as("istitle"))
        .orderBy(col("p_partkey"))
    }),

    // strip family + case family (`:860-1050`): lstrip/rstrip/strip,
    // title/swapcase/casefold. swapcase is a per-char case flip —
    // translate() with mirrored ASCII alphabets stays in codegen;
    // casefold ≡ lower for the ASCII domain.
    "q_str_strip_case" -> ((s, dir) => {
      val lo = "abcdefghijklmnopqrstuvwxyz"
      val up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
      val padded = concat(lit("  "), col("p_name"), lit("  "))
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          regexp_replace(padded, "^\\s+", "").as("lstripped"),
          regexp_replace(padded, "\\s+$", "").as("rstripped"),
          initcap(col("p_name")).as("titled"),
          translate(col("p_brand"), lo + up, up + lo).as("swapped"),
          lower(col("p_type")).as("casefolded"))
        .orderBy(col("p_partkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_str_cat" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_str_extract" ->
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '^([0-9])-(.+)$', 1) AS prio_num,
        |  regexp_extract(o_orderpriority, '^([0-9])-(.+)$', 2) AS prio_word
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_str_basic" ->
      """SELECT p_partkey,
        |  LENGTH(p_name) AS name_len,
        |  UPPER(p_brand) AS brand_up,
        |  LOWER(p_type) AS type_lo,
        |  SUBSTRING(p_name, 1, 8) AS name_pre,
        |  p_brand || '|' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_predicates" ->
      """SELECT p_partkey,
        |  contains(p_type, 'BRUSHED') AS has_brushed,
        |  starts_with(p_type, 'STANDARD') AS is_standard,
        |  suffix(p_type, 'STEEL') AS is_steel,
        |  CAST(strpos(p_name, 'a') - 1 AS INT) AS find_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_pad" ->
      """SELECT p_partkey,
        |  CASE WHEN LENGTH(p_brand) >= 30 THEN p_brand
        |       ELSE rpad(p_brand, 30, ' ') END AS ljust,
        |  CASE WHEN LENGTH(p_brand) >= 30 THEN p_brand
        |       ELSE lpad(p_brand, 30, ' ') END AS rjust,
        |  CASE WHEN LENGTH(p_brand) >= 12 THEN p_brand
        |       ELSE lpad(p_brand, 12, '0') END AS zfill,
        |  CASE WHEN LENGTH(p_brand) >= 30 THEN p_brand
        |       ELSE rpad(lpad(p_brand,
        |    CAST(LENGTH(p_brand) + FLOOR(GREATEST(30 - LENGTH(p_brand), 0) / 2) AS INT),
        |    ' '), 30, ' ') END AS centered
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_split_replace" ->
      """SELECT p_partkey,
        |  split_part(p_type, ' ', 1) AS type_word1,
        |  regexp_replace(p_name, 'a', '@', 'g') AS name_sub,
        |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_novowel
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_classify" ->
      """SELECT p_partkey,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[A-Za-z]+$') AS isalpha,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[0-9]+$') AS isdigit,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[a-z]+$') AS islower,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[A-Z]+$') AS isupper,
        |  TRIM(p_name, ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)) AS stripped,
        |  UPPER(SUBSTRING(split_part(p_name, ' ', 1), 1, 1)) ||
        |    LOWER(SUBSTRING(split_part(p_name, ' ', 1), 2, 1000)) AS capitalized
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_classify_full" ->
      """SELECT p_partkey,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[A-Za-z0-9]+$') AS isalnum,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[0-9]+$') AS isnumeric,
        |  regexp_matches(split_part(p_name, ' ', 1), '^[0-9]+$') AS isdecimal,
        |  regexp_matches(split_part(p_name, ' ', 1), '^\s+$') AS isspace,
        |  regexp_matches(p_name, '^([A-Z][a-z]*)( [A-Z][a-z]*)*$') AS istitle
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_strip_case" ->
      """SELECT p_partkey,
        |  regexp_replace('  ' || p_name || '  ', '^\s+', '') AS lstripped,
        |  regexp_replace('  ' || p_name || '  ', '\s+$', '') AS rstripped,
        |  array_to_string(list_transform(regexp_split_to_array(p_name, ' '),
        |    w -> UPPER(w[1]) || LOWER(w[2:])), ' ') AS titled,
        |  translate(p_brand,
        |    'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
        |    'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz') AS swapped,
        |  LOWER(p_type) AS casefolded
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
