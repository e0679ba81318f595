package graft.queries

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{dmean, dstdSamp, dsum}

/** SURVEY §2.1 sources: the `read_csv` options matrix, the DataFrame
  * constructor, and the NumPy binary-file source.
  *
  * Reference surface: `pd.read_csv(names/usecols/dtype/sep/skiprows/
  * parse_dates)` (`sdc/datatypes/hpat_pandas_functions.py:101-363`,
  * pyarrow engine `sdc/io/csv_ext.py:94-274`), `pd.DataFrame({...})`
  * constructor (`sdc/rewrites/dataframe_constructor.py:57-279`),
  * `np.fromfile` (`sdc/io/np_io.py:58-186`).
  *
  * CSV/binary fixtures are generated from the driver's parquet tables
  * ONCE per (kind, sfDir) per JVM — never inside the timed query body
  * (a per-call `coalesce(1).write` would be a side-effecting,
  * non-idempotent step that also breaks bench timings).
  */
object Sources {

  private val fixtures = new ConcurrentHashMap[String, String]()

  /** The nation fixture's explicit schema — shared by every reader of
    * `nationCsv`/`nationJson` so the dtype stays in one place. */
  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** The orders CSV fixture's schema — shared by `q_read_csv_options`
    * and `q_census_etl` (both read `ordersCsv`). */
  private val ordersCsvSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", StringType),
    StructField("o_orderpriority", StringType)))

  /** Nation as a headered comma CSV (the simple read path). */
  private def nationCsv(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"nation:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "nation")
        .orderBy(col("n_nationkey"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      tmp
    })

  /** Orders as a '|'-separated CSV with a formatted date column and an
    * extra column the reader will drop (exercises usecols). */
  private def ordersCsv(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"orders:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_opt_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true").option("sep", "|").csv(tmp)
      tmp
    })

  /** Nation as JSON-lines (one object per line — the splittable layout;
    * a single multi-MB JSON array would be one unsplittable task). */
  private def nationJson(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"json:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_json_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
        .coalesce(1)
        .write.mode("overwrite").json(tmp)
      tmp
    })

  /** Supplier as ORC (the columnar alternative; predicate pushdown and
    * column pruning work the same as parquet). */
  private def supplierOrc(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"orc:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
        .coalesce(1) // single-file fixture, like every other fixture here
        .write.mode("overwrite").orc(tmp)
      tmp
    })

  /** Customer as XML (Spark 4's built-in XML source — one <customer>
    * element per row under rowTag). XML is the interchange format
    * enterprise feeds still arrive in; the source is splittable on
    * rowTag boundaries, so a 100 TB feed scans in parallel like any
    * other text source. Doubles round-trip exactly (shortest-
    * round-trip rendering, same as the CSV sink). */
  private def customerXml(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"xml:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_xml_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .coalesce(1) // single-file fixture, like every other fixture here
        .write.mode("overwrite").format("xml")
        .option("rowTag", "customer").save(tmp)
      tmp
    })

  /** The XML fixture's explicit schema (shared write/read contract). */
  private val customerXmlSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** Customer written as a MULTI-PART CSV dataset — the reference's
    * parallelized `df.to_csv` (`sdc/distributed_analysis.py:604-605`
    * "to_csv() can be parallelized"): every partition writes its own
    * part file concurrently, no driver funnel, which is the only write
    * shape that survives 100 TB. Doubles round-trip exactly (Spark
    * emits shortest-round-trip decimal strings). */
  private def customerCsvOut(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"csvout:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvout_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      tmp
    })

  /** Customer CSV with every 7th acctbal corrupted to non-numeric text
    * — the PERMISSIVE-mode fixture (a clean fixture can't exercise the
    * malformed-row path). Corruption keyed on c_custkey so the oracle
    * can predict exactly which rows null out. */
  private def customerCsvBad(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"csvbad:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvbad_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("c_custkey") % 7 === 0, lit("corrupted"))
            .otherwise(col("c_acctbal").cast("string")).as("c_acctbal"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      tmp
    })

  /** Orders written as a partitioned parquet dataset (hive layout,
    * `o_orderpriority=<v>/` directories) — the sink side of §2.1 plus
    * the partition-pruned scan the round-trip query exercises. */
  /** Two parquet generations in ONE directory: v1 files without
    * c_mktsegment, v2 files with it — the lakehouse schema-evolution
    * layout `mergeSchema` exists for. */
  private def customerEvolved(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"cevo:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_cevo_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val c = Tables(s, dir, "customer")
      c.select(col("c_custkey"), col("c_name"))
        .write.mode("overwrite").parquet(tmp)
      c.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .write.mode("append").parquet(tmp)
      tmp
    })

  private def ordersPartitioned(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"opart:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_opart_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(tmp)
      tmp
    })

  /** A 5-row priority-dimension table staged as PARQUET — not a local
    * relation, deliberately: Catalyst constant-folds a Filter over a
    * LocalRelation away, and dynamic partition pruning only triggers
    * off a surviving selective Filter node on the dim side. A real
    * warehouse's dims are tables; this mirrors that. */
  private def priorityDim(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"priodim:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_priodim_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      import s.implicits._
      Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "cold"),
        ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
        .toDF("prio", "tier")
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      tmp
    })

  /** n_nationkey values as a little-endian int64 binary file — the
    * `np.fromfile` shape. One small file here; the scale path is the
    * same chunked byte-range split the reference's parallel reader does
    * (`sdc/io/np_io.py:151 file_read_parallel`), which Spark's
    * binaryFile/Parquet sources already implement for real formats. */
  private def nationBin(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"bin:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_bin_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + ".i64"
      val keys = Tables(s, dir, "nation")
        .select(col("n_nationkey").cast("long"))
        .orderBy(col("n_nationkey"))
        .collect().map(_.getLong(0))  // 25 rows: driver-side fixture prep only
      val buf = ByteBuffer.allocate(keys.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      keys.foreach(buf.putLong)
      Files.write(Paths.get(tmp), buf.array())
      tmp
    })

  /** np.tofile sink, distributed: every partition packs its rows as
    * little-endian int64 and writes its own part file through the
    * Hadoop FileSystem API — `file://` here, HDFS/object store on a
    * cluster, with no driver collect and no single-file funnel (the
    * write twin of `np.fromfile`'s chunked parallel read,
    * `sdc/io/np_io.py:58-186`).
    *
    * Task-commit discipline: each attempt writes a hidden
    * attempt-tagged temp file and RENAMES it into place only if no
    * sibling attempt committed first — so retries and speculative
    * duplicates can never interleave bytes into one part or double a
    * part (rename is atomic on HDFS; the loser deletes its temp). The
    * readers' `part-*.i64` glob skips dot-temps by FS convention. */
  private[graft] def writeBinaryI64(df: DataFrame, outDir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    // fresh target: stale parts from an earlier run with a DIFFERENT
    // partition count would otherwise survive alongside the new layout
    // and duplicate data on read-back (mode("overwrite") semantics)
    val dirPath = new org.apache.hadoop.fs.Path(outDir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfs.delete(dirPath, true)
    dfs.mkdirs(dirPath)
    // tasks must resolve the SAME filesystem as the driver: ship the
    // driver's hadoopConfiguration (spark.hadoop.* overrides, object-store
    // credentials, HDFS nameservices) instead of a bare `new Configuration()`
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val written = df.select(col(df.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        if (!it.hasNext) Iterator.single(0L)
        else {
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(confBc.value.value)
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".part-$pid%05d.i64.attempt-${tc.taskAttemptId()}")
          val dst = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.i64")
          // stream each record straight to the (buffered) FS stream —
          // per-task heap stays O(1), not O(partition bytes)
          val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          var n = 0L
          try {
            while (it.hasNext) {
              buf.clear(); buf.putLong(it.next())
              out.write(buf.array()); n += 1
            }
          } finally out.close()
          if (!fs.rename(tmp, dst)) fs.delete(tmp, false)
          Iterator.single(n)
        }
      }
    // one tiny count aggregate forces the distributed write
    written.agg(sum(col("value"))).collect()
  }

  /** Round-trip fixture for `q_to_binary`: customer keys written once
    * per (kind, sfDir) per JVM via [[writeBinaryI64]]. */
  private def customerBinOut(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(s"binout:$dir", { _ =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_binout_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      writeBinaryI64(Tables(s, dir, "customer").select(col("c_custkey")), tmp)
      tmp
    })

  val queries: Map[String, Q] = Map(
    // read_csv with header + explicit schema (dtype)
    "q_read_csv" -> ((s, dir) => {
      s.read.option("header", "true").schema(nationSchema).csv(nationCsv(s, dir))
        .orderBy(col("n_nationkey"))
    }),

    // read_csv options matrix: sep='|', dtype (explicit schema),
    // usecols (projection — pruned into the scan), parse_dates
    // (to_date), skiprows=100 (positional skip = key filter here; a
    // byte-positional skip is meaningless on a distributed scan, and the
    // csv fixture is ordered by its dense key)
    "q_read_csv_options" -> ((s, dir) => {
      s.read.option("header", "true").option("sep", "|")
        .schema(ordersCsvSchema).csv(ordersCsv(s, dir))
        .select(col("o_orderkey"), col("o_totalprice"),
          to_date(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .filter(col("o_orderkey") >= 100)
        .orderBy(col("o_orderkey"))
    }),

    // read_csv(converters={...}) (`sdc/datatypes/hpat_pandas_functions
    // .py:101-363`, the one option of the reference's read_csv matrix not
    // covered by q_read_csv_options): a pandas converter receives the RAW
    // string field before dtype coercion. Spark-first spelling: read the
    // converted columns as strings and apply the converter as a codegen
    // column expression in the same projection — the conversion rides the
    // scan stage, no second pass. Converters exercised: price string →
    // integer cents (round-then-cast: DuckDB CAST rounds where Spark
    // truncates, so both sides round explicitly first), '<n>-<word>'
    // priority → word, date string → year int.
    "q_read_csv_converters" -> ((s, dir) => {
      val rawSchema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_totalprice", StringType),
        StructField("o_orderdate", StringType),
        StructField("o_orderpriority", StringType)))
      s.read.option("header", "true").option("sep", "|")
        .schema(rawSchema).csv(ordersCsv(s, dir))
        .select(col("o_orderkey"),
          round(col("o_totalprice").cast("double") * 100, 0).cast("long")
            .as("price_cents"),
          substring_index(col("o_orderpriority"), "-", -1).as("prio_word"),
          substring(col("o_orderdate"), 1, 4).cast("int").as("order_year"))
        .orderBy(col("o_orderkey"))
    }),

    // pd.DataFrame({...}) constructor: literal rows via createDataFrame,
    // then used as the broadcast side of a real join
    "q_create_dataframe" -> ((s, dir) => {
      val lit5 = s.createDataFrame(
        s.sparkContext.parallelize(Seq(
          Row(0, "AFRICA"), Row(1, "AMERICA"), Row(2, "ASIA"),
          Row(3, "EUROPE"), Row(4, "MIDDLE EAST"))),
        StructType(Seq(
          StructField("r_key", IntegerType, nullable = false),
          StructField("r_label", StringType, nullable = false))))
      Tables(s, dir, "nation")
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n_nations"))
        .join(broadcast(lit5), col("n_regionkey") === col("r_key"))
        .select(col("r_key"), col("r_label"), col("n_nations"))
        .orderBy(col("r_key"))
    }),

    // Sink round-trip: orders written `partitionBy(o_orderpriority)` to
    // parquet (the layout a 100 TB pipeline bakes in at ingest), read
    // back with an equality filter on the partition column — the scan
    // must list ONE directory (partition pruning; the spec asserts the
    // plan), then aggregate. Fixture written once per JVM.
    "q_sink_partitioned" -> ((s, dir) => {
      val path = ordersPartitioned(s, dir)
      s.read.parquet(path)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_urgent"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_custkey"))
    }),

    // read_csv robustness (pandas errors='coerce' at the FILE level /
    // Spark PERMISSIVE mode — the only mode that survives a 100 TB
    // ingest with a handful of mangled rows): typed schema over a CSV
    // with corrupted numeric cells → the bad CELL nulls, the row
    // survives. The aggregate proves both halves: corrupt rows still
    // counted, their values excluded from the sum.
    "q_read_csv_badrecords" -> ((s, dir) => {
      val path = customerCsvBad(s, dir)
      s.read.option("header", "true").option("mode", "PERMISSIVE")
        .schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
        .csv(path)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("c_acctbal")).as("n_parsed"),
          dsum(col("c_acctbal")).as("bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // Schema-evolution read (the lakehouse reality: files written
    // before and after a column was added live in one dataset):
    // mergeSchema unions the file footers at planning time, and rows
    // from pre-evolution files surface the added column as null. The
    // aggregate proves the null semantics (old rows count toward
    // n_total but not n_with_segment).
    "q_schema_merge" -> ((s, dir) => {
      val path = customerEvolved(s, dir)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_custkey")).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // df.to_csv round-trip: distributed multi-part CSV write, schema'd
    // read-back, aggregate — proves the write is lossless (doubles
    // round-trip via shortest-repr strings) and driver-free.
    "q_to_csv" -> ((s, dir) => {
      val path = customerCsvOut(s, dir)
      s.read.option("header", "true")
        .schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
        .csv(path)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // the spark.sql surface: the same engine (extensions included) is
    // reachable as ANSI SQL over registered views — a reference user's
    // SQL workflows port verbatim.
    "q_sql_api" -> ((s, dir) => {
      // view names carry the dir tag: concurrent builds for different
      // scale dirs in one session must not clobber each other's views
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, dir, "nation").createOrReplaceTempView(s"graft_nation_v_$tag")
      Tables(s, dir, "supplier").createOrReplaceTempView(s"graft_supplier_v_$tag")
      s.sql(s"""SELECT n_name, COUNT(*) AS n_supp,
               |  CAST(SUM(CAST(s_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS bal
               |FROM graft_supplier_v_$tag JOIN graft_nation_v_$tag
               |  ON s_nationkey = n_nationkey
               |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }),

    // JSON-lines source with explicit schema (no sampling-based
    // inference pass — one scan, not two)
    "q_read_json" -> ((s, dir) => {
      s.read.schema(nationSchema).json(nationJson(s, dir))
        .orderBy(col("n_nationkey"))
    }),

    // ORC source: filter + projection prune into the columnar scan,
    // exactly as with parquet
    "q_read_orc" -> ((s, dir) => {
      s.read.orc(supplierOrc(s, dir))
        .filter(col("s_acctbal") > 0)
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        .orderBy(col("s_suppkey"))
    }),

    // DYNAMIC partition pruning end to end (q_sink_partitioned covers
    // the STATIC case — a literal predicate on the partition column;
    // here the pruning values are only known at runtime, from a filter
    // on the dim side of a join). Spark broadcasts the filtered dim,
    // reuses the broadcast as a pruning subquery, and the fact scan
    // reads ONLY the two matching partition directories — at 100 TB
    // this is the difference between scanning 2/5 of the fact table
    // and all of it, with zero user-side hints. Plan pinned in
    // PlanShapeSpec (dynamicpruningexpression on the fact scan).
    "q_dpp_join" -> ((s, dir) => {
      val fact = s.read.parquet(ordersPartitioned(s, dir))
      val dim = s.read.parquet(priorityDim(s, dir))
      fact.join(dim, fact("o_orderpriority") === dim("prio"))
        .filter(col("tier") === "hot")
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("prio"))
    }),

    // XML source (parity-plus; built into Spark 4 — no external
    // package): schema-declared read over rowTag elements, filter +
    // projection exactly as with any other source. The oracle reads the
    // table the fixture was staged from — values must round-trip
    // bit-exactly through the XML text for the hash to match.
    "q_read_xml" -> ((s, dir) => {
      s.read.format("xml").option("rowTag", "customer")
        .schema(customerXmlSchema).load(customerXml(s, dir))
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Spark 4 VARIANT for semi-structured payloads (parity-plus): the
    // shape a metadata-bearing pipeline runs — JSON blobs parsed ONCE
    // into the binary VARIANT encoding, then typed `variant_get` path
    // extraction feeding a relational aggregate. Against 100 TB the
    // point of VARIANT over get_json_object is that parse cost is paid
    // once per row (not once per extracted path) and extraction is a
    // binary-offset lookup, not a re-tokenize. The JSON text here is
    // built from orders columns, so the oracle can aggregate the same
    // columns directly: round-trip exactness (shortest-round-trip
    // doubles through to_json) is precisely what's under test. Sum is
    // exact decimal (dsum) — order-free.
    "q_variant_extract" -> ((s, dir) => {
      // fanOut (r15): to_json + parse_json + three variant_gets are
      // real per-row CPU, and the small-SF orders file is one scan
      // split (5 tasks / 1.3 s single-core). No-op at scale; the
      // aggregate is count/max/exact-decimal-sum — order-free.
      val v = graft.operators.Parallelism.fanOut(Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice")))
        .select(parse_json(to_json(struct(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))).as("v"))
      v.select(
          expr("variant_get(v, '$.o_orderstatus', 'string')").as("status"),
          expr("variant_get(v, '$.o_orderkey', 'bigint')").as("okey"),
          expr("variant_get(v, '$.o_totalprice', 'double')").as("price"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), max(col("okey")).as("max_key"),
          dsum(col("price")).as("sum_price"))
        .orderBy(col("status"))
    }),

    // The reference's census-benchmark ETL shape end to end
    // (`benchmarks/census_benchmark.py:45-80`): usecols+dtype CSV read →
    // filter → z-score normalization. Moments come from ONE exact-decimal
    // aggregate broadcast back onto the rows — the normalize step is a
    // projection, and (x−μ)/σ is the identical IEEE op sequence on both
    // engines because μ and σ are exact-sum-derived doubles.
    "q_census_etl" -> ((s, dir) => {
      val src = s.read.option("header", "true").option("sep", "|")
        .schema(ordersCsvSchema).csv(ordersCsv(s, dir))
        .select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_totalprice") > 1000.0)
      val stats = src.agg(dmean(col("o_totalprice")).as("mu"),
        dstdSamp(col("o_totalprice")).as("sd"))
      src.crossJoin(broadcast(stats))
        .select(col("o_orderkey"),
          round((col("o_totalprice") - col("mu")) / col("sd"), 6).as("z"))
        .orderBy(col("o_orderkey"))
    }),

    // The reference's OTHER flagship example end to end — the NYSE
    // predict ETL (`examples/basic_usage_nyse_predict.py:37-60`):
    // symbol select → date-range window → Pearson corr of two price
    // columns → a compound arithmetic day filter → the shuffle=False
    // 80/20 POSITIONAL train/test split (which at scale is exactly the
    // two-pass global row number, never a single-partition sort) with
    // per-split means. corr rides the q_corr_cov exact-power-sum
    // recipe; split means are exact decimal sums; one row out.
    "q_nyse_etl" -> ((s, dir) => {
      val px = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .filter(col("l_shipdate") >= "1994-01-01" &&
          col("l_shipdate") <= "1994-12-31")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice").as("open"),
          col("l_quantity").as("close"), col("l_discount"))
      val x = col("open")
      val y = col("close")
      val corr = px.agg(count(lit(1)).cast("double").as("n"),
          dsum(x).as("sx"), dsum(y).as("sy"),
          sum((x * x).cast(DecimalType(38, 4))).cast("double").as("sxx"),
          sum((y * y).cast(DecimalType(34, 4))).cast("double").as("syy"),
          sum((x * y).cast(DecimalType(38, 4))).cast("double").as("sxy"))
        .select(col("n"),
          expr("""round((n*sxy - sx*sy) /
            (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)""")
            .as("corr_open_close"))
      val low2high = px
        .filter(col("open") <= y * 1000.0 && col("l_discount") >= 0.05)
        .agg(count(lit(1)).as("n_low2high"))
      val ranked = graft.operators.GlobalOrder.withRowNumberLong(px,
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
          "rk")
        .crossJoin(broadcast(px.agg(count(lit(1)).as("__n"))))
        .withColumn("__cut", expr("(__n * 8) div 10"))
      val split = ranked
        .groupBy((col("rk") <= col("__cut")).as("__train"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("close").cast(DecimalType(30, 2))).cast("double") /
            count(lit(1)), 6).as("mean_close"))
        .agg(
          sum(when(col("__train"), col("cnt"))).as("n_train"),
          sum(when(!col("__train"), col("cnt"))).as("n_test"),
          max(when(col("__train"), col("mean_close"))).as("train_mean_close"),
          max(when(!col("__train"), col("mean_close"))).as("test_mean_close"))
      corr.crossJoin(broadcast(low2high)).crossJoin(broadcast(split))
        .select(col("n").cast("long").as("n_rows"), col("corr_open_close"),
          col("n_low2high"), col("n_train"), col("n_test"),
          col("train_mean_close"), col("test_mean_close"))
    }),

    // np.tofile round-trip: distributed multi-part int64 sink, read
    // back through the binaryFile source + the same per-partition
    // decode as q_binary_source — the multiset of values must survive
    // the byte round-trip exactly (hash gate over ALL rows).
    "q_to_binary" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val path = customerBinOut(s, dir)
      s.read.format("binaryFile").load(s"$path/part-*.i64")
        .select(col("content"))
        .as[Array[Byte]]
        .flatMap { bytes =>
          val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          Iterator.continually(bb).takeWhile(_.remaining >= 8).map(_.getLong)
        }
        .toDF("v")
        .orderBy(col("v"))
    }),

    // np.fromfile: binaryFile source + per-partition int64 decode
    "q_binary_source" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val path = nationBin(s, dir)
      s.read.format("binaryFile").load(path)
        .select(col("content"))
        .as[Array[Byte]]
        .flatMap { bytes =>
          val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          Iterator.continually(bb).takeWhile(_.remaining >= 8).map(_.getLong)
        }
        .toDF("v")
        .orderBy(col("v"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_read_csv" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "q_read_csv_options" ->
      """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM orders WHERE o_orderkey >= 100
        |ORDER BY o_orderkey""".stripMargin,

    // the corruption rule replayed: every 7th custkey's balance nulls
    "q_read_csv_badrecords" ->
      """SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN c_custkey % 7 <> 0 THEN 1 END) AS n_parsed,
        |  CAST(SUM(CASE WHEN c_custkey % 7 <> 0
        |    THEN CAST(c_acctbal AS DECIMAL(30,2)) END) AS DOUBLE) AS bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // v1 generation replayed as the NULL-segment union branch
    "q_schema_merge" ->
      """WITH u AS (
        |  SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment
        |  FROM customer
        |  UNION ALL SELECT c_custkey, c_mktsegment FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n,
        |  COUNT(DISTINCT c_custkey) AS n_cust
        |FROM u GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_read_csv_converters" ->
      """SELECT o_orderkey,
        |  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
        |  split_part(o_orderpriority, '-', 2) AS prio_word,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_create_dataframe" ->
      """SELECT r_key, r_label, n_nations FROM (
        |  SELECT n_regionkey, COUNT(*) AS n_nations FROM nation GROUP BY n_regionkey) t
        |JOIN (VALUES (0,'AFRICA'),(1,'AMERICA'),(2,'ASIA'),
        |             (3,'EUROPE'),(4,'MIDDLE EAST')) AS r(r_key, r_label)
        |  ON n_regionkey = r_key
        |ORDER BY r_key""".stripMargin,

    "q_sink_partitioned" ->
      """SELECT o_custkey, COUNT(*) AS n_urgent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // the CSV round-trip is lossless, so the oracle aggregates the
    // original table
    "q_to_csv" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q_sql_api" ->
      """SELECT n_name, COUNT(*) AS n_supp,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_read_json" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "q_read_orc" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |WHERE s_acctbal > 0 ORDER BY s_suppkey""".stripMargin,

    "q_dpp_join" ->
      """SELECT o_orderpriority AS prio, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY prio""".stripMargin,

    "q_read_xml" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,

    "q_variant_extract" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
        |  MAX(o_orderkey) AS max_key,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,

    "q_census_etl" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_totalprice > 1000.0),
        |st AS (SELECT
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(o_totalprice) AS mu,
        |  SQRT((CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(32,4)))
        |          AS DOUBLE)
        |        - CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |          * CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |          / COUNT(o_totalprice))
        |       / (COUNT(o_totalprice) - 1.0)) AS sd
        |  FROM src)
        |SELECT o_orderkey, ROUND((o_totalprice - mu) / sd, 6) AS z
        |FROM src, st ORDER BY o_orderkey""".stripMargin,

    "q_binary_source" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation ORDER BY v""",

    // same exact-power-sum corr + positional 80/20 split
    "q_nyse_etl" ->
      """WITH px AS (SELECT l_orderkey, l_linenumber, l_partkey,
        |    l_extendedprice AS open, l_quantity AS close, l_discount
        |  FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_shipdate >= '1994-01-01'
        |    AND l_shipdate <= '1994-12-31'),
        |c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(open AS DECIMAL(30,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(close AS DECIMAL(30,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(open * open AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(close * close AS DECIMAL(34,4))) AS DOUBLE)
        |      AS syy,
        |    CAST(SUM(CAST(open * close AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        |  FROM px),
        |corr AS (SELECT n, ROUND((n*sxy - sx*sy) /
        |    (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)
        |    AS corr_open_close FROM c),
        |lh AS (SELECT COUNT(*) AS n_low2high FROM px
        |  WHERE open <= close * 1000.0 AND l_discount >= 0.05),
        |r AS (SELECT close, ROW_NUMBER() OVER (ORDER BY l_orderkey,
        |    l_linenumber, l_partkey) AS rk, COUNT(*) OVER () AS nn
        |  FROM px),
        |sp AS (SELECT rk <= (nn * 8) // 10 AS tr, COUNT(*) AS cnt,
        |    ROUND(CAST(SUM(CAST(close AS DECIMAL(30,2))) AS DOUBLE)
        |      / COUNT(*), 6) AS mean_close
        |  FROM r GROUP BY 1),
        |ss AS (SELECT
        |    CAST(SUM(CASE WHEN tr THEN cnt END) AS BIGINT) AS n_train,
        |    CAST(SUM(CASE WHEN NOT tr THEN cnt END) AS BIGINT) AS n_test,
        |    MAX(CASE WHEN tr THEN mean_close END) AS train_mean_close,
        |    MAX(CASE WHEN NOT tr THEN mean_close END) AS test_mean_close
        |  FROM sp)
        |SELECT CAST(n AS BIGINT) AS n_rows, corr_open_close, n_low2high,
        |  n_train, n_test, train_mean_close, test_mean_close
        |FROM corr, lh, ss""".stripMargin,

    // the written-then-reread key multiset must equal the source column
    "q_to_binary" ->
      """SELECT CAST(c_custkey AS BIGINT) AS v FROM customer ORDER BY v"""
  )
}
