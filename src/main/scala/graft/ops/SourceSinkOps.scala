package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans, sources and sinks (SURVEY.md §2.1, OP-01..OP-10). The reference's
  * REST/GraphQL/SQS/MySQL boundaries all become parquet-backed DataFrames;
  * what survives as operators is the *shape*: projected/filtered scans,
  * upsert merges, insert-if-absent, work-unit fan-out, response assembly,
  * cursor reads.
  */
object SourceSinkOps {

  private val dayEpoch = floor(unix_timestamp(col("ts")) / 86400L)

  /** OP-01 source scan with projection+filter pushdown — the per-epoch
    * validator-state scan (reference:
    * /root/reference/src/extract_handler.py:109-127). `.explain` shows
    * PushedFilters + a 3-column ReadSchema: at 100 TB only the needed
    * row-groups/columns are read.
    */
  def op01SourceScan(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), dayEpoch.as("epoch"), col("value").as("balance"))
      .orderBy("user_id", "epoch", "balance")

  /** OP-01b the SAME scan through the custom DataSourceV2
    * ([[graft.sources.EpochRangeSource]] — the REST range-extract shape):
    * the epoch range predicate pushes into the source's partition
    * PLANNING (pruned epochs are never generated, the analog of not
    * issuing the REST call), and the payload is deterministic, so DuckDB
    * replays it from generate_series. Upgrades the DSv2 contract from
    * spec-only to oracle-checked.
    */
  def op01bDsv2Scan(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.EpochRangeSource")
      .option("lo", 0).option("hi", 499).option("keysPerEpoch", 16)
      .load()
      .where(col("epoch") >= 100 && col("epoch") <= 163)
      .select(col("bls_key"), col("epoch"), round(col("balance"), 6).as("balance"))
      .orderBy("epoch", "bls_key")

  /** OP-01c the DSv2 scan in RECORDED-REPLAY mode (reference:
    * /root/reference/src/utils/archive.py:10-33 — the beacon REST fetch,
    * persisted): the same [[graft.sources.EpochRangeSource]] contract
    * (partition planning, epoch pushdown-as-pruning, column pruning) but
    * every row comes from PARSING a recorded JSON-lines archive, one line
    * per epoch with the upstream's validator payload. The fixture has
    * deliberate gaps (every 37th epoch missing) and a jitter term the
    * synthetic generator lacks, so the oracle (which replays the recorded
    * formula minus the gaps) only matches if the bytes really flow
    * file → parser → scan.
    */
  def op01cRestReplay(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.EpochFixture.ensure()
    spark.read.format("graft.sources.EpochRangeSource")
      .option("lo", 0).option("hi", 299)
      .option("epochsPerPartition", 25)
      .option("fixture", path)
      .load()
      .where(col("epoch") >= 40 && col("epoch") <= 260)
      .select(col("bls_key"), col("epoch"), round(col("balance"), 6).as("balance"))
      .orderBy("epoch", "bls_key")
  }

  /** OP-02 nested-JSON flatten: parse a JSON payload column into typed
    * fields (reference: /root/reference/src/utils/archive.py:19-33 —
    * execution-payload withdrawals[] JSON).
    */
  def op02JsonFlatten(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .withColumn("_p", from_json(col("props"), schema))
      .select(col("event_id"), col("user_id"), col("_p.k").as("k"))
      .orderBy("event_id")
  }

  /** OP-03 point lookup broadcast: the finalized-epoch scalar attached to
    * every key (reference: /root/reference/src/extract_handler.py:139-149).
    * A 1-row aggregate broadcast-joined — no shuffle of the big side.
    */
  def op03PointLookup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val finalized = ev.agg(max(dayEpoch).as("finalized_epoch"))
    ev.groupBy("user_id").agg(max(dayEpoch).as("user_epoch"))
      .crossJoin(broadcast(finalized))
      .select(col("user_id"), col("user_epoch"), col("finalized_epoch"),
        (col("finalized_epoch") - col("user_epoch")).as("epochs_behind"))
      .orderBy("user_id")
  }

  /** OP-04 dimension scan with filter/order/page-cap — the GraphQL entity
    * fetch shape, `first: 1000` (reference:
    * /root/reference/src/utils/subgraph.py:14-30).
    */
  def op04DimensionScan(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0.0)
      .orderBy(col("c_custkey").asc)
      .limit(1000)
      .select("c_custkey", "c_name", "c_acctbal")

  /** OP-04b PAGED dimension refresh — the `first: 1000` + id-cursor LOOP
    * the reference runs against every subgraph entity (reference:
    * /root/reference/src/utils/subgraph.py:17,35,91 — each page's last id
    * is the next page's cursor). Output is the page table (page id, row
    * count, first/last id = the cursor chain), proving the loop tiles the
    * dimension exactly. The global row_number is a deliberate
    * single-partition step over a DIMENSION (entity tables the reference
    * itself pages at 1000/request) — never applied to fact tables, same
    * defensible class as the serving-edge collect in pipe_top_indexes.
    */
  def op04bPagedDimension(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("c_custkey")
    Tables.customer(spark, dir)
      .select(col("c_custkey"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("page", floor((col("_rn") - 1) / 1000).cast("long"))
      .groupBy("page")
      .agg(count(lit(1)).as("page_rows"),
        min(col("c_custkey")).as("first_id"),
        max(col("c_custkey")).as("last_id"))
      .orderBy("page")
  }

  /** OP-05 full-table scan (the JDBC `SELECT *` analog,
    * reference: /root/reference/src/api_handler.py:19-23).
    */
  def op05FullScan(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
      .orderBy("n_nationkey")

  /** Per-process Derby database path — embedded Derby allows one JVM per
    * db directory, so concurrent sbt sessions must not contend — with a
    * shutdown hook deleting the directory on JVM exit (a long-lived box
    * would otherwise accumulate one db per Verify/Bench run).
    */
  private lazy val derbyDbPath: String = {
    sys.props.getOrElseUpdate("derby.system.home", sys.props("java.io.tmpdir"))
    // Shut the embedded engine down before the hook deletes its directory
    // (XJ015 "Derby system shutdown" is the documented success signal).
    ProcessTmp.dir("graft_derby", () => {
      try { java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true"); () }
      catch { case _: java.sql.SQLException => () }
    })
  }

  /** Publish the customer dimension to the per-process embedded Derby db
    * (the ONE definition of the URL/table/DDL — op05b and its spec both
    * run through here, so the spec cannot drift from the production
    * write path). Returns the (url, connection props) for the read side.
    */
  private[graft] def publishCustomerDim(
      spark: SparkSession, dir: String): (String, java.util.Properties) = {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val url = s"jdbc:derby:$derbyDbPath;create=true"
    Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .coalesce(2).write.mode("overwrite")
      .option("createTableColumnTypes",
        "c_name VARCHAR(64), c_mktsegment VARCHAR(32)")
      .jdbc(url, "customer_dim", props)
    (url, props)
  }

  /** OP-05b the LITERAL JDBC form of OP-05 (reference:
    * /root/reference/src/api_handler.py:19-23 — the MySQL boundary):
    * `df.write.jdbc` publishes the customer dimension to an embedded
    * Derby database, then `spark.read.jdbc` ingests it back as a
    * PARTITIONED parallel read (4 range slices on the key — the shape a
    * 1000-executor cluster uses against a sharded RDBMS) with the
    * `c_acctbal > 0` predicate pushed into each partition's WHERE
    * clause. The oracle reads the same rows straight from parquet, so
    * the check proves the round-trip is value-exact (BIGINT/DOUBLE/
    * VARCHAR). Sum is exact integer cents — double summation order
    * differs between a 4-partition JDBC scan and DuckDB.
    */
  def op05bJdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val bounds = src.agg(min("c_custkey"), max("c_custkey")).head
    val (url, props) = publishCustomerDim(spark, dir)
    spark.read
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", bounds.getLong(0).toString)
      .option("upperBound", (bounds.getLong(1) + 1).toString)
      .option("numPartitions", "4")
      .jdbc(url, "customer_dim", props)
      .filter(col("c_acctbal") > 0.0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(min(col("c_acctbal")), 6).as("min_bal"),
        round(max(col("c_acctbal")), 6).as("max_bal"),
        round(sum(round(col("c_acctbal") * 100).cast("long")) / 100.0, 6)
          .as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  /** OP-06 upsert sink (last-write-wins merge on PK): INSERT ... ON
    * DUPLICATE KEY UPDATE (reference:
    * /root/reference/src/utils/data_utils.py:10-15). Batch-precedence is
    * explicit (_batch desc) so re-runs are idempotent (SURVEY.md §7.5#6).
    */
  def op06UpsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        lit(1L).as("_batch"))
    val updates = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), lit("F").as("o_orderstatus"),
        round(col("o_totalprice") * 1.1, 6).as("o_totalprice"), lit(2L).as("_batch"))
    val w = Window.partitionBy("o_orderkey").orderBy(col("_batch").desc)
    base.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 6).as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** OP-07 insert-if-absent sink: INSERT IGNORE (reference:
    * /root/reference/src/validator_withdrawals_handler.py:21,107-108).
    * Existing rows win; only genuinely-new keys are appended.
    */
  def op07InsertIfAbsent(spark: SparkSession, dir: String): DataFrame = {
    val existing = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("nationkey"),
        lit("existing").as("origin")).distinct()
    val candidates = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        lit("inserted").as("origin")).distinct()
    val inserted = candidates.join(existing.select("nationkey"), Seq("nationkey"), "left_anti")
    existing.unionByName(inserted).orderBy("nationkey")
  }

  /** OP-08 queue fan-out: work units with sha256 dedup ids in chunks of 10
    * (reference: /root/reference/src/utils/sqs.py:6-32,
    * /root/reference/src/validator_income_handler.py:245-262). In Spark the
    * queue disappears into partitioning; the observable output is the
    * work-unit table itself.
    */
  def op08QueueFanout(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("user_id")
    Tables.events(spark, dir)
      .select("user_id").distinct()
      .withColumn("_rn", row_number().over(w).cast("long"))
      .select(
        col("user_id"),
        sha2(col("user_id").cast("string"), 256).as("msg_id"),
        floor((col("_rn") - 1) / 10).as("chunk"))
      .orderBy("user_id")
  }

  /** OP-09 HTTP JSON response assembly at the serving edge
    * (reference: /root/reference/src/api_handler.py:32-40). Byte-exact
    * construction via concat so the oracle matches.
    */
  def op09ResponseAssembly(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(round(avg(col("c_acctbal")), 6).as("avg_bal"), count(lit(1)).as("n"))
      .select(col("c_mktsegment"),
        concat(lit("{\"segment\":\""), col("c_mktsegment"),
          lit("\",\"avgBal\":"), col("avg_bal").cast("string"),
          lit(",\"n\":"), col("n").cast("string"), lit("}")).as("body"))
      .orderBy("c_mktsegment")

  /** OP-10 cursor file / incremental read: rows strictly after the stored
    * high-water mark (reference:
    * /root/reference/back-fillers/validator-balances-backfiller.py:137-141,
    * 177-183 — epoch.txt cursor).
    */
  def op10CursorRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cursor = ev.agg((max(dayEpoch) - lit(3L)).as("cursor"))
    ev.select(col("event_id"), col("user_id"), dayEpoch.as("epoch"))
      .crossJoin(broadcast(cursor))
      .filter(col("epoch") > col("cursor"))
      .select("event_id", "user_id", "epoch")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op01_source_scan" -> (op01SourceScan _),
    "op01b_dsv2_scan" -> (op01bDsv2Scan _),
    "op01c_rest_replay" -> (op01cRestReplay _),
    "op02_json_flatten" -> (op02JsonFlatten _),
    "op03_point_lookup" -> (op03PointLookup _),
    "op04_dimension_scan" -> (op04DimensionScan _),
    "op04b_paged_dimension" -> (op04bPagedDimension _),
    "op05_full_scan" -> (op05FullScan _),
    "op05b_jdbc_roundtrip" -> (op05bJdbcRoundtrip _),
    "op06_upsert_merge" -> (op06UpsertMerge _),
    "op07_insert_if_absent" -> (op07InsertIfAbsent _),
    "op08_queue_fanout" -> (op08QueueFanout _),
    "op09_response_assembly" -> (op09ResponseAssembly _),
    "op10_cursor_read" -> (op10CursorRead _))

  private val epochExpr = "CAST(floor(date_part('epoch', ts)/86400) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "op01_source_scan" ->
      s"""SELECT user_id, $epochExpr AS epoch, value AS balance
         |FROM events WHERE event_type = 'purchase'
         |ORDER BY user_id, epoch, balance""".stripMargin,
    "op01b_dsv2_scan" ->
      """SELECT printf('0x%04d', key) AS bls_key, epoch,
        |       round(32.0 + ((epoch * 31 + key * 7) % 1000) / 1000.0, 6) AS balance
        |FROM generate_series(100, 163) AS e(epoch),
        |     generate_series(0, 15) AS k(key)
        |ORDER BY epoch, bls_key""".stripMargin,
    // Replays EpochFixture.balance minus the recorded gaps (epoch % 37).
    "op01c_rest_replay" ->
      """SELECT printf('0x%04d', key) AS bls_key, epoch,
        |       round(32.0 + ((epoch * 31 + key * 7) % 1000) / 1000.0
        |             + ((epoch * 13 + key * 3) % 89) / 10000.0, 6) AS balance
        |FROM generate_series(40, 260) AS e(epoch),
        |     generate_series(0, 15) AS k(key)
        |WHERE epoch % 37 <> 0
        |ORDER BY epoch, bls_key""".stripMargin,
    "op02_json_flatten" ->
      """SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "op03_point_lookup" ->
      s"""WITH f AS (SELECT max($epochExpr) AS finalized_epoch FROM events),
         |u AS (SELECT user_id, max($epochExpr) AS user_epoch FROM events GROUP BY user_id)
         |SELECT user_id, user_epoch, finalized_epoch,
         |       finalized_epoch - user_epoch AS epochs_behind
         |FROM u CROSS JOIN f ORDER BY user_id""".stripMargin,
    "op04_dimension_scan" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 0.0 ORDER BY c_custkey ASC LIMIT 1000""".stripMargin,
    "op04b_paged_dimension" ->
      """WITH r AS (
        |  SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn
        |  FROM customer)
        |SELECT CAST(floor((rn - 1) / 1000) AS BIGINT) AS page,
        |       count(*) AS page_rows,
        |       min(c_custkey) AS first_id, max(c_custkey) AS last_id
        |FROM r GROUP BY 1 ORDER BY page""".stripMargin,
    "op05_full_scan" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "op05b_jdbc_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       round(min(c_acctbal), 6) AS min_bal,
        |       round(max(c_acctbal), 6) AS max_bal,
        |       round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 6) AS sum_bal
        |FROM customer WHERE c_acctbal > 0.0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "op06_upsert_merge" ->
      """WITH unioned AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS batch FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'F', round(o_totalprice * 1.1, 6), 2 FROM orders
        |  WHERE o_orderstatus = 'O'),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY batch DESC) AS rn
        |  FROM unioned)
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice, 6) AS o_totalprice
        |FROM r WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "op07_insert_if_absent" ->
      """WITH existing AS (
        |  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey, 'existing' AS origin
        |  FROM supplier),
        |candidates AS (
        |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey, 'inserted' AS origin
        |  FROM customer)
        |SELECT * FROM existing
        |UNION ALL
        |SELECT * FROM candidates c
        |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.nationkey = c.nationkey)
        |ORDER BY nationkey""".stripMargin,
    "op08_queue_fanout" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |r AS (SELECT user_id, row_number() OVER (ORDER BY user_id) AS rn FROM u)
        |SELECT user_id, sha256(CAST(user_id AS VARCHAR)) AS msg_id,
        |       CAST(floor((rn - 1) / 10) AS BIGINT) AS chunk
        |FROM r ORDER BY user_id""".stripMargin,
    "op09_response_assembly" ->
      """WITH g AS (
        |  SELECT c_mktsegment, round(avg(c_acctbal), 6) AS avg_bal, count(*) AS n
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_mktsegment,
        |       '{"segment":"' || c_mktsegment || '","avgBal":' ||
        |       CAST(avg_bal AS VARCHAR) || ',"n":' || CAST(n AS VARCHAR) || '}' AS body
        |FROM g ORDER BY c_mktsegment""".stripMargin,
    "op10_cursor_read" ->
      s"""WITH c AS (SELECT max($epochExpr) - 3 AS cursor FROM events)
         |SELECT event_id, user_id, $epochExpr AS epoch
         |FROM events CROSS JOIN c
         |WHERE $epochExpr > cursor ORDER BY event_id""".stripMargin)
}
