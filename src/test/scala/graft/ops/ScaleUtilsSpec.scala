package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Scale-path utilities: salting equivalence, merge-sink semantics, and
  * bucketed co-located joins (the no-shuffle proof).
  */
class ScaleUtilsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("salted sum equals direct sum") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy("user_id").agg(sum("value").as("sum"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val salted = Skew.saltedSum(ev, "user_id", "value")
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(direct.length == salted.length)
    direct.zip(salted).foreach { case ((k1, v1), (k2, v2)) =>
      assert(k1 == k2); assert(math.abs(v1 - v2) < 1e-6)
    }
  }

  test("salted count-distinct equals direct count-distinct") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy("user_id").agg(countDistinct("event_type").as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val salted = Skew.saltedCountDistinct(ev, "user_id", "event_type")
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(direct.toSeq == salted.toSeq)
  }

  test("salted join equals plain equi-join, including duplicate right keys") {
    import spark.implicits._
    val left = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    // Duplicate keys on the right exercise row multiplication.
    val right = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(sum("value").as("total"))
      .unionByName(Seq((1L, -1.0)).toDF("user_id", "total"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "value", "total")
        .collect().map(_.toSeq).sortBy(_.toString)
    val plain = canon(left.join(right, "user_id"))
    val salted = canon(Skew.saltedJoin(left, right, "user_id", salts = 8))
    assert(plain.length == salted.length && plain.nonEmpty)
    plain.zip(salted).foreach { case (p, s) => assert(p == s) }
  }

  test("upsert: updates win on key collision, base survives otherwise; idempotent") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val merged = MergeSink.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0)))
    // Re-applying the same updates changes nothing (idempotent).
    val again = MergeSink.upsert(MergeSink.upsert(base, updates, Seq("k")), updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(again.toSeq == merged.toSeq)
  }

  test("insertIfAbsent keeps existing rows and appends only new keys") {
    import spark.implicits._
    val base = Seq((1L, "keep"), (2L, "keep2")).toDF("k", "s")
    val updates = Seq((2L, "IGNORED"), (3L, "new")).toDF("k", "s")
    val out = MergeSink.insertIfAbsent(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "keep"), (2L, "keep2"), (3L, "new")))
  }

  test("writePartitioned overwrites only the partitions present in the batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pw").toString
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0)).toDF("k", "day", "v")
    MergeSink.writePartitioned(day1, dir, "day")
    // Re-run only day 2 with corrected data: day 1 must survive untouched.
    val day2fix = Seq((2L, "2024-01-02", 99.0)).toDF("k", "day", "v")
    MergeSink.writePartitioned(day2fix, dir, "day")
    // Partition-column type inference reads `day` back as DATE; cast for
    // a type-stable comparison.
    val out = spark.read.parquet(dir)
      .selectExpr("k", "CAST(day AS STRING) AS day", "v").orderBy("day")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("day"), r.getAs[Double]("v")))
    assert(out.toSeq == Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 99.0)))
  }

  test("write-audit-publish: audit veto leaves the live table untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wap_veto").toString
    MergeSink.publishPartitioned(
      Seq((1L, "d1", 1.0)).toDF("k", "day", "v"), dir, "day")
    intercept[RuntimeException] {
      MergeSink.publishPartitioned(
        Seq((2L, "d1", -99.0)).toDF("k", "day", "v"), dir, "day",
        audit = staged => require(
          staged.where(col("v") < 0).isEmpty, "negative values staged"))
    }
    val out = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("v")))
    assert(out.toSeq == Seq((1L, 1.0)), s"vetoed batch leaked: ${out.toSeq}")
    // and no staging/trash residue is visible to readers or on disk
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_staging")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(dir, "_staging")).isEmpty)
  }

  test("write-audit-publish: two racing writers never mix a partition") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("graft_wap_race").toString
    val perPart = 50
    def batch(writer: String, days: Seq[String]) =
      days.flatMap(d => (1 to perPart).map(i => (writer, d, i.toLong)))
        .toDF("writer", "day", "v")
    val start = new java.util.concurrent.CountDownLatch(1)
    def publish(writer: String, days: Seq[String]) = Future {
      val df = batch(writer, days)
      start.await()
      MergeSink.publishPartitioned(df, dir, "day")
    }
    // overlapping partition d2: exactly one writer's complete batch wins
    val fa = publish("A", Seq("d1", "d2"))
    val fb = publish("B", Seq("d2", "d3"))
    start.countDown()
    Await.result(fa.zip(fb), 120.seconds) // propagates either side's failure
    val out = spark.read.parquet(dir)
      .select(col("writer"), col("day").cast("string"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byDay = out.groupBy(_._2)
    assert(byDay.keySet == Set("d1", "d2", "d3"))
    assert(byDay("d1").forall(_._1 == "A") && byDay("d1").length == perPart)
    assert(byDay("d3").forall(_._1 == "B") && byDay("d3").length == perPart)
    val d2Writers = byDay("d2").map(_._1).distinct
    assert(d2Writers.length == 1,
      s"partition d2 mixes writers: ${d2Writers.toSeq}")
    assert(byDay("d2").length == perPart &&
      byDay("d2").map(_._3).sorted.toSeq == (1 to perPart).map(_.toLong),
      s"partition d2 is not one complete batch: ${byDay("d2").length} rows")
  }

  test("bucketed tables join without a shuffle exchange") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    ev.write.mode("overwrite").bucketBy(8, "user_id")
      .sortBy("user_id").saveAsTable("ev_bucketed_a")
    ev.groupBy("user_id").agg(sum("value").as("total"))
      .write.mode("overwrite").bucketBy(8, "user_id")
      .saveAsTable("ev_bucketed_b")
    val joined = spark.table("ev_bucketed_a")
      .join(spark.table("ev_bucketed_b"), "user_id")
    val n = joined.count()
    assert(n == ev.count()) // every event row matches its user's total
    val shuffles = collect(joined.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed join should be shuffle-free, found: ${shuffles.size}")
  }

  test("ops_bucketed_join: aggregations and join are exchange-free (only the presentation sort shuffles)") {
    // Force a sort-merge join: at spec scale both agg sides broadcast,
    // and a BroadcastHashJoin has no ShuffleExchangeExec either — the
    // co-location claim would be vacuous. With broadcast off, a bucketed
    //-layout regression WOULD surface as a hash exchange here.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "-1")
      val df = Skew.bucketedJoin(spark, sfDir)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan
      assert(collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.nonEmpty, "expected the forced sort-merge join")
      val exchanges = collect(plan) { case s: ShuffleExchangeExec => s }
      // ONE range exchange for the final orderBy is expected; the per-user
      // aggregations and the fact-join must ride the bucketed layout.
      assert(exchanges.size <= 1,
        s"expected only the orderBy exchange, found ${exchanges.size}")
      assert(exchanges.forall(
        _.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]),
        "the only exchange must be the presentation sort's range partitioning")
    } finally {
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // One hot key holding ~100x the median partition's data, with
    // thresholds lowered so the unit-scale skew is detected exactly the
    // way a 100 TB hot key would be.
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "20",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force sort-merge
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of the rows land on one key: the hot partition is ~100x the
      // median, far past factor 2 and the byte threshold.
      val left = (1 to 100000).map(i =>
        (if (i % 10 != 0) 0L else i.toLong % 997, s"payload_left_$i"))
        .toDF("k", "l")
      val right = (1 to 2000).map(i => (i.toLong % 997, s"r_$i")).toDF("k", "r")
      val joined = left.join(right, "k")
      // Execute THIS plan object (count()/write() would plan separate
      // QueryExecutions) so AQE finalizes the adaptive plan in place.
      joined.queryExecution.executedPlan.execute().count()
      val skewed = collect(joined.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty, "expected AQE to mark the join skew-split:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
