package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Sessionization + sampling semantics and plan-shape pins. */
class SessionOpsSpec extends SparkSpec {

  test("lag-based sessions match Spark's native session_window exactly") {
    val lagBased = SessionOps.nsSessionAgg(spark, sfDir)
      .select("user_id", "n_events", "start_us", "end_us", "total_value")
      .collect().map(_.toSeq).toSet
    val native = SessionOps.sessionWindowAgg(Tables.events(spark, sfDir))
      .select("user_id", "n_events", "start_us", "end_us", "total_value")
      .collect().map(_.toSeq).toSet
    assert(lagBased.nonEmpty, "no sessions produced")
    assert(lagBased == native,
      s"lag-based and session_window rollups diverge: " +
        s"only-lag=${(lagBased -- native).take(3)} only-native=${(native -- lagBased).take(3)}")
    // and sessions genuinely merge AND split on this data
    val rows = SessionOps.nsSessionAgg(spark, sfDir)
    assert(rows.where(col("n_events") > 1).count() > 0, "no multi-event session")
    assert(rows.groupBy("user_id").count().where(col("count") > 1).count() > 0,
      "no user with more than one session")
  }

  test("property: random series with exact-gap ties match a brute-force fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val gap = SessionOps.GapUs
    for (trial <- 1 to 3) {
      // increments draw from {exactly gap, gap±1, small, huge}: the tie
      // (exactly gap ⇒ MERGE) and both near-misses are always exercised
      val rows = (1L to 6L).flatMap { uid =>
        var t = 1700000000000000L + uid
        (0 until 40).map { _ =>
          t += (rnd.nextInt(5) match {
            case 0 => gap
            case 1 => gap - 1
            case 2 => gap + 1
            case 3 => rnd.nextLong(1000000L) + 1
            case _ => gap * 3
          })
          (uid, t, (rnd.nextInt(1000) + 1).toDouble / 4.0)
        }
      }
      val got = SessionOps.sessionize(rows.toDF("user_id", "tus", "value"))
        .collect().map(_.toSeq)
      // brute force: fold each user's sorted series, splitting at > gap
      val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
        val sorted = es.sortBy(_._2)
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          case (acc, e) =>
            if (e._2 - acc.last.last._2 > gap) acc :+ Vector(e)
            else acc.init :+ (acc.last :+ e)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          Seq[Any](uid, (i + 1).toLong, s.size.toLong, s.head._2, s.last._2,
            s.last._2 - s.head._2,
            BigDecimal(s.map(_._3).sum).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }.sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
      assert(got.toSeq == want,
        s"trial $trial: ${got.length} vs ${want.length} sessions")
    }
  }

  test("property: ordered funnel matches a brute-force per-session fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val gap = SessionOps.GapUs
    val types = Vector("view", "click", "purchase", "scroll")
    for (trial <- 1 to 3) {
      // event types are drawn independently of time, so out-of-order
      // prefixes (click before the first view, purchase before the first
      // qualifying click) occur constantly — the exact shape the old
      // session-wide-min semantics got wrong
      val rows = (1L to 8L).flatMap { uid =>
        var t = 1700000000000000L + uid
        (0 until 50).map { _ =>
          t += (if (rnd.nextInt(10) == 0) gap + 1 else rnd.nextLong(100000L) + 1)
          (uid, t, types(rnd.nextInt(types.size)))
        }
      }
      val got = SessionOps.funnel(rows.toDF("user_id", "tus", "event_type"))
        .collect().map(_.toSeq)
      val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
        val sorted = es.sortBy(_._2)
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          case (acc, e) =>
            if (e._2 - acc.last.last._2 > gap) acc :+ Vector(e)
            else acc.init :+ (acc.last :+ e)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          val tView = s.collectFirst { case (_, t, "view") => t }
          val tClick = tView.flatMap(v =>
            s.collectFirst { case (_, t, "click") if t > v => t })
          val tPurchase = tClick.flatMap(c =>
            s.collectFirst { case (_, t, "purchase") if t > c => t })
          Seq[Any](uid, (i + 1).toLong, s.size.toLong,
            tView.isDefined, tClick.isDefined, tPurchase.isDefined)
        }
      }.sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
      assert(got.toSeq == want, s"trial $trial funnel mismatch")
    }
  }

  test("funnel recovers from a click that precedes the first view") {
    import spark.implicits._
    val t0 = 1700000000000000L
    // click, view, click, purchase — old session-wide-min semantics said
    // step_click=false (min click < first view); ordered semantics say true
    val rows = Seq(
      (1L, t0, "click"), (1L, t0 + 10, "view"),
      (1L, t0 + 20, "click"), (1L, t0 + 30, "purchase"),
      // purchase lands between view and the qualifying click: no conversion
      (2L, t0, "view"), (2L, t0 + 5, "purchase"), (2L, t0 + 9, "click"))
    val got = SessionOps.funnel(rows.toDF("user_id", "tus", "event_type"))
      .select("user_id", "step_view", "step_click", "step_purchase")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, true, true, true), (2L, true, true, false)), got.toSeq)
  }

  test("funnel plan: still exactly one hash exchange (session windows reuse it)") {
    val nodes = noAqeNodes(SessionOps.nsSessionFunnel(spark, sfDir))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    val hash = shuffles.filterNot(
      _.outputPartitioning.toString.toLowerCase.contains("range"))
    assert(hash.size == 1 && hash.head.outputPartitioning.toString.contains("user_id"),
      s"funnel should reuse the single user_id exchange: " +
        s"${shuffles.map(_.outputPartitioning)}")
  }

  test("native session_window funnel matches the lag-based funnel") {
    val native = SessionOps.sessionWindowFunnel(Tables.events(spark, sfDir))
      .select("user_id", "start_us", "n_events",
        "step_view", "step_click", "step_purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    // session_window keys sessions by start time; re-number per user in
    // start order to compare against the lag form's ordinal session_id
    val got = native.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      rs.sortBy(_._2).zipWithIndex.map { case (r, i) =>
        Seq[Any](uid, (i + 1).toLong, r._3, r._4, r._5, r._6) }
    }.toSet
    val want = SessionOps.nsSessionFunnel(spark, sfDir).collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want,
      s"native vs lag funnel: only-native=${(got -- want).take(3)} " +
        s"only-lag=${(want -- got).take(3)}")
  }

  test("funnel steps are monotone and actually cascade on the fixture") {
    val rows = SessionOps.nsSessionFunnel(spark, sfDir).collect()
      .map(r => (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, c, p) =>
      assert(!(c && !v), "click step without view step")
      assert(!(p && !c), "purchase step without click step")
    }
    val (nv, nc, np) = (rows.count(_._1), rows.count(_._2), rows.count(_._3))
    assert(nv > nc && nc > np && np >= 0 && nv > 0,
      s"funnel not cascading: view=$nv click=$nc purchase=$np")
  }

  test("sessionization plan: ONE hash exchange feeds windows and the rollup") {
    val nodes = noAqeNodes(SessionOps.nsSessionAgg(spark, sfDir))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    val (range, hash) = shuffles.partition(
      _.outputPartitioning.toString.toLowerCase.contains("range"))
    // presentation sort = 1 range exchange; everything else — two window
    // functions AND the (user_id, session_id) aggregation — must share the
    // single hash exchange on user_id (grouping-key prefix reuse).
    assert(hash.size == 1,
      s"expected exactly one hash exchange, got ${hash.map(_.outputPartitioning)}; " +
        s"all nodes: ${nodes.map(_.nodeName)}")
    assert(hash.head.outputPartitioning.toString.contains("user_id"),
      s"hash exchange not keyed on user_id: ${hash.head.outputPartitioning}")
    assert(range.size <= 1, s"unexpected extra range exchanges: $range")
    // the same single-exchange claim must hold on the AQE final plan the
    // bench runs (stages materialized, real exchanges inside them)
    val aqeHash = aqeFinalNodes(SessionOps.nsSessionAgg(spark, sfDir))
      .collect { case e: ShuffleExchangeExec => e }
      .filterNot(_.outputPartitioning.toString.toLowerCase.contains("range"))
    assert(aqeHash.size == 1,
      s"AQE final plan: expected one hash exchange, got ${aqeHash.map(_.outputPartitioning)}")
  }

  test("hash-threshold sample is shuffle-free before the presentation sort") {
    val df = SamplingOps.nsCorpusSampleHash(spark, sfDir)
    val nodes = noAqeNodes(df)
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.forall(
      _.outputPartitioning.toString.toLowerCase.contains("range")),
      s"hash-threshold sample shuffles beyond the presentation sort: " +
        s"${shuffles.map(_.outputPartitioning)}")
    // the residue-class rate lands near 20% per stratum
    val total = Tables.documents(spark, sfDir).count().toDouble
    val kept = df.count().toDouble
    assert(kept / total > 0.1 && kept / total < 0.3,
      s"hash sample rate ${kept / total} implausibly far from 0.2")
  }

  test("exact stratified sample hits its per-language quota exactly") {
    val docs = Tables.documents(spark, sfDir)
    val quotas = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.2).toLong).toMap
    val got = SamplingOps.nsCorpusSampleExact(spark, sfDir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == quotas, s"per-lang sample counts $got != quotas $quotas")
  }
}
