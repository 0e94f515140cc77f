package graft

/** Standing physical-plan contracts over the registered §2 operator
  * queries — the properties PLANS.md documents per-round (no cartesian
  * products, filters pushed to the parquet scan, dimension joins
  * broadcast, scans column-pruned), encoded as a test gate so a plan
  * regression fails CI instead of waiting for the next plan audit.
  *
  * Scope: the `op*` family (pure reads over the driver fixtures — cheap
  * to PLAN; a plan walk does not execute the query). The ns_ and pipe_
  * families carry their own per-family plan pins (bucket-cap specs, the
  * components no-self-join pin, DSv2 pushdown contract) — this suite is
  * the broad floor under the §2 surface.
  */
class PlanContractSpec extends SparkSpec {

  private def opQueries: Seq[(String, org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.toSeq.filter(_._1.startsWith("op")).sortBy(_._1)
      .map { case (name, fn) => (name, fn(spark, sfDir)) }

  private def scanNodes(df: org.apache.spark.sql.DataFrame) =
    collectAllPlans(df.queryExecution.executedPlan)
      .filter(_.nodeName.toLowerCase.startsWith("scan"))

  test("no §2 operator plans a cartesian product; nested-loop joins only where declared") {
    // The declared nested-loop sites: broadcast-TINY one-row frames joined
    // without keys (a scalar cursor / global stat attached to every row).
    // Pinned as set EQUALITY: a new unkeyed join fails, and so does a
    // stale entry here after a query stops needing its nested loop.
    val declaredBnlj = Set("op03_point_lookup", "op10_cursor_read")
    val bnlj = scala.collection.mutable.Set[String]()
    opQueries.foreach { case (name, df) =>
      val nodes = collectAllPlans(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
        s"$name plans a CartesianProduct")
      if (nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")))
        bnlj += name
    }
    assert(bnlj.toSet == declaredBnlj,
      s"nested-loop joins drifted from the declared set: planned=$bnlj")
  }

  test("filter operators push their predicates into the parquet scan") {
    // One representative per predicate family: IN-list/equality (op12),
    // range (op13), date equality (op14). The pin is on the SCAN node:
    // a filter evaluated post-scan reads every row group at 100 TB.
    Seq("op12_in_filter", "op13_range_filter", "op14_date_eq_filter")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val scans = scanNodes(df).map(_.toString)
        assert(scans.nonEmpty, s"$name: no scan node found")
        assert(scans.exists(s => s.contains("PushedFilters: [")
            && !s.contains("PushedFilters: []")),
          s"$name: no pushed filters on any scan:\n${scans.mkString("\n")}")
      }
  }

  test("projection operators prune the scan to the referenced columns") {
    // op11 selects 4 of lineitem's 16 columns; the scan must read only
    // those (ReadSchema pruning — a full-width scan reads 4x the bytes).
    val df = SparkEntry.queries("op11_project_rename")(spark, sfDir)
    val lineitemScans = scanNodes(df)
      .filter(_.toString.contains("lineitem"))
    assert(lineitemScans.nonEmpty, "op11: no lineitem scan found")
    lineitemScans.foreach { s =>
      val cols = s.output.map(_.name).toSet
      assert(cols == Set("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_returnflag"),
        s"op11 scan not pruned to the 4 referenced columns: $cols")
    }
  }

  test("dimension joins broadcast the small side") {
    Seq("op17_broadcast_semi_join", "op24_broadcast_enrich").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val nodes = collectAllPlans(df.queryExecution.executedPlan)
      assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
        s"$name: expected a BroadcastHashJoin, got:\n${
          nodes.map(_.nodeName).distinct.mkString(", ")}")
      assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")),
        s"$name: dimension join fell back to SortMergeJoin")
    }
  }
}
