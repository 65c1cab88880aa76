package graft

import org.apache.spark.sql.functions._

/** Contracts for the r16 ER additions: `mb_meta_blocking` (block purging +
  * CBS weighting + weighted-edge pruning) against a driver-side brute-force
  * recomputation, and `mb_link_waterfall` against the `mb_link_fuzzy` scores
  * it explains.
  */
class MetaBlockingSpec extends SparkSpec {

  test("mb_meta_blocking equals a driver-side brute-force recomputation") {
    val rows = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    // block keys, purge (2..256), CBS, WEP — the query's contract in plain Scala
    val keys = rows.flatMap { case (id, nat, seg, bal) =>
      Seq(s"seg:$seg", s"nat:$nat", s"blk:${id / 20}",
        s"bal:${math.floor(bal / 100).toLong}").map(bk => (id, bk))
    }
    val sizes = keys.groupBy(_._2).view.mapValues(_.size).toMap
    val kept = keys.filter { case (_, bk) => sizes(bk) >= 2 && sizes(bk) <= 256 }
    val byBlock = kept.groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    val cbs = byBlock.values.toSeq
      .flatMap(ids => for (a <- ids; b <- ids if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wSum = cbs.values.sum
    val nEdges = cbs.size.toLong
    val want = cbs.filter { case (_, w) => w * nEdges >= wSum }
      .map { case ((a, b), w) => (a, b, w) }.toSet
    val got = Registry.byName("mb_meta_blocking").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"meta-blocking diverges from brute force: got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "fixture must produce retained pairs")
    // WEP really pruned something (the mean threshold is not vacuous)
    assert(nEdges > want.size, "WEP must prune below-mean edges on this fixture")
  }

  test("mb_resolution_diff is a pure refinement census when v1 edges ⊆ v2") {
    val r = Registry.byName("mb_resolution_diff").fn(spark, sfDir).head()
    val (nodes, c1, c2, ident, stable, split, merged) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nodes > 0 && c1 >= c2,
      "dropping edges can only split clusters: v1 must have >= v2 clusters")
    assert(split == 0,
      "v1 edges ⊆ v2 edges ⇒ every v1 co-cluster pair survives in v2")
    assert(merged > 0, "the dropped-edge quarter must merge some pairs back")
    assert(ident <= c1 && ident <= c2)
    assert(stable >= 0)
  }

  test("mb_golden_record picks obey the survivorship rules per cluster") {
    import org.apache.spark.sql.functions._
    val golden = Registry.byName("mb_golden_record").fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toMap
    // independent member table: same components fixture, driver-side rules
    val comp = Registry.byName("mb_components").fn(spark, sfDir)
    val members = comp.join(
        Tables(spark, sfDir, "customer").select(
          col("c_custkey").cast("long").as("id"), col("c_name"),
          col("c_mktsegment"), graft.Num.cents(col("c_acctbal")).as("bc")),
        "id")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1)
    assert(golden.keySet == members.keySet)
    members.foreach { case (cid, ms) =>
      val (n, name, seg, bal) = golden(cid)
      assert(n == ms.size, s"$cid: member count")
      assert(name == ms.map(_._2).minBy(s => (-s.length, s)),
        s"$cid: longest-then-lex name pick")
      val mode = ms.groupBy(_._3).view.mapValues(_.size).toSeq
        .minBy { case (v, c) => (-c, v) }._1
      assert(seg == mode, s"$cid: mode-then-lex segment pick")
      assert(bal == ms.map(_._4).max, s"$cid: max balance")
    }
  }

  test("mb_link_waterfall steps reconcile with mb_link_fuzzy scores") {
    val wf = Registry.byName("mb_link_waterfall").fn(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))))
    val scores = Registry.byName("mb_link_fuzzy").fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val byPair = wf.groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    assert(byPair.keySet == scores.keySet,
      "waterfall must cover exactly the surviving fuzzy pairs")
    byPair.foreach { case (pair, steps) =>
      assert(steps.map(_._1).toSeq == Seq(1L, 2L), s"$pair: steps must be 1,2")
      assert(steps.map(_._2).toSeq == Seq("name", "segment"))
      // cumulative is the running literal sum; the last step IS the score
      assert(steps(0)._4 == steps(0)._5, s"$pair: first cum = first weight")
      assert(steps(0)._5 + steps(1)._4 == steps(1)._5, s"$pair: cum chains")
      assert(steps(1)._5 == scores(pair), s"$pair: last cum = match_weight")
    }
  }
}
