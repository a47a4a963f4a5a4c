package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}
import graft.streaming.StreamJoins

/** Round-8 widening: label propagation (lp1), weighted SSSP (sp1),
  * TextRank (tr1), Fellegi-Sunter record linkage (rl1), left-outer
  * stream-stream join (st16).
  */
class Round8WideningSpec extends SparkSpec {

  // ---- lp1 label propagation -------------------------------------

  test("lp1: community sizes partition the node set and ranking is deterministic") {
    val rows = Graph.labelPropagation(spark, sf).collect()
    assert(rows.nonEmpty)
    val sizes = rows.map(_.getAs[Long]("n_nodes"))
    assert(sizes.toSeq == sizes.sortBy(-_).toSeq, "not ordered by size desc")
    // node count of the trade graph bounds the sum of community sizes
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val nNodes = pairs.select(col("src")).unionAll(pairs.select(col("dst")))
      .distinct().count()
    assert(sizes.sum <= nNodes)
    // labels are valid packed node ids
    rows.foreach(r => assert(r.getAs[Long]("community") >= 0))
    // two runs agree bit-for-bit (deterministic tie-break)
    val again = Graph.labelPropagation(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("lp1: labels never cross disjoint components (synthetic bicliques)") {
    import spark.implicits._
    // Two disjoint bicliques K2,2: customers {1,2}x suppliers {1,2}
    // and customers {10,11} x suppliers {10,11}; packed ids are
    // cust->2k, supp->2k+1. Synchronous LPA with min-tie-break
    // oscillates WITHIN a biclique (side-swapped labels), but labels
    // can never leak across components: each component of 4 nodes
    // yields communities labeled only by its own packed ids.
    val dir = tmpDir("lp1_")
    val orders = for ((c, o) <- Seq((1L, 1L), (2L, 2L), (10L, 3L), (11L, 4L)))
      yield (o, c)
    orders.toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    val lines = Seq( // each order trades with BOTH its component's suppliers
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 10L), (3L, 11L), (4L, 10L), (4L, 11L))
    lines.toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    val rows = Graph.labelPropagation(spark, dir).collect()
    val compA = Set(2L, 4L, 3L, 5L) // packed ids of component 1
    val compB = Set(20L, 22L, 21L, 23L)
    val bySize = rows.map(r => (r.getAs[Long]("community"), r.getAs[Long]("n_nodes")))
    assert(bySize.map(_._2).sum == 8, s"nodes lost: $bySize")
    bySize.foreach { case (label, n) =>
      assert(compA.contains(label) || compB.contains(label), s"alien label $label")
      assert(n <= 4, s"community $label spans components: $n nodes")
    }
  }

  // ---- sp1 weighted shortest paths -------------------------------

  test("sp1: distances positive, ascending, and stable at the 1-hop minimum") {
    val rows = Graph.cheapestRoutes(spark, sf).collect()
    assert(rows.nonEmpty)
    val d = rows.map(_.getAs[Long]("dist_cents"))
    assert(d.forall(_ > 0))
    assert(d.toSeq == d.sorted.toSeq, "not ascending")
    rows.foreach { r =>
      val n = r.getAs[String]("node")
      assert(n.head == 'c' || n.head == 's', s"bad node id $n")
    }
    // positive weights: extra relaxation rounds can only reach MORE
    // nodes, never lower the global minimum (a 1-hop seed edge)
    val r1 = Graph.cheapestRoutes(spark, sf, rounds = 1).collect()
    assert(r1.nonEmpty && r1.head.getAs[Long]("dist_cents") == d.head)
    // the overall nearest node is a supplier: paths alternate sides,
    // so the cheapest nonzero distance is one seed→supplier edge
    assert(rows.head.getAs[String]("node").head == 's')
  }

  // ---- tr1 TextRank ----------------------------------------------

  test("tr1: rank mass conserved and ordering strict") {
    val top = Graph.textRankKeywords(spark, sf).collect()
    assert(top.nonEmpty)
    val prs = top.map(_.getAs[Double]("pr"))
    assert(prs.forall(_ > 0))
    assert(prs.toSeq == prs.sortBy(-_).toSeq)
    // symmetric edges → every node has out-weight → mass ~ 1
    val all = Graph.textRankKeywords(spark, sf, k = Int.MaxValue)
    val total = all.agg(sum(col("pr"))).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass drifted: $total")
  }

  // ---- rl1 Fellegi-Sunter ----------------------------------------

  test("rl1: scores are exactly the 8 possible agreement-pattern sums") {
    val rows = Dedup.recordLinkage(spark, sf).collect()
    assert(rows.length == 20)
    val legal = (for {
      a1 <- Seq(true, false); a2 <- Seq(true, false); a3 <- Seq(true, false)
    } yield {
      val su = (if (a1) 492476L else -1504077L) +
        (if (a2) 1763589L else -1076139L) +
        (if (a3) 3601868L else -783394L)
      (Seq(a1, a2, a3).count(identity), math.rint(su / 1e6 * 1e6) / 1e6)
    }).toSet
    rows.foreach { r =>
      val pat = (r.getAs[Int]("n_agree"), r.getAs[Double]("score"))
      assert(legal.exists(l => l._1 == pat._1 && math.abs(l._2 - pat._2) < 1e-9),
        s"illegal (n_agree, score): $pat")
    }
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.toSeq == scores.sortBy(-_).toSeq, "not ordered by score desc")
  }

  // ---- fi2 apriori triples ---------------------------------------

  test("fi2: apriori-pruned triples equal the naive enumeration") {
    val pruned = operators.Relational.frequentItemTriples(spark, sf)
      .collect().map(_.toSeq).toSeq
    val i = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val naive = i.as("a")
      .join(i.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .join(i.as("c"), col("b.l_orderkey") === col("c.l_orderkey")
        && col("b.l_partkey") < col("c.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"),
        col("c.l_partkey").as("part_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .orderBy(desc("support"), col("part_a"), col("part_b"), col("part_c"))
      .collect().map(_.toSeq).toSeq
    assert(pruned == naive, "downward-closure equivalence violated")
    assert(pruned.nonEmpty)
  }

  // ---- q7 / q14 TPC-H shapes -------------------------------------

  test("q7: bi-nation volume excludes intra-nation trade and covers both directions") {
    // NATION_18/19 trade in both directions at the test SF (the gated
    // NATION_1/2 default only has cross-trade from sf0.01 up).
    val rows = operators.Relational
      .nationTradeVolume(spark, sf, "NATION_18", "NATION_19").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
      assert(r.getAs[Double]("revenue") > 0)
    }
    val dirs = rows.map(r =>
      (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    assert(dirs.size == 2, s"expected both directions, got $dirs")
  }

  test("q14: promo share bounded in [0,100] per month, months ordered") {
    val rows = operators.Relational.promoRevenueShare(spark, sf).collect()
    assert(rows.nonEmpty)
    val months = rows.map(_.getAs[String]("ship_month"))
    assert(months.toSeq == months.sorted.toSeq)
    rows.foreach { r =>
      val s = r.getAs[Double]("promo_share")
      assert(s >= 0 && s <= 100, s"share out of range: $s")
    }
  }

  // ---- tt8 clustered optimize ------------------------------------

  test("tt8: z-order optimize yields per-bucket zones that prune range reads, and vacuum spares nested bucket dirs") {
    import spark.implicits._
    val root = tmpDir("tt8spec_") + "/t"
    val t = new sources.TxTable(root)
    // 3 time-sliced appends, each spanning the full key range 0..999
    (0 until 3).foreach { i =>
      t.append((0L until 1000L).filter(_ % 3 == i)
        .map(k => (k, k % 1000, k * 7)).toDF("k", "cust", "cents"))
    }
    // Pre-optimize: appends carried no stats → a range read must open
    // every commit dir.
    assert(t.resolveDirsRange("cust", 100, 150).size == 3)
    val preSnap = t.snapshot(spark).orderBy("k").collect().map(_.toSeq).toSeq

    val zval = operators.Ingest.mortonZval(
      operators.Ingest.zorderCell(col("cust"), 0, 999),
      operators.Ingest.zorderCell(col("cents"), 0, 999 * 7))
    val v = t.optimizeClustered(spark, zval, "cust", nBuckets = 8)
    assert(v == 4)

    // Lossless rewrite, zone-pruned range read correct AND pruned.
    val postSnap = t.snapshot(spark).orderBy("k").collect().map(_.toSeq).toSeq
    assert(postSnap == preSnap)
    val pruned = t.resolveDirsRange("cust", 100, 150)
    assert(pruned.size < 8, s"no pruning: ${pruned.size} dirs")
    val got = t.snapshotRange(spark, "cust", 100, 150)
      .orderBy("k").collect().map(_.getAs[Long]("k")).toSeq
    assert(got == (100L to 150L).toSeq)

    // Vacuum must NOT mistake the bucket PARENT for an orphan: the
    // manifests reference nested __zb subdirs, and only the parent is
    // a dataDir child. (The three retired commit dirs stay referenced
    // by the historical append manifests — time travel — so a full
    // vacuum here deletes nothing at all.)
    val deleted = t.vacuum(0)
    assert(deleted.isEmpty, s"vacuum deleted live data: $deleted")
    val postVacuum = t.snapshot(spark).orderBy("k").collect().map(_.toSeq).toSeq
    assert(postVacuum == preSnap, "vacuum broke the clustered snapshot")
  }

  // ---- tt9 restore / tt10 shallow clone --------------------------

  test("tt9: restore promotes v1 back to head with zero copy; the incident stays readable") {
    import spark.implicits._
    val t = new sources.TxTable(tmpDir("tt9spec_") + "/t")
    t.append((0L until 100L).map(k => (k, k * 3)).toDF("k", "cents"))
    t.overwrite((0L until 100L).filter(_ % 2 == 0)
      .map(k => (k, k * 3)).toDF("k", "cents"))
    val v3 = t.restore(1)
    assert(v3 == 3)
    assert(t.snapshot(spark).count() == 100)
    assert(t.snapshot(spark, Some(2)).count() == 50) // audit trail intact
    // restore wrote no data: v3's dirs are exactly v1's
    assert(t.resolveDirs(Some(3)).toSet == t.resolveDirs(Some(1)).toSet)
  }

  test("tt10: shallow clone is zero-copy, inherits zones, and diverges independently") {
    import spark.implicits._
    val base = tmpDir("tt10spec_")
    val t = new sources.TxTable(s"$base/src")
    t.appendWithStats((0L until 500L).map(k => (k, k)).toDF("k", "cust"), "cust")
    t.appendWithStats((500L until 1000L).map(k => (k, k)).toDF("k", "cust"), "cust")
    val c = t.shallowCloneTo(s"$base/clone")
    // zero-copy: the clone has no data dir of its own yet
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$base/clone/data")) ||
      java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$base/clone/data")).count() == 0)
    assert(c.snapshot(spark).count() == 1000)
    // zones carried over: a low-range read opens ONE borrowed dir
    assert(c.resolveDirsRange("cust", 0, 10).size == 1)
    // divergence: clone grows, source frozen
    c.append(Seq((9999L, 9999L)).toDF("k", "cust"))
    assert(c.snapshot(spark).count() == 1001)
    assert(t.snapshot(spark).count() == 1000)
    // the clone's vacuum never touches borrowed source dirs
    assert(c.vacuum(0).isEmpty)
    assert(t.snapshot(spark).count() == 1000)
    assert(c.snapshot(spark).count() == 1001)
  }

  // ---- st17 space-saving heavy hitters ---------------------------

  test("st17: exact-by-capacity path equals the batch top-k") {
    val sketch = streaming.SpaceSaving.topUsersGate(spark, sf)
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(desc("n"), asc("user_id"))
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("event_type"), col("rank"), col("user_id"),
        col("n").as("est_count"), lit(0L).as("max_err"))
      .orderBy(col("event_type"), col("rank"))
      .collect().map(_.toSeq).toSeq
    assert(sketch == batch)
    assert(sketch.nonEmpty)
  }

  test("st17: eviction path keeps the space-saving guarantees at cap 2") {
    import streaming.SpaceSaving._
    // Sequence: a,a,a,b,c — c evicts b (min counter), inheriting
    // est=2/err=1; the majority item a must survive with exact count.
    val evs = Seq(
      SsEv("t", 1L, 1, 1, flush = false), SsEv("t", 1L, 2, 2, flush = false),
      SsEv("t", 1L, 3, 3, flush = false), SsEv("t", 2L, 4, 4, flush = false),
      SsEv("t", 3L, 5, 5, flush = false), SsEv("t", -1L, 6, 6, flush = true))
    val state = org.apache.spark.sql.streaming.TestGroupState.create[SsState](
      org.apache.spark.api.java.Optional.empty[SsState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L,
      org.apache.spark.api.java.Optional.empty[java.lang.Long]()
        .asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
    val rows = updateType(cap = 2, k = 5)("t", evs.iterator, state).toSeq
    val byUser = rows.map(r => r.user_id -> r).toMap
    assert(byUser.contains(1L), "majority item evicted")
    assert(byUser(1L).est_count == 3 && byUser(1L).max_err == 0)
    assert(byUser.contains(3L) && !byUser.contains(2L))
    // over-estimate bounds: true(c)=1 <= est=2 <= true + err = 1+1
    assert(byUser(3L).est_count == 2 && byUser(3L).max_err == 1)
    // flush cleared state
    assert(!state.exists)
  }

  // ---- c6 entity resolution capstone -----------------------------

  test("c6: clusters partition the entity set and members sum consistently") {
    val rows = operators.Curation.entityResolution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_customers") + r.getAs[Long]("n_suppliers")
        == r.getAs[Long]("n_members"))
    }
    val sizes = rows.map(_.getAs[Long]("n_members"))
    assert(sizes.toSeq == sizes.sortBy(-_).toSeq)
    // deterministic rerun
    val again = operators.Curation.entityResolution(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("c6: synthetic block resolves two customers + one supplier into one golden cluster") {
    import spark.implicits._
    val dir = tmpDir("c6_")
    // nation 0: custkeys 1,2 and suppkey 1 all share sign + $1000 band
    // + $10 band (n_agree=3); nation 1: custkey 3 alone (singleton).
    Seq((1L, 0, 500.00), (2L, 0, 500.40), (3L, 1, -90.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 0, 500.20), (2L, 1, 999999.0))
      .toDF("s_suppkey", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    val rows = operators.Curation.entityResolution(spark, dir).collect()
    val bySize = rows.map(r => (r.getAs[Long]("cluster_rep"),
      r.getAs[Long]("n_members"), r.getAs[Long]("max_bal_cents")))
    // cluster {c1(id2), c2(id4), s1(id3)} -> rep = 2, members 3,
    // golden balance = 50040 cents; two singletons (c3 id6, s2 id5)
    assert(bySize.head == ((2L, 3L, 50040L)), s"got ${bySize.toSeq}")
    assert(rows.length == 3)
    assert(rows.count(_.getAs[Long]("n_members") == 1L) == 2)
  }

  // ---- st16 left-outer stream-stream join ------------------------

  test("st16: streaming left-outer equals the batch left range join") {
    val streamed = StreamJoins.attributionOuterGate(spark, sf)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val batch = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        col("value").as("amount"))
      .join(clicks,
        col("user_id") === col("c_user")
          && col("c_ts") <= col("ts")
          && col("c_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("purchase_id"), col("user_id"), col("click_id"), col("amount"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(streamed.length == batch.length,
      s"row counts differ: streamed ${streamed.length} vs batch ${batch.length}")
    assert(streamed.toSeq == batch.toSeq)
    // and it strictly extends the inner join with null-click rows
    assert(streamed.exists(r => r(2) == null), "no unmatched purchases emitted")
  }
}
