package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-15 interleaved A/B probe (same discipline as [[R14Probe]]):
  * OLD vs NEW shapes alternate in one JVM so both sample the same
  * contention epoch. Shapes probed this round:
  *
  *  - fi2 triple assembly: r14 in-row nested transform×filter over
  *    each basket's frequent-pair array vs r15 per-(basket, mid item)
  *    grouped hash-join probe.
  *  - aa1 scoring join: r14 streamed-side weights (wts_u rides every
  *    edge row through the second exchange) vs r15 build-side weights
  *    (wts_v arrives on the node-cardinality build).
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("R15_REPS", "5").toInt

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.operators.Ranks.releaseAll()
    }

    def ab(name: String, a: () => Unit, b: () => Unit): Unit = {
      clear(); a(); clear(); b() // warm both
      val ta = collection.mutable.ArrayBuffer.empty[Double]
      val tb = collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to reps) {
        clear()
        val t0 = System.nanoTime(); a(); ta += (System.nanoTime() - t0) / 1e9
        clear()
        val t1 = System.nanoTime(); b(); tb += (System.nanoTime() - t1) / 1e9
      }
      def stats(ts: Seq[Double]) = {
        val s = ts.sorted; f"med=${s(s.length / 2)}%.2f min=${s.head}%.2f"
      }
      println(s"AB $name OLD ${stats(ta.toSeq)}  NEW ${stats(tb.toSeq)}")
    }

    // ---- fi2: OLD r14 in-row triple assembly, verbatim ----
    def items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    def basketPairsOld(its: DataFrame, cap: Int): DataFrame =
      its.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps0"))
        .select(col("l_orderkey").as("o"), slice(col("ps0"), 1, cap).as("ps"))
        .select(col("o"), explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + lit(2),
              greatest(size(col("ps")) - i - 1, lit(0))),
            y => struct(x.as("pa"), y.as("pb")))))).as("e"))
        .select(col("o"), col("e.pa").as("pa"), col("e.pb").as("pb"))
    def fi2Old(): Unit = {
      val p = basketPairsOld(items, 64)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val l2 = broadcast(p.groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select(col("pa"), col("pb")))
      val pf = p.join(l2, Seq("pa", "pb"), "left_semi")
      val cand = pf
        .groupBy(col("o"))
        .agg(sort_array(collect_list(struct(col("pa"), col("pb")))).as("fp"))
        .select(col("o"), explode(flatten(transform(col("fp"), x =>
          transform(
            filter(col("fp"), y => y.getField("pa") === x.getField("pb")),
            y => struct(x.getField("pa").as("part_a"),
              x.getField("pb").as("part_b"),
              y.getField("pb").as("part_c")))))).as("t"))
        .select(col("t.part_a").as("part_a"), col("t.part_b").as("part_b"),
          col("t.part_c").as("part_c"))
        .join(l2.select(col("pa").as("part_a"), col("pb").as("part_c")),
          Seq("part_a", "part_c"), "left_semi")
      val out = cand.groupBy(col("part_a"), col("part_b"), col("part_c"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(desc("support"), col("part_a"), col("part_b"), col("part_c"))
      out.collect()
      p.unpersist()
    }
    def fi2New(): Unit = {
      graft.operators.Relational.frequentItemTriplesFrom(spark, items, 2, 64)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- aa1 scoring: OLD streamed wts_u vs NEW build-side wts_v ----
    def aa1With(buildSideWeights: Boolean): Unit = {
      val e = graft.operators.Graph.copurchaseEdges(spark, sf)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val und = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
        .repartition(col("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val adj = und
        .join(broadcast(deg), col("b") === col("node"))
        .select(col("a"), struct(col("b"),
          when(col("d") >= 2,
            round(lit(1e12) / log(col("d").cast("double"))).cast("long"))
            .otherwise(lit(0L)).as("w")).as("nw"))
        .groupBy(col("a"))
        .agg(sort_array(collect_list(col("nw"))).as("arr"))
        .select(col("a"),
          transform(col("arr"), x => x.getField("b")).as("nbrs"),
          transform(col("arr"), x => x.getField("w")).as("wts"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val scored =
        if (buildSideWeights) e
          .join(adj.select(col("a").as("u2"), col("nbrs").as("nbrs_u"))
            .hint("shuffle_hash"), col("u") === col("u2"))
          .join(adj.select(col("a").as("v2"), col("nbrs").as("nbrs_v"),
            col("wts").as("wts_v")).hint("shuffle_hash"), col("v") === col("v2"))
          .select(col("u"), col("v"),
            graft.functions.SortedIntersectExpr
              .sortedIntersectCount(col("nbrs_u"), col("nbrs_v")).as("n_common"),
            graft.functions.SortedIntersectExpr
              .sortedIntersectWeightSum(col("nbrs_v"), col("nbrs_u"), col("wts_v"))
              .as("aa_scaled"))
        else e
          .join(adj.select(col("a").as("u2"), col("nbrs").as("nbrs_u"),
            col("wts").as("wts_u")).hint("shuffle_hash"), col("u") === col("u2"))
          .join(adj.select(col("a").as("v2"), col("nbrs").as("nbrs_v"))
            .hint("shuffle_hash"), col("v") === col("v2"))
          .select(col("u"), col("v"),
            graft.functions.SortedIntersectExpr
              .sortedIntersectCount(col("nbrs_u"), col("nbrs_v")).as("n_common"),
            graft.functions.SortedIntersectExpr
              .sortedIntersectWeightSum(col("nbrs_u"), col("nbrs_v"), col("wts_u"))
              .as("aa_scaled"))
      scored
        .filter(col("n_common") > 0)
        .orderBy(desc("aa_scaled"), asc("u"), asc("v"))
        .limit(25)
        .select(col("u"), col("v"), col("n_common"),
          round(col("aa_scaled").cast("double") / lit(1e12), 6).as("aa_score"))
        .collect()
      e.unpersist(); adj.unpersist(); deg.unpersist(); und.unpersist()
    }

    // ---- kc1: EAGER per-round checkpoint (r12-adjudicated shape: the
    // counter's degree union scans the round frame twice, so a lazy
    // checkpoint risks computing the semi-join lineage twice) vs LAZY
    // (one job per round; the union branches race per partition but
    // the shuffle map stages behind them run once). Mirrors
    // Graph.kCorePeel including the r14 nBelow short-circuit.
    // Inlined withoutAqe scoping (AQE off + half-width shuffles), as
    // the operator's private helper does.
    def withoutAqe[T](f: => T): T = {
      val keys = Seq("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "16")
      val prior = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def kc1With(eagerCkpt: Boolean): Unit = withoutAqe {
      val k = 80
      val rounds = 8
      var edges = graft.operators.Graph.copurchaseEdges(spark, sf)
        .localCheckpoint(eagerCkpt)
      def degrees(e: DataFrame): DataFrame =
        e.select(col("u").as("node"))
          .unionAll(e.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
          .persist(StorageLevel.MEMORY_AND_DISK)
      def counters(byV: DataFrame): (Long, Long, Long) = {
        val row = byV.agg(count(lit(1)).as("nn"), sum(col("d")).as("sd"),
          coalesce(sum(when(col("d") < k, 1L).otherwise(0L)), lit(0L))
            .as("nb")).head()
        (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1) / 2,
          row.getLong(2))
      }
      var byV = degrees(edges)
      var below = -1L
      val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      (1 to rounds).foreach { r =>
        if (below == 0L && stats.nonEmpty) {
          val (_, nn, ne) = stats.last
          stats += ((r, nn, ne))
        } else {
          val keep = byV.filter(col("d") >= k).select(col("node"))
          val next = edges
            .join(keep.withColumnRenamed("node", "u").hint("shuffle_hash"),
              Seq("u"), "left_semi")
            .join(keep.withColumnRenamed("node", "v").hint("shuffle_hash"),
              Seq("v"), "left_semi")
            .select(col("u"), col("v"))
            .localCheckpoint(eagerCkpt)
          byV.unpersist()
          byV = degrees(next)
          val (nNodes, nEdges, nBelow) = counters(byV)
          below = nBelow
          stats += ((r, nNodes, nEdges))
          edges = next
        }
      }
      byV.unpersist()
      assert(stats.size == rounds)
    }

    args.headOption.getOrElse("all") match {
      case "fi2" => ab("fi2", fi2Old _, fi2New _)
      case "aa1" => ab("aa1-score", () => aa1With(false), () => aa1With(true))
      case "kc1" => ab("kc1-ckpt", () => kc1With(true), () => kc1With(false))
      case _ =>
        ab("fi2", fi2Old _, fi2New _)
        ab("aa1-score", () => aa1With(false), () => aa1With(true))
        ab("kc1-ckpt", () => kc1With(true), () => kc1With(false))
    }
    spark.stop()
  }
}
