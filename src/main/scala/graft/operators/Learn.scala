package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** In-engine model fitting over corpus-scale data — the two training
  * primitives an LLM-data pipeline runs INSIDE the data engine rather
  * than exporting to a trainer: pairwise-preference strength
  * estimation (the reward-data / ranking primitive) and boosted
  * decision stumps (the classic quality-classifier bootstrap).
  *
  * House determinism discipline throughout (see
  * [[graft.operators.Graph]] pr1): every cross-row accumulation
  * happens on quantized BIGINTs (exact, order-invariant), real-valued
  * steps run as scalar double arithmetic on those exact integers in a
  * pinned expression shape, and each iterate is re-quantized — so
  * Spark and DuckDB replay bit-identical training trajectories and the
  * gates hash cross-engine.
  */
object Learn {

  /** Gated bt1: BRADLEY–TERRY PREFERENCE STRENGTHS — the
    * pairwise-comparison model behind preference/RLHF data curation,
    * leaderboard ranking and duel-based eval: given "i beat j" counts,
    * estimate item strengths p by Hunter's MM iteration
    * p_i ← W_i / Σ_j n_ij/(p_i + p_j), normalized each step.
    *
    * Comparisons are derived deterministically from the corpus: within
    * each order, every pair of distinct part brands duels and the
    * brand with the higher max line price (cents; tie → the
    * lexicographically smaller brand) wins. Per-order fan-out is
    * bounded by (brands-per-order choose 2) ≤ 21, so duel generation
    * is LINEAR in lineitem count — the one corpus-scale stage. The
    * directed duel-count frame is bounded by the brand domain
    * (m² ≤ 625 rows), so the MM loop runs entirely on broadcast-sized
    * control frames: at 100 TB the plan shape is one scan + one
    * bounded aggregation, then constant work.
    *
    * Quantization: strengths live as q = round(p·1e12) BIGINTs;
    * per-pair MM terms n_ij/(p_i+p_j) are quantized to
    * round(n·1e18/(q_i+q_j)) BIGINTs before the per-item sum (exact,
    * order-invariant); the division back to p' and the normalization
    * re-quantize. A zero-win item's strength is floored at one
    * 1e-12 quantum (the standard ε-regularization) so q_i+q_j can
    * never hit zero.
    */
  def bradleyTerry(spark: SparkSession, dir: String,
                   iterations: Int = 5): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("ok"), col("l_partkey"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    // Per-(order, brand) bid: the brand's best line price in the order.
    val bids = li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("ok"), col("p_brand").as("brand"))
      .agg(max(col("cents")).as("bid"))
    val a = bids.select(col("ok"), col("brand").as("ba"), col("bid").as("xa"))
    val b = bids.select(col("ok").as("okb"), col("brand").as("bb"),
      col("bid").as("xb"))
    val duels = a.join(b, col("ok") === col("okb") && col("ba") < col("bb"))
      .select(
        when(col("xb") > col("xa"), col("bb")).otherwise(col("ba")).as("winner"),
        when(col("xb") > col("xa"), col("ba")).otherwise(col("bb")).as("loser"))
    // The ONLY corpus-scale stage: duel generation + one aggregation
    // down to the item-domain² win-count frame (≤ m(m−1) rows) — a
    // bounded control plane, collected once. The MM loop then runs on
    // the driver in the exact arithmetic the oracle states.
    val wRows: Array[(String, String, Long)] = duels
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("w"))
      .as[(String, String, Long)].collect()

    // n(i,j) = n(j,i) = wins(i,j) + wins(j,i), kept directed.
    val nd = scala.collection.mutable.Map.empty[(String, String), Long]
    val winCnt = scala.collection.mutable.Map.empty[String, Long]
    wRows.foreach { case (wi, lo, n) =>
      nd((wi, lo)) = nd.getOrElse((wi, lo), 0L) + n
      nd((lo, wi)) = nd.getOrElse((lo, wi), 0L) + n
      winCnt(wi) = winCnt.getOrElse(wi, 0L) + n
    }
    val items = nd.keysIterator.map(_._1).toSeq.distinct.sorted
    val m = items.size
    // round() exactly as both engines compute it: decimal HALF_UP on
    // the exact double (math.round's floor(x+0.5) drifts at .5-adjacent
    // doubles; BigDecimal HALF_UP does not).
    def r(x: Double): Long =
      new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    var q: Map[String, Long] = items.map(_ -> r(1e12 / m.toDouble)).toMap
    for (_ <- 1 to iterations) {
      val den = scala.collection.mutable.Map.empty[String, Long]
      nd.foreach { case ((i, j), n) =>
        den(i) = den.getOrElse(i, 0L) +
          r(n.toDouble * 1e18 / (q(i) + q(j)).toDouble)
      }
      val qp = items.map { i =>
        i -> math.max(1L,
          r(winCnt.getOrElse(i, 0L).toDouble * 1e18 / den(i).toDouble))
      }.toMap
      val s = qp.valuesIterator.sum
      q = items.map(i => i -> r(qp(i).toDouble * 1e12 / s.toDouble)).toMap
    }

    val comparisons = items.map { i =>
      i -> nd.iterator.collect { case ((`i`, _), n) => n }.sum
    }.toMap
    items.map(i => (i, winCnt.getOrElse(i, 0L), comparisons(i), q(i)))
      .sortBy { case (i, _, _, qv) => (-qv, i) }
      .toDF("item", "wins", "comparisons", "strength_q12")
  }

  /** Oracle SQL for bt1 — the MM loop unrolled as one CTE per
    * iteration, every quantization stated verbatim. Every CTE that is
    * referenced more than once is AS MATERIALIZED: DuckDB inlines
    * plain CTEs, and with q_k reading q_{k-1} twice the inlined scan
    * tree grows 2^iterations-fold (measured: EMFILE on the parquet
    * scan before it even gets slow).
    */
  def bradleyTerrySql(iterations: Int = 5): String = {
    val head =
      """WITH bids AS MATERIALIZED (
        |  SELECT l.l_orderkey AS ok, p.p_brand AS brand,
        |    max(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS bid
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |duels AS (
        |  SELECT CASE WHEN b.bid > a.bid THEN b.brand ELSE a.brand END AS winner,
        |         CASE WHEN b.bid > a.bid THEN a.brand ELSE b.brand END AS loser
        |  FROM bids a JOIN bids b ON a.ok = b.ok AND a.brand < b.brand),
        |w AS MATERIALIZED (SELECT winner, loser, count(*) AS w FROM duels GROUP BY 1, 2),
        |nd AS MATERIALIZED (SELECT i, j, sum(w) AS n FROM (
        |    SELECT winner AS i, loser AS j, w FROM w
        |    UNION ALL SELECT loser AS i, winner AS j, w FROM w) u
        |  GROUP BY 1, 2),
        |wins AS MATERIALIZED (SELECT winner AS item, sum(w) AS wins FROM w GROUP BY 1),
        |items AS MATERIALIZED (SELECT DISTINCT i AS item FROM nd),
        |q0 AS MATERIALIZED (SELECT item, CAST(round(1e12 / mm.m) AS BIGINT) AS q
        |  FROM items CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS m FROM items) mm)""".stripMargin
    val iters = (1 to iterations).map { k =>
      val p = s"q${k - 1}"
      s"""d$k AS MATERIALIZED (SELECT nd.i AS item,
         |    sum(CAST(round(CAST(nd.n AS DOUBLE) * 1e18
         |      / CAST(qi.q + qj.q AS DOUBLE)) AS BIGINT)) AS den
         |  FROM nd JOIN $p qi ON nd.i = qi.item JOIN $p qj ON nd.j = qj.item
         |  GROUP BY 1),
         |p$k AS MATERIALIZED (SELECT d$k.item,
         |    greatest(CAST(round(CAST(coalesce(w2.wins, 0) AS DOUBLE) * 1e18
         |      / CAST(d$k.den AS DOUBLE)) AS BIGINT), 1) AS qp
         |  FROM d$k LEFT JOIN wins w2 ON d$k.item = w2.item),
         |q$k AS MATERIALIZED (SELECT item,
         |    CAST(round(CAST(qp AS DOUBLE) * 1e12 / CAST(ss.s AS DOUBLE)) AS BIGINT) AS q
         |  FROM p$k CROSS JOIN (SELECT sum(qp) AS s FROM p$k) ss)""".stripMargin
    }.mkString(",\n")
    val tail =
      s"""SELECT q.item, coalesce(w2.wins, 0) AS wins, nj.comparisons,
         |  q.q AS strength_q12
         |FROM q$iterations q
         |LEFT JOIN wins w2 ON q.item = w2.item
         |JOIN (SELECT i AS item, sum(n) AS comparisons FROM nd GROUP BY 1) nj
         |  ON q.item = nj.item
         |ORDER BY strength_q12 DESC, q.item ASC""".stripMargin
    head + ",\n" + iters + "\n" + tail
  }

  /** Gated gb1: ADABOOST DECISION STUMPS — the quality-classifier
    * bootstrap trained entirely in-engine: T rounds of the discrete
    * AdaBoost loop with depth-1 trees over integer features
    * (quantity, discount cents, tax cents) predicting whether a line
    * is returned (l_returnflag = 'R').
    *
    * Scale shape: because stump predictions depend only on the
    * feature vector, rows with identical (features, label) share a
    * weight trajectory — so the corpus collapses in ONE aggregation
    * to the bounded feature grid (≤ 50·11·9·2 ≈ 10k groups carrying
    * multiplicities) and the entire training loop runs on that
    * broadcast-sized control frame. At 100 TB: one scan, then
    * constant work per boosting round.
    *
    * Exactness: group weights are BIGINTs (initially count·1e10);
    * split errors accumulate via per-value partial sums + a
    * cumulative window over each feature's ≤50-value spine, so every
    * candidate's error numerator is an exact long and the argmin is
    * an integer comparison (ties → lowest feature, threshold,
    * polarity). The weight update factor sqrt((tot−e)/e) is the
    * algebraic form of exp(±α) — IEEE sqrt on a ratio of exact longs,
    * identical in both engines — and updated weights re-quantize to
    * longs. The ensemble sign test avoids ln(·) entirely: with
    * g_r = (1e9−eq_r)/eq_r the per-round odds at 1e-9 resolution,
    * sign(Σ α_r h_r) = sign(Π g_r^{h_r} − 1) becomes an EXACT integer
    * comparison of two ≤(1e9)^T decimal products.
    *
    * Output: one row per boosting round (chosen stump + exact error
    * fraction err_num/err_den in weight units) plus a final ensemble
    * row (round = T+1, err = misclassified-row count / corpus rows).
    */
  def adaboostStumps(spark: SparkSession, dir: String,
                     roundsT: Int = 3): DataFrame = {
    val grid0 = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("qty"),
        round(col("l_discount") * 100).cast("long").as("disc"),
        round(col("l_tax") * 100).cast("long").as("tax"),
        when(col("l_returnflag") === "R", 1L).otherwise(-1L).as("y"))
      .groupBy(col("qty"), col("disc"), col("tax"), col("y"))
      .agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Feature accessor shared by the melt and the prediction sites.
    def fval(f: Column): Column =
      when(f === 1, col("qty")).when(f === 2, col("disc")).otherwise(col("tax"))
    def stumpPred(f: Column, t: Column, pol: Column): Column =
      pol * when(fval(f) <= t, 1L).otherwise(-1L)

    // Each round's chosen stump is a 1-row control plane: collect it
    // (the km1/Lloyd discipline) so later rounds re-enter as plan
    // literals instead of re-executing the whole training lineage.
    case class Stump(f: Long, t: Long, pol: Long, e: Long, tot: Long)
    var grid = grid0.withColumn("w", col("cnt") * lit(10000000000L))
    var models = List.empty[Stump]
    for (_ <- 1 to roundsT) {
      // Per-(feature, value) positive/negative weight mass.
      val melted = (1 to 3).map { f =>
        grid.select(lit(f.toLong).as("f"), fval(lit(f)).as("v"),
          col("y"), col("w"))
      }.reduce(_ unionAll _)
      val byVal = melted.groupBy(col("f"), col("v"))
        .agg(sum(when(col("y") === 1L, col("w")).otherwise(0L)).as("wp"),
          sum(when(col("y") === -1L, col("w")).otherwise(0L)).as("wn"))
      // Cumulative mass over each feature's bounded value spine
      // (≤ 50 distinct values per feature — a bounded window, not a
      // corpus-scale sort).
      val wSpine = Window.partitionBy(col("f")).orderBy(col("v"))
      val wTot = Window.partitionBy(col("f"))
      val cand = byVal
        .withColumn("cwp", sum(col("wp")).over(wSpine))
        .withColumn("cwn", sum(col("wn")).over(wSpine))
        .withColumn("tp", sum(col("wp")).over(wTot))
        .withColumn("tn", sum(col("wn")).over(wTot))
        .withColumn("vmax", max(col("v")).over(wTot))
        .filter(col("v") < col("vmax")) // both sides non-empty
      // Polarity +1 predicts +1 on v ≤ t: errors = cwn + (tp − cwp).
      val errPos = col("cwn") + (col("tp") - col("cwp"))
      val errNeg = col("cwp") + (col("tn") - col("cwn"))
      val bRow = cand.select(col("f"), col("v").as("t"),
          when(errPos <= errNeg, lit(1L)).otherwise(lit(-1L)).as("pol"),
          greatest(least(errPos, errNeg), lit(1L)).as("e"),
          (col("tp") + col("tn")).as("tot"))
        .agg(min(struct(col("e"), col("f"), col("t"), col("pol"),
          col("tot"))).as("b"))
        .select(col("b.f"), col("b.t"), col("b.pol"), col("b.e"),
          col("b.tot"))
        .head()
      val st = Stump(bRow.getLong(0), bRow.getLong(1), bRow.getLong(2),
        bRow.getLong(3), bRow.getLong(4))
      models = models :+ st
      // Re-weight: wrong rows × sqrt((tot−e)/e), right rows × inverse.
      val up = sqrt((lit(st.tot) - lit(st.e)).cast("double")
        / lit(st.e).cast("double"))
      grid = grid
        .withColumn("pred", stumpPred(lit(st.f), lit(st.t), lit(st.pol)))
        .withColumn("w",
          round(col("w").cast("double")
            * when(col("pred") =!= col("y"), up).otherwise(lit(1.0) / up))
            .cast("long"))
        .select(col("qty"), col("disc"), col("tax"), col("y"),
          col("cnt"), col("w"))
    }

    // Ensemble readout: per grid row, compare the exact integer odds
    // products (1e9-quantized per-round error rates).
    import spark.implicits._
    val stumps = models.zipWithIndex.map { case (st, i) =>
      ((i + 1).toLong, st.f, st.t, st.pol, st.e, st.tot)
    }.toDF("round", "feature", "threshold", "polarity",
      "err_num", "err_den")
    var scored = grid0.select(col("qty"), col("disc"), col("tax"),
      col("y"), col("cnt"),
      lit(java.math.BigDecimal.ONE).cast("decimal(38,0)").as("a"),
      lit(java.math.BigDecimal.ONE).cast("decimal(38,0)").as("bb"))
    models.foreach { st =>
      // BigDecimal HALF_UP, not math.round: floor(x+0.5) drifts at
      // .5-adjacent doubles where both engines' round() does not.
      val eqVal = math.max(1L, math.min(999999999L,
        new java.math.BigDecimal(st.e.toDouble * 1e9 / st.tot.toDouble)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue))
      val pred = stumpPred(lit(st.f), lit(st.t), lit(st.pol))
      scored = scored
        .withColumn("pred", pred)
        .withColumn("a", (col("a")
          * when(col("pred") === 1L, lit(1000000000L - eqVal))
            .otherwise(lit(eqVal)).cast("decimal(10,0)"))
          .cast("decimal(38,0)"))
        .withColumn("bb", (col("bb")
          * when(col("pred") === 1L, lit(eqVal))
            .otherwise(lit(1000000000L - eqVal)).cast("decimal(10,0)"))
          .cast("decimal(38,0)"))
        .select(col("qty"), col("disc"), col("tax"), col("y"), col("cnt"),
          col("a"), col("bb"))
    }
    val ens = scored
      .select(col("cnt"),
        (when(col("a") > col("bb"), 1L).otherwise(-1L) =!= col("y"))
          .as("wrong"))
      .agg(sum(when(col("wrong"), col("cnt")).otherwise(0L)).as("err_num"),
        sum(col("cnt")).as("err_den"))
      .select(lit((roundsT + 1).toLong).as("round"), lit(0L).as("feature"),
        lit(0L).as("threshold"), lit(0L).as("polarity"),
        col("err_num"), col("err_den"))

    val out = stumps.unionAll(ens).orderBy(col("round"))
    val rows = out.collect() // T+1 rows
    grid0.unpersist()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Gated dsk1: DAWID–SKENE LABEL AGGREGATION — the EM consensus
    * model every annotation pipeline needs once labelers disagree:
    * jointly estimate each labeler's sensitivity α = P(vote 1|true 1)
    * and specificity β = P(vote 0|true 0) plus the latent per-item
    * posterior, instead of majority-voting as if labelers were equally
    * reliable. Labelers here are the house weak-supervision functions
    * over documents (iaa1's cast, plus a whitespace-density vote).
    *
    * Scale shape: with binary votes the posterior depends only on the
    * VOTE PATTERN, so the corpus collapses in ONE aggregation to ≤ 2^K
    * pattern-count rows — the EM loop is constant work on a collected
    * control plane at any corpus size.
    *
    * Exactness: posteriors are 1e9-quantized longs; every M-step sum
    * is exact integer arithmetic over pattern counts; the E-step's
    * likelihood products are exact ≤(1e9)^(K+1) integers (BigInt here,
    * HUGEINT in the oracle) divided once in pinned double order.
    */
  def dawidSkene(spark: SparkSession, dir: String,
                 iterations: Int = 3): DataFrame = {
    import spark.implicits._
    val votes = Tables.documents(spark, dir).select(
      when(col("n_chars") > 500, 1L).otherwise(0L).as("v1"),
      when(col("lang") === "en", 1L).otherwise(0L).as("v2"),
      when((length(col("text"))
        - length(replace(col("text"), lit(" "), lit("")))) > 60, 1L)
        .otherwise(0L).as("v3"))
    val patterns: Array[(Long, Long, Long, Long)] = votes
      .groupBy(col("v1"), col("v2"), col("v3"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Long, Long, Long, Long)].collect()

    def r(x: Double): Long =
      new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val Q = 1000000000L
    def v(p: (Long, Long, Long, Long), k: Int): Long =
      k match { case 1 => p._1; case 2 => p._2; case _ => p._3 }

    // μ⁰: majority-vote fraction, 1e9-quantized.
    var mu: Map[(Long, Long, Long, Long), Long] = patterns.map { p =>
      (p._1, p._2, p._3, p._4) -> r((p._1 + p._2 + p._3).toDouble * Q / 3.0)
    }.toMap
    var alpha = Map.empty[Int, Long]
    var beta = Map.empty[Int, Long]
    var piQ = 0L
    for (_ <- 1 to iterations) {
      // M-step: exact integer sums over the pattern frame.
      val denA = patterns.map(p => p._4 * mu(p)).sum
      val denB = patterns.map(p => p._4 * (Q - mu(p))).sum
      alpha = (1 to 3).map { k =>
        k -> r(patterns.map(p => p._4 * mu(p) * v(p, k)).sum.toDouble * Q
          / math.max(denA, 1L).toDouble)
      }.toMap
      beta = (1 to 3).map { k =>
        k -> r(patterns.map(p => p._4 * (Q - mu(p)) * (1L - v(p, k))).sum
          .toDouble * Q / math.max(denB, 1L).toDouble)
      }.toMap
      piQ = r(denA.toDouble * Q / (denA + denB).toDouble)
      // E-step: exact ≤(1e9)^4 likelihood products per pattern.
      mu = patterns.map { p =>
        val a = (1 to 3).foldLeft(BigInt(piQ)) { (acc, k) =>
          acc * BigInt(if (v(p, k) == 1L) alpha(k) else Q - alpha(k))
        }
        val b = (1 to 3).foldLeft(BigInt(Q - piQ)) { (acc, k) =>
          acc * BigInt(if (v(p, k) == 1L) Q - beta(k) else beta(k))
        }
        (p._1, p._2, p._3, p._4) ->
          r(a.toDouble * Q.toDouble / (a + b).toDouble)
      }.toMap
    }
    val nPos = patterns.filter(p => mu(p) > Q / 2).map(_._4).sum
    (1 to 3).map { k =>
      (k.toLong, alpha(k), beta(k), piQ, nPos)
    }.toDF("labeler", "alpha_q9", "beta_q9", "pi_q9", "n_pos")
  }

  /** Oracle SQL for dsk1 — pattern collapse + the EM loop unrolled;
    * likelihood products as HUGEINTs, every quantization stated.
    */
  def dawidSkeneSql(iterations: Int = 3): String = {
    val head =
      """WITH pat AS (
        |  SELECT CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS v1,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS v2,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) > 60
        |      THEN 1 ELSE 0 END AS v3,
        |    count(*) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |m0 AS MATERIALIZED (SELECT v1, v2, v3, cnt,
        |    CAST(round(CAST(v1 + v2 + v3 AS DOUBLE) * 1e9 / 3.0) AS BIGINT) AS mu
        |  FROM pat)""".stripMargin
    val iters = (1 to iterations).map { k =>
      val p = s"m${k - 1}"
      val vsel = (1 to 3).map { j =>
        s"""    CAST(round(CAST(sum(cnt * mu * v$j) AS DOUBLE) * 1e9
           |      / CAST(greatest(sum(cnt * mu), 1) AS DOUBLE)) AS BIGINT) AS a$j,
           |    CAST(round(CAST(sum(cnt * (1000000000 - mu) * (1 - v$j)) AS DOUBLE) * 1e9
           |      / CAST(greatest(sum(cnt * (1000000000 - mu)), 1) AS DOUBLE)) AS BIGINT) AS b$j""".stripMargin
      }.mkString(",\n")
      val aProd = (1 to 3).map { j =>
        s"CAST(CASE WHEN v$j = 1 THEN a$j ELSE 1000000000 - a$j END AS HUGEINT)"
      }.mkString(" * ")
      val bProd = (1 to 3).map { j =>
        s"CAST(CASE WHEN v$j = 1 THEN 1000000000 - b$j ELSE b$j END AS HUGEINT)"
      }.mkString(" * ")
      s"""th$k AS MATERIALIZED (
         |  SELECT
         |$vsel,
         |    CAST(round(CAST(sum(cnt * mu) AS DOUBLE) * 1e9
         |      / CAST(sum(cnt * mu) + sum(cnt * (1000000000 - mu)) AS DOUBLE))
         |      AS BIGINT) AS pi
         |  FROM $p),
         |m$k AS MATERIALIZED (
         |  SELECT v1, v2, v3, cnt,
         |    CAST(round(CAST(CAST(pi AS HUGEINT) * $aProd AS DOUBLE) * 1e9
         |      / CAST(CAST(pi AS HUGEINT) * $aProd
         |           + CAST(1000000000 - pi AS HUGEINT) * $bProd AS DOUBLE))
         |      AS BIGINT) AS mu
         |  FROM $p CROSS JOIN th$k)""".stripMargin
    }.mkString(",\n")
    val t = s"th$iterations"
    val tail =
      s"""npos AS (SELECT coalesce(sum(cnt), 0) AS n_pos
         |  FROM m$iterations WHERE mu > 500000000)
         |SELECT k AS labeler,
         |  CASE k WHEN 1 THEN a1 WHEN 2 THEN a2 ELSE a3 END AS alpha_q9,
         |  CASE k WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS beta_q9,
         |  pi AS pi_q9, n_pos
         |FROM (SELECT unnest([1, 2, 3]) AS k) ks
         |CROSS JOIN $t CROSS JOIN npos
         |ORDER BY labeler""".stripMargin
    head + ",\n" + iters + ",\n" + tail
  }

  /** Oracle SQL for gb1 — the boosting loop unrolled, one weight CTE
    * per round; the ensemble sign test replayed as HUGEINT products.
    */
  def adaboostStumpsSql(roundsT: Int = 3): String = {
    def fv(fcol: String, g: String) =
      s"CASE $fcol WHEN 1 THEN $g.qty WHEN 2 THEN $g.disc ELSE $g.tax END"
    val head =
      """WITH g0 AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc,
        |    CAST(round(l_tax * 100) AS BIGINT) AS tax,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2, 3, 4),
        |w0 AS MATERIALIZED (SELECT qty, disc, tax, y, cnt,
        |    cnt * 10000000000 AS w FROM g0),
        |feats AS (SELECT unnest([1, 2, 3]) AS f)""".stripMargin
    val rounds = (1 to roundsT).map { k =>
      val wp = s"w${k - 1}"
      s"""bv$k AS MATERIALIZED (
         |  SELECT f, ${fv("f", wp)} AS v,
         |    sum(CASE WHEN y = 1 THEN w ELSE 0 END) AS wp,
         |    sum(CASE WHEN y = -1 THEN w ELSE 0 END) AS wn
         |  FROM $wp CROSS JOIN feats GROUP BY 1, 2),
         |cd$k AS MATERIALIZED (
         |  SELECT f, v,
         |    sum(wp) OVER (PARTITION BY f ORDER BY v) AS cwp,
         |    sum(wn) OVER (PARTITION BY f ORDER BY v) AS cwn,
         |    sum(wp) OVER (PARTITION BY f) AS tp,
         |    sum(wn) OVER (PARTITION BY f) AS tn,
         |    max(v) OVER (PARTITION BY f) AS vmax
         |  FROM bv$k),
         |best$k AS MATERIALIZED (
         |  SELECT f AS bf, v AS bt,
         |    CASE WHEN cwn + (tp - cwp) <= cwp + (tn - cwn)
         |      THEN 1 ELSE -1 END AS bpol,
         |    greatest(least(cwn + (tp - cwp), cwp + (tn - cwn)), 1) AS be,
         |    tp + tn AS btot
         |  FROM cd$k WHERE v < vmax
         |  ORDER BY be ASC, bf ASC, bt ASC, bpol ASC LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT qty, disc, tax, y, cnt,
         |    CAST(round(CAST(w AS DOUBLE) * CASE
         |      WHEN bpol * (CASE WHEN ${fv("bf", wp)} <= bt THEN 1 ELSE -1 END) <> y
         |      THEN sqrt(CAST(btot - be AS DOUBLE) / CAST(be AS DOUBLE))
         |      ELSE 1.0 / sqrt(CAST(btot - be AS DOUBLE) / CAST(be AS DOUBLE))
         |      END) AS BIGINT) AS w
         |  FROM $wp CROSS JOIN best$k)""".stripMargin
    }.mkString(",\n")
    val eqs = (1 to roundsT).map { k =>
      s"""eq$k AS MATERIALIZED (SELECT bf, bt, bpol,
         |    greatest(least(CAST(round(CAST(be AS DOUBLE) * 1e9
         |      / CAST(btot AS DOUBLE)) AS BIGINT), 999999999), 1) AS eq
         |  FROM best$k)""".stripMargin
    }.mkString(",\n")
    val aProd = (1 to roundsT).map { k =>
      s"""CAST(CASE WHEN eq$k.bpol * (CASE WHEN (CASE eq$k.bf
         | WHEN 1 THEN g0.qty WHEN 2 THEN g0.disc ELSE g0.tax END) <= eq$k.bt
         | THEN 1 ELSE -1 END) = 1
         | THEN 1000000000 - eq$k.eq ELSE eq$k.eq END AS HUGEINT)""".stripMargin
    }.mkString(" * ")
    val bProd = (1 to roundsT).map { k =>
      s"""CAST(CASE WHEN eq$k.bpol * (CASE WHEN (CASE eq$k.bf
         | WHEN 1 THEN g0.qty WHEN 2 THEN g0.disc ELSE g0.tax END) <= eq$k.bt
         | THEN 1 ELSE -1 END) = 1
         | THEN eq$k.eq ELSE 1000000000 - eq$k.eq END AS HUGEINT)""".stripMargin
    }.mkString(" * ")
    val crossEqs = (1 to roundsT).map(k => s"CROSS JOIN eq$k").mkString(" ")
    val stumpRows = (1 to roundsT).map { k =>
      s"SELECT $k AS round, bf AS feature, bt AS threshold, " +
        s"bpol AS polarity, be AS err_num, btot AS err_den FROM best$k"
    }.mkString("\n  UNION ALL ")
    val ens =
      s"""ens AS (
         |  SELECT ${roundsT + 1} AS round, 0 AS feature, 0 AS threshold,
         |    0 AS polarity,
         |    sum(CASE WHEN (CASE WHEN $aProd > $bProd THEN 1 ELSE -1 END)
         |      <> g0.y THEN g0.cnt ELSE 0 END) AS err_num,
         |    sum(g0.cnt) AS err_den
         |  FROM g0 $crossEqs)""".stripMargin
    head + ",\n" + rounds + ",\n" + eqs + ",\n" + ens + "\n" +
      s"""SELECT round, feature, threshold, polarity, err_num, err_den
         |FROM ($stumpRows
         |  UNION ALL SELECT * FROM ens) u
         |ORDER BY round""".stripMargin
  }
}
