package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

class VectorNormsSpec extends SparkSpec {

  test("matryoshka norms: head mass bounded by full mass, ratio consistent") {
    val rows = VectorOps.matryoshkaNorms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Double]("norm_full")
      val nh = r.getAs[Double]("norm_head")
      val cos = r.getAs[Double]("cos_trunc")
      assert(nf > 0 && nh >= 0 && nh <= nf + 1e-9)
      assert(cos >= 0 && cos <= 1.0 + 1e-9)
      assert(math.abs(cos - nh / nf) < 1e-5)
    }
  }

  test("linear score calibration: bins partition the corpus, rates in [0,1]") {
    val rows = VectorOps.linearScoreCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == Tables.embeddings(spark, sf).count())
    val bins = rows.map(_.getAs[Int]("bin"))
    assert(bins.toSeq == bins.sorted.toSeq && bins.distinct.length == bins.length)
    rows.foreach { r =>
      val rate = r.getAs[Double]("pos_rate")
      assert(rate >= 0 && rate <= 1)
      val b = r.getAs[Int]("bin")
      val m = r.getAs[Double]("mean_score")
      // interior bins hold their mean inside the bin's half-unit range
      if (b > -4 && b < 3)
        assert(m >= b / 2.0 - 1e-9 && m < (b + 1) / 2.0 + 1e-9,
          s"bin $b mean $m outside [${b / 2.0}, ${(b + 1) / 2.0})")
    }
  }

  test("kmeans outliers: top distances dominate their clusters' means") {
    val out = VectorOps.kmeansOutliers(spark, sf).collect()
    assert(out.length == 10)
    val ds = out.map(_.getAs[Double]("d2"))
    assert(ds.toSeq == ds.sortBy(-_).toSeq && ds.forall(_ > 0))
    val means = VectorOps.kmeansGate(spark, sf).collect()
      .map(r => r.getAs[Int]("cid") -> r.getAs[Double]("mean_d2")).toMap
    out.foreach { r =>
      assert(r.getAs[Double]("d2") > means(r.getAs[Int]("cid")),
        s"outlier not above its cluster mean: $r")
    }
  }

  test("feature scalers: bounds order and std positivity") {
    val rows = graft.operators.Relational.featureScalers(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Double]("vmin"), r.getAs[Double]("vmax"))
      val (mean, std) = (r.getAs[Double]("mean"), r.getAs[Double]("std"))
      assert(mn < mx && mean > mn && mean < mx && std > 0)
    }
  }

  test("kmeans: clusters partition the corpus and beat the 1-cluster inertia") {
    val rows = VectorOps.kmeansGate(spark, sf).collect()
    assert(rows.length == 8)
    val n = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(n == Tables.embeddings(spark, sf).count())
    assert(rows.forall(_.getAs[Double]("mean_d2") > 0))
    // weighted inertia must beat assigning everything to the global mean
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val dim = vecs.head.length
    val global = Array.tabulate(dim)(i => vecs.map(_(i)).sum / vecs.length)
    val oneCluster = vecs.map(v =>
      v.zip(global).map { case (x, c) => (x - c) * (x - c) }.sum).sum / vecs.length
    val kInertia = rows.map(r =>
      r.getAs[Double]("mean_d2") * r.getAs[Long]("n_vecs")).sum / n
    assert(kInertia < oneCluster,
      s"k-means inertia $kInertia not better than 1-cluster $oneCluster")
  }

  test("pca1: operator matches an exact local replay; eigenpair residual tiny") {
    val rows = VectorOps.pcaTopComponent(spark, sf).collect()
    assert(rows.length == 10)
    // local replay: same sufficient statistics, same power iteration
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val d = vecs.head._2.length
    val stats = new Array[Double](1 + d + d * (d + 1) / 2)
    stats(0) = vecs.length.toDouble
    vecs.foreach { case (_, v) =>
      var i = 0; var k = 1 + d
      while (i < d) {
        stats(1 + i) += v(i)
        var j = i
        while (j < d) { stats(k) += v(i).toDouble * v(j); j += 1; k += 1 }
        i += 1
      }
    }
    val (lambda, ev, mu, n) = graft.operators.PcaMath.powerIteration(stats, 100)
    assert(n == vecs.length)
    // eigenpair quality: ||Cv - λv||∞ ≤ 1e-6·λ on the replayed covariance
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      var k = 1 + d; var r = 0; var idx = -1
      while (r <= a) { // walk upper-triangle rows to locate (a,b)
        if (r == a) idx = k + (b - a) else k += d - r
        r += 1
      }
      stats(idx) / n - mu(i) * mu(j)
    }
    // near-isotropic synthetic data ⇒ small spectral gap, so the raw
    // residual shrinks only like (λ₂/λ₁)^t — accept 1e-3·λ there and
    // hold the Rayleigh quotient (quadratically convergent) to 1e-6·λ
    val cv = (0 until d).map(r => (0 until d).map(c => cov(r)(c) * ev(c)).sum)
    val resid = (0 until d).map(r => math.abs(cv(r) - lambda * ev(r))).max
    assert(resid <= 1e-3 * lambda, s"eigen residual $resid vs lambda $lambda")
    val rayleigh = (0 until d).map(r => ev(r) * cv(r)).sum
    assert(math.abs(rayleigh - lambda) <= 1e-6 * lambda,
      s"Rayleigh quotient $rayleigh vs lambda $lambda")
    // λ₁ dominates every single-dimension variance
    assert((0 until d).forall(i => cov(i)(i) <= lambda + 1e-9))
    // operator scores match the local projection per id (distributed
    // FP summation order differs at ~1e-15, so tolerance not equality)
    val muDotV = mu.zip(ev).map { case (a, b) => a * b }.sum
    val localScore = vecs.map { case (id, v) =>
      id -> ((0 until d).map(i => v(i).toDouble * ev(i)).sum - muDotV)
    }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("pc1_score") - localScore(id)) < 2e-6,
        s"score mismatch for vec $id")
    }
    // and the selected ids are a genuine top-k by |score|
    val kth = localScore.values.map(math.abs).toSeq.sorted.reverse.apply(9)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("pc1_score")) >= kth - 1e-5,
        s"vec ${r.getAs[Long]("vec_id")} is not in the true top-10 band")
    }
  }

  test("pca1 certificate: booleans genuinely certify and exact stats match a local replay") {
    val row = VectorOps.pcaCertificate(spark, sf).collect().head
    for (c <- Seq("unit_norm_ok", "residual_ok", "lambda_ge_max_var", "lambda_le_trace"))
      assert(row.getAs[Boolean](c), s"certificate column $c must be TRUE")
    // Local replay of the decimal-exact spectral stats (same op
    // sequence: round-10 decimal sums → double → m2 − m1², fold in
    // dim order, argmax with smallest-dim ties).
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val d = vecs.head.length
    val n = vecs.length
    assert(row.getAs[Long]("n") == n.toLong)
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _).toDouble
    val vars = (0 until d).map { dim =>
      val col = vecs.map(v => v(dim).toDouble)
      val m1 = dsum(col.toSeq) / n
      val m2 = dsum(col.map(x => x * x).toSeq) / n
      m2 - m1 * m1
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("trace6") == r6(vars.foldLeft(0.0)(_ + _)))
    val maxDim = vars.indices.maxBy(i => (vars(i), -i))
    assert(row.getAs[Int]("max_var_dim") == maxDim)
    assert(row.getAs[Double]("max_var6") == r6(vars(maxDim)))
    // The residual boolean is not vacuous: a deliberately unconverged
    // eigenpair (1 iteration from the isotropic start) must fail the
    // same 1e-9 bound the gate certifies at 3000 iterations.
    import spark.implicits._
    val stats = Tables.embeddings(spark, sf).select(col("embedding"))
      .as[Array[Float]]
      .select(graft.functions.CovarianceAggregator.toColumn).head()
    val (_, _, _, residBad, _) = graft.operators.PcaMath.certificate(stats, 1)
    assert(residBad > 1e-9, s"1-iteration residual $residBad should fail the bound")
    val (_, _, _, residGood, _) = graft.operators.PcaMath.certificate(stats, 3000)
    assert(residGood <= 1e-9, s"3000-iteration residual $residGood")
  }

  test("power iteration: crafted spectra recover known eigenpairs exactly") {
    import graft.operators.PcaMath
    // Diagonal covariance diag(4, 1): centered samples (+a, -a) along
    // each axis give exact sufficient statistics; top eigenvector must
    // be e1 with lambda = 4.
    // points: (2,0), (-2,0), (0,1), (0,-1) -> n=4, sums=0,
    // ss upper-tri = [sum x^2, sum xy, sum y^2] = [8, 0, 2]
    val stats = Array[Double](4, 0, 0, 8, 0, 2)
    val (lambda, v, mu, n) = PcaMath.powerIteration(stats, 200)
    assert(n == 4 && mu.forall(_ == 0.0))
    assert(math.abs(lambda - 2.0) < 1e-12) // cov = diag(8,2)/4 = diag(2, .5)
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-9 && math.abs(v(1)) < 1e-9)
    assert(v(0) > 0, "sign canonicalization: dominant loading positive")
    // Rank-1 covariance along (1,1)/sqrt(2): points (1,1),(-1,-1)
    // ss = [2, 2, 2], n=2 -> cov = [[1,1],[1,1]], lambda=2, v=(1,1)/sqrt2
    val stats2 = Array[Double](2, 0, 0, 2, 2, 2)
    val (l2, v2, _, _) = PcaMath.powerIteration(stats2, 200)
    assert(math.abs(l2 - 2.0) < 1e-12)
    assert(math.abs(v2(0) - math.sqrt(0.5)) < 1e-9
      && math.abs(v2(1) - math.sqrt(0.5)) < 1e-9)
    // Nonzero mean must be removed: shift the rank-1 case by (10, 20)
    val stats3 = Array[Double](2, 20, 40, 2 + 200, 2 + 2 * 200, 2 + 800)
    val (l3, v3, mu3, _) = PcaMath.powerIteration(stats3, 200)
    assert(mu3(0) == 10.0 && mu3(1) == 20.0)
    assert(math.abs(l3 - 2.0) < 1e-9, s"mean not removed: lambda $l3")
    assert(math.abs(v3(0) - math.sqrt(0.5)) < 1e-8)
  }

  test("matryoshka head norm matches a driver-side recompute") {
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
      .collect().map { r =>
        r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding")
      }.toMap
    VectorOps.matryoshkaNorms(spark, sf).collect().foreach { r =>
      val e = vecs(r.getAs[Long]("vec_id"))
      val nh = math.sqrt(e.take(16).map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(r.getAs[Double]("norm_head") - nh) < 1e-5)
    }
  }
}
