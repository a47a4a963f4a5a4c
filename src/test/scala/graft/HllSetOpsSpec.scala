package graft

import graft.operators.Relational

class HllSetOpsSpec extends SparkSpec {

  test("hll set ops: union dominates cohorts, estimates track exact counts") {
    val r = Relational.hllSetOps(spark, sf).head
    val (ea, eb, eu) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"))
    // a merged (register-max) sketch can never estimate below the
    // larger cohort's own registers
    assert(eu >= math.max(ea, eb) - 1e-9)
    val (xa, xb, xu) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
      r.getAs[Long]("exact_union"))
    // m=64 -> standard error ~13%; allow 3 sigma
    def relOk(est: Double, exact: Long): Boolean =
      exact == 0 || math.abs(est - exact) / exact < 0.40
    assert(relOk(ea, xa), s"est_a $ea vs $xa")
    assert(relOk(eb, xb), s"est_b $eb vs $xb")
    assert(relOk(eu, xu), s"est_union $eu vs $xu")
    // inclusion-exclusion identity holds on the emitted columns
    assert(math.abs(r.getAs[Double]("est_intersect") - (ea + eb - eu)) < 1e-5)
    assert(xu <= xa + xb && r.getAs[Long]("exact_intersect") == xa + xb - xu)
  }
}
