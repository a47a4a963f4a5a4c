package graft

import org.apache.spark.sql.functions._

/** The collect-to-driver seam in TmpIO is a bounded control-plane
  * transfer by contract: every gate routes only a small summary frame
  * through it. The row cap makes that contract executable — a future
  * caller that tries to collect a corpus-scale result must fail loudly
  * instead of OOMing the driver at some larger SF.
  */
class TmpIOSpec extends SparkSpec {

  test("collectAndClean round-trips a small frame and deletes the staging dir") {
    val root = tmpDir("tmpio-ok-")
    val out = TmpIO.collectAndClean(spark, root) {
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    }
    assert(out.count() == 100L)
    assert(!new java.io.File(root).exists(), "staging dir must be gone")
  }

  test("collectAndClean refuses a result above the row cap") {
    val root = tmpDir("tmpio-cap-")
    try {
      val e = intercept[IllegalArgumentException] {
        TmpIO.collectAndClean(spark, root) {
          spark.range(TmpIO.MaxCollectRows + 1).toDF()
        }
      }
      assert(e.getMessage.contains("control-plane"))
      assert(new java.io.File(root).exists(),
        "staging dir must survive — the caller still owns cleanup on failure")
    } finally TmpIO.deleteRecursively(new java.io.File(root))
  }
}
