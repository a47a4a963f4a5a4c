package graft

import org.apache.spark.sql.functions._

/** NULL-handling edges: ANSI semantics the engine must preserve (and
  * that the reference silently delegated to SQLite).
  */
class NullEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val withNulls = Seq(
    (Some("a"), Some(1.0)), (Some("a"), None), (None, Some(5.0)),
    (None, None), (Some("b"), Some(2.0)))

  test("aggregates ignore NULL values but GROUP BY keeps NULL keys") {
    val df = withNulls.toDF("k", "v")
    val agg = df.groupBy("k").agg(
      count(col("v")).as("n_vals"),
      count(lit(1)).as("n_rows"),
      max(col("v")).as("mx")).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(agg(Some("a")) == (1L, 2L, Some(1.0)), "count(col) skips NULLs")
    assert(agg(None) == (1L, 2L, Some(5.0)), "NULL group key is a real group")
    assert(agg(Some("b")) == (1L, 1L, Some(2.0)))
  }

  test("equi-join drops NULL keys on both sides (no NULL=NULL match)") {
    val l = Seq(Some(1L), None, Some(2L)).toDF("k")
    val r = Seq(Some(1L), None, None).toDF("rk")
    val j = l.join(r, l("k") === r("rk")).collect()
    assert(j.length == 1 && j(0).getLong(0) == 1L)
  }

  test("null-safe equality (<=>) does match NULLs when asked") {
    val l = Seq(Some(1L), None).toDF("k")
    val r = Seq(Some(1L), None).toDF("rk")
    val j = l.join(r, l("k") <=> r("rk")).collect()
    assert(j.length == 2)
  }

  test("min/max of all-NULL group is NULL; sum of empty is NULL not 0") {
    val df = Seq((1, Option.empty[Double]), (1, None)).toDF("k", "v")
    val r = df.groupBy("k").agg(min("v"), max("v"), sum("v")).collect()(0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("window functions order NULLs deterministically with explicit modifiers") {
    val df = Seq((1, Some(3.0)), (1, None), (1, Some(1.0))).toDF("g", "v")
    val got = df.orderBy(asc_nulls_first("v")).select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(None, Some(1.0), Some(3.0)))
  }
}
