package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** One-off stage-attribution probe for aa1's sf1 scaling (round-11
  * verdict item 8): times each phase of [[graft.operators.Graph
  * .edgeStrength]] separately so the sf1 cost is attributed to a
  * stage, not guessed. See PERF.md round 11.
  */
object Aa1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/dev/shm/graft_sf1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val e = graft.operators.Graph.copurchaseEdges(spark, sf)
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("edges") { println("  n_edges=" + e.count()) }
      val und = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
      val deg = und.groupBy(col("b").as("node")).agg(count(lit(1)).as("d"))
      t("deg") { println("  maxdeg=" + deg.agg(max(col("d"))).head().getLong(0)) }
      val w = Window.partitionBy(col("a")).orderBy(col("b"))
      val capped = und.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= 4096).drop("_r")
      val adj = capped
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
      t("adj-build") { adj.count() }
      def scoredWith(hint: Boolean) = {
        def h(df: DataFrame) = if (hint) df.hint("shuffle_hash") else df
        e
          .join(h(adj.select(col("a").as("u2"), col("nbrs").as("nbrs_u"),
            col("wts").as("wts_u"))), col("u") === col("u2"))
          .join(h(adj.select(col("a").as("v2"), col("nbrs").as("nbrs_v"))),
            col("v") === col("v2"))
          .select(col("u"), col("v"),
            graft.functions.SortedIntersectExpr
              .sortedIntersectCount(col("nbrs_u"), col("nbrs_v")).as("n_common"),
            graft.functions.SortedIntersectExpr
              .sortedIntersectWeightSum(col("nbrs_u"), col("nbrs_v"), col("wts_u"))
              .as("aa_scaled"))
          .filter(col("n_common") > 0)
          .orderBy(desc("aa_scaled"), asc("u"), asc("v"))
          .limit(25)
      }
      t("score+topk-smj") { scoredWith(false).collect() }
      t("score+topk-shj") { scoredWith(true).collect() }
      e.unpersist(); adj.unpersist()
    }
    spark.stop()
  }
}
