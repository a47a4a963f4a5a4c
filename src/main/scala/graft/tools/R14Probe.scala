package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-14 interleaved A/B probe: times OLD vs NEW shapes of the
  * rewritten operators in the same JVM, alternating A,B,A,B,... so
  * both shapes sample the same contention epoch (single-shot numbers
  * on this box swing 3× with hypervisor steal). Reports per-shape
  * medians and minima.
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("R14_REPS", "5").toInt

    def items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()

    // fi1 OLD: per-basket self-join pair generation
    def fi1Old(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey")).orderBy(col("l_partkey"))
      val i = items.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= 64).drop("_r")
      i.as("a").join(i.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
        .orderBy(desc("support"), col("part_a"), col("part_b"))
    }
    def fi1New(): DataFrame =
      graft.operators.Relational.frequentItemPairsFrom(spark, items, 3, 64)

    def runDf(f: () => DataFrame): Unit =
      f().write.format("noop").mode("overwrite").save()

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

    // aa1 adjacency: OLD two-exchange (deg on b, adj on a) vs NEW
    // single repartition("a") feeding both.
    def adjOld(): Unit = {
      val e = graft.operators.Graph.copurchaseEdges(spark, sf)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val und = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
      val deg = und.groupBy(col("b").as("node")).agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      und.join(broadcast(deg), col("b") === col("node"))
        .select(col("a"), struct(col("b"),
          when(col("d") >= 2,
            round(lit(1e12) / log(col("d").cast("double"))).cast("long"))
            .otherwise(lit(0L)).as("w")).as("nw"))
        .groupBy(col("a"))
        .agg(sort_array(collect_list(col("nw"))).as("arr"))
        .write.format("noop").mode("overwrite").save()
      e.unpersist(); deg.unpersist()
    }
    def adjNew(): Unit = {
      val e = graft.operators.Graph.copurchaseEdges(spark, sf)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val und = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
        .repartition(col("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      und.join(broadcast(deg), col("b") === col("node"))
        .select(col("a"), struct(col("b"),
          when(col("d") >= 2,
            round(lit(1e12) / log(col("d").cast("double"))).cast("long"))
            .otherwise(lit(0L)).as("w")).as("nw"))
        .groupBy(col("a"))
        .agg(sort_array(collect_list(col("nw"))).as("arr"))
        .write.format("noop").mode("overwrite").save()
      e.unpersist(); deg.unpersist(); und.unpersist()
    }

    args.headOption.getOrElse("all") match {
      case "fi1" => ab("fi1", () => runDf(fi1Old _), () => runDf(fi1New _))
      case "adj" => ab("aa1-adj", adjOld _, adjNew _)
      case _ =>
        ab("fi1", () => runDf(fi1Old _), () => runDf(fi1New _))
        ab("aa1-adj", adjOld _, adjNew _)
    }
    spark.stop()
  }
}
