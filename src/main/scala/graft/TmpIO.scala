package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temp-dir hygiene for gates that stage side-effectful IO (ingest
  * round-trips, streaming sinks): collect the small read-back result
  * into a LOCAL DataFrame and delete the staging directory eagerly.
  * The lazy read-back would otherwise keep the directory live until
  * after the caller materializes it, so repeated verify/bench
  * invocations accumulated /tmp residue (round-2 verdict, missing #4).
  */
private[graft] object TmpIO {

  def collectAndClean(spark: SparkSession, tmpRoot: String)(df: DataFrame): DataFrame = {
    val schema = df.schema
    val rows = df.collect()
    deleteRecursively(new java.io.File(tmpRoot))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toSeq.asJava, schema)
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
