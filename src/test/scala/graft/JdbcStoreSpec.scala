package graft

import org.apache.spark.sql.functions._

class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  test("jdbc sink: append auto-creates, types round-trip, second append appends") {
    val tmp = graft.TmpIO.scratchDir("graft_jdbcspec_")
    System.setProperty("derby.stream.error.file", s"$tmp/derby.log")
    val url = s"jdbc:derby:$tmp/db;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val rows = Seq((1L, 10L, "click", 1.5), (2L, 20L, "view", -0.25))
      .toDF("event_id", "user_id", "event_type", "value")
    // First append auto-creates the table (the reference's create_all
    // / K2 semantics through the JDBC writer).
    rows.write.format("jdbc").option("url", url).option("driver", driver)
      .option("dbtable", "t").mode("append").save()
    val back1 = spark.read.format("jdbc").option("url", url)
      .option("driver", driver).option("dbtable", "t").load()
      .orderBy("event_id").collect()
    assert(back1.length == 2)
    assert(back1(0).getLong(0) == 1L && back1(0).getString(2) == "click"
      && back1(0).getDouble(3) == 1.5)
    // Append is append, not overwrite: reference K1 semantics.
    rows.write.format("jdbc").option("url", url).option("driver", driver)
      .option("dbtable", "t").mode("append").save()
    assert(spark.read.format("jdbc").option("url", url)
      .option("driver", driver).option("dbtable", "t").load().count() == 4)
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$tmp/db;shutdown=true")
    catch { case e: java.sql.SQLException if e.getSQLState == "08006" => () }
    graft.TmpIO.deleteRecursively(new java.io.File(tmp))
  }

  test("k16 gate equals the parquet slice") {
    val jdbc = graft.sources.JdbcStore.jdbcRoundtripGate(spark, sf).collect()
    val pq = Tables.events(spark, sf).filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).collect()
    assert(jdbc.length == pq.length && jdbc.nonEmpty)
    jdbc.zip(pq).foreach { case (a, b) => assert(a == b) }
  }
}
