package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedded-JDBC sink/source parity (gate k16) — the one literal
  * reference surface the engine did not speak until round 11: the
  * reference appends rows over a SQLAlchemy engine to
  * `sqlite:///database.sqlite` (`dagster_repository/resources.py:34`).
  * The engine's production table format is TxTable/parquet (an
  * intentional architecture change, SURVEY §1.4), but a user porting
  * the reference verbatim expects `.format("jdbc")` to work; this
  * seam proves it does, against embedded Apache Derby — the JVM's
  * in-process SQL database, offline-safe like the reference's staged
  * SQLite file and already on the Spark classpath.
  *
  * What the gate exercises, mirroring the reference's K1/K2 path:
  *  - append AUTO-CREATES the table (K2's create_all semantics:
  *    Spark's JDBC writer issues the DDL on first append, deriving
  *    Derby types BIGINT/CLOB/DOUBLE from the frame schema);
  *  - the write runs over a BOUNDED connection pool
  *    (numPartitions=4): embedded Derby is a single-process engine,
  *    so unbounded executor fan-in would just convert into lock
  *    contention — at 100 TB a JDBC sink is always the narrow end and
  *    gets an explicit connection budget;
  *  - the read-back is a PARTITIONED JDBC scan (partitionColumn +
  *    bounds, 4 range slices) — the shape that keeps a JDBC *source*
  *    parallel at scale instead of one connection dragging the whole
  *    table;
  *  - the round-tripped rows hash-match the same slice read straight
  *    from parquet (the DuckDB oracle states that read), so Derby's
  *    type round-trip (BIGINT/CLOB/DOUBLE → long/string/double) is
  *    byte-exact against the native path.
  *
  * The gate rides a deterministic 5% slice (event_id % 20 = 0): sink
  * parity is a semantics gate, not a throughput gate, and the slice
  * keeps the single-process Derby engine off the bench's critical
  * path at every SF.
  */
object JdbcStore {

  private final val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Shut down one embedded database so its file handles and page
    * cache are released before the scratch dir is deleted. Derby
    * signals a SUCCESSFUL single-db shutdown with SQLState 08006 —
    * the exception is the ack, not an error.
    */
  private def shutdown(dbPath: String): Unit =
    try {
      java.sql.DriverManager.getConnection(s"jdbc:derby:$dbPath;shutdown=true")
      ()
    } catch {
      case e: java.sql.SQLException if e.getSQLState == "08006" => ()
    }

  def jdbcRoundtripGate(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.TmpIO.scratchDir("graft_k16_")
    // Keep Derby's engine log inside the gate scratch (default is a
    // derby.log in the process working dir — residue).
    System.setProperty("derby.stream.error.file", s"$tmp/derby.log")
    val db = s"$tmp/db"
    val slice = graft.Tables.events(spark, dir)
      .filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

    slice.write.format("jdbc")
      .option("url", s"jdbc:derby:$db;create=true")
      .option("driver", Driver)
      .option("dbtable", "events_rt")
      .option("numPartitions", "4")
      .option("batchsize", "5000")
      .mode("append")
      .save()

    val maxId = slice.agg(max(col("event_id"))).collect()(0).getLong(0)
    val back = spark.read.format("jdbc")
      .option("url", s"jdbc:derby:$db")
      .option("driver", Driver)
      .option("dbtable", "events_rt")
      .option("partitionColumn", "event_id")
      .option("lowerBound", "0")
      .option("upperBound", (maxId + 1).toString)
      .option("numPartitions", "4")
      .load()
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
    val out = back.collect()
    shutdown(db)
    graft.TmpIO.deleteRecursively(new java.io.File(tmp))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.toSeq.asJava, back.schema)
      .orderBy(col("event_id"))
  }
}
