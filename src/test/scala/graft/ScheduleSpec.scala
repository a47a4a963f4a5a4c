package graft

import java.time.{LocalDate, LocalDateTime, LocalTime}
import org.apache.spark.sql.functions._
import graft.operators.Schedule

class ScheduleSpec extends SparkSpec {

  test("dailyKeys tiles the range inclusively, in order") {
    val keys = Schedule.dailyKeys(
      LocalDate.of(2022, 10, 1), LocalDate.of(2022, 10, 5))
    assert(keys.map(_.toString) ==
      Seq("2022-10-01", "2022-10-02", "2022-10-03", "2022-10-04", "2022-10-05"))
    assert(Schedule.dailyKeys(
      LocalDate.of(2022, 10, 1), LocalDate.of(2022, 10, 1)).size == 1)
    intercept[IllegalArgumentException] {
      Schedule.dailyKeys(LocalDate.of(2022, 10, 2), LocalDate.of(2022, 10, 1))
    }
  }

  test("runConfig renders the reference's %Y%m%d partition key") {
    assert(Schedule.runConfig(LocalDate.of(2022, 10, 1)) == "20221001")
  }

  test("dueTicks: a day's run launches at 09:00 the following day") {
    val start = LocalDate.of(2022, 10, 1)
    // before the first tick: nothing due
    assert(Schedule.dueTicks(start,
      LocalDateTime.of(2022, 10, 1, 12, 0)).isEmpty)
    assert(Schedule.dueTicks(start,
      LocalDateTime.of(2022, 10, 2, 8, 59)).isEmpty)
    // at/after 09:00 on Oct 2 the Oct 1 partition has launched
    assert(Schedule.dueTicks(start,
      LocalDateTime.of(2022, 10, 2, 9, 0)).map(_.toString) == Seq("2022-10-01"))
    // mid-morning Oct 4, before tick: Oct 1-2 launched, Oct 3 not yet
    assert(Schedule.dueTicks(start,
      LocalDateTime.of(2022, 10, 4, 8, 0)).map(_.toString) ==
      Seq("2022-10-01", "2022-10-02"))
    // custom tick time honored
    assert(Schedule.dueTicks(start,
      LocalDateTime.of(2022, 10, 2, 10, 0),
      tickAt = LocalTime.of(10, 0)).map(_.toString) == Seq("2022-10-01"))
  }

  test("backfill runs every key once, in order") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = Schedule.backfill(Seq("a", "b", "c"))(seen += _)
    assert(n == 3 && seen.toSeq == Seq("a", "b", "c"))
  }

  test("d5 gate: backfilled meta table equals single batch aggregation") {
    val got = Schedule.scheduledBackfill(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val want = Tables.events(spark, sf)
      .groupBy(date_format(to_date(col("ts")), "yyyyMMdd").as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.operators.Analytics.exactSum(col("value"), 30, 2).as("sum_value"))
      .orderBy(col("day"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == want.length && got.sameElements(want),
      "per-day scheduled runs + one re-tick must tile to the batch result")
  }
}
