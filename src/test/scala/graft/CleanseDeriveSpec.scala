package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cleanse, Derive}

/** SURVEY §5.1 priority cases: dirty-name strip (incl. hyphen),
  * post-projection dedup ordering, dd-MM-yyyy parsing, exact floor-age
  * (Feb-29 edge), right-closed age buckets (age 30 → '18-29').
  */
class CleanseDeriveSpec extends SparkSpec {
  import spark.implicits._

  test("cleanName strips non-word chars including hyphens") {
    val df = Seq("Laraine@%", "Eli#", "Dearle*", "Sheila-kathryn", "Bockman##")
      .toDF("n").select(Cleanse.cleanName($"n").as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("Laraine", "Eli", "Dearle", "Sheilakathryn", "Bockman"))
  }

  test("projectThenDedup: duplicates appearing only after projection " +
    "collapse (customer-10 case); raw-row dedup would keep both") {
    val df = Seq((10L, "A", "IT"), (10L, "A", "Retail"), (11L, "B", "IT"))
      .toDF("id", "name", "dropped")
    assert(Cleanse.projectThenDedup(df, Seq("id", "name")).count() == 2)
    assert(df.dropDuplicates().count() == 3) // the wrong order keeps 3
  }

  test("parseDate is day-first (dd-MM-yyyy)") {
    val d = Seq("12-10-1953").toDF("s")
      .select(Cleanse.parseDate($"s").as("d"))
      .as[java.sql.Date].head()
    assert(d.toString == "1953-10-12") // 12 Oct, not Dec 10
  }

  test("age: exact floor with birthday correction") {
    def ageOf(dob: String, asOf: String): Long =
      Seq(dob).toDF("dob")
        .select(Derive.age(to_date($"dob"), to_date(lit(asOf))).as("a"))
        .as[Long].head()
    assert(ageOf("2000-06-15", "2025-06-15") == 25) // birthday today
    assert(ageOf("2000-06-16", "2025-06-15") == 24) // tomorrow
    assert(ageOf("2000-06-14", "2025-06-15") == 25) // yesterday
    assert(ageOf("2000-02-29", "2025-02-28") == 24) // Feb-29 not reached
    assert(ageOf("2000-02-29", "2025-03-01") == 25)
  }

  test("ageRange: right-closed pd.cut bins — 30 in '18-29', 40 in " +
    "'30-39', <18 and >120 null") {
    val df = Seq(17L, 18L, 30L, 31L, 40L, 70L, 71L, 120L, 121L).toDF("age")
      .select($"age", Derive.ageRange($"age").as("r"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(17L) == null && m(121L) == null)
    assert(m(18L) == "18-29" && m(30L) == "18-29")
    assert(m(31L) == "30-39" && m(40L) == "30-39")
    assert(m(70L) == "60-69" && m(71L) == "70+" && m(120L) == "70+")
  }

  test("quarterLabel / yearMonth / ytdFlag / rollingWeekFlag") {
    val d = to_date(lit("2024-06-15")) // a Saturday
    val asOf = to_date(lit("2024-06-17"))
    val row = spark.range(1).select(
      Derive.quarterLabel(d).as("q"), Derive.yearMonth(d).as("ym"),
      Derive.ytdFlag(d, asOf, 0).as("cytd"),
      Derive.ytdFlag(d, asOf, 1).as("pytd"),
      Derive.rollingWeekFlag(d, asOf, 0).as("cw"),
      Derive.rollingWeekFlag(d, asOf, 1).as("pw")).head()
    assert(row.getString(0) == "Q2" && row.getLong(1) == 202406L)
    assert(row.getString(2) == "Y" && row.getString(3) == "N")
    // week of 2024-06-17 (Mon) starts Sunday 2024-06-16 → the 15th is
    // before this week but inside the previous week
    assert(row.getString(4) == "N" && row.getString(5) == "Y")
  }
}
