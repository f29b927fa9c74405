package graft

import org.apache.spark.sql.functions._
import graft.etl.BikesPipeline
import graft.ops.Calendar

/** Golden end-to-end invariants of the warehouse build (SURVEY §5.2 /
  * FIXTURES.md) on synthetic frames with the reference's shape:
  * Σ Sale_Amt = Σ item GROSSAMOUNT; fact at order grain; On+Off = total;
  * calendar spine attributes.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val asOf = lit(java.sql.Date.valueOf("2024-06-15"))
  private val d1 = java.sql.Date.valueOf("2019-03-01")
  private val d2 = java.sql.Date.valueOf("2019-03-02")

  // orders: (id, org, gross, type, store, date, rating, cust)
  private def orders = Seq(
    (100L, "AMER", 50L, "Online", 1L, d1, 4L, 7L),
    (101L, "EMEA", 70L, "Offline", 2L, d1, 5L, 8L),
    (102L, "APJ", 30L, "Online", 1L, d2, 3L, 7L))
    .toDF("SalesOrderID", "SALESORG", "GROSSAMOUNT", "Ordertype",
      "StoreID", "Date", "RATING", "customer_id")

  // items: (itemId, product, order, gross, qty)
  private def items = Seq(
    (1L, "BX-1001", 100L, 30L, 2L), (2L, "RO-2001", 100L, 20L, 1L),
    (3L, "BX-1001", 101L, 70L, 3L), (4L, "RO-2001", 102L, 30L, 2L))
    .toDF("SalesOrderItemsID", "PRODUCTID", "SalesOrderID",
      "GROSSAMOUNT", "QUANTITY")

  test("prdctSmFct: Σ Sale_Amt equals Σ item GROSSAMOUNT; grain is " +
    "product × day") {
    val fct = BikesPipeline.prdctSmFct(items, orders, asOf)
    assert(fct.agg(sum("Sale_Amt")).head().getLong(0) == 150L)
    assert(fct.count() == 3) // (BX,d1), (RO,d1), (RO,d2)
    assert(fct.filter($"Prdct_ID" === "BX-1001" && $"Sl_Dt" === d1)
      .head().getAs[Long]("Sale_Amt") == 100L)
  }

  test("ordrSmFct: order grain, On/Off split sums to total, CDC " +
    "excludes already-loaded orders and re-run is empty") {
    val empty = Seq.empty[Long].toDF("Ordr_ID")
    val fct = BikesPipeline.ordrSmFct(items, orders, empty, asOf).persist()
    assert(fct.count() == 3) // one row per order
    val checks = fct.withColumn("ok",
      $"On_Itm_Cnt" + $"Off_Itm_Cnt" === $"Itm_Cnt" &&
        $"On_Ordr_Amt" + $"Off_Ordr_Amt" === $"Ordr_Amt")
    assert(checks.filter(!$"ok").count() == 0)
    assert(fct.filter($"Ordr_ID" === 100L).head()
      .getAs[Long]("Ordr_Amt") == 50L) // item gross: 30+20
    // second run against the loaded fact appends nothing
    val rerun = BikesPipeline.ordrSmFct(items, orders,
      fct.select("Ordr_ID"), asOf)
    assert(rerun.count() == 0)
  }

  test("ordrDtlFct: composite-grain CDC") {
    val empty = Seq.empty[(Long, String)].toDF("Ordr_ID", "Prdct_ID")
    val fct = BikesPipeline.ordrDtlFct(items, orders, empty, asOf)
    assert(fct.count() == 4) // order×product combos
    val partial = fct.filter($"Ordr_ID" === 100L)
      .select("Ordr_ID", "Prdct_ID")
    val rerun = BikesPipeline.ordrDtlFct(items, orders, partial, asOf)
    assert(rerun.count() == 2) // only order 101/102 rows remain new
  }

  test("strDim left-join enrich keeps stores without address") {
    val store = Seq((1L, "Ann", 10L, "123"), (2L, "Bob", 99L, "456"))
      .toDF("StoreID", "manager", "AddressID", "phone")
    val addr = Seq((10L, "Lyon", "France", "EMEA", 69000L))
      .toDF("ADDRESSID", "CITY", "COUNTRY", "REGION", "POSTALCODE")
    val dim = BikesPipeline.strDim(store, addr, asOf)
    assert(dim.count() == 2)
    assert(dim.filter($"Str_ID" === 2L).head().getAs[String]("Cty_Nm")
      == null)
  }

  test("calendarDim: spine covers range; attributes correct for a " +
    "known date") {
    val cal = Calendar.calendarDim(spark, "2024-01-01", "2024-12-31",
      "2024-06-15")
    assert(cal.count() == 366) // 2024 is a leap year
    val jun15 = cal.filter($"date_val" === "2024-06-15").head()
    assert(jun15.getAs[String]("weekday_name") == "Saturday")
    assert(jun15.getAs[Long]("weekday_num") == 7L)
    assert(jun15.getAs[String]("quarter_label") == "Q2")
    assert(jun15.getAs[Long]("year_month") == 202406L)
    assert(jun15.getAs[String]("cytd_flag") == "Y")
    assert(jun15.getAs[String]("cw_flag") == "Y")
    // ISO week check: 2024-01-01 is a Monday → week 1
    assert(cal.filter($"date_val" === "2024-01-01").head()
      .getAs[Long]("week_of_year") == 1L)
  }

  test("stageCustomer: full staging path (project+dedup+clean+age)") {
    val raw = Seq(
      (10L, "Laraine@%", "Medendorp@@", "F", "12-10-1953", "IT", "Mass", "N"),
      (10L, "Laraine@%", "Medendorp@@", "F", "12-10-1953", "Retail", "HNW",
        "N"),
      (11L, "Sheila-kathryn", "Smith", "F", "01-01-1990", "IT", "Mass", "N"))
      .toDF("customer_id", "first_name", "last_name", "gender", "DOB",
        "job_industry_category", "wealth_segment", "deceased_indicator")
    val staged = BikesPipeline.stageCustomer(raw,
      lit(java.sql.Date.valueOf("2024-06-15"))).persist()
    assert(staged.count() == 2) // post-projection dedup collapses id 10
    val r10 = staged.filter($"customer_id" === 10L).head()
    assert(r10.getAs[String]("first_name") == "Laraine")
    assert(r10.getAs[java.sql.Date]("DOB").toString == "1953-10-12")
    assert(r10.getAs[Long]("Age") == 70L)
    // right-closed pd.cut: (60,70] → '60-69', so age 70 is NOT '70+'
    assert(r10.getAs[String]("Agerange") == "60-69")
    assert(staged.filter($"customer_id" === 11L).head()
      .getAs[String]("first_name") == "Sheilakathryn")
  }
}
