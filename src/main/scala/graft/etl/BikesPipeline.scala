package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Calendar, Cdc, Cleanse, Derive}

/** The reference warehouse build re-expressed Spark-first: staging
  * cleansing (ETLScript_withSCDimplementation.py) and the seven DW
  * statements (BikesDWSQl.sql:22-200) as pure DataFrame→DataFrame
  * builders, parameterized by input frames and an `asOf` clock (every
  * `getdate()` site — F11/F12/F13 — is injected for determinism).
  *
  * Scale shape: fact builds are one shuffle on their grain key; dims
  * are broadcast-joined; CDC facts anti-join on the fact grain
  * (pre-aggregation, preserving the reference's order, DW:60-67); no
  * driver-side iteration anywhere (the reference's iterrows() UPDATE
  * loops are replaced by the set-based SCD merges in graft.ops.Scd).
  */
object BikesPipeline {

  /** Staging cleanse for Customer (py:25-45): project → dedup →
    * regex-clean names → parse DOB → derive Age/Agerange at `asOf`.
    */
  def stageCustomer(raw: DataFrame, asOf: Column): DataFrame = {
    val projected = Cleanse.projectThenDedup(raw,
      Seq("customer_id", "first_name", "last_name", "gender", "DOB"))
    val dob = Cleanse.parseDate(col("DOB"))
    projected
      .withColumn("first_name", Cleanse.cleanName(col("first_name")))
      .withColumn("last_name", Cleanse.cleanName(col("last_name")))
      .withColumn("DOB", dob)
      .withColumn("Age", Derive.age(col("DOB"), asOf))
      .withColumn("Agerange", Derive.ageRange(col("Age")))
  }

  /** Generic staging for the simple tables: project-then-dedup plus
    * optional dd-MM-yyyy date parsing (py:125-127 et al.).
    */
  def stage(raw: DataFrame, keep: Seq[String],
      dateCols: Seq[String] = Nil): DataFrame =
    dateCols.foldLeft(Cleanse.projectThenDedup(raw, keep))((df, c) =>
      df.withColumn(c, Cleanse.parseDate(col(c))))

  /** Prdct_Sm_Fct (DW:22-39, full refresh): product×day sales summary. */
  def prdctSmFct(items: DataFrame, orders: DataFrame,
      asOf: Column): DataFrame =
    items.join(orders.select("SalesOrderID", "Date"),
        Seq("SalesOrderID"), "inner")
      .groupBy(col("PRODUCTID").as("Prdct_ID"), col("Date").as("Sl_Dt"))
      .agg(sum("GROSSAMOUNT").as("Sale_Amt"),
        sum("QUANTITY").as("Sale_Qty"))
      .withColumn("DWH_CYC_DT", asOf)

  /** Ordr_Sm_Fct (DW:41-72, incremental CDC): order-grain summary with
    * the conditional Online/Offline split (A3) — only orders whose
    * Ordr_ID is not yet in `existing` are produced (append-ready).
    */
  def ordrSmFct(items: DataFrame, orders: DataFrame, existing: DataFrame,
      asOf: Column): DataFrame = {
    // project the order side before joining: avoids the GROSSAMOUNT
    // name clash with items (order amounts here are item-level sums)
    // and narrows the shuffle
    val newOrders = Cdc.newRows(
      orders.select("SalesOrderID", "customer_id", "StoreID", "Date",
        "Ordertype", "RATING"),
      existing.withColumnRenamed("Ordr_ID", "SalesOrderID"),
      Seq("SalesOrderID"))
    val on = col("Ordertype") === "Online"
    newOrders.join(items, Seq("SalesOrderID"), "inner")
      .groupBy(col("SalesOrderID").as("Ordr_ID"),
        col("customer_id").as("Cust_ID"), col("StoreID").as("Str_ID"),
        col("Date").as("Ordr_Dt"))
      .agg(
        count(lit(1)).as("Itm_Cnt"),
        sum(when(on, 1).otherwise(0)).cast("long").as("On_Itm_Cnt"),
        sum(when(!on, 1).otherwise(0)).cast("long").as("Off_Itm_Cnt"),
        sum("GROSSAMOUNT").as("Ordr_Amt"),
        sum(when(on, col("GROSSAMOUNT")).otherwise(0)).as("On_Ordr_Amt"),
        sum(when(!on, col("GROSSAMOUNT")).otherwise(0)).as("Off_Ordr_Amt"),
        avg("RATING").as("Avg_Rtng"))
      .withColumn("DWH_CYC_DT", asOf)
  }

  /** Ordr_Dtl_Fct (DW:75-106, incremental CDC on the composite grain
    * (SalesOrderID, PRODUCTID)).
    */
  def ordrDtlFct(items: DataFrame, orders: DataFrame, existing: DataFrame,
      asOf: Column): DataFrame = {
    val src = items.join(
      orders.select("SalesOrderID", "customer_id", "StoreID", "Date",
        "RATING"),
      Seq("SalesOrderID"), "inner")
    val newRows = Cdc.newRows(src,
      existing.withColumnRenamed("Ordr_ID", "SalesOrderID")
        .withColumnRenamed("Prdct_ID", "PRODUCTID"),
      Seq("SalesOrderID", "PRODUCTID"))
    newRows
      .groupBy(col("SalesOrderID").as("Ordr_ID"),
        col("PRODUCTID").as("Prdct_ID"),
        col("customer_id").as("Cust_ID"), col("StoreID").as("Str_ID"),
        col("Date").as("Ordr_Dt"))
      .agg(sum("GROSSAMOUNT").as("Sale_Amt"),
        sum("QUANTITY").as("Sale_Qty"),
        avg("RATING").as("Avg_Rtng"))
      .withColumn("DWH_CYC_DT", asOf)
  }

  /** Cust_Dim (DW:108-121, full refresh): business→DW renames. */
  def custDim(customer: DataFrame, asOf: Column): DataFrame =
    customer.select(col("customer_id").as("Cust_ID"),
      col("first_name").as("Cust_Fst_Nm"),
      col("last_name").as("Cust_Lst_Nm"),
      col("gender").as("Gndr"), col("DOB").as("Brth_Dt"),
      col("Age").as("Age"), col("Agerange").as("Age_Rng"))
      .withColumn("DWH_CYC_DT", asOf)

  /** Str_Dim (DW:123-139): Store ⟕ Address enrich. */
  def strDim(store: DataFrame, address: DataFrame, asOf: Column): DataFrame =
    store.join(broadcast(address),
        store("AddressID") === address("ADDRESSID"), "left")
      .select(col("StoreID").as("Str_ID"), col("manager").as("Mgr_Nm"),
        col("CITY").as("Cty_Nm"), col("COUNTRY").as("Ctry_Nm"),
        col("REGION").as("Regn_Nm"), col("phone").as("Phn_No"))
      .withColumn("DWH_CYC_DT", asOf)

  /** Prdct_Dim (DW:141-170): current product versions (P6) enriched via
    * the 4-way left-join chain (J4): category, detail, partner, address.
    */
  def prdctDim(productHist: DataFrame, category: DataFrame,
      detail: DataFrame, partner: DataFrame, address: DataFrame,
      asOf: Column): DataFrame =
    productHist.filter(col("current_flag") === 1)
      .join(broadcast(category), Seq("PRODCATEGORYID"), "left")
      .join(broadcast(detail), Seq("PRODUCTID"), "left")
      .join(broadcast(partner), Seq("PARTNERID"), "left")
      .join(broadcast(address), Seq("ADDRESSID"), "left")
      .select(col("PRODUCTID").as("Prdct_ID"),
        col("PRODUCT_NAME").as("Prdct_Nm"),
        col("PRODCATEGORYNAME").as("Prdct_Ctgry_Nm"),
        col("PRICE").as("Prc_Amt"),
        col("COMPANYNAME").as("Prtnr_Nm"),
        col("CITY").as("Prtnr_Cty_Nm"))
      .withColumn("DWH_CYC_DT", asOf)

  /** Act_Perd_Dim (DW:172-200): the calendar dimension — delegates to
    * the generic generator (C5), which already carries quarter labels,
    * year-month keys and the CYTD/PYTD/CW/PW/4W/13W flags.
    */
  def actPerdDim(spark: SparkSession, start: String, end: String,
      asOf: String): DataFrame =
    Calendar.calendarDim(spark, start, end, asOf)
}
