package graft.etl

import org.apache.spark.sql.types._

/** Explicit source schemas for the nine bikes-warehouse inputs —
  * schema-on-read, no inference in production paths (SURVEY §1.2;
  * DDL: Createtables_BIKES.sql:40-118). Date columns arrive as
  * `dd-MM-yyyy` strings (parsed by Cleanse.parseDate); money/quantity
  * are integral longs (all CSV money values are integers, SURVEY §1.3).
  */
object Schemas {

  val customer: StructType = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("gender", StringType),
    StructField("DOB", StringType),
    StructField("job_industry_category", StringType), // dropped by ETL
    StructField("wealth_segment", StringType),        // dropped by ETL
    StructField("deceased_indicator", StringType)))   // dropped by ETL

  val address: StructType = StructType(Seq(
    StructField("ADDRESSID", LongType),
    StructField("CITY", StringType),
    StructField("COUNTRY", StringType),
    StructField("REGION", StringType),
    StructField("POSTALCODE", LongType)))

  val businessPartner: StructType = StructType(Seq(
    StructField("PARTNERID", LongType),
    StructField("EMAILADDRESS", StringType),
    StructField("ADDRESSID", LongType),
    StructField("COMPANYNAME", StringType)))

  val productCategory: StructType = StructType(Seq(
    StructField("PRODCATEGORYID", StringType),
    StructField("PRODCATEGORYNAME", StringType)))

  val product: StructType = StructType(Seq(
    StructField("PRODUCTID", StringType),
    StructField("PRODCATEGORYID", StringType),
    StructField("PARTNERID", LongType),
    StructField("PRICE", LongType)))

  val productDetail: StructType = StructType(Seq(
    StructField("PRODUCTID", StringType),
    StructField("PRODUCT_NAME", StringType)))

  val store: StructType = StructType(Seq(
    StructField("StoreID", LongType),
    StructField("manager", StringType),
    StructField("AddressID", LongType),
    StructField("phone", StringType)))

  val salesOrder: StructType = StructType(Seq(
    StructField("SalesOrderID", LongType),
    StructField("PARTNERID", LongType),  // dropped by ETL
    StructField("SALESORG", StringType),
    StructField("GROSSAMOUNT", LongType),
    StructField("Ordertype", StringType),
    StructField("StoreID", LongType),
    StructField("Date", StringType),
    StructField("RATING", LongType),
    StructField("customer_id", LongType)))

  val salesOrderItems: StructType = StructType(Seq(
    StructField("SalesOrderItemsID", LongType),
    StructField("PRODUCTID", StringType),
    StructField("SalesOrderID", LongType),
    StructField("GROSSAMOUNT", LongType),
    StructField("QUANTITY", LongType)))
}
