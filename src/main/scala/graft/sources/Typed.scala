package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset[T] surface over the testdata tables — compile-time
  * field checks where a case class models the row (SURVEY §1.3:
  * DataFrame for dynamic schemas, Dataset[T] where type safety helps).
  */
object Typed {

  final case class Lineitem(l_orderkey: Long, l_partkey: Long,
      l_suppkey: Long, l_linenumber: Int, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  final case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double,
      o_orderdate: java.sql.Timestamp, o_orderpriority: String)

  final case class Customer(c_custkey: Long, c_name: String,
      c_nationkey: Int, c_acctbal: Double, c_mktsegment: String)

  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float],
      label: Int)

  def lineitem(s: SparkSession, dir: String): Dataset[Lineitem] = {
    import s.implicits._
    Tables(s, dir, "lineitem").as[Lineitem]
  }
  def orders(s: SparkSession, dir: String): Dataset[Order] = {
    import s.implicits._
    Tables(s, dir, "orders").as[Order]
  }
  def customer(s: SparkSession, dir: String): Dataset[Customer] = {
    import s.implicits._
    Tables(s, dir, "customer").as[Customer]
  }
  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    Tables(s, dir, "documents").as[Document]
  }
  def embeddings(s: SparkSession, dir: String): Dataset[Embedding] = {
    import s.implicits._
    Tables(s, dir, "embeddings").as[Embedding]
  }

  /** Register every testdata table as a temp view (plus the graft SQL
    * functions if the session was built with GraftExtensions), so the
    * whole surface is reachable from `spark.sql(...)`.
    */
  def registerViews(s: SparkSession, dir: String): Unit =
    Tables.names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
}
