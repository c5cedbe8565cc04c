package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` views of the harness tables — for call sites
  * where compile-time field checking matters more than dynamic schema
  * (SURVEY.md §1.4: the engine is DataFrame-first, with typed views
  * where domain logic benefits). Encoders are derived from the case
  * classes; Catalyst still sees the same logical plans, so pushdown,
  * pruning and codegen are unchanged.
  */
object Typed {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).as[Order]
  }

  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, dir).as[Customer]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }
}
