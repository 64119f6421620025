package graft.model

import org.apache.spark.sql.types._

/** Gold star-schema model — SURVEY.md §1.1/§1.2.
  *
  * Case classes give typed `Dataset[T]` access to the fixed consolidated
  * schemas; `StructType`s pin the raw CSV layouts so fixture reads never
  * depend on inference (SURVEY §4: determinism + one less full scan).
  *
  * Deliberate divergences from the reference, documented per SURVEY §7.5:
  *   - `DimGrossPrice.year` is Int (reference merges string years into an
  *     int column, 3_pricing_data_processing.py:247-250)
  *   - enriched view standardizes on `price_usd`/`total_amount` (the
  *     reference view's `price_inr` columns fail analysis as written,
  *     Tableu dashboard/denormalise_table_query_fmcg.txt:29-32)
  */
object Star {

  // ---- gold consolidated (SURVEY §1.2) ----
  final case class DimDate(
      month_start_date: java.sql.Date, date_key: Int, year: Int,
      month_name: String, month_short_name: String,
      quarter: String, year_quarter: String)

  final case class DimCustomer(
      customer_code: String, customer: String, market: String,
      platform: String, channel: String)

  final case class DimProduct(
      product_code: String, division: String, category: String,
      product: String, variant: String)

  final case class DimGrossPrice(product_code: String, price_usd: Double, year: Int)

  final case class FactOrder(
      date: java.sql.Date, product_code: String,
      customer_code: String, sold_quantity: Double)

  // ---- raw child CSV layouts (SURVEY §1.2, FIXTURES.md A1-A4) ----
  val rawCustomers: StructType = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("customer_name", StringType),
    StructField("city", StringType)))

  val rawProducts: StructType = StructType(Seq(
    StructField("product_name", StringType),
    StructField("product_id", StringType),
    StructField("category", StringType)))

  val rawGrossPrice: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("month", StringType),
    StructField("gross_price", StringType)))

  val rawOrders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_placement_date", StringType),
    StructField("customer_id", StringType),
    StructField("product_id", StringType),
    StructField("order_qty", DoubleType)))

  // ---- parent CSV layouts (already gold-shaped, FIXTURES.md A5) ----
  val parentDimCustomers: StructType = StructType(Seq(
    StructField("customer_code", StringType),
    StructField("customer", StringType),
    StructField("market", StringType),
    StructField("platform", StringType),
    StructField("channel", StringType)))

  val parentDimProducts: StructType = StructType(Seq(
    StructField("product_code", StringType),
    StructField("division", StringType),
    StructField("category", StringType),
    StructField("product", StringType),
    StructField("variant", StringType)))

  val parentDimGrossPrice: StructType = StructType(Seq(
    StructField("product_code", StringType),
    StructField("price_usd", DoubleType),
    StructField("year", IntegerType)))

  val parentFactOrders: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("product_code", StringType),
    StructField("customer_code", StringType),
    StructField("sold_quantity", LongType)))
}
