package graft.serve

import graft.tables.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BI serving layer: the 4-way star enrichment view + the dashboard query
  * library (Tableu dashboard/denormalise_table_query_fmcg.txt:1-52;
  * README.md:194-208 KPI workload).
  *
  * Standardizes on `price_usd`/`total_amount` (the reference view's
  * `price_inr` columns fail analysis as written — SURVEY.md §3 EP3).
  *
  * Plan shape at scale: fact scan + 4 BroadcastHashJoins (dims are orders of
  * magnitude smaller than the fact — broadcast explicitly, no shuffle of the
  * fact), aggregates on top. Column pruning pushes the narrow KPI
  * projections into the fact scan.
  */
object EnrichedView {

  /** fact ⟕ dim_date ⟕ dim_customers ⟕ dim_products ⟕ dim_gross_price
    * (compound key product_code + year) with derived revenue.
    */
  def build(store: TableStore): DataFrame = {
    val fact = store.read("gold_fact_orders")
    val dimDate = broadcast(store.read("gold_dim_date"))
    val dimCust = broadcast(store.read("gold_dim_customers"))
    val dimProd = broadcast(store.read("gold_dim_products"))
    val dimPrice = broadcast(store.read("gold_dim_gross_price"))
    fact
      .join(dimDate, fact("date") === dimDate("month_start_date"), "left")
      .join(dimCust, Seq("customer_code"), "left")
      .join(dimProd, Seq("product_code"), "left")
      // price joins on (product_code, year) ONLY — matching the reference
      // view exactly (denormalise_table_query_fmcg.txt:49-51): a fact row
      // missing from dim_products but priced in dim_gross_price still gets
      // its price (and a revenue), with null product attributes.
      .join(dimPrice,
        dimPrice("product_code") === fact("product_code") &&
          dimPrice("year") === year(fact("date")), "left")
      .select(
        fact("date"), col("date_key"), col("year_quarter"),
        fact("product_code"), col("division"), col("category"),
        col("product"), col("variant"),
        col("customer_code"), col("customer"), col("market"),
        col("platform"), col("channel"),
        col("sold_quantity"), col("price_usd"),
        (col("sold_quantity") * coalesce(col("price_usd"), lit(0.0))).as("total_amount"))
  }

  // ---- dashboard workload (README.md:194-208) ----

  /** KPI cards: Revenue, Quantity, #Customers, ASP. Sums keep the input
    * column type (decimal in → exact decimal out); ASP divides the
    * double-cast sums so the division is plain IEEE arithmetic regardless
    * of input type (decimal÷decimal result scales differ between engines —
    * double division replays identically everywhere).
    */
  def kpis(enriched: DataFrame): DataFrame =
    enriched.agg(
      sum("total_amount").as("revenue"),
      sum("sold_quantity").as("quantity"),
      countDistinct("customer_code").as("n_customers"),
      (sum("total_amount").cast("double") / sum("sold_quantity").cast("double")).as("asp"))

  def topProducts(enriched: DataFrame, n: Int = 10): DataFrame =
    enriched.groupBy("product_code", "product")
      .agg(sum("total_amount").as("revenue"))
      .orderBy(col("revenue").desc, col("product_code")).limit(n)

  def topCustomers(enriched: DataFrame, n: Int = 10): DataFrame =
    enriched.groupBy("customer_code", "customer")
      .agg(sum("total_amount").as("revenue"))
      .orderBy(col("revenue").desc, col("customer_code")).limit(n)

  def revenueBy(enriched: DataFrame, dim: String): DataFrame =
    enriched.groupBy(dim)
      .agg(sum("total_amount").as("revenue"), sum("sold_quantity").as("quantity"))
      .orderBy(col("revenue").desc, col(dim))

  def monthlyTrend(enriched: DataFrame): DataFrame =
    enriched.groupBy("date")
      .agg(sum("total_amount").as("revenue"), sum("sold_quantity").as("quantity"))
      .orderBy("date")
}
