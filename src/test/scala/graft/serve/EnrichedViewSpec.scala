package graft.serve

import graft.SparkSpec
import graft.tables.TableStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Unit semantics of the enriched view's price join: the reference view
  * joins gross price on (product_code, year) ONLY
  * (denormalise_table_query_fmcg.txt:49-51) — a fact row absent from
  * dim_products but present in dim_gross_price still gets a price and a
  * revenue (with null product attributes). VERDICT r4 "What's wrong" #3.
  */
class EnrichedViewSpec extends SparkSpec {
  import spark.implicits._

  test("price-only product still prices; unpriced product falls to zero revenue") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_ev").toString)
    store.overwrite("gold_fact_orders", Seq(
      ("2025-11-01", "P1", "C1", 10.0),
      ("2025-11-01", "P2", "C1", 3.0), // priced but NOT in dim_products
      ("2025-11-01", "P3", "C1", 2.0)  // in neither dim
    ).toDF("date", "product_code", "customer_code", "sold_quantity")
      .withColumn("date", col("date").cast("date")))
    store.overwrite("gold_dim_date",
      graft.clean.Dates.monthSpine(spark, "2025-01-01", "2025-12-01"))
    store.overwrite("gold_dim_customers",
      Seq(("C1", "Cust One", "West", "Web", "DTC"))
        .toDF("customer_code", "customer", "market", "platform", "channel"))
    store.overwrite("gold_dim_products",
      Seq(("P1", "Div", "Cat", "Prod One", "1x"))
        .toDF("product_code", "division", "category", "product", "variant"))
    store.overwrite("gold_dim_gross_price",
      Seq(("P1", 2025, 2.5), ("P2", 2025, 4.0))
        .toDF("product_code", "year", "price_usd"))

    val ev = EnrichedView.build(store)
    val by = ev.collect().map(r => r.getAs[String]("product_code") -> r).toMap
    assert(by.size === 3) // every fact row survives the left joins
    assert(by("P1").getAs[Double]("total_amount") === 25.0)
    assert(by("P1").getAs[String]("division") === "Div")
    // the reference semantics under test: price joins on (code, year) only
    assert(by("P2").getAs[Double]("total_amount") === 12.0)
    assert(by("P2").getAs[String]("division") === null)
    // unpriced → coalesce(price_usd, 0) → zero revenue, row preserved
    assert(by("P3").getAs[Double]("total_amount") === 0.0)
    assert(by("P3").getAs[Any]("price_usd") === null)
  }
}
