package graft.pipeline

import graft.SparkSpec
import graft.serve.EnrichedView
import graft.tables.TableStore
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** End-to-end replay of the reference's OWN data through the full pipeline,
  * asserting the shipped dashboard's aggregate anchors (BASELINE.md:32-37;
  * `Tableu dashboard/Dashboard 1.png`):
  *
  *   - Quantity KPI  ≈ 39.05M
  *   - distinct customers = 54
  *   - avg selling price ≈ $307
  *   - channel revenue share Retail 58.32% / Acquisition 26.58% / DTC 15.10%
  *   - market revenue share Northeast 32.86% / Midwest 28.31% /
  *     South 24.05% / West Coast 14.78%
  *
  * Flow mirrors the reference's notebook order (SURVEY.md §1.2): parent full
  * load seeds gold (A5) → child dim pipelines (customer/product/pricing) →
  * child fact full load over the unzipped landing CSVs (1_full_load_fact.py)
  * → parent COPY INTO increment
  * (incremental_data_parent_company_query.txt:2-12) → child incremental
  * orders with affected-month recompute (2_incremental_load_fact.py).
  */
class ReferenceReplaySpec extends SparkSpec {

  private val ref = "/root/reference"
  private val child = s"$ref/Powerbite_nutrition_Child_company"
  private val parent = s"$ref/Summit_Sporting_Goods_parent_company"

  /** Extract landing.zip's CSVs flat into a temp dir, skipping macOS
    * metadata entries (`__MACOSX/`, `._*` AppleDouble files) — the
    * reference's zip carries both.
    */
  private def unzipLanding(): String = {
    val out = Files.createTempDirectory("graft_landing")
    val zf = new ZipFile(s"$child/full_load/orders/landing.zip")
    try {
      zf.entries().asScala.foreach { e =>
        val base = Paths.get(e.getName).getFileName.toString
        if (!e.isDirectory && !e.getName.contains("__MACOSX") &&
            !base.startsWith("._") && base.endsWith(".csv")) {
          val in = zf.getInputStream(e)
          try Files.copy(in, out.resolve(base), StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    out.toString
  }

  test("reference replay reproduces the shipped dashboard anchors") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_replay").toString)

    Pipelines.seedParent(spark, store, s"$parent/full_load")
    Pipelines.runDimCustomers(spark, store, s"$child/full_load/customers/customers.csv")
    Pipelines.runDimProducts(spark, store, s"$child/full_load/products/products.csv")
    Pipelines.runDimPricing(spark, store, s"$child/full_load/gross_price/gross_price.csv")
    Pipelines.runFactFull(spark, store, unzipLanding())
    Pipelines.copyParentIncrement(spark, store, s"$parent/incremental_load")
    Pipelines.runFactIncremental(spark, store, s"$child/incremental_load/orders")

    val enriched = EnrichedView.build(store).cache()
    try {
      val k = EnrichedView.kpis(enriched).head()
      val quantity = k.getAs[Double]("quantity")
      val nCustomers = k.getAs[Long]("n_customers")
      val asp = k.getAs[Double]("asp")
      info(f"quantity=$quantity%.0f customers=$nCustomers asp=$asp%.2f")

      // KPI card shows 39.05M — two-decimal rounding in millions
      assert(math.abs(quantity / 1e6 - 39.05) < 0.005,
        s"quantity $quantity does not round to 39.05M")
      assert(nCustomers === 54L)
      // KPI card shows $307 (rounded to the dollar)
      assert(math.abs(asp - 307.0) < 0.5, s"ASP $asp does not round to $$307")

      // The dashboard's pies are QUANTITY shares over rows with a non-null
      // dim value (child $12-30 nutrition products can't reach 26.58% of
      // *revenue* against $275-574 parent sporting goods — verified by
      // recomputation: quantity shares reproduce all 7 published percents
      // to ±0.01, revenue shares don't come close).
      def shares(dim: String): Map[String, Double] = {
        val rows = EnrichedView.revenueBy(enriched, dim)
          .filter(col(dim).isNotNull).collect()
        val total = rows.map(_.getAs[Double]("quantity")).sum
        rows.map(r => r.getAs[String](dim) -> r.getAs[Double]("quantity") / total * 100).toMap
      }
      // Tableau rounds display percents; recomputed values land within 0.015
      // of the published labels (e.g. 58.326 vs "58.32").
      val tol = 0.015
      val ch = shares("channel")
      info(ch.map { case (c, s) => f"$c $s%.2f%%" }.mkString("channel: ", ", ", ""))
      assert(math.abs(ch("Retail") - 58.32) < tol)
      assert(math.abs(ch("Acquisition") - 26.58) < tol)
      assert(math.abs(ch("DTC") - 15.10) < tol)

      val mk = shares("market")
      info(mk.map { case (m, s) => f"$m $s%.2f%%" }.mkString("market: ", ", ", ""))
      assert(math.abs(mk("Northeast") - 32.86) < tol)
      assert(math.abs(mk("Midwest") - 28.31) < tol)
      assert(math.abs(mk("South") - 24.05) < tol)
      assert(math.abs(mk("West Coast") - 14.78) < tol)
    } finally enriched.unpersist()
  }
}
