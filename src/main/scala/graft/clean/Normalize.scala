package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String/id normalization column library — SURVEY.md §2.3 F1-F10.
  *
  * Every helper returns a `Column` (stays inside whole-stage codegen) or a
  * narrow DataFrame transform; no UDFs anywhere, matching the reference's
  * all-built-in style (SURVEY §2.5 note).
  */
object Normalize {

  /** F1/F2 — trim + null-guarded Title Case
    * (1_customer_data_processing.py:93, 151-157).
    */
  def cleanName(c: Column): Column =
    when(c.isNotNull, initcap(trim(c))).otherwise(lit(null))

  /** F3 — case-insensitive misspelling fix, e.g. Protien→Protein
    * (2_products_data_processing.py:126-136).
    */
  def fixSpelling(c: Column, from: String, to: String): Column =
    regexp_replace(c, s"(?i)$from", to)

  /** F8 — literal-map lookup with unknown→null
    * (1_customer:122-137: `create_map(...).getItem(col)`).
    */
  def mapLookup(c: Column, m: Map[String, String]): Column =
    typedLit(m).getItem(c)

  /** F8+F10 — map-normalize values, passing through values already valid and
    * nulling unknowns (1_customer:104-137 city normalization).
    */
  def normalizeViaMap(c: Column, valid: Seq[String], fixes: Map[String, String]): Column =
    when(c.isin(valid: _*), c).otherwise(typedLit(fixes).getItem(c))

  /** F9+F5 — invalid-id fallback: ids failing `^[0-9]+$` become `fallback`
    * (2_products:185-191, 1_full_load_fact:102-107: noise ids
    * ABC987/XYZ123/INVALID → "999999").
    */
  def numericIdOrFallback(c: Column, fallback: String = "999999"): Column =
    when(c.rlike("^[0-9]+$"), c).otherwise(lit(fallback))

  /** F5+F9+F17 — price sanitation: non-numeric → 0.0, negative → abs
    * (3_pricing_data_processing.py:135-141: `unknown`/`not_available` → 0,
    * `-8.4` → 8.4).
    */
  def sanitizePrice(c: Column): Column = {
    val numeric = when(c.rlike("^-?\\d+(\\.\\d+)?$"), c.cast("double")).otherwise(lit(0.0))
    abs(numeric)
  }

  /** F7 — `name-city` display label with Unknown fallback
    * (1_customer:221-228).
    */
  def labelWithFallback(name: Column, qualifier: Column, fallback: String = "Unknown"): Column =
    concat_ws("-", name, coalesce(qualifier, lit(fallback)))

  /** A2 made deterministic — keep one row per key, ordered by `order`
    * ascending (SURVEY §7.5: reference `dropDuplicates` winners are
    * nondeterministic; ours are pinned by explicit ordering).
    */
  def dedupKeep(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_gm_rn", row_number().over(w))
      .filter(col("_gm_rn") === 1).drop("_gm_rn")
  }
}
