package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate keys — SURVEY.md §2.3 F6.
  *
  * Reference: `product_code = sha2(product_name, 256)` — the deterministic
  * surrogate that joins the whole consolidated model
  * (2_products_data_processing.py:177-183). Deterministic hashing (vs
  * monotonically_increasing_id / sequences) is the right call at 100 TB: no
  * coordination, stable across reruns, join keys computable on both sides
  * without a lookup.
  */
object Keys {

  /** sha2-256 hex surrogate from one column (the reference's exact form). */
  def sha2Key(c: Column): Column = sha2(c.cast("string"), 256)

  /** Composite surrogate over several columns, null-tagged so
    * (null, "a") != ("a", null).
    */
  def compositeKey(cols: Column*): Column =
    sha2(concat_ws("\u0001", cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*), 256)
}
