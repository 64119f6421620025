package graft

/** Public column API over graft's native Catalyst expressions (the
  * implementations live in org.apache.spark.sql.graft — see
  * [[org.apache.spark.sql.graft.DotProduct]] for why).
  */
package object functions {
  type DotProduct = org.apache.spark.sql.graft.DotProduct
  type WordShingles = org.apache.spark.sql.graft.WordShingles
  val VectorExpressions = org.apache.spark.sql.graft.VectorExpressions
  val WordShingles = org.apache.spark.sql.graft.WordShingles
}
