package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter as a pure Column predicate — the GPT-3/PaLM-style
  * decontamination primitive (Brown et al. 2020 §C use 13-gram bloom
  * membership to scrub benchmark overlap from the training corpus; Dolma's
  * dedup tooling ships the same shape): hash the SMALL side's n-grams into a
  * bit array once, then test the 100 TB side map-side on its own scan, so
  * only probable hits ever reach a shuffle.
  *
  * Spark-first construction — no UDFs, no private APIs:
  *   - build: positions are Kirsch–Mitzenmacher double hashes
  *     (`pmod(h1 + i·h2, m)` over `xxhash64`), OR-folded into 64-bit cells
  *     by a `bit_or` hash-aggregation; the ≤ m/64-row cell table collects to
  *     the driver (driver-bounded by the CALLER's `numBits` — 2²⁴ bits is a
  *     2 MiB array; the contract is the filter is broadcast-sized, exactly
  *     like Spark's own `DataFrameStatFunctions.bloomFilter`).
  *   - probe: the bit array rides the plan as an array LITERAL (one shared
  *     object reference in codegen, broadcast with the task binary), and
  *     membership is `element_at` + bitwise AND — whole-stage-codegen'd,
  *     pushed to the scan like any other filter, zero exchanges.
  *
  * No false negatives by construction (build and probe run the identical
  * hash family), so using [[Filter.mightContain]] as a PRE-filter before an
  * exact join never changes the join's result — it only shrinks the big
  * side's shuffle to (true hits + fpp·|big|) rows. The DuckDB oracle of a
  * bloomed query therefore needs no bloom at all: it replays the exact
  * semantics the filter preserves.
  */
object Bloom {

  /** Fixed odd offset mixed into `xxhash64` for the second base hash —
    * any constant distinct from the default seed works; this one is the
    * 32-bit golden ratio used by the K-M construction's references. */
  private val H2Seed = 0x9e3779b9L

  private def positions(c: Column, numBits: Long, numHashes: Int): Seq[Column] = {
    // both base hashes reduced mod m BEFORE the K-M combination: ANSI mode
    // (Spark 4 default) throws on long overflow, and h1 + i·h2 over raw
    // 64-bit hashes overflows almost surely. Reduced, the max intermediate
    // is (1 + i)·(m-1) < 2^34 — overflow-free, and the combined value is
    // congruent mod m to the unreduced form, so the hash family is the same.
    val h1 = pmod(xxhash64(c), lit(numBits))
    val h2 = pmod(xxhash64(c, lit(H2Seed)), lit(numBits))
    (0 until numHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(numBits)))
  }

  /** A built filter: `bits` is the cell array (64 bits per cell, position p
    * lives in cell p>>6 at mask 1L<<(p&63)); `numBits = bits.length · 64`.
    */
  final case class Filter(bits: Array[Long], numHashes: Int) {
    def numBits: Long = bits.length.toLong * 64

    /** Membership predicate, fully codegen'd: k (element_at + AND + ≠0)
      * conjuncts over two array literals. False positives possible at the
      * configured rate; false negatives never (same hash family as build).
      */
    def mightContain(c: Column): Column = {
      val cells = typedLit(bits)
      val masks = typedLit((0 until 64).map(i => 1L << i).toArray)
      positions(c, numBits, numHashes).map { p =>
        val cell = element_at(cells, shiftright(p, 6).cast("int") + 1)
        val mask = element_at(masks, p.bitwiseAND(lit(63L)).cast("int") + 1)
        cell.bitwiseAND(mask) =!= 0
      }.reduce(_ && _)
    }
  }

  /** Build a filter over `c` of every row of `df`. `numBits` rounds up to a
    * multiple of 64; with n distinct items, `numBits ≈ 16n` and
    * `numHashes = 5` give fpp ≈ 10⁻³ — ample for a pre-filter whose false
    * positives an exact join removes anyway. One narrow aggregation job
    * (explode k positions → bit_or per cell) and one ≤ numBits/64-row
    * collect; an empty `df` yields the all-zero filter (membership
    * constant-false).
    */
  def build(df: DataFrame, c: Column, numBits: Long, numHashes: Int = 5): Filter = {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numBits <= (1L << 31), s"numBits must be <= 2^31, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val nCells = ((numBits + 63) / 64).toInt
    val m = nCells.toLong * 64
    val cells = df
      .select(explode(array(positions(c, m, numHashes): _*)).as("_p"))
      .select(shiftright(col("_p"), 6).cast("int").as("_cell"),
        expr("shiftleft(1L, cast(_p & 63 as int))").as("_mask"))
      .groupBy(col("_cell")).agg(expr("bit_or(_mask)").as("_bits"))
      .collect()
    val bits = new Array[Long](nCells)
    cells.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    Filter(bits, numHashes)
  }

  /** `numBits` for an expected distinct-item count at the default 16
    * bits/item (fpp ≈ 10⁻³ with 5 hashes), clamped to [2¹⁴, 2³⁰]. */
  def sizeFor(expectedItems: Long): Long =
    math.min(1L << 30, math.max(1L << 14, expectedItems * 16))
}
