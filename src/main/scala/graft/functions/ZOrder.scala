package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: interleave the low `bits` bits of
  * k non-negative integer columns so that sorting by the ONE key
  * co-locates rows that are close in EVERY dimension — the
  * multi-dimensional file-skipping layout (Delta/Iceberg OPTIMIZE
  * ZORDER BY) that single-column sort-clustering cannot give: sorted
  * by x alone, every file spans the full y range, and a y-predicate
  * prunes nothing.
  *
  * Pure column math (21·k shift-and-or ops, whole-stage codegen'd —
  * the q_random_projection literal-chain pattern), no UDF, no native
  * expression needed. Callers pre-normalize each dimension into
  * [0, 2^bits) — rank, hash-bucket, or min/max scale; the interleave
  * assumes uniform-ish bit usage to balance the curve.
  */
object ZOrder {

  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits ($bits) × dims (${cols.size}) must fit a signed long")
    val k = cols.size
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * k + i)
      }
    }.reduce(_.bitwiseOR(_))
  }
}
