package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Numeric.idiv

/** Z-ORDER (Morton-curve) clustering keys — multi-column data layout for
  * min/max pruning (SURVEY §2.6 storage-layout generalization).
  *
  * A single-column sort (`key_lookup_sorted`) makes row-group min/max
  * ranges disjoint in ONE dimension; a filter on any other column still
  * reads every file. Interleaving the bits of two normalized columns
  * orders rows along a space-filling curve, so each written file covers a
  * small RECTANGLE of the (a, b) domain — and a selective filter on
  * EITHER column (or both) prunes most files by footer statistics alone.
  * This is the layout recipe behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * built here from plain codegen'd bitwise expressions: no UDF, no custom
  * expression, nothing the optimizer can't see through.
  *
  * [[zval]] expects both inputs already normalized to [0, 65535] (16-bit
  * ranks); [[normalize]] produces that from a value and its min/max
  * bounds. Normalizing first is what makes the curve split BOTH
  * dimensions evenly regardless of their native ranges — interleaving raw
  * values whose domains differ by orders of magnitude degenerates to a
  * single-column sort on the wider one. Bounds come from a one-row
  * aggregate of the input (a scalar pre-pass, broadcast back — the
  * standard pattern; at 100 TB the pass is a footer-only min/max when
  * statistics exist).
  *
  * The bit spread is the classic mask-shift cascade (Morton 1966; the
  * "interleave by binary magic numbers" bit-twiddling recipe): 5
  * shift-or-mask steps place each input bit at even positions, the second
  * column shifts one left, OR combines. All `shiftleft`/`&`/`|` Catalyst
  * expressions — whole-stage-codegen'd per row.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a long. */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Rank `v` into [0, 65535] given its inclusive bounds (degenerate
    * domains map to 0). Integer arithmetic only ([[idiv]] — exact on
    * longs, stays LONG for the bitwise cascade, codegen'd like the
    * rest). */
  def normalize(v: Column, vMin: Column, vMax: Column): Column =
    when(vMax <= vMin, lit(0L)).otherwise(
      idiv((v - vMin).cast("long") * lit(65535L), (vMax - vMin).cast("long")))

  /** 32-bit Morton key of two 16-bit normalized columns: bits of `a` at
    * even positions, bits of `b` at odd. Rows sorted by this key follow
    * the Z-curve through the (a, b) grid. */
  def zval(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
