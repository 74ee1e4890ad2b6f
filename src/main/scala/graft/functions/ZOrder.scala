package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) key over up to 8 columns, for multi-dimensional
  * write-time clustering (`graft.sort-order = zorder(a,b)`).
  *
  * Each child is normalized to an order-preserving unsigned 32-bit rank
  * (sign-flip for ints, IEEE bit-twiddle for floats, first-4-bytes for
  * strings), and the ranks' bits are interleaved MSB-first into one 64-bit
  * key. Sorting by the key gives every data file a small hyper-rectangle
  * of the key space, so min/max stats prune on EVERY z-column — the
  * property a single-column sort only gives its leading column. Same
  * construction as Iceberg/Delta OPTIMIZE ZORDER.
  *
  * Write-path only (one eval per ingested row, never in a query loop), so
  * interpreted eval (CodegenFallback) is fine — clustering cost is
  * dominated by the range-exchange, not key computation.
  */
case class ZOrderKey(children: Seq[Expression])
  extends Expression with CodegenFallback {

  require(children.nonEmpty && children.size <= 8,
    s"zorder takes 1..8 columns, got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  /** Order-preserving unsigned 32-bit rank of a child value (nulls first). */
  private def rank32(value: Any, dt: DataType): Long = {
    if (value == null) return 0L
    dt match {
      // narrow ints scale into the high bits so every z-column carries
      // comparable weight in the interleave
      case ByteType    => (value.asInstanceOf[Byte].toLong + 128L) << 24
      case ShortType   => (value.asInstanceOf[Short].toLong + 32768L) << 16
      case IntegerType | DateType =>
        value.asInstanceOf[Int].toLong + 0x80000000L
      case LongType | TimestampType | TimestampNTZType =>
        (value.asInstanceOf[Long] >> 32) + 0x80000000L
      case FloatType =>
        val b = java.lang.Float.floatToIntBits(value.asInstanceOf[Float])
        val u = if (b < 0) ~b else b | Int.MinValue // IEEE total order
        u.toLong & 0xFFFFFFFFL
      case DoubleType =>
        val b = java.lang.Double.doubleToLongBits(value.asInstanceOf[Double])
        val u = if (b < 0) ~b else b | Long.MinValue
        u >>> 32
      case _: DecimalType =>
        val b = java.lang.Double.doubleToLongBits(
          value.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
        val u = if (b < 0) ~b else b | Long.MinValue
        u >>> 32
      case StringType =>
        val bytes = value.asInstanceOf[UTF8String].getBytes
        var r = 0L
        var i = 0
        while (i < 4) {
          r = (r << 8) | (if (i < bytes.length) bytes(i) & 0xFFL else 0L)
          i += 1
        }
        r
      case other => throw new UnsupportedOperationException(
        s"zorder does not support column type $other")
    }
  }

  override def eval(input: InternalRow): Any = {
    val k = children.size
    val ranks = new Array[Long](k)
    var c = 0
    while (c < k) {
      ranks(c) = rank32(children(c).eval(input), children(c).dataType)
      c += 1
    }
    // Interleave MSB-first, round-robin across columns, into 64 bits.
    var key = 0L
    var out = 0
    var bit = 31 // current bit position (from MSB) within each rank
    while (out < 64) {
      val col = out % k
      if (col == 0 && out > 0) bit -= 1
      val b = if (bit >= 0) (ranks(col) >>> bit) & 1L else 0L
      key = (key << 1) | b
      out += 1
    }
    key ^ Long.MinValue // unsigned z-value → signed-comparable long
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
