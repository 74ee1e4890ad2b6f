package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual hash of an opaque media payload (VERDICT r8 #2) — the
  * dHash recipe (difference hash: downscale, then each bit compares two
  * adjacent downscaled samples) applied to the byte stream: the payload's
  * `n` bytes are partitioned into 65 position buckets (byte `i` goes to
  * bucket `⌊i·65/n⌋` — every bucket within one byte of `n/65` long), each
  * bucket reduces to its unsigned-byte SUM, and bit `b` of the signature
  * is `sum[b+1] > sum[b]`. Two payloads differing by a localized edit
  * perturb only the buckets the edit touches, so their signatures sit
  * within a small Hamming distance — the property the pigeonhole-banded
  * near-dup join (q_image_neardup) exploits, exactly as SimHash64 for
  * text. A real image deployment runs the same recipe over decoded
  * luma rows instead of raw bytes (the decode stub is the container's
  * documented stand-in — Multimodal.scala); everything from the bucket
  * reduction down is this code unchanged.
  *
  * Pure integer math in a fixed order → engine-exact: the DuckDB oracle
  * twin reproduces every signature bit-for-bit (the q_simhash promotion
  * pattern). One pass per row, no shuffle, embarrassingly parallel.
  * NULL payload → NULL; the empty payload hashes to 0 (all buckets
  * empty, no strict increase anywhere). */
case class DHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DHash64 needs a binary payload, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = bytes.length.toLong
    val sums = new Array[Long](65)
    var i = 0
    while (i < bytes.length) {
      // bucket-of-position form; the oracle's per-bucket ranges use the
      // ceil-boundary dual [⌈bn/65⌉, ⌈(b+1)n/65⌉) — identical partitions
      sums(((i.toLong * 65L) / n).toInt) += (bytes(i) & 0xff).toLong
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b + 1) > sums(b)) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
