package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of lowercased, trimmed text — the shingle
  * generator of the MinHash/Jaccard dedup pipeline (SURVEY.md §2.9 N2).
  *
  * Replaces the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))`:
  * higher-order functions evaluate an interpreted lambda per ELEMENT with
  * allocation per step, which made shingle generation ~8× slower than the
  * whole 32-hash MinHash aggregation it feeds. This expression does one
  * Scala call per ROW with a single hash-set pass. Semantics match the
  * DuckDB oracle exactly: tokens = regexp-split of trim(lower(text)) on
  * `\s+`, shingles = space-joined n-grams, de-duplicated keeping first
  * occurrence. Lowercasing uses UTF8String.toLowerCase — the same
  * implementation as Spark's `lower()`.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      var i = 0
      val last = toks.length - n
      val sb = new java.lang.StringBuilder(64)
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full MinHash signature in ONE per-row pass: word n-gram shingles of the
  * normalized text (same tokenization as [[WordShingles]]) hashed with
  * `numHashes` xxhash64 seeds, keeping the minimum per seed. Returns
  * array<long> of length numHashes, or NULL when the text has no shingles
  * (mirrors the explode+groupBy formulation, where such docs simply
  * produce no row).
  *
  * Hash-compatible BY CONSTRUCTION with `min(xxhash64(lit(i), shingle))`:
  * Spark's xxhash64 folds its arguments left-to-right starting at seed 42,
  * so `xxhash64(lit(i), s) == XXH64.hashUnsafeBytes(s, XXH64.hashInt(i, 42))`
  * — the per-seed prefix is precomputed once. This replaces an
  * explode(shingles) → groupBy(doc_id).agg(32 × min) pipeline: same hash
  * count, but zero explode rows, zero aggregation hash table, zero
  * shuffle — the signature stage becomes embarrassingly parallel, which is
  * the property that matters at 1000 executors.
  */
case class MinHashSignatures(child: Expression, n: Int, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1 && numHashes >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  // xxhash64(lit(i), shingle) = hash(shingle bytes, seed = hash(i, 42))
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L))

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String](toks.length * 2)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) { // distinct shingles only, like WordShingles
        val u = UTF8String.fromString(s)
        var k = 0
        while (k < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = mins(k); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * a ROLLING polynomial hash over character k-grams of the normalized
  * text, keeping the minimum hash of every w-gram window (rightmost on
  * ties). Guarantees: any shared substring of length ≥ w + k - 1 between
  * two documents yields at least one shared fingerprint — the
  * plagiarism/near-dup detection primitive that survives insertions and
  * deletions (which shift everything and break fixed-position hashing).
  * Single pass per row; output is the distinct sorted fingerprint set, so
  * overlap is a plain array_intersect downstream.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && window >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  private val Base = 1000003L

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].toLowerCase.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(c)
      i += 1
    }
    val s = sb.toString
    if (s.length < k) return new GenericArrayData(Array.empty[Any])
    // rolling hashes of all k-grams
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L // Base^(k-1)
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); if (i < k - 1) pow *= Base; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // winnow: min per window of `window` consecutive hashes, rightmost tie
    val seen = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start < n) {
      val end = math.min(start + window, n)
      var minIdx = start
      var j = start + 1
      while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      seen.add(hashes(minIdx))
      start += window
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of whitespace-tokenized, lowercased text — computed in a
  * single per-row pass (SimHash is a per-document signature; the previous
  * formulation exploded tokens into rows and re-aggregated with 64
  * conditional sums, paying a shuffle plus a very wide codegen unit for
  * what is a map-side loop). Token hashing is FNV-1a 64 — self-contained,
  * deterministic across JVMs/runs/cluster sizes.
  *
  * Near-duplicate documents differ in few tokens → their bit-majority
  * votes agree on most bits → small Hamming distance between signatures.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def fnv1a(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= FnvPrime
      i += 1
    }
    h
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv1a(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
