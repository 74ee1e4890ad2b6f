package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** BloomProbe's sketch cache must survive probe loops over more files
  * than its capacity: the old full-clear-at-cap thrashed (every file past
  * 4096 re-decoded every sketch); the LRU evicts only the coldest. */
class BloomProbeLruSpec extends AnyFunSuite {

  private def sketchOf(values: Seq[String]): String = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    values.foreach { v =>
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      import org.apache.spark.sql.types.StringType
      bf.putLong(new XxHash64(Seq(Literal.create(v, StringType)))
        .eval(null).asInstanceOf[Long])
    }
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  test("probes stay correct across more sketches than the cache cap") {
    val hot = sketchOf(Seq("alpha", "beta"))
    assert(BloomProbe.mightContain(hot, "alpha"))
    assert(!BloomProbe.mightContain(hot, "zzz-not-there"))
    // flood the cache well past its capacity with distinct sketches
    (0 until BloomProbe.MaxEntries + 64).foreach { i =>
      val s = sketchOf(Seq(s"v$i"))
      assert(BloomProbe.mightContain(s, s"v$i"))
    }
    // the hot sketch was evicted along the way — a re-probe must decode
    // and answer identically, and misses must stay misses
    assert(BloomProbe.mightContain(hot, "beta"))
    assert(!BloomProbe.mightContain(hot, "zzz-not-there"))
  }
}
