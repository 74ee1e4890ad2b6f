package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-cost probe for the prefix-filtered Jaccard join: measures the
  * candidate volume and the per-stage wall cost that the end-to-end bench
  * can't attribute. Run: Test/runMain graft.PrefixProbe /tmp/sf1 */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val members = Dedup.dupClasses(docs)
    val repDocs = Dedup.repDocsOf(docs, members)
    println(s"[probe] docs=${docs.count()} reps=${repDocs.count()}")
    val sh = Dedup.docShingles(repDocs).localCheckpoint()
    println(s"[probe] rep shingle rows=${sh.count()}")
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    println(s"[probe] vocab=${dfreq.count()} maxdf=" +
      dfreq.agg(max("df")).head.getLong(0))
    val ceil3n5 = floor((col("n") * 3 + lit(4)) / lit(5)).cast("int")
    val prefix = t("prefix build") {
      sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ord"),
          count(lit(1)).cast("int").as("n"))
        .select(col("doc_id"), col("n"),
          explode(slice(col("ord"), lit(1), col("n") - ceil3n5 + 1)).as("p"))
        .select(col("doc_id"), col("n"), col("p.shingle").as("shingle"))
        .localCheckpoint()
    }
    println(s"[probe] prefix rows=${prefix.count()}")
    val pdf = prefix.groupBy("shingle").agg(count(lit(1)).as("k"))
    println("[probe] top prefix-shingle multiplicities:")
    pdf.orderBy(col("k").desc).limit(5).collect()
      .foreach(r => println(s"[probe]   k=${r.getLong(1)}"))
    println(s"[probe] candidate upper bound sum k^2=" +
      pdf.agg(sum(col("k") * col("k"))).head.getLong(0))
    val cand = t("candidate join+distinct") {
      prefix.as("x")
        .join(prefix.as("y"),
          col("x.shingle") === col("y.shingle") &&
            col("x.doc_id") < col("y.doc_id") &&
            least(col("x.n"), col("y.n")) * 5 >=
              greatest(col("x.n"), col("y.n")) * 3)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          (col("x.n") + col("y.n")).as("nab"))
        .distinct().localCheckpoint()
    }
    println(s"[probe] candidates=${cand.count()}")
    val shArr = repDocs.select(col("doc_id"),
      Dedup.shingles(col("text")).as("sarr"))
    val inter = t("verify (array merge)") {
      cand
        .join(shArr.select(col("doc_id").as("id_a"), col("sarr").as("sa")), "id_a")
        .join(shArr.select(col("doc_id").as("id_b"), col("sarr").as("sb")), "id_b")
        .select(col("id_a"), col("id_b"), col("nab"),
          size(array_intersect(col("sa"), col("sb"))).as("i"))
        .localCheckpoint()
    }
    println(s"[probe] verified pair rows=${inter.count()}")
    t("full operator") {
      Dedup.qPrefixJaccard.fn(spark, dir).collect().length
    }
    spark.stop()
  }
}
