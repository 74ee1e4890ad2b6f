package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.lake._

/** Property-based lakehouse tests (SURVEY.md §5.2.3): random sequences of
  * append / overwrite / compact / evolve against an in-memory model — the
  * moral equivalent of the reference's manual restart-persistence drill
  * (`SETUP_GUIDE_WIN.md:453-464`), automated. After every step the table
  * content must equal the model, and after the whole sequence every
  * intermediate version must still time-travel to its recorded state. */
class LakePropertySpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic forAll over scalacheck Gen (the scalatest-scalacheck
    * bridge isn't in the offline cache): fixed seeds -> reproducible. */
  private def forAllSeeded[A](gen: Gen[A], cases: Int)(body: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private sealed trait Op
  private case class Append(rows: Seq[(Int, String)]) extends Op
  private case class Overwrite(rows: Seq[(Int, String)]) extends Op
  private case object Compact extends Op

  private val genRows: Gen[Seq[(Int, String)]] = for {
    n <- Gen.choose(1, 5)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 99)
      v <- Gen.alphaLowerStr.map(_.take(8))
    } yield (k, v))
  } yield rows

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> genRows.map(Append),
    2 -> genRows.map(Overwrite),
    1 -> Gen.const(Compact))

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  test("random append/overwrite/compact sequences match an in-memory model " +
      "and stay time-travelable") {
    forAllSeeded(Gen.listOfN(8, genOp), cases = 10) { ops =>
      val dir = Files.createTempDirectory("graft-prop")
      val store = new SnapshotStore(dir.resolve("t"))
      store.init()
      store.commit(_ => Snapshot(1, None, System.currentTimeMillis(), "create",
        schema.json, Nil, Map.empty, Nil, Map.empty))

      var model = Seq.empty[(Int, String)]
      // version → expected content at that version
      val history = scala.collection.mutable.Map[Long, Seq[(Int, String)]](
        store.head().get.version -> model)

      def readAll(snap: Snapshot): Seq[(Int, String)] =
        if (snap.files.isEmpty) Seq.empty
        else spark.read.schema(schema)
          .parquet(snap.files.map(f => dir.resolve("t").resolve(f.path).toString): _*)
          .as[(Int, String)].collect().toSeq

      ops.foreach {
        case Append(rows) =>
          GraftWriter.insert(spark, store, rows.toDF("k", "v"), overwrite = false)
          model = model ++ rows
          history(store.head().get.version) = model
        case Overwrite(rows) =>
          GraftWriter.insert(spark, store, rows.toDF("k", "v"), overwrite = true)
          model = rows
          history(store.head().get.version) = model
        case Compact =>
          val before = store.head().get.version
          Maintenance.compact(spark, store)
          model = model // unchanged
          history(store.head().get.version) = model
      }

      // head content equals the model (as multisets)
      assert(readAll(store.head().get).sorted == model.sorted)
      // every recorded version still reads back its own content
      history.foreach { case (v, expected) =>
        assert(readAll(store.read(v)).sorted == expected.sorted,
          s"time travel to v$v diverged")
      }
      // snapshot invariants: rowCount sums match content
      assert(store.head().get.totalRows == model.size)
    }
  }

  private sealed trait Op2
  private case class Append2(rows: Seq[(Int, String)]) extends Op2
  private case class Delete2(lo: Int) extends Op2
  private case object Compact2 extends Op2

  private val genOp2: Gen[Op2] = Gen.frequency(
    5 -> genRows.map(Append2),
    3 -> Gen.choose(0, 80).map(Delete2),
    1 -> Gen.const(Compact2))

  test("zorder+bloom table under random append/delete/compact: model, " +
      "bloom completeness, changelog replay") {
    val wh = Files.createTempDirectory("graft-prop2-wh").toString
    spark.conf.set("spark.sql.catalog.prop", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.prop.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prop.t")
    var caseId = 0
    forAllSeeded(Gen.listOfN(6, genOp2), cases = 6) { ops =>
      caseId += 1
      val tbl = s"prop.t.c$caseId"
      spark.sql(s"""CREATE TABLE $tbl (k INT, v STRING) USING iceberg
                    TBLPROPERTIES ('graft.sort-order' = 'zorder(k, v)',
                                   'graft.bloom-columns' = 'v')""")
      val store = new SnapshotStore(Paths.get(wh, "t", s"c$caseId"))
      var model = Seq.empty[(Int, String)]
      ops.foreach {
        case Append2(rows) =>
          val values = rows.map { case (k, v) => s"($k, '$v')" }.mkString(", ")
          spark.sql(s"INSERT INTO $tbl VALUES $values")
          model = model ++ rows
        case Delete2(lo) =>
          spark.sql(s"DELETE FROM $tbl WHERE k >= $lo AND k < ${lo + 20}")
          model = model.filterNot { case (k, _) => k >= lo && k < lo + 20 }
        case Compact2 =>
          spark.sql(s"CALL prop.system.compact('t.c$caseId')")
      }

      // 1. content equals the model (multiset)
      val got = spark.table(tbl).as[(Int, String)].collect().toSeq
      assert(got.sorted == model.sorted, s"content diverged for $tbl")

      // 2. bloom completeness: every live value keeps >= 1 file
      val head = store.head().get
      model.map(_._2).distinct.foreach { v =>
        val kept = StatsPruner.prune(head.files,
          Seq(org.apache.spark.sql.sources.EqualTo("v", v)), head.partitionSpec)
        assert(kept.nonEmpty, s"bloom false-negative for '$v' in $tbl")
      }

      // 3. changelog replay reconstructs the model from the net CDC stream
      val ch = Changes.between(spark, store, 1L, head.version)
        .select("k", "v", Changes.ChangeType, Changes.CommitVersion)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      var replay = Seq.empty[(Int, String)]
      ch.groupBy(_._4).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        val ins = rows.filter(_._3 == "insert").map(r => (r._1, r._2))
        val del = rows.filter(_._3 == "delete").map(r => (r._1, r._2))
        replay = del.foldLeft(replay ++ ins) { (acc, d) =>
          val i = acc.indexOf(d); assert(i >= 0, s"delete of absent row $d")
          acc.patch(i, Nil, 1)
        }
      }
      assert(replay.sorted == model.sorted, s"changelog replay diverged for $tbl")
    }
  }

  test("schema evolution preserves old rows under random add-column sequences") {
    forAllSeeded(Gen.listOfN(3, Gen.alphaLowerStr.map(s => "c_" + s.take(5))),
        cases = 5) { rawNames =>
      val names = rawNames.distinct.filter(_.length > 2)
      if (names.nonEmpty) {
        val dir = Files.createTempDirectory("graft-evo")
        val store = new SnapshotStore(dir.resolve("t"))
        store.init()
        store.commit(_ => Snapshot(1, None, System.currentTimeMillis(), "create",
          schema.json, Nil, Map.empty, Nil, Map.empty))
        GraftWriter.insert(spark, store,
          Seq((1, "a"), (2, "b")).toDF("k", "v"), overwrite = false)
        // evolve: add each column as a metadata-only commit
        names.foreach { n =>
          store.commit { prev =>
            val p = prev.get
            p.copy(schemaJson = p.schema.add(n, IntegerType).json,
              operation = "evolve", timestampMs = System.currentTimeMillis())
          }
        }
        val head = store.head().get
        val got = spark.read.schema(head.schema)
          .parquet(head.files.map(f => dir.resolve("t").resolve(f.path).toString): _*)
        assert(got.count() == 2)
        // old rows null-fill every added column
        names.foreach { n =>
          assert(got.filter(got(n).isNull).count() == 2, s"column $n not null-filled")
        }
      }
    }
  }
}
