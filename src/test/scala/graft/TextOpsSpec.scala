package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("whitespace tokens and BPE-ish tokens on a known string") {
    val df = Seq("Hello, world! 42 times.").toDF("t")
    val ws = df.select(size(TextOps.tokens(col("t")))).as[Int].head()
    assert(ws == 4)
    val bpe = df.select(TextOps.bpeTokens(col("t"))).as[Seq[String]].head()
    assert(bpe == Seq("hello", ",", "world", "!", "42", "times", "."))
  }

  test("TextProfile counters match the declarative regex/HOF formulations") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val texts = Seq(
      "the quick brown fox and the lazy dog of it to go",
      "  der  Hund und die Katze, 42 mal!  ",
      "\tleading tab and trailing\n",
      "这是一个中文文档 with mixed 文本 here",
      "él fue a la casa de sus amigos y que bien",
      "le chat et les chiens des voisins",
      "",
      " ",
      "a",
      "UPPER case AND punct-uation!!! 123 456mixed",
      "unicode: café naïve résumé — em—dash…")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val toks = TextOps.tokens(lower(col("t")))
    def countIn(ws: Seq[String]) =
      size(filter(toks, x => x.isin(ws.map(w => w: Any): _*)))
    val expected = df.select(col("doc_id"),
      size(toks).as("n_tokens"),
      length(regexp_replace(trim(col("t")), " ", "")).as("n_nonspace"),
      size(TextOps.bpeTokens(col("t"))).as("n_bpe"),
      size(regexp_extract_all(col("t"), lit("[^a-zA-Z0-9\\s]"), lit(0))).as("n_punct"),
      size(regexp_extract_all(col("t"), lit("[0-9]"), lit(0))).as("n_digit"),
      size(regexp_extract_all(col("t"), lit("[一-鿿]"), lit(0))).as("n_cjk"),
      countIn(Seq("the", "a", "and", "of", "to")).as("s_en"),
      countIn(Seq("der", "die", "das", "und", "zu")).as("s_de"),
      countIn(Seq("el", "la", "de", "y", "que")).as("s_es"),
      countIn(Seq("le", "la", "et", "les", "des")).as("s_fr"))
      .orderBy("doc_id").collect()
    val p = ColumnBridge.column(
      graft.functions.TextProfile(ColumnBridge.expression(col("t"))))
    val actual = df.select(col("doc_id"), p.as("__p"))
      .select(col("doc_id"), col("__p.n_tokens"), col("__p.n_nonspace"),
        col("__p.n_bpe"), col("__p.n_punct"), col("__p.n_digit"),
        col("__p.n_cjk"), col("__p.s_en"), col("__p.s_de"), col("__p.s_es"),
        col("__p.s_fr"))
      .orderBy("doc_id").collect()
    expected.zip(actual).foreach { case (e, a) =>
      assert(e.toSeq == a.toSeq, s"doc ${e.get(0)}: '${texts(e.getLong(0).toInt)}'")
    }
  }

  test("language guess prefers the language whose stopwords dominate") {
    val df = Seq(
      (1L, "the cat and the dog of the house went to the garden", "en"),
      (2L, "der hund und die katze und das haus und der garten zu", "de")
    ).toDF("doc_id", "lang", "text") // col order irrelevant, named cols
      .select(col("doc_id"), col("text"), col("lang"))
    // reuse the real query via a temp view-like path: apply fn on a temp dir
    // is overkill — test the building blocks through qLangGuess on testdata
    val guesses = TextOps.qLangGuess.fn(spark, sf)
    assert(guesses.columns.toSeq == Seq("doc_id", "lang", "lang_guess"))
    assert(guesses.count() == Tables.documents(spark, sf).count())
  }

  test("language guess routes CJK text to zh") {
    val cjk = size(regexp_extract_all(col("t"), lit("[一-鿿]"), lit(0)))
    val counts = Seq("这是一个中文文档", "the quick brown fox", "mixed 文本 here")
      .toDF("t").select(cjk.as("n")).as[Int].collect()
    assert(counts(0) == 8)
    assert(counts(1) == 0)
    assert(counts(2) == 2)
  }

  test("winnowing fingerprints: shared substrings yield shared fingerprints") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def fps(texts: String*): Seq[Set[Long]] = {
      val c = ColumnBridge.column(graft.functions.WinnowFingerprints(
        ColumnBridge.expression(col("t")), 8, 16))
      texts.toDF("t").select(c).as[Seq[Long]].collect().map(_.toSet).toSeq
    }
    val shared = "a sufficiently long common passage that both documents contain verbatim"
    val Seq(a, b, c0, short) = fps(
      s"unique prefix alpha $shared unique suffix one",
      s"different beginning text $shared and a different ending",
      "completely unrelated content with no overlap at all whatsoever here",
      "tiny")
    assert((a intersect b).nonEmpty)          // winnowing guarantee
    assert((a intersect c0).isEmpty)          // unrelated docs don't collide
    assert(short.isEmpty)                     // shorter than k → no fingerprints
    // identical input → identical fingerprint set (determinism)
    val Seq(x, y) = fps(shared, shared)
    assert(x == y && x.nonEmpty)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("a  B   c"), ("A b C"), ("a b d")).toDF("text")
      .select(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")
        .cast("binary")).as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("CharEntropy matches the explode-and-aggregate formulation") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val texts = Seq("aabb", "aaaa", "abcd", "a", "", "héllo wörld 你好",
      "the quick brown fox jumps over the lazy dog")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val ent = ColumnBridge.column(
      graft.functions.CharEntropy(ColumnBridge.expression(col("t"))))
    val got = df.select(col("doc_id"), round(ent, 6).as("e"))
      .where(col("e").isNotNull)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the declarative twin it replaced
    val f = df.select(col("doc_id"),
        explode(regexp_extract_all(col("t"), lit("[\\s\\S]"), lit(0))).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
    val t = f.groupBy("doc_id").agg(sum("k").as("n"))
    val p = col("k") / col("n").cast("double")
    val exp = f.join(t, Seq("doc_id")).groupBy("doc_id")
      .agg(round(-sum(p * log2(p)), 6).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == exp, s"got $got vs $exp")
    assert(got(0L) == 1.0)        // aabb: two symbols, one bit
    assert(got(1L) == 0.0)        // aaaa: degenerate
    assert(got(2L) == 2.0)        // abcd: four symbols
    assert(!got.contains(4L))     // empty text → no row, like the explode
  }

  test("RepetitionProfile counts tokens, distincts, top token and top bigram") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cases = Seq(
      // (text, n_tokens, n_distinct, top_token, n_bigrams, top_bigram)
      ("the cat the cat the dog", 6, 3, 3, 5, 2),
      ("a", 1, 1, 1, 0, 0),          // single token: no bigrams
      ("", 1, 1, 1, 0, 0),           // Spark split keeps the empty token
      ("x y x y x y x y", 8, 2, 4, 7, 4),
      ("unique words only here", 4, 4, 1, 3, 1),
      ("The THE the tHe", 4, 1, 4, 3, 3), // lowercased before counting
      ("  padded   with   runs  ", 3, 3, 1, 2, 1)) // \s+ collapses runs
    val df = cases.zipWithIndex
      .map { case ((t, _, _, _, _, _), i) => (i.toLong, t) }.toDF("doc_id", "t")
    val rep = ColumnBridge.column(
      graft.functions.RepetitionProfile(ColumnBridge.expression(col("t"))))
    val got = df.select(col("doc_id"), rep.as("r")).orderBy("doc_id")
      .select("r.n_tokens", "r.n_distinct", "r.top_token", "r.n_bigrams",
        "r.top_bigram")
      .collect().map(_.toSeq)
    cases.zip(got).foreach { case ((t, n, d, tt, nb, tb), a) =>
      assert(a == Seq(n, d, tt, nb, tb), s"text '$t'")
    }
  }

  test("q_repetition_profile flags repeated documents and keeps varied ones") {
    // run the declared query against a tiny on-disk corpus so the full
    // column pipeline (ratios, NULL bigram case, rounded keep rule) is
    // exercised, not just the kernel
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq(
      (0L, "spam spam spam spam spam spam spam spam spam spam", "en", "s", 0L),
      (1L, "a varied document with many different words inside it", "en", "s", 0L),
      (2L, "go", "en", "s", 0L)) // single token → NULL top_bigram_ratio
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.qRepetitionProfile.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(0L).getBoolean(5), "all-one-token spam must be dropped")
    assert(out(1L).getBoolean(5), "varied text must be kept")
    assert(out(2L).isNullAt(4), "single-token doc has no bigram ratio")
    // a single token IS 100% top-token coverage → dropped by that rule
    // (the NULL bigram ratio coalesces to 0 and never drops by itself)
    assert(!out(2L).getBoolean(5), "one-token doc fails top-token coverage")
    assert(out(0L).getDouble(2) == 0.9) // dup_token_ratio = 1 - 1/10
  }

  test("q_unigram_logprob ranks out-of-distribution text below fluent text") {
    val dir = java.nio.file.Files.createTempDirectory("ulm").toString
    val common = "the cat sat on the mat and the dog ran to the cat"
    Seq(
      (0L, common, "en", "s", 0L),
      (1L, common, "en", "s", 0L),
      (2L, "the dog sat on the mat", "en", "s", 0L),
      (3L, "zxqj vvkw qqpl mmnr zzty", "en", "s", 0L)) // gibberish: all hapax
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TextOps.qUnigramLogprob.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // identical docs score identically; the gibberish doc (every token a
    // corpus hapax) must score strictly lowest / highest perplexity
    assert(got(0L) == got(1L))
    assert(got(3L)._1 < got.filter(_._1 != 3L).values.map(_._1).min)
    assert(got(3L)._2 > got.filter(_._1 != 3L).values.map(_._2).max)
  }

  test("q_source_divergence: off-distribution sources diverge, twins agree") {
    val dir = java.nio.file.Files.createTempDirectory("kl").toString
    Seq(
      (0L, "x y x y", "en", "A", 0L),
      (1L, "x y x y", "en", "A", 0L),
      (2L, "x y x y", "en", "B", 0L), // B's distribution == A's
      (3L, "z z z z", "en", "C", 0L)) // C is pure off-corpus mass
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kl = operators.TextOps.qSourceDivergence.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl("A") == kl("B"), "identical distributions must score equal KL")
    assert(kl.values.forall(_ >= 0.0), "KL is non-negative")
    assert(kl("C") > kl("A"),
      "a source disjoint from the rest must diverge hardest")
    // hand value: p_C(z)=1, q(z)=4/16 → KL = ln(4) ≈ 1.3863
    assert(math.abs(kl("C") - math.log(4.0)) < 1e-4)
  }

  test("an empty-text document cannot kill the quality queries") {
    // x / length('') throws DIVIDE_BY_ZERO under ANSI; DuckDB yields NULL.
    // The per-char ratios must be NULL-safe so one empty document neither
    // fails the job nor diverges from the oracle.
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-doc").toString
    Seq(
      (1L, "a perfectly ordinary document with at least ten whitespace tokens inside", "en", "src0", 70L),
      (2L, "", "en", "src0", 0L),
      (3L, "another normal document that also has more than ten little tokens here", "en", "src1", 70L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = TextOps.qTextQuality.fn(spark, dir).collect()
    assert(q.length == 3)
    val empty = q.find(_.getLong(0) == 2L).get
    assert(empty.isNullAt(2) && !empty.getBoolean(4),
      s"empty doc must get NULL punct_ratio and keep=false: $empty")
    // the composed filter paths share the ratio — they must survive too
    graft.operators.Pipeline.qCorpusPrep.fn(spark, dir).collect()
  }

  test("q_bpe_merges: histogram-weighted pairs equal the naive corpus explode") {
    // the operator explodes pairs over the WORD HISTOGRAM (vocab-sized);
    // the naive reference explodes every corpus token — results must be
    // identical because each histogram pair carries the word count
    val got = TextOps.qBpeMerges.fn(spark, sf)
      .as[(String, Long)].collect().toSeq
    val naive = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(lower(col("text")))).as("tok"))
      .filter(col("tok") =!= "" && length(col("tok")) >= 2)
      .select(col("tok"), explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(expr("substring(tok, i, 2)").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)
      .as[(String, Long)].collect().toSeq
    assert(got == naive, s"\ngot:   ${got.take(5)}\nnaive: ${naive.take(5)}")
    // and the counts behave like pair frequencies: hand-check one pair on
    // a tiny frame through the same public entry
    assert(got.nonEmpty && got.map(_._2).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    }, "top-50 must be sorted by weight")
  }

  test("q_bm25_search matches a naive BM25 reimplementation") {
    val out = TextOps.qBm25Search.fn(spark, sf)
      .select("doc_id", "bm25").as[(Long, Double)].collect()
    assert(out.length == 20)
    val terms = Seq("vector", "join", "stream")
    // engine-faithful witness tokenizer (ADVICE r5): NULL text yields no
    // tokens, and the fixture must not be exotic-whitespace-BORDERED —
    // the engine trims spaces only, Java's String.trim strips every char
    // <= U+0020, so a tab-bordered doc would silently diverge
    def wtoks(t: String): Seq[String] = {
      if (t == null) return Nil
      val st = t.replaceAll("^ +| +$", "")
      assert(st == st.trim,
        "witness assumes no exotic-whitespace-bordered text")
      st.toLowerCase.split("\\s+").toSeq
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> wtoks(t) }
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): Double = terms.map { t =>
      val f = toks.count(_ == t).toDouble
      if (f == 0) 0.0
      else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1) *
        f * 2.2 / (f + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
    }.sum
    // rank at the operator's own 4-dp granularity (ties broken by doc_id
    // there, so the witness must round before sorting too)
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs
      .map { case (id, toks) => (id, score(toks)) }
      .filter(_._2 > 0)
      .map { case (id, s) => (id, r4(s)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(20)
    out.zip(want).foreach { case ((gid, gs), (wid, ws)) =>
      assert(gid == wid, s"ranking drift: got $gid want $wid")
      assert(math.abs(gs - ws) < 0.00011, s"doc $gid score $gs vs $ws")
    }
    // the ranking is usable: strictly ordered, every hit contains a term
    assert(out.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
    val hitIds = out.map(_._1).toSet
    docs.filter(d => hitIds(d._1)).foreach { case (id, toks) =>
      assert(terms.exists(toks.contains), s"doc $id has no query term")
    }
  }

  test("q_bpe_encode matches an independent BPE train+encode reimplementation") {
    val out = TextOps.qBpeEncode.fn(spark, sf)
      .select("doc_id", "n_words", "n_chars", "n_bpe", "chars_per_token")
      .as[(Long, Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    // NULL-text docs emit no tokens on the engine side; mirror that
    def words(t: String): Seq[String] =
      if (t == null) Nil
      else t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val hist = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, t) => words(t).foreach(w => hist(w) += 1) }
    // this simple witness splits by UTF-16 char and tie-breaks in Java
    // String order — valid exactly on ASCII, where both coincide with the
    // engine's code-point split and UTF-8 binary order. Make the validity
    // domain explicit instead of silently pinning wrong semantics if the
    // fixture ever gains non-ASCII tokens.
    assert(hist.keys.forall(_.forall(_ < 128)),
      "BPE witness assumes an ASCII token fixture")
    // independent trainer: same spec — most frequent adjacent pair, ties
    // to the lexically first, merges applied left-to-right
    def apply1(v: Vector[String], a: String, b: String): Vector[String] =
      v.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    var syms: Map[String, Vector[String]] =
      hist.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val witnessMerges = collection.mutable.Buffer.empty[(String, String)]
    for (_ <- 1 to 8) {
      val pc = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      syms.foreach { case (w, ss) =>
        ss.sliding(2).foreach {
          case Seq(a, b) => pc((a, b)) += hist(w)
          case _ =>
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), _) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        witnessMerges += ((a, b))
        syms = syms.map { case (w, ss) => w -> apply1(ss, a, b) }
      }
    }
    // pin the learned merge SEQUENCE itself, not just the encode output —
    // a tie-break regression could alter the merges while coincidentally
    // preserving per-doc symbol counts on this fixture
    val vocabDf = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(lower(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val (engineMerges, _) = TextOps.trainBpe(vocabDf, 8)
    assert(engineMerges == witnessMerges.toSeq,
      s"merge sequence drift:\nengine:  $engineMerges\nwitness: $witnessMerges")
    val got = out.map(r => r._1 -> r).toMap
    docs.foreach { case (id, t) =>
      val ws = words(t)
      if (ws.isEmpty) assert(!got.contains(id))
      else {
        val r = got(id)
        assert(r._2 == ws.size, s"doc $id words")
        assert(r._3 == ws.map(_.length).sum.toLong, s"doc $id chars")
        assert(r._4 == ws.map(w => syms(w).size).sum.toLong,
          s"doc $id bpe ${r._4} vs ${ws.map(w => syms(w).size).sum}")
        assert(math.abs(r._5 - r._3.toDouble / r._4) < 0.0001, s"doc $id ratio")
      }
    }
    // the trained merges genuinely compress: fewer BPE tokens than chars
    assert(out.exists(r => r._4 < r._3), "8 merges compressed nothing")
    // deterministic end-to-end (training included): one re-run compared
    // against THIS run's `out` (ADVICE r5: comparing run 2 to run 3 cost
    // an extra full train+encode and missed run-1-only nondeterminism)
    val again = TextOps.qBpeEncode.fn(spark, sf)
      .select("doc_id", "n_words", "n_chars", "n_bpe", "chars_per_token")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(again.sameElements(out), "BPE train+encode not deterministic")
  }

  test("trainBpe top-V cap engages with exact accounting and is a no-op above the vocab size") {
    import spark.implicits._
    // heavy-tail synthetic vocab (VERDICT r9 #2): 4 head words carry the
    // count mass, 60 junk tail words stand in for the URL/hash junk that
    // would overflow a driver collect at web scale
    val head = Seq(("aaab", 100L), ("aabb", 80L), ("abab", 60L), ("bbbb", 40L))
    val tail = (1 to 60).map(i => (f"junk$i%03d", 1L))
    val vocab = (head ++ tail).toDF("tok", "c")
    val (mCapped, encCapped, rep) = TextOps.trainBpe(vocab, 4, topV = 4)
    // no-silent-caps: the drop is named exactly — 60 words, 60 count mass
    assert(rep == TextOps.BpeCapReport(60L, 60L))
    assert(encCapped.count() == 4L, "encode table must hold only kept words")
    // capped training ≡ training on the kept head alone
    val (mHead, _) = TextOps.trainBpe(head.toDF("tok", "c"), 4)
    assert(mCapped == mHead, "capped merges must equal head-only merges")
    // a cap that doesn't engage: zero accounting, merge-sequence identity
    val (mWide, _, rep2) = TextOps.trainBpe(vocab, 4, topV = 10000)
    assert(rep2 == TextOps.BpeCapReport(0L, 0L))
    val (mPlain, _) = TextOps.trainBpe(vocab, 4)
    assert(mWide == mPlain, "non-engaging cap changed the merge sequence")
  }

  test("q_bigram_lm matches a naive driver-side Jelinek-Mercer witness") {
    val out = TextOps.qBigramLm.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // witness tokenizer: the q_unigram_logprob convention (space-trim,
    // lowercase, split on runs of whitespace; fixtures have no exotic
    // whitespace or NULLs — asserted, as the BPE witness pins)
    def toks(t: String): Seq[String] = {
      assert(t != null && t.trim == t.replaceAll("^ +| +$", ""))
      t.trim.toLowerCase.split("\\s+").toSeq
    }
    val all = docs.map { case (id, t) => id -> toks(t) }
    val uni = all.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = all.map(_._2.length).sum.toDouble
    val bi = all.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    all.foreach { case (id, ts) =>
      if (ts.length < 2) assert(!out.contains(id), s"doc $id has no bigrams")
      else {
        val terms = ts.zip(ts.drop(1)).map { case (a, b) =>
          math.log(0.5 * (bi((a, b)).toDouble / uni(a)) + 0.5 * (uni(b) / n))
        }
        val (nb, avg) = out(id)
        assert(nb == terms.length, s"doc $id n_bigrams $nb vs ${terms.length}")
        assert(math.abs(avg - terms.sum / terms.length) < 5e-4,
          s"doc $id avg_logprob $avg vs ${terms.sum / terms.length}")
        // fluency sensitivity: mixture can't fall below the pure unigram
        // floor ln(0.5·P(w)) for every position, and an observed bigram
        // always lifts the term above that floor
        terms.foreach(t => assert(t > math.log(0.5 / n)))
      }
    }
  }

  test("q_dup_ngram_fraction matches a naive driver-side witness") {
    val out = TextOps.qDupNgramFraction.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def shingleSet(t: String): Set[String] = {
      assert(t != null && t.trim == t.replaceAll("^ +| +$", ""))
      val ts = t.trim.toLowerCase.split("\\s+").toSeq
      (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }
    val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    sets.foreach { case (id, s) =>
      if (s.isEmpty) assert(!out.contains(id), s"shingle-less doc $id present")
      else {
        val dup = s.count(df(_) >= 2).toLong
        // the engine's integer half-up ratio, replicated exactly
        val frac = ((20000L * dup + s.size) / (2L * s.size)).toDouble / 10000
        val (n, f) = out(id)
        assert(n == s.size, s"doc $id n_shingles $n vs ${s.size}")
        assert(f == frac, s"doc $id dup_fraction $f vs $frac")
      }
    }
    // the signal discriminates on this corpus: both repeated and novel
    // shingle mass exist, so the fractions are not all equal
    assert(out.values.map(_._2).toSet.size > 1)
  }
}
