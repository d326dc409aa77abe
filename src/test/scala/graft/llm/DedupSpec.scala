package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho", "sigma")

  private def randomDoc(len: Int): String =
    Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" ")

  /** corpus with planted near-dup pairs: (i, i+100) differ by one word. */
  private lazy val corpus = {
    val base = (0L until 40L).map(i => (i, randomDoc(60)))
    val dups = base.take(8).map { case (i, text) =>
      val toks = text.split(" ")
      toks(30) = "CHANGED"
      (i + 100L, toks.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("exact dedup collapses identical texts keeping min id") {
    val df = Seq((1L, "same text here"), (2L, "same text here"), (3L, "different"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id")
      .select($"doc_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("exact ngram jaccard finds exactly the planted pairs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until 8L).map(i => (i, i + 100L)).toSet)
  }

  test("minhash LSH recalls the exact jaccard pair set on planted dups") {
    val exact = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect().toSet
    val lsh = Dedup.minhashLshPairs(corpus, "text", "doc_id", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect().toSet
    assert(lsh == exact) // precision exact by verify-stage; recall from the gap
  }

  test("pair operators release their shingle caches before returning") {
    spark.catalog.clearCache() // start from a cache-free session
    val pairs = Dedup.minhashLshPairs(corpus, "text", "doc_id", 3, 0.5)
    assert(pairs.count() > 0)
    // the call may leave its own localCheckpoint blocks (freed by the
    // ContextCleaner when `pairs` is dropped) but NO CacheManager-pinned
    // entries — the shingle-set cache must be gone by return time
    assert(org.apache.spark.sql.GraftBridge.noCachedPlans(spark),
      "a cached plan survived minhashLshPairs")
    // ngramJaccardPairs has the same release-before-return contract...
    val exact = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect().toSet
    assert(org.apache.spark.sql.GraftBridge.noCachedPlans(spark),
      "a cached plan survived ngramJaccardPairs")
    // ...and the pair values are unchanged by the checkpoint/release
    assert(pairs.select($"id_a", $"id_b", $"jaccard").collect().toSet == exact)
  }

  test("collapseExact yields representative-only pairs on every pair API") {
    // corpus + full exact copy (ids shifted +1000): every doc is in a
    // 2-member exact-dup group whose min-id representative is the
    // original. Collapsed pair output must equal the plain output on the
    // original corpus — for minhash, ngram-jaccard AND simhash alike.
    val doubled = corpus.unionByName(
      corpus.withColumn("doc_id", $"doc_id" + 1000L))
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    val mhPlain = ids(Dedup.minhashLshPairs(corpus, "text", "doc_id", 3, 0.5))
    assert(ids(Dedup.minhashLshPairs(doubled, "text", "doc_id", 3, 0.5,
      collapseExact = true)) == mhPlain)

    val njPlain = ids(Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5))
    assert(ids(Dedup.ngramJaccardPairs(doubled, "text", "doc_id", 3, 0.5,
      collapseExact = true)) == njPlain)

    val shPlain = ids(Dedup.simhashPairs(corpus, "text", "doc_id", maxDist = 3))
    assert(ids(Dedup.simhashPairs(doubled, "text", "doc_id", maxDist = 3,
      collapseExact = true)) == shPlain)
    // and without the collapse the doubled corpus DOES emit exact-dup
    // pairs (sanity that the flag changed anything)
    assert(ids(Dedup.simhashPairs(doubled, "text", "doc_id", maxDist = 3))
      .exists { case (a, b) => b == a + 1000L })
  }

  test("jaccard pipeline matches an independent in-memory reference on random corpora") {
    // independent reference: plain Scala shingle sets + pairwise jaccard
    def refPairs(docs: Seq[(Long, String)], n: Int, th: Double): Set[(Long, Long)] = {
      val sets = docs.map { case (id, text) =>
        val toks = text.split(" ")
        val sh: Set[String] =
          if (toks.length < n) Set(toks.mkString(" "))
          else toks.sliding(n).map(_.mkString(" ")).toSet
        id -> sh
      }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= th
      } yield (a, b)).toSet
    }
    (0 until 3).foreach { trial =>
      val trialRng = new scala.util.Random(100 + trial)
      val docs = (0L until 30L).map { i =>
        (i, Seq.fill(20 + trialRng.nextInt(30))(
          vocab(trialRng.nextInt(6))).mkString(" ")) // tiny vocab -> real overlaps
      }
      val want = refPairs(docs, 3, 0.5)
      val df = docs.toDF("doc_id", "text")
      val exact = Dedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(exact == want, s"trial $trial: exact pipeline diverged")
    }
  }

  test("prefix filtering stays exact under an injected stop-shingle") {
    // every doc carries the same header phrase, so its shingles occur in
    // ALL docs (the stop-shingle skew hazard: pre-prefix-filtering this
    // made one join bucket quadratic in the corpus). Prefix filtering
    // must keep the answer bit-identical to the brute reference: the
    // stop-shingles sort last by df, fall outside every prefix, and the
    // planted pairs must still surface through their rare shingles.
    def refPairs(docs: Seq[(Long, String)], n: Int, th: Double): Set[(Long, Long, Double)] = {
      val sets = docs.map { case (id, text) =>
        id -> text.split(" ").sliding(n).map(_.mkString(" ")).toSet
      }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= th
      } yield (a, b, j)).toSet
    }
    val header = "common header every doc shares"
    val trialRng = new scala.util.Random(42)
    val base = (0L until 40L).map { i =>
      (i, header + " " + Seq.fill(25 + trialRng.nextInt(15))(
        vocab(trialRng.nextInt(vocab.length))).mkString(" "))
    }
    // planted near-dups: one word changed
    val dups = base.take(6).map { case (i, text) =>
      val toks = text.split(" "); toks(toks.length / 2) = "CHANGED"
      (i + 100L, toks.mkString(" "))
    }
    val docs = base ++ dups
    val want = refPairs(docs, 3, 0.5)
    val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"), "text", "doc_id", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got == want, "prefix-filtered pipeline diverged from brute reference")
    assert(want.nonEmpty && want.size < docs.size * (docs.size - 1) / 2,
      "fixture degenerate: planted pairs must qualify and non-pairs must not")
  }

  test("prefix length is lossless when (1-t)*n is integral in exact arithmetic") {
    // threshold 0.8 over a 5-shingle doc: (1.0-0.8)*5 is exactly 1.0 in
    // real arithmetic but 0.9999999999999998 in doubles — an unguarded
    // floor computes prefix length 1 instead of the lossless 2. Fixture:
    // A = {u, s1..s4}, B = {s1..s4} (jaccard exactly 4/5 = 0.8). A's
    // unique shingle u has df=1 and heads A's rarity order, so with the
    // undershot prefix A exposes ONLY u, shares no prefix shingle with
    // B, and the qualifying pair silently vanishes.
    val docs = Seq(
      (1L, "unique shared1 shared2 shared3 shared4"),
      (2L, "shared1 shared2 shared3 shared4"))
    for (t <- Seq(0.8, 0.9)) {
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", 1, t)
        .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
        .collect().toSet
      val want = if (t <= 0.8) Set((1L, 2L, 0.8)) else Set.empty
      assert(got == want, s"threshold $t: got $got")
    }
  }

  test("dupSpans merges runs, ignores within-doc repeats, splits disjoint runs") {
    def doc(parts: String*): String = parts.mkString(" ")
    val shared1 = (1 to 10).map(i => s"s$i").mkString(" ")  // 10-token run
    val shared2 = (1 to 9).map(i => s"t$i").mkString(" ")   //  9-token run
    def uniq(id: Int, n: Int, tag: String): String =
      (1 to n).map(i => s"u${tag}_${id}_$i").mkString(" ")
    val docs = Seq(
      // docs 1,2 share run1 at different offsets AND run2 later -> 2 spans each
      (1L, doc(uniq(1, 5, "a"), shared1, uniq(1, 12, "b"), shared2, uniq(1, 5, "c"))),
      (2L, doc(uniq(2, 9, "a"), shared1, uniq(2, 15, "b"), shared2, uniq(2, 3, "c"))),
      // doc 3 repeats a window WITHIN itself only -> cross-doc rule ignores it
      (3L, doc(uniq(3, 4, "a"), (1 to 8).map(i => s"r$i").mkString(" "),
               uniq(3, 4, "b"), (1 to 8).map(i => s"r$i").mkString(" "))),
      // doc 4 wholly unique -> no spans
      (4L, uniq(4, 40, "z"))).toDF("doc_id", "text")
    for (hashWindows <- Seq(true, false)) {
      val got = Dedup.dupSpans(docs, w = 8, hashWindows = hashWindows)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // doc1: run1 tokens 5..14, run2 tokens 27..35 (0-based)
      // doc2: run1 tokens 9..18, run2 tokens 34..42
      assert(got == Seq(
        (1L, 5L, 14L, 10L), (1L, 27L, 35L, 9L),
        (2L, 9L, 18L, 10L), (2L, 34L, 42L, 9L)),
        s"hashWindows=$hashWindows got $got")
    }
  }

  test("dupSpans: runs shorter than the window are invisible; w-length runs found") {
    val runW = (1 to 8).map(i => s"w$i").mkString(" ")   // exactly w tokens
    val runShort = (1 to 7).map(i => s"v$i").mkString(" ") // w-1 tokens
    def uniq(id: Int, n: Int): String =
      (1 to n).map(i => s"u${id}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq(1, 10)} $runW ${uniq(1, 10)}_x $runShort"),
      (2L, s"${uniq(2, 3)} $runW ${uniq(2, 12)}_x $runShort")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, w = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // only the exactly-w run is detectable: one single-window span per doc
    assert(got == Seq((1L, 10L, 17L, 8L), (2L, 3L, 10L, 8L)), got.toString)
  }

  test("cutDupSpans keeps the min-doc copy, cuts the rest, drops full dups") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    def uniq(id: Int, n: Int): String = (1 to n).map(i => s"u${id}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq(1, 5)} $shared ${uniq(1, 6)}"),  // keeper: untouched
      (2L, s"${uniq(2, 3)} $shared ${uniq(2, 4)}"),  // loses the 12 shared tokens
      (3L, shared),                                  // fully duplicated -> dropped
      (4L, uniq(4, 20)),                             // unique: untouched
      (5L, "a b c")).toDF("doc_id", "text")          // shorter than w: untouched
    val got = Dedup.cutDupSpans(docs, w = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(!byId.contains(3L), "fully-cut doc must drop")
    assert(byId(1L) == (1L, 23L, 23L, s"${uniq(1, 5)} $shared ${uniq(1, 6)}"))
    assert(byId(2L) == (2L, 19L, 7L, s"${uniq(2, 3)} ${uniq(2, 4)}"))
    assert(byId(4L) == (4L, 20L, 20L, uniq(4, 20)))
    assert(byId(5L) == (5L, 3L, 3L, "a b c"))
    // conservation: kept tokens + planted cut = original for doc 2
    assert(byId(2L)._2 - byId(2L)._3 == 12L)
  }

  test("dupSpans matches an in-memory reference on random small corpora") {
    // natural window collisions from a tiny vocab; reference recomputes
    // spans directly from the definition
    val w = 3
    def refSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val wins = toks.toSeq.flatMap { case (id, tk) =>
        (0 to tk.length - w).filter(_ => tk.length >= w)
          .map(i => (id, i, tk.slice(i, i + w).mkString(" ")))
      }
      val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val pos = wins.filter(x => dup(x._3)).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
      pos.flatMap { case (id, ps) =>
        // islands of contiguous positions
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(is => (id, is.min.toLong, is.max.toLong + w - 1,
          (is.max + w - 1 - is.min + 1).toLong))
      }.toSet
    }
    val fuzz = new scala.util.Random(113)
    val voc = Array("a", "b", "c", "d")
    (1 to 5).foreach { round =>
      val docs = (0L until 12L).map(i =>
        (i, Seq.fill(5 + fuzz.nextInt(12))(voc(fuzz.nextInt(voc.length))).mkString(" ")))
      val got = Dedup.dupSpans(docs.toDF("doc_id", "text"), w = w)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == refSpans(docs), s"round $round: $got vs ${refSpans(docs)}")
    }
  }

  test("hammingPairs matches brute force on random signatures") {
    val fuzz = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      val maxDist = 1 + fuzz.nextInt(5)
      // half random, half perturbed copies so near-pairs actually exist
      val base = (0L until 20L).map(i => (i, fuzz.nextLong()))
      val near = base.take(10).map { case (i, s) =>
        (i + 100L, s ^ (1 to fuzz.nextInt(maxDist + 2))
          .foldLeft(0L)((m, _) => m | (1L << fuzz.nextInt(64))))
      }
      val sigs = base ++ near
      val brute = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= maxDist
      } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
      val got = Dedup.hammingPairs(sigs.toDF("id", "sig"), maxDist)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == brute, s"round $round maxDist=$maxDist")
    }
  }

  test("approx_count_distinct stays within 5% of exact (tolerance contract)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(20000).toDF("id")
      .withColumn("v", pmod(col("id") * 2654435761L, lit(7919L)))
    val exact = df.select(countDistinct(col("v"))).head().getLong(0)
    // rsd=0.01 => HLL++ with ~1% relative error; assert a 5x margin
    val approx = df.select(approx_count_distinct(col("v"), 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("simhash finds planted near-dups with high recall and is deterministic") {
    val got = Dedup.simhashPairs(corpus, "text", "doc_id", maxDist = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 8L).map(i => (i, i + 100L)).toSet
    val recall = planted.count(got.contains).toDouble / planted.size
    assert(recall >= 0.75, s"recall $recall, got=$got")
    val again = Dedup.simhashPairs(corpus, "text", "doc_id", maxDist = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == again)
  }
}
