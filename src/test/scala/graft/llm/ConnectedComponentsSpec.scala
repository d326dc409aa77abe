package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Local union-find reference: id -> component root (min id). */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(id => id -> find(id)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    // non-root nodes come back; roots map to themselves implicitly
    val all = edges.flatMap(e => Seq(e._1, e._2)).distinct
    all.map(id => id -> out.getOrElse(id, id)).toMap
  }

  test("chain collapses to one component rooted at min") {
    val edges = (1L until 20L).map(i => (i, i + 1))
    assert(run(edges) == edges.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> 1L).toMap)
  }

  test("star, already-rooted and reversed orientations") {
    val star = (2L to 8L).map(i => (1L, i))
    assert(run(star).values.toSet == Set(1L))
    assert(run(star.map(_.swap)).values.toSet == Set(1L))
  }

  test("self-loops and duplicate edges are ignored") {
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
    val got = run(edges)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 3L && got(4L) == 3L)
  }

  test("empty edge set yields empty mapping") {
    val out = ConnectedComponents.run(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(out.isEmpty)
  }

  test("fuzz: random graphs match union-find reference") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + rng.nextInt(50)
      val m = 20 + rng.nextInt(80)
      val edges = Seq.fill(m)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val expect = reference(edges)
      assert(run(edges) == expect, s"trial $trial, n=$n, m=$m")
    }
  }

  test("resolveClusters distributed path matches driver union-find path") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "completely different words entirely unrelated to anything else at all"),
      (5L, "some other corpus text that shares nothing with the fox sentences")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val a = canon(Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5))
    val b = canon(Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5,
      distributed = true))
    assert(a == b)
    assert(a.count(_._3) < 5) // the near-dup trio collapsed
  }

  test("resolveClustersBy keeps the best-scoring member, not the longest") {
    // doc 2 is the LONGEST of its cluster (length keeper would pick it)
    // but doc 1 carries the higher caller-supplied score
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today extra"),
      (3L, "completely different words entirely unrelated to anything else at all")
    ).toDF("doc_id", "text")
    val byLen = Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(byLen == Set(2L, 3L))
    val score = org.apache.spark.sql.functions.when($"doc_id" === 1L, 2.0)
      .otherwise(1.0)
    val byScore = Dedup.resolveClustersBy(docs, "text", "doc_id", 3, 0.5,
        keepScore = score)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(byScore == Set(1L, 3L))
    // cluster roots are unchanged by the keeper policy
    assert(Dedup.resolveClustersBy(docs, "text", "doc_id", 3, 0.5, score)
      .select($"doc_id", $"cluster_root").as[(Long, Long)].collect().toSet ==
      Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5)
        .select($"doc_id", $"cluster_root").as[(Long, Long)].collect().toSet)
  }

  test("pair budget gate: tiny maxDriverPairs engages the CC path, row-identical") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "completely different words entirely unrelated to anything else at all"),
      (5L, "some other corpus text that shares nothing with the fox sentences")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val driver = canon(Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5))
    // maxDriverPairs=0 forces the pair yield (>0 here — the trio pairs)
    // over budget: the DEFAULT path must fall back to the distributed
    // fixpoint automatically, never collect, and stay row-identical
    val gated = canon(Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5,
      maxDriverPairs = 0L))
    assert(gated == driver)
    assert(gated.count(_._3) < 5)
    // the keep-best variant honors the same gate
    val score = when($"doc_id" === 1L, 2.0).otherwise(1.0)
    assert(
      canon(Dedup.resolveClustersBy(docs, "text", "doc_id", 3, 0.5, score,
        maxDriverPairs = 0L)) ==
      canon(Dedup.resolveClustersBy(docs, "text", "doc_id", 3, 0.5, score)))
  }

  test("resolveClusters shuffle-join fallback (root map over broadcast budget) is identical") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "completely different words entirely unrelated to anything else at all"),
      (5L, "some other corpus text that shares nothing with the fox sentences")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    // broadcastRootMaxRows=0 forces every root map over the budget: the
    // rejoin must degrade to a planned (non-hinted) join, same output
    for (dist <- Seq(false, true)) {
      val hinted = Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5,
        distributed = dist)
      val fallback = Dedup.resolveClusters(docs, "text", "doc_id", 3, 0.5,
        distributed = dist, broadcastRootMaxRows = 0L)
      assert(canon(fallback) == canon(hinted), s"distributed=$dist")
    }
  }
}
