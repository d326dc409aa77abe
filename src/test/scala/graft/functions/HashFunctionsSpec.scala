package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HashFunctionsSpec extends AnyFunSuite {
  // deterministic pseudo-random key stream (no scalatestplus bridge in
  // this offline env, so property checks run over explicit streams)
  private val keys: Seq[Long] =
    (1L to 2000L).map(i => HashFunctions.mix64(i)) ++
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)

  test("jumpHash maps every key into [0, n) and is deterministic") {
    keys.foreach { k =>
      val b = HashFunctions.jumpHash(k, 16)
      assert(b >= 0 && b < 16)
      assert(b == HashFunctions.jumpHash(k, 16))
    }
  }

  test("jumpHash n=1 always bucket 0") {
    keys.foreach(k => assert(HashFunctions.jumpHash(k, 1) == 0))
  }

  test("jumpHash is monotone-stable: growing n only moves keys to the new bucket") {
    // The defining consistent-hashing property (Lamping–Veach §2): when
    // buckets grow n -> n+1, a key either keeps its bucket or moves to
    // bucket n.
    for (n <- 1 until 12; k <- keys) {
      val before = HashFunctions.jumpHash(k, n)
      val after = HashFunctions.jumpHash(k, n + 1)
      assert(after == before || after == n, s"key $k moved $before -> $after at n=$n")
    }
  }

  test("jumpHash distributes roughly uniformly") {
    val n = 8
    val counts = (1L to 8000L).map(i => HashFunctions.jumpHash(HashFunctions.mix64(i), n))
      .groupBy(identity).view.mapValues(_.size)
    (0 until n).foreach { b =>
      val c = counts.getOrElse(b, 0)
      assert(c > 700 && c < 1300, s"bucket $b has $c of 8000")
    }
  }

  test("replicaBuckets yields n distinct in-range buckets, deterministically") {
    keys.take(500).foreach { k =>
      val r = HashFunctions.replicaBuckets(k, 3, 8)
      assert(r.size == 3 && r.distinct.size == 3)
      assert(r.forall(b => b >= 0 && b < 8))
      assert(r == HashFunctions.replicaBuckets(k, 3, 8))
    }
  }

  test("replicaBuckets caps at numBuckets") {
    val r = HashFunctions.replicaBuckets(42L, 10, 4)
    assert(r.size == 4 && r.distinct.size == 4)
  }

  test("hashString differs by salt and content") {
    assert(HashFunctions.hashString("abc", 1) != HashFunctions.hashString("abc", 2))
    assert(HashFunctions.hashString("abc", 1) != HashFunctions.hashString("abd", 1))
    assert(HashFunctions.hashString("abc", 1) == HashFunctions.hashString("abc", 1))
  }
}
