package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the hand-written LZW codec, targeting the
  * stateful boundaries a roundtrip on friendly input would miss:
  * variable-width bumps (9→10→11→12 at 512/1024/2048 table entries),
  * table-full clear/reset (4096), the KwKwK self-referential code, and
  * the encoder/decoder one-assignment lag at every one of them. */
class LzwSpec extends AnyFunSuite {
  private def rt(data: Array[Byte]): Unit = {
    val enc = Lzw.compress(data)
    assert(Lzw.decompress(enc).toSeq == data.toSeq,
      s"roundtrip failed for ${data.length} bytes")
  }

  test("empty, single byte, short strings") {
    rt(Array.emptyByteArray)
    rt(Array(0.toByte))
    rt(Array(255.toByte))
    rt("a".getBytes)
    rt("hello world".getBytes)
  }

  test("KwKwK self-referential sequences") {
    rt("ababababababababab".getBytes)
    rt(Array.fill(100)('a'.toByte))
    rt(("aa" * 300).getBytes)
  }

  test("random bodies across every width bump and the table-full clear") {
    val rng = new scala.util.Random(1234)
    // random bytes assign ~1 entry/byte: these lengths cross 512, 1024,
    // 2048 and the 4096 clear (several times at 60000)
    Seq(300, 600, 1100, 2500, 5000, 20000, 60000).foreach { n =>
      rt(Array.fill(n)(rng.nextInt(256).toByte))
    }
  }

  test("repetitive text compresses and roundtrips across the clear") {
    val body = ("the quick brown fox jumps over the lazy dog. " * 3000).getBytes
    val enc = Lzw.compress(body)
    assert(enc.length < body.length / 2, s"no compression: ${enc.length}/${body.length}")
    rt(body)
  }

  test("mixed structured payloads (json-ish, binary runs, alternations)") {
    val rng = new scala.util.Random(99)
    val jsonish = Seq.tabulate(2000)(i =>
      s"""{"id":$i,"type":"t${i % 7}","v":${rng.nextDouble()}}""").mkString("\n").getBytes
    rt(jsonish)
    rt(Array.tabulate(10000)(i => (i % 3).toByte))
    rt((0 until 256).flatMap(b => Array.fill(b)(b.toByte)).toArray)
  }

  test("final data code lands EXACTLY on the 511/1023/2047 width boundary") {
    // the decoder's table hits 2^w - 1 on the last data code, so it reads
    // Eod one bit wider than the encoder wrote it — only the encoder's
    // zero-padded flush makes that read yield Eod (Lzw.scala invariant
    // comment). All-distinct consecutive pairs make the encoder emit one
    // code per byte and add one table entry per code, so n bytes put the
    // decoder's table at exactly 258 + (n-1) entries after the final code.
    for (boundary <- Seq(511, 1023, 2047)) {
      val n = boundary - 257
      val used = scala.collection.mutable.Set.empty[Int]
      val bytes = new Array[Byte](n)
      var i = 1
      while (i < n) {
        var b = 0
        while (used.contains(((bytes(i - 1) & 0xff) << 8) | b)) b += 1
        used += ((bytes(i - 1) & 0xff) << 8) | b
        bytes(i) = b.toByte
        i += 1
      }
      rt(bytes)
    }
  }

  test("corrupt stream is rejected, not silently decoded") {
    // a high code referencing far beyond any possible table state:
    // width starts at 9, so craft bits yielding code > next immediately
    // (after the leading clear the first data code must be a literal)
    val enc = Lzw.compress("some valid payload".getBytes)
    val corrupted = enc.clone()
    // flip bits mid-stream until decode fails or diverges; assert it
    // never returns the ORIGINAL payload while claiming success
    var rejectedOrChanged = false
    var i = 2
    while (i < corrupted.length && !rejectedOrChanged) {
      corrupted(i) = (corrupted(i) ^ 0x5a).toByte
      try {
        val got = Lzw.decompress(corrupted)
        rejectedOrChanged = got.toSeq != "some valid payload".getBytes.toSeq
      } catch {
        case _: IllegalArgumentException => rejectedOrChanged = true
      }
      corrupted(i) = (corrupted(i) ^ 0x5a).toByte
      i += 1
    }
    assert(rejectedOrChanged)
  }
}
