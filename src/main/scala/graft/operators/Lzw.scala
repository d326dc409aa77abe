package graft.operators

import java.io.ByteArrayOutputStream

/** Self-contained LZW codec — the one reference compressor codec
  * (compressor.go:104-127, wrapping Go's compress/lzw) with no JVM
  * counterpart. Standard LSB-first variable-width rendering with 8-bit
  * literals: codes start at 9 bits and grow to 12; code 256 = clear,
  * 257 = end; when the table fills (4096 entries) the encoder emits
  * clear and resets, bounding the dictionary. The decoder's width bump
  * fires one entry earlier than the encoder's (its table lags by exactly
  * one assignment — the classic LZW off-by-one), and the `code == next`
  * case is the KwKwK sequence (entry = prev + first byte of prev).
  *
  * Byte-level format compatibility with Go's writer is NOT a goal (the
  * reference treats compressed bytes as opaque; only the round-trip is
  * contractual, op_compressor_roundtrip) — this is the textbook encoding,
  * property-tested against random, repetitive and empty inputs.
  */
object Lzw {
  private val Clear = 256
  private val Eod = 257
  private val FirstFree = 258
  private val MaxWidth = 12
  private val TableSize = 1 << MaxWidth

  def compress(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(math.max(16, data.length / 2))
    var bitBuf = 0L
    var nBits = 0
    var width = 9
    def writeCode(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        bos.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8
      }
    }
    // (prefix code << 8 | next byte) -> code
    val dict = new scala.collection.mutable.LongMap[Int](TableSize * 2)
    var next = FirstFree
    writeCode(Clear)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val cur = data(i) & 0xff
      if (prev < 0) prev = cur
      else {
        val key = (prev.toLong << 8) | cur
        val hit = dict.getOrElse(key, -1)
        if (hit >= 0) prev = hit
        else {
          writeCode(prev)
          dict.update(key, next)
          next += 1
          if (next == (1 << width) && width < MaxWidth) width += 1
          if (next == TableSize) { // full: clear and restart
            writeCode(Clear)
            dict.clear(); next = FirstFree; width = 9
          }
          prev = cur
        }
      }
      i += 1
    }
    if (prev >= 0) writeCode(prev)
    writeCode(Eod)
    if (nBits > 0) bos.write((bitBuf & 0xff).toInt)
    bos.toByteArray
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(16, data.length * 3))
    var bitBuf = 0L
    var nBits = 0
    var pos = 0
    var width = 9
    def readCode(): Int = {
      while (nBits < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << nBits; nBits += 8; pos += 1
      }
      if (nBits < width) Eod // truncated input: treat as end
      else {
        val code = (bitBuf & ((1L << width) - 1)).toInt
        bitBuf >>>= width; nBits -= width
        code
      }
    }
    val prefix = new Array[Int](TableSize)
    val suffix = new Array[Byte](TableSize)
    var next = FirstFree
    def expand(code: Int): Array[Byte] = {
      var n = 0
      var c = code
      while (c >= FirstFree) { n += 1; c = prefix(c) }
      val res = new Array[Byte](n + 1)
      res(0) = c.toByte
      var c2 = code
      var j = n
      while (c2 >= FirstFree) { res(j) = suffix(c2); j -= 1; c2 = prefix(c2) }
      res
    }
    var prevCode = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == Eod) done = true
      else if (code == Clear) { next = FirstFree; width = 9; prevCode = -1 }
      else {
        val entry: Array[Byte] =
          if (code < 256) Array((code & 0xff).toByte)
          else if (code < next) expand(code)
          else if (code == next && prevCode >= 0) {
            val p = expand(prevCode)
            val r = java.util.Arrays.copyOf(p, p.length + 1)
            r(p.length) = p(0) // KwKwK: prev + first byte of prev
            r
          } else throw new IllegalArgumentException(
            s"corrupt LZW stream: code $code with table size $next")
        out.write(entry)
        if (prevCode >= 0 && next < TableSize) {
          prefix(next) = prevCode
          suffix(next) = entry(0)
          next += 1
          // decoder bumps one entry early: its table lags the encoder's
          // by exactly one assignment at each read.
          // END-OF-STREAM INVARIANT: when this bump lands on the FINAL
          // data code (the table hits 2^width-1 right before Eod), the
          // decoder reads Eod with width+1 bits while the encoder wrote
          // it with width. That is correct if and only if compress()'s
          // final flush pads with ZERO bits — the wide read then yields
          // Eod's value with zero high bits, and a read that runs out of
          // bits entirely maps to Eod in readCode(). Keep the encoder's
          // flush zero-padded (LzwSpec pins the 511/1023/2047 boundary).
          if (next == (1 << width) - 1 && width < MaxWidth) width += 1
        }
        prevCode = code
      }
    }
    out.toByteArray
  }
}
