package graft.storage

/** Gorilla/XOR chunk codec — the reference's storage compression
  * (vendor `prometheus/tsdb/chunkenc/xor.go:132-223`, itself the
  * Facebook Gorilla paper's scheme with Prometheus' millisecond
  * delta-of-delta bucket widths). Wire-compatible with that format:
  *
  *   uint16 BE sample count
  *   varint  t0            | 64-bit v0
  *   uvarint tDelta1       | XOR vDelta1
  *   dod-bucketed deltas   | XOR vDeltas        (samples 3..n)
  *
  * Delta-of-delta buckets: '0' (dod=0), '10'+14 bit, '110'+17 bit,
  * '1110'+20 bit, '1111'+64 bit. Value XOR: '0' (same bits),
  * '10'+reuse leading/trailing window, '11'+5-bit leading+6-bit
  * sigbits+payload (sigbits 64 encoded as 0).
  *
  * Values travel as RAW BIT PATTERNS (`Long`), not doubles: Prometheus
  * staleness markers are a specific signalling-NaN payload that Spark's
  * UnsafeRow normalizes away, so the boolean `stale` column is folded
  * back into the bits before encoding and re-detected after decoding
  * ([[graft.model.Samples.StaleNaNBits]]). Inside the chunk blob the
  * bits are opaque bytes Spark cannot touch.
  */
object GorillaChunk {

  /** Growable MSB-first bit stream (reference `chunkenc/bstream.go`
    * semantics: whole bytes append, bit writes fill the current byte
    * from the high bit down). */
  private final class BitWriter(initial: Int = 128) {
    private var buf = new Array[Byte](initial)
    private var len = 0 // bytes fully or partially used
    private var free = 0 // unwritten low bits in buf(len - 1)

    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, len + n))
        System.arraycopy(buf, 0, nb, 0, len)
        buf = nb
      }

    def writeByte(b: Byte): Unit =
      if (free == 0) { ensure(1); buf(len) = b; len += 1 }
      else {
        ensure(1)
        // split across the byte boundary
        buf(len - 1) = (buf(len - 1) | ((b & 0xff) >>> (8 - free))).toByte
        buf(len) = ((b & 0xff) << free).toByte
        len += 1
      }

    def writeBit(bit: Boolean): Unit = {
      if (free == 0) { ensure(1); buf(len) = 0; len += 1; free = 8 }
      if (bit) buf(len - 1) = (buf(len - 1) | (1 << (free - 1))).toByte
      free -= 1
    }

    /** Write the low `n` bits of `v`, most-significant first. */
    def writeBits(v: Long, n: Int): Unit = {
      var u = v << (64 - n)
      var left = n
      while (left >= 8) {
        writeByte((u >>> 56).toByte)
        u <<= 8
        left -= 8
      }
      while (left > 0) {
        writeBit((u >>> 63) == 1)
        u <<= 1
        left -= 1
      }
    }

    def putVarint(x: Long): Unit = putUvarint((x << 1) ^ (x >> 63))

    def putUvarint(x0: Long): Unit = {
      var x = x0
      while ((x & ~0x7fL) != 0) {
        writeByte(((x & 0x7f) | 0x80).toByte)
        x >>>= 7
      }
      writeByte(x.toByte)
    }

    def result(count: Int): Array[Byte] = {
      val out = new Array[Byte](2 + len)
      out(0) = (count >>> 8).toByte
      out(1) = count.toByte
      System.arraycopy(buf, 0, out, 2, len)
      out
    }
  }

  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var valid = 0 // unread bits remaining in `cur`
    private var cur = 0 // current byte, consumed high bit first

    def readBit(): Boolean = {
      if (valid == 0) { cur = bytes(pos) & 0xff; pos += 1; valid = 8 }
      valid -= 1
      ((cur >>> valid) & 1) == 1
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        if (valid == 0) { cur = bytes(pos) & 0xff; pos += 1; valid = 8 }
        val take = math.min(left, valid)
        v = (v << take) |
          ((cur >>> (valid - take)) & ((1 << take) - 1)).toLong
        valid -= take
        left -= take
      }
      v
    }

    def readByte(): Int = readBits(8).toInt

    def readUvarint(): Long = {
      var x = 0L
      var s = 0
      var b = readByte()
      while ((b & 0x80) != 0) {
        x |= (b & 0x7fL) << s
        s += 7
        b = readByte()
      }
      x | (b.toLong << s)
    }

    def readVarint(): Long = {
      val u = readUvarint()
      (u >>> 1) ^ -(u & 1)
    }
  }

  private def bitRange(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  /** Encode parallel arrays of timestamps (ms, strictly increasing) and
    * raw value bits into one chunk blob. Max 65535 samples (uint16
    * header, as the reference). */
  def encode(ts: Array[Long], vbits: Array[Long]): Array[Byte] = {
    val n = ts.length
    require(vbits.length == n, "ts/vbits length mismatch")
    require(n <= 0xffff, s"chunk overflow: $n samples")
    val w = new BitWriter()
    var prevT = 0L
    var prevV = 0L
    var prevDelta = 0L
    var leading = 0xff // 0xff = no reusable window yet
    var trailing = 0
    var i = 0
    while (i < n) {
      val t = ts(i)
      val v = vbits(i)
      if (i == 0) {
        w.putVarint(t)
        w.writeBits(v, 64)
      } else {
        val delta = t - prevT
        require(delta > 0, s"timestamps not strictly increasing at $i")
        if (i == 1) w.putUvarint(delta)
        else {
          val dod = delta - prevDelta
          if (dod == 0) w.writeBit(false)
          else if (bitRange(dod, 14)) { w.writeBits(0x02, 2); w.writeBits(dod, 14) }
          else if (bitRange(dod, 17)) { w.writeBits(0x06, 3); w.writeBits(dod, 17) }
          else if (bitRange(dod, 20)) { w.writeBits(0x0e, 4); w.writeBits(dod, 20) }
          else { w.writeBits(0x0f, 4); w.writeBits(dod, 64) }
        }
        // XOR value delta against the running leading/trailing window
        val xor = v ^ prevV
        if (xor == 0) w.writeBit(false)
        else {
          w.writeBit(true)
          var l = java.lang.Long.numberOfLeadingZeros(xor)
          val tr = java.lang.Long.numberOfTrailingZeros(xor)
          if (l >= 32) l = 31 // clamp: 5-bit leading field
          if (leading != 0xff && l >= leading && tr >= trailing) {
            w.writeBit(false)
            w.writeBits(xor >>> trailing, 64 - leading - trailing)
          } else {
            leading = l
            trailing = tr
            w.writeBit(true)
            w.writeBits(l.toLong, 5)
            val sigbits = 64 - l - tr
            w.writeBits((sigbits & 63).toLong, 6) // 64 encodes as 0
            w.writeBits(xor >>> tr, sigbits)
          }
        }
        prevDelta = delta
      }
      prevT = t
      prevV = v
      i += 1
    }
    w.result(n)
  }

  /** Decode a chunk blob back to parallel (timestamps, value bits). */
  def decode(bytes: Array[Byte]): (Array[Long], Array[Long]) = {
    val n = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
    val ts = new Array[Long](n)
    val vs = new Array[Long](n)
    if (n == 0) return (ts, vs)
    val r = new BitReader(bytes, 2)
    var t = r.readVarint()
    var v = r.readBits(64)
    ts(0) = t; vs(0) = v
    var delta = 0L
    var leading = 0
    var trailing = 0
    var i = 1
    while (i < n) {
      if (i == 1) delta = r.readUvarint()
      else {
        // prefix-coded dod: count leading ones (max 4)
        var d = 0
        while (d < 4 && r.readBit()) d += 1
        val dod = d match {
          case 0 => 0L
          case 1 => unbucket(r.readBits(14), 14)
          case 2 => unbucket(r.readBits(17), 17)
          case 3 => unbucket(r.readBits(20), 20)
          case _ => r.readBits(64)
        }
        delta += dod
      }
      t += delta
      if (r.readBit()) {
        if (r.readBit()) {
          leading = r.readBits(5).toInt
          var sig = r.readBits(6).toInt
          if (sig == 0) sig = 64
          trailing = 64 - leading - sig
        }
        val sigbits = 64 - leading - trailing
        v ^= r.readBits(sigbits) << trailing
      }
      ts(i) = t; vs(i) = v
      i += 1
    }
    (ts, vs)
  }

  /** The bucket ranges are ASYMMETRIC — `bitRange` admits +2^(n-1) but
    * only -(2^(n-1)-1) — so this is the reference's strict-greater
    * rule (`xor.go:322-325`), not plain two's-complement sign
    * extension: the all-but-sign-bit-zero pattern decodes POSITIVE. */
  private def unbucket(v: Long, bits: Int): Long =
    if (v > (1L << (bits - 1))) v - (1L << bits) else v
}
