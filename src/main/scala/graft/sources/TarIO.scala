package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** POSIX ustar tar archives, read and written by hand (no external deps) —
  * the container format of WebDataset-style training-data shards: samples
  * packed as named members of sequential `.tar` files, one shard per file.
  *
  * The format is deliberately minimal here: regular files only (typeflag
  * '0'), names ≤ 100 bytes, sizes as 11-digit octal — exactly the subset
  * WebDataset itself emits. Every structural violation fails LOUDLY
  * (magic, checksum, truncation): a silently mis-parsed shard would
  * surface as wrong training data, the worst possible failure mode.
  *
  * Reference semantics: the reference ingests a directory of record files
  * as its source corpus (KafkaProducer.kt:37-48 walks a folder and
  * streams every file); this is the same directory-of-shards contract in
  * the format the LLM-pipeline world actually uses.
  */
object TarIO {

  final case class TarMember(name: String, size: Long, bytes: Array[Byte])

  private val BLOCK = 512

  // ---------------------------------------------------------------- write

  /** Serialize members into one ustar stream (caller owns the stream).
    * Deterministic byte-for-byte: fixed mode/uid/gid/mtime fields, so the
    * same members always produce the same shard bytes. */
  def write(members: Iterator[(String, Array[Byte])], out: OutputStream): Unit = {
    members.foreach { case (name, bytes) => writeMember(out, name, bytes) }
    writeTrailer(out)
  }

  /** Append one member — the incremental half of [[write]], so shard
    * writers can stream row-by-row with O(one member) memory. */
  def writeMember(out: OutputStream, name: String, bytes: Array[Byte]): Unit = {
    out.write(header(name, bytes.length.toLong))
    out.write(bytes)
    val pad = (BLOCK - bytes.length % BLOCK) % BLOCK
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** End-of-archive marker; REQUIRED after the last member. */
  def writeTrailer(out: OutputStream): Unit =
    out.write(new Array[Byte](2 * BLOCK))

  // ----------------------------------------------------- gzip members

  /** Gzip one member payload (RFC 1952 via `java.util.zip`).
    * Deterministic: Java's GZIPOutputStream writes a fixed header
    * (MTIME=0, no name/comment fields), so the same payload always
    * produces the same compressed bytes — the shard-level determinism
    * contract [[write]] documents survives compression. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Inverse of [[gzip]]; fails loudly on a truncated or non-gzip
    * payload (a member NAMED `.gz` that isn't gzip is data corruption,
    * not a case to paper over). */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100, s"tar member name too long: $name")
    require(size >= 0, s"negative member size for $name")
    val h = new Array[Byte](BLOCK)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    putOctal(h, 100, 8, 420L)        // mode 0644
    putOctal(h, 108, 8, 0L)          // uid
    putOctal(h, 116, 8, 0L)          // gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 0L)         // mtime: fixed for determinism
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum placeholder
    h(156) = '0'                     // typeflag: regular file
    System.arraycopy("ustar".getBytes(StandardCharsets.US_ASCII), 0, h, 257, 5)
    h(262) = 0
    h(263) = '0'; h(264) = '0'       // version
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += (h(i) & 0xff); i += 1 }
    // checksum: 6 octal digits, NUL, space
    val oct = ("%06o".format(sum)).getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(oct, 0, h, 148, 6)
    h(154) = 0
    h(155) = ' '
    h
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    // len-1 octal digits, NUL terminator — the classic ustar encoding
    val s = s"%0${len - 1}o".format(v)
    require(s.length == len - 1, s"octal field overflow: $v in $len bytes")
    System.arraycopy(s.getBytes(StandardCharsets.US_ASCII), 0, h, off, len - 1)
    h(off + len - 1) = 0
  }

  // ----------------------------------------------------------------- read

  /** Stream members from a ustar archive. `readBytes = false` SKIPS every
    * payload (column pruning's scan-side half: a metadata-only projection
    * never materializes member bytes). Header checksums are verified. */
  def read(in: InputStream, readBytes: Boolean): Iterator[TarMember] =
    new Iterator[TarMember] {
      private var nextMember: TarMember = null
      private var done = false

      private def advance(): Unit = {
        if (done) return
        val h = new Array[Byte](BLOCK)
        readFully(in, h, "tar header")
        if (isZeroBlock(h)) { done = true; nextMember = null; return }
        checkHeader(h)
        val name = cString(h, 0, 100)
        val size = parseOctal(h, 124, 12)
        val bytes =
          if (readBytes) {
            require(size <= Int.MaxValue, s"tar member too large: $size")
            val b = new Array[Byte](size.toInt)
            readFully(in, b, s"tar member $name")
            b
          } else { skipFully(in, size, name); null }
        val pad = (BLOCK - size % BLOCK) % BLOCK
        if (pad > 0) skipFully(in, pad, name)
        nextMember = TarMember(name, size, bytes)
      }

      advance()
      override def hasNext: Boolean = nextMember != null
      override def next(): TarMember = {
        val m = nextMember; advance(); m
      }
    }

  private def checkHeader(h: Array[Byte]): Unit = {
    require(cString(h, 257, 6) == "ustar",
      s"bad tar magic '${cString(h, 257, 6)}'")
    val stored = parseOctal(h, 148, 8)
    var sum = 0L
    var i = 0
    while (i < BLOCK) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (h(i) & 0xff).toLong)
      i += 1
    }
    require(sum == stored, s"tar header checksum mismatch: $sum != $stored")
    val tf = h(156).toChar
    require(tf == '0' || tf == 0.toChar,
      s"unsupported tar member type '$tf' — shards hold regular files only")
  }

  private def isZeroBlock(h: Array[Byte]): Boolean = {
    var i = 0
    while (i < BLOCK) { if (h(i) != 0) return false; i += 1 }
    true
  }

  private def cString(h: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && h(end) != 0) end += 1
    new String(h, off, end - off, StandardCharsets.UTF_8)
  }

  private def parseOctal(h: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val max = off + len
    // leading spaces permitted; digits end at NUL or space
    while (i < max && h(i) == ' ') i += 1
    while (i < max && h(i) != 0 && h(i) != ' ') {
      val c = h(i)
      require(c >= '0' && c <= '7', s"bad octal digit ${c.toChar} in tar header")
      v = v * 8 + (c - '0')
      i += 1
    }
    v
  }

  private def readFully(in: InputStream, b: Array[Byte], what: String): Unit = {
    var off = 0
    while (off < b.length) {
      val n = in.read(b, off, b.length - off)
      if (n < 0) throw new EOFException(s"truncated $what: ${b.length - off} bytes missing")
      off += n
    }
  }

  private def skipFully(in: InputStream, n: Long, name: String): Unit = {
    var left = n
    val buf = new Array[Byte](math.min(left, 64 * 1024L).toInt max 1)
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) throw new EOFException(s"truncated tar member $name while skipping")
      left -= r
    }
  }
}
