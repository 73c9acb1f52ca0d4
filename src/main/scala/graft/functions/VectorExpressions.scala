package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the engine's hottest scalar: the dot
  * product of two double arrays.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, *), 0, +)`) is
  * CodegenFallback — every element step goes through interpreted expression
  * eval with boxing. This expression generates a tight primitive loop
  * inside whole-stage codegen (the brief's preference order: built-in ops,
  * then a native `Expression` with `doGenCode`, then UDFs last). Semantics
  * are IDENTICAL to the HOF form, element order included: a strict
  * ascending-index sequential sum, so every oracle that hash-matched the
  * fold keeps matching bit-for-bit; a null element makes the result null,
  * exactly like `zip_with`'s null propagation through the sum — and a
  * length MISMATCH is also null (`zip_with` pads the shorter array with
  * nulls, which null the sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType

  // nullable even for non-nullable children: a null ELEMENT nulls the sum
  // (zip_with parity), so codegen must always carry an isNull slot
  override def nullable: Boolean = true

  // implicit coercion to array<double> — the SQL surface (graft_dot /
  // graft_cosine) must accept array<float>, the embeddings table's actual
  // storage type, the same way the aggregate(zip_with(...)) fold it replaced
  // did via numeric promotion (round-3 advisor finding). This deliberately
  // follows Spark's standard implicit-cast set, so array<string> also
  // coerces (element-wise, unparseable -> null) — exactly what the HOF
  // fold's Multiply coercion did; callers wanting strictness check types
  // upstream.
  // (return type inferred: AbstractDataType itself is private[sql])
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column form of [[DotProduct]] for the DataFrame API. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column form of [[SimHash64]]. */
  def simhash64Native(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Column form of the portable-hash variant of [[SimHash64]]. */
  def simhashPortableNative(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), portable = true))

  /** Column form of [[CdcBounds]]: content-defined chunk end positions. */
  def cdcBoundsNative(text: Column, window: Int, minLen: Int, maxLen: Int,
                      mask: Int, prime: Long, pows: Seq[Long]): Column =
    ColumnBridge.column(CdcBounds(ColumnBridge.expression(text), window,
      minLen, maxLen, mask, prime, pows.toIndexedSeq))

  /** Column form of [[WordGramHashes]] with the portable sha-prefix hash. */
  def gramShaHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordGramHashes(ColumnBridge.expression(tokens), k, sha = true))

  /** Column form of [[WordGramHashes]] with xxhash64. */
  def gramXxHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordGramHashes(ColumnBridge.expression(tokens), k, sha = false))

  /** Column form of [[LshBuckets]]: all `numTables` sign-bit buckets of a
    * vector in one fused matrix-vector pass. `planes` is row-major —
    * planes(t*bits + j) is the j-th hyperplane of table t. */
  def lshBuckets(v: Column, planes: Seq[Seq[Double]], numTables: Int, bits: Int): Column = {
    require(planes.length == numTables * bits,
      s"expected ${numTables * bits} planes, got ${planes.length}")
    ColumnBridge.column(LshBuckets(
      ColumnBridge.expression(v), planes.flatten.toVector, numTables, bits,
      planes.head.length))
  }

  /** Column form of [[NearestCodewords]]. `cb` entries are (id, vector,
    * auxiliary constant) with ids strictly ascending; `aux` is the L2 norm
    * for the cosine metric (`l2 = false`) or the ascending-fold squared
    * norm for L2. */
  def nearestCodewordIds(v: Column, cb: Seq[(Long, Seq[Double], Double)],
                         l2: Boolean, keep: Int): Column = {
    require(cb.nonEmpty, "nearestCodewordIds needs a non-empty codebook")
    val dim = cb.head._2.length
    require(cb.forall(_._2.length == dim),
      "all codebook vectors must share one dimensionality")
    require(cb.map(_._1) == cb.map(_._1).sorted &&
      cb.map(_._1).distinct.length == cb.length,
      "codebook ids must be strictly ascending")
    ColumnBridge.column(NearestCodewords(
      ColumnBridge.expression(v), cb.map(_._1).toVector,
      cb.flatMap(_._2).toVector, cb.map(_._3).toVector, dim, l2, keep))
  }
}

/** JVM kernel for [[CdcBounds]] — the FastCDC-style content-defined
  * chunking scan as one tight primitive loop: windowed polynomial hash
  * over CODE POINTS (the `ascii`-per-character semantics the DuckDB
  * oracle replays), min/max cut discipline, O(n) per document with one
  * int-array allocation. Replaces an interpreted HOF pipeline
  * (16 slices + arrays_zip + struct fold) that cost ~6 ms per document —
  * row-count-linear but a 45× wall-clock slope on a single-split input
  * (SCALE.md r8 note). */
object CdcUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  def cdcBounds(s: UTF8String, window: Int, minLen: Int, maxLen: Int,
                mask: Int, prime: Long, pows: Array[Long]): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val codes = new Array[Long](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      codes(ci) = cp.toLong
      ci += 1
      off += Character.charCount(cp)
    }
    val cuts = new scala.collection.mutable.ArrayBuffer[Int](n / minLen + 1)
    var last = 0
    var i = window // 1-based window END position is i, i >= window
    while (i <= n) {
      // hash = Σ_{j=0..window-1} code(i−j)·pows(j)  (1-based positions)
      var h = 0L
      var j = 0
      while (j < window) { h += codes(i - 1 - j) * pows(j); j += 1 }
      val fires = h % prime % mask == mask - 1
      if ((fires && i - last >= minLen) || i - last >= maxLen) {
        cuts += i
        last = i
      }
      i += 1
    }
    // forced cuts can also fire at positions below `window` only if
    // maxLen < window — excluded by construction (maxLen >= window)
    if (cuts.isEmpty || cuts.last != n) cuts += n
    new GenericArrayData(cuts.toArray)
  }
}

/** Content-defined chunk boundaries as ONE native expression — the fused
  * kernel for the [[graft.operators.TextOps.withCdcBounds]] scan. Output
  * is the ascending array of 1-based inclusive chunk-end positions (the
  * final position always closes the last chunk; empty/whitespace-free
  * handling mirrors the HOF form: an empty string yields an empty array,
  * which the caller never sees because empty texts are filtered). Parity
  * with the declarative HOF fold is asserted in VectorExpressionsSpec. */
case class CdcBounds(child: Expression, window: Int, minLen: Int,
                     maxLen: Int, mask: Int, prime: Long,
                     pows: IndexedSeq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(maxLen >= window && minLen >= 1 && window >= 1,
    "cdc bounds need maxLen >= window >= 1 and minLen >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc bounds expect string, got ${other.simpleString}")
  }

  @transient private lazy val powArr: Array[Long] = pows.toArray

  override def nullSafeEval(s: Any): Any =
    CdcUtil.cdcBounds(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      window, minLen, maxLen, mask, prime, powArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val powsRef = ctx.addReferenceObj("cdcPows", powArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcUtil.cdcBounds($c, $window, $minLen, $maxLen, " +
        s"$mask, ${prime}L, $powsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared portable-hash primitive: the leading 15 hex nibbles of a sha256
  * digest as a nonnegative long — the `portableHash64` contract every
  * DuckDB oracle reproduces digit-for-digit. ONE implementation so the
  * simhash and gram-hash kernels cannot drift apart. */
private[functions] object ShaPrefix {
  def of60Bits(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }
}

/** JVM kernel for [[SimHash64]] — called from generated code (the standard
  * shape for loop-heavy expressions: one static call per row, tight
  * primitive loops inside, no per-element expression interpretation). */
object SimHashUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def simhash64(toks: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      // null token hashes to the seed — exactly what the HOF form's
      // xxhash64(lambda t) does with a null element
      val h =
        if (toks.isNullAt(t)) 42L
        else {
          val s = toks.getUTF8String(t)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
      t += 1
    }
    // MSB-first assembly: hash-bit i lands at result bit 63-i, matching the
    // fold `acc << 1 | (sum_i > 0)` over ascending i
    var acc = 0L
    var i = 0
    while (i < 64) {
      acc = (acc << 1) | (if (sums(i) > 0) 1L else 0L)
      i += 1
    }
    acc
  }

  /** Portable-hash variant: token hash = first 15 hex digits of sha256 as a
    * bigint — identical to `portableHash64` (the 15 leading nibbles ARE the
    * big-endian first 8 bytes shifted right by one nibble), 60-bit majority
    * vote, bits assembled to positions 59..0. A null token contributes −1
    * on every bit (the HOF form's `when(null) → otherwise(-1)` path). */
  def simhashPortable60(toks: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sums = new Array[Int](60)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val h =
        if (toks.isNullAt(t)) 0L
        else ShaPrefix.of60Bits(md, toks.getUTF8String(t).getBytes)
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
      t += 1
    }
    var acc = 0L
    var i = 0
    while (i < 60) {
      acc = (acc << 1) | (if (sums(i) > 0) 1L else 0L)
      i += 1
    }
    acc
  }
}

object GramHashUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** Hashes of all positional word k-grams (space-joined, repeats kept) —
    * the fused kernel for `transform(positionalShingles(toks, k), hash)`:
    * per gram one UTF8String concat + one hash, no per-element expression
    * interpretation. `sha` = portableHash64 semantics (sha256 leading 15
    * nibbles); otherwise xxhash64 seed 42. Byte-identical to hashing the
    * `concat_ws(" ", ...)` gram strings (concatWs skips null tokens the
    * same way). */
  def gramHashes(toks: ArrayData, k: Int, sha: Boolean): ArrayData = {
    val n = toks.numElements()
    val cnt = n - (k - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val md = if (sha) java.security.MessageDigest.getInstance("SHA-256") else null
    val parts = new Array[UTF8String](k)
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < k) { parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(Space, parts: _*)
      out(i) =
        if (sha) ShaPrefix.of60Bits(md, gram.getBytes)
        else XXH64.hashUnsafeBytes(gram.getBaseObject, gram.getBaseOffset, gram.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Positional word-k-gram hashes as ONE native expression — fuses the gram
  * construction (`positionalShingles`) with the per-gram hash, replacing a
  * CodegenFallback HOF chain. Parity with the declarative form is asserted
  * in VectorExpressionsSpec.
  */
case class WordGramHashes(child: Expression, k: Int, sha: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word gram hashes expect array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(toks: Any): Any =
    GramHashUtil.gramHashes(toks.asInstanceOf[ArrayData], k, sha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashUtil.gramHashes($c, $k, $sha)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[LshBuckets]] — one pass over the flattened plane matrix
  * per row instead of numTables·bits separate dot+when expression trees
  * (round-3 verdict #5: the chained form re-walked 144 CodegenFallback-free
  * but still separate trees; this is one static call with tight loops). */
object LshUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** All `numTables` buckets of `v`: bucket(t) = fold over j ascending of
    * acc<<1 | (dot(v, plane(t·bits+j)) >= 0). Sign semantics replicate the
    * HOF fold exactly: a length mismatch or null element nulls every dot,
    * and `when(null >= 0).otherwise(0)` made every bit 0 — so those rows get
    * all-zero buckets here too (parity asserted in VectorExpressionsSpec).
    */
  def buckets(v: ArrayData, planes: Array[Double], numTables: Int,
              bits: Int, dim: Int): ArrayData = {
    val out = new Array[Long](numTables)
    val n = v.numElements()
    var ok = n == dim
    var i = 0
    while (ok && i < n) { if (v.isNullAt(i)) ok = false; i += 1 }
    if (ok) {
      val x = new Array[Double](n)
      i = 0
      while (i < n) { x(i) = v.getDouble(i); i += 1 }
      var p = 0 // running base offset into the flattened plane matrix
      var t = 0
      while (t < numTables) {
        var acc = 0L
        var j = 0
        while (j < bits) {
          var s = 0.0
          var d = 0
          while (d < dim) { s += x(d) * planes(p + d); d += 1 }
          acc = (acc << 1) | (if (s >= 0.0) 1L else 0L)
          p += dim
          j += 1
        }
        out(t) = acc
        t += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** All random-hyperplane LSH bucket values of a vector as ONE native
  * expression — fuses numTables·bits sign-bit dot products into a single
  * matrix-vector kernel call (the [[WordGramHashes]] shape). The plane
  * matrix rides into generated code as a referenced object, not a literal
  * tree. Parity with the chained dot+when fold is asserted in
  * VectorExpressionsSpec.
  */
case class LshBuckets(child: Expression, planes: IndexedSeq[Double],
                      numTables: Int, bits: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val planeArr: Array[Double] = planes.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh buckets expect array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LshUtil.buckets(v.asInstanceOf[ArrayData], planeArr, numTables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planeArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshUtil.buckets($c, $planesRef, $numTables, $bits, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM kernel for [[NearestCodewords]] — the codebook-assignment hot loop.
  *
  * Replaces the unrolled literal-expression form (k `struct(key, id)`
  * entries each holding a d-element `array(lit...)` dot product, sorted by
  * `array_sort`): that form's generated code grows O(k·d) — at the
  * SemDeDup-scale k the [[graft.operators.Similarity.semanticK]] policy
  * derives (k ≈ N/250), task binaries reached multiple MiB and the
  * per-pass cost scaled with CODE size, not data. This kernel is one
  * static call per row with tight primitive loops; the codebook rides in
  * as a referenced object (k·d doubles), so generated code stays
  * constant-size however large k grows.
  *
  * Bit-exactness contract with the expression form it replaces (asserted
  * in VectorExpressionsSpec):
  *  - dots are strict ascending-index folds (the [[DotProduct]] order);
  *  - cosine key = -(dot / (nrm · nrmA)) with nrm = sqrt(ascending
  *    self-dot), exactly the materialized `sqrt(dot(v,v))` column;
  *  - L2 key = cSq − 2·dot (cSq precomputed driver-side with the same
  *    fold);
  *  - ordering = Spark's double ordering (x == y ties −0.0 with 0.0, NaN
  *    compares greater than everything and equal to itself), ties broken
  *    by ascending codeword id — the `array_sort` struct discipline;
  *  - an invalid vector (null element / length ≠ dim) nulls every key,
  *    so ALL entries tie and the lowest ids win, id-ascending.
  */
object CodebookUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Spark's SQL double ordering: -0.0 == 0.0, NaN > any non-NaN,
    * NaN == NaN. */
  private def cmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  /** Ids of the `keep` nearest codewords of `v`, best first. `flat` is the
    * row-major k·dim codebook; `aux(j)` is the codeword's precomputed
    * constant — L2 norm for the cosine metric, ascending-fold squared norm
    * for L2. `ids` must be strictly ascending (both codebook builders
    * emit id-sorted entries). */
  def nearestIds(v: ArrayData, ids: Array[Long], flat: Array[Double],
                 aux: Array[Double], dim: Int, l2: Boolean,
                 keep: Int): ArrayData = {
    val k = ids.length
    val out = math.min(keep, k)
    var ok = v.numElements() == dim
    var i = 0
    while (ok && i < dim) { if (v.isNullAt(i)) ok = false; i += 1 }
    if (!ok) {
      // every key is null -> all entries tie -> ascending id order
      return new GenericArrayData(java.util.Arrays.copyOfRange(ids, 0, out))
    }
    val x = new Array[Double](dim)
    i = 0
    while (i < dim) { x(i) = v.getDouble(i); i += 1 }
    var nrm = 0.0
    if (!l2) {
      var s = 0.0
      i = 0
      while (i < dim) { s += x(i) * x(i); i += 1 }
      nrm = math.sqrt(s)
    }
    val keys = new Array[Double](k)
    var j = 0
    while (j < k) {
      var d = 0.0
      val base = j * dim
      i = 0
      while (i < dim) { d += x(i) * flat(base + i); i += 1 }
      keys(j) = if (l2) aux(j) - 2.0 * d else -(d / (nrm * aux(j)))
      j += 1
    }
    if (out == 1) {
      var best = 0
      j = 1
      while (j < k) { if (cmp(keys(j), keys(best)) < 0) best = j; j += 1 }
      new GenericArrayData(Array(ids(best)))
    } else {
      // stable sort of id-ascending indices by key == sort by (key, id)
      val idx = Array.range(0, k).map(Integer.valueOf)
      java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
        override def compare(a: Integer, b: Integer): Int =
          cmp(keys(a), keys(b))
      })
      val res = new Array[Long](out)
      j = 0
      while (j < out) { res(j) = ids(idx(j)); j += 1 }
      new GenericArrayData(res)
    }
  }
}

/** Top-`keep` codebook assignment of a vector as ONE native expression over
  * a referenced codebook object — see [[CodebookUtil.nearestIds]] for the
  * exact contract. Returns `array<bigint>` of codeword ids, best first
  * (`keep = 1` + `getItem(0)` is the argmin/argmax form). */
case class NearestCodewords(child: Expression, ids: IndexedSeq[Long],
                            flat: IndexedSeq[Double], aux: IndexedSeq[Double],
                            dim: Int, l2: Boolean, keep: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val flatArr: Array[Double] = flat.toArray
  @transient private lazy val auxArr: Array[Double] = aux.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest codewords expect array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CodebookUtil.nearestIds(v.asInstanceOf[ArrayData], idArr, flatArr, auxArr,
      dim, l2, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cbIds", idArr, "long[]")
    val flatRef = ctx.addReferenceObj("cbFlat", flatArr, "double[]")
    val auxRef = ctx.addReferenceObj("cbAux", auxArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CodebookUtil.nearestIds($c, $idsRef, $flatRef, " +
        s"$auxRef, $dim, $l2, $keep)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array as a native codegen'd expression —
  * replaces the nested HOF form (`aggregate(transform(toks, xxhash64), ...)`
  * with a 64-entry zip per token), which paid interpreted eval for every
  * token × bit step. Bit-identical by construction: same xxhash64 seed
  * (42), same ±1 majority vote, same MSB-first assembly — asserted against
  * the HOF form in VectorExpressionsSpec.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  private def kernel = if (portable) "simhashPortable60" else "simhash64"

  override def nullSafeEval(toks: Any): Any =
    if (portable) SimHashUtil.simhashPortable60(toks.asInstanceOf[ArrayData])
    else SimHashUtil.simhash64(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
