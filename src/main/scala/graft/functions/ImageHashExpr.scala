package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual hashes over a raw media payload (`binary` column) — the
  * image twin of the text near-dup hashes: a 64-bit fingerprint whose
  * Hamming distance tracks visual similarity, so the d4 SimHash
  * banding machinery (4×16-bit bands, exact to distance ≤ 3) turns
  * image near-dup detection into the same bucketed join as text
  * SimHash — never all-pairs.
  *
  * Both hashes downsample the payload to a fixed cell grid with EXACT
  * integer arithmetic (floor boundaries, cross-multiplied mean
  * comparisons — no float division anywhere), so any engine replaying
  * the same byte stream gets the identical 64 bits: the property that
  * makes the whole pipeline oracle-checkable.
  *
  *  - [[ImageAHash]] — average hash: bit c is set iff cell c's mean
  *    byte exceeds the payload's global mean byte
  *    (`cellSum·n > total·cellWidth`, 64 cells).
  *  - [[ImageDHash]] — difference (gradient) hash: bit c is set iff
  *    cell c's mean exceeds cell c+1's
  *    (`s_c·w_{c+1} > s_{c+1}·w_c`, 65 cells → 64 adjacent
  *    comparisons).
  *
  * The container has no image codecs, so the "decoded raster" is the
  * payload byte stream itself (a 1-D signal; a real deployment hashes
  * the decoded 8×8 luma grid — the banding and every downstream
  * operator are unchanged). Exactness bound: the cross-multiplied
  * comparisons stay inside signed 64-bit for payloads under ~1.9e8
  * bytes (255·n² < 2⁶³); larger payloads would be hashed after decode
  * + resize anyway.
  *
  * Map-only, codegen'd (`doGenCode` → static helper reading the byte
  * array once): scan-speed at 100 TB, like [[StopwordHits]].
  */
abstract class ImageHash64 extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary column, got $other")
    }
}

case class ImageAHash(child: Expression) extends ImageHash64 {
  override def prettyName: String = "image_ahash"
  override def nullSafeEval(b: Any): Any =
    ImageHashes.ahash(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ImageHashes.ahash($b)")
  override protected def withNewChildInternal(c: Expression): ImageAHash =
    copy(child = c)
}

case class ImageDHash(child: Expression) extends ImageHash64 {
  override def prettyName: String = "image_dhash"
  override def nullSafeEval(b: Any): Any =
    ImageHashes.dhash(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ImageHashes.dhash($b)")
  override protected def withNewChildInternal(c: Expression): ImageDHash =
    copy(child = c)
}

object ImageAHash {
  def apply(c: Column): Column =
    GraftColumnBridge.column(ImageAHash(GraftColumnBridge.expression(c)))
}
object ImageDHash {
  def apply(c: Column): Column =
    GraftColumnBridge.column(ImageDHash(GraftColumnBridge.expression(c)))
}

/** Shared by interpreted eval and generated code. Cell c of a k-cell
  * downsample covers byte indices [⌊c·n/k⌋, ⌊(c+1)·n/k⌋) — the floor
  * boundaries every engine reproduces with integer division. */
object ImageHashes {

  /** Average hash: bit c ⇔ mean(cell c) > mean(all bytes), compared as
    * `cellSum·n > total·cellWidth` (exact integers). Empty payload → 0. */
  def ahash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    var h = 0L
    var c = 0
    while (c < 64) {
      val lo = (c.toLong * n / 64).toInt
      val hi = ((c + 1).toLong * n / 64).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += bytes(j) & 0xff; j += 1 }
      if (s * n > total * (hi - lo)) h |= 1L << c
      c += 1
    }
    h
  }

  /** Difference hash: bit c ⇔ mean(cell c) > mean(cell c+1) over a
    * 65-cell downsample, compared as `s_c·w_{c+1} > s_{c+1}·w_c`
    * (exact integers). Empty payload → 0. */
  def dhash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val s = new Array[Long](65)
    val w = new Array[Int](65)
    var c = 0
    while (c < 65) {
      val lo = (c.toLong * n / 65).toInt
      val hi = ((c + 1).toLong * n / 65).toInt
      var acc = 0L
      var j = lo
      while (j < hi) { acc += bytes(j) & 0xff; j += 1 }
      s(c) = acc
      w(c) = hi - lo
      c += 1
    }
    var h = 0L
    c = 0
    while (c < 64) {
      if (s(c) * w(c + 1) > s(c + 1) * w(c)) h |= 1L << c
      c += 1
    }
    h
  }
}
