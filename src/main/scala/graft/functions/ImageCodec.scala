package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** REAL image encode/decode kernels on the JDK's `javax.imageio` — no
  * external image library needed. This replaces the round-≤7 digest
  * stub for the reference's S2 JPEG decode
  * (reference: queue_time_predictions/preprocess_image.py:36-54
  * cv2.imdecode, :56-74 resize): the bytes entering the operator are
  * genuine PNG streams, the decode is a genuine PNG decode, and the
  * resize is a real pixel-level transform on the decoded raster.
  *
  * Oracle strategy: the test fixture [[synthPng]] renders pixel
  * (x, y) of doc `d` as the closed-form color
  * `r=(31x+17y+d)%256, g=(13x+7y+2d)%256, b=(5x+3y+3d)%256` in a
  * `(8+d%8) × (8+d%4)` image. PNG is lossless and nearest-neighbor
  * sampling is exact, so every downstream stat (channel sums of the
  * decoded and of the decode→resize→encode→decode image) is
  * computable analytically in DuckDB — the decode chain is therefore
  * fully oracle-gated, not just spec-pinned.
  *
  * Scale shape: all three kernels are per-row narrow maps (no
  * shuffle, no driver involvement); payloads ride BinaryType columns
  * through scans/shuffles like any other column. On a 1000-executor
  * cluster this is embarrassingly parallel — the cost model is CPU
  * per byte, which is exactly what AQE/partition sizing already
  * balances.
  */
object ImageCodec {

  // ImageIO's default stream cache is a temp FILE per encode/decode —
  // per-row disk I/O in a tight loop. Heap streams only.
  ImageIO.setUseCache(false)

  /** Deterministic fixture size: width 8..15, height 8..11. */
  def widthOf(docId: Long): Int = (8 + Math.floorMod(docId, 8)).toInt
  def heightOf(docId: Long): Int = (8 + Math.floorMod(docId, 4)).toInt

  /** Closed-form pixel channels — MUST match the oracle SQL. */
  def rgbOf(docId: Long, x: Int, y: Int): Int = {
    val r = Math.floorMod(31L * x + 17L * y + docId, 256L).toInt
    val g = Math.floorMod(13L * x + 7L * y + 2L * docId, 256L).toInt
    val b = Math.floorMod(5L * x + 3L * y + 3L * docId, 256L).toInt
    (r << 16) | (g << 8) | b
  }

  /** Render the deterministic fixture image and encode it as a real
    * PNG byte stream (lossless — decode recovers every pixel). */
  def synthPng(docId: Long): Array[Byte] = {
    val w = widthOf(docId)
    val h = heightOf(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgbOf(docId, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode any PNG/JPEG/GIF byte stream the JDK readers understand;
    * null (→ SQL NULL) on undecodable bytes — the poison-row
    * tolerance a 100 TB media crawl needs (one truncated blob must
    * not kill the stage). */
  private def readOrNull(bytes: Array[Byte]): BufferedImage =
    try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }

  /** Decoded stats `[width, height, bands, sum_r, sum_g, sum_b]` as
    * longs, or null if the bytes don't decode. Channel sums are the
    * feature-extraction stand-in that stays exactly verifiable. */
  def decodeStats(bytes: Array[Byte]): ArrayData = {
    val img = readOrNull(bytes)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    new GenericArrayData(Array[Long](w.toLong, h.toLong,
      img.getRaster.getNumBands.toLong, sr, sg, sb))
  }

  /** Decode → convex-polygon ROI accounting (the real-pixel half of
    * the reference's `paint_everything_outside_ROI`,
    * preprocess_image.py:57-79): pixel (x, y) is INSIDE iff every
    * edge cross product of the clockwise contour is ≤ 0 — the same
    * closed half-plane contract as `VisionOps.insideRoi`, so the
    * oracle restates it per pixel in integer arithmetic. Returns
    * `[n_in, sum_r_in, sum_g_in, sum_b_in, sum_r_out, sum_g_out,
    * sum_b_out]`; null on undecodable bytes. `poly` is the flattened
    * vertex list (x0, y0, x1, y1, ...). */
  def roiStats(bytes: Array[Byte], poly: Array[Long]): ArrayData = {
    val img = readOrNull(bytes)
    if (img == null) return null
    val n = poly.length / 2
    val w = img.getWidth
    val h = img.getHeight
    var nIn = 0L
    var sri = 0L; var sgi = 0L; var sbi = 0L
    var sro = 0L; var sgo = 0L; var sbo = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var inside = true
        var i = 0
        while (inside && i < n) {
          val xi = poly(2 * i); val yi = poly(2 * i + 1)
          val xj = poly(2 * ((i + 1) % n)); val yj = poly(2 * ((i + 1) % n) + 1)
          inside = (xj - xi) * (y - yi) - (yj - yi) * (x - xi) <= 0
          i += 1
        }
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        if (inside) { nIn += 1; sri += r; sgi += g; sbi += b }
        else { sro += r; sgo += g; sbo += b }
        x += 1
      }
      y += 1
    }
    new GenericArrayData(Array[Long](nIn, sri, sgi, sbi, sro, sgo, sbo))
  }

  /** Real decode → nearest-neighbor downsample by `factor` (keep
    * pixels at coordinates divisible by factor — exact, so the oracle
    * can restate it) → lossless PNG re-encode. Null on undecodable
    * input or when the image is smaller than one sample. */
  def resizeNN(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val img = readOrNull(bytes)
    if (img == null) return null
    val w = img.getWidth / factor
    val h = img.getHeight / factor
    if (w < 1 || h < 1) return null
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        out.setRGB(i, j, img.getRGB(i * factor, j * factor) & 0xffffff)
        i += 1
      }
      j += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}

/** Native expression: docId → deterministic real PNG bytes. Codegen
  * is a single static call — the kernel cost is the PNG encoder, not
  * expression dispatch, so the row stays inside whole-stage codegen.
  */
case class PngSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(id: Any): Any =
    ImageCodec.synthPng(id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageCodec.synthPng($c)")

  override protected def withNewChildInternal(newChild: Expression): PngSynth =
    copy(child = newChild)
}

/** Native expression: image bytes → `[w, h, bands, sum_r, sum_g,
  * sum_b]` (null on undecodable bytes). */
case class PngDecodeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(bytes: Any): Any =
    ImageCodec.decodeStats(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("stats")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.ImageCodec.decodeStats($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PngDecodeStats = copy(child = newChild)
}

/** Native expression: image bytes → polygon-ROI channel accounting
  * `[n_in, sum_r_in, sum_g_in, sum_b_in, sum_r_out, sum_g_out,
  * sum_b_out]` for the convex contour `poly` ((x, y) vertex pairs,
  * clockwise); null on undecodable bytes. The polygon is a plan-time
  * constant carried as a codegen reference object, so the per-row
  * kernel is one static call and stays inside whole-stage codegen. */
case class PngRoiStats(child: Expression, poly: Seq[(Int, Int)])
    extends UnaryExpression {
  require(poly.size >= 3, s"polygon needs >= 3 vertices, got ${poly.size}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val flat: Array[Long] =
    poly.flatMap { case (x, y) => Seq(x.toLong, y.toLong) }.toArray

  override protected def nullSafeEval(bytes: Any): Any =
    ImageCodec.roiStats(bytes.asInstanceOf[Array[Byte]], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polyRef = ctx.addReferenceObj("roiPoly", flat, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("roi")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.ImageCodec.roiStats($c, $polyRef);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PngRoiStats = copy(child = newChild)
}

/** Native expression: decode → nearest-neighbor downsample → PNG
  * re-encode (null on undecodable / too-small input). */
case class PngResizeNN(child: Expression, factor: Int)
    extends UnaryExpression {
  require(factor >= 1, s"factor must be >= 1, got $factor")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(bytes: Any): Any =
    ImageCodec.resizeNN(bytes.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("resized")
      s"""
         |byte[] $tmp = graft.functions.ImageCodec.resizeNN($c, $factor);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PngResizeNN = copy(child = newChild)
}
