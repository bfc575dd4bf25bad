package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec on the in-JDK `javax.imageio` stack (public API, no
  * extra dependencies): PNG/JPEG decode to ARGB pixels, PNG encode, and
  * bilinear resize. Pure JVM, headless-safe, deterministic decode
  * (PNG is lossless, so decode(encodePng(px)) == px exactly).
  *
  * This replaces the round-1 byte-stat stub for image payloads; audio
  * and video decode remain stubbed ([[Multimodal.StubDecoder]]) because
  * the JDK ships no codecs for them — the plug point is unchanged.
  */
object ImageCodec {

  // ImageIO defaults to a FILE-backed stream cache — a temp file created
  // and deleted per encode/decode call, which serializes a parallel
  // decode pass on filesystem metadata ops. In-memory payloads need no
  // cache at all.
  ImageIO.setUseCache(false)

  /** Decoded raster: width, height, ARGB pixels row-major. */
  final case class Decoded(width: Int, height: Int, pixels: Array[Int])

  /** Decode any ImageIO-supported payload (PNG, JPEG, GIF, BMP).
    * Returns None for undecodable bytes — callers fall back to the
    * non-image path.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        Some(Decoded(w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Exception => None }

  /** Encode ARGB pixels as PNG (lossless, ALPHA PRESERVED — an RGB
    * buffer here would silently force alpha to 0xFF and break the
    * decode(encodePng(px)) == px invariant for any non-opaque raster).
    */
  def encodePng(width: Int, height: Int, argb: Array[Int]): Array[Byte] = {
    require(argb.length == width * height, "pixel count must be width*height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, width, height, argb, 0, width)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode, bilinear-resample to (w, h), re-encode as PNG. None if the
    * payload is not a decodable image. Alpha flows through: the draw
    * uses AlphaComposite.Src (straight replacement, no compositing), so
    * transparent sources resample their stored RGB instead of
    * compositing to black against the empty destination.
    */
  def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decode(bytes).map { d =>
      val src = new BufferedImage(d.width, d.height, BufferedImage.TYPE_INT_ARGB)
      src.setRGB(0, 0, d.width, d.height, d.pixels, 0, d.width)
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      val g = dst.createGraphics()
      try {
        g.setComposite(java.awt.AlphaComposite.Src)
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val px = dst.getRGB(0, 0, w, h, null, 0, w)
      encodePng(w, h, px)
    }

  /** Per-channel mean of an ARGB raster: (meanR, meanG, meanB). Exact
    * long sums, one division — cross-engine-reproducible doubles.
    */
  def channelMeans(d: Decoded): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < d.pixels.length) {
      val p = d.pixels(i)
      r += (p >> 16) & 0xff
      g += (p >> 8) & 0xff
      b += p & 0xff
      i += 1
    }
    val n = d.pixels.length.toDouble
    (r / n, g / n, b / n)
  }
}
