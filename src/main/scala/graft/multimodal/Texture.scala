package graft.multimodal

/** 2-D Haar wavelet texture energies — the texture member of CellPhe's
  * static feature family (reference: frame_features_image.py /
  * CellPhe `extract_static_features` compute per-cell wavelet texture
  * descriptors from the ROI pixels). One decomposition level over
  * 2x2 blocks yields three detail bands; their mean squared
  * coefficients are the classic orientation-sensitive texture
  * energies:
  *
  *   LH (horizontal edges)  = (a + b - c - d) / 2
  *   HL (vertical edges)    = (a - b + c - d) / 2
  *   HH (diagonal texture)  = (a - b - c + d) / 2
  *
  * for each block [[a, b], [c, d]]. The math here is REAL and
  * codec-agnostic — only the pixel source in the frame pipeline is the
  * declared stub; swapping in a real decoder changes nothing in this
  * file.
  */
object Texture {

  /** Mean squared detail energies (LH, HL, HH) of one decomposition
    * level over a row-major (height x width) pixel array. Odd trailing
    * rows/columns are ignored (standard single-level behaviour). */
  def haar2dEnergies(px: Array[Double], width: Int, height: Int): (Double, Double, Double) = {
    require(px.length >= width * height, "pixel buffer smaller than width*height")
    val bw = width / 2
    val bh = height / 2
    if (bw == 0 || bh == 0) return (0.0, 0.0, 0.0)
    var lh = 0.0; var hl = 0.0; var hh = 0.0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val r0 = 2 * by * width + 2 * bx
        val r1 = r0 + width
        val a = px(r0); val b = px(r0 + 1)
        val c = px(r1); val d = px(r1 + 1)
        val vLH = (a + b - c - d) / 2.0
        val vHL = (a - b + c - d) / 2.0
        val vHH = (a - b - c + d) / 2.0
        lh += vLH * vLH; hl += vHL * vHL; hh += vHH * vHH
        bx += 1
      }
      by += 1
    }
    val n = (bw * bh).toDouble
    (lh / n, hl / n, hh / n)
  }

  /** Box-filter downsample by an integer factor: each output pixel is
    * the mean of its factor x factor source block (trailing partial
    * blocks average only the pixels they cover). This is the resize
    * step of the reference's frame pipeline (main.nf convert_jpeg /
    * re-scaling before feature extraction) — real, codec-free math,
    * applied between decode and feature extraction. Returns
    * (pixels, width, height) of the reduced frame. */
  def boxDownsample(px: Array[Double], width: Int, height: Int,
                    factor: Int): (Array[Double], Int, Int) = {
    require(factor >= 1, "factor must be >= 1")
    require(px.length >= width * height, "pixel buffer smaller than width*height")
    if (factor == 1) return (px, width, height)
    val ow = (width + factor - 1) / factor
    val oh = (height + factor - 1) / factor
    val out = new Array[Double](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var s = 0.0
        var n = 0
        var y = oy * factor
        val ymax = math.min(y + factor, height)
        while (y < ymax) {
          var x = ox * factor
          val xmax = math.min(x + factor, width)
          while (x < xmax) { s += px(y * width + x); n += 1; x += 1 }
          y += 1
        }
        out(oy * ow + ox) = s / n
        ox += 1
      }
      oy += 1
    }
    (out, ow, oh)
  }
}
