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

  /** Per-term decimal-quantized accumulator (scale 8, HALF_UP via the
    * shortest decimal representation — the BigramModel.score contract):
    * decimal addition is exact, so the sum is ORDER-INDEPENDENT and
    * replicates `SUM(CAST(term AS DECIMAL(28,8)))` bit-for-bit on any
    * engine. The GLCM features need this because their terms are
    * rationals like (c/224)² that land exactly on rounding boundaries,
    * where a float-sum's order-dependent ulp decides the rounded
    * output. */
  private final class DecSum {
    private var acc = java.math.BigDecimal.ZERO
    def add(x: Double): Unit =
      acc = acc.add(new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(8, java.math.RoundingMode.HALF_UP))
    def value: Double = acc.doubleValue()
  }

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

  /** Grey-level cooccurrence (Haralick) texture features — the "Coo"
    * member of CellPhe's static texture family (the reference's
    * `extract_static_features` computes cooccurrence-matrix texture
    * descriptors from the ROI pixels alongside the wavelet energies;
    * bin/frame_features_image.py:58-66). Pixels are min-max quantized
    * into `levels` grey bins, the SYMMETRIC cooccurrence matrix is
    * accumulated over the two axis-aligned unit displacements
    * (right + down — the standard orientation-summed symmetric GLCM),
    * normalized to probabilities, and the five classic Haralick
    * statistics are returned:
    *
    *   contrast    = sum p(i,j) * (i-j)^2
    *   homogeneity = sum p(i,j) / (1 + (i-j)^2)      (IDM)
    *   energy      = sum p(i,j)^2                    (ASM)
    *   entropy     = -sum p(i,j) * ln p(i,j)
    *   correlation = sum (i-mu)(j-mu) p(i,j) / var   (0 if var == 0)
    *
    * A flat image (max == min) quantizes to a single bin: energy 1,
    * contrast/entropy 0, correlation defined as 0. Images with no
    * neighbour pair (1x1) return all zeros. Real, codec-free math —
    * like the Haar energies, only the frame pipeline's pixel source is
    * the declared stub. */
  def glcmFeatures(px: Array[Double], width: Int, height: Int,
                   levels: Int = 8): (Double, Double, Double, Double, Double) = {
    require(levels >= 2, "levels must be >= 2")
    require(px.length >= width * height, "pixel buffer smaller than width*height")
    val n = width * height
    if (n == 0 || (width < 2 && height < 2)) return (0.0, 0.0, 0.0, 0.0, 0.0)
    var mn = Double.MaxValue; var mx = Double.MinValue
    var i = 0
    while (i < n) { val v = px(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    val span = mx - mn
    val q = new Array[Int](n)
    if (span > 0) {
      i = 0
      while (i < n) {
        val b = ((px(i) - mn) / span * levels).toInt
        q(i) = if (b >= levels) levels - 1 else b
        i += 1
      }
    }
    val counts = new Array[Long](levels * levels)
    var total = 0L
    var y = 0
    while (y < height) {
      var x = 0
      val row = y * width
      while (x < width) {
        val a = q(row + x)
        if (x + 1 < width) { // right neighbour, symmetric
          val b = q(row + x + 1)
          counts(a * levels + b) += 1; counts(b * levels + a) += 1; total += 2
        }
        if (y + 1 < height) { // down neighbour, symmetric
          val b = q(row + width + x)
          counts(a * levels + b) += 1; counts(b * levels + a) += 1; total += 2
        }
        x += 1
      }
      y += 1
    }
    if (total == 0L) return (0.0, 0.0, 0.0, 0.0, 0.0)
    val contrast = new DecSum; val homog = new DecSum
    val energy = new DecSum; val negEntropy = new DecSum
    val muS = new DecSum
    var ii = 0
    while (ii < levels) {
      var jj = 0
      while (jj < levels) {
        val c = counts(ii * levels + jj)
        if (c > 0L) {
          val p = c.toDouble / total
          val d = ii - jj
          contrast.add(p * d * d)
          homog.add(p / (1.0 + d * d))
          energy.add(p * p)
          negEntropy.add(p * StrictMath.log(p))
          muS.add(ii * p) // row marginal mean (== column mean by symmetry)
        }
        jj += 1
      }
      ii += 1
    }
    val mu = muS.value
    val varrS = new DecSum; val covS = new DecSum
    ii = 0
    while (ii < levels) {
      var jj = 0
      while (jj < levels) {
        val c = counts(ii * levels + jj)
        if (c > 0L) {
          val p = c.toDouble / total
          varrS.add((ii - mu) * (ii - mu) * p)
          covS.add((ii - mu) * (jj - mu) * p)
        }
        jj += 1
      }
      ii += 1
    }
    val varr = varrS.value
    val corr = if (varr > 0) covS.value / varr else 0.0
    (contrast.value, homog.value, energy.value, -negEntropy.value, corr)
  }

  /** First-order intensity statistics — the non-spatial half of the
    * static texture family: mean, population standard deviation,
    * Fisher skewness (0 when sd == 0), and interquartile range using
    * the type-7 (linear-interpolation) quantile convention shared by
    * numpy/R defaults. */
  def firstOrderStats(px: Array[Double], n: Int): (Double, Double, Double, Double) = {
    require(n <= px.length)
    if (n == 0) return (0.0, 0.0, 0.0, 0.0)
    var s = 0.0
    var i = 0
    while (i < n) { s += px(i); i += 1 }
    val mean = s / n
    val m2S = new DecSum; val m3S = new DecSum
    i = 0
    while (i < n) {
      val d = px(i) - mean
      m2S.add(d * d); m3S.add(d * d * d)
      i += 1
    }
    val m2 = m2S.value
    val m3 = m3S.value
    val varp = m2 / n
    val sd = math.sqrt(varp)
    val skew = if (sd > 0) (m3 / n) / (sd * sd * sd) else 0.0
    val sorted = java.util.Arrays.copyOf(px, n)
    java.util.Arrays.sort(sorted)
    def q7(p: Double): Double = {
      val h = (n - 1) * p
      val lo = h.toInt
      val hi = math.min(lo + 1, n - 1)
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
    (mean, sd, skew, q7(0.75) - q7(0.25))
  }

  /** Bilinear resample to an exact (ow x oh) target — the general
    * resize both perceptual hashes need (boxDownsample only shrinks by
    * integer factors). Sample points are pixel centers mapped by the
    * scale ratio; edge samples clamp. Deterministic, codec-free. */
  def resampleBilinear(px: Array[Double], width: Int, height: Int,
                       ow: Int, oh: Int): Array[Double] = {
    require(width >= 1 && height >= 1 && ow >= 1 && oh >= 1)
    require(px.length >= width * height, "pixel buffer smaller than width*height")
    val out = new Array[Double](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = (oy + 0.5) * height / oh - 0.5
      val y0 = math.max(0, math.min(height - 1, math.floor(sy).toInt))
      val y1 = math.min(height - 1, y0 + 1)
      val fy = math.max(0.0, math.min(1.0, sy - y0))
      var ox = 0
      while (ox < ow) {
        val sx = (ox + 0.5) * width / ow - 0.5
        val x0 = math.max(0, math.min(width - 1, math.floor(sx).toInt))
        val x1 = math.min(width - 1, x0 + 1)
        val fx = math.max(0.0, math.min(1.0, sx - x0))
        val top = px(y0 * width + x0) * (1 - fx) + px(y0 * width + x1) * fx
        val bot = px(y1 * width + x0) * (1 - fx) + px(y1 * width + x1) * fx
        out(oy * ow + ox) = top * (1 - fy) + bot * fy
        ox += 1
      }
      oy += 1
    }
    out
  }

  private val PhashInput = 32 // DCT input side
  private val PhashBlock = 8  // retained low-frequency block side

  /** Perceptual DCT hash (pHash, Zauner 2010's DCT variant): resample
    * to 32x32, 2-D DCT-II, keep the top-left 8x8 low-frequency block,
    * and emit bit k = 1 iff coefficient k exceeds the MEDIAN of the 63
    * AC coefficients (the DC term is excluded from both the median and
    * the hash — bit 0 is always 0, so the hash is effectively 63-bit).
    * Median thresholding makes the hash invariant to any positive
    * affine brightness change: an offset moves only the excluded DC
    * term, and a positive scale multiplies every AC coefficient AND
    * their median, preserving each comparison. */
  def phash64(px: Array[Double], width: Int, height: Int): Long = {
    val small = resampleBilinear(px, width, height, PhashInput, PhashInput)
    val block = dct2dLowFreq(small, PhashInput, PhashBlock)
    // median of the 63 AC coefficients (skip [0][0])
    val ac = java.util.Arrays.copyOfRange(block, 1, block.length)
    java.util.Arrays.sort(ac)
    val median = ac(ac.length / 2)
    var hash = 0L
    var k = 1
    while (k < block.length) {
      if (block(k) > median) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Variance of the 4-neighbour Laplacian response over the interior
    * pixels — the standard focus/blur measure (a sharp frame has
    * strong second derivatives everywhere; defocus suppresses them,
    * so low variance = blurry). Exact for integral pixels: the
    * variance is computed as (n*Σr² − (Σr)²)/n² from integer-exact
    * sums, so the result is partitioning- and order-invariant.
    * Requires width, height >= 3 (no interior otherwise → 0.0). */
  def laplacianVar(px: Array[Double], width: Int, height: Int): Double = {
    if (width < 3 || height < 3) return 0.0
    var sum = 0.0
    var sumSq = 0.0
    var n = 0
    var y = 1
    while (y < height - 1) {
      var x = 1
      while (x < width - 1) {
        val r = 4.0 * px(y * width + x) - px((y - 1) * width + x) -
          px((y + 1) * width + x) - px(y * width + x - 1) - px(y * width + x + 1)
        sum += r
        sumSq += r * r
        n += 1
        x += 1
      }
      y += 1
    }
    graft.functions.Numeric.croundD((n * sumSq - sum * sum) / (n.toDouble * n), 4)
  }

  /** Difference hash (dHash): resample to 9x8 and emit one bit per
    * horizontal gradient sign (64 bits exactly). Invariant to positive
    * affine brightness changes (strict inequality is preserved). */
  def dhash64(px: Array[Double], width: Int, height: Int): Long = {
    val g = resampleBilinear(px, width, height, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Separable 2-D DCT-II of an (n x n) image, returning only the
    * top-left (block x block) coefficients row-major (all a pHash
    * needs — O(n^2 * block) per axis instead of the full O(n^3)). */
  private def dct2dLowFreq(px: Array[Double], n: Int, block: Int): Array[Double] = {
    // rows: for each row y, DCT coefficients u < block
    val rows = new Array[Double](n * block)
    val scale = math.Pi / (2.0 * n)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < block) {
        var s = 0.0
        var x = 0
        while (x < n) { s += px(y * n + x) * math.cos((2 * x + 1) * u * scale); x += 1 }
        rows(y * block + u) = s
        u += 1
      }
      y += 1
    }
    // columns: for each kept u, DCT over y with v < block
    val out = new Array[Double](block * block)
    var v = 0
    while (v < block) {
      var u = 0
      while (u < block) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rows(yy * block + u) * math.cos((2 * yy + 1) * v * scale); yy += 1 }
        out(v * block + u) = s
        u += 1
      }
      v += 1
    }
    out
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
