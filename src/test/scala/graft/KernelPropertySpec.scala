package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BigramCounts, Numeric, PolyHashing, TokenCounts, Winnow}
import graft.operators.HeavyHitters
import graft.text.Bpe

/** Property-based coverage of the scalar kernels behind the fused
  * Catalyst expressions — each property pits the hand-rolled
  * character-scan / sketch / merge-loop code against an independent
  * declarative replica (regex engine, Scala collections, brute-force
  * counting) over randomized inputs. These are the kernels where an
  * off-by-one survives example-based specs: the examples were chosen
  * by the same person who wrote the loop. Seeded — failures reproduce.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(name: String, n: Int = 300)(p: Prop): Unit = test(name) {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(20260813L))
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  // text over the classes the kernels branch on: letters, digits,
  // punctuation, every ASCII whitespace the kernels treat as \s,
  // a BMP non-ASCII letter, and an astral (surrogate-pair) emoji
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaChar.map(_.toString),
      2 -> Gen.numChar.map(_.toString),
      2 -> Gen.oneOf(".", ",", "!", "#", "%", "-", "_"),
      3 -> Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
      1 -> Gen.const("é"),
      1 -> Gen.const("😀"))).map(_.mkString)

  check("TokenCounts matches the four-regex formulation") {
    Prop.forAll(textGen) { s =>
      val row = TokenCounts.compute(UTF8String.fromString(s))
      val bpeRe = java.util.regex.Pattern
        .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
      def count(p: java.util.regex.Pattern) = {
        val m = p.matcher(s); var c = 0; while (m.find()) c += 1; c
      }
      val noWs = s.replaceAll("\\s", "")
      row.getInt(0) == s.split("\\s+", -1).length &&
        row.getInt(1) == count(bpeRe) &&
        row.getInt(2) == count(java.util.regex.Pattern.compile("[A-Za-z]+")) &&
        row.getLong(3) == noWs.codePointCount(0, noWs.length).toLong
    }
  }

  check("BigramCounts matches collection counting and conserves mass") {
    Prop.forAll(textGen) { s =>
      val arr = BigramCounts.compute(UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); r.getInt(0) -> r.getLong(1)
      }.toMap
      val want = s.zip(s.drop(1))
        .map { case (a, b) => (a.toInt << 16) | b.toInt }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got == want &&
        got.values.sum == math.max(0, s.length - 1).toLong
    }
  }

  check("Winnow fingerprints equal the sliding-window-min set") {
    val g = for {
      s <- textGen
      k <- Gen.choose(1, 5)
      w <- Gen.choose(1, 5)
    } yield (s, k, w)
    Prop.forAll(g) { case (s, k, w) =>
      val got = {
        val a = Winnow.compute(UTF8String.fromString(s), k, w)
        (0 until a.numElements()).map(a.getLong).toSeq
      }
      val nGrams = s.length - k + 1
      val want =
        if (nGrams < w) Seq.empty[Long]
        else {
          val hs = (0 until nGrams).map { i =>
            (0 until k).foldLeft(0L)((h, j) =>
              (h * 31 + s.codePointAt(i + j)) % PolyHashing.P)
          }
          hs.sliding(w).map(_.min).toSeq.distinct.sorted
        }
      got == want
    }
  }

  check("PolyHashing stays under the modulus and respects code points") {
    Prop.forAll(textGen) { s =>
      val h = PolyHashing.hashString(s)
      val cps = s.codePoints().toArray
      val want = cps.foldLeft(0L)((acc, cp) => (acc * 31 + cp) % PolyHashing.P)
      h == want && h >= 0L && h < PolyHashing.P
    }
  }

  check("Misra-Gries: k-bounded, never over-counts, misses by <= n/(k+1)") {
    val g = for {
      k <- Gen.choose(1, 6)
      items <- Gen.listOf(Gen.choose(0, 9).map(i => s"t$i"))
      cut <- Gen.choose(0, math.max(0, items.size))
    } yield (k, items, cut)
    Prop.forAll(g) { case (k, items, cut) =>
      val mg = new HeavyHitters.MisraGries(k)
      // build one sketch as a merge of two partial folds — the
      // distributed path (partial aggregation + exchange) — so the
      // guarantee is asserted over reduce AND merge
      val (l, r) = items.splitAt(cut)
      val sk = mg.merge(
        l.foldLeft(mg.zero)(mg.reduce),
        r.foldLeft(mg.zero)(mg.reduce))
      val truth = items.groupBy(identity).map { case (i, v) => i -> v.size.toLong }
      val n = items.size.toLong
      val bound = n / (k + 1).toLong
      sk.size <= k &&
        sk.forall { case (i, c) => c <= truth.getOrElse(i, 0L) } &&
        truth.forall { case (i, c) =>
          (c - sk.getOrElse(i, 0L)) <= bound
        }
    }
  }

  check("BPE encoding is lossless for any word under any trained model", 150) {
    val word = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
      .map(_.mkString)
    val g = for {
      ws <- Gen.nonEmptyListOf(word)
      counts <- Gen.listOfN(ws.size, Gen.choose(1L, 50L))
      merges <- Gen.choose(0, 30)
      probe <- word
    } yield (ws.zip(counts), merges, probe)
    Prop.forAll(g) { case (hist, merges, probe) =>
      val collapsed = hist.groupBy(_._1)
        .map { case (w, v) => (w, v.map(_._2).sum) }.toArray
      val model = Bpe.trainFromHistogram(collapsed, merges)
      // every training word and an arbitrary probe word round-trip:
      // concatenating the symbols reproduces word + end-of-word marker
      (collapsed.map(_._1) :+ probe).forall { w =>
        val syms = model.encode(w)
        syms.forall(_.nonEmpty) && syms.mkString == w + "</w>"
      }
    }
  }

  check("croundD is monotone and lands within half a step") {
    val g = for {
      x <- Gen.choose(0.0, 1e6)
      y <- Gen.choose(0.0, 1e6)
      r <- Gen.choose(0, 6)
    } yield (x, y, r)
    Prop.forAll(g) { case (x, y, r) =>
      val step = math.pow(10.0, -r)
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      Numeric.croundD(lo, r) <= Numeric.croundD(hi, r) &&
        math.abs(Numeric.croundD(x, r) - x) <= step * 0.51
    }
  }
}
