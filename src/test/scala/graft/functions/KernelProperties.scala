package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the pure native kernels (no Spark session —
  * these are the exact functions whole-stage codegen calls).
  */
object KernelProperties extends Properties("graft.kernels") {

  private val nameGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)

  property("mask preserves length (+1 iff space-free) and spaces") =
    forAll(nameGen) { s =>
      val out = ObfuscateName.mask(UTF8String.fromString(s)).toString
      val lenOk = out.length == (if (s.contains(' ')) s.length else s.length + 1)
      val spacesOk = s.zip(out).forall { case (i, o) => i != ' ' || o == ' ' }
      lenOk && spacesOk
    }

  property("mask emits only first-token chars, keep-char, space, star") =
    forAll(nameGen.suchThat(_.contains(' '))) { s =>
      val out = ObfuscateName.mask(UTF8String.fromString(s)).toString
      val sp = s.indexOf(' ')
      val first = s.substring(0, sp)
      val last = s.substring(sp + 1)
      val allowed: Set[Char] =
        first.toSet ++ Set(' ', '*') ++ last.headOption.toSet
      out.forall(allowed.contains)
    }

  private val tokensGen: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))

  property("shingles: distinct, n-1 inner spaces, count bounded") =
    forAll(tokensGen, Gen.choose(1, 4)) { (tokens, n) =>
      val text = tokens.mkString(" ")
      val arr = NGramShingles.shingleKernel(UTF8String.fromString(text), n)
      val shingles = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val distinctOk = shingles.distinct.size == shingles.size
      val countOk = shingles.size <= math.max(1, tokens.size - n + 1)
      val shapeOk = tokens.size < n ||
        shingles.forall(_.count(_ == ' ') == n - 1)
      distinctOk && countOk && shapeOk
    }

  property("minhash band keys are order-invariant over the shingle set") =
    forAll(Gen.nonEmptyListOf(Gen.identifier), Gen.choose(0L, Long.MaxValue)) { (xs, seed) =>
      def keys(l: Seq[String]) = {
        val a = new GenericArrayData(l.map(UTF8String.fromString).toArray[Any])
        val k = MinHash.bandKeys(a, 8, 4)
        (0 until k.numElements()).map(k.getLong)
      }
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      keys(xs) == keys(shuffled) && keys(xs).size == 8
    }

  private val vecGen: Gen[Array[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-10.0, 10.0)).map(_.toArray)

  property("cosine is symmetric, bounded, and 1 on self") =
    forAll(vecGen) { v =>
      val a = new GenericArrayData(v.map(x => x: Any))
      val self = VectorKernels.cosine(a, a, false, false)
      val norm = math.sqrt(v.map(x => x * x).sum)
      if (norm == 0.0) Prop(self == null)
      else Prop(math.abs(self - 1.0) < 1e-9)
    }

  property("cosine(a,b) == cosine(b,a) and within [-1-eps, 1+eps]") =
    forAll(vecGen, vecGen) { (x, y) =>
      val n = math.min(x.length, y.length)
      val a = new GenericArrayData(x.take(n).map(v => v: Any))
      val b = new GenericArrayData(y.take(n).map(v => v: Any))
      val ab = VectorKernels.cosine(a, b, false, false)
      val ba = VectorKernels.cosine(b, a, false, false)
      if (ab == null) Prop(ba == null)
      else Prop(ab == ba && ab <= 1.0 + 1e-9 && ab >= -1.0 - 1e-9)
    }

  property("simhash of identical token lists is identical; 64-bit stable") =
    forAll(Gen.listOf(Gen.identifier)) { xs =>
      val a = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
      val b = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
      SimHash.compute(a) == SimHash.compute(b)
    }

  property("split signature -> bands equals the fused band kernel") =
    forAll(Gen.nonEmptyListOf(Gen.identifier)) { xs =>
      val a = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
      val fused = MinHash.bandKeys(a, 8, 4)
      val split = MinHash.bandsKernel(MinHash.sigKernel(a, 32), 8)
      (0 until 8).forall(i => fused.getLong(i) == split.getLong(i))
    }

  property("sig_overlap: 1 on self, 0..1 always, symmetric") =
    forAll(Gen.nonEmptyListOf(Gen.identifier), Gen.nonEmptyListOf(Gen.identifier)) { (xs, ys) =>
      val a = MinHash.sigKernel(new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any]), 64)
      val b = MinHash.sigKernel(new GenericArrayData(ys.map(UTF8String.fromString).toArray[Any]), 64)
      val self = MinHash.overlapFrac(a, a)
      val ab = MinHash.overlapFrac(a, b)
      self == 1.0 && ab == MinHash.overlapFrac(b, a) && ab >= 0.0 && ab <= 1.0
    }

  property("signature is order-invariant over the element list") =
    forAll(Gen.nonEmptyListOf(Gen.identifier)) { xs =>
      val a = MinHash.sigKernel(new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any]), 64)
      val b = MinHash.sigKernel(new GenericArrayData(xs.reverse.map(UTF8String.fromString).toArray[Any]), 64)
      MinHash.overlapFrac(a, b) == 1.0
    }

  property("sig_overlap estimates true Jaccard within sampling error") = {
    // fixed sets with known overlap: |A∩B| = 50, |A∪B| = 150, j = 1/3.
    // k=256 positions -> sd = sqrt(j(1-j)/k) ~ 0.029; 5 sd tolerance on a
    // DETERMINISTIC estimate (fixed hash family), so this cannot flake.
    val a = (0 until 100).map(i => s"tok$i")
    val b = (50 until 150).map(i => s"tok$i")
    val sa = MinHash.sigKernel(new GenericArrayData(a.map(UTF8String.fromString).toArray[Any]), 256)
    val sb = MinHash.sigKernel(new GenericArrayData(b.map(UTF8String.fromString).toArray[Any]), 256)
    Prop(math.abs(MinHash.overlapFrac(sa, sb) - 1.0 / 3.0) < 0.15)
  }

  property("fingerprint: order-sensitive, whitespace-run-invariant") =
    forAll(Gen.nonEmptyListOf(Gen.identifier)) { xs =>
      val one = Fingerprint.fingerprintKernel(UTF8String.fromString(xs.mkString(" ")))
      val multi = Fingerprint.fingerprintKernel(UTF8String.fromString(xs.mkString("  ") + "\n"))
      val rev = Fingerprint.fingerprintKernel(UTF8String.fromString(xs.reverse.mkString(" ")))
      Prop(one == multi) && Prop(xs == xs.reverse || one != rev)
    }

  private def centArr(cents: Seq[(Long, Array[Float])]): GenericArrayData =
    new GenericArrayData(cents.map { case (id, v) =>
      org.apache.spark.sql.catalyst.InternalRow(id,
        new GenericArrayData(v.map(x => x: Any)))
    }.toArray[Any])

  property("nearest_cell picks the argmin cell; ties break to smaller id") =
    forAll(Gen.choose(-5.0f, 5.0f), Gen.choose(-5.0f, 5.0f)) { (x, y) =>
      val vec = new GenericArrayData(Array[Any](x, y))
      // two identical centroids (ids 7, 3) plus a far one (id 1)
      val cents = centArr(Seq(
        (7L, Array(x, y)), (3L, Array(x, y)), (1L, Array(x + 100f, y + 100f))))
      IvfCells.nearestCell(vec, cents, true, true) == 3L
    }

  property("top_cells returns distinct cells ordered by distance then id") =
    forAll(Gen.choose(-5.0f, 5.0f)) { x =>
      val vec = new GenericArrayData(Array[Any](x))
      val cents = centArr(Seq(
        (1L, Array(x + 3f)), (2L, Array(x + 1f)), (3L, Array(x + 2f))))
      val got = IvfCells.topCells(vec, cents, 2, true, true)
      got.numElements() == 2 && got.getLong(0) == 2L && got.getLong(1) == 3L
    }

  // multilingual text incl. multibyte (ü, 中, and an astral-plane code
  // point) — char = code point must hold through the byte-offset table
  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('ü'),
      Gen.const('中'), Gen.const("😀".charAt(0)), Gen.const("😀".charAt(1))))
      .map(_.mkString)

  property("char_gram_digests == md5 over code-point substrings at every pos") =
    forAll(textGen, Gen.choose(1, 6)) { (raw, n) =>
      // build from the UTF8String round-trip so lone surrogates (the
      // generator can split the emoji pair) normalize the same way
      val u = UTF8String.fromString(raw)
      val got = CharGrams.gramKernel(u, n)
      val s = u.toString
      val cps = s.codePoints().toArray
      val expectN = math.max(cps.length - n + 1, 0)
      val md = java.security.MessageDigest.getInstance("MD5")
      (got.numElements() == expectN) && (0 until expectN).forall { p =>
        val gram = new String(cps, p, n)
        md.reset()
        java.util.Arrays.equals(
          got.getBinary(p),
          md.digest(UTF8String.fromString(gram).getBytes))
      }
    }
}
