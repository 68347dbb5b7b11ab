package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextHash

/** ScalaCheck property tests for the hand-written byte-scanning text-hash
  * kernels: each kernel must agree with a straightforward Scala reference
  * implementation (String.split + MessageDigest) on arbitrary strings —
  * including empty tokens from leading/trailing/double spaces and
  * multi-byte UTF-8, where a byte-offset bug would silently corrupt
  * hashes. The kernels' Spark expressions call these same statics, so
  * JVM-level agreement is expression-level agreement. */
object KernelPropertySpec extends Properties("TextHashKernels") {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def toks(s: String): Array[String] = s.split(" ", -1)

  // --- reference implementations (straight from the oracle SQL semantics)

  private def refSimhash16(s: String): String =
    (1 to 16).map { j =>
      val sum = toks(s).map(t => if (md5Hex(t)(j - 1) >= '8') 1 else -1).sum
      if (sum > 0) '1' else '0'
    }.mkString

  private def refSimhash64(s: String): String =
    (1 to 64).map { j =>
      val digit = (j - 1) / 4      // 0-based hex digit index
      val mask = 8 >> ((j - 1) % 4)
      val sum = toks(s).map { t =>
        if ((Character.digit(md5Hex(t)(digit), 16) & mask) != 0) 1 else -1
      }.sum
      if (sum > 0) '1' else '0'
    }.mkString

  private def refMinShingle(s: String, k: Int): String = {
    val w = toks(s)
    val shingles =
      if (w.length <= k) Seq(w.mkString(" "))
      else (0 to w.length - k).map(i => w.slice(i, i + k).mkString(" "))
    shingles.map(md5Hex).min
  }

  private def refMinhash8(s: String): Seq[String] = {
    val w = toks(s)
    val shingles =
      if (w.length < 2) Seq(s)
      else (0 until w.length - 1).map(i => s"${w(i)} ${w(i + 1)}")
    def mins(prefix: String): Seq[String] = (0 until 4).map { slot =>
      shingles.map(sh => md5Hex(prefix + sh).substring(slot * 8, slot * 8 + 8)).min
    }
    mins("0:") ++ mins("1:")
  }

  // token-structured strings (spaces matter) + arbitrary unicode
  private val token: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.nonEmptyListOf(Gen.oneOf('æ', 'ø', '漢', '字', 'a', '0', '-')).map(_.mkString.take(6)))
  private val doc: Gen[String] = Gen.oneOf(
    Gen.listOf(token).map(_.mkString(" ")),
    Gen.asciiPrintableStr.map(_.replace(" ", "")),
    Gen.const(""))

  property("simhash16 kernel == reference") = forAll(doc) { s =>
    TextHash.simhash16(UTF8String.fromString(s)).toString == refSimhash16(s)
  }

  property("simhash64 kernel == reference") = forAll(doc) { s =>
    TextHash.simhash64(UTF8String.fromString(s)).toString == refSimhash64(s)
  }

  property("simhash64 refines simhash16: bits 1,5,…,61 are the 16-bit signature") =
    forAll(doc) { s =>
      val wide = TextHash.simhash64(UTF8String.fromString(s)).toString
      val narrow = TextHash.simhash16(UTF8String.fromString(s)).toString
      (0 until 16).map(i => wide(i * 4)).mkString == narrow
    }

  property("min_shingle_fp kernel == reference for k in 1..7") =
    forAll(doc, Gen.choose(1, 7)) { (s, k) =>
      TextHash.minShingleFp(UTF8String.fromString(s), k).toString == refMinShingle(s, k)
    }

  property("minhash8 kernel == reference") = forAll(doc) { s =>
    val got = TextHash.minhash8(UTF8String.fromString(s))
    (0 until 8).map(i => got.getUTF8String(i).toString) == refMinhash8(s)
  }

  property("md5_prefix64 kernel == conv(substring(md5(x),1,15),16,10)") = forAll(doc) { s =>
    val ref = BigInt(md5Hex(s).substring(0, 15), 16).toLong
    TextHash.md5Prefix64(UTF8String.fromString(s)) == ref
  }

  property("gram2_stats kernel == reference") = forAll(doc) { s =>
    val w = toks(s)
    val grams = if (w.length < 2) Seq.empty[String]
      else (0 until w.length - 1).map(i => s"${w(i)} ${w(i + 1)}")
    val got = TextHash.gram2Stats(UTF8String.fromString(s))
    (got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((w.length.toLong, grams.length.toLong, grams.distinct.length.toLong))
  }

  property("token_set_count kernel == reference") = forAll(doc) { s =>
    val words = Seq("the", "a", "æøå")
    val ref = toks(s).count(words.contains).toLong
    TextHash.tokenSetCount(UTF8String.fromString(s),
      words.map(_.getBytes("UTF-8")).toArray) == ref
  }

  property("shingles_k kernel == reference for k in 1..6") =
    forAll(doc, Gen.choose(1, 6)) { (s, k) =>
      val w = toks(s)
      val ref =
        if (w.length <= k) Seq(w.mkString(" "))
        else (0 to w.length - k).map(i => w.slice(i, i + k).mkString(" "))
      val got = TextHash.shinglesK(UTF8String.fromString(s), k)
      (0 until got.numElements()).map(i => got.getUTF8String(i).toString) == ref
    }

  property("quantize_i8 kernel == reference (incl. NaN → clamp 1.0, like Spark least/greatest)") =
    forAll(Gen.listOf(Gen.oneOf(Gen.chooseNum(-2.0f, 2.0f), Gen.const(Float.NaN)))) { vs =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        vs.map(v => v: Any).toArray)
      val got = graft.functions.VectorMath.quantizeI8(arr)
      val codes = got.getArray(0)
      def clamp(v: Float): Double =
        if (v.isNaN) 1.0 else math.max(-1.0, math.min(1.0, v.toDouble))
      val refCodes = vs.map(v => math.floor(clamp(v) * 127.0 + 0.5).toInt)
      val refErr = vs.zip(refCodes).map { case (v, code) =>
        math.abs(clamp(v) - code.toDouble / 127.0)
      }.foldLeft(0.0)(math.max)
      (0 until codes.numElements()).map(codes.getInt) == refCodes &&
        got.getDouble(1) == refErr
    }

  // --- width-change properties for the MinHash banding math: the LSH
  // code derives w hashes as 8-hex slices of ⌈w/4⌉ prefixed digests
  // (NumHashes = 8 today); these guard the widening path promised in
  // operators/Dedup.scala — the construction below reproduces
  // refMinhash8 exactly at w = 8.

  private def minhashW(shingles: Set[String], w: Int): Seq[String] =
    (0 until w / 4).flatMap { p =>
      (0 until 4).map { slot =>
        shingles.map(sh => md5Hex(s"$p:$sh").substring(slot * 8, slot * 8 + 8)).min
      }
    }

  property("minhashW at w=8 == the production minhash8 construction") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6))).map(_.take(8))) { toks =>
      val text = toks.mkString(" ")
      val w = toks.toArray
      val shingles =
        if (w.length < 2) Set(text)
        else (0 until w.length - 1).map(i => s"${w(i)} ${w(i + 1)}").toSet
      minhashW(shingles, 8) == refMinhash8(text)
    }

  property("band concat stays injective at any width: slots are always exactly 8 hex chars") =
    forAll(doc) { s =>
      val got = TextHash.minhash8(UTF8String.fromString(s))
      (0 until 8).forall { i =>
        val slot = got.getUTF8String(i).toString
        slot.length == 8 && slot.forall(c => "0123456789abcdef".contains(c))
      } // fixed-width alphabet-restricted slots → concat decodes uniquely
    }

  property("est-Jaccard stays unbiased and tightens as the signature widens (w=8 → w=16)") = {
    // 120 deterministic set pairs: A and B share 20 elements and own 20
    // each → |A∩B| = 20, |A∪B| = 60, true J = 1/3. Unbiasedness: the
    // MEAN estimate over pairs approaches J at both widths; consistency:
    // mean |err| at w=16 must not exceed w=8's (variance ∝ 1/w).
    def pair(seed: Int, shared: Int, own: Int): (Set[String], Set[String]) = {
      val s = (0 until shared).map(i => s"sh_${seed}_$i").toSet
      val a = s ++ (0 until own).map(i => s"a_${seed}_$i")
      val b = s ++ (0 until own).map(i => s"b_${seed}_$i")
      (a, b)
    }
    def est(a: Set[String], b: Set[String], w: Int): Double =
      minhashW(a, w).zip(minhashW(b, w)).count { case (x, y) => x == y }.toDouble / w
    val pairs = (0 until 120).map(i => pair(i, shared = 20, own = 20))
    val trueJ = 20.0 / 60.0
    def meanEst(w: Int): Double = pairs.map { case (a, b) => est(a, b, w) }.sum / pairs.size
    def meanAbsErr(w: Int): Double =
      pairs.map { case (a, b) => math.abs(est(a, b, w) - trueJ) }.sum / pairs.size
    org.scalacheck.Prop(
      math.abs(meanEst(8) - trueJ) < 0.05 && math.abs(meanEst(16) - trueJ) < 0.05 &&
        meanAbsErr(16) <= meanAbsErr(8) + 0.01)
  }

  property("quantize_i8: null element → null code, skipped by the error max") = {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](0.5f, null, -3.0f))
    val got = graft.functions.VectorMath.quantizeI8(arr)
    val codes = got.getArray(0)
    org.scalacheck.Prop(
      codes.getInt(0) == 64 && codes.isNullAt(1) && codes.getInt(2) == -127 &&
        got.getDouble(1) > 0.0)
  }
}
