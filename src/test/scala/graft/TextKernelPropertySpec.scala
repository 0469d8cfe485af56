package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.kernels.TextKernels

/** Property tests for the round-4 char-ngram kernel against a naive
  * reference implementation of its ASCII strip-then-lower contract. */
object TextKernelPropertySpec extends Properties("TextKernels round-4") {

  private val genText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('0', '9', ',', '.', '!', 'é', 'ß', '\t', '\n'))).map(_.mkString)

  /** Reference normalization: keep [A-Za-z] lowercased, everything else a
    * separator; collapse runs, trim ends. */
  private def naiveNorm(s: String): String =
    s.map {
      case c if c >= 'a' && c <= 'z' => c
      case c if c >= 'A' && c <= 'Z' => (c + 32).toChar
      case _ => ' '
    }.mkString.split(" +").filter(_.nonEmpty).mkString(" ")

  property("charNgrams = sliding windows of the normalized text") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (s, n) =>
      val got = TextKernels.charNgrams(UTF8String.fromString(s), n).map(_.toString).toList
      val norm = naiveNorm(s)
      val want = if (norm.length < n) Nil else norm.sliding(n).toList
      got == want
    }

  property("gram count is max(0, |norm| - n + 1)") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (s, n) =>
      val got = TextKernels.charNgrams(UTF8String.fromString(s), n).length
      got == math.max(0, naiveNorm(s).length - n + 1)
    }
}
