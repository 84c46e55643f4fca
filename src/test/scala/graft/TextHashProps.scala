package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextHash

/** ScalaCheck properties for the native hash kernels — these invariants
  * are exactly what ShingleHashSet3's no-materialization optimization
  * relies on, so they are property-tested rather than example-tested. */
object TextHashProps extends Properties("TextHash") {

  private val token: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("polyHash stays in [0, M)") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = TextHash.polyHash(s, 24)
      h >= 0 && h < TextHash.M
    }

  property("polyHash only depends on the first `width` chars") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      TextHash.polyHash(a.take(24) + b, 24) == TextHash.polyHash(a.take(24), 24) ||
        a.take(24).length < 24 // shorter strings pad; suffix then matters
    }

  property("shingleHash(toks, i) == polyHash of the space-joined 3-gram") =
    forAll(Gen.nonEmptyListOf(token)) { toksList =>
      val toks = toksList.toArray
      (0 until math.max(toks.length - 2, 1)).forall { i =>
        val joined = toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")
        TextHash.shingleHash(toks, i, 24) == TextHash.polyHash(joined, 24)
      }
    }

  property("frame sampling is deterministic and bounded") =
    forAll(Gen.listOf(Gen.chooseNum(0, 255)), Gen.chooseNum(1, 8)) { (bytes, n) =>
      val payload = bytes.map(_.toByte).toArray
      val a = graft.multimodal.BinaryPipeline.sampleFrameHashes(payload, n)
      val b = graft.multimodal.BinaryPipeline.sampleFrameHashes(payload, n)
      a.sameElements(b) && a.length == math.min(n, math.max(payload.length, 1))
    }
}
