package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.PolyHash

/** Pure property-based checks (no SparkSession) for the cross-engine
  * hash primitives: the JVM fold must match an independent definition of
  * the hash on arbitrary input, stay in the documented range, and the
  * pieces the sketches rely on (range bounds for overflow-free
  * arithmetic) must hold for ALL strings, not just the corpus. */
object SketchProperties extends Properties("sketch") {

  /** Independent re-statement of the hash definition (what the DuckDB
    * oracle computes with list_reduce over ascii codepoints). */
  private def reference(s: String): Long = {
    var h = PolyHash.DefaultSeed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * PolyHash.DefaultMult + cp) % PolyHash.Mod32
      i += Character.charCount(cp)
    }
    h
  }

  property("poly_hash equals the reference fold on arbitrary unicode") =
    Prop.forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.choose(0x20, 0x10FFF))) {
      (ascii, cps) =>
        val uni = new String(cps.filterNot(c => c >= 0xD800 && c <= 0xDFFF).toArray, 0,
          cps.count(c => !(c >= 0xD800 && c <= 0xDFFF)))
        Seq(ascii, uni).forall { s =>
          PolyHash.hash(UTF8String.fromString(s), PolyHash.DefaultMult,
            PolyHash.Mod32, PolyHash.DefaultSeed) == reference(s)
        }
    }

  property("poly_hash stays in [0, Mod32) — the bound the MinHash/HLL overflow math needs") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = PolyHash.hash(UTF8String.fromString(s), PolyHash.DefaultMult,
        PolyHash.Mod32, PolyHash.DefaultSeed)
      h >= 0L && h < PolyHash.Mod32
    }

  property("minhash permutation a*x+b never overflows a signed 64-bit long") =
    Prop.forAll(Gen.choose(0, 31), Gen.choose(0L, 4294967295L)) { (j, x) =>
      val a = ((1103515245L * (j + 1) + 12345L) % (1L << 31)) | 1L
      val b = (2654435761L * (j + 7)) % 4294967311L
      // a < 2^31, x < 2^32 → a*x < 2^63 − slack for +b
      val prod = BigInt(a) * BigInt(x) + BigInt(b)
      prod < BigInt(Long.MaxValue)
    }
}
