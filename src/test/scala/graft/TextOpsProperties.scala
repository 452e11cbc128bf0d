package graft

import graft.ops.{Bpe, Dedup}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws over the pure text-op kernels (no Spark session):
  * CDC chunking is an exact partition with offset-invariant interior
  * boundaries, and BPE merge application preserves content. */
object TextOpsProperties extends Properties("graft.textops") {

  // small alphabet so windows repeat and boundaries actually fire
  private val genText: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.stringOfN(n, Gen.oneOf("abcd efg".toSeq)))
  private val K = 4

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  property("CDC chunks partition the text exactly") = forAll(genText) { t =>
    val ch = Dedup.cdcChunkRows(t, K, "0")
    if (t.isEmpty) ch.isEmpty
    else {
      // indices contiguous from 0, lengths sum to text length, and each
      // hash is the md5 of the corresponding substring
      val idxOk = ch.map(_.chunk_idx) == ch.indices.toSeq
      val lenOk = ch.map(_.chunk_len).sum == t.length
      var off = 0
      val hashOk = ch.forall { c =>
        val ok = c.chunk_hash == md5hex(t.substring(off, off + c.chunk_len))
        off += c.chunk_len; ok
      }
      idxOk && lenOk && hashOk
    }
  }

  property("CDC interior chunks are offset-invariant under any prefix") = forAll(
    genText.suchThat(_.length >= K), genText) { (t, prefix) =>
    val a = Dedup.cdcChunkRows(t, K, "0").map(_.chunk_hash)
    val b = Dedup.cdcChunkRows(prefix + t, K, "0").map(_.chunk_hash).toSet
    // boundaries whose window lies fully inside t survive any prefix, so
    // every chunk of t except (at most) the first and last recurs verbatim
    a.length <= 2 || a.slice(1, a.length - 1).forall(b.contains)
  }

  private val genSyms: Gen[List[String]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))

  property("BPE merge application preserves concatenated content") = forAll(
    genSyms, Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) { (s, l, r) =>
    val out = Bpe.applyMerge(s, l, r)
    out.mkString == s.mkString && out.length <= s.length
  }

  property("BPE merge is a left-to-right non-overlapping scan (local refold)") = forAll(
    genSyms, Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) { (s, l, r) =>
    // reference refold: consume greedily from the left
    val ref = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { ref += (l + r); i += 2 }
      else { ref += s(i); i += 1 }
    }
    Bpe.applyMerge(s, l, r) == ref.toSeq
  }
}
