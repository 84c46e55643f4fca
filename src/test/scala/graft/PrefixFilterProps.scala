package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck completeness proof for the prefix-filter candidate
  * enumeration that q_dedup_prefix and (since r06) q_dedup_ngram rely
  * on: for ANY corpus, every pair with Jaccard ≥ 0.7 must share at
  * least one element inside BOTH df-ordered prefixes at positions
  * whose PPJoin cap reaches the minimum overlap (Bayardo WWW'07 /
  * Xiao WWW'08). The SQL implements this with integer arithmetic —
  * prefix length `sz - (7·sz+9) div 10 + 1`, minoverlap
  * `(7·(sa+sb)+16) div 17`, cap `1 + min(sa-(pa+1), sb-(pb+1))` —
  * and a false negative there would SILENTLY drop a qualifying pair
  * (the oracle would catch it only if the fixture happens to contain
  * the miss). This property hammers the exact integer forms over
  * random set corpora, so the theorem-to-arithmetic translation is
  * verified independently of any fixture.
  */
object PrefixFilterProps extends Properties("PrefixFilter") {

  private val M = graft.oracle.Dialect.M

  // small value domain forces heavy overlap → many J ≥ 0.7 pairs
  private val corpus: Gen[List[Set[Long]]] =
    Gen.chooseNum(2, 14).flatMap { n =>
      Gen.listOfN(n,
        Gen.chooseNum(3, 12).flatMap(sz =>
          Gen.listOfN(sz, Gen.chooseNum(0L, 24L)).map(_.toSet)))
    }

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  /** Mirror of the SQL: df-major packed order, integer prefix length. */
  private def prefixes(docs: List[Set[Long]]): List[IndexedSeq[Long]] = {
    val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    docs.map { s =>
      val cs = s.toIndexedSeq.map(v => df(v) * M + v).sorted
      val sz = cs.size
      val plen = sz - (7 * sz + 9) / 10 + 1
      cs.take(plen)
    }
  }

  property("every Jaccard>=0.7 pair survives prefix+positional+size filters") =
    forAll(corpus) { docs =>
      val pre = prefixes(docs)
      val pairs = for {
        i <- docs.indices
        j <- docs.indices
        if i < j && jaccard(docs(i), docs(j)) >= 0.7
      } yield (i, j)
      pairs.forall { case (i, j) =>
        val (sa, sb) = (docs(i).size, docs(j).size)
        val sizeOk = 10 * sb >= 7 * sa && 10 * sa >= 7 * sb
        val minov = (7 * (sa + sb) + 16) / 17
        val shared = for {
          (c, pa) <- pre(i).zipWithIndex
          pb = pre(j).indexOf(c)
          if pb >= 0
        } yield 1 + math.min(sa - (pa + 1), sb - (pb + 1))
        sizeOk && shared.exists(_ >= minov)
      }
    }

  property("prefix length is never larger than the set (and >= 1)") =
    forAll(Gen.chooseNum(1, 10000)) { sz =>
      val plen = sz - (7 * sz + 9) / 10 + 1
      plen >= 1 && plen <= sz
    }
}
