package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{BucketedArgminBroadcast, TwoLevelArgmin2Broadcast, TwoLevelArgminBroadcast}

/** ScalaCheck properties for the broadcast-codebook argmin kernels,
  * against a naive reference argmin — the tie totality the DuckDB
  * oracle only exercises on fixture data distributions. The contract
  * all three kernels share: exact integer squared-L2; both levels tie
  * to the SMALLEST seed id (seed arrays sorted ascending,
  * first-minimum scan); probe2 excludes the nearest super then applies
  * the same rule; a bucket absent from a bucketed codebook yields -1.
  * Coordinates are drawn from a tiny range so duplicate seed VECTORS
  * (exact ties at every distance) are common — the case where a sloppy
  * `<=` or hash-ordered iteration would silently diverge from the
  * oracle's `ORDER BY dist2, sid`.
  */
object ArgminKernelProps extends Properties("ArgminKernels") {

  private val Dim = 8

  private def d2(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
    acc
  }

  /** Naive reference: smallest (dist, id) over (ids, vecs). */
  private def refArgmin(x: Array[Long], ids: Array[Long],
      vecs: Array[Array[Long]]): Long =
    ids.zip(vecs).minBy { case (id, v) => (d2(x, v), id) }._1

  private val coord = Gen.choose(-3L, 3L)
  private val vec: Gen[Array[Long]] = Gen.listOfN(Dim, coord).map(_.toArray)

  /** A two-level codebook from a sorted pool of (id, vec) seeds: every
    * sb-th seed is a super, children grouped by nearest super — the
    * exact construction trainedCells and lshRefined share. */
  private def build(seeds: List[(Long, Array[Long])])
      : (Array[Long], Array[Array[Long]], Array[Array[Long]], Array[Array[Array[Long]]]) = {
    val children = seeds.sortBy(_._1).toArray
    val sb = (1 to 256).find(z => z * z >= children.length).getOrElse(256)
    val supers = children.zipWithIndex.collect {
      case (c, j) if j % sb == 0 => c
    }
    val bySuper = children.groupBy { case (_, cv) =>
      supers.minBy { case (sid, sv) => (d2(cv, sv), sid) }._1
    }
    val empty = Array.empty[(Long, Array[Long])]
    val kids = supers.map(sp => bySuper.getOrElse(sp._1, empty).sortBy(_._1))
    (supers.map(_._1), supers.map(_._2),
      kids.map(_.map(_._1)), kids.map(_.map(_._2)))
  }

  private val seedsGen: Gen[List[(Long, Array[Long])]] = for {
    n <- Gen.choose(1, 12)
    ids <- Gen.listOfN(n, Gen.choose(0L, 40L)).map(_.distinct)
    vs <- Gen.listOfN(ids.length, vec)
  } yield ids.zip(vs)

  property("two-level routing = two-level reference with smallest-id ties") =
    forAll(seedsGen, vec) { (seeds, x) =>
      val (sIds, sVecs, cIds, cVecs) = build(seeds)
      val bc = SparkTestSession.spark.sparkContext
        .broadcast((sIds, sVecs, cIds, cVecs))
      val kernel = TwoLevelArgminBroadcast(bc, null)
      val got = kernel.cellOf(ArrayData.toArrayData(x))
      val si = sIds.indices.minBy(i => (d2(x, sVecs(i)), sIds(i)))
      val want = refArgmin(x, cIds(si), cVecs(si))
      bc.destroy()
      got == want
    }

  property("probe2: second-nearest super, smallest-id ties, disjoint from home") =
    forAll(seedsGen, vec) { (seeds, x) =>
      val (sIds, sVecs, cIds, cVecs) = build(seeds)
      val bc = SparkTestSession.spark.sparkContext
        .broadcast((sIds, sVecs, cIds, cVecs))
      val k1 = TwoLevelArgminBroadcast(bc, null)
      val k2 = TwoLevelArgmin2Broadcast(bc, null)
      val xd = ArrayData.toArrayData(x)
      val si = sIds.indices.minBy(i => (d2(x, sVecs(i)), sIds(i)))
      val got2 = k2.cellOf(xd)
      val ok = if (sIds.length < 2) {
        got2 == k1.cellOf(xd) // degenerate codebook falls back to home
      } else {
        val si2 = sIds.indices.filter(_ != si)
          .minBy(i => (d2(x, sVecs(i)), sIds(i)))
        got2 == refArgmin(x, cIds(si2), cVecs(si2)) &&
          cIds(si).toSet.intersect(cIds(si2).toSet).isEmpty
      }
      bc.destroy()
      ok
    }

  private val bucketedGen: Gen[Map[Long, List[(Long, Array[Long])]]] = for {
    nb <- Gen.choose(1, 4)
    buckets <- Gen.listOfN(nb, Gen.choose(0L, 9L)).map(_.distinct)
    per <- Gen.listOfN(buckets.length, seedsGen.suchThat(_.nonEmpty))
  } yield buckets.zip(per).toMap

  property("bucketed kernel routes per bucket; absent bucket yields -1") =
    forAll(bucketedGen, vec, Gen.choose(0L, 9L)) { (books, x, probe) =>
      val built = books.map { case (b, seeds) => b -> build(seeds) }
      val bc = SparkTestSession.spark.sparkContext.broadcast(built)
      val kernel = BucketedArgminBroadcast(bc, null, null)
      val got = kernel.cellOf(probe, ArrayData.toArrayData(x))
      val ok = built.get(probe) match {
        case None => got == -1L
        case Some((sIds, sVecs, cIds, cVecs)) =>
          val si = sIds.indices.minBy(i => (d2(x, sVecs(i)), sIds(i)))
          got == refArgmin(x, cIds(si), cVecs(si))
      }
      bc.destroy()
      ok
    }
}
