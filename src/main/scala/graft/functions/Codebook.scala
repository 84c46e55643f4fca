package graft.functions

/** Driver-side construction of the two-level broadcast codebook — the
  * ONE place the load-bearing tie law lives. trainedCells (IVF seeds),
  * lshRefined (per-bucket books), and semClusters (per-Lloyd-round
  * centroid books) all previously inlined byte-equivalent copies of
  * this grouping; a tie-law tweak applied to one copy but not another
  * would diverge an engine from its DuckDB twin only on
  * collision-bearing corpora — the hardest divergence to debug
  * (ArgminKernelProps keeps its own naive mirror on purpose, as the
  * independent reference the kernels are property-tested against).
  *
  * Contract: children are grouped to their nearest super by EXACT
  * integer squared-L2 with ties to the smallest super id, and each
  * super's block is sorted ascending by child id — the total order
  * every argmin kernel's strict-`<` first-minimum scan and every
  * oracle `ROW_NUMBER() OVER (ORDER BY dist2, id)` evaluates. Callers
  * pass both arrays sorted ascending by id.
  */
object Codebook {

  def d2(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
    acc
  }

  /** (superIds, superVecs, childIdsBySuper, childVecsBySuper) — the
    * broadcast tuple the TwoLevelArgmin* kernel family consumes. */
  def group(children: Array[(Long, Array[Long])],
      supers: Array[(Long, Array[Long])])
      : (Array[Long], Array[Array[Long]],
        Array[Array[Long]], Array[Array[Array[Long]]]) = {
    val bySuper = children.groupBy { case (_, cv) =>
      supers.minBy { case (sid, sv) => (d2(cv, sv), sid) }._1
    }
    val empty = Array.empty[(Long, Array[Long])]
    val kids = supers.map(sp => bySuper.getOrElse(sp._1, empty).sortBy(_._1))
    (supers.map(_._1), supers.map(_._2),
      kids.map(_.map(_._1)), kids.map(_.map(_._2)))
  }
}
