package graft.ext

/** The ONE greedy-star cell walk all three survivor families share
  * (embedding: [[Similarity.nearDupAssign]]; simhash:
  * [[Dedup.simhashAssignFromBlocks]]; minhash:
  * [[Dedup.minhashAssignFromBands]]) — the families differ only in their
  * per-member evidence type `T` and match predicate, and the r14 review
  * flagged the walk's triplication as a drift risk for semantics every
  * spec pins identical. Members MUST arrive id-ascending (the grouped-map
  * sort contract); the first matching representative eliminates, a
  * non-match promotes while the representative set is under `cap`
  * (a full cell's non-matches survive unpromoted — the conservative
  * direction), and `comparisons` counts predicate evaluations for the
  * scale probes (a task retry can double-count it — probe metric only).
  */
private[ext] object GreedyStar {

  /** `matches(rep, member)` — predicate argument order is (promoted
    * representative, walking member), which matters for families whose
    * evidence carries per-row knobs (simhash verifies at the MEMBER
    * row's stamped radius). */
  def walk[T](rows: Iterator[(Long, T)], matches: (T, T) => Boolean,
      cap: Int, comparisons: Option[org.apache.spark.util.LongAccumulator])
      : Iterator[(Long, Long)] = {
    val reps = scala.collection.mutable.ArrayBuffer.empty[(Long, T)]
    rows.flatMap { case (id, ev) =>
      var matched = -1L
      var r = 0
      var n = 0L
      while (matched < 0 && r < reps.length) {
        val (rid, rev) = reps(r)
        n += 1
        if (matches(rev, ev)) matched = rid
        r += 1
      }
      comparisons.foreach(_.add(n))
      if (matched >= 0) Iterator.single((id, matched))
      else {
        if (reps.length < cap) reps += ((id, ev))
        Iterator.empty
      }
    }
  }
}
