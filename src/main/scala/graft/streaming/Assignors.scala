package graft.streaming

/** Consumer-group partition assignment strategies — the
  * RangeAssignor / RoundRobinAssignor semantics from the public Kafka
  * client protocol (the reference's Consumer API roadmap item).
  * Pure functions: (partitions, members) → assignment. */
object Assignors {

  /** Range assignment: contiguous spans, first members get the
    * remainder (Kafka RangeAssignor). */
  def range(numPartitions: Int, members: Seq[String]): Map[String, Seq[Int]] = {
    require(members.nonEmpty, "no members in group")
    val sorted = members.sorted
    val per = numPartitions / sorted.size
    val extra = numPartitions % sorted.size
    sorted.zipWithIndex.map { case (m, i) =>
      val start = i * per + math.min(i, extra)
      val len = per + (if (i < extra) 1 else 0)
      m -> (start until start + len)
    }.toMap
  }

  /** Round-robin assignment: partitions dealt one at a time across
    * the sorted membership (Kafka RoundRobinAssignor). */
  def roundRobin(numPartitions: Int, members: Seq[String]): Map[String, Seq[Int]] = {
    require(members.nonEmpty, "no members in group")
    val sorted = members.sorted
    (0 until numPartitions).groupBy(p => sorted(p % sorted.size))
      .map { case (m, ps) => m -> ps.toSeq } ++
      sorted.filterNot(m => (0 until numPartitions).exists(p => sorted(p % sorted.size) == m))
        .map(_ -> Seq.empty[Int])
  }

  /** Rebalance: recompute assignment after membership change,
    * reporting moved partitions (the revoke/assign delta). */
  def rebalance(numPartitions: Int, before: Seq[String], after: Seq[String])
      : (Map[String, Seq[Int]], Set[Int]) = {
    val a = range(numPartitions, before)
    val b = range(numPartitions, after)
    val owner = (m: Map[String, Seq[Int]]) =>
      m.flatMap { case (mem, ps) => ps.map(_ -> mem) }
    val ob = owner(a); val oa = owner(b)
    val moved = (0 until numPartitions).filter(p => ob.get(p) != oa.get(p)).toSet
    (b, moved)
  }
}
