package graft.streaming

import scala.collection.mutable

/** Classic consumer-group membership coordination (the broker side of
  * JoinGroup/SyncGroup/Heartbeat/LeaveGroup), single-coordinator form
  * — the piece a wire consumer needs on top of [[Assignors]] (which
  * run inside the LEADER member, per the protocol: the broker only
  * brokers opaque metadata and assignment bytes, it never computes an
  * assignment itself).
  *
  * Pure metadata, no Spark: group state is a handful of members per
  * group, coordinated under one lock. Simplifications relative to a
  * full Kafka coordinator, chosen to keep every exchange NON-BLOCKING
  * (the reference prototype's server is synchronous request/response;
  * so is graft's [[WireServer]]):
  *  - a join never parks the connection waiting for the rest of the
  *    group: it immediately opens a new generation containing every
  *    currently-known member. Members still in the old generation
  *    discover the rebalance through their next heartbeat/sync error
  *    (REBALANCE_IN_PROGRESS / ILLEGAL_GENERATION) and rejoin —
  *    which, per the protocol, real clients do anyway;
  *  - a REJOIN while the group is already rebalancing re-enters the
  *    open generation instead of opening another, so a member churn
  *    converges instead of livelocking generation bumps;
  *  - session timeouts are honored lazily: an expired member is
  *    evicted when the group is next touched, not by a timer thread.
  *
  * Error codes per the public protocol: 22 ILLEGAL_GENERATION,
  * 25 UNKNOWN_MEMBER_ID, 27 REBALANCE_IN_PROGRESS. */
class GroupCoordinator(clock: () => Long = () => System.currentTimeMillis()) {

  import GroupCoordinator._

  private val groups = mutable.Map.empty[String, GroupState]
  private val lock = new Object

  /** Join (or rejoin) `group`. Empty memberId → a new member id is
    * assigned. Returns the view the member needs: generation, elected
    * protocol, leader, own id, and (for the leader only) the full
    * member→metadata roster to feed its assignor.
    *
    * `instanceId` non-null = STATIC membership (KIP-345): the
    * coordinator remembers instance→member bindings, a restarted
    * instance (empty member id, known instance id) REPLACES its old
    * incarnation in place — keeping its slot, assignment, and any
    * leadership — and, when its subscription is unchanged and the
    * group Stable, rejoins WITHOUT a rebalance (the feature's whole
    * point: a rolling restart stops reshuffling every partition).
    * A stale incarnation presenting the old member id is fenced
    * with FENCED_INSTANCE_ID (82). */
  def join(group: String, memberId: String, clientId: String, clientHost: String,
      sessionTimeoutMs: Int, protocolType: String,
      protocols: Seq[(String, Array[Byte])],
      instanceId: String = null): JoinResult = lock.synchronized {
    val static = instanceId != null && instanceId.nonEmpty
    val g = groups.get(group) match {
      case Some(g0) => evictExpired(g0); g0
      case None =>
        // validate BEFORE materializing: a join carrying a stale or
        // unknown member id must not create a phantom empty group
        // that then shows up in listGroups()/describe() with the
        // requester's protocolType
        if (memberId.nonEmpty)
          return JoinResult(UnknownMemberId, -1, "", "", memberId, Seq.empty)
        val g0 = new GroupState(protocolType)
        groups.put(group, g0)
        g0
    }
    if (g.members.nonEmpty && g.protocolType != protocolType)
      return JoinResult(InconsistentGroupProtocol, -1, "", "", memberId, Seq.empty)

    def subscriptionUnchanged(old: Seq[(String, Array[Byte])]): Boolean =
      old.map(_._1) == protocols.map(_._1) &&
        old.zip(protocols).forall { case ((_, a), (_, b)) =>
          java.util.Arrays.equals(a, b)
        }

    if (static) g.staticIds.get(instanceId) match {
      case Some(oldId) if memberId.nonEmpty && memberId != oldId =>
        // a zombie incarnation holding the superseded member id
        return JoinResult(FencedInstanceId, -1, "", "", memberId, Seq.empty)
      case Some(oldId) if memberId.isEmpty && g.members.contains(oldId) =>
        // restart rejoin: mint a fresh member id and splice it into
        // the old incarnation's SLOT — order carries leadership, and
        // a static replacement must not lose either
        g.memberSeq += 1
        val newId = s"$clientId-${g.memberSeq}"
        val old = g.members(oldId)
        val m = Member(newId, clientId, clientHost, sessionTimeoutMs,
          protocols, clock(), instanceId)
        val rebuilt = mutable.LinkedHashMap.empty[String, Member]
        g.members.foreach { case (k, v) =>
          if (k == oldId) rebuilt.put(newId, m) else rebuilt.put(k, v)
        }
        g.members.clear(); g.members ++= rebuilt
        g.staticIds.put(instanceId, newId)
        g.assignments.remove(oldId).foreach(a => g.assignments.put(newId, a))
        if (g.state == Stable && subscriptionUnchanged(old.protocols)) {
          // the quiet path: same generation, same assignment, no
          // rebalance — SyncGroup will hand the kept assignment back
          val leader = g.members.keys.head
          val roster =
            if (newId == leader)
              g.members.values.map(mm =>
                mm.id -> mm.protocols.find(_._1 == g.protocol).map(_._2)
                  .getOrElse(Array.empty[Byte])).toSeq
            else Seq.empty
          return JoinResult(0, g.generation, g.protocol, leader, newId, roster,
            skipAssignment = newId == leader)
        }
        // subscription changed (or mid-rebalance): fall through to the
        // rebalance path below under the NEW id
        return joinLocked(g, newId, clientId, clientHost, sessionTimeoutMs,
          protocolType, protocols, instanceId)
      case Some(oldId) /* memberId == oldId, or binding without member */ =>
        if (memberId.isEmpty && !g.members.contains(oldId))
          g.staticIds.remove(instanceId) // stale binding; treat as new
      case None =>
        if (memberId.nonEmpty)
          return JoinResult(UnknownMemberId, -1, "", "", memberId, Seq.empty)
    }

    if (memberId.nonEmpty && !g.members.contains(memberId) &&
        !g.pending.contains(memberId))
      return JoinResult(UnknownMemberId, -1, "", "", memberId, Seq.empty)
    val id =
      if (memberId.nonEmpty) memberId
      else { g.memberSeq += 1; s"$clientId-${g.memberSeq}" }
    joinLocked(g, id, clientId, clientHost, sessionTimeoutMs, protocolType,
      protocols, if (static) instanceId else null)
  }

  /** The membership/rebalance core, caller holds the lock and has
    * resolved the member id (static bindings included). */
  private def joinLocked(g: GroupState, id: String, clientId: String,
      clientHost: String, sessionTimeoutMs: Int, protocolType: String,
      protocols: Seq[(String, Array[Byte])], instanceId: String): JoinResult = {
    g.pending.remove(id)
    val isNew = !g.members.contains(id)
    // a rejoin that CHANGES its subscription (protocol list or
    // metadata bytes) must reopen the generation even mid-rebalance —
    // otherwise the leader assigns from a roster that no longer
    // reflects what this member subscribed to
    val changed = !isNew && {
      val old = g.members(id).protocols
      old.map(_._1) != protocols.map(_._1) ||
        !old.zip(protocols).forall { case ((_, a), (_, b)) =>
          java.util.Arrays.equals(a, b)
        }
    }
    val m = Member(id, clientId, clientHost, sessionTimeoutMs, protocols,
      clock(), instanceId)
    g.members.put(id, m)
    if (instanceId != null) g.staticIds.put(instanceId, id)
    g.protocolType = protocolType
    // membership or subscription change (or a stable group being
    // re-joined) opens a NEW generation; an unchanged rejoin while one
    // is already open re-enters it so the group converges on one number
    if (isNew || changed || g.state != CompletingRebalance) {
      g.generation += 1
      g.state = CompletingRebalance
      g.assignments.clear()
      // elect the protocol every member supports, by the first
      // joiner's preference order (Kafka's rule)
      g.protocol = g.members.values.head.protocols.map(_._1)
        .find(p => g.members.values.forall(_.protocols.exists(_._1 == p)))
        .getOrElse("")
    }
    val leader = g.members.keys.head // join order — the stable choice
    val roster =
      if (id == leader)
        g.members.values.map(m =>
          m.id -> m.protocols.find(_._1 == g.protocol).map(_._2)
            .getOrElse(Array.empty[Byte])).toSeq
      else Seq.empty
    JoinResult(0, g.generation, g.protocol, leader, id, roster)
  }

  /** JoinGroup v4+'s two-step for an EMPTY member id: the coordinator
    * assigns an id, answers MEMBER_ID_REQUIRED (79), and the client
    * rejoins WITH the id — which [[join]] then accepts from the
    * pending set. The reservation expires with the requested session
    * timeout, so an abandoned two-step can't grow the group. */
  def reserveMemberId(group: String, clientId: String,
      sessionTimeoutMs: Int): String = lock.synchronized {
    gcReservationPhantoms()
    val g = groups.getOrElseUpdate(group, new GroupState(""))
    g.memberSeq += 1
    val id = s"$clientId-${g.memberSeq}"
    g.pending.put(id, clock() + sessionTimeoutMs)
    id
  }

  /** Drop group entries that exist ONLY because of an expired
    * MEMBER_ID_REQUIRED reservation (never had a generation, no
    * member, no live pending id): an abandoned two-step — or a probe
    * across many group names — must not leave phantom groups in
    * listGroups()/describe() or grow the map without bound. Groups
    * that ever completed a join stay listed as Empty, the Kafka
    * behavior. */
  private def gcReservationPhantoms(): Unit = {
    val now = clock()
    groups.filterInPlace { case (_, g) =>
      g.members.nonEmpty || g.generation > 0 ||
        g.pending.exists { case (_, deadline) => now <= deadline }
    }
  }

  /** A request naming an instance id whose live binding is a
    * DIFFERENT member id comes from a superseded incarnation:
    * FENCED_INSTANCE_ID (82), per KIP-345. Caller holds the lock. */
  private def staticallyFenced(g: GroupState, memberId: String,
      instanceId: String): Boolean =
    instanceId != null && instanceId.nonEmpty &&
      !g.staticIds.get(instanceId).contains(memberId)

  /** OffsetCommit v1+ fencing: a commit carrying a generation must
    * come from a live member of that generation. Generation −1 with
    * an empty member id is the simple-consumer path and is always
    * admitted (matching v0 semantics, where the fields don't exist). */
  def validateCommit(group: String, generationId: Int, memberId: String,
      instanceId: String = null): Int =
    lock.synchronized {
      if (generationId < 0 && (memberId == null || memberId.isEmpty)) 0
      else groups.get(group) match {
        case None => IllegalGeneration
        case Some(g) =>
          evictExpired(g)
          if (staticallyFenced(g, memberId, instanceId)) FencedInstanceId
          else if (!g.members.contains(memberId)) UnknownMemberId
          else if (generationId != g.generation) IllegalGeneration
          else { g.members(memberId).lastSeenMs = clock(); 0 }
      }
    }

  /** SyncGroup: the leader ships every member's assignment; everyone
    * reads their own back. Followers syncing before the leader get
    * REBALANCE_IN_PROGRESS and retry — nothing blocks. */
  def sync(group: String, generation: Int, memberId: String,
      assignments: Seq[(String, Array[Byte])],
      instanceId: String = null): (Int, Array[Byte]) = lock.synchronized {
    groups.get(group) match {
      case None => (UnknownMemberId, Array.empty)
      case Some(g) =>
        evictExpired(g)
        if (staticallyFenced(g, memberId, instanceId))
          (FencedInstanceId, Array.empty)
        else if (!g.members.contains(memberId)) (UnknownMemberId, Array.empty)
        else if (generation != g.generation) (IllegalGeneration, Array.empty)
        else {
          g.members(memberId).lastSeenMs = clock()
          val leader = g.members.keys.head
          if (memberId == leader &&
              !(assignments.isEmpty && g.state == Stable)) {
            g.assignments.clear()
            assignments.foreach { case (id, a) => g.assignments.put(id, a) }
            g.state = Stable
            (0, g.assignments.getOrElse(memberId, Array.empty))
          } else if (g.state == Stable)
            // a leader syncing EMPTY while Stable reads its kept
            // assignment instead of wiping the group's — the KIP-814
            // static-leader-rejoin contract (the JoinGroup answer told
            // it to skip computing an assignment)
            (0, g.assignments.getOrElse(memberId, Array.empty))
          else (RebalanceInProgress, Array.empty)
        }
    }
  }

  /** Heartbeat: 0 while stable in the current generation; the error
    * code otherwise is the signal to rejoin. */
  def heartbeat(group: String, generation: Int, memberId: String,
      instanceId: String = null): Int =
    lock.synchronized {
      groups.get(group) match {
        case None => UnknownMemberId
        case Some(g) =>
          evictExpired(g)
          if (staticallyFenced(g, memberId, instanceId)) FencedInstanceId
          else if (!g.members.contains(memberId)) UnknownMemberId
          else if (g.state == CompletingRebalance) RebalanceInProgress
          else if (generation != g.generation) IllegalGeneration
          else { g.members(memberId).lastSeenMs = clock(); 0 }
      }
    }

  /** LeaveGroup: removes the member and opens a rebalance for the
    * survivors (Kafka semantics — a clean leave triggers reassignment
    * without waiting out the session timeout). A LeaveGroup v3+ entry
    * may name only the instance id (empty member id — how an admin
    * removes a static member); it resolves through the binding, and
    * a mismatched pair is fenced. */
  def leave(group: String, memberId: String,
      instanceId: String = null): Int = lock.synchronized {
    groups.get(group) match {
      case None => UnknownMemberId
      case Some(g) =>
        val static = instanceId != null && instanceId.nonEmpty
        val resolved =
          if (static && (memberId == null || memberId.isEmpty))
            g.staticIds.getOrElse(instanceId, "")
          else Option(memberId).getOrElse("")
        if (static && resolved.nonEmpty &&
            !g.staticIds.get(instanceId).contains(resolved))
          FencedInstanceId
        else if (!g.members.contains(resolved)) UnknownMemberId
        else {
          val m = g.members.remove(resolved)
          g.assignments.remove(resolved)
          m.flatMap(mm => Option(mm.instanceId))
            .foreach(g.staticIds.remove)
          if (g.members.isEmpty) { g.state = Empty; g.assignments.clear() }
          else g.state = CompletingRebalance
          0
        }
    }
  }

  /** member id → group.instance.id for the group's static members
    * (DescribeGroups v4+ serves these). */
  def memberInstanceIds(group: String): Map[String, String] =
    lock.synchronized {
      groups.get(group).map(_.members.values.collect {
        case m if m.instanceId != null => m.id -> m.instanceId
      }.toMap).getOrElse(Map.empty)
    }

  /** DescribeGroups view: (state, protocolType, protocol, members
    * with their metadata and current assignment). */
  def describe(group: String): Option[(String, String, String,
      Seq[(String, String, String, Array[Byte], Array[Byte])])] = lock.synchronized {
    // a reservation-only entry (MEMBER_ID_REQUIRED two-step in
    // flight, no generation yet) is not a describable group
    groups.get(group).filter(g => g.members.nonEmpty || g.generation > 0).map { g =>
      evictExpired(g)
      val members = g.members.values.map { m =>
        (m.id, m.clientId, m.clientHost,
          m.protocols.find(_._1 == g.protocol).map(_._2).getOrElse(Array.empty[Byte]),
          g.assignments.getOrElse(m.id, Array.empty[Byte]))
      }.toSeq
      (stateName(g), g.protocolType, g.protocol, members)
    }
  }

  /** DeleteGroups primitive: drop coordinator state for a group with
    * no live members (Kafka deletes only Empty/Dead groups). Answers
    * false — NON_EMPTY_GROUP upstream — when members survive
    * eviction; removing an unknown group succeeds vacuously so the
    * caller's offsets-only path composes. */
  def removeGroup(group: String): Boolean = lock.synchronized {
    groups.get(group) match {
      case None => true
      case Some(g) =>
        evictExpired(g)
        if (g.members.nonEmpty || g.pending.nonEmpty) false
        else { groups.remove(group); true }
    }
  }

  def listGroups(): Seq[(String, String)] = lock.synchronized {
    gcReservationPhantoms()
    groups.iterator
      .filter { case (_, g) => g.members.nonEmpty || g.generation > 0 }
      .map { case (name, g) => (name, g.protocolType) }.toSeq.sorted
  }

  private def stateName(g: GroupState): String = g.state match {
    case _ if g.members.isEmpty => "Empty"
    case Stable => "Stable"
    case CompletingRebalance => "CompletingRebalance"
    case Empty => "Empty"
  }

  private def evictExpired(g: GroupState): Unit = {
    val now = clock()
    g.pending.filterInPlace { case (_, deadline) => now <= deadline }
    val dead = g.members.values
      .filter(m => now - m.lastSeenMs > m.sessionTimeoutMs).map(_.id).toSeq
    if (dead.nonEmpty) {
      dead.foreach { id =>
        g.members.remove(id).flatMap(m => Option(m.instanceId))
          .foreach(g.staticIds.remove)
        g.assignments.remove(id)
      }
      if (g.members.isEmpty) { g.state = Empty; g.assignments.clear() }
      else g.state = CompletingRebalance
    }
  }
}

object GroupCoordinator {
  val IllegalGeneration = 22
  val UnknownMemberId = 25
  val RebalanceInProgress = 27
  val InconsistentGroupProtocol = 23
  val MemberIdRequired = 79
  val FencedInstanceId = 82

  private[streaming] sealed trait State
  private[streaming] case object Empty extends State
  private[streaming] case object CompletingRebalance extends State
  private[streaming] case object Stable extends State

  private[streaming] final case class Member(id: String, clientId: String,
      clientHost: String, sessionTimeoutMs: Int,
      protocols: Seq[(String, Array[Byte])], var lastSeenMs: Long,
      instanceId: String = null)

  /** Insertion-ordered member map keeps leader election stable. */
  private[streaming] final class GroupState(var protocolType: String) {
    var state: State = Empty
    var generation: Int = 0
    var protocol: String = ""
    var memberSeq: Int = 0
    val members: mutable.LinkedHashMap[String, Member] = mutable.LinkedHashMap.empty
    val assignments: mutable.Map[String, Array[Byte]] = mutable.Map.empty
    /** member ids handed out by the v4+ MEMBER_ID_REQUIRED two-step,
      * awaiting their rejoin: id → reservation deadline (ms). */
    val pending: mutable.Map[String, Long] = mutable.Map.empty
    /** KIP-345 static bindings: group.instance.id → current member id
      * (exactly one live incarnation per instance). */
    val staticIds: mutable.Map[String, String] = mutable.Map.empty
  }

  case class JoinResult(errorCode: Int, generationId: Int, protocol: String,
      leaderId: String, memberId: String, members: Seq[(String, Array[Byte])],
      /** KIP-814: true on a static LEADER's quiet rejoin — the client
        * must sync without computing (or installing) an assignment. */
      skipAssignment: Boolean = false)
}
