package graft.streaming

import scala.collection.mutable

/** The KIP-932 share-group membership coordinator — the server side
  * of ShareGroupHeartbeat (key 76), completing the share-consumer
  * surface whose data path ShareFetch/ShareAcknowledge serve.
  *
  * Share membership is deliberately simpler than KIP-848's: a share
  * group has NO exclusive partition ownership (record locks do the
  * real coordination, [[ShareGroup]]), so there is no revoke-then-
  * grant reconciliation and no fencing dance over partition sets.
  * What the heartbeat provides:
  *
  *  - broker-GENERATED member ids on join (epoch 0 with an empty
  *    member id — share consumers never invent their own identity);
  *  - a GROUP EPOCH that bumps on membership or subscription change,
  *    with each member advanced to it on its next heartbeat;
  *  - the assignment: KIP-932's SimpleAssignor shape — every member
  *    is pointed at EVERY partition of the group's subscribed topics
  *    (overlap is the point; acquisition locks arbitrate records).
  *    Sent when it changed since the member's last heartbeat, null
  *    when unchanged, exactly the 848 response contract;
  *  - lazy re-resolution against hosted topics on every group
  *    access: a topic created (or a partition added) after the
  *    subscription joins the assignment at the next heartbeat via a
  *    normal epoch bump — no background threads (SURVEY §4);
  *  - lazy session-timeout expiry, FENCED_MEMBER_EPOCH (110) for
  *    stale epochs, UNKNOWN_MEMBER_ID (25), INVALID_REQUEST (42) for
  *    a join with no subscription.
  *
  * State is metadata-only and in-memory, matching the classic and
  * 848 coordinators' documented model. */
final class ShareCoordinator(partitionsOf: String => Option[Int],
    val sessionTimeoutMs: Long = 45000L,
    val heartbeatIntervalMs: Int = 3000,
    /** per-group dynamic config lookup (ConfigResource GROUP, the
      * kafka-configs --entity-type groups surface): overrides for
      * `share.session.timeout.ms` / `share.heartbeat.interval.ms`
      * win over the constructor defaults, re-read on every access so
      * an alteration applies at the next heartbeat */
    groupConfig: String => Map[String, String] = _ => Map.empty) {

  private def sessionTimeoutFor(groupId: String): Long =
    groupConfig(groupId).get("share.session.timeout.ms")
      .flatMap(_.toLongOption).filter(_ > 0).getOrElse(sessionTimeoutMs)

  def heartbeatIntervalFor(groupId: String): Int =
    groupConfig(groupId).get("share.heartbeat.interval.ms")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(heartbeatIntervalMs)

  final class Member(val memberId: String) {
    var rackId: String = null
    var clientId: String = ""
    var subscribed: Seq[String] = Seq.empty
    var memberEpoch: Int = 0
    /** the assignment epoch this member last RECEIVED — assignment is
      * resent whenever the group's epoch moved past it */
    var sentEpoch: Int = 0
    var lastSeen: Long = 0L
  }

  final class Group(val groupId: String) {
    var epoch: Int = 0
    /** (topic, partitionCount) snapshot the current epoch assigned —
      * a drift detected on any access bumps the epoch */
    var resolved: Map[String, Int] = Map.empty
    val members: mutable.LinkedHashMap[String, Member] =
      mutable.LinkedHashMap.empty
  }

  private val groups = mutable.Map.empty[String, Group]
  private var memberSeq = 0L

  case class HeartbeatResult(error: Int, errorMessage: String,
      memberId: String, memberEpoch: Int,
      assignment: Option[Seq[(String, Seq[Int])]])

  private def bump(g: Group): Unit = g.epoch += 1

  private def expireMembers(g: Group, now: Long): Unit = {
    val timeout = sessionTimeoutFor(g.groupId)
    val dead = g.members.values.filter(m =>
      now - m.lastSeen > timeout).map(_.memberId).toSeq
    if (dead.nonEmpty) {
      dead.foreach(g.members.remove)
      bump(g)
    }
  }

  /** Re-resolve the group's subscribed topic set against hosted
    * topics + partition counts; drift bumps the epoch. */
  private def refresh(g: Group): Unit = {
    val wanted = g.members.values.flatMap(_.subscribed).toSet
    val res = wanted.toSeq.sorted
      .flatMap(t => partitionsOf(t).map(t -> _)).toMap
    if (res != g.resolved) {
      g.resolved = res
      bump(g)
    }
  }

  private def assignment(g: Group): Seq[(String, Seq[Int])] =
    g.resolved.toSeq.sortBy(_._1).map { case (t, n) => (t, 0 until n) }

  def heartbeat(groupId: String, memberIdIn: String, memberEpoch: Int,
      rackId: String, subscribed: Seq[String], clientId: String,
      now: Long): HeartbeatResult = synchronized {
    val g = groups.getOrElseUpdate(groupId, new Group(groupId))
    expireMembers(g, now)
    refresh(g)

    if (memberEpoch == -1) { // leave
      if (!g.members.contains(memberIdIn))
        return HeartbeatResult(25, "unknown member", memberIdIn, -1, None)
      g.members.remove(memberIdIn)
      bump(g)
      return HeartbeatResult(0, null, memberIdIn, -1, None)
    }

    val m: Member =
      if (memberEpoch == 0) { // (re)join
        if (subscribed == null && !g.members.contains(memberIdIn))
          return HeartbeatResult(42,
            "a share-group join must carry subscribed_topic_names",
            memberIdIn, 0, None)
        val id =
          if (memberIdIn != null && memberIdIn.nonEmpty) memberIdIn
          else {
            memberSeq += 1
            s"share-$groupId-$memberSeq"
          }
        g.members.get(id) match {
          case Some(existing) => existing
          case None =>
            val nm = new Member(id)
            g.members(id) = nm
            bump(g)
            nm
        }
      } else g.members.get(memberIdIn) match {
        case None =>
          return HeartbeatResult(25, s"unknown member '$memberIdIn'",
            memberIdIn, memberEpoch, None)
        case Some(mm) if mm.memberEpoch != memberEpoch =>
          return HeartbeatResult(110,
            s"member epoch $memberEpoch is not the current ${mm.memberEpoch}",
            memberIdIn, mm.memberEpoch, None)
        case Some(mm) => mm
      }

    m.lastSeen = now
    if (rackId != null) m.rackId = rackId
    if (clientId != null && clientId.nonEmpty) m.clientId = clientId
    if (subscribed != null && subscribed.sorted != m.subscribed.sorted) {
      m.subscribed = subscribed
      refresh(g) // a changed resolved set bumps the epoch there
    }
    // advance to the group epoch; resend the assignment iff the epoch
    // moved past what this member last received (null = unchanged)
    m.memberEpoch = g.epoch
    val out =
      if (m.sentEpoch != g.epoch) { m.sentEpoch = g.epoch; Some(assignment(g)) }
      else None
    HeartbeatResult(0, null, m.memberId, m.memberEpoch, out)
  }

  /** The ShareGroupDescribe view; None for a group this coordinator
    * has never seen. */
  def describe(groupId: String, now: Long)
      : Option[(String, Int, Int, Seq[(String, String, Int, String, Seq[String], Seq[(String, Seq[Int])])])] =
    synchronized {
      groups.get(groupId).map { g =>
        expireMembers(g, now)
        refresh(g)
        val state = if (g.members.isEmpty) "Empty" else "Stable"
        (state, g.epoch, g.epoch,
          g.members.values.toSeq.map { m =>
            (m.memberId, m.rackId, m.memberEpoch, m.clientId,
              m.subscribed.sorted, assignment(g))
          })
      }
    }

  /** Whether this coordinator manages membership for the group —
    * the data path fences member ids only then (embedded ShareGroup
    * users never heartbeat, and stay un-fenced by design). */
  def managesGroup(groupId: String): Boolean = synchronized {
    groups.contains(groupId)
  }

  /** Whether the member is live in the group (session not expired). */
  def isLiveMember(groupId: String, memberId: String,
      now: Long): Boolean = synchronized {
    groups.get(groupId).exists { g =>
      expireMembers(g, now)
      g.members.contains(memberId)
    }
  }

  /** (groupId, state) pairs for ListGroups-style enumeration. */
  def listGroups(now: Long): Seq[(String, String)] = synchronized {
    groups.toSeq.sortBy(_._1).map { case (id, g) =>
      expireMembers(g, now)
      (id, if (g.members.isEmpty) "Empty" else "Stable")
    }
  }
}
