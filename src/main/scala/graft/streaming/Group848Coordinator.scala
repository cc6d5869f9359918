package graft.streaming

import scala.collection.mutable

/** The KIP-848 next-generation consumer-group coordinator — the
  * server side of ConsumerGroupHeartbeat (key 68), the DEFAULT group
  * membership path of kafka-clients 4.x.
  *
  * Where the classic protocol (GroupCoordinator.scala) brokers a
  * client-side assignor through a JoinGroup/SyncGroup barrier, 848
  * moves everything server-side and makes rebalancing INCREMENTAL:
  *
  *  - The GROUP EPOCH bumps on any membership or subscription change
  *    (the analog of a classic generation, without the barrier).
  *  - The coordinator recomputes a TARGET assignment for every member
  *    at each epoch bump, with a server-side assignor ("uniform" =
  *    partition-index round-robin over subscribers; "range" =
  *    contiguous chunks, graft's classic RangeAssignor shape).
  *  - Each heartbeat RECONCILES one member toward its target: a
  *    member holding partitions outside its target is told to shrink
  *    to owned ∩ target and stays at its old member epoch until its
  *    next heartbeat REPORTS the revocation; a member with nothing to
  *    revoke advances to the group epoch and is granted its target
  *    MINUS partitions still held or granted elsewhere — a partition
  *    moves owner only through a revoke-then-grant handshake, never
  *    by simultaneous assignment (the core KIP-848 safety property).
  *  - Fencing is per member: a heartbeat at any epoch other than the
  *    member's current one answers FENCED_MEMBER_EPOCH (110);
  *    unknown members answer UNKNOWN_MEMBER_ID (25); assignor names
  *    outside the served set answer UNSUPPORTED_ASSIGNOR (112).
  *  - Members expire lazily by session timeout on any group access,
  *    like the classic coordinator — no background threads (§4).
  *
  * State is metadata-only and in-memory, matching the classic
  * coordinator's documented model. */
final class Group848Coordinator(partitionsOf: String => Option[Int],
    allTopics: () => Seq[String] = () => Seq.empty,
    val sessionTimeoutMs: Long = 45000L,
    val heartbeatIntervalMs: Int = 3000) {

  val ServedAssignors: Set[String] = Set("uniform", "range")

  final class Member(val memberId: String) {
    var instanceId: String = null
    var rackId: String = null
    var rebalanceTimeoutMs: Int = -1
    var clientId: String = ""
    var subscribed: Seq[String] = Seq.empty
    /** v1 regex subscription (KIP-848's broker-side pattern): the
      * pattern as sent, plus its current resolution against hosted
      * topics — re-evaluated lazily on every group access, so a topic
      * created after the subscription joins the target at the next
      * heartbeat (an epoch bump, exactly like a subscription change) */
    var subscribedRegex: String = null
    var resolvedRegexTopics: Set[String] = Set.empty
    /** names ∪ resolved-regex — what the assignor sees */
    def effectiveSubscription: Set[String] =
      subscribed.toSet ++ resolvedRegexTopics
    /** last REPORTED ownership (the client's truth) */
    var owned: Set[(String, Int)] = Set.empty
    /** last assignment we SENT (granted but possibly unreported yet —
      * counts as held for exclusivity, or a partition could be granted
      * to two members in the report gap) */
    var granted: Set[(String, Int)] = Set.empty
    var target: Set[(String, Int)] = Set.empty
    var memberEpoch: Int = 0
    var lastSeen: Long = 0L
  }

  final class Group(val groupId: String) {
    var epoch: Int = 0
    var assignmentEpoch: Int = 0
    var assignorName: String = "uniform"
    val members: mutable.LinkedHashMap[String, Member] =
      mutable.LinkedHashMap.empty
  }

  private val groups = mutable.Map.empty[String, Group]

  case class HeartbeatResult(error: Int, errorMessage: String,
      memberId: String, memberEpoch: Int,
      assignment: Option[Seq[(String, Seq[Int])]])

  private def ok(memberId: String, epoch: Int,
      assignment: Option[Seq[(String, Seq[Int])]]) =
    HeartbeatResult(0, null, memberId, epoch, assignment)

  private def toWire(s: Set[(String, Int)]): Seq[(String, Seq[Int])] =
    s.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, ps) => (t, ps.map(_._2).toSeq.sorted) }

  /** OffsetFetch v9 member fencing (KIP-848): 0 when the supplied
    * (member_id, member_epoch) pair is current in `groupId`,
    * UNKNOWN_MEMBER_ID (25) for a member this coordinator never
    * granted (or a group it doesn't host), STALE_MEMBER_EPOCH (113)
    * when the id is live but the epoch isn't the member's current
    * one. A null/empty member id skips validation — the classic
    * (admin-tool / old-protocol) path. */
  def validateMember(groupId: String, memberId: String,
      memberEpoch: Int): Int = synchronized {
    if (memberId == null || memberId.isEmpty) 0
    else groups.get(groupId) match {
      case None => 25
      case Some(g) => g.members.get(memberId) match {
        case None => 25
        case Some(m) => if (m.memberEpoch == memberEpoch) 0 else 113
      }
    }
  }

  /** Compile + resolve a regex subscription against hosted topics.
    * java.util.regex, full-name match — the same contract the classic
    * consumer's subscribe(Pattern) applies client-side (Kafka 4.x
    * evaluates RE2; the syntax a subscription actually uses is the
    * common subset, and an invalid pattern is rejected in-band either
    * way). */
  private def resolveRegex(pattern: String): Either[String, Set[String]] =
    Group848Coordinator.unsupportedRegexConstruct(pattern) match {
      case Some(what) => Left(s"$what is outside the RE2 subset")
      case None =>
        try {
          val p = java.util.regex.Pattern.compile(pattern)
          Right(allTopics().filter(t => p.matcher(t).matches()).toSet)
        } catch {
          case e: java.util.regex.PatternSyntaxException =>
            Left(e.getMessage.linesIterator.next())
        }
    }

  /** Lazy regex re-resolution: any group access re-checks every
    * member's pattern against the CURRENT topic set; a changed
    * resolution is a subscription change (epoch bump). */
  private def refreshRegexes(g: Group): Unit = {
    var changed = false
    g.members.values.foreach { m =>
      if (m.subscribedRegex != null) resolveRegex(m.subscribedRegex)
        .foreach { res =>
          if (res != m.resolvedRegexTopics) {
            m.resolvedRegexTopics = res; changed = true
          }
        }
    }
    if (changed) bump(g)
  }

  def heartbeat(groupId: String, memberIdIn: String, memberEpoch: Int,
      instanceId: String, rackId: String, rebalanceTimeoutMs: Int,
      subscribed: Seq[String], subscribedRegex: String,
      serverAssignor: String,
      owned: Seq[(String, Seq[Int])], clientId: String,
      now: Long): HeartbeatResult = synchronized {
    if (serverAssignor != null && !ServedAssignors(serverAssignor))
      return HeartbeatResult(112,
        s"assignor '$serverAssignor' not served (uniform, range)",
        memberIdIn, memberEpoch, None)
    // validate the pattern BEFORE any group mutation, like the
    // assignor check ("" = clear, per the v1 field contract)
    val regexTopics: Option[Set[String]] =
      if (subscribedRegex == null || subscribedRegex.isEmpty) None
      else resolveRegex(subscribedRegex) match {
        case Left(msg) =>
          // INVALID_REGULAR_EXPRESSION (125) — the code Kafka 4.0's
          // ConsumerGroupHeartbeat v1 answers for an unusable pattern
          // (a strict client maps 42 to a different retry path)
          return HeartbeatResult(125, s"invalid topic regex: $msg",
            memberIdIn, memberEpoch, None)
        case Right(s) => Some(s)
      }
    val g = groups.getOrElseUpdate(groupId, new Group(groupId))
    expireMembers(g, now)
    refreshRegexes(g)

    if (memberEpoch == -1) { // leave
      if (!g.members.contains(memberIdIn))
        return HeartbeatResult(25, "unknown member", memberIdIn, -1, None)
      g.members.remove(memberIdIn)
      bump(g)
      return ok(memberIdIn, -1, None)
    }

    var joinedNow = false
    val m: Member =
      if (memberEpoch == 0) { // (re)join
        if (subscribed == null && regexTopics.isEmpty &&
            !g.members.contains(memberIdIn))
          return HeartbeatResult(42,
            "a joining member must subscribe", memberIdIn, 0, None)
        val id =
          if (memberIdIn == null || memberIdIn.isEmpty)
            java.util.UUID.randomUUID().toString
          else memberIdIn
        val mm = g.members.getOrElseUpdate(id, new Member(id))
        // a (re)join owns nothing and starts from epoch 0
        mm.owned = Set.empty
        mm.granted = Set.empty
        mm.memberEpoch = 0
        if (serverAssignor != null) g.assignorName = serverAssignor
        joinedNow = true
        mm
      } else {
        g.members.get(memberIdIn) match {
          case None =>
            return HeartbeatResult(25, "unknown member", memberIdIn,
              memberEpoch, None)
          case Some(mm) if mm.memberEpoch != memberEpoch =>
            return HeartbeatResult(110,
              s"member epoch $memberEpoch is not current (${mm.memberEpoch})",
              memberIdIn, mm.memberEpoch, None)
          case Some(mm) => mm
        }
      }

    if (instanceId != null) m.instanceId = instanceId
    if (rackId != null) m.rackId = rackId
    if (rebalanceTimeoutMs != -1) m.rebalanceTimeoutMs = rebalanceTimeoutMs
    if (clientId != null && clientId.nonEmpty) m.clientId = clientId
    val subChanged = subscribed != null &&
      subscribed.toSet != m.subscribed.toSet
    if (subChanged) m.subscribed = subscribed
    // regex: null = unchanged, "" = clear, else set + resolve now
    val regexChanged =
      if (subscribedRegex == null) false
      else if (subscribedRegex.isEmpty) {
        val had = m.subscribedRegex != null
        m.subscribedRegex = null
        m.resolvedRegexTopics = Set.empty
        had
      } else {
        val ch = subscribedRegex != m.subscribedRegex ||
          regexTopics.get != m.resolvedRegexTopics
        m.subscribedRegex = subscribedRegex
        m.resolvedRegexTopics = regexTopics.get
        ch
      }
    // ONE bump per heartbeat, whatever changed — a join with a fresh
    // subscription is one membership event, not two epochs
    if (joinedNow || subChanged || regexChanged) bump(g)
    if (owned != null) {
      m.owned = owned.flatMap { case (t, ps) => ps.map(t -> _) }.toSet
      // a reported revocation releases the grant too
      m.granted = m.granted.intersect(m.owned.union(m.target))
    }
    m.lastSeen = now

    // --- reconciliation ---
    if (!m.owned.subsetOf(m.target)) {
      // revocation pending: shrink to owned ∩ target, epoch HELD until
      // the member reports the revocation on a later heartbeat
      val keep = m.owned.intersect(m.target)
      m.granted = keep
      ok(m.memberId, m.memberEpoch, Some(toWire(keep)))
    } else {
      val heldElsewhere = g.members.values
        .filter(_ ne m).flatMap(o => o.owned ++ o.granted).toSet
      val grant = m.target.diff(heldElsewhere)
      val changed = grant != m.granted || m.memberEpoch != g.epoch
      m.granted = grant
      m.memberEpoch = g.epoch
      ok(m.memberId, m.memberEpoch,
        if (changed) Some(toWire(grant)) else None)
    }
  }

  /** Epoch bump + full target recompute (the server-side assignor). */
  private def bump(g: Group): Unit = {
    g.epoch += 1
    g.assignmentEpoch = g.epoch
    val members = g.members.values.toSeq.sortBy(_.memberId)
    members.foreach(_.target = Set.empty)
    val topics = members.flatMap(_.effectiveSubscription).distinct.sorted
    topics.foreach { t =>
      val n = partitionsOf(t).getOrElse(0)
      val subs = members.filter(_.effectiveSubscription.contains(t))
      if (subs.nonEmpty && n > 0) g.assignorName match {
        case "range" =>
          val base = n / subs.length
          val extra = n % subs.length
          var p = 0
          subs.zipWithIndex.foreach { case (m, i) =>
            val take = base + (if (i < extra) 1 else 0)
            m.target ++= (p until p + take).map(t -> _)
            p += take
          }
        case _ => // uniform
          (0 until n).foreach(p => subs(p % subs.length).target += (t -> p))
      }
    }
  }

  private def expireMembers(g: Group, now: Long): Unit = {
    val dead = g.members.values
      .filter(m => now - m.lastSeen > sessionTimeoutMs && m.lastSeen > 0)
      .map(_.memberId).toSeq
    if (dead.nonEmpty) {
      dead.foreach(g.members.remove)
      bump(g)
    }
  }

  /** ConsumerGroupDescribe view; None for unknown groups. */
  def describe(groupId: String, now: Long): Option[KafkaWire.CGDescribedGroup] =
    synchronized {
      groups.get(groupId).map { g =>
        expireMembers(g, now)
        refreshRegexes(g)
        val state =
          if (g.members.isEmpty) "Empty"
          else if (g.members.values.forall(m =>
            m.memberEpoch == g.epoch && m.owned == m.target)) "Stable"
          else "Reconciling"
        KafkaWire.CGDescribedGroup(0, null, groupId, state, g.epoch,
          g.assignmentEpoch, g.assignorName,
          g.members.values.toSeq.map { m =>
            KafkaWire.CGDescribedMember(m.memberId, m.instanceId, m.rackId,
              m.memberEpoch, m.clientId, "", m.subscribed.sorted,
              m.subscribedRegex, toWire(m.owned), toWire(m.target))
          })
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

object Group848Coordinator {
  /** Detects constructs outside the java.util.regex ∩ RE2 common
    * subset — backreferences, lookaround, atomic groups, Java named
    * groups (RE2 spells them (?P<name>), possessive quantifiers. A
    * subscription pattern using one would silently match DIFFERENT
    * topics than a real 4.0 broker's RE2 evaluation, so it is
    * rejected in-band (125) instead. Escape- and character-class-
    * aware: `\(?=` is a literal paren, `[\1]` an octal class member. */
  private[streaming] def unsupportedRegexConstruct(
      pattern: String): Option[String] = {
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) {
        val n = pattern.charAt(i + 1)
        if (!inClass && n >= '1' && n <= '9')
          return Some(s"backreference \\$n")
        if (!inClass && n == 'k')
          return Some("named backreference \\k")
        i += 2
      } else {
        if (c == '[' && !inClass) inClass = true
        else if (c == ']' && inClass) inClass = false
        else if (!inClass && c == '(' && i + 1 < pattern.length &&
            pattern.charAt(i + 1) == '?' && i + 2 < pattern.length) {
          pattern.charAt(i + 2) match {
            case '=' | '!' => return Some(s"lookahead (?${pattern.charAt(i + 2)}")
            case '<' if i + 3 < pattern.length &&
                (pattern.charAt(i + 3) == '=' || pattern.charAt(i + 3) == '!') =>
              return Some("lookbehind (?<")
            case '<' =>
              return Some("Java named group (?<name> (RE2 spells (?P<name>)")
            case '>' => return Some("atomic group (?>")
            case _ => () // (?: (?i) etc. — shared syntax
          }
        } else if (!inClass && (c == '*' || c == '+' || c == '?' || c == '}') &&
            i + 1 < pattern.length && pattern.charAt(i + 1) == '+') {
          return Some(s"possessive quantifier $c+")
        }
        i += 1
      }
    }
    None
  }
}
