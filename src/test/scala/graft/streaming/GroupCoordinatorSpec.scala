package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The membership state machine behind the JoinGroup/SyncGroup/
  * Heartbeat/LeaveGroup wire APIs: generations, leader election,
  * rebalance signaling, lazy session-timeout eviction. */
class GroupCoordinatorSpec extends AnyFunSuite {
  import GroupCoordinator._

  private def meta(s: String) = s.getBytes(UTF_8)
  private val protocols = Seq(("range", meta("sub")))

  test("single member forms a generation, syncs, heartbeats") {
    val c = new GroupCoordinator()
    val j = c.join("g", "", "cli", "", 30000, "consumer", protocols)
    assert(j.errorCode === 0)
    assert(j.generationId === 1)
    assert(j.leaderId === j.memberId)
    assert(j.protocol === "range")
    assert(j.members.map(_._1) === Seq(j.memberId)) // leader sees the roster
    val (serr, assignment) = c.sync("g", 1, j.memberId,
      Seq((j.memberId, meta("p0,p1"))))
    assert(serr === 0)
    assert(new String(assignment, UTF_8) === "p0,p1")
    assert(c.heartbeat("g", 1, j.memberId) === 0)
    assert(c.describe("g").map(_._1) === Some("Stable"))
  }

  test("a second join opens a rebalance; stale members are signaled and rejoin") {
    val c = new GroupCoordinator()
    val a = c.join("g", "", "a", "", 30000, "consumer", protocols)
    c.sync("g", a.generationId, a.memberId, Seq((a.memberId, meta("all"))))
    val b = c.join("g", "", "b", "", 30000, "consumer", protocols)
    assert(b.errorCode === 0)
    assert(b.generationId === 2)
    assert(b.members.isEmpty) // follower does not see the roster
    // A is now stale: heartbeat says rebalance, not illegal generation
    assert(c.heartbeat("g", a.generationId, a.memberId) === RebalanceInProgress)
    // A rejoins and RE-ENTERS generation 2 (no livelock bump)
    val a2 = c.join("g", a.memberId, "a", "", 30000, "consumer", protocols)
    assert(a2.generationId === 2)
    assert(a2.leaderId === a.memberId) // join order is stable
    assert(a2.members.map(_._1).sorted === Seq(a.memberId, b.memberId).sorted)
    // follower syncing before the leader is told to retry, not blocked
    assert(c.sync("g", 2, b.memberId, Seq.empty)._1 === RebalanceInProgress)
    val (e1, asgA) = c.sync("g", 2, a2.memberId,
      Seq((a2.memberId, meta("p0")), (b.memberId, meta("p1"))))
    assert(e1 === 0 && new String(asgA, UTF_8) === "p0")
    val (e2, asgB) = c.sync("g", 2, b.memberId, Seq.empty)
    assert(e2 === 0 && new String(asgB, UTF_8) === "p1")
    assert(c.heartbeat("g", 2, a.memberId) === 0)
    assert(c.heartbeat("g", 2, b.memberId) === 0)
    // stale generation after stability is ILLEGAL_GENERATION
    assert(c.heartbeat("g", 1, a.memberId) === IllegalGeneration)
  }

  test("leave triggers a rebalance and re-elects the leader") {
    val c2 = new GroupCoordinator()
    val ja = c2.join("g", "", "a", "", 30000, "consumer", protocols)
    val jb = c2.join("g", "", "b", "", 30000, "consumer", protocols)
    val lead = c2.join("g", ja.memberId, "a", "", 30000, "consumer", protocols)
    c2.sync("g", lead.generationId, ja.memberId,
      Seq((ja.memberId, meta("p0")), (jb.memberId, meta("p1"))))
    assert(c2.leave("g", ja.memberId) === 0)
    // B is signaled, rejoins, becomes leader of a fresh generation
    assert(c2.heartbeat("g", lead.generationId, jb.memberId) === RebalanceInProgress)
    val jb2 = c2.join("g", jb.memberId, "b", "", 30000, "consumer", protocols)
    assert(jb2.leaderId === jb.memberId)
    assert(jb2.members.map(_._1) === Seq(jb.memberId))
    assert(c2.leave("g", jb.memberId) === 0)
    assert(c2.describe("g").map(_._1) === Some("Empty"))
  }

  test("expired members are evicted lazily and unknown members rejected") {
    var now = 0L
    val c = new GroupCoordinator(() => now)
    val a = c.join("g", "", "a", "", 1000, "consumer", protocols)
    c.sync("g", a.generationId, a.memberId, Seq((a.memberId, meta("all"))))
    now = 500
    assert(c.heartbeat("g", a.generationId, a.memberId) === 0)
    now = 2000 // past the 1000 ms session timeout since last heartbeat
    assert(c.heartbeat("g", a.generationId, a.memberId) === UnknownMemberId)
    assert(c.describe("g").map(_._1) === Some("Empty"))
    assert(c.sync("g", 1, "ghost", Seq.empty)._1 === UnknownMemberId)
    assert(c.leave("g", "ghost") === UnknownMemberId)
    assert(c.join("g", "never-seen", "a", "", 1000, "consumer", protocols)
      .errorCode === UnknownMemberId)
  }

  test("abandoned member-id reservations leave no phantom group") {
    var now = 1000L
    val c = new GroupCoordinator(() => now)
    val id = c.reserveMemberId("ghost", "cli", 5000)
    // a reservation in flight is NOT a group: not listed, not describable
    assert(c.listGroups().isEmpty)
    assert(c.describe("ghost").isEmpty)
    now += 6000 // the reservation expires unredeemed
    c.reserveMemberId("other", "cli", 5000) // any reserve sweeps phantoms
    assert(c.join("ghost", id, "cli", "", 5000, "consumer", protocols)
      .errorCode === UnknownMemberId) // the stale id is gone with it
    // the completed two-step still works end-to-end
    val id2 = c.reserveMemberId("real", "cli", 5000)
    val j = c.join("real", id2, "cli", "", 5000, "consumer", protocols)
    assert(j.errorCode === 0)
    assert(c.listGroups().map(_._1) === Seq("real"))
  }

  test("a rejoin that changes its subscription reopens the generation") {
    val c = new GroupCoordinator()
    val a = c.join("g", "", "a", "", 30000, "consumer", protocols)
    val b = c.join("g", "", "b", "", 30000, "consumer", protocols)
    // open rebalance (gen 2); B rejoins with NEW metadata → the
    // generation must bump so the leader re-reads the roster
    val b2 = c.join("g", b.memberId, "b", "", 30000, "consumer",
      Seq(("range", meta("different-subscription"))))
    assert(b2.generationId === b.generationId + 1)
    // the leader's rejoin roster carries B's new metadata
    val a2 = c.join("g", a.memberId, "a", "", 30000, "consumer", protocols)
    assert(a2.generationId === b2.generationId)
    val roster = a2.members.toMap
    assert(new String(roster(b.memberId), java.nio.charset.StandardCharsets.UTF_8)
      === "different-subscription")
    // an UNCHANGED rejoin mid-rebalance still re-enters (no livelock)
    val a3 = c.join("g", a.memberId, "a", "", 30000, "consumer", protocols)
    assert(a3.generationId === a2.generationId)
  }

  test("mismatched protocol type is rejected") {
    val c = new GroupCoordinator()
    c.join("g", "", "a", "", 30000, "consumer", protocols)
    assert(c.join("g", "", "b", "", 30000, "connect", protocols)
      .errorCode === InconsistentGroupProtocol)
  }
}
