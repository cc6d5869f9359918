package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trips for the round-7 codecs (telemetry,
  * DescribeTopicPartitions, ConsumerGroupHeartbeat v1): hand-laid
  * golden frames pin the byte layout at one point; these drive the
  * SAME encoder/decoder pair through hundreds of structurally random
  * inputs — null variants, empty arrays, boundary ints — and demand
  * identity. Seeded: the generated inputs are the same every run. */
class CodecPropertySpec extends AnyFunSuite {
  import KafkaWire._

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      p)
    assert(res.passed, s"$name: $res")
  }

  private val genUuid: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](16, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  private val genStr: Gen[String] = Gen.asciiPrintableStr.map(_.take(40))
  private val genNStr: Gen[String] = Gen.option(genStr).map(_.orNull)

  test("GetTelemetrySubscriptions response survives arbitrary field values") {
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      err <- Gen.chooseNum(0, Short.MaxValue.toInt)
      iid <- genUuid
      sub <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      comp <- Gen.listOf(Gen.chooseNum(0, 4))
      ivl <- Gen.chooseNum(0, Int.MaxValue)
      max <- Gen.chooseNum(0, Int.MaxValue)
      delta <- Gen.oneOf(true, false)
      metrics <- Gen.listOf(genStr)
    } yield (corr, err, iid, sub, comp, ivl, max, delta, metrics)
    check("telemetry-subs", Prop.forAll(gen) {
      case (corr, err, iid, sub, comp, ivl, max, delta, metrics) =>
        val got = decodeGetTelemetrySubscriptionsResponse(
          encodeGetTelemetrySubscriptionsResponse(corr, err, iid, sub,
            comp, ivl, max, delta, metrics))
        got._1 == corr && got._2 == err && got._3.sameElements(iid) &&
          got._4 == sub && got._5 == comp && got._6 == ivl &&
          got._7 == max && got._8 == delta && got._9 == metrics
    })
  }

  test("PushTelemetry request survives arbitrary payloads") {
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      iid <- genUuid
      sub <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      term <- Gen.oneOf(true, false)
      ct <- Gen.chooseNum(0, 4)
      metrics <- Gen.option(Gen.containerOf[Array, Byte](
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue))).map(_.orNull)
    } yield (corr, iid, sub, term, ct, metrics)
    check("push-telemetry", Prop.forAll(gen) {
      case (corr, iid, sub, term, ct, metrics) =>
        val got = decodePushTelemetryRequest(
          encodePushTelemetryRequest(corr, "cli", iid, sub, term, ct, metrics))
        got._1 == corr && got._2.sameElements(iid) && got._3 == sub &&
          got._4 == term && got._5 == ct &&
          ((got._6 == null && metrics == null) ||
            (got._6 != null && metrics != null && got._6.sameElements(metrics)))
    })
  }

  test("DescribeTopicPartitions request/response survive arbitrary shapes") {
    val genCursor = Gen.option(for {
      t <- genStr; p <- Gen.chooseNum(0, Int.MaxValue)
    } yield DtpCursor(t, p))
    val genPartition = for {
      err <- Gen.chooseNum(0, 200)
      idx <- Gen.chooseNum(0, 10000)
      leader <- Gen.chooseNum(0, 100)
      epoch <- Gen.chooseNum(0, 100)
      replicas <- Gen.listOf(Gen.chooseNum(0, 10))
      isr <- Gen.listOf(Gen.chooseNum(0, 10))
      elr <- Gen.option(Gen.listOf(Gen.chooseNum(0, 10)))
      lastElr <- Gen.option(Gen.listOf(Gen.chooseNum(0, 10)))
      offline <- Gen.listOf(Gen.chooseNum(0, 10))
    } yield DtpPartition(err, idx, leader, epoch, replicas, isr, elr,
      lastElr, offline)
    val genTopic = for {
      err <- Gen.chooseNum(0, 200)
      name <- genNStr
      id <- genUuid
      internal <- Gen.oneOf(true, false)
      parts <- Gen.resize(6, Gen.listOf(genPartition))
      ops <- Gen.oneOf(Gen.const(Int.MinValue), Gen.chooseNum(0, 1 << 20))
    } yield DtpTopic(err, name, id, internal, parts, ops)
    val genReq = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      topics <- Gen.resize(8, Gen.listOf(genStr))
      limit <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      cursor <- genCursor
    } yield (corr, topics, limit, cursor)
    check("dtp-request", Prop.forAll(genReq) {
      case (corr, topics, limit, cursor) =>
        decodeDescribeTopicPartitionsRequest(
          encodeDescribeTopicPartitionsRequest(corr, "cli", topics, limit,
            cursor)) == ((corr, topics, limit, cursor))
    })
    val genResp = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      topics <- Gen.resize(5, Gen.listOf(genTopic))
      next <- genCursor
    } yield (corr, topics, next)
    check("dtp-response", Prop.forAll(genResp) {
      case (corr, topics, next) =>
        val (gc, gt, gn) = decodeDescribeTopicPartitionsResponse(
          encodeDescribeTopicPartitionsResponse(corr, topics, next))
        gc == corr && gn == next && gt.length == topics.length &&
          gt.zip(topics).forall { case (a, b) =>
            a.errorCode == b.errorCode && a.name == b.name &&
              a.topicId.sameElements(b.topicId) &&
              a.isInternal == b.isInternal &&
              a.partitions == b.partitions &&
              a.authorizedOperations == b.authorizedOperations
          }
    })
  }

  test("ConsumerGroupHeartbeat v1 survives arbitrary null/value combinations") {
    val genName = Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty)
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      group <- genName
      member <- Gen.oneOf(Gen.const(""), genName)
      epoch <- Gen.oneOf(Gen.const(-1), Gen.chooseNum(0, 1000))
      names <- Gen.option(Gen.resize(5, Gen.listOf(genName)))
      regex <- Gen.oneOf(Gen.const(null: String), Gen.const(""),
        genName.map(_ + ".*"))
      assignor <- Gen.oneOf(Gen.const(null: String), Gen.const("uniform"))
      inst <- Gen.oneOf(Gen.const(null: String), genName)
      rack <- Gen.oneOf(Gen.const(null: String), genName)
      timeout <- Gen.oneOf(Gen.const(-1), Gen.chooseNum(0, 60000))
      owned <- Gen.option(Gen.resize(4, Gen.nonEmptyListOf(for {
        t <- genName; ps <- Gen.resize(5, Gen.listOf(Gen.chooseNum(0, 31)))
      } yield (t, ps))))
    } yield (corr, group, member, epoch, names.map(_.toSeq).orNull,
      regex, assignor, inst, rack, timeout,
      owned.map(_.toSeq).orNull)
    check("cgh-v1", Prop.forAll(gen) {
      case (corr, group, member, epoch, names, regex, assignor, inst,
          rack, timeout, owned) =>
        val resolver = topicIdResolverFor(
          Option(owned).map(_.map(_._1)).getOrElse(Seq.empty))
        val got = decodeConsumerGroupHeartbeatRequest(
          encodeConsumerGroupHeartbeatRequest(corr, "cli", group, member,
            epoch, names, owned, assignor, inst, rack, timeout, regex,
            version = 1), resolver)
        got == CGHeartbeatRequest(corr, "cli", group, member, epoch,
          inst, rack, timeout, names, regex, assignor, owned)
    })
  }
}
