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

  // --- round-8 share codecs (76/78/79): the same discipline — the
  // golden frames pin the layout once, these drive hundreds of
  // structurally random shapes through the identity ---

  private val genTopicName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(20))

  test("ShareGroupHeartbeat request survives arbitrary shapes") {
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      group <- genStr
      member <- genNStr
      epoch <- Gen.chooseNum(-1, Int.MaxValue)
      rack <- genNStr
      subs <- Gen.option(Gen.listOf(genStr)).map(_.map(_.toSeq).orNull)
    } yield (corr, group, member, epoch, rack, subs)
    check("share-heartbeat-req", Prop.forAll(gen) {
      case (corr, group, member, epoch, rack, subs) =>
        val got = decodeShareGroupHeartbeatRequest(
          encodeShareGroupHeartbeatRequest(corr, "cli", group, member,
            epoch, subs, rack))
        got == ((corr, group, member, epoch, rack, subs, "cli"))
    })
  }

  test("ShareFetch request survives arbitrary batch shapes") {
    val genAck = for {
      first <- Gen.chooseNum(0L, 1L << 40)
      span <- Gen.chooseNum(0L, 64L)
      types <- Gen.oneOf(Gen.const(Seq(1)),
        Gen.listOfN((span + 1).toInt, Gen.chooseNum(0, 3)).map(_.toSeq))
    } yield ShareAckBatch(first, first + span, types)
    val genPart = for {
      p <- Gen.chooseNum(0, 64)
      pmb <- Gen.chooseNum(1, Int.MaxValue)
      acks <- Gen.listOf(genAck).map(_.take(4))
    } yield ShareFetchPartition(p, pmb, acks)
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      group <- genNStr
      member <- genNStr
      epoch <- Gen.chooseNum(-1, Int.MaxValue)
      names <- Gen.nonEmptyListOf(genTopicName).map(_.distinct.take(3))
      parts <- Gen.listOfN(names.length, Gen.nonEmptyListOf(genPart).map(_.take(3)))
      fnames <- Gen.listOf(genTopicName).map(_.distinct.take(2))
      fparts <- Gen.listOfN(fnames.length, Gen.listOf(Gen.chooseNum(0, 64)))
    } yield (corr, group, member, epoch,
      names.zip(parts.map(_.toSeq)), fnames.zip(fparts.map(_.toSeq)))
    check("share-fetch-req", Prop.forAll(gen) {
      case (corr, group, member, epoch, topics, forgotten) =>
        val got = decodeShareFetchRequest(
          encodeShareFetchRequest(corr, "cli", group, member, epoch,
            topics, forgotten),
          topicIdResolverFor(topics.map(_._1) ++ forgotten.map(_._1)))
        got.correlationId == corr && got.groupId == group &&
          got.memberId == member && got.sessionEpoch == epoch &&
          got.topics == topics && got.forgotten == forgotten
    })
  }

  test("ShareFetch response survives arbitrary record/run shapes") {
    val genRec = for {
      off <- Gen.chooseNum(0L, 1L << 30)
      ts <- Gen.chooseNum(-1L, 1L << 45)
      key <- Gen.option(Gen.containerOf[Array, Byte](
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue))).map(_.orNull)
      value <- Gen.containerOf[Array, Byte](
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield (off, ts, key, value)
    val genPart = for {
      p <- Gen.chooseNum(0, 64)
      err <- Gen.chooseNum(0, 200)
      ackErr <- Gen.chooseNum(0, 200)
      msg <- genNStr
      recs <- Gen.listOf(genRec).map(_.take(5))
      runs <- Gen.listOf(for {
        f <- Gen.chooseNum(0L, 1L << 30); s <- Gen.chooseNum(0L, 64L)
        dc <- Gen.chooseNum(1, 50)
      } yield ShareAcquired(f, f + s, dc)).map(_.take(4))
    } yield {
      // a records block needs ascending unique offsets + one base ts
      val sorted = recs.map(_._1).distinct.sorted
      val cleaned = sorted.zip(recs).map { case (o, (_, _, k, v)) =>
        (o, WireRecordV2(if (recs.isEmpty) -1L else recs.head._2, k, v)) }
      ShareFetchPartResp(p, err, msg, ackErr, msg, cleaned, runs)
    }
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      err <- Gen.chooseNum(0, 200)
      msg <- genNStr
      names <- Gen.nonEmptyListOf(genTopicName).map(_.distinct.take(3))
      parts <- Gen.listOfN(names.length, Gen.listOf(genPart).map(_.take(3)))
    } yield (corr, err, msg, names.zip(parts.map(_.toSeq)))
    check("share-fetch-resp", Prop.forAll(gen) {
      case (corr, err, msg, topics) =>
        val (gc, ge, gm, gt) = decodeShareFetchResponse(
          encodeShareFetchResponse(corr, err, msg, topics),
          topicIdResolverFor(topics.map(_._1)))
        // v1 adds top-level acquisition_lock_timeout_ms: the field
        // must survive and the decode must stay aligned through it
        val lockMs = corr % 90001
        val rawV1 = encodeShareFetchResponse(corr, err, msg, topics,
          version = 1, acquisitionLockTimeoutMs = lockMs)
        val (_, geV1, _, gtV1) = decodeShareFetchResponse(rawV1,
          topicIdResolverFor(topics.map(_._1)), version = 1)
        val v1Ok = shareFetchAcquisitionLockMs(rawV1) == lockMs &&
          geV1 == err && gtV1.map(_._1) == topics.map(_._1)
        def recEq(a: Seq[(Long, WireRecordV2)], b: Seq[(Long, WireRecordV2)]) =
          a.length == b.length && a.zip(b).forall { case ((o1, r1), (o2, r2)) =>
            o1 == o2 && r1.timestampMs == r2.timestampMs &&
              java.util.Arrays.equals(
                Option(r1.key).getOrElse(Array.emptyByteArray),
                Option(r2.key).getOrElse(Array.emptyByteArray)) &&
              java.util.Arrays.equals(r1.value, r2.value)
          }
        v1Ok && gc == corr && ge == err && gm == msg &&
          gt.map(_._1) == topics.map(_._1) &&
          gt.zip(topics).forall { case ((_, got), (_, want)) =>
            got.length == want.length &&
              got.zip(want).forall { case (g, w) =>
                g.partition == w.partition && g.errorCode == w.errorCode &&
                  g.ackErrorCode == w.ackErrorCode &&
                  g.acquired == w.acquired && recEq(g.records, w.records)
              }
          }
    })
  }

  test("ShareAcknowledge request/response survive arbitrary shapes") {
    val genAck = for {
      first <- Gen.chooseNum(0L, 1L << 40)
      span <- Gen.chooseNum(0L, 64L)
    } yield ShareAckBatch(first, first + span, Seq(1))
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      group <- genNStr
      member <- genNStr
      epoch <- Gen.chooseNum(-1, Int.MaxValue)
      names <- Gen.nonEmptyListOf(genTopicName).map(_.distinct.take(3))
      parts <- Gen.listOfN(names.length,
        Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 64), Gen.listOf(genAck)
          .map(_.take(3))).map { case (p, a) => (p, a.toSeq) }).map(_.take(3)))
    } yield (corr, group, member, epoch, names.zip(parts.map(_.toSeq)))
    check("share-ack", Prop.forAll(gen) {
      case (corr, group, member, epoch, topics) =>
        val req = decodeShareAcknowledgeRequest(
          encodeShareAcknowledgeRequest(corr, "cli", group, member, epoch,
            topics),
          topicIdResolverFor(topics.map(_._1)))
        val results = topics.map { case (n, ps) =>
          (n, ps.map { case (p, _) => (p, 0, null: String) }) }
        val (rc, re, rm, rt) = decodeShareAcknowledgeResponse(
          encodeShareAcknowledgeResponse(corr, 0, null, results),
          topicIdResolverFor(topics.map(_._1)))
        req.correlationId == corr && req.groupId == group &&
          req.memberId == member && req.sessionEpoch == epoch &&
          req.topics == topics &&
          rc == corr && re == 0 && rm == null && rt == results
    })
  }

  test("ShareFetch v1 request survives arbitrary flow-control shapes") {
    // v1: no per-partition max bytes (decodes as MaxValue), top-level
    // max_records + batch_size round-trip (non-positive → unlimited)
    val genPart = for {
      p <- Gen.chooseNum(0, 64)
      acks <- Gen.listOf(Gen.chooseNum(0L, 1L << 30)
        .map(o => ShareAckBatch(o, o + 2, Seq(1)))).map(_.take(3))
    } yield ShareFetchPartition(p, 1 << 20, acks)
    val gen = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      group <- genNStr
      member <- genNStr
      epoch <- Gen.chooseNum(-1, Int.MaxValue)
      maxR <- Gen.chooseNum(1, Int.MaxValue)
      bs <- Gen.chooseNum(1, Int.MaxValue)
      names <- Gen.nonEmptyListOf(genTopicName).map(_.distinct.take(3))
      parts <- Gen.listOfN(names.length, Gen.nonEmptyListOf(genPart).map(_.take(3)))
    } yield (corr, group, member, epoch, maxR, bs,
      names.zip(parts.map(_.toSeq)))
    check("share-fetch-v1-req", Prop.forAll(gen) {
      case (corr, group, member, epoch, maxR, bs, topics) =>
        val got = decodeShareFetchRequest(
          encodeShareFetchRequest(corr, "cli", group, member, epoch,
            topics, version = 1, maxRecords = maxR, batchSize = bs),
          topicIdResolverFor(topics.map(_._1)))
        got.version == 1 && got.maxRecords == maxR && got.batchSize == bs &&
          got.correlationId == corr && got.sessionEpoch == epoch &&
          got.topics == topics.map { case (n, ps) =>
            (n, ps.map(_.copy(partitionMaxBytes = Int.MaxValue)))
          }
    })
  }

  test("share-admin codecs (90/91/92) survive arbitrary shapes") {
    val genRow = for {
      p <- Gen.chooseNum(0, 64)
      off <- Gen.chooseNum(-1L, 1L << 40)
      err <- Gen.chooseNum(0, 99)
      msg <- genNStr
    } yield ShareOffsetRow(p, off, 0, err, msg)
    val genDescReq = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      groups <- Gen.nonEmptyListOf(for {
        g <- genStr
        topics <- Gen.option(Gen.listOf(for {
          t <- genTopicName
          ps <- Gen.option(Gen.listOf(Gen.chooseNum(0, 64)).map(_.toSeq))
        } yield (t, ps)).map(_.take(3).toSeq))
      } yield (g, topics)).map(_.take(3).toSeq)
    } yield (corr, groups)
    check("describe-share-offsets-req", Prop.forAll(genDescReq) {
      case (corr, groups) =>
        decodeDescribeShareGroupOffsetsRequest(
          encodeDescribeShareGroupOffsetsRequest(corr, "cli", groups)) ==
          ((corr, groups))
    })
    val genDescResp = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      groups <- Gen.nonEmptyListOf(for {
        g <- genStr
        err <- Gen.chooseNum(0, 99)
        msg <- genNStr
        topics <- Gen.listOf(for {
          t <- genTopicName
          rows <- Gen.nonEmptyListOf(genRow).map(_.take(4).toSeq)
        } yield (t, rows)).map(_.take(3).toSeq)
      } yield (g, err, msg, topics)).map(_.take(3).toSeq)
    } yield (corr, groups)
    check("describe-share-offsets-resp", Prop.forAll(genDescResp) {
      case (corr, groups) =>
        decodeDescribeShareGroupOffsetsResponse(
          encodeDescribeShareGroupOffsetsResponse(corr, groups)) ==
          ((corr, groups))
    })
    val genAlter = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      g <- genStr
      topics <- Gen.nonEmptyListOf(for {
        t <- genTopicName
        ps <- Gen.nonEmptyListOf(for {
          p <- Gen.chooseNum(0, 64)
          off <- Gen.chooseNum(0L, 1L << 40)
        } yield (p, off)).map(_.take(4).toSeq)
      } yield (t, ps)).map(_.take(3).toSeq)
      errs <- Gen.chooseNum(0, 99)
      msg <- genNStr
    } yield (corr, g, topics, errs, msg)
    check("alter-share-offsets", Prop.forAll(genAlter) {
      case (corr, g, topics, err, msg) =>
        val reqOk = decodeAlterShareGroupOffsetsRequest(
          encodeAlterShareGroupOffsetsRequest(corr, "cli", g, topics)) ==
          ((corr, g, topics))
        val results = topics.map { case (t, ps) =>
          (t, ps.map { case (p, _) => (p, err, msg) }) }
        val respOk = decodeAlterShareGroupOffsetsResponse(
          encodeAlterShareGroupOffsetsResponse(corr, err, msg, results)) ==
          ((corr, err, msg, results))
        reqOk && respOk
    })
    val genDelete = for {
      corr <- Gen.chooseNum(0, Int.MaxValue)
      g <- genStr
      topics <- Gen.nonEmptyListOf(genTopicName).map(_.distinct.take(4).toSeq)
      err <- Gen.chooseNum(0, 99)
      msg <- genNStr
    } yield (corr, g, topics, err, msg)
    check("delete-share-offsets", Prop.forAll(genDelete) {
      case (corr, g, topics, err, msg) =>
        val reqOk = decodeDeleteShareGroupOffsetsRequest(
          encodeDeleteShareGroupOffsetsRequest(corr, "cli", g, topics)) ==
          ((corr, g, topics))
        val results = topics.map(t => (t, err, msg))
        val respOk = decodeDeleteShareGroupOffsetsResponse(
          encodeDeleteShareGroupOffsetsResponse(corr, err, msg, results)) ==
          ((corr, err, msg, results))
        reqOk && respOk
    })
  }
}
