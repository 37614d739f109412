package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import EventsStream.Event

class EventsStreamSpec extends SparkSpec {

  // offset keeps test events above the initial watermark (=0), which
  // would otherwise filter the very first event as late; a minute
  // multiple so window starts still align with ts(k*60)
  private def ts(sec: Long): Timestamp = new Timestamp((sec + 1200) * 1000)

  /** Start the query, then feed each stage as its own micro-batch (so
    * the watermark advances between stages), return the sink table. */
  private def feed[T](input: MemoryStream[Event],
                      df: org.apache.spark.sql.Dataset[T], name: String,
                      stages: Seq[Seq[Event]]): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    stages.foreach { s => input.addData(s); q.processAllAvailable() }
    // one empty-progress pass lets event-time timeouts fire
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling windows match the batch computation") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val events = (0 until 50).map(i =>
      Event(i, i % 3, ts(i * 7), (i % 5) * 1.5))
    val streamed = feed(input, EventsStream.tumblingCounts(input.toDF()),
      "tumbling",
      Seq(events, Seq(Event(999, 99, ts(100000), 0.0))))
      .filter(col("user_id") < 99)
    val batch = EventsStream.tumblingCounts(events.toDF())
      .filter(col("user_id") < 99)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("session windows: streaming equals batch") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // two users, sessions separated by > 30 min gaps
    val events = Seq(
      Event(1, 1, ts(0), 1.0), Event(2, 1, ts(60), 2.0),
      Event(3, 1, ts(60 * 60), 3.0),                    // new session
      Event(4, 2, ts(10), 5.0), Event(5, 2, ts(45 * 60), 7.0))
    // sentinel far-future event advances the watermark so all real
    // sessions close and emit in append mode; filtered back out
    val streamed = feed(input,
      EventsStream.sessionWindows(input.toDF()), "sessions",
      Seq(events, Seq(Event(999, 99, ts(1000000), 0.0))))
      .filter(col("user_id") < 99)
    val batch = EventsStream.sessionWindows(events.toDF())
      .filter(col("user_id") < 99)
    assert(batch.count() == 4) // u1: {1,2},{3}; u2: {4},{5}
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("watermark drops events later than the bound") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val got = feed(input, EventsStream.tumblingCounts(input.toDF()), "late",
      Seq(
        Seq(Event(1, 1, ts(60), 1.0)),
        Seq(Event(2, 1, ts(600), 1.0)),  // watermark → 480s
        Seq(Event(3, 1, ts(60), 1.0)),   // < watermark: dropped
        Seq(Event(4, 1, ts(1200), 1.0)))) // close all windows
      .filter(col("w_start") === ts(60))
    assert(got.head().getAs[Long]("n_events") == 1) // late row not counted
  }

  test("sliding windows overlap") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val got = feed(input, EventsStream.slidingCounts(input.toDF()), "sliding",
      Seq(Seq(Event(1, 1, ts(90), 1.0)), Seq(Event(9, 9, ts(10000), 0.0))))
      .filter(col("user_id") === 1)
    // 2-minute window sliding by 1 minute: event at 90s lands in
    // windows starting at 0s and 60s
    assert(got.count() == 2)
  }

  test("sessionization closes on gap and emits totals") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val got = feed(input, EventsStream.sessionize(input.toDS()), "sessions",
      Seq(
        // user 1: burst at 0-20s, then burst at 100-110s
        Seq(Event(1, 1, ts(0), 1.0), Event(2, 1, ts(10), 2.0),
          Event(3, 1, ts(20), 3.0)),
        Seq(Event(4, 1, ts(100), 4.0), Event(5, 1, ts(110), 5.0)),
        // push watermark far forward so open sessions time out
        Seq(Event(9, 9, ts(10000), 0.0)),
        Seq(Event(10, 9, ts(20000), 0.0))))
      .filter(col("user_id") === 1)
      .orderBy("session_start")
      .collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_events") == 3)
    assert(got(0).getAs[Double]("total_value") == 6.0)
    assert(got(1).getAs[Long]("n_events") == 2)
    assert(got(1).getAs[Double]("total_value") == 9.0)
  }

  test("sessionize merges out-of-order events admitted by the watermark") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // batch 2's event at 80s is BEHIND batch 1's 100s but above the
    // watermark (70s): it must extend the open session backwards, so
    // batch 3's 125s event (25s after 100s) still merges — one session
    // of 3 starting at 80s, exactly what the batch order gives
    val got = feed(input, EventsStream.sessionize(input.toDS()), "oossess",
      Seq(
        Seq(Event(1, 1, ts(100), 1.0)),
        Seq(Event(2, 1, ts(80), 2.0)),
        Seq(Event(3, 1, ts(125), 4.0)),
        Seq(Event(9, 9, ts(10000), 0.0)),
        Seq(Event(10, 9, ts(20000), 0.0))))
      .filter(col("user_id") === 1)
      .collect()
    assert(got.length == 1, got.mkString(", "))
    assert(got(0).getAs[Timestamp]("session_start") == ts(80))
    assert(got(0).getAs[Long]("n_events") == 3)
    assert(got(0).getAs[Double]("total_value") == 7.0)
  }

  test("sessionize late chain merges with the back-extended session") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // batch 1 opens a session at 1000s (watermark → 970s); batch 2
    // delivers 970s (exactly start - gap — old timeline under the
    // per-event rule) and 995s together. The interval merge must
    // chain 970 ↔ 995 ↔ 1000 into ONE session — the old per-event
    // ascending pass emitted {970} as a spurious singleton before 995
    // back-extended the open session into its range
    val got = feed(input, EventsStream.sessionize(input.toDS()), "latechain",
      Seq(
        Seq(Event(1, 1, ts(1000), 1.0)),
        Seq(Event(2, 1, ts(970), 2.0), Event(3, 1, ts(995), 4.0)),
        Seq(Event(9, 9, ts(10000), 0.0)),
        Seq(Event(10, 9, ts(20000), 0.0))))
      .filter(col("user_id") === 1)
      .collect()
    assert(got.length == 1, got.mkString(", "))
    // 3 if the boundary event (ts == watermark) is admitted, 2 if the
    // source drops it as late — either way it must not split
    assert(got(0).getAs[Long]("n_events") >= 2)
  }

  test("sessionize evaluates the gap in microseconds") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tsUs(us: Long): Timestamp = {
      val base = (1200L + us / 1000000L) * 1000L
      val t = new Timestamp(base)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val input = MemoryStream[Event]
    // events at 500µs and 30.000100s: true gap 29.9996s < 30s — the µs
    // strict `< gap` rule merges them (ms-floored arithmetic would see
    // exactly 30s and split, diverging from session_window and q32)
    val got = feed(input, EventsStream.sessionize(input.toDS()), "ussess",
      Seq(
        Seq(Event(1, 1, tsUs(500), 1.0), Event(2, 1, tsUs(30000100L), 2.0)),
        Seq(Event(9, 9, ts(10000), 0.0)),
        Seq(Event(10, 9, ts(20000), 0.0))))
      .filter(col("user_id") === 1)
      .collect()
    assert(got.length == 1, got.mkString(", "))
    assert(got(0).getAs[Long]("n_events") == 2)
    assert(got(0).getAs[Timestamp]("session_start") == tsUs(500))
  }

  test("sessionize splits at exactly the gap, matching session_window") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // two events exactly gapSeconds (30s) apart: the canonical strict
    // `< gap` merge rule makes them SEPARATE sessions — same behavior
    // as sessionWindows and the q32 oracle
    val got = feed(input, EventsStream.sessionize(input.toDS()), "gapsess",
      Seq(
        Seq(Event(1, 1, ts(0), 1.0), Event(2, 1, ts(30), 2.0)),
        Seq(Event(9, 9, ts(10000), 0.0)),
        Seq(Event(10, 9, ts(20000), 0.0))))
      .filter(col("user_id") === 1)
      .orderBy("session_start")
      .collect()
    assert(got.length == 2, got.mkString(", "))
    assert(got.forall(_.getAs[Long]("n_events") == 1))
  }

  test("streaming dedup equals batch distinct and suppresses " +
    "cross-batch duplicates") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1 hits minute 20 three times (twice in batch 1, once in
    // batch 2 — the cross-batch duplicate exercises the state store);
    // user 2 hits two distinct minutes
    val b1 = Seq(Event(1, 1, ts(0), 1.0), Event(2, 1, ts(10), 1.0),
      Event(3, 2, ts(0), 1.0), Event(4, 2, ts(70), 1.0))
    val b2 = Seq(Event(5, 1, ts(20), 1.0))
    // 10-minute watermark delay: batch 2's minute-20 duplicate stays
    // ABOVE the watermark, so it reaches the dedup state store and is
    // suppressed there (with 0s it would be dropped as late instead)
    val streamed = feed(input,
      EventsStream.dedupKeys(input.toDF(), watermark = "10 minutes"),
      "dedupkeys", Seq(b1, b2))
    val batch = EventsStream.dedupKeys((b1 ++ b2).toDF())
    assert(streamed.count() == 3) // (u1,min20), (u2,min20), (u2,min21)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inL = MemoryStream[Event]
    val inR = MemoryStream[Event]
    // user 1: chain at 0s/30s/70s → pairs (1,2),(2,3) within 60s but
    // NOT (1,3) at 70s; user 2 isolated
    val events = Seq(
      Event(1, 1, ts(0), 1.0), Event(2, 1, ts(30), 1.0),
      Event(3, 1, ts(70), 1.0), Event(4, 2, ts(0), 1.0))
    val joined = EventsStream.followJoin(inL.toDF(), inR.toDF())
    val q = joined.writeStream.format("memory").queryName("followjoin")
      .outputMode("append").start()
    inL.addData(events); inR.addData(events)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("followjoin")
      .select("user_id", "a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == Set((1L, 1L, 2L), (1L, 2L, 3L)))
    val batch = EventsStream.followJoin(events.toDF(), events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == streamed)
  }

  test("file-source streaming read of the real events table") {
    // stage the single events file as a directory (the source contract)
    val dir = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = EventsStream.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    val q = EventsStream.tumblingCounts(stream,
        windowLen = "1 hour", watermark = "0 seconds")
      .writeStream.format("memory").queryName("filetumble")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("filetumble").count() > 0)
  }

  test("streaming foreachBatch index ingest equals the from-scratch " +
    "build") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.IrEngine.q26StreamedIndex(spark, dir)
      .collect().toSeq
    val direct = graft.queries.IrEngine.q26StemmedIndex(spark, dir)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == direct)
  }

  test("streaming per-window top-k: at most k rows per window, ranks " +
    "contiguous, counts equal the batch recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.IrEngine.q29TopUsers(spark, dir).collect()
    assert(got.nonEmpty)
    val byWindow = got.groupBy(_.getLong(0))
    byWindow.foreach { case (w, rows) =>
      assert(rows.length <= 3, s"window $w emitted ${rows.length} rows")
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w")).as("w_sec"), col("user_id"),
        col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { r =>
      assert(batch((r.getLong(0), r.getLong(2))) == r.getLong(3))
    }
  }

  test("streaming near-dup gate: pairs come from the parquet results " +
    "sink (no driver accumulation) and match the batch recompute") {
    val dir = "/root/testdata/sf0.001"
    val result = graft.queries.IrEngine.q29NeardupStream(spark, dir)
    // the result channel must be the sink table, not driver memory:
    // the plan reads the per-run pairs parquet directory
    assert(result.inputFiles.nonEmpty &&
      result.inputFiles.forall(_.contains("graft_nds_pairs")))
    val got = result.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch recompute of the same contract: band collisions where the
    // base doc's chunk (doc_id % 3 = ingest order) precedes the delta's
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val bands = graft.ops.Dedup.bandRowsOf(docs)
    val exp = bands.as("y").join(bands.as("x"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          pmod(col("x.doc_id"), lit(3)) < pmod(col("y.doc_id"), lit(3)))
      .select(col("y.doc_id").as("delta_doc"),
        col("x.doc_id").as("base_doc"),
        graft.ops.Dedup.bandMatchFraction.as("est_jaccard"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sorted
    assert(got.sorted == exp)
    assert(exp.nonEmpty)
  }

  test("streaming decontamination gate: admissions come from the " +
    "parquet sink and equal the batch operator row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val result = graft.queries.IrEngine.q29DecontamStream(spark, dir)
    assert(result.inputFiles.nonEmpty &&
      result.inputFiles.forall(_.contains("graft_dec_kept")),
      "result channel must be the sink table, not driver memory")
    val got = result.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val batch = graft.ops.TextAnalysis.decontaminate(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(batch.nonEmpty)
    assert(got == batch,
      "streamed admissions diverged from the batch keep-set")
    // the gate must actually drop something here — an all-pass corpus
    // would prove nothing about the reject path
    val trainDocs = graft.ops.Dedup.docShingles(spark, dir)
      .filter(pmod(col("doc_id"),
        lit(graft.ops.TextAnalysis.ContamMod)) =!= 0)
      .select("doc_id").distinct().count()
    assert(got.size < trainDocs,
      s"no doc rejected (${got.size} of $trainDocs)")
  }

  test("one-pass streaming curation funnel: per-doc gate decisions " +
    "equal the batch operators' (keeper gate included) and the " +
    "summary equals the batch funnel") {
    val dir = "/root/testdata/sf0.001"
    val audit = graft.queries.IrEngine.q29FunnelAudit(spark, dir)
    assert(audit.inputFiles.nonEmpty &&
      audit.inputFiles.forall(_.contains("graft_fnl_audit")),
      "audit channel must be the sink table, not driver memory")
    val got = audit.collect().map(r => r.getLong(0) ->
      ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    // batch recompute of all five gates
    val lid = graft.ops.TextAnalysis.langId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val qual = graft.ops.TextAnalysis.quality(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(4)))).toMap
    val keepers = graft.Tables.load(spark, dir, "documents")
      .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("k"))
      .collect().map(_.getLong(1)).toSet
    val ndDrop = graft.ops.Dedup.minhashLsh(spark, dir)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val dec = graft.ops.TextAnalysis.decontaminate(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet == lid.keySet, "audit must cover every doc")
    got.foreach { case (d, (g1, g2, g3, g4, g5)) =>
      assert(g1 == (lid(d) == "en"), s"doc $d g1")
      val (nt, ar) = qual(d)
      assert(g2 == (nt >= 20 && nt <= 1000 && ar >= 0.7), s"doc $d g2")
      assert(g3 == keepers(d),
        s"doc $d g3: stream keeper != batch global-min keeper")
      assert(g4 == !ndDrop(d),
        s"doc $d g4: stream near-dup gate != batch LSH drop set")
      assert(g5 == dec(d), s"doc $d g5")
    }
    // the near-dup gate must have demoted someone, with the demoting
    // partner in an EARLIER chunk for at least one pair (otherwise
    // the cross-batch band index is untested)
    assert(ndDrop.nonEmpty, "no LSH pair on this corpus — fixture moot")
    // summary row == the batch funnel's
    assert(graft.queries.IrEngine.q29FunnelStream(spark, dir)
      .collect().map(_.toSeq).toSeq ==
      graft.ops.TextAnalysis.curationFunnel(spark, dir)
        .collect().map(_.toSeq).toSeq)
    // stream == batch KEPT-SET parity: the audit's all-gates-pass
    // docs are exactly the batch APPLY's kept corpus (default
    // first-arrival policy)
    val streamKept = got.collect {
      case (d, (g1, g2, g3, g4, g5)) if g1 && g2 && g3 && g4 && g5 => d
    }.toSeq.sorted
    assert(streamKept ==
      graft.ops.TextAnalysis.curationFunnelApply(spark, dir)
        .collect().map(_.getLong(0)).toSeq,
      "stream kept set != batch funnel apply")
    // keeper-REJECT path: sf0.001 holds no exact duplicates, so build
    // a corpus with one late-arriving duplicate of an early doc (it
    // lands in a LATER chunk) and pin that the stream demotes exactly
    // the late copy — the first-arrival == global-min argument live
    val root = java.nio.file.Files
      .createTempDirectory("graft_fnl_dup").toString
    val d0 = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val maxId = d0.agg(max(col("doc_id"))).head().getLong(0)
    d0.unionByName(
        d0.orderBy("doc_id").limit(1)
          .withColumn("doc_id", lit(maxId + 1)))
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    val dupAudit = graft.queries.IrEngine.q29FunnelAudit(spark, root)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val firstId = d0.agg(min(col("doc_id"))).head().getLong(0)
    assert(dupAudit(firstId), "the original must stay the keeper")
    assert(!dupAudit(maxId + 1),
      "the late duplicate must be demoted by the digest index")
    // and the summary still equals the batch funnel on that corpus
    assert(graft.queries.IrEngine.q29FunnelStream(spark, root)
      .collect().map(_.toSeq).toSeq ==
      graft.ops.TextAnalysis.curationFunnel(spark, root)
        .collect().map(_.toSeq).toSeq)
  }

  test("streaming ANN ingest gate: pairs come from the parquet sink " +
    "and match the same-cell cross-chunk batch recompute") {
    val dir = "/root/testdata/sf0.001"
    val result = graft.queries.IrEngine.q29AnnStream(spark, dir)
    assert(result.inputFiles.nonEmpty &&
      result.inputFiles.forall(_.contains("graft_ans_pairs")))
    val got = result.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch recompute of the contract: same IVF cell (argmax against
    // the table's fixed seeds), exact cosine over the threshold, base
    // chunk (vec_id % 3 = ingest order) before delta chunk
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cells = graft.ops.Similarity.assignCells(spark, dir, e)
    val exp = cells.as("y").join(cells.as("x"),
        col("x.cell") === col("y.cell") &&
          pmod(col("x.vec_id"), lit(3)) < pmod(col("y.vec_id"), lit(3)))
      .select(col("y.vec_id").as("delta_vec"),
        col("x.vec_id").as("base_vec"),
        graft.ops.Similarity.cosine(
          col("x.embedding"), col("y.embedding")).as("c"))
      .filter(col("c") >= graft.queries.IrEngine.AnnStreamTau)
      .select(col("delta_vec"), col("base_vec"),
        round(col("c"), 4).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sorted
    assert(got.sorted == exp)
    assert(exp.nonEmpty)
  }

  test("ANN gate auto-compaction: a tight file bound keeps every cell " +
    "compacted through the append loop without changing the pairs") {
    val dir = "/root/testdata/sf0.001"
    val k = graft.ops.Similarity.IvfCentroids.toLong
    val (loose, _) = graft.queries.IrEngine
      .annStreamGateWithStore(spark, dir, k)
    val (tight, store) = graft.queries.IrEngine
      .annStreamGateWithStore(spark, dir, k, maxFilesPerCell = 1)
    def sig(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(sig(tight) == sig(loose),
      "in-loop compaction changed the gate's pairs")
    // the final batch compacts after its append, so every cell holds
    // exactly one file — fragmentation stays bounded by the LOOP, not
    // by an operator remembering the manual maintenance call
    val cellDirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { cd =>
      val n = cd.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${cd.getName}: $n files after compacted loop")
    }
    // the store still holds every ingested vector exactly once
    assert(spark.read.parquet(store).count() ==
      graft.Tables.load(spark, dir, "embeddings").count())
  }
}
