package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Oracle.dsum

/** Structured Streaming versions of the event analytics (the reference has
  * no streaming surface — SURVEY.md §2.3; this is north-star capability):
  * the same declarative transforms as [[graft.ops.EventOps]], run
  * incrementally with watermarks and keyed state.
  *
  * Scale design: the windowed aggregate is partial-per-microbatch with state
  * in the state store keyed by (window, event_type) — the streaming analog
  * of partial+final aggregation; sessionization keeps O(1) state per user
  * key and emits on update, so state size is bounded by the key cardinality,
  * not the stream length.
  */
object StreamingOps {

  /** Streaming scan of the events parquet. `ts` is a native microsecond
    * TimestampType since the round-5 testdata regeneration
    * ([[graft.ops.Tables.eventsSchema]] pins it against NTZ inference), so
    * event-time is the column itself — no unit conversion.
    */
  /** SINGLE-MICROBATCH PRECONDITION: this reads the one
    * `events.parquet` file with no `maxFilesPerTrigger`, so the whole
    * table arrives in ONE microbatch. The batch oracles of the stateful
    * queries (notably `events_session_timeout_stream`, whose emission
    * rule — emitted iff a later same-user session exists OR
    * last_ms + gap < final watermark — is only batch-invariant under
    * this delivery) DEPEND on it: a multi-file or rate-limited source
    * delivering events out of order across batches would let
    * intermediate watermarks fire timeouts that split sessions the
    * oracle merges. Do not add `maxFilesPerTrigger`/multi-file inputs
    * here without restating those oracles per-batch.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.ops.Tables(spark, dir).events.schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("event_ts", col("ts"))
  }

  /** Portable epoch-ms from the microsecond `ts` — the streaming half of
    * [[graft.ops.EventOps.withMs]]; `unix_millis` floors µs→ms exactly as
    * DuckDB's `epoch_ms`, keeping streaming/batch event-time parity.
    */
  private def tsMs: Column = unix_millis(col("ts"))

  /** Tumbling 1h event-time window with a 2h watermark for late data. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_ts", "2 hours")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(events.sparkSession, col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** SLIDING 2h/1h event-time window — the overlapping-window shape the
    * tumbling row doesn't exercise: each event lands in exactly two
    * windows (size/slide = 2), so the state store holds two open windows
    * per (hour, type) key and every update touches both. Same watermark
    * and exact-sum contract as [[hourlyCounts]].
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_ts", "2 hours")
      .groupBy(window(col("event_ts"), "2 hours", "1 hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(events.sparkSession, col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_id: Long, ts_ms: Long,
      value: Double)
  final case class UserSessionState(nEvents: Long, startMs: Long, lastMs: Long)
  final case class UserSessionUpdate(user_id: Long, n_events: Long,
      start_ms: Long, last_ms: Long)

  /** Keyed running-session state via mapGroupsWithState (the
    * `KeyValueGroupedDataset` custom-state path): per user, the current
    * gap-session's event count and bounds, emitted in Update mode.
    */
  def runningSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val GapMs = 1800000L
    events
      .select(col("user_id"), col("event_id"),
        tsMs.as("ts_ms"),
        col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[UserEvent],
         state: GroupState[UserSessionState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var st = state.getOption.getOrElse(UserSessionState(0L, -1L, -1L))
          sorted.foreach { e =>
            st =
              if (st.nEvents == 0L || e.ts_ms - st.lastMs > GapMs)
                UserSessionState(1L, e.ts_ms, e.ts_ms)
              else
                // events are sorted only within a microbatch: a late event
                // from a later batch must not move the session bounds
                // backwards (keeps start <= last invariant)
                st.copy(nEvents = st.nEvents + 1,
                  startMs = math.min(st.startMs, e.ts_ms),
                  lastMs = math.max(st.lastMs, e.ts_ms))
          }
          state.update(st)
          UserSessionUpdate(user, st.nEvents, st.startMs, st.lastMs)
        })
      .toDF()
  }

  final case class ClosedSession(user_id: Long, n_events: Long,
      start_ms: Long, last_ms: Long)
  /** Carries the WATERMARKED TimestampType column through to the stateful
    * operator — event-time timeouts require the watermark column to
    * survive into the [flatMap]GroupsWithState input, a projection that
    * drops it fails analysis.
    */
  final case class TimedEvent(user_id: Long, event_id: Long, ts_ms: Long,
      event_ts: java.sql.Timestamp)

  /** Append-mode sessionization with EVENT-TIME TIMEOUTS — see the
    * `events_session_timeout_stream` query comment. State is one open
    * session per user (O(keys)); a session leaves state either when a
    * later in-batch event closes it or when the watermark passes
    * last + gap and the timeout callback fires.
    */
  def timeoutSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val GapMs = 1800000L
    events
      .withWatermark("event_ts", "2 hours")
      .select(col("user_id"), col("event_id"), tsMs.as("ts_ms"),
        col("event_ts"))
      .as[TimedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[TimedEvent],
         state: GroupState[UserSessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val st = state.get
            state.remove()
            Iterator(ClosedSession(user, st.nEvents, st.startMs, st.lastMs))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
            var open = state.getOption
            val closed =
              scala.collection.mutable.ArrayBuffer[ClosedSession]()
            sorted.foreach { e =>
              open match {
                case Some(st) if e.ts_ms - st.lastMs <= GapMs =>
                  open = Some(st.copy(nEvents = st.nEvents + 1,
                    startMs = math.min(st.startMs, e.ts_ms),
                    lastMs = math.max(st.lastMs, e.ts_ms)))
                case Some(st) =>
                  closed +=
                    ClosedSession(user, st.nEvents, st.startMs, st.lastMs)
                  open = Some(UserSessionState(1L, e.ts_ms, e.ts_ms))
                case None =>
                  open = Some(UserSessionState(1L, e.ts_ms, e.ts_ms))
              }
            }
            open.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + GapMs)
            }
            closed.iterator
          }
        })
      .toDF()
  }

  final case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long)
  /** Per-user first-occurrence stage times; Long.MaxValue = not seen. */
  final case class FunnelMins(v: Long, c: Long, p: Long)
  final case class FunnelStage(user_id: Long, has_view: Boolean,
      view_click: Boolean, complete: Boolean)

  /** Streaming form of the batch `events_funnel`: a per-user keyed state
    * machine holding the three first-occurrence stage times (three longs
    * per user — state is O(users), independent of stream length). Each
    * microbatch folds its events into the mins and re-emits the user's
    * funnel stage under the same strict-order rule as the batch query, so
    * the latest emission per user always equals the batch answer over the
    * events seen so far (mins are order-insensitive, so late or re-ordered
    * delivery converges to the same state).
    */
  def funnelStages(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val Absent = Long.MaxValue
    events
      .select(col("user_id"), col("event_type"),
        tsMs.as("ts_ms"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelMins]) => {
          var st = state.getOption.getOrElse(FunnelMins(Absent, Absent, Absent))
          rows.foreach { e =>
            e.event_type match {
              case "view"     => if (e.ts_ms < st.v) st = st.copy(v = e.ts_ms)
              case "click"    => if (e.ts_ms < st.c) st = st.copy(c = e.ts_ms)
              case "purchase" => if (e.ts_ms < st.p) st = st.copy(p = e.ts_ms)
              case _          => ()
            }
          }
          state.update(st)
          val vc = st.v != Absent && st.c != Absent && st.c > st.v
          FunnelStage(user, st.v != Absent, vc,
            vc && st.p != Absent && st.p > st.c)
        })
      .toDF()
  }

  final case class TransEvent(user_id: Long, event_id: Long, ts_ms: Long,
      event_type: String)
  final case class TransState(lastTs: Long, lastId: Long, lastType: String)
  final case class Transition(event_type: String, next_type: String)

  /** Streaming form of the batch transition matrix's pairing stage: a
    * per-user keyed state machine holding only the LAST event seen
    * (three fields per user — state is O(users), independent of stream
    * length), emitting one (prev → cur) transition per arriving event.
    * Within a microbatch events are folded in (ts, event_id) order, and
    * the state carries the boundary event so a user's transition across
    * two microbatches is emitted exactly once.
    *
    * ORDERING CONTRACT: equality with the batch lead()-window answer
    * holds when each user's events arrive in event-time order ACROSS
    * microbatches (always true for the single-microbatch finite source
    * the gate runs). A late event landing in a later microbatch pairs
    * against the retained last event — with O(1) state there is no
    * retroactive re-pairing; a deployment needing late-event repair
    * would buffer a watermark horizon per key (O(events-per-horizon)
    * state), which is deliberately not this operator.
    */
  def transitionEmissions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        tsMs.as("ts_ms"),
        col("event_type"))
      .as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[TransEvent],
         state: GroupState[TransState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            if (st != null) out += Transition(st.lastType, e.event_type)
            st = TransState(e.ts_ms, e.event_id, e.event_type)
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
      .toDF()
  }

  /** Declarative gap-session aggregation via `session_window` — the
    * engine-managed alternative to the [[runningSessions]]
    * mapGroupsWithState form: the state store merges/extends session
    * windows per (user, window) and the watermark finalizes them.
    *
    * Exact parity with the batch `events_sessionize`: the batch query
    * splits on `gap > 30min` over millisecond-floored times, while
    * `session_window` splits on `gap >= window` (its range is
    * end-exclusive). Feeding ms-floored event time with a window of
    * 30min + 1ms makes the two predicates identical — without this, two
    * events exactly 30:00.000 apart land in one batch session but two
    * streaming sessions.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts_ms", timestamp_millis(
        tsMs))
      .withWatermark("event_ts_ms", "2 hours")
      .groupBy(col("user_id"),
        session_window(col("event_ts_ms"), "1800001 milliseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_millis(col("event_ts_ms"))).as("end_ms"),
        dsum(events.sparkSession, col("value")).as("sum_value"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("start_ms"),
        col("n_events"), col("end_ms"), col("sum_value"))

  /** Streaming exact dedup with bounded state: duplicates of `idCols`
    * arriving within the watermark horizon are dropped; state for keys
    * older than the watermark is evicted (the streaming form of the
    * pipeline's exact-dedup stage — state is O(keys per horizon), not
    * O(stream)).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      delay: String, idCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Streaming scan of the documents parquet — the ingest side of the
    * dedup-at-ingest ops below. Same single-file delivery note as
    * [[readEvents]]; unlike the session ops, the two registry ops are
    * batch-INVARIANT (pair emission happens when the later element
    * arrives, against registry state or in-batch predecessors — any
    * partitioning of the corpus into microbatches yields the same
    * output, which [[graft.StreamingSpec]] pins with a two-batch
    * MemoryStream delivery).
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.ops.Tables(spark, dir).documents.schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  final case class ChunkArrival(chunk: Int, ck: Long, doc_id: Long,
      sig: Long)
  final case class NearDupPair(id1: Long, id2: Long, hamming: Int)

  /** Streaming NEAR-DUP dedup-at-ingest: a SimHash band registry in
    * keyed state. Each document's 64-bit SimHash splits into four
    * 16-bit chunks (the same complete-for-Hamming≤3 banding as the
    * batch `dedup_simhash` — pigeonhole: ≤3 flipped bits leave ≥1 chunk
    * intact); the stream is keyed by (chunk, chunk-value) and state
    * holds the bucket's registry of (doc_id, sig) — 16 bytes per doc
    * per band, sharded across the state store by bucket key. An
    * arriving doc compares against its bucket's registry plus in-batch
    * predecessors ONLY (the LSH contract: work per arrival = bucket
    * occupancy, never corpus size) and emits verified pairs at
    * Hamming ≤ 3. Cross-band exactly-once without coordination: a pair
    * emits only in its FIRST shared zero chunk, computable in-group
    * from the two signatures alone.
    *
    * Scale: state is O(corpus × 4) longs, distributed by bucket key —
    * the registry IS the product at ingest (it must know everything
    * seen to dedup against it); an unbounded stream would bound it with
    * a retention policy (registry TTL = the dedup horizon). Output
    * equals the batch pair set for ANY microbatch delivery.
    */
  def simhashIngestPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    def firstZeroChunk(x: Long): Int =
      (0 until 4).find(c => ((x >>> (c * 16)) & 0xFFFFL) == 0L).getOrElse(-1)
    docs
      .select(col("doc_id"),
        graft.functions.functions.simhash64(
          split(col("text"), " ")).as("sig"))
      .select(
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("sig"), c * 16)
            .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("chunk", "ck")),
        col("doc_id"), col("sig"))
      .as[ChunkArrival]
      .groupByKey(a => (a.chunk, a.ck))
      .flatMapGroupsWithState[Array[(Long, Long)], NearDupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case ((chunk, _), rows, state) =>
          // sort within the batch so in-batch pair order is
          // deterministic; across batches arrival order is irrelevant
          // (min/max normalization + the first-zero-chunk rule)
          val arrivals = rows.map(a => (a.doc_id, a.sig)).toArray
            .sortBy(_._1)
          val registry = state.getOption.getOrElse(Array.empty[(Long, Long)])
          val out = Seq.newBuilder[NearDupPair]
          var seen = registry
          arrivals.foreach { case (id, sig) =>
            seen.foreach { case (oid, osig) =>
              val x = osig ^ sig
              val hamming = java.lang.Long.bitCount(x)
              if (hamming <= 3 && firstZeroChunk(x) == chunk)
                out += NearDupPair(math.min(id, oid), math.max(id, oid),
                  hamming)
            }
            seen = seen :+ ((id, sig))
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF()
  }

  /** Streaming scan of the embeddings parquet — same delivery notes as
    * [[readDocuments]].
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.ops.Tables(spark, dir).embeddings.schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
  }

  final case class VecArrival(tb: Int, bkt: Long, vec_id: Long,
      q: Array[Long], nn: Long, bkts: Array[Long])
  final case class VecEntry(vec_id: Long, q: Array[Long], nn: Long,
      bkts: Array[Long])
  final case class EmbDupPair(id1: Long, id2: Long, cos: Double)

  /** Streaming EMBEDDING dedup-at-ingest (SemDeDup's decision applied
    * online): the batch `dedup_embedding` pipeline — quantize to
    * integers, 16×4 OR-amplified integer-hyperplane LSH, exactly-once
    * emission from the FIRST shared table, exact quantized-cosine
    * verify at 0.45 — as a bucket-keyed registry. Every stage of the
    * bucketing is integer-deterministic, so the streaming pair set
    * equals the batch pair set for ANY microbatch delivery, and the
    * cosine arithmetic (exact Long dot + the same double sqrt/divide,
    * zero-norm guarded) is bit-identical to the batch expression and
    * the DuckDB oracle.
    *
    * Scale: state per bucket holds the quantized vectors of its
    * members — the exact-verify registry is O(corpus × dims) ints,
    * sharded by (table, bucket) key; per-arrival work = bucket
    * occupancy × dims (the LSH contract). A production registry
    * compresses entries to PQ codes (8-16 B/vector, `sim_ann_pq`'s
    * tradeoff measured batch-side) — kept exact here because the
    * correctness gate verifies true cosine, and the honest cost of
    * exact-verify-at-ingest is precisely this state.
    */
  def embeddingIngestPairs(spark: SparkSession, embs: DataFrame)
      : DataFrame = {
    import spark.implicits._
    val L = 16
    val b = 4
    val threshold = 0.45
    val F = graft.functions.functions
    embs
      .select(col("vec_id"), F.quantize1000(col("embedding")).as("q"))
      .withColumn("nn",
        aggregate(transform(col("q"), x => x * x), lit(0L), (a, x) => a + x))
      .withColumn("bkts", F.lsh_buckets(col("q"), L, b))
      .select(posexplode(col("bkts")).as(Seq("tb", "bkt")),
        col("vec_id"), col("q"), col("nn"), col("bkts"))
      .as[VecArrival]
      .groupByKey(a => (a.tb, a.bkt))
      .flatMapGroupsWithState[Array[VecEntry], EmbDupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case ((tb, _), rows, state) =>
          // exact Long dot + the SAME double ops as the batch quant_dot
          // cast/sqrt/divide — bit-identical cosine
          def cos(x: VecEntry, y: VecEntry): Double =
            if (x.nn == 0L || y.nn == 0L) 0.0
            else {
              val n = math.min(x.q.length, y.q.length)
              var dot = 0L
              var i = 0
              while (i < n) { dot += x.q(i) * y.q(i); i += 1 }
              dot.toDouble /
                (math.sqrt(x.nn.toDouble) * math.sqrt(y.nn.toDouble))
            }
          // the batch first_match rule: emit only in the first table
          // where the two bucket vectors collide — exactly-once across
          // the 16 tables without a candidate-distinct shuffle
          def firstShared(a: Array[Long], bv: Array[Long]): Int = {
            val n = math.min(a.length, bv.length)
            var i = 0
            while (i < n) { if (a(i) == bv(i)) return i; i += 1 }
            -1
          }
          val arrivals = rows
            .map(a => VecEntry(a.vec_id, a.q, a.nn, a.bkts)).toArray
            .sortBy(_.vec_id)
          val registry = state.getOption.getOrElse(Array.empty[VecEntry])
          val out = Seq.newBuilder[EmbDupPair]
          var seen = registry
          arrivals.foreach { v =>
            seen.foreach { o =>
              if (firstShared(v.bkts, o.bkts) == tb) {
                val c = cos(v, o)
                if (c >= threshold)
                  out += EmbDupPair(math.min(v.vec_id, o.vec_id),
                    math.max(v.vec_id, o.vec_id), c)
              }
            }
            seen = seen :+ v
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF()
  }

  final case class ServeCand(query_id: Long, vec_id: Long, cos: Double)
  final case class ServeHit(query_id: Long, vec_id: Long, cos: Double,
      rk: Int)

  /** ONLINE ANN SERVING: a stream of query vectors answered on arrival
    * against a static corpus — the retrieval half of a RAG/serving
    * deployment (the ingest half is the registry ops above). The static
    * index BROADCASTS into every microbatch (stream-static join, no
    * stream-side shuffle of the corpus); scoring is the exact
    * `quant_cosine` expression the batch `sim_topk_bruteforce` uses,
    * and the per-query top-k finalizes IN the query's own microbatch —
    * every candidate row of a query is generated from the query's own
    * arrival, so the answer is complete and final by construction,
    * under any delivery. One boolean of state per answered query
    * guards against source re-delivery (at-least-once input →
    * exactly-once answers).
    *
    * Scale: brute-force scoring is the honest serving baseline (the
    * batch side carries the IVF/PQ/LSH variants with measured recall);
    * the broadcast corpus is the index shard a real deployment
    * partitions — queries fan out to shards and a top-k merge combines,
    * which is this same operator with a two-level topk.
    */
  def annServeTopk(spark: SparkSession, queries: DataFrame,
      corpus: DataFrame, k: Int = 5): DataFrame = {
    import spark.implicits._
    val qs = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    qs.crossJoin(broadcast(corpus.select(col("vec_id"), col("embedding"))))
      .select(col("query_id"), col("vec_id"),
        graft.functions.functions
          .quant_cosine(col("qe"), col("embedding")).as("cos"))
      .as[ServeCand]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState[Boolean, ServeHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (qid, rows, state) =>
          // re-delivered query: already answered, emit nothing
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.toArray.sortBy(c => (-c.cos, c.vec_id)).take(k)
              .zipWithIndex.map { case (c, i) =>
                ServeHit(qid, c.vec_id, c.cos, i + 1)
              }.iterator
          }
      }
      .toDF()
  }

  final case class DigestArrival(digest: String, doc_id: Long)
  final case class IngestVerdict(doc_id: Long, keep_id: Long, is_dup: Long)

  /** Streaming EXACT dedup-at-ingest: the keeper registry keyed by text
    * digest, emitting the routing DECISION a pipeline applies at ingest
    * (keeper → corpus, duplicate → quarantine with its keeper id).
    * State per distinct digest is ONE long — the keeper — so the
    * registry is O(unique corpus), sharded by digest across the state
    * store; each arrival costs one state lookup, no joins, no shuffle
    * beyond the digest partitioning.
    *
    * SINGLE-MICROBATCH PRECONDITION (as [[readEvents]]): the keeper is
    * first-arrival; the min-doc_id oracle equates the two because one
    * batch is sorted by doc_id in-group. A multi-batch delivery keeps
    * the op exactly-once and deterministic, but the keeper becomes
    * arrival order — restate the oracle if the delivery changes.
    */
  def exactIngestVerdicts(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(md5(col("text")).as("digest"), col("doc_id"))
      .as[DigestArrival]
      .groupByKey(_.digest)
      .flatMapGroupsWithState[Long, IngestVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val arrivals = rows.map(_.doc_id).toArray.sorted
          val keeper = state.getOption.getOrElse(arrivals.head)
          state.update(keeper)
          arrivals.iterator.map(id =>
            IngestVerdict(id, keeper, if (id == keeper) 0L else 1L))
      }
      .toDF()
  }

  /** Stream-stream inner join with an event-time range condition — the
    * join-state surface of Structured Streaming (the earlier parity rows
    * cover aggregates, session windows, keyed state, and dedup; this is
    * the remaining stateful operator family). Both sides carry a
    * watermark and the range condition bounds how long click state must
    * be retained: state per key is O(events inside the watermark
    * horizon), the production contract for an unbounded stream. Inner
    * matches emit as soon as both rows have arrived (no finalization
    * hold-back), so over a finite source the sink holds exactly the
    * batch pair set.
    *
    * Event time is the MILLISECOND-floored timestamp — the batch
    * interval join compares epoch ms, and a µs-precision comparison
    * would disagree with it on sub-ms boundary pairs.
    */
  def intervalJoinStream(clicks: DataFrame, purchases: DataFrame,
      w: Long): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"),
        timestamp_millis(col("ts_ms")).as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        timestamp_millis(col("ts_ms")).as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p, col("c_user") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $w MILLISECOND"))
  }

  /** Stream-stream LEFT OUTER join with the same event-time range
    * condition as [[intervalJoinStream]] — the outer variant exercises
    * the join-state EVICTION path the inner join never does: an
    * unmatched click emits its null-extended row only when the joint
    * watermark (min over both sides) passes the end of its join window
    * (click_ts + w), i.e. when no future purchase could still match.
    * Clicks whose window end is inside the final watermark horizon are
    * HELD BACK forever on a finite source — that held-back set is part
    * of the contract and the oracle recomputes it exactly, the same
    * discipline as events_session_timeout_stream's timeout rule.
    * Matched pairs emit as soon as both rows arrive, exactly the inner
    * join's pair set.
    */
  /** [[leftJoinStream]] generalized to FULL OUTER — both state stores
    * evict, with ASYMMETRIC boundaries that fall out of the half-open
    * range condition `purchase_ts in [click_ts, click_ts + w)`:
    * an unmatched click null-extends when `click_ts + w <= watermark`
    * (every admissible purchase is strictly below the window end, so a
    * window ending AT the watermark is closed), while an unmatched
    * purchase needs `purchase_ts < watermark` STRICTLY (a click with
    * ts equal to the watermark is still admissible — not late — and
    * `click_ts = purchase_ts` matches, so a purchase AT the watermark
    * must stay in state). Both boundaries are pinned by the planted
    * StreamingSpec eviction test; each side's held-back tail is
    * recomputed exactly by the oracle.
    */
  def fullJoinStream(clicks: DataFrame, purchases: DataFrame,
      w: Long): DataFrame =
    joinStream(clicks, purchases, w, "full_outer")

  def leftJoinStream(clicks: DataFrame, purchases: DataFrame,
      w: Long): DataFrame =
    joinStream(clicks, purchases, w, "left_outer")

  private def joinStream(clicks: DataFrame, purchases: DataFrame,
      w: Long, joinType: String): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"),
        timestamp_millis(col("ts_ms")).as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        timestamp_millis(col("ts_ms")).as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p, col("c_user") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $w MILLISECOND"),
      joinType)
  }

  /** Explicit override for the state-store partition count of the
    * streaming ops; when unset it is DERIVED from input size (see
    * [[statePartitionsFor]]). A production deployment sets this to its
    * measured key cardinality / state-size target.
    */
  val StatePartitionsKey = "spark.graft.streamStatePartitions"

  /** Input bytes per state-store partition when deriving the count. */
  val StateChunkKey = "spark.graft.streamState.chunkBytes"
  val DefaultStateChunkBytes: Long = 32L * 1024 * 1024

  /** Scale-derived state-store partition count: `min(shuffle.partitions,
    * ceil(inputBytes / chunk))`. Structured Streaming fixes the state
    * partition count at `spark.sql.shuffle.partitions` when the query
    * first starts; with the harness setting that to the CORE count, toy
    * inputs paid per-partition state-store commit/maintenance overhead on
    * EVERY microbatch for partitions holding a handful of keys (driver
    * r10 at 32 cores: events_fulljoin_stream 10.2 s vs 3.1 s at 8 — the
    * family is fixed-cost bound, guide §2.2). State must scale with KEYS,
    * not cores: deriving the count from input bytes gives few stores on
    * toy data and `shuffle.partitions` (the deployment's own sizing) once
    * the input spans `chunk` bytes per partition — at 100 TB the derived
    * value saturates the cap, so no production parallelism is lost.
    */
  private[graft] def statePartitionsFor(spark: SparkSession, dir: String,
      table: String): Int =
    spark.conf.getOption(StatePartitionsKey).map(_.toInt).getOrElse {
      val (bytes, _) =
        graft.ops.Tables.dataSize(spark, s"$dir/$table.parquet")
      val chunk = spark.conf
        .get(StateChunkKey, DefaultStateChunkBytes.toString).toLong
      val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
      math.max(1L, math.min(cap.toLong, (bytes + chunk - 1) / chunk)).toInt
    }

  /** Run a streaming DataFrame to completion against the (finite) file
    * source and return the memory-sink table. NOTE: in Update mode the
    * memory sink appends each microbatch's updated rows — with multiple
    * microbatches the table holds superseded versions of a key; callers
    * needing latest-only must dedup (or run a single batch, as the specs
    * do).
    *
    * `statePartitions > 0` pins `spark.sql.shuffle.partitions` for the
    * DURATION OF THE STREAM only (state-store count is fixed at query
    * start from that conf; restored before the post-materialization batch
    * ops run). Results are partition-count-independent: state is keyed,
    * every declared query re-sorts after materialization.
    */
  def runToMemory(
      df: DataFrame, name: String, mode: OutputMode,
      statePartitions: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    if (statePartitions > 0)
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }

  /** Driver-contract surface: the streaming hourly aggregate materialized
    * through the memory sink and checked against the SAME DuckDB oracle as
    * the batch `events_hourly` — streaming/batch parity is part of the
    * correctness gate, not just a spec. Complete mode: the file source is
    * finite, so the final microbatch's table IS the full aggregate (append
    * mode would hold back the unfinalized tail windows forever). The
    * windowed TimestampType start is converted to the batch query's
    * hour_bucket long — a derived timestamp column must never reach the
    * oracle compare (INT96/ns parquet schema mismatch).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly_stream" -> { (s, d) =>
      val res = runToMemory(hourlyCounts(readEvents(s, d)),
        "events_hourly_stream_sink", OutputMode.Complete(),
        statePartitionsFor(s, d, "events"))
      res
        .select(
          expr(graft.ops.EventOps.floorDivSql(
            "unix_millis(win_start)", 3600000L)).as("hour_bucket"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_bucket", "event_type")
    },
    // Second streaming parity row: engine-managed session_window
    // aggregation materialized and checked against the SAME oracle as the
    // batch gap-sessionization. The finalized sessions come out of the
    // state store keyed by (user, window); the batch-side session_idx
    // (ordinal per user) is attached after materialization with a
    // rank window over the (tiny) finished-session table.
    "events_sessionize_stream" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val res = runToMemory(sessionWindows(readEvents(s, d)),
        "events_sessionize_stream_sink", OutputMode.Complete(),
        statePartitionsFor(s, d, "events"))
      val w = Window.partitionBy("user_id").orderBy(col("start_ms").asc)
      res
        .withColumn("session_idx", row_number().over(w).cast("long"))
        .select("user_id", "session_idx", "n_events", "start_ms", "end_ms",
          "sum_value")
        .orderBy("user_id", "session_idx")
    },
    // Third streaming parity row: the mapGroupsWithState funnel machine.
    // Each user's emission carries its CURRENT stage flags; the single
    // events file arrives as one microbatch, so the sink holds exactly one
    // (final) emission per user and the flag counts equal the batch funnel.
    // (Multi-batch arrival would leave superseded per-user rows in the
    // Update-mode memory sink — a latest-per-user dedup would be needed;
    // documented at [[runToMemory]].)
    "events_funnel_stream" -> { (s, d) =>
      val res = runToMemory(funnelStages(s, readEvents(s, d)),
        "events_funnel_stream_sink", OutputMode.Update(),
        statePartitionsFor(s, d, "events"))
      res.agg(count(lit(1)).as("n_users"),
        count_if(col("has_view")).as("n_view"),
        count_if(col("view_click")).as("n_view_click"),
        count_if(col("complete")).as("n_funnel_complete"))
    },
    // Fourth streaming parity row (r5): the watermark-bounded exact-dedup
    // operator itself, oracle-gated. Duplicates are planted by keying on
    // event_id % 1000 (10 events per key at sf0.01); the streaming
    // dropDuplicatesWithinWatermark must emit each key EXACTLY once for
    // the compare to pass — emitting only the key makes the result
    // independent of WHICH duplicate survived (arrival order is not
    // deterministic across partitions), so the oracle checks the dedup
    // semantics, not an incidental row choice. No post-materialization
    // distinct: if the streaming dedup under-dropped, duplicate keys
    // reach the compare and fail loudly.
    "events_dedup_stream" -> { (s, d) =>
      val keyed = readEvents(s, d)
        .withColumn("k", col("event_id") % 1000)
      val deduped = dedupWithinWatermark(keyed, "event_ts", "48 hours",
        Seq("k")).select("k")
      runToMemory(deduped, "events_dedup_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "events"))
        .orderBy("k")
    },
    // Fifth streaming parity row (r6): keyed-state transition pairing
    // (flatMapGroupsWithState in Append mode) feeding a downstream
    // streaming aggregate — the one stateful-op composition the earlier
    // rows don't exercise. Complete mode: the finite source's final
    // microbatch table is the full count matrix; the row-normalized p
    // is attached post-materialization with a window over the tiny
    // |types|^2 result, exactly as the batch query computes it.
    "events_transition_stream" -> { (s, d) =>
      val counts = transitionEmissions(s, readEvents(s, d))
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
      val res = runToMemory(counts, "events_transition_stream_sink",
        OutputMode.Complete(),
        statePartitionsFor(s, d, "events"))
      res
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("event_type")).cast("double"))
        .orderBy("event_type", "next_type")
    },
    // Sixth streaming parity row: the APPEND path — the mode a production
    // job actually runs, where a window emits exactly once, when the
    // watermark passes its end, and never again. The Complete-mode row
    // (events_hourly_stream) checks the aggregate values; this row checks
    // the FINALIZATION RULE itself: the sink must hold exactly the
    // windows whose end <= final watermark (max event time - 2h), with
    // the unfinalized tail held back. The oracle recomputes that closed
    // set from the batch table — window end vs max(ts) - delay, pure
    // integer ms arithmetic.
    "events_hourly_closed_stream" -> { (s, d) =>
      val res = runToMemory(hourlyCounts(readEvents(s, d)),
        "events_hourly_closed_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "events"))
      res
        .select(
          expr(graft.ops.EventOps.floorDivSql(
            "unix_millis(win_start)", 3600000L)).as("hour_bucket"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_bucket", "event_type")
    },
    // Seventh streaming parity row: the stream-stream time-range join,
    // checked against the SAME oracle as the batch events_interval_join
    // (which states the semantics in the naive non-equi form). Inner
    // join: every matched pair emits exactly once, so the Append-mode
    // sink over the finite source IS the batch pair set — no
    // finalization subtlety, the parity claim is total.
    "events_interval_stream" -> { (s, d) =>
      val ev = readEvents(s, d).withColumn("ts_ms",
        tsMs)
      val joined = intervalJoinStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        w = 1800000L)
      runToMemory(joined, "events_interval_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "events"))
        .select(col("click_id"), col("purchase_id"),
          (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
            .as("delta_ms"))
        .orderBy("click_id", "purchase_id")
    },
    // Stream-static enrichment join — the remaining streaming JOIN shape
    // next to the stream-stream interval join: the event stream enriched
    // against the static customer dimension (user_id → nation), then
    // windowed per nation. The static side is a plain batch DataFrame;
    // Spark plans the join STATELESS (each microbatch hash/broadcast-
    // joins against the dimension — no join state store, no watermark
    // needed on the dimension), which is why enrich-then-aggregate is
    // the production shape for dimension lookups at any scale. Checked
    // against the equivalent batch join's DuckDB oracle.
    "events_enrich_stream" -> { (s, d) =>
      val cust = graft.ops.Tables(s, d).customer
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))
      val enriched = readEvents(s, d)
        .withWatermark("event_ts", "2 hours")
        .join(cust, "user_id")
        .groupBy(window(col("event_ts"), "1 hour"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(s, col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("c_nationkey"),
          col("n"), col("sum_value"))
      runToMemory(enriched, "events_enrich_stream_sink",
          OutputMode.Complete(),
        statePartitionsFor(s, d, "events"))
        .select(
          expr(graft.ops.EventOps.floorDivSql(
            "unix_millis(win_start)", 3600000L)).as("hour_bucket"),
          col("c_nationkey"), col("n"), col("sum_value"))
        .orderBy("hour_bucket", "c_nationkey")
    },
    // Ninth streaming parity row: SLIDING windows — each event fans out
    // to its two containing 2h/1h windows in the state store. The oracle
    // restates the fan-out in batch form (each event contributes to
    // window starts hb−1 and hb), so the window-assignment arithmetic
    // itself is what's gated, values included (exact-sum contract).
    "events_sliding_stream" -> { (s, d) =>
      val res = runToMemory(slidingCounts(readEvents(s, d)),
        "events_sliding_stream_sink", OutputMode.Complete(),
        statePartitionsFor(s, d, "events"))
      res
        .select(
          expr(graft.ops.EventOps.floorDivSql(
            "unix_millis(win_start)", 3600000L)).as("win_hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_hour", "event_type")
    },
    // Tenth streaming parity row: the streaming-preagg + batch-serve
    // TOP-K composition — chained aggregations (counts, then rank) are
    // unsupported inside one streaming query, so the production shape is
    // the stream maintaining the windowed count table in the state store
    // and the serving layer ranking the (day x type)-sized sink — the
    // materialized-view pattern every "trending now" dashboard runs. The
    // oracle states the whole composition in batch form, so what's gated
    // is that the split computes EXACTLY the one-query batch semantics.
    "events_topk_stream" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = readEvents(s, d)
        .withWatermark("event_ts", "2 hours")
        .groupBy(window(col("event_ts"), "24 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"))
      val res = runToMemory(daily, "events_topk_stream_sink",
        OutputMode.Complete(),
        statePartitionsFor(s, d, "events"))
      val w = Window.partitionBy("day")
        .orderBy(col("n").desc, col("event_type").asc)
      res
        .select(expr(graft.ops.EventOps.floorDivSql(
          "unix_millis(win_start)", 86400000L)).as("day"),
          col("event_type"), col("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("day", "rk", "event_type", "n")
        .orderBy("day", "rk")
    },
    // Eleventh streaming parity row: EVENT-TIME TIMEOUT — the state-store
    // mechanism none of the other rows exercise. Sessions (30-min gap)
    // emit through TWO paths a production session job has: (a) closed
    // WITHIN a batch because a later same-user event follows, emitted
    // immediately; (b) the user's open tail session, held in state with
    // setTimeoutTimestamp(last + gap) and emitted by the TIMEOUT callback
    // when the watermark passes it — which for this finite source happens
    // in the trailing no-data microbatch (noDataMicroBatches), with
    // Spark's strict predicate timeoutTs < watermark. Tail sessions
    // within 2h+gap of stream end therefore NEVER emit — that held-back
    // set is part of the contract and the oracle recomputes it exactly:
    // emitted iff (not the user's last session) or
    // last_ms + gap < max_ms − 2h.
    "events_session_timeout_stream" -> { (s, d) =>
      val res = runToMemory(timeoutSessions(s, readEvents(s, d)),
        "events_session_timeout_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "events"))
      res.orderBy("user_id", "start_ms")
    },
    // Twelfth streaming parity row: stream-stream LEFT OUTER join —
    // the state-EVICTION emission path (null-extended rows fire when
    // the joint watermark passes the join-window end; the trailing
    // no-data microbatch drives it on this finite source). Matched
    // pairs must equal events_interval_stream's set exactly; the
    // held-back unmatched tail is recomputed by the oracle.
    "events_leftjoin_stream" -> { (s, d) =>
      val ev = readEvents(s, d).withColumn("ts_ms", tsMs)
      val joined = leftJoinStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        w = 1800000L)
      runToMemory(joined, "events_leftjoin_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "events"))
        .select(col("click_id"), col("purchase_id"),
          (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
            .as("delta_ms"))
        .orderBy("click_id", "purchase_id")
    },
    // Thirteenth streaming parity row: FULL OUTER stream-stream join —
    // BOTH state stores evict, with ASYMMETRIC boundaries (left <=,
    // right strict < — see the fullJoinStream scaladoc and the planted
    // StreamingSpec eviction test that pins both). Matched pairs = the
    // inner set; both held-back tails recomputed by the oracle.
    "events_fulljoin_stream" -> { (s, d) =>
      val ev = readEvents(s, d).withColumn("ts_ms", tsMs)
      val joined = fullJoinStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        w = 1800000L)
      runToMemory(joined, "events_fulljoin_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "events"))
        .select(col("click_id"), col("purchase_id"),
          (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
            .as("delta_ms"))
        .orderBy("click_id", "purchase_id")
    },
    // dedup-at-ingest, near-dup: the SimHash band registry. Output =
    // the batch dedup_simhash pair set (same oracle, verbatim) — the
    // streaming form is what a 100 TB corpus build actually runs:
    // documents dedup against everything already ingested as they
    // arrive, with per-arrival work bounded by bucket occupancy
    "dedup_simhash_stream" -> { (s, d) =>
      runToMemory(simhashIngestPairs(s, readDocuments(s, d)),
        "dedup_simhash_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "documents"))
        .orderBy("id1", "id2")
    },
    // dedup-at-ingest, exact: the digest keeper registry emitting the
    // per-document routing decision (keep vs quarantine + keeper id)
    "dedup_ingest_stream" -> { (s, d) =>
      runToMemory(exactIngestVerdicts(s, readDocuments(s, d)),
        "dedup_ingest_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "documents"))
        .orderBy("doc_id")
    },
    // dedup-at-ingest, embeddings: the LSH-bucketed quantized-vector
    // registry — output = the batch dedup_embedding pair set (same
    // oracle, verbatim), emitted online as vectors arrive
    "dedup_embedding_stream" -> { (s, d) =>
      runToMemory(embeddingIngestPairs(s, readEmbeddings(s, d)),
        "dedup_embedding_stream_sink", OutputMode.Append(),
        statePartitionsFor(s, d, "embeddings"))
        .orderBy("id1", "id2")
    },
    // online ANN serving: the query-vector stream (vec_id < 10, the
    // batch convention) answered on arrival against the static corpus;
    // oracle = the batch sim_topk_bruteforce SQL verbatim
    // NOT byte-derived (measured r11: 1.4 s -> 3.4 s with the derived
    // count): the brute-force scoring fan-out makes per-key work huge
    // relative to input bytes, so the bytes proxy starves the topk stage;
    // the session default (the deployment's own shuffle sizing) is right
    // here. The explicit spark.graft.streamStatePartitions override still
    // applies through the session conf at query start.
    "sim_ann_serve_stream" -> { (s, d) =>
      import org.apache.spark.sql.functions.col
      runToMemory(annServeTopk(s,
          readEmbeddings(s, d).filter(col("vec_id") < 10),
          graft.ops.Tables(s, d).embeddings.filter(col("vec_id") >= 10)),
        "sim_ann_serve_stream_sink", OutputMode.Append())
        .orderBy("query_id", "rk")
    }
  )

  /** Identical to the batch oracles — that IS the point. */
  def oracles: Map[String, String] = Map(
    // the batch dedup_simhash oracle, VERBATIM — streaming/batch parity
    // for the near-dup registry (exactly-once across bands and batches)
    "dedup_simhash_stream" -> graft.ops.DedupOps.oracles("dedup_simhash"),
    // the batch dedup_embedding oracle, VERBATIM — the integer
    // bucketing and exact quantized cosine are delivery-independent
    "dedup_embedding_stream" ->
      graft.ops.DedupOps.oracles("dedup_embedding"),
    // the batch sim_topk_bruteforce oracle, VERBATIM — same scoring
    // expression, same (cos DESC, vec_id ASC) rank tiebreak
    "sim_ann_serve_stream" ->
      graft.ops.SimilarityOps.oracles("sim_topk_bruteforce"),
    // keeper = min doc_id per digest group (equals first-arrival under
    // the single-microbatch sorted-in-group delivery — see the op doc)
    "dedup_ingest_stream" ->
      """WITH k AS (SELECT doc_id, md5(text) AS dg FROM documents),
        |m AS (SELECT dg, min(doc_id) AS keep_id FROM k GROUP BY dg)
        |SELECT doc_id, keep_id,
        |  CAST(CASE WHEN doc_id = keep_id THEN 0 ELSE 1 END AS BIGINT)
        |    AS is_dup
        |FROM k JOIN m USING (dg) ORDER BY doc_id""".stripMargin,
    "events_hourly_stream" ->
      s"""SELECT epoch_ms(ts) // 3600000 AS hour_bucket, event_type,
         |  count(*) AS n, ${graft.ops.Oracle.sqlSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type"""
        .stripMargin,
    // the batch events_sessionize oracle, verbatim
    "events_sessionize_stream" ->
      s"""WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms
         |           FROM events),
         |f AS (SELECT *,
         |    CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id
         |        ORDER BY ts_ms ASC, event_id ASC) IS NULL
         |      OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
         |        ORDER BY ts_ms ASC, event_id ASC) > 1800000
         |    THEN 1 ELSE 0 END AS new_session
         |  FROM e),
         |g AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts_ms ASC, event_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |  FROM f)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |  count(*) AS n_events, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
         |  ${graft.ops.Oracle.sqlSum("value")} AS sum_value
         |FROM g GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,
    // the batch events_funnel oracle, verbatim
    "events_funnel_stream" ->
      """WITH m AS (SELECT user_id,
        |    min(epoch_ms(ts)) FILTER (WHERE event_type = 'view') AS t_view,
        |    min(epoch_ms(ts)) FILTER (WHERE event_type = 'click') AS t_click,
        |    min(epoch_ms(ts)) FILTER (WHERE event_type = 'purchase')
        |      AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users, count(t_view) AS n_view,
        |  count(*) FILTER (WHERE t_click > t_view) AS n_view_click,
        |  count(*) FILTER (WHERE t_click > t_view AND t_purchase > t_click)
        |    AS n_funnel_complete
        |FROM m""".stripMargin,
    // one row per planted key — any under-drop shows up as extra rows
    "events_dedup_stream" ->
      """SELECT DISTINCT event_id % 1000 AS k FROM events ORDER BY k""",
    // the batch events_transition_matrix oracle, verbatim
    "events_transition_stream" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ms(ts) AS ts_ms FROM events),
        |t AS (SELECT event_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC)
        |    AS next_type FROM e),
        |c AS (SELECT event_type, next_type, count(*) AS n FROM t
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n, CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
        |FROM c ORDER BY event_type, next_type""".stripMargin,
    // the batch hourly aggregate RESTRICTED to closed windows: end <=
    // final watermark (max event time - 2h). The µs-precision watermark
    // reduces to this ms comparison exactly (window ends are ms
    // multiples, so the sub-ms fraction can never flip the inequality).
    "events_hourly_closed_stream" ->
      s"""WITH wm AS (SELECT max(epoch_ms(ts)) - 7200000 AS w FROM events),
         |h AS (SELECT epoch_ms(ts) // 3600000 AS hour_bucket, event_type,
         |    count(*) AS n, ${graft.ops.Oracle.sqlSum("value")} AS sum_value
         |  FROM events GROUP BY 1, 2)
         |SELECT hour_bucket, event_type, n, sum_value FROM h, wm
         |WHERE (hour_bucket + 1) * 3600000 <= w
         |ORDER BY hour_bucket, event_type""".stripMargin,
    // the batch events_interval_join oracle, verbatim — the streaming
    // inner join must produce the identical pair set
    "events_interval_stream" ->
      """WITH c AS (SELECT user_id, event_id AS click_id,
        |    epoch_ms(ts) AS click_ms
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |    epoch_ms(ts) AS purchase_ms
        |  FROM events WHERE event_type = 'purchase')
        |SELECT click_id, purchase_id, purchase_ms - click_ms AS delta_ms
        |FROM c JOIN p USING (user_id)
        |WHERE purchase_ms >= click_ms AND purchase_ms < click_ms + 1800000
        |ORDER BY click_id, purchase_id""".stripMargin,
    // the inner pair set UNION the evicted-unmatched clicks: a click
    // emits null-extended iff it has no match AND its join-window end
    // (click_ms + w) is at or below the joint final watermark
    // (min(max click, max purchase) − 2h) — clicks nearer the stream
    // end are held back forever on a finite source
    "events_leftjoin_stream" ->
      """WITH c AS (SELECT user_id, event_id AS click_id,
        |    epoch_ms(ts) AS click_ms
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |    epoch_ms(ts) AS purchase_ms
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(click_ms) FROM c),
        |    (SELECT max(purchase_ms) FROM p)) - 7200000 AS w),
        |m AS (SELECT click_id, purchase_id,
        |    purchase_ms - click_ms AS delta_ms
        |  FROM c JOIN p USING (user_id)
        |  WHERE purchase_ms >= click_ms
        |    AND purchase_ms < click_ms + 1800000),
        |u AS (SELECT click_id, CAST(NULL AS BIGINT) AS purchase_id,
        |    CAST(NULL AS BIGINT) AS delta_ms
        |  FROM c, wm
        |  WHERE click_id NOT IN (SELECT click_id FROM m)
        |    AND click_ms + 1800000 <= wm.w)
        |SELECT * FROM m UNION ALL SELECT * FROM u
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,
    // the left oracle plus the RIGHT eviction rule: an unmatched
    // purchase null-extends once the watermark STRICTLY passes
    // purchase_ms — strict because the range condition admits
    // click_ts = purchase_ts, and a click with ts equal to the
    // watermark is still admissible (not late), so a purchase AT the
    // watermark could still match; the left side's click window
    // [click_ts, click_ts+w) is half-open, so ITS boundary is <=.
    // Both boundaries pinned by StreamingSpec's planted eviction test.
    "events_fulljoin_stream" ->
      """WITH c AS (SELECT user_id, event_id AS click_id,
        |    epoch_ms(ts) AS click_ms
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |    epoch_ms(ts) AS purchase_ms
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(click_ms) FROM c),
        |    (SELECT max(purchase_ms) FROM p)) - 7200000 AS w),
        |m AS (SELECT click_id, purchase_id,
        |    purchase_ms - click_ms AS delta_ms
        |  FROM c JOIN p USING (user_id)
        |  WHERE purchase_ms >= click_ms
        |    AND purchase_ms < click_ms + 1800000),
        |lu AS (SELECT click_id, CAST(NULL AS BIGINT) AS purchase_id,
        |    CAST(NULL AS BIGINT) AS delta_ms
        |  FROM c, wm
        |  WHERE click_id NOT IN (SELECT click_id FROM m)
        |    AND click_ms + 1800000 <= wm.w),
        |ru AS (SELECT CAST(NULL AS BIGINT) AS click_id, purchase_id,
        |    CAST(NULL AS BIGINT) AS delta_ms
        |  FROM p, wm
        |  WHERE purchase_id NOT IN (SELECT purchase_id FROM m)
        |    AND purchase_ms < wm.w)
        |SELECT * FROM m UNION ALL SELECT * FROM lu UNION ALL
        |SELECT * FROM ru
        |ORDER BY click_id NULLS FIRST, purchase_id NULLS FIRST"""
        .stripMargin,
    // the equivalent batch enrichment join, hour-bucketed per nation
    "events_enrich_stream" ->
      s"""SELECT epoch_ms(ts) // 3600000 AS hour_bucket, c_nationkey,
         |  count(*) AS n, ${graft.ops.Oracle.sqlSum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY hour_bucket, c_nationkey""".stripMargin,
    // the sliding fan-out restated in batch form: an event in hour hb
    // belongs to the 2h windows starting at hb-1 and hb
    "events_sliding_stream" ->
      s"""WITH e AS (SELECT event_type, value,
         |    epoch_ms(ts) // 3600000 AS hb FROM events),
         |w AS (SELECT event_type, value, hb - 1 AS win_hour FROM e
         |  UNION ALL SELECT event_type, value, hb FROM e)
         |SELECT win_hour, event_type, count(*) AS n,
         |  ${graft.ops.Oracle.sqlSum("value")} AS sum_value
         |FROM w GROUP BY 1, 2 ORDER BY win_hour, event_type""".stripMargin,
    // the whole preagg+rank composition as ONE batch query
    "events_topk_stream" ->
      """WITH daily AS (SELECT epoch_ms(ts) // 86400000 AS day, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT day, event_type, n, CAST(row_number() OVER (
        |    PARTITION BY day ORDER BY n DESC, event_type ASC) AS INT) AS rk
        |  FROM daily)
        |SELECT day, rk, event_type, n FROM r WHERE rk <= 3
        |ORDER BY day, rk""".stripMargin,
    // the gap-sessionization, then the EXACT emission rule: a session is
    // in the sink iff a later same-user session closed it in-batch, or
    // the final watermark (max_ms − 2h) STRICTLY passed last + gap
    // (Spark's timeout predicate is timeoutTs < watermark)
    "events_session_timeout_stream" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
        |  FROM events),
        |wm AS (SELECT max(ms) - 7200000 AS w FROM e),
        |f AS (SELECT *,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id
        |        ORDER BY ms ASC, event_id ASC) IS NULL
        |      OR ms - lag(ms) OVER (PARTITION BY user_id
        |        ORDER BY ms ASC, event_id ASC) > 1800000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ms ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |s AS (SELECT user_id, sid, count(*) AS n_events,
        |    min(ms) AS start_ms, max(ms) AS last_ms
        |  FROM g GROUP BY 1, 2),
        |h AS (SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid
        |  FROM s)
        |SELECT user_id, n_events, start_ms, last_ms FROM h, wm
        |WHERE sid < last_sid OR last_ms + 1800000 < w
        |ORDER BY user_id, start_ms""".stripMargin
  )
}
