package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Compressor, Routing, Throttler, Transforms}

/** Flow-actor capability surface (SURVEY §2.1-2.4): every reference
  * operator rendered as a relational query over the driver tables so the
  * DuckDB oracle can check it. The streaming renderings of the same
  * operators live in graft.streaming.
  */
object QueriesOps {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** documents as flow events: body = text bytes, meta = {lang, source}. */
  private def docEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("body"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))

  val defs: Seq[QueryDef] = Seq(

    // x/encoder_base64.go + x/decoder_base64.go round trip over the event
    // model: encode body, decode it back, emit the b64 form and the
    // recovered length. Narrow ops only — no shuffle.
    QueryDef("op_base64_roundtrip",
      (s, dir) => {
        val enc = Transforms.encodeBase64(docEvents(s, dir))
        val dec = Transforms.decodeBase64(enc)
        dec.select(col("doc_id"),
          col("status"),
          length(col("body").cast("string")).as("decoded_len"))
      },
      Some("""SELECT doc_id, 'DONE' AS status, length(text) AS decoded_len FROM documents""")),

    // decoder rejection path: feed it garbage that is not valid base64 —
    // rows must surface status INVALID with null body (dead-letter), the
    // Spark rendering of "message rejected" (x/decoder_base64.go:58-76).
    QueryDef("op_base64_reject",
      (s, dir) => {
        val bad = docEvents(s, dir)
          .withColumn("body",
            concat(lit("!!!not-base64@@@ "), col("body").cast("string")).cast("binary"))
        Transforms.decodeBase64(bad)
          .groupBy(col("status")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 'INVALID' AS status, COUNT(*) AS n FROM documents""")),

    // x/meta_parser.go:72-88: parse "k=v&k2=v2 <payload>" prefix into meta.
    // Round-trip oracle: parsing concat(type=..&uid=.. props) must recover
    // the original columns exactly.
    QueryDef("op_meta_parser",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_id"),
          concat(lit("type="), col("event_type"), lit("&uid="), col("user_id"),
            lit(" "), col("props")).cast("binary").as("body"),
          map().cast("map<string,string>").as("meta"))
        Transforms.parseMeta(ev)
          .select(col("event_id"),
            col("meta").getItem("type").as("m_type"),
            col("meta").getItem("uid").as("m_uid"),
            col("body").cast("string").as("body_str"))
      },
      Some("""SELECT event_id, event_type AS m_type, CAST(user_id AS VARCHAR) AS m_uid,
        props AS body_str FROM events""")),

    // core.router (router.go:67-76): route on meta key; unknown -> the
    // UNROUTABLE dead-letter branch. Routes stay disjoint and complete.
    QueryDef("op_router",
      (s, dir) => {
        val routes = Seq("click", "view", "purchase")
        val ev = t(s, dir, "events")
        Routing.annotateRoutes(ev, routes, col("event_type"))
          .groupBy(coalesce(col("route"), lit("__unroutable__")).as("route"), col("status"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      },
      Some("""SELECT CASE WHEN event_type IN ('click','view','purchase') THEN event_type
          ELSE '__unroutable__' END AS route,
        CASE WHEN event_type IN ('click','view','purchase') THEN 'DONE'
          ELSE 'UNROUTABLE' END AS status,
        COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2""")),

    // core.mux (mux.go:18-58): many-to-one fan-in = unionByName; arrival
    // order carries no meaning (tests compare unordered, SURVEY §2.6.4).
    QueryDef("op_mux",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.filter(col("event_type") === "click").withColumn("src", lit("clicks"))
        val b = ev.filter(col("event_type") === "error").withColumn("src", lit("errors"))
        Routing.mux(Seq(a, b)).select(col("src"), col("event_id"), col("user_id"))
      },
      Some("""SELECT 'clicks' AS src, event_id, user_id FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'errors' AS src, event_id, user_id FROM events WHERE event_type = 'error'""")),

    // core.replicator mode `each` (replicator.go:93-95): copy to all peers.
    QueryDef("op_replicator_each",
      (s, dir) => Routing.replicateEach(t(s, dir, "documents").select(col("doc_id")), 3)
        .select(col("doc_id"), col("copy_id").cast("long").as("copy_id")),
      Some("""SELECT doc_id, copy_id FROM documents, range(3) t(copy_id)""")),

    // core.replicator mode `fanout` (replicator.go:72-83): round-robin.
    // The operator rotates per-partition (order-free, scale-safe); for the
    // oracle we pin a single sorted partition so the rotation is the
    // classic deterministic row_number % k.
    QueryDef("op_replicator_fanout",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
          .repartition(1).sortWithinPartitions(col("doc_id"))
        Routing.replicateFanout(docs, 3)
          .select(col("doc_id"), col("copy_id").cast("long").as("copy_id"))
      },
      Some("""SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1) % 3 AS copy_id
        FROM documents""")),

    // core.replicator mode `ncopy` — jump-consistent-hash replica
    // placement (the mode the reference declares but panics on,
    // replicator.go:89-91; intent at README.md:215-218). The oracle
    // re-derives the placement bit-exactly in DuckDB: splitmix64 staged
    // through CTE let-bindings with 64-bit wrapping multiply split into
    // 32-bit halves over HUGEINT (2^64*2^64 overflows HUGEINT, so a*b
    // mod 2^64 = lo*lo + ((hi*lo + lo*hi) mod 2^32)<<32), then the
    // Lamping-Veach jump loop as a recursive CTE (terminal row j >= n),
    // then "first 2 distinct buckets in salt order" via windows. Salts
    // bounded at 16: P(15 salted rehashes all collide on 8 buckets)
    // ~ 8^-15, and a shortfall fails the row-count gate loudly.
    QueryDef("op_replicator_ncopy",
      (s, dir) => Routing.replicateNcopy(
        t(s, dir, "documents").select(col("doc_id")), col("doc_id"), 2, 8)
        .select(col("doc_id"), col("copy_id")),
      Some("""WITH RECURSIVE
        salts AS (SELECT unnest(range(0, 16))::HUGEINT AS salt),
        keys AS (SELECT doc_id, doc_id::HUGEINT AS ku FROM documents),
        m1 AS (SELECT doc_id, ku, salt, (salt + 11400714819323198485) % 18446744073709551616 AS saa FROM keys, salts),
        m2 AS (SELECT *, (((xor(saa, saa >> 30)) % 4294967296) * ((13787848793156543929) % 4294967296) + ((((xor(saa, saa >> 30)) // 4294967296) * ((13787848793156543929) % 4294967296) + ((xor(saa, saa >> 30)) % 4294967296) * ((13787848793156543929) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS sab FROM m1),
        m3 AS (SELECT *, (((xor(sab, sab >> 27)) % 4294967296) * ((10723151780598845931) % 4294967296) + ((((xor(sab, sab >> 27)) // 4294967296) * ((10723151780598845931) % 4294967296) + ((xor(sab, sab >> 27)) % 4294967296) * ((10723151780598845931) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS sac FROM m2),
        m4 AS (SELECT doc_id, ku, salt, xor(sac, sac >> 31) AS msalt FROM m3),
        x1 AS (SELECT doc_id, salt, (xor(ku, msalt) + 11400714819323198485) % 18446744073709551616 AS ka FROM m4),
        x2 AS (SELECT *, (((xor(ka, ka >> 30)) % 4294967296) * ((13787848793156543929) % 4294967296) + ((((xor(ka, ka >> 30)) // 4294967296) * ((13787848793156543929) % 4294967296) + ((xor(ka, ka >> 30)) % 4294967296) * ((13787848793156543929) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS kb FROM x1),
        x3 AS (SELECT *, (((xor(kb, kb >> 27)) % 4294967296) * ((10723151780598845931) % 4294967296) + ((((xor(kb, kb >> 27)) // 4294967296) * ((10723151780598845931) % 4294967296) + ((xor(kb, kb >> 27)) % 4294967296) * ((10723151780598845931) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS kc FROM x2),
        seeds AS (SELECT doc_id, salt, xor(kc, kc >> 31) AS seed FROM x3),
        jump(doc_id, salt, k, b, j) AS (
          SELECT doc_id, salt, seed, -1::HUGEINT, 0::HUGEINT FROM seeds
          UNION ALL
          SELECT doc_id, salt, k2, j,
            trunc((j + 1)::DOUBLE * (2147483648.0 / ((k2 >> 33) + 1)::DOUBLE))::HUGEINT
          FROM (SELECT doc_id, salt, ((((k) % 4294967296) * ((2862933555777941757) % 4294967296) + ((((k) // 4294967296) * ((2862933555777941757) % 4294967296) + ((k) % 4294967296) * ((2862933555777941757) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + 1) % 18446744073709551616 AS k2, b, j
                FROM jump WHERE j < 8) s
        ),
        buckets AS (SELECT doc_id, salt, b::BIGINT AS bucket FROM jump WHERE j >= 8),
        dedup AS (SELECT doc_id, salt, bucket,
            row_number() OVER (PARTITION BY doc_id, bucket ORDER BY salt) AS occ FROM buckets),
        firsts AS (SELECT doc_id, bucket, salt,
            row_number() OVER (PARTITION BY doc_id ORDER BY salt) AS pick FROM dedup WHERE occ = 1)
        SELECT doc_id, bucket::INT AS copy_id FROM firsts WHERE pick <= 2""")),

    // core.throttler (throttler.go:31-148) batch rendering: per-key
    // per-day admission quota; over-quota rows marked THROTTLED.
    QueryDef("op_throttler",
      (s, dir) => Throttler.throttleByWindow(
        t(s, dir, "events"), col("user_id"), col("ts"), "1 day", 5,
        Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("status")),
      Some("""SELECT event_id, user_id,
        CASE WHEN row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
            ORDER BY ts, event_id) <= 5
          THEN 'DONE' ELSE 'THROTTLED' END AS status
        FROM events""")),

    // core.throttler's exact GCRA (streaming state op) in its batch
    // rendering: one state pass per key over event-time-sorted events.
    // The oracle expresses the same TAT recursion as a DuckDB recursive
    // CTE stepping one row_number per key per iteration: at rps=0.001,
    // cost = 1e12 ns and burst = max(0, 1e9-cost) = 0, so "admitted iff
    // TAT - t <= burst" reduces to t >= TAT, and an admit sets
    // TAT = max(TAT, t) + cost = t + cost (t >= TAT at admit time).
    // First event per key always admits (TAT starts at -inf).
    QueryDef("op_gcra_throttler",
      (s, dir) => {
        import s.implicits._
        val events = t(s, dir, "events")
          .select(col("user_id").cast("string").as("key"),
            (unix_micros(col("ts")) * 1000L).as("eventTimeNs"),
            col("event_id").as("id"))
          .as[graft.streaming.GcraThrottler.Event]
        graft.streaming.GcraThrottler.throttle(events, rps = 0.001)
          .groupBy(col("key"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"))
      },
      Some("""WITH RECURSIVE ev AS (
          SELECT CAST(user_id AS VARCHAR) AS key, epoch_ns(ts) AS t, event_id AS id,
            row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
          FROM events
        ),
        rec AS (
          SELECT key, rn, TRUE AS admitted, t + 1000000000000 AS tat FROM ev WHERE rn = 1
          UNION ALL
          SELECT e.key, e.rn, e.t >= r.tat AS admitted,
            CASE WHEN e.t >= r.tat THEN e.t + 1000000000000 ELSE r.tat END AS tat
          FROM rec r JOIN ev e ON e.key = r.key AND e.rn = r.rn + 1
        )
        SELECT key, COUNT(*) AS n,
          CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
        FROM rec GROUP BY key""")),

    // core.compressor (compressor.go:92-171): every codec must round-trip
    // the body; n_match < n_docs means a codec corrupted data. Oracle
    // asserts the lossless property (compressed form is impl-specific and
    // deliberately not part of the contract).
    QueryDef("op_compressor_roundtrip",
      (s, dir) => {
        val docs = docEvents(s, dir)
        val perCodec = Compressor.Codecs.map { codec =>
          val c = Compressor.compress(docs, codec)
          val d = Compressor.decompress(c, codec)
          d.select(lit(codec).as("codec"),
            col("body").cast("string").as("roundtrip"), col("doc_id"))
        }
        val docsText = t(s, dir, "documents").select(col("doc_id"), col("text"))
        perCodec.reduce(_ unionByName _)
          .join(docsText, "doc_id")
          .groupBy(col("codec"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("roundtrip") === col("text"), 1L).otherwise(0L)).as("n_match"),
            sum(length(col("text")).cast("long")).as("total_chars"))
      },
      Some("""SELECT codec, COUNT(*) AS n_docs, COUNT(*) AS n_match,
        CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM (VALUES ('gzip'),('flate'),('zlib'),('zstd'),('snappy'),('lz4'),('lzw')) c(codec),
          documents
        GROUP BY codec""")),

    // Keyed last-writer-wins merge (operators.Upsert — MERGE INTO / CDC
    // apply): fold an update+tombstone change batch into the orders
    // snapshot in ONE key shuffle (TopKPerKey k=1, map-side capped).
    // Keys %7 get a status update (v1), keys %13 a tombstone (v2) —
    // %91 keys see both and the delete must win.
    QueryDef("op_upsert",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_totalprice"))
          .withColumn("version", lit(0L))
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("version", lit(1L))
          .withColumn("deleted", lit(false))
        val deletes = base.filter(col("o_orderkey") % 13 === 0)
          .withColumn("version", lit(2L))
          .withColumn("deleted", lit(true))
        graft.operators.Upsert(base, updates.unionByName(deletes),
          keys = Seq("o_orderkey"), versionCol = "version",
          deleteCol = Some("deleted"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("version"))
      },
      Some("""SELECT o_orderkey,
        CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        CAST(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS version
        FROM orders WHERE o_orderkey % 13 <> 0"""))
  )
}
